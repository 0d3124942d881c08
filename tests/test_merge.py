"""Segment merge: merged(two disjoint segments) must answer queries
rank- AND score-identically to a direct build over the concatenated corpus.

Fixture trick: segment A's urls all sort before segment B's, and A's doc
count is a multiple of block_doc_range — so the direct build's global url
sort assigns exactly the same doc_ids as merge's range-aligned offsets, and
equality can be exact."""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa
import pytest


BLOCK = 64
N_A = 128  # multiple of BLOCK -> merge offset == direct-build id boundary
N_B = 100


def _mk_corpus(prefix: str, n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
             "hotel", "india", "juliet", "kilo", "lima", "the", "and", "of"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(8, 25)))
             for _ in range(n)]
    urls = [f"{prefix}{i:06d}" for i in range(n)]
    return pa.table({"url": pa.array(urls), "text": pa.array(texts)})


@pytest.fixture(scope="module")
def merged_and_direct(ray_session, tmp_path_factory):
    import ray.data

    from ir_base_ray.config import AnalyzerSpec, IndexConfig
    from ir_base_ray.pipelines.build_index import build_index
    from ir_base_ray.pipelines.merge import merge_segments

    base = tmp_path_factory.mktemp("merge")
    corpus_a = _mk_corpus("a/", N_A, seed=1)
    corpus_b = _mk_corpus("b/", N_B, seed=2)

    dirs = {}
    for name, tbl in (("seg_a", corpus_a), ("seg_b", corpus_b),
                      ("direct", pa.concat_tables([corpus_a, corpus_b]))):
        out = str(base / name)
        shutil.rmtree(out, ignore_errors=True)
        cfg = IndexConfig(out_dir=out, block_doc_range=BLOCK, num_partitions=8,
                          analyzer_concurrency=2,
                          analyzer=AnalyzerSpec(ngram=1, mode="full"))
        build_index(ray.data.from_arrow(tbl), cfg)
        dirs[name] = out

    merged = str(base / "merged")
    meta = merge_segments([dirs["seg_a"], dirs["seg_b"]], merged, num_parts=8)
    return dirs, merged, meta


def test_merge_meta_scalars(merged_and_direct):
    import json

    dirs, merged, meta = merged_and_direct
    direct = json.load(open(dirs["direct"] + "/meta.json"))
    assert meta["N"] == direct["N"] == N_A + N_B
    assert meta["vocab_size"] == direct["vocab_size"]
    assert abs(meta["avgdl"] - direct["avgdl"]) < 1e-12
    assert meta["doc_offsets"] == [0, N_A]  # range-aligned == exact boundary


def test_merge_rank_and_score_identical(merged_and_direct):
    from ir_base_ray.pipelines.query_engine import IndexSegment

    dirs, merged, _ = merged_and_direct
    seg_m = IndexSegment(merged)
    seg_d = IndexSegment(dirs["direct"])
    queries = ["alpha bravo", "charlie delta echo", "the kilo", "foxtrot",
               "golf hotel india juliet", "lima and of the"]
    for q in queries:
        hm = seg_m.topk(q, 10)
        hd = seg_d.topk(q, 10)
        assert [d for d, _ in hm] == [d for d, _ in hd], q
        np.testing.assert_array_equal(np.array([s for _, s in hm]),
                                      np.array([s for _, s in hd]), err_msg=q)


def test_merge_docid_remapping(merged_and_direct):
    """Segment B's docs answer under their shifted ids."""
    from ir_base_ray.pipelines.query_engine import IndexSegment

    dirs, merged, _ = merged_and_direct
    seg_b = IndexSegment(dirs["seg_b"])
    seg_m = IndexSegment(merged)
    hits_b = seg_b.topk("alpha bravo charlie", 5)
    assert hits_b
    # every segment-B hit appears in the merged index at doc_id + N_A with
    # a score computed under the MERGED statistics (so only ids must map)
    merged_ids = {d for d, _ in seg_m.topk("alpha bravo charlie", 2 * (N_A + N_B))}
    for d, _ in hits_b:
        assert d + N_A in merged_ids
