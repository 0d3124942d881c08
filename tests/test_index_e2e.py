"""End-to-end conformance: Ray Data index build + BM25 query engine vs the
pinned full-scan oracle — rank-identical doc_ids AND bit-identical float64
scores, including tie ordering (FIXTURES.md §5 invariants 1-3), plus the
resume-from-checkpoint invariant (5)."""

import glob
import hashlib
import os
import shutil

import pyarrow as pa
import pytest

import ray.data

from ir_base_ray.config import AnalyzerSpec, IndexConfig
from ir_base_ray.pipelines.build_index import build_index
from ir_base_ray.pipelines.query_engine import IndexSegment, search
from ir_base_ray.sources.corpus import synth_corpus
from ir_base_ray.sources.queries import synth_queries

from tests.oracle import oracle_build, oracle_topk

N_DOCS = 400


@pytest.fixture(scope="module")
def corpus_table():
    return synth_corpus(N_DOCS, seed=42)


@pytest.fixture(scope="module")
def built_index(ray_session, corpus_table, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index"))
    cfg = IndexConfig(
        out_dir=out,
        block_doc_range=64,  # small so multi-block paths are exercised
        num_partitions=8,
        analyzer_concurrency=2,
        analyzer_batch_size=128,
        analyzer=AnalyzerSpec(ngram=1),
    )
    corpus_ds = ray.data.from_arrow(corpus_table).select_columns(["url", "text"])
    meta = build_index(corpus_ds, cfg)
    return out, meta


@pytest.fixture(scope="module")
def oracle_index(corpus_table):
    return oracle_build(corpus_table, AnalyzerSpec(ngram=1))


def test_meta_scalars_match(built_index, oracle_index):
    _, meta = built_index
    assert meta["N"] == oracle_index.N
    assert meta["avgdl"] == oracle_index.avgdl
    assert meta["vocab_size"] == len(oracle_index.term_id)


def test_docids_match_sorted_urls(built_index, oracle_index):
    out, _ = built_index
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(out, "docs", "*.parquet")))
    docs = pa.concat_tables(pq.read_table(f) for f in files).to_pandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    assert docs["url"].tolist() == oracle_index.urls
    assert docs["doc_id"].tolist() == oracle_index.doc_ids
    assert docs["doc_len"].tolist() == oracle_index.doc_len


def test_dictionary_matches(built_index, oracle_index):
    out, _ = built_index
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(out, "dict", "*.parquet")))
    d = pa.concat_tables(pq.read_table(f) for f in files).to_pandas()
    d = d.sort_values("term_id").reset_index(drop=True)
    assert d["term"].tolist() == sorted(oracle_index.term_id.keys())
    assert {t: int(v) for t, v in zip(d["term"], d["df"])} == oracle_index.df
    assert {t: int(v) for t, v in zip(d["term"], d["ttf"])} == oracle_index.ttf


def test_topk_rank_identical(built_index, oracle_index, corpus_table):
    out, _ = built_index
    seg = IndexSegment(out)
    queries = synth_queries(corpus_table, n_queries=40, seed=7)
    mismatches = []
    for qid, text, k in zip(
        queries.column("query_id").to_pylist(),
        queries.column("text").to_pylist(),
        queries.column("k").to_pylist(),
    ):
        expected = oracle_topk(oracle_index, text, int(k))
        for prune in (False, True):
            got = seg.topk(text, int(k), prune=prune)
            if got != expected:  # exact: same doc ids, same order, bitwise scores
                mismatches.append((qid, prune, expected[:3], got[:3]))
    assert not mismatches, f"{len(mismatches)} mismatching queries: {mismatches[:2]}"


def test_search_actor_pool(built_index, corpus_table, oracle_index):
    out, _ = built_index
    queries = synth_queries(corpus_table, n_queries=12, seed=11)
    results = search(ray.data.from_arrow(queries), out, concurrency=2).to_pandas()
    for qid, text, k in zip(
        queries.column("query_id").to_pylist(),
        queries.column("text").to_pylist(),
        queries.column("k").to_pylist(),
    ):
        sub = results[results["query_id"] == qid].sort_values("rank")
        expected = oracle_topk(oracle_index, text, int(k))
        assert sub["doc_id"].tolist() == [d for d, _ in expected]
        assert sub["score"].tolist() == [s for _, s in expected]


def test_distributed_docid_path_matches_driver_path(
        ray_session, built_index, corpus_table, tmp_path, oracle_index):
    """Force the distributed doc-id path (sort + hash join; the >max_rows
    dispatch branch) and require the SAME index as the broadcast-map build:
    identical docs/dict tables and bit-identical topk."""
    out = str(tmp_path / "index_dist")
    cfg = IndexConfig(
        out_dir=out, block_doc_range=64, num_partitions=8,
        analyzer_concurrency=2, analyzer_batch_size=128,
        analyzer=AnalyzerSpec(ngram=1),
        driver_id_map_max_rows=0,  # always take the distributed branch
    )
    corpus_ds = ray.data.from_arrow(corpus_table).select_columns(["url", "text"])
    meta = build_index(corpus_ds, cfg)
    import pyarrow.parquet as pq

    base, base_meta = built_index
    assert meta["N"] == base_meta["N"] and meta["avgdl"] == base_meta["avgdl"]

    def _tbl(root, sub, sort_cols):
        files = sorted(glob.glob(os.path.join(root, sub, "**", "*.parquet"), recursive=True))
        t = pa.concat_tables(pq.read_table(f) for f in files).to_pandas()
        return t.sort_values(sort_cols).reset_index(drop=True)

    for sub, cols in (("docs", ["doc_id"]), ("dict", ["term_id"])):
        a = _tbl(base, sub, cols)
        b = _tbl(out, sub, cols)
        assert a[sorted(a.columns)].equals(b[sorted(b.columns)]), f"{sub} differs"

    seg_a, seg_b = IndexSegment(base), IndexSegment(out)
    queries = synth_queries(corpus_table, n_queries=20, seed=3)
    for text, k in zip(queries.column("text").to_pylist(),
                       queries.column("k").to_pylist()):
        assert seg_a.topk(text, int(k)) == seg_b.topk(text, int(k))


def test_sharded_topk_bit_identical(ray_session, built_index, corpus_table):
    """T7 multi-node shape: doc-range shard actors + heap merge must equal
    the whole-index segment bit-exactly, ties included."""
    from ir_base_ray.pipelines.query_engine import ShardedIndex

    out, _ = built_index
    seg = IndexSegment(out)
    sharded = ShardedIndex(out, n_shards=3)
    queries = synth_queries(corpus_table, n_queries=25, seed=9)
    texts = queries.column("text").to_pylist()
    ks = queries.column("k").to_pylist()
    got = sharded.topk_batch(texts, ks)
    for text, k, res in zip(texts, ks, got):
        assert res == seg.topk(text, int(k)), text[:40]


def _hash_dir(path: str) -> dict:
    out = {}
    for f in sorted(glob.glob(os.path.join(path, "postings", "**", "*.parquet"), recursive=True)):
        out[os.path.relpath(f, path)] = hashlib.sha256(open(f, "rb").read()).hexdigest()
    return out


def test_resume_skips_finished_partitions(ray_session, corpus_table, tmp_path):
    """Kill-after-partition-k simulation: delete some partition outputs +
    manifests, rebuild, and require byte-identical parquet across the board;
    partitions with intact manifests must not be rewritten."""
    out = str(tmp_path / "index")
    cfg = IndexConfig(out_dir=out, block_doc_range=64, num_partitions=8,
                      analyzer_concurrency=2, analyzer=AnalyzerSpec(ngram=1))
    corpus_ds = ray.data.from_arrow(corpus_table).select_columns(["url", "text"])
    build_index(corpus_ds, cfg)
    before = _hash_dir(out)
    kept_mtime = {}
    # simulate dying after some partitions: remove parts 5..7 outputs+manifests
    for p in (5, 6, 7):
        shutil.rmtree(os.path.join(out, "postings", f"part={p}"), ignore_errors=True)
        m = os.path.join(out, "manifests", f"part-{p}.json")
        if os.path.exists(m):
            os.remove(m)
    for p in (0, 1, 2, 3, 4):
        f = os.path.join(out, "postings", f"part={p}", "blocks.parquet")
        if os.path.exists(f):
            kept_mtime[p] = os.path.getmtime(f)
    corpus_ds2 = ray.data.from_arrow(corpus_table).select_columns(["url", "text"])
    build_index(corpus_ds2, cfg)
    after = _hash_dir(out)
    assert before == after, "resumed index differs from original"
    for p, m in kept_mtime.items():
        f = os.path.join(out, "postings", f"part={p}", "blocks.parquet")
        assert os.path.getmtime(f) == m, f"finished partition {p} was rewritten"


def test_distributed_dict_path_matches_driver_path(
        ray_session, built_index, corpus_table, tmp_path):
    """Force the distributed dictionary path (driver_dict_max_terms=0: dense
    ranks via assign_dense_ids + term-keyed Dataset.join in the postings
    explode, idf derived from the per-posting df column) and require the SAME
    index as the broadcast-dictionary build: identical docs/dict tables,
    byte-identical posting blocks, bit-identical topk."""
    out = str(tmp_path / "index_dict_dist")
    cfg = IndexConfig(
        out_dir=out, block_doc_range=64, num_partitions=8,
        analyzer_concurrency=2, analyzer_batch_size=128,
        analyzer=AnalyzerSpec(ngram=1),
        driver_dict_max_terms=0,  # always take the distributed branch
    )
    corpus_ds = ray.data.from_arrow(corpus_table).select_columns(["url", "text"])
    meta = build_index(corpus_ds, cfg)
    import pyarrow.parquet as pq

    base, base_meta = built_index
    assert meta["dict_mode"] == "distributed"
    assert base_meta.get("dict_mode", "driver") == "driver"
    assert meta["N"] == base_meta["N"] and meta["avgdl"] == base_meta["avgdl"]
    assert meta["vocab_size"] == base_meta["vocab_size"]

    def _tbl(root, sub, sort_cols):
        files = sorted(glob.glob(os.path.join(root, sub, "**", "*.parquet"), recursive=True))
        t = pa.concat_tables(pq.read_table(f) for f in files).to_pandas()
        return t.sort_values(sort_cols).reset_index(drop=True)

    for sub, cols in (("docs", ["doc_id"]), ("dict", ["term_id"])):
        a = _tbl(base, sub, cols)
        b = _tbl(out, sub, cols)
        common = sorted(set(a.columns) & set(b.columns))
        assert a[common].equals(b[common]), f"{sub} differs"

    # posting blocks byte-identical per partition (the encode output depends
    # only on the raw rows, sorted inside encode — both idf derivations must
    # produce the same bits)
    for pdir in sorted(glob.glob(os.path.join(base, "postings", "part=*"))):
        part = os.path.basename(pdir)
        a = pq.read_table(os.path.join(pdir, "blocks.parquet"))
        b = pq.read_table(os.path.join(out, "postings", part, "blocks.parquet"))
        assert a.equals(b), f"postings {part} differ"

    seg_a, seg_b = IndexSegment(base), IndexSegment(out)
    queries = synth_queries(corpus_table, n_queries=20, seed=3)
    for text, k in zip(queries.column("text").to_pylist(),
                       queries.column("k").to_pylist()):
        assert seg_a.topk(text, int(k)) == seg_b.topk(text, int(k))


def test_prefetch_results_identical_and_budget_respected(built_index,
                                                         corpus_table):
    """Top-DF prefetch only pre-warms the hot-term cache: results are
    identical to a lazy-only segment, and the budget bounds what's cached
    at init."""
    out, _ = built_index
    lazy = IndexSegment(out, prefetch_postings=0)
    assert lazy._terms_postings == 0
    warm = IndexSegment(out)  # default prefetch
    assert warm._terms_postings > 0
    tiny = IndexSegment(out, prefetch_postings=5)
    assert tiny._terms_postings <= 5
    queries = synth_queries(corpus_table, n_queries=25, seed=21)
    for text, k in zip(queries.column("text").to_pylist(),
                       queries.column("k").to_pylist()):
        assert warm.topk(text, int(k)) == lazy.topk(text, int(k))


def test_query_ckernels_match_python_fallbacks(built_index, corpus_table):
    """The three query-path C kernels (fused decode+BM25 weight, fused
    merge+topk queue, whole-query WAND loop) are bit- and tie-identical to
    the numpy/Python fallbacks on the same segment, both prune modes."""
    import ir_base_ray.functions.ckernels as ck

    if ck.decode_kernel() is None:
        pytest.skip("no compiler on host")
    out, _ = built_index
    queries = synth_queries(corpus_table, n_queries=40, seed=11)
    # Kernel lookup is lazy at QUERY time, so the C-side results must be
    # recorded while the kernels are still enabled — disabling first would
    # compare Python against Python (vacuous).
    from ir_base_ray.pipelines.query_engine import _CTopK

    seg_c = IndexSegment(out)
    assert isinstance(seg_c._make_queue(1), _CTopK), "C queue not engaged"
    assert ck.wand_kernel() is not None, "WAND kernel not engaged"
    cases = [(text, int(k), prune)
             for text, k in zip(queries.column("text").to_pylist(),
                                queries.column("k").to_pylist())
             for prune in (False, True)]
    c_results = [seg_c.topk(text, k, prune=prune) for text, k, prune in cases]
    saved = {}
    for name in ("_decode_lib", "_decode_tried", "_decode_w_lib",
                 "_decode_w_tried", "_score_lib", "_score_tried",
                 "_wand_lib", "_wand_tried"):
        saved[name] = getattr(ck, name)
        setattr(ck, name, None if name.endswith("lib") else True)
    try:
        seg_py = IndexSegment(out)
        assert not isinstance(seg_py._make_queue(1), _CTopK)
        for (text, k, prune), got_c in zip(cases, c_results):
            assert got_c == seg_py.topk(text, k, prune=prune), \
                (text, k, prune)
    finally:
        for name, v in saved.items():
            setattr(ck, name, v)


def test_topk_edge_cases_c_vs_python(ray_session, tmp_path):
    """Adversarial queue/WAND edges: a term in >half the docs (negative BM25
    IDF weights through the admission path), duplicate docs (score ties),
    k=1 and k far above the candidate count — C kernels vs Python fallbacks
    AND vs the full-scan oracle, all prune modes."""
    import ir_base_ray.functions.ckernels as ck

    if ck.decode_kernel() is None:
        pytest.skip("no compiler on host")
    rows = []
    for i in range(60):
        # 'common' appears in 80% of docs -> df > N/2 -> negative idf
        base = "common " if i % 5 else "scarce "
        # docs 10..19 are byte-identical -> exact BM25 score ties
        body = "alpha beta gamma" if 10 <= i < 20 else f"word{i} tail{i%7}"
        rows.append({"url": f"u{i:03d}", "text": base + body})
    tbl = pa.Table.from_pylist(rows)
    out = str(tmp_path / "edge_idx")
    cfg = IndexConfig(out_dir=out, block_doc_range=8, num_partitions=4,
                      analyzer_concurrency=2, analyzer_batch_size=16,
                      analyzer=AnalyzerSpec(ngram=1))
    build_index(ray.data.from_arrow(tbl).select_columns(["url", "text"]), cfg)
    oracle = oracle_build(tbl, AnalyzerSpec(ngram=1))
    # Record C-kernel results BEFORE disabling (lazy kernel lookup at query
    # time means disable-first compares Python vs Python — vacuous).
    from ir_base_ray.pipelines.query_engine import _CTopK

    seg_c = IndexSegment(out)
    assert isinstance(seg_c._make_queue(1), _CTopK), "C queue not engaged"
    assert ck.wand_kernel() is not None, "WAND kernel not engaged"
    cases = [(text, k, prune)
             for text in ("common", "scarce", "alpha beta", "common alpha",
                          "common scarce word3 tail3")
             for k in (1, 5, 500)
             for prune in (False, True)]
    c_results = [seg_c.topk(text, k, prune=prune) for text, k, prune in cases]
    saved = {}
    for name in ("_decode_lib", "_decode_tried", "_decode_w_lib",
                 "_decode_w_tried", "_score_lib", "_score_tried",
                 "_wand_lib", "_wand_tried"):
        saved[name] = getattr(ck, name)
        setattr(ck, name, None if name.endswith("lib") else True)
    try:
        seg_py = IndexSegment(out)
        assert not isinstance(seg_py._make_queue(1), _CTopK)
        for (text, k, prune), got_c in zip(cases, c_results):
            expected = oracle_topk(oracle, text, k)
            got_py = seg_py.topk(text, k, prune=prune)
            assert got_c == got_py == expected, (text, k, prune)
    finally:
        for name, v in saved.items():
            setattr(ck, name, v)
