"""Suffix-array exact-substring dedup (stages/suffix_dedup.py): SA/LCP
primitives vs naive oracles, planted arbitrary-length spans found exactly,
and the windowed gate operator (stages.dedup.substring_dup_stats) as the
cross-pin oracle on fixtures without intra-doc repeats."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ir_base_ray.stages.suffix_dedup import (duplicated_coverage, lcp_kasai,
                                             suffix_array_prefix_doubling,
                                             suffix_dup_spans,
                                             suffix_dup_stats,
                                             window_duplicated_mask)


def _naive_sa(seq):
    n = len(seq)
    return sorted(range(n), key=lambda i: list(seq[i:]))


def _naive_lcp(seq, sa):
    n = len(sa)
    lcp = [0] * n
    for r in range(1, n):
        a, b = sa[r - 1], sa[r]
        h = 0
        while a + h < n and b + h < n and seq[a + h] == seq[b + h]:
            h += 1
        lcp[r] = h
    return lcp


def test_sa_and_lcp_match_naive():
    rng = np.random.default_rng(7)
    for trial in range(30):
        n = int(rng.integers(1, 80))
        alpha = int(rng.integers(1, 6))
        seq = rng.integers(0, alpha, size=n).astype(np.int64)
        sa = suffix_array_prefix_doubling(seq)
        assert sa.tolist() == _naive_sa(seq), (trial, seq.tolist())
        lcp = lcp_kasai(seq, sa)
        assert lcp.tolist() == _naive_lcp(seq, sa.tolist()), trial


def test_lcp_python_fallback_matches_c(monkeypatch):
    import ir_base_ray.functions.ckernels as ck

    seq = np.array([1, 2, 1, 2, 1, 3, 1, 2, 1], np.int64)
    sa = suffix_array_prefix_doubling(seq)
    lcp_c = lcp_kasai(seq, sa)
    monkeypatch.setattr(ck, "_kasai_lib", None)
    monkeypatch.setattr(ck, "_kasai_tried", True)
    lcp_py = lcp_kasai(seq, sa)
    assert np.array_equal(lcp_c, lcp_py)


def test_coverage_and_window_mask_small():
    # seq: "a b c d a b c e": 'a b c' (len 3) occurs twice
    seq = np.array([0, 1, 2, 3, 0, 1, 2, 4], np.int64)
    sa = suffix_array_prefix_doubling(seq)
    lcp = lcp_kasai(seq, sa)
    cov = duplicated_coverage(sa, lcp, seq.size, 3)
    assert cov.tolist() == [True, True, True, False,
                            True, True, True, False]
    rank = np.empty(seq.size, np.int64)
    rank[sa] = np.arange(seq.size)
    wm = window_duplicated_mask(lcp, rank, 3)
    # exactly the two 'a b c' window start positions
    assert np.flatnonzero(wm[: seq.size - 2]).tolist() == [0, 4]


def _mk_docs(planted, n_docs=10, filler=30, seed=3):
    """Docs of GLOBALLY-UNIQUE filler words (no accidental or intra-doc
    repeats); ``planted`` = list of (doc_a, pos_a, doc_b, pos_b, span_len,
    tag) shared spans spliced over the filler."""
    words = [[f"w{d}x{i}" for i in range(filler)] for d in range(n_docs)]
    for a, pa_, b, pb, ln, tag in planted:
        span = [f"dup{tag}tok{j}" for j in range(ln)]
        words[a][pa_: pa_ + ln] = span
        words[b][pb: pb + ln] = span
    return pa.table({
        "doc_id": pa.array(list(range(n_docs)), pa.int64()),
        "text": pa.array([" ".join(w) for w in words], pa.string()),
    })


def test_planted_long_spans_found_exactly(ray_session):
    import ray.data

    planted = [
        (2, 5, 7, 11, 18, "A"),    # 18-token span, docs 2 & 7
        (1, 0, 4, 12, 12, "B"),    # 12-token span at doc-1 start
    ]
    tbl = _mk_docs(planted)
    ds = ray.data.from_arrow(tbl)
    spans = (suffix_dup_spans(ds, min_len=10).to_pandas()
             .sort_values(["doc_id", "span_start"]).reset_index(drop=True))
    expected = pd.DataFrame([
        {"doc_id": 1, "span_start": 0, "span_end": 12},
        {"doc_id": 2, "span_start": 5, "span_end": 23},
        {"doc_id": 4, "span_start": 12, "span_end": 24},
        {"doc_id": 7, "span_start": 11, "span_end": 29},
    ])
    assert spans.to_dict("records") == expected.to_dict("records")

    stats = (suffix_dup_stats(ds, min_len=10).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert stats["n_tokens"].tolist() == [30] * 10
    dup = dict(zip(stats["doc_id"], stats["dup_tokens"]))
    assert dup == {0: 0, 1: 12, 2: 18, 3: 0, 4: 12, 5: 0, 6: 0,
                   7: 18, 8: 0, 9: 0}
    # min_len above the longest planted span: nothing found
    assert suffix_dup_spans(ds, min_len=19).to_pandas().empty


def test_min_len_partial_overlap_span(ray_session):
    """A span shorter than the planted one is still reported at full
    planted extent (every position sits in a >= min_len duplicate)."""
    import ray.data

    tbl = _mk_docs([(0, 3, 5, 20, 7, "Z")], filler=28)
    spans = (suffix_dup_spans(ray.data.from_arrow(tbl), min_len=7)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert spans.to_dict("records") == [
        {"doc_id": 0, "span_start": 3, "span_end": 10},
        {"doc_id": 5, "span_start": 20, "span_end": 27},
    ]


def test_windowed_gate_operator_as_oracle(ray_session):
    """Cross-pin: per-doc duplicated-WINDOW counts derived from the
    suffix-array construction equal the independently-implemented windowed
    gate operator substring_dup_stats (fixture has no intra-doc repeats,
    matching its >=2-distinct-docs rule)."""
    import ray.data

    from ir_base_ray.functions.analyzer import analyze_simple
    from ir_base_ray.stages.dedup import substring_dup_stats

    W = 8
    planted = [
        (0, 2, 3, 9, 15, "A"),
        (1, 0, 6, 14, 9, "B"),
        (2, 10, 8, 0, 8, "C"),     # exactly one window long
    ]
    tbl = _mk_docs(planted, n_docs=9, filler=26, seed=5)
    ds = ray.data.from_arrow(tbl)
    win = (substring_dup_stats(ds, window=W).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # SA-side window counts on the same token streams
    toks = [analyze_simple(t) for t in tbl.column("text").to_pylist()]
    vocab = {}
    for ts in toks:
        for t in ts:
            vocab.setdefault(t, len(vocab))
    seq_parts, starts, pos = [], [], 0
    for d, ts in enumerate(toks):
        if d > 0:
            seq_parts.append([len(vocab) + d])
            pos += 1
        starts.append(pos)
        seq_parts.append([vocab[t] for t in ts])
        pos += len(ts)
    seq = np.array([x for part in seq_parts for x in part], np.int64)
    sa = suffix_array_prefix_doubling(seq)
    lcp = lcp_kasai(seq, sa)
    rank = np.empty(seq.size, np.int64)
    rank[sa] = np.arange(seq.size)
    wm = window_duplicated_mask(lcp, rank, W)
    for d, ts in enumerate(toks):
        n_w = max(0, len(ts) - W + 1)
        s0 = starts[d]
        got = int(wm[s0: s0 + n_w].sum()) if n_w else 0
        row = win[win["doc_id"] == d].iloc[0]
        assert int(row["n_windows"]) == n_w
        assert int(row["dup_windows"]) == got, d


def test_sharded_equals_single_when_dups_within_shards(ray_session):
    import ray.data

    # both planted pairs live inside one half of the doc_id range
    planted = [(0, 2, 3, 9, 11, "A"), (6, 1, 8, 10, 13, "B")]
    tbl = _mk_docs(planted, n_docs=10, filler=26)
    ds = ray.data.from_arrow(tbl)
    one = (suffix_dup_stats(ds, min_len=10, num_shards=1).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    two = (suffix_dup_stats(ds, min_len=10, num_shards=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert one.to_dict("records") == two.to_dict("records")


# --- global window-coverage path -------------------------------------------

def _spans_df(ds_out):
    return (ds_out.to_pandas()
            .sort_values(["doc_id", "span_start"]).reset_index(drop=True))


def _stats_df(ds_out):
    return (ds_out.to_pandas().astype({"dup_tokens": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


def _intra_doc_fixture():
    """Cross-doc planted span PLUS an intra-doc repeat (same 9-token span
    twice inside doc 5) — exercises the paper's any-two-occurrences rule
    both paths share."""
    tbl = _mk_docs([(1, 3, 6, 10, 14, "A")], n_docs=8, filler=40)
    words = tbl.column("text").to_pylist()[5].split(" ")
    span = [f"intraXtok{j}" for j in range(9)]
    words[2:11] = span
    words[25:34] = span
    texts = tbl.column("text").to_pylist()
    texts[5] = " ".join(words)
    return pa.table({"doc_id": tbl.column("doc_id"),
                     "text": pa.array(texts, pa.string())})


def test_global_matches_suffix_single_shard(ray_session):
    import ray.data

    from ir_base_ray.stages.suffix_dedup import (global_dup_spans,
                                                 global_dup_stats)

    tbl = _intra_doc_fixture()
    ds = ray.data.from_arrow(tbl)
    for min_len in (8, 9, 10):
        sa_spans = _spans_df(suffix_dup_spans(ds, min_len=min_len))
        gl_spans = _spans_df(global_dup_spans(ds, min_len=min_len))
        assert sa_spans.to_dict("records") == gl_spans.to_dict("records"), \
            min_len
        sa_stats = _stats_df(suffix_dup_stats(ds, min_len=min_len))
        gl_stats = _stats_df(global_dup_stats(ds, min_len=min_len))
        assert sa_stats.to_dict("records") == gl_stats.to_dict("records"), \
            min_len
    # sanity on the intra-doc doc: both of its repeated 9-token spans count
    st = _stats_df(global_dup_stats(ds, min_len=9))
    assert int(st.loc[st["doc_id"] == 5, "dup_tokens"].iloc[0]) == 18


def test_global_join_arm_matches_broadcast(ray_session):
    import ray.data

    from ir_base_ray.stages.suffix_dedup import (global_dup_spans,
                                                 global_dup_stats)

    tbl = _intra_doc_fixture()
    ds = ray.data.from_arrow(tbl)
    bc_spans = _spans_df(global_dup_spans(ds, min_len=9))
    jn_spans = _spans_df(global_dup_spans(ds, min_len=9,
                                          dup_broadcast_max=0,
                                          num_partitions=4))
    assert bc_spans.to_dict("records") == jn_spans.to_dict("records")
    bc_stats = _stats_df(global_dup_stats(ds, min_len=9))
    jn_stats = _stats_df(global_dup_stats(ds, min_len=9,
                                          dup_broadcast_max=0,
                                          num_partitions=4))
    assert bc_stats.to_dict("records") == jn_stats.to_dict("records")


def test_global_finds_cross_shard_dups_suffix_misses(ray_session):
    """The gap the global path closes: a duplicate whose occurrences land
    in DIFFERENT doc_id shards is invisible to per-shard suffix arrays but
    found by the global window shuffle."""
    import ray.data

    from ir_base_ray.stages.suffix_dedup import global_dup_stats

    planted = [(0, 4, 9, 12, 13, "X")]   # docs 0 and 9: opposite shards
    tbl = _mk_docs(planted, n_docs=10, filler=30)
    ds = ray.data.from_arrow(tbl)
    sharded = _stats_df(suffix_dup_stats(ds, min_len=10, num_shards=2))
    assert sharded["dup_tokens"].sum() == 0          # per-shard SA misses it
    gl = _stats_df(global_dup_stats(ds, min_len=10))
    dup = dict(zip(gl["doc_id"], gl["dup_tokens"]))
    assert dup[0] == 13 and dup[9] == 13
    assert sum(dup.values()) == 26
    # and the single-shard SA agrees with the global result
    single = _stats_df(suffix_dup_stats(ds, min_len=10, num_shards=1))
    assert single.to_dict("records") == gl.to_dict("records")


def test_global_cut_both_arms_and_token_accounting(ray_session):
    """global_dup_cut: (a) join arm == broadcast arm row-for-row; (b) the
    cleaned text's token count equals n_tokens - dup_tokens from
    global_dup_stats (the cut removes exactly the covered tokens); (c) the
    kept tokens are the original token sequence with covered positions
    deleted (order preserved)."""
    import ray.data

    from ir_base_ray.functions.analyzer import analyze_simple
    from ir_base_ray.stages.suffix_dedup import (global_dup_cut,
                                                 global_dup_spans,
                                                 global_dup_stats)

    tbl = _intra_doc_fixture()
    ds = ray.data.from_arrow(tbl)
    bc = (global_dup_cut(ds, min_len=9).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    jn = (global_dup_cut(ds, min_len=9, dup_broadcast_max=0,
                         num_partitions=4).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert bc.to_dict("records") == jn.to_dict("records")

    stats = (global_dup_stats(ds, min_len=9).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    spans = global_dup_spans(ds, min_len=9).to_pandas()
    texts = dict(zip(tbl.column("doc_id").to_pylist(),
                     tbl.column("text").to_pylist()))
    assert list(bc["doc_id"]) == list(stats["doc_id"])
    for _, row in stats.iterrows():
        doc = int(row["doc_id"])
        clean = bc.loc[bc["doc_id"] == doc, "clean_text"].iloc[0]
        kept = clean.split() if clean else []
        assert len(kept) == int(row["n_tokens"]) - int(row["dup_tokens"])
        toks = analyze_simple(texts[doc])
        covered = set()
        for _, s in spans[spans["doc_id"] == doc].iterrows():
            covered.update(range(int(s["span_start"]), int(s["span_end"])))
        expect = [t for i, t in enumerate(toks) if i not in covered]
        assert kept == expect
