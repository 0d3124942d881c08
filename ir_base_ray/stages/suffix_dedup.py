"""Arbitrary-length exact-substring duplicate spans via suffix arrays.

The real engine of Lee et al. 2021 ("Deduplicating Training Data Makes
Language Models Better", public): find every maximal text span of at least
``min_len`` tokens that occurs ≥2 times in the corpus, at ANY length — not
the fixed-window approximation ``stages.dedup.substring_dup_stats`` uses
(which stays the SQL-oracled gate entry; this module is its
arbitrary-length sibling, cross-pinned against it on planted fixtures by
``tests/test_suffix_dedup.py``).

Method (token-level, simple-analyzer mode like the windowed variant):

1. distributed tokenize+hash pass — ``map_batches`` over the corpus runs
   the Arrow batch tokenizer (``analyze_simple_flat``) and the batched C
   MD5 kernel, emitting per-doc ``int64`` token-hash lists (8 bytes per
   token leaves the workers — never the text);
2. one worker task per shard concatenates the hash lists doc_id-ascending
   with a DISTINCT separator id between docs (separators are dense-ranked
   past the vocabulary, so no cross-doc match can extend through a
   boundary), dense-ranks hashes to ids, builds the suffix array by
   vectorized-numpy prefix doubling (O(n log² n) work, one ``np.lexsort``
   per round) and the LCP array by Kasai's walk (C kernel, Python
   fallback);
3. duplicated coverage: for every adjacent SA pair with ``lcp ≥ min_len``
   both suffixes' ``lcp``-token prefixes are marked via a difference
   array; positions with positive coverage lie inside some duplicated
   substring of ≥ ``min_len`` tokens (the paper's cut criterion). Maximal
   runs of covered positions (never crossing a separator — separators are
   unique so no interval can contain one) are the emitted per-doc spans.

Semantics note: like the paper (and unlike the windowed gate operator's
≥2-distinct-docs rule), a substring repeated WITHIN one doc counts as
duplicated — the suffix array sees every occurrence. The cross-pin fixture
therefore plants no intra-doc repeats.

Scale shape: the tokenize+hash pass is fully distributed and reduces the
corpus to 8 bytes/token. Construction runs in ONE Ray task per doc-range
shard — the per-shard kernel of the paper's sharded build (they construct
per-shard suffix arrays and merge); ``num_shards > 1`` fans contiguous
doc_id ranges out to parallel tasks with the documented partitioning
assumption that duplicates are found WITHIN a shard (a 10¹²-token corpus
needs either the paper's merge step or distributed prefix-doubling —
log n Dataset sorts of (rank, rank[k:]) pairs — neither changes this
module's per-shard output contract). Token-id identity is the 64-bit MD5
prefix: two distinct tokens colliding would fuse their ids (birthday bound
~10¹⁰ DISTINCT tokens, far above any real vocabulary; the windowed gate
operator keys literal strings and stays the exactness anchor).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def suffix_array_prefix_doubling(seq: np.ndarray) -> np.ndarray:
    """Suffix array of an int64 sequence by prefix doubling — each round
    one stable ``np.lexsort`` on (rank, rank[k:]) then a vectorized dense
    re-rank; terminates when all ranks are distinct (suffixes all differ
    by length, so ≤ ⌈log₂ n⌉ rounds)."""
    seq = np.asarray(seq, dtype=np.int64)
    n = seq.size
    if n == 0:
        return np.empty(0, np.int64)
    _, rank = np.unique(seq, return_inverse=True)
    rank = rank.astype(np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1, r2 = rank[order], key2[order]
        changed = np.empty(n, bool)
        changed[0] = False
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.cumsum(changed)
        if new_rank[-1] == n - 1 or k >= n:
            return order
        nr = np.empty(n, np.int64)
        nr[order] = new_rank
        rank = nr
        k *= 2


def lcp_kasai(seq: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP array (lcp[r] = lcp of suffixes sa[r-1], sa[r]; lcp[0] = 0) by
    Kasai's amortized-O(n) walk — C kernel with a same-loop Python
    fallback."""
    from ir_base_ray.functions.ckernels import kasai_kernel

    seq = np.ascontiguousarray(seq, dtype=np.int64)
    sa = np.ascontiguousarray(sa, dtype=np.int64)
    n = seq.size
    lcp = np.zeros(n, np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, np.int64)
    rank[sa] = np.arange(n, dtype=np.int64)
    lib = kasai_kernel()
    if lib is not None:
        import ctypes

        P = ctypes.POINTER
        i64 = ctypes.c_int64
        lib.kasai_lcp(
            seq.ctypes.data_as(P(i64)), sa.ctypes.data_as(P(i64)),
            rank.ctypes.data_as(P(i64)), n, lcp.ctypes.data_as(P(i64)))
        return lcp
    h = 0
    for i in range(n):
        r = rank[i]
        if r == 0:
            h = 0
            continue
        j = sa[r - 1]
        while i + h < n and j + h < n and seq[i + h] == seq[j + h]:
            h += 1
        lcp[r] = h
        if h > 0:
            h -= 1
    return lcp


def duplicated_coverage(sa: np.ndarray, lcp: np.ndarray, n: int,
                        min_len: int) -> np.ndarray:
    """Boolean mask over positions: True where the position lies inside
    some duplicated substring of ≥ ``min_len`` tokens. For every adjacent
    SA pair with lcp ≥ min_len, both suffixes' lcp-prefix intervals are
    accumulated in a difference array (O(matches) memory, one cumsum)."""
    q = np.flatnonzero(lcp >= min_len)
    q = q[q > 0]
    if q.size == 0:
        return np.zeros(n, bool)
    starts = np.concatenate([sa[q], sa[q - 1]])
    lens = np.concatenate([lcp[q], lcp[q]])
    diff = np.zeros(n + 1, np.int64)
    np.add.at(diff, starts, 1)
    np.add.at(diff, starts + lens, -1)
    return np.cumsum(diff[:n]) > 0


def window_duplicated_mask(lcp: np.ndarray, rank: np.ndarray,
                           window: int) -> np.ndarray:
    """Per-POSITION mask: True where the ``window``-token substring
    starting here occurs ≥2 times. Equal prefixes are adjacent in SA
    order, so the window at text position p repeats iff one of the two
    adjacent LCP values at rank[p] reaches ``window``."""
    n = rank.size
    left = lcp[rank]                       # lcp(sa[r-1], sa[r])
    right = np.zeros(n, np.int64)
    has_next = rank < n - 1
    right[has_next] = lcp[rank[has_next] + 1]
    return np.maximum(left, right) >= window


def _hash_tokens_stage(text_col: str, id_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        from ir_base_ray.functions.analyzer import analyze_simple_flat
        from ir_base_ray.functions.ckernels import md5_prefix64_strings

        flat, cnt = analyze_simple_flat(batch.column(text_col))
        hashes = md5_prefix64_strings(flat).view(np.int64)
        offs = np.zeros(cnt.size + 1, np.int64)
        np.cumsum(cnt, out=offs[1:])
        lists = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32), pa.int32()),
            pa.array(hashes, pa.int64()))
        return pa.table({id_col: batch.column(id_col), "hashes": lists})

    return fn


def _concat_with_separators(cnt: np.ndarray, ids: np.ndarray, vocab: int):
    """Doc-major sequence with one DISTINCT separator id between docs.
    Returns (seq, doc start offsets in seq) — fully vectorized."""
    n_docs = cnt.size
    starts = np.zeros(n_docs, np.int64)
    if n_docs > 1:
        np.cumsum(cnt[:-1] + 1, out=starts[1:])
    total = int(cnt.sum()) + max(n_docs - 1, 0)
    seq = np.empty(total, np.int64)
    tok_mask = np.ones(total, bool)
    if n_docs > 1:
        sep_pos = starts[1:] - 1
        seq[sep_pos] = vocab + np.arange(1, n_docs, dtype=np.int64)
        tok_mask[sep_pos] = False
    seq[tok_mask] = ids
    return seq, starts


@ray.remote
def _sa_shard_task(block_refs: list, lo: int, hi: int, min_len: int,
                   id_col: str):
    """One shard: filter [lo, hi) doc_ids from the hashed blocks, concat
    doc_id-ascending with distinct separators, SA + LCP + coverage, emit
    per-doc maximal spans and (n_tokens, dup_tokens) stats."""
    blocks = []
    for r in block_refs:
        b = ray.get(r) if isinstance(r, ray.ObjectRef) else r
        if b.num_rows == 0:
            continue
        d = b.column(id_col).to_numpy()
        m = (d >= lo) & (d < hi)
        if m.any():
            blocks.append(b.filter(pa.array(m)))
    empty_spans = pa.table({id_col: pa.array([], pa.int64()),
                            "span_start": pa.array([], pa.int64()),
                            "span_end": pa.array([], pa.int64())})
    empty_stats = pa.table({id_col: pa.array([], pa.int64()),
                            "n_tokens": pa.array([], pa.int64()),
                            "dup_tokens": pa.array([], pa.int64())})
    if not blocks:
        return empty_spans, empty_stats
    tbl = pa.concat_tables(blocks)
    order = pc.sort_indices(tbl, sort_keys=[(id_col, "ascending")])
    tbl = tbl.take(order)
    doc_ids = tbl.column(id_col).to_numpy()
    lists = tbl.column("hashes").combine_chunks()
    cnt = np.asarray(
        pc.list_value_length(lists).to_numpy(zero_copy_only=False),
        dtype=np.int64)
    flat = lists.flatten().to_numpy(zero_copy_only=False)
    n_docs = cnt.size
    stats_base = pa.table({id_col: pa.array(doc_ids, pa.int64()),
                           "n_tokens": pa.array(cnt, pa.int64())})
    if flat.size == 0:
        return empty_spans, stats_base.append_column(
            "dup_tokens", pa.array(np.zeros(n_docs, np.int64), pa.int64()))
    # dense-rank hashes; separators take distinct ids past the vocabulary
    _, ids = np.unique(flat, return_inverse=True)
    vocab = int(ids.max()) + 1
    seq, starts = _concat_with_separators(cnt, ids.astype(np.int64), vocab)
    sa = suffix_array_prefix_doubling(seq)
    lcp = lcp_kasai(seq, sa)
    cov = duplicated_coverage(sa, lcp, seq.size, min_len)
    # stats: covered tokens per doc (separators are never covered)
    cov_idx = np.flatnonzero(cov)
    doc_of_cov = np.searchsorted(starts, cov_idx, side="right") - 1
    dup_tok = np.bincount(doc_of_cov, minlength=n_docs).astype(np.int64)
    stats = stats_base.append_column("dup_tokens",
                                     pa.array(dup_tok, pa.int64()))
    if cov_idx.size == 0:
        return empty_spans, stats
    # maximal runs (cannot cross separators: cov is False there)
    dm = np.diff(cov.astype(np.int8))
    run_s = np.flatnonzero(dm == 1) + 1
    run_e = np.flatnonzero(dm == -1) + 1
    if cov[0]:
        run_s = np.concatenate(([0], run_s))
    if cov[-1]:
        run_e = np.concatenate((run_e, [cov.size]))
    doc_of_run = np.searchsorted(starts, run_s, side="right") - 1
    spans = pa.table({
        id_col: pa.array(doc_ids[doc_of_run], pa.int64()),
        "span_start": pa.array(run_s - starts[doc_of_run], pa.int64()),
        "span_end": pa.array(run_e - starts[doc_of_run], pa.int64()),
    })
    return spans, stats


@ray.remote
def _id_range_task(block, id_col: str):
    b = ray.get(block) if isinstance(block, ray.ObjectRef) else block
    if b.num_rows == 0:
        return None
    d = b.column(id_col)
    return int(pc.min(d).as_py()), int(pc.max(d).as_py())


def _shard_outputs(docs_ds, *, min_len: int, num_shards: int,
                   id_col: str, text_col: str):
    hashed = docs_ds.map_batches(_hash_tokens_stage(text_col, id_col),
                                 batch_format="pyarrow")
    refs = hashed.to_arrow_refs()
    if not refs:
        return []
    if num_shards <= 1:
        bounds = [(-(1 << 62), 1 << 62)]
    else:
        # contiguous doc_id ranges (uniform-id assumption; duplicates are
        # found WITHIN a shard — the paper's merge step is the global
        # path). id range from tiny per-block remote min/max, no driver
        # block gather.
        ranges = ray.get([_id_range_task.remote(r, id_col) for r in refs])
        ranges = [x for x in ranges if x is not None]
        if not ranges:
            return []
        lo = min(a for a, _ in ranges)
        hi = max(b for _, b in ranges) + 1
        edges = np.linspace(lo, hi, num_shards + 1).astype(np.int64)
        edges[-1] = hi
        bounds = [(int(edges[i]), int(edges[i + 1]))
                  for i in range(num_shards)]
    return ray.get([_sa_shard_task.remote(refs, lo, hi, min_len, id_col)
                    for lo, hi in bounds])


def suffix_dup_spans(docs_ds, *, min_len: int = 50, num_shards: int = 1,
                     id_col: str = "doc_id", text_col: str = "text"):
    """→ Dataset of (doc_id, span_start, span_end): the maximal token-index
    runs [start, end) of each doc covered by some duplicated substring of
    ≥ ``min_len`` tokens (simple-analyzer tokens), anywhere in the shard."""
    outs = _shard_outputs(docs_ds, min_len=min_len, num_shards=num_shards,
                          id_col=id_col, text_col=text_col)
    if not outs:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "span_start": pa.array([], pa.int64()),
            "span_end": pa.array([], pa.int64())}))
    return ray.data.from_arrow(pa.concat_tables([s for s, _ in outs]))


def suffix_dup_stats(docs_ds, *, min_len: int = 50, num_shards: int = 1,
                     id_col: str = "doc_id", text_col: str = "text"):
    """→ Dataset of (doc_id, n_tokens, dup_tokens): per-doc token count and
    the count of tokens inside duplicated ≥ ``min_len`` spans — the
    actionable cut signal of the Lee et al. suffix-array engine."""
    outs = _shard_outputs(docs_ds, min_len=min_len, num_shards=num_shards,
                          id_col=id_col, text_col=text_col)
    if not outs:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "dup_tokens": pa.array([], pa.int64())}))
    return ray.data.from_arrow(pa.concat_tables([t for _, t in outs]))
