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
def _nrows_task(block):
    b = ray.get(block) if isinstance(block, ray.ObjectRef) else block
    return b.num_rows if hasattr(b, "num_rows") else len(b)


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


# ---------------------------------------------------------------------------
# Global (cross-shard-exact) duplicated spans via rolling window hashes.
#
# The suffix-array path above finds duplicates WITHIN a shard; the global
# path here has no shard assumption at all — it is a pure Ray Data shuffle
# (map_batches → multi-key groupby count → size-dispatched probe/join), so a
# duplicate whose two occurrences live on opposite ends of a 10¹²-token
# corpus is still found.
#
# Why it is the SAME output: a position p lies inside some duplicated
# substring of length ≥ L  ⇔  some EXACTLY-length-L token window containing
# p occurs ≥2 times in the corpus (⇐ immediate; ⇒ every length-L window of
# the duplicated span is itself duplicated, and one of them contains p).
# Coverage masks are therefore identical, so the maximal-run span output and
# the (n_tokens, dup_tokens) stats match the suffix-array path exactly —
# pinned by tests/test_suffix_dedup.py against single-shard suffix_dup_spans
# / suffix_dup_stats on planted fixtures (including intra-doc repeats).
#
# Window identity is a 128-bit key: two INDEPENDENT 64-bit wraparound
# polynomial hashes over the 64-bit MD5-prefix token ids (collision bound
# 2⁻¹²⁸ per pair; the token-id birthday bound in the module docstring still
# applies). Keys are position-independent via the mod-2⁶⁴ inverse of the
# multiplier: key(p) = (P[p+L] − P[p]) · M⁻ᵖ where P is the prefix sum of
# t[j]·Mʲ — one cumsum + one cumprod per batch, no per-window loop.

_WMUL1 = np.uint64(0x9E3779B97F4A7C15)  # odd → invertible mod 2^64
_WMUL2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _inv_u64(m: np.uint64) -> np.uint64:
    """2-adic Newton inverse of an odd multiplier mod 2^64 (x·m ≡ 1):
    x ← x(2 − mx) doubles correct low bits each round; m·m ≡ 1 (mod 8)
    seeds 3 bits, 6 rounds ≥ 64."""
    x = np.uint64(m)
    two = np.uint64(2)
    with np.errstate(over="ignore"):
        for _ in range(6):
            x = x * (two - m * x)
    return x


_WINV1 = _inv_u64(_WMUL1)
_WINV2 = _inv_u64(_WMUL2)


def _unpack_hashed(batch: pa.Table, id_col: str):
    """(doc_ids, per-doc token counts, flat doc-major token-hash array)
    from a ``_hash_tokens_stage`` output batch."""
    lists = batch.column("hashes").combine_chunks()
    cnt = np.asarray(
        pc.list_value_length(lists).to_numpy(zero_copy_only=False),
        dtype=np.int64)
    flat = np.ascontiguousarray(
        lists.flatten().to_numpy(zero_copy_only=False), dtype=np.int64)
    return batch.column(id_col).to_numpy(), cnt, flat


def _window_keys(flat: np.ndarray, cnt: np.ndarray, L: int):
    """Rolling 128-bit keys for every length-``L`` token window that lies
    wholly inside one doc. Returns (k1, k2, doc_of_w, pos_in_doc), all
    aligned; k1/k2 are int64 bit-views of the u64 keys."""
    n = flat.size
    n_docs = cnt.size
    wcnt = np.maximum(cnt - L + 1, 0)
    total = int(wcnt.sum())
    empty = np.empty(0, np.int64)
    if total == 0:
        return empty, empty, empty, empty
    starts = np.zeros(n_docs, np.int64)
    np.cumsum(cnt[:-1], out=starts[1:])
    wstarts = np.zeros(n_docs, np.int64)
    np.cumsum(wcnt[:-1], out=wstarts[1:])
    doc_of_w = np.repeat(np.arange(n_docs, dtype=np.int64), wcnt)
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(wstarts, wcnt)
    p = starts[doc_of_w] + pos_in_doc
    t = flat.view(np.uint64)
    keys = []
    with np.errstate(over="ignore"):
        for mul, inv in ((_WMUL1, _WINV1), (_WMUL2, _WINV2)):
            pw = np.empty(n, np.uint64)
            pw[0] = 1
            if n > 1:
                np.cumprod(np.full(n - 1, mul, np.uint64), out=pw[1:])
            pref = np.zeros(n + 1, np.uint64)
            np.cumsum(t * pw, out=pref[1:])
            ipw = np.empty(n, np.uint64)
            ipw[0] = 1
            if n > 1:
                np.cumprod(np.full(n - 1, inv, np.uint64), out=ipw[1:])
            keys.append(((pref[p + L] - pref[p]) * ipw[p]).view(np.int64))
    return keys[0], keys[1], doc_of_w, pos_in_doc


def _probe_sorted_pairs(q1, q2, k1s, k2s):
    """Vectorized membership of (q1, q2) pairs in the lexsorted key arrays
    (k1s primary, k2s secondary; u64 order). Equal-k1 runs longer than one
    (64-bit collisions between distinct duplicated windows) fall back to a
    tiny per-hit binary search."""
    q1 = q1.view(np.uint64)
    q2 = q2.view(np.uint64)
    hit = np.zeros(q1.size, bool)
    if k1s.size == 0 or q1.size == 0:
        return hit
    lo = np.searchsorted(k1s, q1, side="left")
    hi = np.searchsorted(k1s, q1, side="right")
    one = hi - lo == 1
    hit[one] = k2s[lo[one]] == q2[one]
    for i in np.flatnonzero(hi - lo > 1):
        seg = k2s[lo[i]:hi[i]]
        j = np.searchsorted(seg, q2[i])
        hit[i] = j < seg.size and seg[j] == q2[i]
    return hit


def _runs_stats_from_hits(doc_ids, cnt, doc_of_hit, pos_of_hit, L, id_col):
    """Coverage → (spans table, stats table) for one hashed batch. Uses the
    separator-padded position layout (one never-covered gap id between
    docs) so maximal runs cannot cross doc boundaries."""
    n_docs = cnt.size
    pad_starts = np.zeros(n_docs, np.int64)
    if n_docs > 1:
        np.cumsum(cnt[:-1] + 1, out=pad_starts[1:])
    pad_len = int(cnt.sum()) + max(n_docs - 1, 0)
    diff = np.zeros(pad_len + 1, np.int64)
    hp = pad_starts[doc_of_hit] + pos_of_hit
    np.add.at(diff, hp, 1)
    np.add.at(diff, hp + L, -1)
    cov = np.cumsum(diff[:pad_len]) > 0
    cov_idx = np.flatnonzero(cov)
    doc_of_cov = np.searchsorted(pad_starts, cov_idx, side="right") - 1
    dup_tok = np.bincount(doc_of_cov, minlength=n_docs).astype(np.int64)
    stats = pa.table({id_col: pa.array(doc_ids, pa.int64()),
                      "n_tokens": pa.array(cnt, pa.int64()),
                      "dup_tokens": pa.array(dup_tok, pa.int64())})
    if cov_idx.size == 0:
        spans = pa.table({id_col: pa.array([], pa.int64()),
                          "span_start": pa.array([], pa.int64()),
                          "span_end": pa.array([], pa.int64())})
        return spans, stats
    dm = np.diff(cov.astype(np.int8))
    run_s = np.flatnonzero(dm == 1) + 1
    run_e = np.flatnonzero(dm == -1) + 1
    if cov[0]:
        run_s = np.concatenate(([0], run_s))
    if cov[-1]:
        run_e = np.concatenate((run_e, [cov.size]))
    doc_of_run = np.searchsorted(pad_starts, run_s, side="right") - 1
    spans = pa.table({
        id_col: pa.array(doc_ids[doc_of_run], pa.int64()),
        "span_start": pa.array(run_s - pad_starts[doc_of_run], pa.int64()),
        "span_end": pa.array(run_e - pad_starts[doc_of_run], pa.int64()),
    })
    return spans, stats


def _global_dup_keys(hashed, min_len: int, id_col: str):
    """Materialized Dataset of the (k1, k2) window keys occurring ≥2 times
    corpus-wide: per-batch partial counts (lexsort run-length — head
    windows cost #batches rows in the shuffle, not #occurrences) → one
    multi-key groupby-sum → filter."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        _, cnt, flat = _unpack_hashed(batch, id_col)
        k1, k2, _, _ = _window_keys(flat, cnt, min_len)
        if k1.size == 0:
            return pa.table({"k1": pa.array([], pa.int64()),
                             "k2": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        order = np.lexsort((k2.view(np.uint64), k1.view(np.uint64)))
        k1s, k2s = k1[order], k2[order]
        new = np.empty(k1s.size, bool)
        new[0] = True
        new[1:] = (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])
        idx = np.flatnonzero(new)
        n = np.diff(np.append(idx, k1s.size))
        return pa.table({"k1": pa.array(k1s[idx], pa.int64()),
                         "k2": pa.array(k2s[idx], pa.int64()),
                         "n": pa.array(n, pa.int64())})

    def keep_dups(batch: pa.Table) -> pa.Table:
        return (batch.filter(pc.greater_equal(batch.column("n_total"), 2))
                .select(["k1", "k2"]))

    return (hashed.map_batches(partial_counts, batch_format="pyarrow")
            .groupby(["k1", "k2"])
            .aggregate(Sum("n", alias_name="n_total"))
            .map_batches(keep_dups, batch_format="pyarrow")
            .materialize())


def _global_outputs(docs_ds, *, min_len: int, id_col: str, text_col: str,
                    dup_broadcast_max: int, num_partitions: int, want: str):
    hashed = docs_ds.map_batches(_hash_tokens_stage(text_col, id_col),
                                 batch_format="pyarrow").materialize()
    dups = _global_dup_keys(hashed, min_len, id_col)
    n_dup = dups.count()

    empty_spans = pa.table({id_col: pa.array([], pa.int64()),
                            "span_start": pa.array([], pa.int64()),
                            "span_end": pa.array([], pa.int64())})

    if n_dup == 0:
        if want == "spans":
            return ray.data.from_arrow(empty_spans)

        def zero_stats(batch: pa.Table) -> pa.Table:
            doc_ids, cnt, _ = _unpack_hashed(batch, id_col)
            return pa.table({
                id_col: pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(cnt, pa.int64()),
                "dup_tokens": pa.array(np.zeros(cnt.size, np.int64),
                                       pa.int64())})

        return hashed.map_batches(zero_stats, batch_format="pyarrow")

    if n_dup <= dup_broadcast_max:
        # broadcast arm: lexsorted key arrays shipped once (ray.put),
        # probed vectorized inside map_batches — no second shuffle.
        dup_df = dups.to_pandas()
        k1s = dup_df["k1"].to_numpy().view(np.uint64)
        k2s = dup_df["k2"].to_numpy().view(np.uint64)
        order = np.lexsort((k2s, k1s))
        keys_ref = ray.put((np.ascontiguousarray(k1s[order]),
                            np.ascontiguousarray(k2s[order])))

        def per_batch(batch: pa.Table) -> pa.Table:
            doc_ids, cnt, flat = _unpack_hashed(batch, id_col)
            k1, k2, doc_of_w, pos = _window_keys(flat, cnt, min_len)
            sk1, sk2 = ray.get(keys_ref)
            hit = _probe_sorted_pairs(k1, k2, sk1, sk2)
            spans, stats = _runs_stats_from_hits(
                doc_ids, cnt, doc_of_w[hit], pos[hit], min_len, id_col)
            return spans if want == "spans" else stats

        return hashed.map_batches(per_batch, batch_format="pyarrow")

    # distributed arm: emit (doc_id, pos, k1, k2) window rows and inner-join
    # on the duplicated keys (shuffle keyed by the 128-bit window key — no
    # driver gather of anything corpus-sized), then per-doc coverage via
    # groupby(doc_id).map_groups.
    def emit_windows(batch: pa.Table) -> pa.Table:
        doc_ids, cnt, flat = _unpack_hashed(batch, id_col)
        k1, k2, doc_of_w, pos = _window_keys(flat, cnt, min_len)
        return pa.table({id_col: pa.array(doc_ids[doc_of_w], pa.int64()),
                         "pos": pa.array(pos, pa.int64()),
                         "k1": pa.array(k1, pa.int64()),
                         "k2": pa.array(k2, pa.int64())})

    matched = (hashed.map_batches(emit_windows, batch_format="pyarrow")
               .join(dups, "inner", num_partitions, on=("k1", "k2")))

    import pandas as pd

    def runs_of_doc(df: pd.DataFrame) -> pd.DataFrame:
        doc = int(df[id_col].iloc[0])
        pos = np.sort(df["pos"].to_numpy())
        length = int(pos[-1]) + min_len
        diff = np.zeros(length + 1, np.int64)
        np.add.at(diff, pos, 1)
        np.add.at(diff, pos + min_len, -1)
        cov = np.cumsum(diff[:length]) > 0
        dm = np.diff(cov.astype(np.int8))
        run_s = np.flatnonzero(dm == 1) + 1
        run_e = np.flatnonzero(dm == -1) + 1
        if cov[0]:
            run_s = np.concatenate(([0], run_s))
        if cov[-1]:
            run_e = np.concatenate((run_e, [cov.size]))
        return pd.DataFrame({id_col: np.full(run_s.size, doc, np.int64),
                             "span_start": run_s.astype(np.int64),
                             "span_end": run_e.astype(np.int64)})

    spans = matched.groupby(id_col).map_groups(runs_of_doc,
                                               batch_format="pandas")
    if want == "spans":
        return spans

    # stats without a second join: union (doc_id, n_tokens, 0) rows with
    # (doc_id, 0, span_length) rows, then one groupby-sum — every doc
    # appears via the token side, dup-less docs sum to 0.
    from ray.data.aggregate import Sum

    def span_lengths(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(np.zeros(n, np.int64), pa.int64()),
            "dup_tokens": pc.cast(pc.subtract(batch.column("span_end"),
                                              batch.column("span_start")),
                                  pa.int64())})

    def doc_tokens(batch: pa.Table) -> pa.Table:
        doc_ids, cnt, _ = _unpack_hashed(batch, id_col)
        return pa.table({id_col: pa.array(doc_ids, pa.int64()),
                         "n_tokens": pa.array(cnt, pa.int64()),
                         "dup_tokens": pa.array(np.zeros(cnt.size, np.int64),
                                                pa.int64())})

    return (hashed.map_batches(doc_tokens, batch_format="pyarrow")
            .union(spans.map_batches(span_lengths, batch_format="pyarrow"))
            .groupby(id_col)
            .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                       Sum("dup_tokens", alias_name="dup_tokens")))


def global_dup_spans(docs_ds, *, min_len: int = 50, id_col: str = "doc_id",
                     text_col: str = "text",
                     dup_broadcast_max: int = 5_000_000,
                     num_partitions: int = 32):
    """→ Dataset of (doc_id, span_start, span_end): SAME contract as
    ``suffix_dup_spans`` but computed globally — duplicates are found across
    the whole corpus with no shard assumption, via the window-coverage
    equivalence documented above."""
    return _global_outputs(docs_ds, min_len=min_len, id_col=id_col,
                           text_col=text_col,
                           dup_broadcast_max=dup_broadcast_max,
                           num_partitions=num_partitions, want="spans")


def global_dup_stats(docs_ds, *, min_len: int = 50, id_col: str = "doc_id",
                     text_col: str = "text",
                     dup_broadcast_max: int = 5_000_000,
                     num_partitions: int = 32):
    """→ Dataset of (doc_id, n_tokens, dup_tokens): SAME contract as
    ``suffix_dup_stats`` but computed globally (see ``global_dup_spans``)."""
    return _global_outputs(docs_ds, min_len=min_len, id_col=id_col,
                           text_col=text_col,
                           dup_broadcast_max=dup_broadcast_max,
                           num_partitions=num_partitions, want="stats")


def _cut_batch(texts, doc_ids, run_s_flat, run_e_flat, id_col: str):
    """Vectorized cut of one batch: tokenize (Arrow), mark the [run_s,
    run_e) token intervals covered, space-join the survivors. ``run_s/e``
    are flat np arrays of per-doc span bounds aligned with ``doc_of_run``
    offsets into the batch (see callers)."""
    from ir_base_ray.functions.analyzer import analyze_simple_flat

    flat, cnt = analyze_simple_flat(texts)
    n = len(flat)
    n_docs = cnt.size
    starts = np.zeros(n_docs, np.int64)
    if n_docs > 1:
        np.cumsum(cnt[:-1], out=starts[1:])
    diff = np.zeros(n + 1, np.int64)
    if run_s_flat.size:
        np.add.at(diff, run_s_flat, 1)
        np.add.at(diff, run_e_flat, -1)
    keep = np.cumsum(diff[:n]) == 0
    kept_cnt = (np.bincount(
        np.repeat(np.arange(n_docs, dtype=np.int64), cnt),
        weights=keep, minlength=n_docs).astype(np.int64)
        if n else np.zeros(n_docs, np.int64))
    offs = np.zeros(n_docs + 1, np.int64)
    np.cumsum(kept_cnt, out=offs[1:])
    kept = flat.filter(pa.array(keep)) if n else flat
    lists = pa.ListArray.from_arrays(
        pa.array(offs.astype(np.int32), pa.int32()), kept)
    return pa.table({id_col: pa.array(doc_ids, pa.int64()),
                     "clean_text": pc.binary_join(
                         lists.cast(pa.list_(pa.string())), " ")})


def global_dup_cut(docs_ds, *, min_len: int = 50, id_col: str = "doc_id",
                   text_col: str = "text",
                   dup_broadcast_max: int = 5_000_000,
                   num_partitions: int = 32):
    """The Lee et al. 2021 CUT step applied: → Dataset of
    (doc_id, clean_text) where ``clean_text`` is the doc's simple-mode
    tokens OUTSIDE duplicated ≥ ``min_len`` coverage, space-joined (the
    token-space cleaned corpus; every doc appears, fully-duplicated docs
    come back empty).

    Dispatch mirrors ``global_dup_stats``: under ``dup_broadcast_max``
    duplicated window keys the cut is a single extra ``map_batches`` over
    the raw corpus probing the broadcast key arrays; above it, the span
    Dataset from ``global_dup_spans`` is packed per doc (tiny groups, dup
    docs only) and hash-joined back to the corpus on ``doc_id`` — the text
    shuffles at most once, keyed. Both arms are pinned row-identical by
    tests/test_suffix_dedup.py."""
    hashed = docs_ds.map_batches(_hash_tokens_stage(text_col, id_col),
                                 batch_format="pyarrow").materialize()
    dups = _global_dup_keys(hashed, min_len, id_col)
    n_dup = dups.count()

    if n_dup == 0:
        def clean_all(batch: pa.Table) -> pa.Table:
            return _cut_batch(batch.column(text_col),
                              batch.column(id_col).to_numpy(),
                              np.empty(0, np.int64), np.empty(0, np.int64),
                              id_col)

        return docs_ds.map_batches(clean_all, batch_format="pyarrow")

    if n_dup <= dup_broadcast_max:
        dup_df = dups.to_pandas()
        k1s = dup_df["k1"].to_numpy().view(np.uint64)
        k2s = dup_df["k2"].to_numpy().view(np.uint64)
        order = np.lexsort((k2s, k1s))
        keys_ref = ray.put((np.ascontiguousarray(k1s[order]),
                            np.ascontiguousarray(k2s[order])))

        def cut_broadcast(batch: pa.Table) -> pa.Table:
            from ir_base_ray.functions.analyzer import analyze_simple_flat
            from ir_base_ray.functions.ckernels import md5_prefix64_strings

            flat, cnt = analyze_simple_flat(batch.column(text_col))
            hashes = md5_prefix64_strings(flat).view(np.int64)
            k1, k2, doc_of_w, pos = _window_keys(hashes, cnt, min_len)
            sk1, sk2 = ray.get(keys_ref)
            hit = _probe_sorted_pairs(k1, k2, sk1, sk2)
            n_docs = cnt.size
            starts = np.zeros(n_docs, np.int64)
            if n_docs > 1:
                np.cumsum(cnt[:-1], out=starts[1:])
            hs = starts[doc_of_w[hit]] + pos[hit]
            return _cut_batch(batch.column(text_col),
                              batch.column(id_col).to_numpy(),
                              hs, hs + min_len, id_col)

        return docs_ds.map_batches(cut_broadcast, batch_format="pyarrow")

    # distributed arm: per-doc span lists (dup docs only — each map_groups
    # group is one doc's handful of span rows) left_outer-joined to the
    # corpus on doc_id, then one vectorized cut pass per batch.
    import pandas as pd

    spans = global_dup_spans(docs_ds, min_len=min_len, id_col=id_col,
                             text_col=text_col,
                             dup_broadcast_max=dup_broadcast_max,
                             num_partitions=num_partitions)

    def pack_doc(df: pd.DataFrame) -> pd.DataFrame:
        # span bounds ride the join as ONE binary value per doc (Acero
        # joins reject nested/tensor payload columns): int64 starts then
        # ends, row-major
        order = np.argsort(df["span_start"].to_numpy())
        s = df["span_start"].to_numpy()[order].astype(np.int64)
        e = df["span_end"].to_numpy()[order].astype(np.int64)
        return pd.DataFrame({id_col: [int(df[id_col].iloc[0])],
                             "span_blob": [np.stack([s, e]).tobytes()]})

    # map_groups emits SCHEMA-LESS empty pandas blocks for group-free
    # shuffle partitions; Acero then fails the downstream join with
    # "No match ... FieldRef.Name(doc_id) on right side". Drop the empty
    # blocks by ref (num_rows probed remotely — blocks never reach the
    # driver; packed is the small side, one blob row per dup doc).
    packed_refs = (spans.groupby(id_col)
                   .map_groups(pack_doc, batch_format="pandas")
                   .to_arrow_refs())
    sizes = ray.get([_nrows_task.remote(r) for r in packed_refs])
    keep_refs = [r for r, n in zip(packed_refs, sizes) if n]
    packed = ray.data.from_arrow_refs(keep_refs)
    joined = docs_ds.select_columns([id_col, text_col]).join(
        packed, "left_outer", num_partitions, on=(id_col,))

    def cut_joined(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        doc_ids = batch.column(id_col).to_numpy()
        n_docs = len(batch)
        from ir_base_ray.functions.analyzer import analyze_simple_flat

        # doc offsets must come from THIS batch's tokenization
        _, cnt = analyze_simple_flat(texts)
        starts = np.zeros(n_docs, np.int64)
        if n_docs > 1:
            np.cumsum(cnt[:-1], out=starts[1:])
        # per-doc METADATA unpack (zero-copy frombuffer per dup doc — not a
        # token-level loop; clean docs are null and skipped)
        rs_parts, re_parts = [], []
        for i, b in enumerate(batch.column("span_blob").to_pylist()):
            if b:
                arr = np.frombuffer(b, np.int64).reshape(2, -1)
                rs_parts.append(arr[0] + starts[i])
                re_parts.append(arr[1] + starts[i])
        rs = (np.concatenate(rs_parts) if rs_parts
              else np.empty(0, np.int64))
        re_ = (np.concatenate(re_parts) if re_parts
               else np.empty(0, np.int64))
        return _cut_batch(texts, doc_ids, rs, re_, id_col)

    return joined.map_batches(cut_joined, batch_format="pyarrow")
