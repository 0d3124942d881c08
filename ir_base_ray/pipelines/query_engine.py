"""BM25 top-k query engine over the built index.

Scoring path (rank-identical to the conformance oracle, FIXTURES.md §5.3):

- query text runs through the SAME analyzer chain as documents (a query is a
  sparse vector exactly like the reference's sentence-vector queries,
  ``languageModelBaseLine.java:291-299``); OOV terms are silently dropped
  (J1 semantics, ``DocAnalyzer.java:406-419``).
- doc score = Σ_t qtf(t) · W4(t, d) — the sorted sparse dot product
  (``utils/Utils.java:380-399``) over index-time BM25 weights
  (``Analyzer/Analyzer.java:253-256``), accumulated in ascending term_id
  order (the intersection kernel's walk order) so float64 results are
  bit-identical.
- candidates are enumerated in ascending doc_id order and fed to
  ``BoundedTopK`` (MyPriorityQueue tie semantics, Q1).
- block-max pruning: posting blocks are chunk-ALIGNED across terms
  (chunk = doc_id // block_doc_range), so whole chunks are skipped when the
  queue is full and Σ_t max(qtf·block_max(t, chunk), 0) ≤ the current admission
  threshold. A skipped chunk can only contain docs whose add() would have been
  rejected (sound upper bound + strict > admission), so pruning preserves the
  EXACT insertion sequence — WAND-pruned results are bit- and tie-identical
  to the full scan.

Stateful query actors (T7): the dictionary, doc-length array and posting
blocks are loaded once per actor in ``__init__``; queries stream through
``map_batches`` batches. At multi-node scale each actor would hold one
doc_id-range segment and a merge task would combine per-segment heaps (the
merge preserves doc_id order, so tie semantics survive); single-node round 1
loads the whole (small) index per actor.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ir_base_ray.config import AnalyzerSpec
from ir_base_ray.perf import pool_size
from ir_base_ray.functions.analyzer import Analyzer, analyze_simple
from ir_base_ray.functions.codec import decode_postings, decode_postings_concat
from ir_base_ray.functions.scoring import bm25_idf_by_tid, bm25_weights_from_idf
from ir_base_ray.functions.topk import BoundedTopK
from ir_base_ray.sources.stopwords import load_stopwords


class _CTopK:
    """Queue facade over ckernels.merge_score_topk: same .full/.threshold/
    .result() surface as BoundedTopK, but insertion happens in one C call
    per candidate batch (T-way ascending-run merge + sequential float64
    segment sums + exact MyPriorityQueue tie semantics)."""

    __slots__ = ("k", "qs", "qi", "qlen", "_lib", "_seg")

    def __init__(self, k: int, lib, seg):
        self.k = k
        self.qs = np.empty(k + 1, np.float64)
        self.qi = np.empty(k + 1, np.int64)
        self.qlen = 0
        self._lib = lib
        self._seg = seg

    @property
    def full(self) -> bool:
        return self.qlen >= self.k

    @property
    def threshold(self) -> float:
        return float(self.qs[self.qlen - 1]) if self.qlen >= self.k else float("-inf")

    def insert_parts(self, parts_d: list, parts_w: list,
                     parts_g: list | None = None) -> None:
        import ctypes

        n = len(parts_d)
        if n == 0:
            return
        addr_d, addr_w, lens, grp, pos = self._seg._score_scratch(n)
        for i in range(n):
            addr_d[i] = parts_d[i].ctypes.data
            addr_w[i] = parts_w[i].ctypes.data
            lens[i] = parts_d[i].size
        if parts_g is None:
            grp[:n] = 0
        else:
            grp[:n] = parts_g
        P = ctypes.POINTER
        i64 = ctypes.c_int64
        self.qlen = int(self._lib.merge_score_topk(
            addr_d.ctypes.data_as(P(P(i64))),
            addr_w.ctypes.data_as(P(P(ctypes.c_double))),
            lens.ctypes.data_as(P(i64)), grp.ctypes.data_as(P(i64)),
            n, pos.ctypes.data_as(P(i64)), self.k,
            self.qs.ctypes.data_as(P(ctypes.c_double)),
            self.qi.ctypes.data_as(P(i64)), self.qlen))

    def result(self) -> list[tuple[float, int]]:
        return [(float(self.qs[i]), int(self.qi[i])) for i in range(self.qlen)]


class IndexSegment:
    """In-memory view of one built index (dictionary + doclens + postings).

    Hot-term cache: the first query touching a term decodes ALL its posting
    blocks once, computes the unit BM25 weight per posting (qtf excluded)
    vectorized, and caches ``(docs, w_unit, block chunks, block offsets,
    block maxes)``; later queries score that term with two array slices. The
    cache is capped by total cached postings (``term_cache_postings``,
    default 32M ≈ 0.5 GB) — cold terms beyond the cap are built transiently.
    At multi-node scale each segment actor holds one doc-range partition, so
    the cap bounds per-actor memory regardless of corpus size.

    ``prefetch_postings`` (default 8M) eagerly fills that cache with the
    top-DF terms at init, killing the cold-actor first-touch decode spike:
    measured on the sf0.1 index (1M docs), cold p95 drops 22.5 → 8.1 ms for
    ~0.2 s extra init. Set 0 to disable (lazy-only)."""

    def __init__(self, index_dir: str, term_cache_postings: int = 32_000_000,
                 prune_group_chunks: int = 64,
                 doc_range: tuple[int, int] | None = None,
                 prefetch_postings: int = 8_000_000):
        """``doc_range=(lo, hi)`` (chunk-aligned, i.e. multiples of
        block_doc_range) loads ONLY that doc-id slice of the index — the
        multi-node shape where each query actor holds one range shard and a
        merge combines per-shard heaps (see :class:`ShardedIndex`). Global
        stats (N, avgdl, dictionary, IDF) stay corpus-wide so shard scores
        are bit-identical to the whole-index scores."""
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.N = int(self.meta["N"])
        self.avgdl = float(self.meta["avgdl"])
        self.k1 = float(self.meta["bm25"]["k1"])
        self.b = float(self.meta["bm25"]["b"])
        self.block_doc_range = int(self.meta["block_doc_range"])
        if doc_range is not None and (doc_range[0] % self.block_doc_range):
            raise ValueError("doc_range must be chunk-aligned")

        dict_tbl = _read_parquet_dir(os.path.join(index_dir, "dict"))
        dict_pdf = dict_tbl.to_pandas().sort_values("term_id").reset_index(drop=True)
        self.term_index = pd.Index(dict_pdf["term"])
        self.df_by_tid = dict_pdf["df"].to_numpy()
        self.ttf_by_tid = dict_pdf["ttf"].to_numpy()
        self.idf_by_tid = bm25_idf_by_tid(self.N, self.df_by_tid)

        docs_tbl = _read_parquet_dir(os.path.join(index_dir, "docs"))
        doc_ids = docs_tbl.column("doc_id").to_numpy()
        doc_lens = docs_tbl.column("doc_len").to_numpy()
        if doc_range is not None:
            keep = (doc_ids >= doc_range[0]) & (doc_ids < doc_range[1])
            doc_ids, doc_lens = doc_ids[keep], doc_lens[keep]
            self._doc_off = int(doc_range[0])
            size = int(doc_range[1] - doc_range[0])
        else:
            self._doc_off = 0
            size = int(doc_ids.max()) + 1 if len(doc_ids) else 0
        self.doc_len = np.zeros(size, dtype=np.int64)
        self.doc_len[doc_ids - self._doc_off] = doc_lens
        # k1*(1-b+b*doclen/avgdl): the BM25 denominator's doc norm, shared by
        # every term (same association order as scoring.bm25_weights_from_idf)
        n = self.doc_len.astype(np.float64) / self.avgdl
        self._bm25_norm = self.k1 * (1 - self.b + self.b * n)

        post_tbl = _read_parquet_dir(os.path.join(index_dir, "postings"))
        if doc_range is not None:
            chunks = post_tbl.column("chunk").to_numpy()
            lo_c = doc_range[0] // self.block_doc_range
            hi_c = -(-doc_range[1] // self.block_doc_range)
            post_tbl = post_tbl.filter(
                pa.array((chunks >= lo_c) & (chunks < hi_c)))
        tid = post_tbl.column("term_id").to_numpy()
        order = np.lexsort((post_tbl.column("chunk").to_numpy(), tid))
        self._blk_tid = tid[order]
        self._blk_chunk = post_tbl.column("chunk").to_numpy()[order]
        self._blk_max = post_tbl.column("max_score").to_numpy()[order]
        db = post_tbl.column("doc_bytes")
        tb = post_tbl.column("tf_bytes")
        db_list = db.to_pylist()
        tb_list = tb.to_pylist()
        self._blk_doc_bytes = [db_list[i] for i in order]
        self._blk_tf_bytes = [tb_list[i] for i in order]
        # per-term block ranges
        self._tid_starts: dict[int, tuple[int, int]] = {}
        if self._blk_tid.size:
            bounds = np.flatnonzero(np.diff(self._blk_tid)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [self._blk_tid.size]))
            for s, e in zip(starts, ends):
                self._tid_starts[int(self._blk_tid[s])] = (int(s), int(e))
        self._terms: dict[int, tuple] = {}
        self._terms_postings = 0
        self._terms_cap = term_cache_postings
        self._prune_group = prune_group_chunks
        # Cold-tail prefetch: decode+weight the top-DF terms at init so the
        # first query touching a frequent term skips the decode spike (df ==
        # posting count, so descending df fills the budget with exactly the
        # terms whose cold first-touch is most expensive AND most likely to
        # appear in a query). Budget is bounded by both prefetch_postings
        # and the cache cap; per-term entries land in the same hot-term
        # cache the lazy path uses, so scoring is unchanged.
        if prefetch_postings and self._tid_starts:
            budget = min(int(prefetch_postings), self._terms_cap)
            present = np.fromiter(self._tid_starts.keys(), dtype=np.int64,
                                  count=len(self._tid_starts))
            dfs = self.df_by_tid[present]
            for i in np.argsort(-dfs, kind="stable"):
                if self._terms_postings + int(dfs[i]) > budget:
                    break
                self._term_postings(int(present[i]))

        spec = self.meta.get("analyzer", {})
        self.mode = spec.get("mode", "full")
        if self.mode == "full":
            self._analyzer = Analyzer(ngram=int(spec.get("ngram", 1)), stopwords=load_stopwords())
            self._term_counts = self._analyzer.term_counts
        else:
            from collections import Counter

            self._term_counts = lambda text: Counter(analyze_simple(text))

    def _decode_block(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        """Uncached single-block decode (LM ranker / diagnostics)."""
        return decode_postings(self._blk_doc_bytes[idx], self._blk_tf_bytes[idx])

    def _term_postings(self, tid: int):
        """tid → (docs asc, w_unit, blk_chunks, blk_offsets, blk_maxes) or
        None for index-absent terms. w_unit is the index-time BM25 weight per
        posting (query tf excluded); blk_offsets[i]:blk_offsets[i+1] is block
        i's slice of the concatenated arrays."""
        hit = self._terms.get(tid)
        if hit is not None:
            return hit
        rng = self._tid_starts.get(tid)
        if rng is None:
            return None
        s, e = rng
        # W4 with the denominator's doc-length norm precomputed per segment:
        # idf*TF*(k1+1) / (k1*(1-b+b*n) + TF) — identical op/association
        # order to scoring.bm25_weights_from_idf, so bit-identical float64.
        # Hot path fuses decode + weight in one C call (decode_weighted_kernel,
        # same float64 op order — pinned bit-equal by pytest).
        from ir_base_ray.functions.ckernels import decode_weighted_kernel

        lib = decode_weighted_kernel()
        if lib is not None:
            import ctypes

            doc_bufs = self._blk_doc_bytes[s:e]
            tf_bufs = self._blk_tf_bytes[s:e]
            doc_raw = np.frombuffer(
                doc_bufs[0] if len(doc_bufs) == 1 else b"".join(doc_bufs),
                dtype=np.uint8)
            tf_raw = np.frombuffer(
                tf_bufs[0] if len(tf_bufs) == 1 else b"".join(tf_bufs),
                dtype=np.uint8)
            n_vals = int(np.count_nonzero(doc_raw & 0x80))
            ends_b = np.cumsum(np.fromiter((len(x) for x in doc_bufs),
                                           dtype=np.int64, count=len(doc_bufs)))
            docs = np.empty(n_vals, dtype=np.int64)
            w = np.empty(n_vals, dtype=np.float64)
            counts = np.empty(len(doc_bufs), dtype=np.int64)
            P = ctypes.POINTER
            rc = lib.decode_weighted(
                doc_raw.ctypes.data_as(P(ctypes.c_uint8)), doc_raw.size,
                ends_b.ctypes.data_as(P(ctypes.c_int64)), len(doc_bufs),
                tf_raw.ctypes.data_as(P(ctypes.c_uint8)), tf_raw.size,
                float(self.idf_by_tid[tid]), self.k1 + 1,
                self._bm25_norm.ctypes.data_as(P(ctypes.c_double)),
                self._doc_off,
                docs.ctypes.data_as(P(ctypes.c_int64)),
                w.ctypes.data_as(P(ctypes.c_double)),
                counts.ctypes.data_as(P(ctypes.c_int64)))
            if rc != n_vals:
                raise ValueError("malformed posting stream")
        else:
            docs, tfs, counts = decode_postings_concat(
                self._blk_doc_bytes[s:e], self._blk_tf_bytes[s:e])
            TF = tfs.astype(np.float64)
            rel = docs - self._doc_off if self._doc_off else docs
            w = (self.idf_by_tid[tid] * TF * (self.k1 + 1)
                 / (self._bm25_norm[rel] + TF))
        offsets = np.concatenate(([0], np.cumsum(counts)))
        entry = (docs, w, self._blk_chunk[s:e], offsets, self._blk_max[s:e])
        if self._terms_postings + docs.size <= self._terms_cap:
            self._terms[tid] = entry
            self._terms_postings += docs.size
        return entry

    def _query_terms(self, text: str) -> list[tuple[float, tuple]]:
        tids, qtfs = self.query_vector(text)
        terms = []
        for tid, qtf in zip(tids.tolist(), qtfs.tolist()):
            tp = self._term_postings(int(tid))
            if tp is not None:
                terms.append((float(qtf), tp))
        return terms

    @staticmethod
    def _merge_terms(parts_d: list[np.ndarray], parts_w: list[np.ndarray]):
        """Posting slices appended in (chunk asc, tid asc) order → (unique
        docs asc, summed scores). The stable sort keeps each doc's
        contributions in ascending term_id order, so reduceat's left-to-right
        float64 adds replicate the reference's sorted-sparse-dot sum order
        bit-for-bit (utils/Utils.java:380-399)."""
        docs = np.concatenate(parts_d)
        ws = np.concatenate(parts_w)
        order = np.argsort(docs, kind="stable")
        docs = docs[order]
        ws = ws[order]
        starts = np.flatnonzero(np.concatenate(([True], docs[1:] != docs[:-1])))
        return docs[starts], np.add.reduceat(ws, starts)

    def query_vector(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        """query text → (tids ascending, qtfs). OOV dropped."""
        counts = self._term_counts(text)
        if not counts:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        terms = list(counts.keys())
        tids = self.term_index.get_indexer(terms)
        keep = tids >= 0
        tids = tids[keep]
        qtfs = np.array([counts[t] for t, k in zip(terms, keep) if k], dtype=np.float64)
        order = np.argsort(tids, kind="stable")
        return tids[order], qtfs[order]

    def scores(self, text: str):
        """Full candidate scoring: → (doc_ids ascending, scores) numpy arrays
        over every doc sharing ≥1 query term (no top-k truncation). Used by
        SQL-parity checks and downstream rankers."""
        terms = self._query_terms(text)
        if not terms:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return self._merge_terms([tp[0] for _, tp in terms],
                                 [qtf * tp[1] for qtf, tp in terms])

    def _make_queue(self, k: int):
        """C-fused queue when the kernel is available (one call does stable
        merge + segment sum + exact MyPriorityQueue admission — see
        ckernels.score_kernel; pinned tie-identical by pytest), else the
        Python BoundedTopK."""
        from ir_base_ray.functions.ckernels import score_kernel

        lib = score_kernel()
        return _CTopK(k, lib, self) if lib is not None else BoundedTopK(k)

    def _score_scratch(self, nparts: int):
        """Grow-only per-segment scratch for the fused merge kernel: part
        address/len/group arrays + the merge's per-run cursor array."""
        cur = getattr(self, "_sc_addr_d", None)
        if cur is None or cur.size < nparts:
            cap = max(nparts, 256)
            self._sc_addr_d = np.empty(cap, np.uint64)
            self._sc_addr_w = np.empty(cap, np.uint64)
            self._sc_lens = np.empty(cap, np.int64)
            self._sc_grp = np.empty(cap, np.int64)
            self._sc_pos = np.empty(cap, np.int64)
        return (self._sc_addr_d, self._sc_addr_w, self._sc_lens,
                self._sc_grp, self._sc_pos)

    @staticmethod
    def _queue_insert(queue: BoundedTopK, uniq: np.ndarray, scores: np.ndarray):
        """Feed (docs asc, scores) into the bounded queue. Once the queue is
        full, only scores STRICTLY above the admission threshold can enter and
        the threshold is non-decreasing, so prefiltering each slice by the
        threshold at slice start discards only candidates add() would reject —
        the surviving insertion sequence is identical to the naive loop."""
        i, n = 0, uniq.size
        while i < n:
            j = min(i + 4096, n)
            if queue.full:
                idx = np.flatnonzero(scores[i:j] > queue.threshold)
                for t in idx.tolist():
                    queue.add(float(scores[i + t]), int(uniq[i + t]))
            else:
                for d, s in zip(uniq[i:j].tolist(), scores[i:j].tolist()):
                    queue.add(s, d)
            i = j

    def topk(self, text: str, k: int, prune: bool = True) -> list[tuple[int, float]]:
        """Returns a LIST of ``(doc_id, score)`` tuples, best first, in the
        reference's exact ``MyPriorityQueue`` tie order — e.g.
        ``seg.topk("web search", 10)[0]`` is ``(best_doc_id, best_score)``.
        Empty / all-OOV queries return ``[]``.

        ``prune=True`` is block-max WAND at chunk granularity, vectorized in
        groups of ``prune_group_chunks``: chunks whose summed block-max upper
        bound ≤ the current admission threshold are dropped before any
        merge/score work. A skipped chunk can only contain docs whose add()
        would have been rejected (sound upper bound + strict > admission +
        non-decreasing threshold), so pruned results are bit- and
        tie-identical to the full scan."""
        terms = self._query_terms(text)
        if not terms:
            return []
        queue = self._make_queue(k)
        fused = isinstance(queue, _CTopK)
        if not prune:
            parts_d = [tp[0] for _, tp in terms]
            parts_w = [qtf * tp[1] for qtf, tp in terms]
            if fused:
                queue.insert_parts(parts_d, parts_w)
            else:
                uniq, scores = self._merge_terms(parts_d, parts_w)
                self._queue_insert(queue, uniq, scores)
            return [(doc, score) for score, doc in queue.result()]
        # per-query weighted posting arrays (one vectorized multiply per term)
        wq = [qtf * tp[1] for qtf, tp in terms]
        # chunk upper bounds: Σ_t max(qtf · block_max(t, chunk), 0). The clamp
        # at zero is required for soundness: a term with df > N/2 has negative
        # IDF (bm25_idf_exact is unclamped, mirroring the reference), so its
        # block-max is negative — but a doc ABSENT from that term contributes
        # exactly 0, not block_max, so summing the raw (negative) block-max
        # understates the chunk bound and prunes chunks holding true top-k
        # docs. max(·, 0) bounds both the present (≤ qtf·block_max ≤ 0 ≤ 0
        # when negative) and absent (= 0) cases.
        all_chunks = np.concatenate([tp[2] for _, tp in terms])
        all_ub = np.concatenate(
            [np.maximum(qtf * tp[4], 0.0) for qtf, tp in terms])
        order = np.argsort(all_chunks, kind="stable")
        sc = all_chunks[order]
        starts = np.flatnonzero(np.concatenate(([True], sc[1:] != sc[:-1])))
        uchunks = sc[starts]
        chunk_ub = np.add.reduceat(all_ub[order], starts)
        from ir_base_ray.functions.ckernels import wand_kernel

        wlib = wand_kernel()
        if wlib is not None:
            # entire chunk loop in one C call (ckernels.wand_topk): per-term
            # advancing block cursors + per-CHUNK threshold re-check — finer
            # pruning than the per-group check below, result-identical by the
            # same sound-upper-bound argument; pinned by pytest.
            import ctypes

            T = len(terms)
            addr_d, addr_w, lens, grp, pos3 = self._score_scratch(max(3 * T, 2 * T + 2))
            addr_c = np.empty(T, np.uint64)
            addr_o = np.empty(T, np.uint64)
            for t, ((_, tp), w) in enumerate(zip(terms, wq)):
                addr_d[t] = tp[0].ctypes.data
                addr_w[t] = w.ctypes.data
                addr_c[t] = tp[2].ctypes.data
                addr_o[t] = tp[3].ctypes.data
                lens[t] = tp[2].size
            if not uchunks.flags.c_contiguous:
                uchunks = np.ascontiguousarray(uchunks)
            qs = np.empty(k + 1, np.float64)
            qi = np.empty(k + 1, np.int64)
            P = ctypes.POINTER
            i64, f64 = ctypes.c_int64, ctypes.c_double
            qlen = int(wlib.wand_topk(
                addr_d.ctypes.data_as(P(P(i64))),
                addr_w.ctypes.data_as(P(P(f64))),
                addr_c.ctypes.data_as(P(P(i64))),
                addr_o.ctypes.data_as(P(P(i64))),
                lens.ctypes.data_as(P(i64)), T,
                uchunks.ctypes.data_as(P(i64)),
                chunk_ub.ctypes.data_as(P(f64)), uchunks.size, k,
                qs.ctypes.data_as(P(f64)), qi.ctypes.data_as(P(i64)), 0,
                pos3.ctypes.data_as(P(i64))))
            return [(int(qi[i]), float(qs[i])) for i in range(qlen)]
        G = self._prune_group
        for g0 in range(0, uchunks.size, G):
            cs = uchunks[g0:g0 + G]
            if queue.full:
                m = chunk_ub[g0:g0 + G] > queue.threshold
                if not m.any():
                    continue
                cs = cs[m]
            # vectorized per-term block ranges for the surviving chunks
            bounds = [(np.searchsorted(tp[2], cs), np.searchsorted(tp[2], cs, "right"))
                      for _, tp in terms]
            parts_d, parts_w, parts_g = [], [], []
            for j in range(cs.size):  # chunk ascending; terms tid-ascending
                for (_, tp), w, (lo, hi) in zip(terms, wq, bounds):
                    b0, b1 = lo[j], hi[j]
                    if b0 < b1:
                        s_, e_ = tp[3][b0], tp[3][b1]
                        parts_d.append(tp[0][s_:e_])
                        parts_w.append(w[s_:e_])
                        parts_g.append(j)
            if not parts_d:
                continue
            if fused:
                queue.insert_parts(parts_d, parts_w, parts_g)
            else:
                uniq, scores = self._merge_terms(parts_d, parts_w)
                self._queue_insert(queue, uniq, scores)
        return [(doc, score) for score, doc in queue.result()]


def _read_parquet_dir(path: str) -> pa.Table:
    files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return pa.concat_tables([pq.read_table(f) for f in files])


class QueryScorer:
    """Actor-pool UDF: batches of (query_id, text, k) → (query_id, rank,
    doc_id, score) rows."""

    def __init__(self, index_dir: str, default_k: int = 10, prune: bool = True):
        self.segment = IndexSegment(index_dir)
        self.default_k = default_k
        self.prune = prune

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids_out, ranks, docs, scores = [], [], [], []
        qids = batch.column("query_id").to_pylist()
        texts = batch.column("text").to_pylist()
        ks = (
            batch.column("k").to_pylist()
            if "k" in batch.column_names
            else [self.default_k] * len(qids)
        )
        for qid, text, k in zip(qids, texts, ks):
            for rank, (doc, score) in enumerate(self.segment.topk(text or "", int(k), self.prune)):
                qids_out.append(qid)
                ranks.append(rank)
                docs.append(doc)
                scores.append(score)
        return pa.table({
            "query_id": pa.array(qids_out, pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(scores, pa.float64()),
        })


@ray.remote
class _ShardActor:
    """One doc-range shard of the index, resident in an actor (T7 multi-node
    shape: each actor holds one range partition's postings + doc norms)."""

    def __init__(self, index_dir: str, doc_range: tuple[int, int]):
        self.seg = IndexSegment(index_dir, doc_range=doc_range)

    def topk_batch(self, texts, ks, prune=True):
        return [self.seg.topk(t or "", int(k), prune) for t, k in zip(texts, ks)]


class ShardedIndex:
    """Doc-range-sharded query engine: N shard actors, each loading only its
    chunk-aligned doc-id slice, plus a driver-side heap merge.

    Exactness: a shard's bounded queue rejects a candidate only when its
    score ≤ the shard-local threshold, which is ≤ the global queue's
    threshold at the same point of the global ascending-doc walk, so local
    survivors are a superset of the global queue's admissions; re-feeding
    each shard's survivors in ascending doc_id order (their original
    insertion order), shards in ascending range order, replays the exact
    global insertion sequence — results are bit- and tie-identical to a
    single whole-index segment (pytest-pinned)."""

    def __init__(self, index_dir: str, n_shards: int = 2):
        with open(os.path.join(index_dir, "meta.json")) as f:
            meta = json.load(f)
        n_docs = int(meta["N"])
        bdr = int(meta["block_doc_range"])
        n_chunks = -(-n_docs // bdr)
        per = max(1, -(-n_chunks // n_shards))
        self.ranges = []
        lo_c = 0
        while lo_c < n_chunks:
            hi_c = min(lo_c + per, n_chunks)
            self.ranges.append((lo_c * bdr, hi_c * bdr))
            lo_c = hi_c
        self.actors = [_ShardActor.remote(index_dir, r) for r in self.ranges]

    def topk(self, text: str, k: int, prune: bool = True) -> list[tuple[int, float]]:
        return self.topk_batch([text], [k], prune)[0]

    def topk_batch(self, texts, ks, prune: bool = True):
        per_shard = ray.get([a.topk_batch.remote(texts, ks, prune)
                             for a in self.actors])
        out = []
        for qi in range(len(texts)):
            queue = BoundedTopK(int(ks[qi]))
            for shard_res in per_shard:       # ascending doc-range order
                for doc, score in sorted(shard_res[qi]):  # ascending doc_id
                    queue.add(score, doc)
            out.append([(doc, score) for score, doc in queue.result()])
        return out


def search(queries_ds, index_dir: str, *, concurrency=2, batch_size: int = 64,
           default_k: int = 10, prune: bool = True):
    """queries Dataset → results Dataset via the stateful actor pool."""
    return queries_ds.map_batches(
        QueryScorer,
        fn_constructor_kwargs={"index_dir": index_dir, "default_k": default_k, "prune": prune},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
        num_cpus=1,
    )
