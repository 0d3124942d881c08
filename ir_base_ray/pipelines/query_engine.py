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
  queue is full and Σ_t qtf·block_max(t, chunk) ≤ the current admission
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

from ir_base_ray.config import AnalyzerSpec
from ir_base_ray.perf import pool_size
from ir_base_ray.functions.analyzer import Analyzer, analyze_simple
from ir_base_ray.functions.codec import decode_postings
from ir_base_ray.functions.scoring import bm25_idf_by_tid, bm25_weights_from_idf
from ir_base_ray.functions.topk import BoundedTopK
from ir_base_ray.sources.stopwords import load_stopwords


class IndexSegment:
    """In-memory view of one built index (dictionary + doclens + postings)."""

    def __init__(self, index_dir: str, decoded_cache_blocks: int = 50_000):
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.N = int(self.meta["N"])
        self.avgdl = float(self.meta["avgdl"])
        self.k1 = float(self.meta["bm25"]["k1"])
        self.b = float(self.meta["bm25"]["b"])
        self.block_doc_range = int(self.meta["block_doc_range"])

        dict_tbl = _read_parquet_dir(os.path.join(index_dir, "dict"))
        dict_pdf = dict_tbl.to_pandas().sort_values("term_id").reset_index(drop=True)
        self.term_index = pd.Index(dict_pdf["term"])
        self.df_by_tid = dict_pdf["df"].to_numpy()
        self.ttf_by_tid = dict_pdf["ttf"].to_numpy()
        self.idf_by_tid = bm25_idf_by_tid(self.N, self.df_by_tid)

        docs_tbl = _read_parquet_dir(os.path.join(index_dir, "docs"))
        doc_ids = docs_tbl.column("doc_id").to_numpy()
        doc_lens = docs_tbl.column("doc_len").to_numpy()
        self.doc_len = np.zeros(int(doc_ids.max()) + 1 if len(doc_ids) else 0, dtype=np.int64)
        self.doc_len[doc_ids] = doc_lens

        post_tbl = _read_parquet_dir(os.path.join(index_dir, "postings"))
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
        self._decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._decoded_cap = decoded_cache_blocks

        spec = self.meta.get("analyzer", {})
        self.mode = spec.get("mode", "full")
        if self.mode == "full":
            self._analyzer = Analyzer(ngram=int(spec.get("ngram", 1)), stopwords=load_stopwords())
            self._term_counts = self._analyzer.term_counts
        else:
            from collections import Counter

            self._term_counts = lambda text: Counter(analyze_simple(text))

    def _decode_block(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._decoded.get(idx)
        if hit is not None:
            return hit
        out = decode_postings(self._blk_doc_bytes[idx], self._blk_tf_bytes[idx])
        if len(self._decoded) < self._decoded_cap:
            self._decoded[idx] = out
        return out

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
        tids, qtfs = self.query_vector(text)
        out_docs, out_scores = [], []
        if tids.size:
            chunk_set: dict[int, list[tuple[int, float, int]]] = {}
            for tid, qtf in zip(tids, qtfs):
                rng = self._tid_starts.get(int(tid))
                if rng is None:
                    continue
                for i in range(rng[0], rng[1]):
                    chunk_set.setdefault(int(self._blk_chunk[i]), []).append((i, qtf, int(tid)))
            for chunk in sorted(chunk_set):
                docs, ws = self._score_chunk(chunk_set[chunk])
                out_docs.append(docs)
                out_scores.append(ws)
        if not out_docs:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        return np.concatenate(out_docs), np.concatenate(out_scores)

    def _score_chunk(self, blocks):
        """blocks (tid-ascending) of ONE chunk → (unique docs asc, scores);
        float64 sum order = ascending term_id (J2 walk order)."""
        doc_parts, w_parts = [], []
        for i, qtf, tid in blocks:
            d, tf = self._decode_block(i)
            w = qtf * bm25_weights_from_idf(
                tf, self.doc_len[d], self.idf_by_tid[tid], self.avgdl,
                self.k1, self.b,
            )
            doc_parts.append(d)
            w_parts.append(w)
        docs = np.concatenate(doc_parts)
        ws = np.concatenate(w_parts)
        order = np.argsort(docs, kind="stable")
        docs = docs[order]
        ws = ws[order]
        starts = np.flatnonzero(np.concatenate(([True], docs[1:] != docs[:-1])))
        return docs[starts], np.add.reduceat(ws, starts)

    def topk(self, text: str, k: int, prune: bool = True) -> list[tuple[int, float]]:
        """Returns a LIST of ``(doc_id, score)`` tuples, best first, in the
        reference's exact ``MyPriorityQueue`` tie order — e.g.
        ``seg.topk("web search", 10)[0]`` is ``(best_doc_id, best_score)``.
        Empty / all-OOV queries return ``[]``."""
        tids, qtfs = self.query_vector(text)
        if tids.size == 0:
            return []
        # per query term: (block range, df)
        term_blocks = []
        chunk_set: dict[int, list[tuple[int, float, int]]] = {}
        for tid, qtf in zip(tids, qtfs):
            rng = self._tid_starts.get(int(tid))
            if rng is None:
                continue
            s, e = rng
            term_blocks.append((tid, qtf, s, e))
            for i in range(s, e):
                chunk_set.setdefault(int(self._blk_chunk[i]), []).append((i, qtf, tid))
        if not chunk_set:
            return []
        queue = BoundedTopK(k)
        for chunk in sorted(chunk_set):
            blocks = chunk_set[chunk]  # appended in tid-ascending order
            if prune and queue.full:
                ub = 0.0
                for i, qtf, _tid in blocks:
                    ub += qtf * self._blk_max[i]
                if ub <= queue.threshold:
                    continue
            uniq_docs, scores = self._score_chunk(blocks)
            for d, s in zip(uniq_docs.tolist(), scores.tolist()):
                queue.add(s, d)
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
