"""Analyzer stage: stateful actor-pool `map_batches` over Arrow batches.

Ray-native analog of the reference's per-core analyzer pool
(``MultiThreadedUserAnalyzer.java:39-62,84-110``): the stemmer cache, stopword
set and compiled regexes are built once per actor in ``__init__``; each
``__call__`` analyzes one Arrow batch and emits per-doc term vectors.

Output schema per doc:
  (carried id cols...), terms: list<string>, tfs: list<int64>,
  doc_len: int64 (Σ tf — ``_DocBase.calcTotalLength``, includes n-grams),
  n_terms: int64 (distinct terms — ``getDocLength``),
  stopword_cnt, raw_cnt (TokenizeResult side stats)

Docs with ``n_terms <= length_threshold`` are dropped HERE, before any stats
aggregation — the filter-then-aggregate ordering that makes the reference's
DF/TTF rollback (``Analyzer.java:156-186``) unnecessary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ir_base_ray.config import AnalyzerSpec
from ir_base_ray.functions.analyzer import (
    _SIMPLE_DIGITS,
    _SIMPLE_STRIP,
    Analyzer,
    analyze_simple,
)
from ir_base_ray.sources.stopwords import load_stopwords


class AnalyzerActor:
    def __init__(self, spec: AnalyzerSpec | None = None, text_col: str = "text",
                 keep_cols: tuple = ("doc_id",), id_map_ref=None, id_key: str = "url",
                 id_col: str = "doc_id", vocab_ref=None):
        spec = spec or AnalyzerSpec()
        self.spec = spec
        self.text_col = text_col
        self.keep_cols = keep_cols
        # frozen controlled vocabulary (S8 LoadCV): when set, out-of-vocab
        # tokens are silently dropped from the term vector AND from doc_len —
        # ``constructSpVct`` with CV loaded, ``DocAnalyzer.java:406-419``
        self._vocab = frozenset(ray.get(vocab_ref)) if vocab_ref is not None else None
        # broadcast url→doc_id map (driver_key_id_map): resolved ONCE per
        # actor from the local object store; id assignment happens inline so
        # no separate map stage and no shuffle of the text column
        self._id_index = ray.get(id_map_ref) if id_map_ref is not None else None
        self._id_key = id_key
        self._id_col = id_col
        if spec.mode == "full":
            stopwords = load_stopwords(spec.stopwords_path)
            self._analyzer = Analyzer(ngram=spec.ngram, stopwords=stopwords,
                                      lang=spec.lang)
            self._count = self._analyzer.term_counts
        else:
            from collections import Counter

            self._analyzer = None
            self._count = lambda text: Counter(analyze_simple(text))
        # the Arrow-vectorized batch path applies whenever emission is
        # chunk-local (no cross-chunk n-grams): simple mode always, full mode
        # at ngram == 1 — the headline index-build configuration
        # (IR_ANALYZE_VECTORIZED=0 forces the per-doc walk, for A/B profiling)
        import os

        self._vectorizable = (spec.mode != "full" or spec.ngram == 1) \
            and os.environ.get("IR_ANALYZE_VECTORIZED", "1") != "0"
        # cache: whitespace chunk → tuple of EMITTED terms (legit, in-vocab),
        # the final per-chunk emission after every filter — one dict hit per
        # unique chunk per batch replaces all per-occurrence work
        self._chunk_terms_cache: dict[str, tuple] = {}
        # grow-only scratch for the C expand-count kernel (BASELINE.md §8
        # pattern: never materialize occurrence-sized fresh temporaries)
        self._scr: dict[str, "np.ndarray"] = {}

    def _scratch(self, name: str, n: int, dtype, fill=None) -> "np.ndarray":
        buf = self._scr.get(name)
        if buf is None or len(buf) < n:
            cap = max(n, 1024, 0 if buf is None else len(buf) * 2)
            buf = np.empty(cap, dtype) if fill is None else np.full(cap, fill, dtype)
            self._scr[name] = buf
        return buf

    def _chunk_terms(self, chunk: str) -> tuple:
        hit = self._chunk_terms_cache.get(chunk)
        if hit is not None:
            return hit
        if self._analyzer is not None:
            ts = tuple(t for t, legit in self._analyzer._analyze_chunk(chunk) if legit)
        else:
            t = _SIMPLE_STRIP.sub("", chunk).lower()
            if t:
                ts = ("NUM",) if _SIMPLE_DIGITS.match(t) else (t,)
            else:
                ts = ()
        if self._vocab is not None:
            ts = tuple(t for t in ts if t in self._vocab)
        if len(self._chunk_terms_cache) < 2_000_000:
            self._chunk_terms_cache[chunk] = ts
        return ts

    def _call_vectorized(self, batch: pa.Table) -> pa.Table:
        """Arrow/numpy batch path, bit-identical to the per-doc walk.

        utf8_split_whitespace (verified token-equal to Python ``str.split``
        modulo empty edge chunks that emit nothing) → dictionary-encode the
        flat chunk column → analyze each batch-UNIQUE chunk once through the
        cache → expand-count to per-doc (term, tf) in first-occurrence order
        via the C kernel over grow-only per-actor scratch (numpy
        repeat/factorize twin kept as the no-compiler fallback)."""
        texts = batch.column(self.text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        ndocs = len(lists)
        n_per_doc = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        n_per_doc = n_per_doc.astype(np.int32, copy=False)
        flat = lists.flatten()
        enc = flat.dictionary_encode()
        occ_ids = enc.indices.to_numpy(zero_copy_only=False)
        occ_ids = occ_ids.astype(np.int32, copy=False)
        uniq_chunks = enc.dictionary.to_pylist()

        # per-unique-chunk emissions, interned into per-batch local term ids
        local_terms: dict[str, int] = {}
        chunk_term_ids: list[int] = []
        term_offsets = np.empty(len(uniq_chunks) + 1, np.int64)
        term_offsets[0] = 0
        chunk_terms = self._chunk_terms
        for i, ch in enumerate(uniq_chunks):
            for t in chunk_terms(ch):
                tid = local_terms.get(t)
                if tid is None:
                    tid = len(local_terms)
                    local_terms[t] = tid
                chunk_term_ids.append(tid)
            term_offsets[i + 1] = len(chunk_term_ids)
        chunk_term_ids = np.asarray(chunk_term_ids, np.int64)

        from ir_base_ray.functions.ckernels import analyze_kernel

        lib = analyze_kernel()
        if lib is not None:
            out_term_f, tf_f, keep, kept_n_terms, kept_doc_len = self._expand_c(
                lib, occ_ids, n_per_doc, ndocs, term_offsets, chunk_term_ids,
                len(local_terms))
        else:
            out_term_f, tf_f, keep, kept_n_terms, kept_doc_len = self._expand_numpy(
                occ_ids, n_per_doc, ndocs, term_offsets, chunk_term_ids,
                len(local_terms))
        offs = np.zeros(len(kept_n_terms) + 1, np.int32)
        np.cumsum(kept_n_terms, out=offs[1:])

        term_dict_arr = pa.array(list(local_terms), pa.string())
        term_values = pc.take(term_dict_arr, pa.array(out_term_f, pa.int64()))
        offs_arr = pa.array(offs, pa.int32())

        mask = pa.array(keep)
        cols = {}
        if self._id_index is not None:
            keys = batch.column(self._id_key).to_numpy(zero_copy_only=False)
            ids = self._id_index.get_indexer(keys)
            cols[self._id_col] = pa.array(ids, pa.int64()).filter(mask)
        for c in self.keep_cols:
            if c in batch.column_names and c not in cols:
                cols[c] = batch.column(c).filter(mask)
        cols["terms"] = pa.ListArray.from_arrays(offs_arr, term_values)
        cols["tfs"] = pa.ListArray.from_arrays(offs_arr, pa.array(tf_f, pa.int64()))
        cols["doc_len"] = pa.array(kept_doc_len, pa.int64())
        cols["n_terms"] = pa.array(kept_n_terms, pa.int64())
        return pa.table(cols)

    def _expand_c(self, lib, occ_ids, n_per_doc, ndocs, term_offsets,
                  chunk_term_ids, n_local_terms):
        """C expand-count over grow-only scratch: the only fresh allocation
        per batch is the output tf copy. Returns fresh (non-scratch) arrays
        except out_term, which the caller consumes immediately via take."""
        import ctypes

        def p64(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

        def p32(a):
            return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

        total = int(lib.analyze_total(p32(occ_ids), len(occ_ids),
                                      p64(term_offsets)))
        last_doc = self._scratch("last_doc", n_local_terms, np.int64, fill=-1)
        slot = self._scratch("slot", n_local_terms, np.int64)
        out_term = self._scratch("out_term", total, np.int64)
        out_tf = self._scratch("out_tf", total, np.int64)
        n_terms = self._scratch("n_terms", ndocs, np.int64)
        doc_len = self._scratch("doc_len", ndocs, np.int64)
        keep_u8 = self._scratch("keep", ndocs, np.uint8)
        out_n = int(lib.analyze_count(
            p32(occ_ids), p32(n_per_doc), ndocs, p64(term_offsets),
            p64(chunk_term_ids), int(self.spec.length_threshold),
            p64(last_doc), p64(slot), p64(out_term), p64(out_tf),
            p64(n_terms), p64(doc_len),
            keep_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))))
        keep = keep_u8[:ndocs].view(bool).copy()
        return (out_term[:out_n], out_tf[:out_n].copy(), keep,
                n_terms[:ndocs][keep], doc_len[:ndocs][keep])

    def _expand_numpy(self, occ_ids, n_per_doc, ndocs, term_offsets,
                      chunk_term_ids, n_local_terms):
        """numpy twin of ``_expand_c`` (repeat → factorize → bincount);
        first-appearance factorize order == the per-doc walk's order."""
        import pandas as pd

        k_per_chunk = np.diff(term_offsets)
        k_occ = k_per_chunk[occ_ids]
        total = int(k_occ.sum())
        doc_occ = np.repeat(np.arange(ndocs, dtype=np.int64),
                            n_per_doc.astype(np.int64))
        if total:
            seg_end = np.cumsum(k_occ)
            intra = np.arange(total, dtype=np.int64) - np.repeat(seg_end - k_occ, k_occ)
            occ_terms = chunk_term_ids[np.repeat(term_offsets[:-1][occ_ids], k_occ) + intra]
            doc_term = np.repeat(doc_occ, k_occ)
            nt = max(n_local_terms, 1)
            codes, uniq_keys = pd.factorize(doc_term * nt + occ_terms)
            tf = np.bincount(codes).astype(np.int64)
            out_doc = uniq_keys // nt
            out_term = uniq_keys % nt
        else:
            tf = out_doc = out_term = np.empty(0, np.int64)

        n_terms = np.bincount(out_doc, minlength=ndocs)
        doc_len = np.bincount(out_doc, weights=tf, minlength=ndocs).astype(np.int64)
        keep = n_terms > self.spec.length_threshold
        row_keep = keep[out_doc] if total else np.empty(0, bool)
        return (out_term[row_keep], tf[row_keep], keep,
                n_terms[keep], doc_len[keep])

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._vectorizable:
            return self._call_vectorized(batch)
        texts = batch.column(self.text_col).to_pylist()
        terms_col: list[list[str]] = []
        tfs_col: list[list[int]] = []
        doc_len: list[int] = []
        n_terms: list[int] = []
        keep_mask: list[bool] = []
        for text in texts:
            counts = self._count(text or "")
            if self._vocab is not None:  # frozen CV: drop OOV (J1 anti-join)
                for t in [t for t in counts if t not in self._vocab]:
                    del counts[t]
            keep = len(counts) > self.spec.length_threshold
            keep_mask.append(keep)
            if not keep:
                continue
            # deterministic within-doc order: first-occurrence order is
            # Counter insertion order — stable and reproducible
            ts = list(counts.keys())
            fs = [counts[t] for t in ts]
            terms_col.append(ts)
            tfs_col.append(fs)
            doc_len.append(sum(fs))
            n_terms.append(len(ts))

        mask = pa.array(keep_mask, pa.bool_())
        cols = {}
        if self._id_index is not None:
            keys = batch.column(self._id_key).to_numpy(zero_copy_only=False)
            ids = self._id_index.get_indexer(keys)
            cols[self._id_col] = pa.array(ids, pa.int64()).filter(mask)
        for c in self.keep_cols:
            if c in batch.column_names and c not in cols:
                cols[c] = batch.column(c).filter(mask)
        cols["terms"] = pa.array(terms_col, pa.list_(pa.string()))
        cols["tfs"] = pa.array(tfs_col, pa.list_(pa.int64()))
        cols["doc_len"] = pa.array(doc_len, pa.int64())
        cols["n_terms"] = pa.array(n_terms, pa.int64())
        return pa.table(cols)


_PROCESS_ANALYZERS: dict = {}


def _analyze_batch(batch: pa.Table, *, spec, text_col, keep_cols, id_map_ref,
                   id_key, id_col, vocab_ref=None) -> pa.Table:
    """Task-based analyzer with per-PROCESS state cache: the stemmer /
    stopword set / broadcast id map are built once per worker process (same
    load-once semantics as the actor pool) but the work runs on Ray's shared
    pre-started task workers — no actor-pool spawn barrier, and the worker
    processes (with warm allocator arenas) are reused by neighbouring stages."""
    key = (spec, text_col, keep_cols, id_key, id_col,
           id_map_ref.hex() if id_map_ref is not None else None,
           vocab_ref.hex() if vocab_ref is not None else None)
    analyzer = _PROCESS_ANALYZERS.get(key)
    if analyzer is None:
        analyzer = AnalyzerActor(spec, text_col, keep_cols, id_map_ref, id_key,
                                 id_col, vocab_ref)
        _PROCESS_ANALYZERS[key] = analyzer
    return analyzer(batch)


def analyze_dataset(ds, spec: AnalyzerSpec | None = None, *, text_col: str = "text",
                    keep_cols: tuple = ("doc_id",), concurrency=4, batch_size: int = 1024,
                    num_cpus: float = 1, id_map_ref=None, id_key: str = "url",
                    id_col: str = "doc_id", use_actors: bool = False,
                    vocab_ref=None):
    """corpus Dataset → analyzed Dataset. With ``id_map_ref`` (a ``ray.put``
    sorted key Index), dense ids are assigned inline per batch instead of by
    an upstream sort stage. Default is the task-based path (per-process state
    cache — see :func:`_analyze_batch`); ``use_actors=True`` selects the
    explicit actor pool (``concurrency``/``batch_size`` apply)."""
    if use_actors:
        return ds.map_batches(
            AnalyzerActor,
            fn_constructor_kwargs={"spec": spec, "text_col": text_col, "keep_cols": keep_cols,
                                   "id_map_ref": id_map_ref, "id_key": id_key,
                                   "id_col": id_col, "vocab_ref": vocab_ref},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=num_cpus,
        )
    return ds.map_batches(
        _analyze_batch,
        fn_kwargs={"spec": spec, "text_col": text_col, "keep_cols": keep_cols,
                   "id_map_ref": id_map_ref, "id_key": id_key, "id_col": id_col,
                   "vocab_ref": vocab_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=num_cpus,
    )
