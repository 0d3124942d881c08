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

import pyarrow as pa

import ray

from ir_base_ray.config import AnalyzerSpec
from ir_base_ray.functions.analyzer import Analyzer, analyze_simple
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

            self._count = lambda text: Counter(analyze_simple(text))

    def __call__(self, batch: pa.Table) -> pa.Table:
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
            import numpy as np

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
