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

from ir_base_ray.config import AnalyzerSpec
from ir_base_ray.functions.analyzer import Analyzer, analyze_simple
from ir_base_ray.sources.stopwords import load_stopwords


class AnalyzerActor:
    def __init__(self, spec: AnalyzerSpec | None = None, text_col: str = "text", keep_cols: tuple = ("doc_id",)):
        spec = spec or AnalyzerSpec()
        self.spec = spec
        self.text_col = text_col
        self.keep_cols = keep_cols
        if spec.mode == "full":
            stopwords = load_stopwords(spec.stopwords_path)
            self._analyzer = Analyzer(ngram=spec.ngram, stopwords=stopwords)
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
        for c in self.keep_cols:
            if c in batch.column_names:
                cols[c] = batch.column(c).filter(mask)
        cols["terms"] = pa.array(terms_col, pa.list_(pa.string()))
        cols["tfs"] = pa.array(tfs_col, pa.list_(pa.int64()))
        cols["doc_len"] = pa.array(doc_len, pa.int64())
        cols["n_terms"] = pa.array(n_terms, pa.int64())
        return pa.table(cols)


def analyze_dataset(ds, spec: AnalyzerSpec | None = None, *, text_col: str = "text",
                    keep_cols: tuple = ("doc_id",), concurrency=4, batch_size: int = 1024,
                    num_cpus: float = 1):
    """corpus Dataset → analyzed Dataset via the actor pool."""
    return ds.map_batches(
        AnalyzerActor,
        fn_constructor_kwargs={"spec": spec, "text_col": text_col, "keep_cols": keep_cols},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
