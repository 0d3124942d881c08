"""W1-W6 weighting schemes as Dataset→Dataset operators (SURVEY.md §2.7,
``Analyzer/Analyzer.java:189-326``): global stats (N, avgdl, DF) broadcast
once, then a vectorized per-batch transform rewrites each doc's sparse vector
values in place and computes per-doc avgIDF. Exact expression shapes of the
reference (see functions/scoring.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ir_base_ray.functions import scoring


def _apply_scheme(tf, dl, N, avgdl, df, scheme: str) -> np.ndarray:
    if scheme == "TFIDF":
        return scoring.tfidf(tf, dl, N, df)
    if scheme == "TFIDF-sublinear":
        return scoring.tfidf_sublinear(tf, N, df)
    if scheme == "BM25":
        return scoring.bm25(tf, dl, N, avgdl, df)
    if scheme == "PLN":
        return scoring.pln(tf, dl, N, avgdl, df)
    return np.asarray(tf, dtype=np.float64)  # "TF" default: raw counts kept


def _scheme_idf(N, df, scheme: str) -> np.ndarray:
    if scheme == "BM25":
        return scoring.bm25_idf(N, df)
    if scheme == "TFIDF-sublinear":
        return 1 + np.log10(N / np.asarray(df, dtype=np.float64))
    return scoring.idf_plus1(N, df)


def set_feature_values(analyzed_ds, dict_ref, *, N: int, avgdl: float,
                       scheme: str = "TF", norm: int = 0):
    """analyzed Dataset (doc_id, terms, tfs, doc_len) → Dataset with an added
    ``values: list<double>`` column (the weighted sparse vector, aligned with
    ``terms``) and ``avg_idf: double`` per doc. ``norm``∈{0,1,2} applies
    L1/L2 normalization (W6, ``Utils.java:287-325``)."""

    def weigh(batch: pa.Table) -> pa.Table:
        term_index, df_arr = ray.get(dict_ref)
        terms = batch.column("terms")
        tfs = batch.column("tfs")
        terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        tfs = tfs.combine_chunks() if isinstance(tfs, pa.ChunkedArray) else tfs
        lengths = np.asarray(pa.compute.list_value_length(terms))
        dl = np.repeat(batch.column("doc_len").to_numpy(), lengths)
        flat_terms = terms.flatten().to_numpy(zero_copy_only=False)
        flat_tfs = tfs.flatten().to_numpy()
        tids = term_index.get_indexer(flat_terms)
        df = df_arr[np.maximum(tids, 0)].astype(np.float64)
        vals = _apply_scheme(flat_tfs, dl, N, avgdl, df, scheme)
        idf = _scheme_idf(N, df, scheme)

        offsets = np.concatenate(([0], np.cumsum(lengths)))
        avg_idf = np.array([
            idf[s:e].sum() / (e - s) if e > s else 0.0
            for s, e in zip(offsets[:-1], offsets[1:])
        ])
        if norm in (1, 2):
            out_vals = np.empty_like(vals)
            for s, e in zip(offsets[:-1], offsets[1:]):
                v = vals[s:e]
                out_vals[s:e] = (
                    scoring.l1_normalize(v) if norm == 1 else scoring.l2_normalize(v)
                )
            vals = out_vals
        value_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(vals, pa.float64())
        )
        return batch.append_column("values", value_col).append_column(
            "avg_idf", pa.array(avg_idf, pa.float64())
        )

    return analyzed_ds.map_batches(weigh, batch_format="pyarrow")
