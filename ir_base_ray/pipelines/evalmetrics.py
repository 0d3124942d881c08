"""Ranking evaluators — MAP and NDCG@k, exact transcriptions of
``Ranker/evaluator/MAP_Evaluator.java`` and ``NDCG_Evaluator.java`` (R5 in
SURVEY.md §2.7), plus a distributed per-query evaluation driver
(groupby(query).map_groups)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _sort_desc_stable(scores, labels):
    """``_Query.sortDocs``: stable sort, descending by score (``Collections
    .sort`` + ``_QUPair.compareTo``, ``_QUPair.java:65-72`` — ties keep list
    order)."""
    order = np.argsort(-np.asarray(scores, dtype=np.float64), kind="stable")
    return np.asarray(labels)[order]


def average_precision(scores, labels) -> float:
    """MAP_Evaluator.eval (``MAP_Evaluator.java:63-77``): sort desc by score;
    ap += P/(i+1) at each relevant rank (P = running relevant count); returns
    -1.0 when the query has no relevant docs (the reference's sentinel)."""
    y = _sort_desc_stable(scores, labels)
    ap = 0.0
    p = 0.0
    for i, yi in enumerate(y):
        if yi > 0:
            p += 1
            ap += p / (i + 1)
    if p == 0:
        return -1.0
    return ap / p


_NDCG_DISCOUNT = np.array([1.0 / math.log(i + 2) for i in range(50)])
_NDCG_GAIN = np.array([math.pow(2.0, i) - 1 for i in range(5)])


def ndcg_at_k(scores, labels, k: int) -> float:
    """NDCG_Evaluator.eval (``NDCG_Evaluator.java:22-33,77-84``): k capped at
    50; gain 2^y - 1 (labels 0..4); discount 1/ln(i+2); iDCG from labels
    sorted descending. (Division by zero iDCG yields nan, as the Java code
    would produce NaN.)"""
    k = min(50, k)
    y = _sort_desc_stable(scores, labels)
    ideal = np.sort(np.asarray(labels))[::-1]
    idcg = 0.0
    for i in range(min(len(ideal), k)):
        idcg += _NDCG_GAIN[ideal[i]] * _NDCG_DISCOUNT[i]
    dcg = 0.0
    for i in range(min(len(y), k)):
        dcg += _NDCG_GAIN[y[i]] * _NDCG_DISCOUNT[i]
    if idcg == 0:
        return float("nan")
    return dcg / idcg


def evaluate_rankings(ds, *, k: int = 10, query_col: str = "query_id",
                      score_col: str = "score", label_col: str = "label"):
    """Distributed per-query MAP + NDCG@k over a (query_id, score, label)
    Dataset → small (query_id, ap, ndcg) Dataset; mean on the driver."""

    def per_query(g: pd.DataFrame) -> pd.DataFrame:
        s = g[score_col].to_numpy()
        y = g[label_col].to_numpy()
        return pd.DataFrame({
            query_col: [g[query_col].iloc[0]],
            "ap": [average_precision(s, y)],
            "ndcg": [ndcg_at_k(s, y, k)],
        })

    return ds.groupby(query_col).map_groups(per_query, batch_format="pandas")


def mean_map_ndcg(per_query_df: pd.DataFrame) -> dict:
    """Corpus-level means; queries with no relevant docs (ap == -1) are
    excluded from MAP, mirroring how the reference skips P==0 queries."""
    valid = per_query_df[per_query_df["ap"] >= 0]
    return {
        "MAP": float(valid["ap"].mean()) if len(valid) else float("nan"),
        "NDCG": float(per_query_df["ndcg"].mean()),
        "n_queries": int(len(per_query_df)),
    }
