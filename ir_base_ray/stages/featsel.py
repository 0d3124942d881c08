"""Feature selection F1-F6 over the dictionary Dataset (SURVEY.md §2.6,
``Analyzer/FeatureSelector.java``): DF band filter + per-term score (DF / IG /
MI / CHI) + proportional band select over the score-ascending ranking.

Inputs: a per-class dictionary Dataset (term, class label → df) and class
member counts (broadcast scalars). Exact formula transcriptions, including
the reference's quirks:

- DF band is EXCLUSIVE on both ends (``minDF < ΣDF < maxDF``,
  ``FeatureSelector.java:41-42,68-70``).
- MI transcribes the literal expression ``log(A*N/Ci * sumDF)``
  (``FeatureSelector.java:137-138``) — NOTE the reference's operator order
  multiplies by sumDF instead of dividing (a transcription of their code,
  flagged as a divergence from Yang&Pedersen's formula in the docstring).
- proportional band: sort score ASCENDING, keep ranks [start·n, end·n)
  (``FeatureSelector.java:47-61``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def chi_square(N: int, DF: np.ndarray, tcDF: np.ndarray, cDF: int) -> np.ndarray:
    """``Utils.ChiSquare`` (``utils/Utils.java:900-907``), vectorized, same
    left-to-right division order."""
    A = tcDF.astype(np.float64)
    B = DF - A
    C = cDF - A
    D = N - DF - cDF + A
    return N * (A * D - B * C) * (A * D - B * C) / cDF / (B + D) / DF / (C + D)


def df_scores(stats: pd.DataFrame, min_df: int, max_df: int) -> pd.DataFrame:
    """F1: keep minDF < ΣDF < maxDF, score = ΣDF."""
    s = stats[(stats["df"] > min_df) & (stats["df"] < max_df)].copy()
    s["score"] = s["df"].astype(np.float64)
    return s[["term", "score"]]


def ig_scores(stats_per_class: pd.DataFrame, class_counts: dict[str, int],
              min_df: int, max_df: int) -> pd.DataFrame:
    """F2 (``FeatureSelector.java:74-116``): Shannon information gain.
    stats_per_class: rows (term, class, df_c)."""
    classes = sorted(class_counts)
    member = np.array([class_counts[c] for c in classes], dtype=np.float64)
    total = member.sum()
    pr_ci = member / total
    pr_ci_sum = -np.sum(np.where(pr_ci != 0, pr_ci * np.log(np.where(pr_ci == 0, 1, pr_ci)), 0.0))

    wide = stats_per_class.pivot_table(index="term", columns="class", values="df_c",
                                       fill_value=0, aggfunc="sum")
    for c in classes:
        if c not in wide.columns:
            wide[c] = 0
    wide = wide[classes]
    df_sum = wide.sum(axis=1).to_numpy().astype(np.float64)
    keep = (df_sum > min_df) & (df_sum < max_df)
    wide = wide[keep]
    df_sum = df_sum[keep]

    dfc = wide.to_numpy().astype(np.float64)
    prt = df_sum / total
    prt_not = 1 - prt
    with np.errstate(divide="ignore", invalid="ignore"):
        pr_cit = (dfc / member[None, :]) * pr_ci[None, :] / prt[:, None]
        pr_cit_not = ((member[None, :] - dfc) / member[None, :]) * pr_ci[None, :] / prt_not[:, None]
        term1 = np.where(pr_cit != 0, pr_cit * np.log(np.where(pr_cit == 0, 1, pr_cit)), 0.0)
        term2 = np.where(pr_cit_not != 0, pr_cit_not * np.log(np.where(pr_cit_not == 0, 1, pr_cit_not)), 0.0)
    gt = pr_ci_sum + prt * np.nansum(term1, axis=1) + (1 - prt) * np.nansum(term2, axis=1)
    return pd.DataFrame({"term": wide.index.to_numpy(), "score": gt})


def mi_scores(stats_per_class: pd.DataFrame, class_counts: dict[str, int],
              min_df: int, max_df: int) -> pd.DataFrame:
    """F3 (``FeatureSelector.java:119-144``): avg pointwise MI, transcribing
    the reference's literal ``log(A*N/Ci * sumDF)`` operator order."""
    classes = sorted(class_counts)
    member = np.array([class_counts[c] for c in classes], dtype=np.float64)
    N = member.sum()
    pr_ci = member / N
    wide = stats_per_class.pivot_table(index="term", columns="class", values="df_c",
                                       fill_value=0, aggfunc="sum")
    for c in classes:
        if c not in wide.columns:
            wide[c] = 0
    wide = wide[classes]
    df_sum = wide.sum(axis=1).to_numpy().astype(np.float64)
    keep = (df_sum > min_df) & (df_sum < max_df)
    wide = wide[keep]
    df_sum = df_sum[keep]
    dfc = wide.to_numpy().astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        it_ci = np.log(dfc * N / member[None, :] * df_sum[:, None])
    iavg = (it_ci * pr_ci[None, :]).sum(axis=1)
    return pd.DataFrame({"term": wide.index.to_numpy(), "score": iavg})


def chi_scores(stats_per_class: pd.DataFrame, class_counts: dict[str, int],
               min_df: int, max_df: int) -> pd.DataFrame:
    """F4 (``FeatureSelector.java:147-169``): χ² avg weighted by class prior."""
    classes = sorted(class_counts)
    member = np.array([class_counts[c] for c in classes], dtype=np.float64)
    N = int(member.sum())
    wide = stats_per_class.pivot_table(index="term", columns="class", values="df_c",
                                       fill_value=0, aggfunc="sum")
    for c in classes:
        if c not in wide.columns:
            wide[c] = 0
    wide = wide[classes]
    df_sum = wide.sum(axis=1).to_numpy().astype(np.float64)
    keep = (df_sum > min_df) & (df_sum < max_df)
    wide = wide[keep]
    df_sum = df_sum[keep]
    x2avg = np.zeros(len(wide))
    for i, c in enumerate(classes):
        x2 = chi_square(N, df_sum, wide[c].to_numpy().astype(np.float64), int(member[i]))
        x2avg = x2avg + x2 * member[i] / N
    return pd.DataFrame({"term": wide.index.to_numpy(), "score": x2avg})


def proportional_select(scored: pd.DataFrame, start_prob: float, end_prob: float) -> list[str]:
    """F5 (``FeatureSelector.java:47-61``): ascending sort by score, keep the
    [start·n, end·n) rank slice. Ties broken by term for determinism (the
    reference's sort is unstable on ties; we pin a total order)."""
    s = scored.sort_values(["score", "term"], kind="mergesort").reset_index(drop=True)
    n = len(s)
    start = int(n * start_prob)
    end = int(n * end_prob)
    return s["term"].iloc[start:end].tolist()


def top_k_select(scored: pd.DataFrame, k: int) -> list[str]:
    """F6 top-K variant (``Analyzer.java:354-448``): highest scores first."""
    s = scored.sort_values(["score", "term"], ascending=[False, True], kind="mergesort")
    return s["term"].head(k).tolist()


def union_selectors(a: list[str], b: list[str]) -> list[str]:
    """F6 union of two selector outputs with first-seen dedup
    (``Analyzer.java:423-436`` HashSet union)."""
    seen = set()
    out = []
    for t in list(a) + list(b):
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out
