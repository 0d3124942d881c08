"""Term-weighting formulas — exact expression shapes of the reference so that
float64 results are bit-identical (``Analyzer/Analyzer.java:189-326``,
operators W1-W6 in SURVEY.md §2.7).

DF is corpus-wide (summed over classes, ``Utils.sumOfArray(stat.getDF())``).
N = corpus document count; avgdl = mean total doc length (``:239-242``).
All functions are numpy-vectorized over aligned arrays and preserve the
reference's left-to-right association order inside each expression.
"""

from __future__ import annotations

import math

import numpy as np

BM25_K1 = 1.5  # Analyzer.java:237
BM25_B = 0.75  # Analyzer.java:238
PLN_S = 0.5  # Analyzer.java:268


def bm25_idf_exact(N: int, df: float) -> float:
    """Scalar IDF = ln((N - DF + 0.5)/(DF + 0.5)) via libm ``math.log``.

    numpy's SIMD ``np.log`` differs from libm by 1 ulp on ~1/4 of inputs;
    BM25's only transcendental is this one log per TERM, so the engine
    computes it scalar (bit-identical to the serial oracle) and vectorizes
    everything else."""
    return math.log((N - df + 0.5) / (df + 0.5))


def bm25_weights_from_idf(
    tf: np.ndarray,
    doc_len: np.ndarray,
    idf,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> np.ndarray:
    """W4 with IDF precomputed (scalar per term or aligned array): pure
    rational ops — bit-identical between numpy and scalar float64."""
    TF = np.asarray(tf, dtype=np.float64)
    n = np.asarray(doc_len, dtype=np.float64) / avgdl
    return idf * TF * (k1 + 1) / (k1 * (1 - b + b * n) + TF)


def bm25_idf_by_tid(N: int, df_by_tid: np.ndarray) -> np.ndarray:
    """idf lookup array over the whole vocabulary (scalar libm log per term)."""
    return np.array([bm25_idf_exact(N, float(d)) for d in df_by_tid], dtype=np.float64)


def idf_plus1(N: int, df: np.ndarray) -> np.ndarray:
    """IDF = ln((N+1)/DF) — W1/W2 (Analyzer.java:204-205). Note (N+1) is an
    int in Java but the division is double (DF is double)."""
    return np.log((N + 1) / np.asarray(df, dtype=np.float64))


def tfidf(tf: np.ndarray, doc_len: np.ndarray, N: int, df: np.ndarray) -> np.ndarray:
    """W2: (TF/doclen) * ln((N+1)/DF) (Analyzer.java:202-206)."""
    TF = np.asarray(tf, dtype=np.float64) / np.asarray(doc_len, dtype=np.float64)
    return TF * idf_plus1(N, df)


def tfidf_sublinear(tf: np.ndarray, N: int, df: np.ndarray) -> np.ndarray:
    """W3: (1+log10 TF) * (1+log10(N/DF)) (Analyzer.java:224-228)."""
    TF = 1 + np.log10(np.asarray(tf, dtype=np.float64))
    IDF = 1 + np.log10(N / np.asarray(df, dtype=np.float64))
    return TF * IDF


def bm25_idf(N: int, df: np.ndarray) -> np.ndarray:
    """IDF = ln((N - DF + 0.5)/(DF + 0.5)) (Analyzer.java:255)."""
    df = np.asarray(df, dtype=np.float64)
    return np.log((N - df + 0.5) / (df + 0.5))


def bm25(
    tf: np.ndarray,
    doc_len: np.ndarray,
    N: int,
    avgdl: float,
    df: np.ndarray,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> np.ndarray:
    """W4, exact association order of Analyzer.java:253-256:
    n = doclen/navg; IDF = ln((N-DF+0.5)/(DF+0.5));
    BM25 = IDF * TF * (k1+1) / (k1 * (1 - b + b*n) + TF)
    (numerator folds left-to-right: (IDF*TF)*(k1+1)).
    """
    TF = np.asarray(tf, dtype=np.float64)
    n = np.asarray(doc_len, dtype=np.float64) / avgdl
    IDF = bm25_idf(N, df)
    return IDF * TF * (k1 + 1) / (k1 * (1 - b + b * n) + TF)


def pln(
    tf: np.ndarray,
    doc_len: np.ndarray,
    N: int,
    avgdl: float,
    df: np.ndarray,
    s: float = PLN_S,
) -> np.ndarray:
    """W5, exact precedence of Analyzer.java:286-289 (the division binds
    tighter than the outer 1+): PLN = (1 + ln(1+ln TF)/(1-s+s*n)) * IDF,
    IDF = ln((N+1)/DF)."""
    TF = np.asarray(tf, dtype=np.float64)
    n = np.asarray(doc_len, dtype=np.float64) / avgdl
    IDF = idf_plus1(N, df)
    return (1 + np.log(1 + np.log(TF)) / (1 - s + s * n)) * IDF


def l1_normalize(values: np.ndarray) -> np.ndarray:
    """W6 norm=1: v / Σ|v| (Utils.java:287-305); all-zero vector unchanged."""
    denom = np.abs(values).sum()
    return values / denom if denom != 0 else values


def l2_normalize(values: np.ndarray) -> np.ndarray:
    """W6 norm=2: v / sqrt(Σ v²) (Utils.java:307-325)."""
    denom = np.sqrt((values * values).sum())
    return values / denom if denom != 0 else values


def avg_idf(N: int, df: np.ndarray, scheme: str) -> float:
    """Per-doc avgIDF side output (Analyzer.java: each branch accumulates the
    scheme's own IDF and divides by the number of distinct terms)."""
    df = np.asarray(df, dtype=np.float64)
    if scheme == "BM25":
        idf = bm25_idf(N, df)
    elif scheme == "TFIDF-sublinear":
        idf = 1 + np.log10(N / df)
    else:  # TF, TFIDF, PLN
        idf = idf_plus1(N, df)
    return float(idf.sum() / idf.size) if idf.size else 0.0
