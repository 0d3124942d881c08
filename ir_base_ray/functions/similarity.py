"""Sparse-vector kernels and scalar math functions (SURVEY.md §2.4 J2-J4,
§2.10) — exact transcriptions of ``utils/Utils.java``. A sparse vector is a
pair of aligned arrays (indices int64 ascending, values float64)."""

from __future__ import annotations

import math

import numpy as np


def sparse_dot(idx1, val1, idx2, val2) -> float:
    """J2: sorted two-pointer intersection dot product
    (``Utils.dotProduct``, ``utils/Utils.java:380-399``). Accumulation order =
    ascending index walk — the float64 order every ranker in this repo pins."""
    p1 = p2 = 0
    n1, n2 = len(idx1), len(idx2)
    out = 0.0
    while p1 < n1 and p2 < n2:
        i1, i2 = idx1[p1], idx2[p2]
        if i1 == i2:
            out += val1[p1] * val2[p2]
            p1 += 1
            p2 += 1
        elif i1 > i2:
            p2 += 1
        else:
            p1 += 1
    return out


def sparse_jaccard(idx1, idx2) -> float:
    """J4: index-overlap Jaccard (``Utils.jaccard``, ``Utils.java:343-362``)."""
    if idx1 is None or idx2 is None:
        return 0.0
    overlap = 0
    p1 = p2 = 0
    n1, n2 = len(idx1), len(idx2)
    while p1 < n1 and p2 < n2:
        if idx1[p1] == idx2[p2]:
            overlap += 1
            p1 += 1
            p2 += 1
        elif idx1[p1] > idx2[p2]:
            p2 += 1
        else:
            p1 += 1
    return overlap / (n1 + n2 - overlap)


def sparse_rbf(idx1, val1, idx2, val2, delta: float) -> float:
    """J4 RBF over the SHARED indices only (``Utils.RBF``,
    ``Utils.java:810-830`` — note the reference only accumulates squared
    diffs where indices intersect)."""
    if len(idx1) == 0 or len(idx2) == 0:
        return 0.0
    p1 = p2 = 0
    sim = 0.0
    while p1 < len(idx1) and p2 < len(idx2):
        if idx1[p1] == idx2[p2]:
            d = val1[p1] - val2[p2]
            sim += d * d
            p1 += 1
            p2 += 1
        elif idx1[p1] > idx2[p2]:
            p2 += 1
        else:
            p1 += 1
    return math.exp(-sim / delta)


def sparse_cosine(idx1, val1, idx2, val2) -> float:
    """``Utils.cosine``: dot / L2(v1) / L2(v2) (``Utils.java:364-376``)."""
    l1 = math.sqrt(sum(v * v for v in val1))
    l2 = math.sqrt(sum(v * v for v in val2))
    if l1 == 0 or l2 == 0:
        return 0.0
    return sparse_dot(idx1, val1, idx2, val2) / l1 / l2


def sparse_index_of(indices, wid: int) -> int:
    """J3: binary search in a sorted sparse vector (``Utils.indexOf``,
    ``Utils.java:122-136``)."""
    start, end = 0, len(indices) - 1
    if end < 0:
        return -1
    while end >= start:
        mid = (start + end) // 2
        if indices[start] > wid or indices[end] < wid:
            return -1
        if indices[mid] > wid:
            end = mid - 1
        elif indices[mid] < wid:
            start = mid + 1
        else:
            return mid
    return -1


# ---------------------------------------------------------------- scalars

def is_number(token: str) -> bool:
    """``Utils.isNumber`` (``Utils.java:401-403``): ASCII \\d+."""
    return bool(token) and all("0" <= c <= "9" for c in token)


def entropy(prob, log_scale: bool = False) -> float:
    """``Utils.entropy`` (``Utils.java:139-148``)."""
    ent = 0.0
    for p in prob:
        if log_scale:
            ent += math.exp(p) * p
        else:
            ent += math.log(p) * p
    return -ent


def log_sum(xs) -> float:
    """``Utils.logSum(double[])`` (``Utils.java:151-169``): max-shifted."""
    xs = list(xs)
    if len(xs) == 1:
        return xs[0]
    m = max(xs)
    s = 0.0
    for x in xs:
        if not math.isinf(x):
            s += math.exp(x - m)
    if s == 0:
        return m
    return math.log(s) + m


def log_sum2(log_a: float, log_b: float) -> float:
    """``Utils.logSum(a,b)`` (``Utils.java:171-180``)."""
    if math.isinf(log_a):
        return log_b
    if math.isinf(log_b):
        return log_a
    if log_a < log_b:
        return log_b + math.log(1 + math.exp(log_a - log_b))
    return log_a + math.log(1 + math.exp(log_b - log_a))


def kl_divergence(p, q) -> float:
    """``Utils.klDivergence`` (``Utils.java:796-808``): skips zero entries."""
    if len(p) != len(q):
        return float("nan")
    out = 0.0
    for pi, qi in zip(p, q):
        if pi == 0.0 or qi == 0.0:
            continue
        out += pi * math.log(pi / qi)
    return out


def kl_symmetric(p, q) -> float:
    """``Utils.KLsymmetric`` (``Utils.java:784-794``)."""
    if len(p) != len(q):
        return float("nan")
    out = 0.0
    for pi, qi in zip(p, q):
        if pi != 0 and qi != 0:
            out += (pi - qi) * math.log(pi / qi)
    return out


def euclidean_distance_sq(t1, t2) -> float:
    """``Utils.euclideanDistance`` (``Utils.java:850-860``) — NOTE the
    reference returns the SQUARED distance (no sqrt)."""
    if len(t1) != len(t2):
        return float("nan")
    s = 0.0
    for a, b in zip(t1, t2):
        s += (a - b) * (a - b)
    return s


def lcs_length(x, y) -> int:
    """``Utils.LCSLength`` (``Utils.java:863-879``): classic DP, vectorized
    row-wise with numpy."""
    m, n = len(x), len(y)
    prev = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, m + 1):
        cur = np.zeros(n + 1, dtype=np.int64)
        xi = x[i - 1]
        for j in range(1, n + 1):
            if xi == y[j - 1]:
                cur[j] = prev[j - 1] + 1
            elif prev[j] >= cur[j - 1]:
                cur[j] = prev[j]
            else:
                cur[j] = cur[j - 1]
        prev = cur
    return int(prev[n])


def count_occurrences(s: str, sub: str) -> int:
    """``Utils.countOccurrencesOf`` (``Utils.java:931-938``)."""
    if not s or not sub:
        return 0
    count = 0
    pos = 0
    while (idx := s.find(sub, pos)) != -1:
        count += 1
        pos = idx + len(sub)
    return count


def ends_with_punct(s: str) -> bool:
    """``Utils.endWithPunct`` (``Utils.java:555-560``): true iff the last
    char is NOT ASCII alphanumeric. (Java throws on empty string; we return
    False.)"""
    if not s:
        return False
    c = s[-1]
    return not ("a" <= c <= "z" or "A" <= c <= "Z" or "0" <= c <= "9")
