"""Log-gamma family scalars used by the topic-model tier (transcriptions of
``utils/Utils.java:705-782`` — Abramowitz & Stegun series exactly as the
reference computes them, same operator order, so variational-EM sufficient
statistics match double-for-double). Vectorized over numpy arrays."""

from __future__ import annotations

import numpy as np


def trigamma(x):
    """Utils.java:713-726 (A&S 6.4.11/6.4.12 + recurrence 6.4.6)."""
    x = np.asarray(x, dtype=np.float64) + 6.0
    p = 1.0 / (x * x)
    p = ((((((0.075757575757576 * p - 0.033333333333333) * p + 0.0238095238095238) * p
            - 0.033333333333333) * p + 0.166666666666667) * p + 1.0) / x + 0.5 * p)
    for _ in range(6):
        x = x - 1.0
        p = 1.0 / (x * x) + p
    return p if p.ndim else float(p)


def digamma(x):
    """Utils.java:734-742 (Taylor approximation of ψ)."""
    x = np.asarray(x, dtype=np.float64) + 6.0
    p = 1.0 / (x * x)
    p = (((0.004166666666667 * p - 0.003968253986254) * p + 0.008333333333333) * p
         - 0.083333333333333) * p
    p = (p + np.log(x) - 0.5 / x - 1.0 / (x - 1.0) - 1.0 / (x - 2.0) - 1.0 / (x - 3.0)
         - 1.0 / (x - 4.0) - 1.0 / (x - 5.0) - 1.0 / (x - 6.0))
    return p if p.ndim else float(p)


def lgamma(x: float) -> float:
    """Utils.java:744-782 (scalar; series with shift below 7)."""
    a = (8.333333333333333e-02, -2.777777777777778e-03, 7.936507936507937e-04,
         -5.952380952380952e-04, 8.417508417508418e-04, -1.917526917526918e-03,
         6.410256410256410e-03, -2.955065359477124e-02, 1.796443723688307e-01,
         -1.39243221690590)
    x0 = x
    n = 0
    if x <= 0.0:
        return 1e308
    if x == 1.0 or x == 2.0:
        return 0.0
    if x <= 7.0:
        n = int(7 - x)
        x0 = x + n
    x2 = 1.0 / (x0 * x0)
    xp = 2.0 * np.pi
    gl0 = a[9]
    for k in range(8, -1, -1):
        gl0 = gl0 * x2 + a[k]
    gl = gl0 / x0 + 0.5 * np.log(xp) + (x0 - 0.5) * np.log(x0) - x0
    if x <= 7.0:
        for _ in range(1, n + 1):
            gl -= np.log(x0 - 1.0)
            x0 -= 1.0
    return float(gl)
