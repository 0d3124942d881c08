"""R4: RankNet and RankSVM over pairwise difference vectors
(``Ranker/RankNet.java``, ``structures/_Query.java:58-95``).

- pair extraction: for each query, every ordered (better i, worse j) pair
  yields the dense diff fv_i − fv_j (``extractPairs4RankNet`` :83-95);
  RankSVM labels alternate sign with the running pair-count parity and flip
  the diff direction accordingly (``extractPairs4RankSVM`` :58-81 —
  transcribed including the parity quirk);
- RankNet objective (``calcFuncGradient`` :76-99): one-class logistic over
  diffs, NO bias: f(β) = λ‖β‖² − Σ log σ(βᵀx), g = 2λβ + Σ (σ(βᵀx)−1)·x,
  minimized with L-BFGS (the reference uses m=5, gtol 8e-2; we reuse
  :mod:`linear`'s L-BFGS). Init (``init`` :38-51): N(0, 1/√λ) with the
  ranking-feature signs enforced (``getRankingFVSigns``,
  ``L2RMetricLearning.java:331-345``) — SEEDED here (determinism policy,
  SURVEY §7; the reference's Normal.staticNextDouble is unseeded);
- RankSVM: liblinear L2R_L1LOSS_SVC_DUAL in the reference
  (``L2RMetricLearning.java:130``); rebuilt as the primal L2-regularized
  SQUARED-hinge binary SVM on the signed diffs (same substitution as
  pipelines.linear SVM).

Distributed: diff rows are sharded and pinned once; each L-BFGS iteration
broadcasts β and sums per-shard (f, g) partials in fixed shard order.
"""

from __future__ import annotations

import numpy as np

import ray

from ir_base_ray.pipelines.linear import lbfgs_minimize

RANKING_FV_SIGNS = np.array([1, -1, 1, -1, 1, -1, 1, 1, -1, 1], dtype=np.float64)


def extract_ranknet_pairs(queries) -> np.ndarray:
    """[(fv matrix, y)] → (P, F) array of better−worse diffs
    (``extractPairs4RankNet``: pair order follows createRankingPairs')."""
    diffs = []
    for fv, y in queries:
        n = len(y)
        for i in range(n):
            for j in range(i):
                if y[i] > y[j]:
                    diffs.append(fv[i] - fv[j])
                elif y[i] < y[j]:
                    diffs.append(fv[j] - fv[i])
    return np.array(diffs) if diffs else np.empty((0, 0))


def extract_ranksvm_pairs(queries):
    """→ (X, labels ±1) with the reference's alternating-parity sign rule:
    while the accumulated count is even the diff is (worse−better, −1), else
    (better−worse, +1)."""
    X, lab = [], []
    for fv, y in queries:
        n = len(y)
        for i in range(n):
            for j in range(i):
                if y[i] == y[j]:
                    continue
                b, w = (i, j) if y[i] > y[j] else (j, i)
                if len(X) % 2 == 0:
                    X.append(fv[w] - fv[b])
                    lab.append(-1.0)
                else:
                    X.append(fv[b] - fv[w])
                    lab.append(1.0)
    return (np.array(X) if X else np.empty((0, 0)),
            np.array(lab, dtype=np.float64))


def _shard(X: np.ndarray, n_shards: int, y: np.ndarray | None = None):
    idx = np.array_split(np.arange(len(X)), max(1, min(n_shards, len(X))))
    if y is None:
        return [ray.put(X[ix]) for ix in idx if len(ix)]
    return [ray.put((X[ix], y[ix])) for ix in idx if len(ix)]


@ray.remote
def _ranknet_partial(X, beta):
    s = X @ beta
    p = 1.0 / (1.0 + np.exp(-s))
    return -float(np.log(p).sum()), X.T @ (p - 1.0)


@ray.remote
def _ranksvm_partial(pack, w, C_reg):
    X, y = pack
    m = 1.0 - y * (X @ w)
    act = m > 0
    f = float(C_reg * (m[act] ** 2).sum())
    g = X.T @ (np.where(act, -2.0 * C_reg * y * m, 0.0))
    return f, g


def train_ranknet(queries, *, lam: float = 1.0, n_shards: int = 4,
                  seed: int = 23, gtol: float = 8e-2, max_iter: int = 200):
    """→ (β, final f). Pairs extracted, sharded, trained with distributed
    L-BFGS partials; seeded sign-enforced normal init."""
    X = extract_ranknet_pairs(queries)
    if X.size == 0:
        return np.zeros(0), 0.0
    F = X.shape[1]
    rng = np.random.default_rng(seed)
    beta0 = rng.normal(0.0, 1.0 / np.sqrt(lam), size=F)
    signs = RANKING_FV_SIGNS[:F] if F <= RANKING_FV_SIGNS.size else np.ones(F)
    flip = signs * beta0 < 0
    beta0[flip] = -beta0[flip]
    shards = _shard(X, n_shards)

    def fg(b):
        b_ref = ray.put(b)
        outs = ray.get([_ranknet_partial.remote(s, b_ref) for s in shards])
        f = lam * float(b @ b)
        g = 2.0 * lam * b
        for fp, gp in outs:
            f += fp
            g = g + gp
        return f, g

    beta, f, _ = lbfgs_minimize(fg, beta0, m=5, gtol=gtol, max_iter=max_iter)
    return beta, f


def train_ranksvm(queries, *, C_reg: float = 1.0, n_shards: int = 4,
                  gtol: float = 1e-4, max_iter: int = 200):
    """→ (w, final f). Primal squared-hinge on the signed diffs."""
    X, y = extract_ranksvm_pairs(queries)
    if X.size == 0:
        return np.zeros(0), 0.0
    shards = _shard(X, n_shards, y)

    def fg(w):
        w_ref = ray.put(w)
        outs = ray.get([_ranksvm_partial.remote(s, w_ref, C_reg) for s in shards])
        f = 0.5 * float(w @ w)
        g = w.copy()
        for fp, gp in outs:
            f += fp
            g = g + gp
        return f, g

    w, f, _ = lbfgs_minimize(fg, np.zeros(X.shape[1]), gtol=gtol,
                             max_iter=max_iter)
    return w, f


def pairwise_accuracy(queries, w) -> float:
    """Fraction of better/worse pairs scored in the right order by βᵀx."""
    good = total = 0
    for fv, y in queries:
        s = fv @ w
        n = len(y)
        for i in range(n):
            for j in range(i):
                if y[i] == y[j]:
                    continue
                total += 1
                hi, lo = (i, j) if y[i] > y[j] else (j, i)
                if s[hi] > s[lo]:
                    good += 1
    return good / total if total else 1.0
