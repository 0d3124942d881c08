"""LambdaRank (pairwise logistic lambdas, mini-batch SGD) + the parallel
weight-averaging trainer — ``Ranker/LambdaRank.java:80-202`` and
``Ranker/LambdaRankParallel.java:60-130`` (SURVEY.md §2.5 A10, §2.3 T5).

Transcribed semantics:
- per query (``gradientUpdate`` :92-126): scores = F·w; for every ordered
  pair (better i, worse j): diff_i += σ(s_j−s_i)·δ and diff_j −= σ(s_j−s_i)·δ
  (σ = ``Utils.logistic`` :214, δ = evaluator delta — the BASE evaluator's
  δ ≡ 1, ``evaluator/Evaluator.java:44-46``); gradient g −= Σ diff_i·fv_i;
  trainSize counts each unordered pair twice (once per direction);
- mini-batch of ``window_size`` queries (:176-195): g = g/pSize + λ·w, then
  w −= rand()·step·g; step *= shrinkage per epoch; query order shuffled per
  epoch. Unseeded ``Math.random``/``shuffle`` → seeded numpy (determinism
  fix, SURVEY §7);
- parallel (A10): each round, every worker trains its query shard from the
  broadcast weights for ``max_iter`` epochs; driver averages worker weights
  uniformly (``Utils.add2Array(m_weight, worker.getWeight(), 1/W)``, :125)
  and broadcasts again.


``Ranker/LambdaRankWorker.java`` (the reference's per-thread weight-averaging worker) = the per-block remote + fixed-order average here.
"""

from __future__ import annotations

import numpy as np

import ray


def _sigma(x):
    return 1.0 / (1.0 + np.exp(-x))


def _query_lambdas(w, fv, y):
    """One query's gradient contribution + pair count (gradientUpdate)."""
    s = fv @ w
    better = y[:, None] > y[None, :]          # (i, j): i better than j
    sig = _sigma(s[None, :] - s[:, None])     # σ(s_j − s_i) at (i, j)
    diff = np.where(better, sig, 0.0).sum(axis=1) - np.where(better.T, sig.T, 0.0).sum(axis=1)
    g = -(diff[:, None] * fv).sum(axis=0)
    return g, int(2 * better.sum())


def train_shard(queries, w0, *, max_iter: int, window_size: int, init_step: float,
                shrinkage: float, lam: float, seed: int) -> np.ndarray:
    """Serial LambdaRank SGD over one query shard (``train`` :166-201)."""
    rng = np.random.default_rng(seed)
    w = w0.copy()
    order = np.arange(len(queries))
    step = init_step
    for _ in range(max_iter):
        rng.shuffle(order)
        qid = 0
        while qid < len(queries):
            g = np.zeros_like(w)
            p_size = 0
            for _ in range(window_size):
                fv, y = queries[order[qid % len(queries)]]
                gq, n = _query_lambdas(w, fv, y)
                g += gq
                p_size += n
                qid += 1
            if p_size:
                g = g / p_size + lam * w
            mu = rng.random() * step
            w = w - mu * g
        step *= shrinkage
    return w


@ray.remote
def _worker_round(queries, w0, max_iter, window_size, init_step, shrinkage, lam, seed):
    return train_shard(queries, w0, max_iter=max_iter, window_size=window_size,
                       init_step=init_step, shrinkage=shrinkage, lam=lam, seed=seed)


def misorder_count(queries, w) -> int:
    """#misordered better/worse pairs under w (``evaluate`` :128-163 counts
    each direction once → report per unordered pair)."""
    bad = 0
    for fv, y in queries:
        s = fv @ w
        better = y[:, None] > y[None, :]
        bad += int((better & (s[:, None] <= s[None, :])).sum())
    return bad


def train_lambdarank_parallel(queries, n_features: int, *, n_workers: int = 4,
                              rounds: int = 5, max_iter: int = 2,
                              window_size: int = 5, init_step: float = 1.0,
                              shrinkage: float = 0.95, lam: float = 1e-3,
                              seed: int = 17):
    """A10: round-based train-and-average. ``queries`` is a list of
    (feature_matrix, relevance_labels) per query; shards are dealt
    round-robin and pinned in the object store once; weights broadcast per
    round. Returns (weights, misorder trace)."""
    shards = [queries[i::n_workers] for i in range(n_workers)]
    shards = [s for s in shards if s]
    shard_refs = [ray.put(s) for s in shards]
    w = np.zeros(n_features)
    trace = [misorder_count(queries, w)]
    for r in range(rounds):
        outs = ray.get([
            _worker_round.remote(ref, w, max_iter, window_size, init_step,
                                 shrinkage, lam, seed + 1000 * r + i)
            for i, ref in enumerate(shard_refs)
        ])
        w = np.mean(outs, axis=0)  # uniform 1/W averaging (:125)
        trace.append(misorder_count(queries, w))
    return w, trace
