"""HDP clustered model adaptation — ``modelAdaptation/HDP/CLRWithHDP.java``
(+ ``CLinAdaptWithHDP.java``): REVIEW-level cluster assignment under a
hierarchical Dirichlet process, each cluster owning an LR model φ (or a
LinAdapt transform) AND a language model ψ with Dirichlet-multinomial
statistics.

Transcribed semantics (the HDP direct-assignment sampler, Teh et al. 2006 —
public; reference structure kept):

- candidate weight per review (``sampleOneInstance`` :180-232):
  log p(y|x,φ_k) (:285-302, MAX_VALUE guards) + log p(x|ψ_k)
  (:304-319 — Dirichlet-multinomial predictive via the ascending
  ``logGammaDivision`` sums over the cluster's LM stats; a cluster with no
  stats falls back to the review's precomputed prior predictive
  ``L4NewCluster``, :128-156) + log(user's member count for k + η·γ_k)
  (``calcGroupPopularity`` :253-255); auxiliaries get γ_e/M;
- the log-space prefix walk draw (:257-272, k−− guard);
- new cluster: stick-break γ with Beta(1, α) (``sampleNewCluster``
  :235-251);
- review removal (``updateDocMembership`` :362-390): LM stats removed,
  empty cluster recycled (γ_e += γ, swap-delete);
- M-step (``calculate_M_step`` :404-412): ``sampleGamma`` (:452-478 —
  Antoniak table counts h per (user, cluster) sampled via the memoized
  log-Stirling recurrence ``logStirling`` :436-450 + ``sampleH`` :415-430,
  then γ ~ Dir(h_1+α, …, α) via Gamma draws), then ``estPhi`` — joint
  L-BFGS over the kBar cluster φ blocks with UNNORMALIZED per-review
  gradients (:487-588) + the G0 energy R1 (via the shared DP machinery);
- language-model Dirichlet prior: β_v = c·lm_v + β (``setBetas``
  :103-116).

Execution shape: review-level CRP sweep sequential (cheap); the M-step
distributes as per-review-block (f, g) partials through the SAME remote as
the DP tier (``dpadapt._dp_block_fg`` with singleton-review entries,
l_norm=False). Seeded Philox streams replace the unseeded cern RNGs.
"""

from __future__ import annotations

import numpy as np

import ray

from ir_base_ray.pipelines.dpadapt import (_dp_block_fg, _loglik_clin,
                                           _loglik_clr)
from ir_base_ray.pipelines.linear import lbfgs_minimize


def _log_gamma_division(n: int, beta_v: float, N_v: float) -> float:
    """Σ_{i=0}^{n-1} log(i + β_v + N_v) — the reference's ascending loop."""
    if n <= 0:
        return 0.0
    return float(np.log(np.arange(n, dtype=np.float64) + beta_v + N_v).sum())


class _Stirling:
    """Memoized log unsigned-Stirling-first-kind (``logStirling`` :436-450),
    iterative (the reference recursion is exponential without its memo)."""

    def __init__(self):
        self._memo: dict[tuple[int, int], float] = {}

    def __call__(self, n: int, h: int) -> float:
        if n == h:
            return 0.0
        if h == 0 or h > n:
            return -np.inf
        key = (n, h)
        hit = self._memo.get(key)
        if hit is not None:
            return hit
        # fill bottom-up rows up to n
        for nn in range(1, n + 1):
            for hh in range(1, min(nn, h) + 1):
                if (nn, hh) in self._memo or nn == hh or hh > nn:
                    continue
                a = self(nn - 1, hh - 1)
                b = np.log(nn - 1) + self(nn - 1, hh)
                self._memo[(nn, hh)] = float(np.logaddexp(a, b))
        return self._memo[key]


def train_hdp_adaptation(user_docs: dict, g_w: np.ndarray, *,
                         model: str = "clr", alpha: float = 1.0,
                         eta: float = 1.0, beta: float = 1.0, c: float = 1.0,
                         lm_prior=None, M: int = 6, burn_in: int = 3,
                         n_iters: int = 6, eta1: float = 0.05,
                         eta2: float = 0.05, nuA: tuple = (0.0, 1.0),
                         nuB: tuple = (1.0, 0.1), seed: int = 41,
                         n_blocks: int = 4, lbfgs_iter: int = 60):
    """Full HDP-adaptation EM. ``user_docs``: {user: [(tids, vals, y01)]}
    — the review's token vector doubles as its LM features (the reference
    keeps a separate LM feature space; same machinery). Returns per-review
    cluster assignments, cluster models, γ, and per-user majority-cluster
    personalized weights."""
    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    pdim = F1 if model == "clr" else 2 * F1
    lm_dim = F1 - 1
    betas = (c * (np.ones(lm_dim) if lm_prior is None
                  else np.asarray(lm_prior, dtype=np.float64)) + beta)
    beta_sum = float(betas.sum())
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))
    stirling = _Stirling()

    users = [u for u in user_docs if user_docs[u]]
    reviews = []                      # (user_idx, tids, vals, y, lm_counts)
    for ui, u in enumerate(users):
        for t, v, y in user_docs[u]:
            t = np.asarray(t, dtype=np.int64)
            v = np.asarray(v, dtype=np.float64)
            reviews.append([ui, t, v, int(y)])
    # prior predictive per review (initThetaStars :128-156)
    l4new = np.empty(len(reviews))
    for ri, (ui, t, v, y) in enumerate(reviews):
        L = 0.0
        m = 0.0
        for idx, val in zip(t.tolist(), v.tolist()):
            m += val
            L += _log_gamma_division(int(val), betas[idx], 0.0)
        L -= _log_gamma_division(int(m), beta_sum, 0.0)
        l4new[ri] = L

    def sample_g0(k):
        if model == "clr":
            return rng.normal(g_w, nuA[1], size=(k, F1))
        out = np.empty((k, pdim))
        out[:, :F1] = rng.normal(nuB[0], nuB[1], size=(k, F1))
        out[:, F1:] = rng.normal(nuA[0], nuA[1], size=(k, F1))
        return out

    def loglik_y(theta, t, v, y):
        doc = [(t, v, y)]
        return (_loglik_clr(theta, doc, False) if model == "clr"
                else _loglik_clin(theta, g_w, doc, False))

    clusters: list[np.ndarray] = []
    lm_stats: list[np.ndarray] = []
    gammas: list[float] = []
    mem: list[int] = []
    # per-(user, cluster-id) member counts, kept as dicts keyed by position
    user_mem: list[dict[int, int]] = [dict() for _ in users]
    assign = [-1] * len(reviews)
    gamma_e = 1.0

    def loglik_x(k, ri):
        Ns = lm_stats[k]
        if Ns is None or not Ns.any():
            return l4new[ri]
        _ui, t, v, _y = reviews[ri]
        N = float(Ns.sum())
        n = float(v.sum())
        L = -_log_gamma_division(int(n), beta_sum, N)
        for idx, val in zip(t.tolist(), v.tolist()):
            L += _log_gamma_division(int(val), betas[idx], Ns[idx])
        return L

    def sample_review(ri):
        nonlocal gamma_e
        ui, t, v, y = reviews[ri]
        aux = sample_g0(M)
        K = len(clusters)
        props = np.empty(K + M)
        logsum = 0.0
        for k in range(K + M):
            theta = clusters[k] if k < K else aux[k - K]
            ll = loglik_y(theta, t, v, y)
            if k < K:
                ll += loglik_x(k, ri)
                pop = user_mem[ui].get(k, 0) + eta * gammas[k]
            else:
                ll += l4new[ri]
                pop = eta * (gamma_e / M)
            ll += np.log(pop)
            props[k] = ll
            logsum = ll if k == 0 else np.logaddexp(logsum, ll)
        target = logsum + np.log(rng.random())
        k = 0
        acc = props[0]
        while acc < target and k < K + M - 1:
            k += 1
            acc = np.logaddexp(acc, props[k])
        if k >= K:                         # new cluster (stick-break γ)
            clusters.append((clusters[k] if k < K else aux[k - K]).copy())
            lm_stats.append(np.zeros(lm_dim))
            rnd = rng.beta(1.0, alpha)
            gammas.append(rnd * gamma_e)
            gamma_e = (1.0 - rnd) * gamma_e
            mem.append(0)
            k = len(clusters) - 1
        mem[k] += 1
        user_mem[ui][k] = user_mem[ui].get(k, 0) + 1
        np.add.at(lm_stats[k], t, v)
        assign[ri] = k

    def remove_review(ri):
        nonlocal gamma_e
        ui, t, v, _y = reviews[ri]
        k = assign[ri]
        user_mem[ui][k] -= 1
        if user_mem[ui][k] == 0:
            del user_mem[ui][k]
        np.subtract.at(lm_stats[k], t, v)
        mem[k] -= 1
        if mem[k] == 0:                    # recycle γ, swap-delete
            gamma_e += gammas[k]
            last = len(clusters) - 1
            if k != last:
                clusters[k], clusters[last] = clusters[last], clusters[k]
                lm_stats[k], lm_stats[last] = lm_stats[last], lm_stats[k]
                gammas[k], gammas[last] = gammas[last], gammas[k]
                mem[k], mem[last] = mem[last], mem[k]
                for rj in range(len(reviews)):
                    if assign[rj] == last:
                        assign[rj] = k
                for um in user_mem:
                    if last in um:
                        um[k] = um.pop(last)
            clusters.pop()
            lm_stats.pop()
            gammas.pop()
            mem.pop()

    def e_step(first=False):
        for ri in range(len(reviews)):
            if not first:
                remove_review(ri)
            sample_review(ri)

    def sample_gamma():
        nonlocal gamma_e
        K = len(clusters)
        h_sizes = np.zeros(K)
        for ui in range(len(users)):
            for k, n in user_mem[ui].items():
                if n == 1:
                    h_sizes[k] += 1
                    continue
                eg = np.log(eta) + np.log(max(gammas[k], 1e-300))
                cache = np.array([h * eg + stirling(n, h)
                                  for h in range(1, n + 1)])
                # sample h in log space
                tot = cache[0]
                for x in cache[1:]:
                    tot = np.logaddexp(tot, x)
                tgt = tot + np.log(rng.random())
                h = 0
                acc = cache[0]
                while acc < tgt and h < n - 1:
                    h += 1
                    acc = np.logaddexp(acc, cache[h])
                h_sizes[k] += h + 1
        draws = rng.gamma(np.concatenate([h_sizes + alpha, [alpha]]), 1.0)
        s = float(draws.sum())
        for k in range(K):
            gammas[k] = draws[k] / s
        gamma_e = draws[K] / s

    blocks = [list(range(len(reviews)))[i::n_blocks]
              for i in range(min(n_blocks, max(1, len(reviews))))]

    def m_step():
        sample_gamma()
        k_bar = len(clusters)
        x0 = np.concatenate(clusters)
        entry_refs = [
            ray.put([([(reviews[ri][1], reviews[ri][2], reviews[ri][3])],
                      assign[ri]) for ri in blk])
            for blk in blocks
        ]

        def value_grad(x):
            f = 0.0
            g = np.zeros_like(x)
            for i in range(k_bar):          # G0 energy (calculateR1)
                off = pdim * i
                if model == "clr":
                    d = x[off: off + pdim] - g_w
                    f += eta1 * float(d @ d) / (nuA[1] ** 2) / 2.0
                    g[off: off + pdim] += eta1 * d / (nuA[1] ** 2)
                else:
                    da = x[off: off + F1] - nuB[0]
                    db = x[off + F1: off + 2 * F1] - nuA[0]
                    f += (eta1 * float(da @ da) / (nuB[1] ** 2)
                          + eta2 * float(db @ db) / (nuA[1] ** 2)) / 2.0
                    g[off: off + F1] += eta1 * da / (nuB[1] ** 2)
                    g[off + F1: off + 2 * F1] += eta2 * db / (nuA[1] ** 2)
            x_ref = ray.put(x)
            outs = ray.get([
                _dp_block_fg.remote(r, x_ref, g_w, pdim, model, k_bar, False)
                for r in entry_refs
            ])
            for fp, gp in outs:
                f += fp
                g = g + gp
            return f, g

        x, fv, _it = lbfgs_minimize(value_grad, x0, m=6, gtol=1e-4,
                                    max_iter=lbfgs_iter)
        for i in range(k_bar):
            clusters[i] = x[pdim * i: pdim * (i + 1)].copy()
        return fv

    e_step(first=True)
    k_trace = [len(clusters)]
    for _ in range(burn_in):
        m_step()
        e_step()
        k_trace.append(len(clusters))
    fv = m_step()
    for _ in range(n_iters):
        e_step()
        fv = m_step()
        k_trace.append(len(clusters))

    # per-user personalized weights = the user's majority cluster's model
    personalized = {}
    user_major = {}
    for ui, u in enumerate(users):
        if user_mem[ui]:
            k = max(sorted(user_mem[ui]), key=lambda kk: user_mem[ui][kk])
        else:
            k = 0
        user_major[u] = k
        A = clusters[k]
        personalized[u] = A if model == "clr" else A[:F1] * g_w + A[F1:]
    return {"users": users, "review_assign": list(assign),
            "user_major_cluster": user_major,
            "clusters": [cl.copy() for cl in clusters],
            "gammas": list(gammas), "gamma_e": gamma_e,
            "personalized": personalized, "k_trace": k_trace,
            "final_f": fv}
