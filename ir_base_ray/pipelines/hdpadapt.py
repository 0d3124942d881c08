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


Per-user bookkeeping of ``modelAdaptation/HDP/_HDPAdaptStruct.java`` lives in the user_mem dicts here.
"""

from __future__ import annotations

import numpy as np

import ray

from ir_base_ray.pipelines.dpadapt import (_dp_block_fg, _loglik_clin,
                                           _loglik_clr, _loglik_mtclin,
                                           _loglik_mtclr)
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
                         eta2: float = 0.05, eta3: float = 1.0,
                         eta4: float = 1.0, q: float = 0.1,
                         thinning: int = 1, nuA: tuple = (0.0, 1.0),
                         nuB: tuple = (1.0, 0.1), seed: int = 41,
                         n_blocks: int = 4, lbfgs_iter: int = 60):
    """Full HDP-adaptation EM. ``user_docs``: {user: [(tids, vals, y01)]}
    — the review's token vector doubles as its LM features (the reference
    keeps a separate LM feature space; same machinery). Returns per-review
    cluster assignments, cluster models, γ, and per-user majority-cluster
    personalized weights.

    ``model``: "clr"/"clin" as before, plus the multi-task variants with a
    jointly-learned super block appended to the L-BFGS vector — "mtclr"
    (``MTCLRWithHDP.java``: decision q·w_s·x + w_c·x, w_s ~ G0 with the
    global-model mean, R1 += η2·‖w_s−w_g‖²/σ²/2, :56-88) and "mtclin"
    (``MTCLinAdaptWithHDP.java``: cluster transforms over
    w_s[n] = a_s[n]·w_g[n] + b_s[n] with identity super feature groups —
    the reference's no-group-file default, :133-140 — R1 += η3/η4 super
    energy :78-94, per-user personalization = the review-count-weighted
    mixture of per-cluster personalized models :274-301).

    ``thinning`` > 1 switches the EM loop to the MultipleE schedule
    (``MTCLinAdaptWithHDPMultipleE.java`` :49-90): after burn-in, each
    iteration runs ``thinning`` × (E-step; γ-resample) while accumulating
    per-review cluster-assignment counts, then ONE φ-MLE whose per-review
    likelihood/gradient is weighted by those counts (:105-140 — reviews
    whose sampled cluster has since been recycled are skipped), then the
    counts reset."""
    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    pdim = F1 if model in ("clr", "mtclr") else 2 * F1
    has_sup = model in ("mtclr", "mtclin")
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
        if model in ("clr", "mtclr"):
            # CLRWithHDP keeps CLRWithDP's vctMean G0 (clusters around w_g)
            return rng.normal(g_w, nuA[1], size=(k, F1))
        out = np.empty((k, pdim))
        out[:, :F1] = rng.normal(nuB[0], nuB[1], size=(k, F1))
        out[:, F1:] = rng.normal(nuA[0], nuA[1], size=(k, F1))
        return out

    # super block init (MTCLRWithHDP.initPriorG0 :56-60 — one-arg sampling
    # of the vctMean G0, i.e. around w_g; MTCLinAdaptWithHDP :66-70 — the
    # DoubleNormalPrior scaling/shifting split)
    if model == "mtclr":
        sup = rng.normal(g_w, nuA[1], size=F1)
    elif model == "mtclin":
        sup = np.empty(2 * F1)
        sup[:F1] = rng.normal(nuB[0], nuB[1], size=F1)
        sup[F1:] = rng.normal(nuA[0], nuA[1], size=F1)
    else:
        sup = None

    def loglik_y(theta, t, v, y):
        doc = [(t, v, y)]
        if model == "clr":
            return _loglik_clr(theta, doc, False)
        if model == "mtclr":
            return _loglik_mtclr(theta, sup, q, doc, False)
        if model == "mtclin":
            return _loglik_mtclin(theta, sup, g_w, doc, False)
        return _loglik_clin(theta, g_w, doc, False)

    clusters: list[np.ndarray] = []
    lm_stats: list[np.ndarray] = []
    gammas: list[float] = []
    mem: list[int] = []
    uids: list[int] = []                 # stable cluster identities (for
    next_uid = 0                         # the MultipleE count maps)
    # per-(user, cluster-id) member counts, kept as dicts keyed by position
    user_mem: list[dict[int, int]] = [dict() for _ in users]
    assign = [-1] * len(reviews)
    # MultipleE: per-review {cluster uid: times sampled} since last MLE
    theta_counts: list[dict[int, int]] = [dict() for _ in reviews]
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
        nonlocal gamma_e, next_uid
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
            uids.append(next_uid)
            next_uid += 1
            k = len(clusters) - 1
        mem[k] += 1
        user_mem[ui][k] = user_mem[ui].get(k, 0) + 1
        np.add.at(lm_stats[k], t, v)
        assign[ri] = k
        # updateThetaCountMap(1) (MultipleE :31-35) — cheap, always kept
        tc = theta_counts[ri]
        tc[uids[k]] = tc.get(uids[k], 0) + 1

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
                uids[k], uids[last] = uids[last], uids[k]
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
            uids.pop()

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

    def est_phi(weighted=False):
        """φ-MLE. ``weighted``: MultipleE mode — each review contributes
        once per accumulated (surviving) cluster sample, the count-weighted
        expectation objective (MultipleE ``calcLogLikelihoodY``/
        ``gradientByFunc`` :105-140; disappeared clusters skipped)."""
        nonlocal sup
        k_bar = len(clusters)
        parts = list(clusters) + ([sup] if has_sup else [])
        x0 = np.concatenate(parts)
        if weighted:
            uid_idx = {uid: i for i, uid in enumerate(uids)}
            entries = []
            for blk in blocks:
                ent = []
                for ri in blk:
                    doc = (reviews[ri][1], reviews[ri][2], reviews[ri][3])
                    for uid, cnt in theta_counts[ri].items():
                        i = uid_idx.get(uid)
                        if i is None:
                            continue    # cluster recycled since sampling
                        ent.append(([doc] * cnt, i))
                entries.append(ent)
        else:
            entries = [
                [([(reviews[ri][1], reviews[ri][2], reviews[ri][3])],
                  assign[ri]) for ri in blk]
                for blk in blocks
            ]
        entry_refs = [ray.put(e) for e in entries]

        def value_grad(x):
            f = 0.0
            g = np.zeros_like(x)
            for i in range(k_bar):          # G0 energy (calculateR1)
                off = pdim * i
                if model in ("clr", "mtclr"):
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
            if model == "mtclr":
                # w_s close to w_g, η2 (MTCLRWithHDP.calculateR1 :69-88,
                # vctMean branch)
                off = pdim * k_bar
                d = x[off: off + F1] - g_w
                f += eta2 * float(d @ d) / (nuA[1] ** 2) / 2.0
                g[off: off + F1] += eta2 * d / (nuA[1] ** 2)
            elif model == "mtclin":
                # η3 scaling / η4 shifting (MTCLinAdaptWithHDP :78-94)
                off = pdim * k_bar
                da = x[off: off + F1] - nuB[0]
                db = x[off + F1: off + 2 * F1] - nuA[0]
                f += (eta3 * float(da @ da) / (nuB[1] ** 2)
                      + eta4 * float(db @ db) / (nuA[1] ** 2)) / 2.0
                g[off: off + F1] += eta3 * da / (nuB[1] ** 2)
                g[off + F1: off + 2 * F1] += eta4 * db / (nuA[1] ** 2)
            x_ref = ray.put(x)
            outs = ray.get([
                _dp_block_fg.remote(r, x_ref, g_w, pdim, model, k_bar,
                                    False, q)
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
        if has_sup:
            sup = x[pdim * k_bar:].copy()
        return fv

    def m_step():
        sample_gamma()
        return est_phi(False)

    def clear_counts():
        for tc in theta_counts:
            tc.clear()

    e_step(first=True)
    k_trace = [len(clusters)]
    for _ in range(burn_in):
        m_step()
        e_step()
        k_trace.append(len(clusters))
    fv = m_step()
    if thinning <= 1:
        for _ in range(n_iters):
            e_step()
            fv = m_step()
            k_trace.append(len(clusters))
    else:
        # MultipleE schedule (train :49-90): thinning × (E; γ), one
        # count-weighted MLE, clear stats
        clear_counts()
        for _ in range(n_iters):
            for _ in range(thinning):
                e_step()
                sample_gamma()
            fv = est_phi(True)
            clear_counts()
            k_trace.append(len(clusters))

    # per-user personalized weights
    personalized = {}
    user_major = {}
    if model == "mtclin":
        # MTCLinAdaptWithHDP.setPersonalizedModel :274-301: review-count-
        # weighted mixture of per-cluster personalized models over
        # w_s[n] = a_s[n]·w_g[n] + b_s[n] (setClusterModels :252-266)
        w_s = sup[:F1] * g_w + sup[F1:]
        cluster_p = [A[:F1] * w_s + A[F1:] for A in clusters]
        for ui, u in enumerate(users):
            if user_mem[ui]:
                tot = float(sum(user_mem[ui].values()))
                p = np.zeros(F1)
                for k, n in user_mem[ui].items():
                    p += (n / tot) * cluster_p[k]
                k_maj = max(sorted(user_mem[ui]),
                            key=lambda kk: user_mem[ui][kk])
            else:
                p = cluster_p[0]
                k_maj = 0
            user_major[u] = k_maj
            personalized[u] = p
    else:
        for ui, u in enumerate(users):
            if user_mem[ui]:
                k = max(sorted(user_mem[ui]),
                        key=lambda kk: user_mem[ui][kk])
            else:
                k = 0
            user_major[u] = k
            A = clusters[k]
            if model == "clr":
                personalized[u] = A
            elif model == "mtclr":
                # w_u + q·w_s (the DP-tier personalization applied to the
                # user's majority cluster)
                personalized[u] = A + q * sup
            else:
                personalized[u] = A[:F1] * g_w + A[F1:]
    return {"users": users, "review_assign": list(assign),
            "user_major_cluster": user_major,
            "clusters": [cl.copy() for cl in clusters],
            "gammas": list(gammas), "gamma_e": gamma_e,
            "personalized": personalized, "k_trace": k_trace,
            "super_model": (None if sup is None else sup.copy()),
            "final_f": fv}
