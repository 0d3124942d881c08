"""Dirichlet-process clustered model adaptation —
``modelAdaptation/DirichletProcess/CLRWithDP.java`` (cluster-shared LR
weights) and ``CLinAdaptWithDP.java`` (cluster-shared LinAdapt transforms),
the reference's DP-automatic-grouping tier.

The sampler is Neal's Algorithm 8 for DP mixtures (auxiliary-component
Gibbs; public), exactly as the reference runs it:

- E-step (``calculate_E_step``/``sampleOneInstance`` :185-254): users in
  order; remove the user from its cluster (empty cluster → swap-delete with
  the last, :238-241); draw M=6 auxiliary models from G0; candidate
  log-weights = user log-likelihood under the model + log(memSize) for
  existing clusters or log(α)−log(M) for auxiliaries; the draw transcribes
  the reference's log-space walk — target = logΣ + log(U), prefix
  log-sum-exp walk with the hit-the-last k−− guard (:216-231); choosing an
  auxiliary appends it as a new cluster (swap to position kBar).
- M-step (``calculate_M_step``/``estPhi`` :339-386): ONE joint L-BFGS over
  all kBar cluster parameter blocks — R1 = the G0 Gaussian energy of every
  cluster model (``calculateR1`` :146-161: η1·Σ(w−mean)²/σ²/2, mean = the
  global weights when vctMean, CLinAdapt uses the DoubleNormalPrior split
  η1-scaling/η2-shifting) + Σ_users −L̄(user | its cluster model), L̄ the
  adaptation-size-normalized RegLR log-likelihood with the MAX_VALUE
  saturation guards.
- models: "clr" = cluster weight vector w (dim F+1, G0 = N(g_w, σ_A));
  "clin" = cluster transform (a, b) (dim 2(F+1), identity feature groups,
  G0 = N(1, 0.1) scaling ⊗ N(0, 1) shifting, decision
  a∘w_g + b like LinAdapt); "mtclr" = ``MTCLRWithDP.java`` — cluster
  weight w_u (scalar prior N(nuA), "w_u close to 0", :35-39) plus a
  jointly-learned super weight vector w_s ~ N(w_g, σ_A), decision
  q·w_s·x + w_u·x (:41-45), R1 += η2·‖w_s−w_g‖²/σ²/2 (:48-56),
  personalized w_u + q·w_s (:92-99); "mtclin" = ``MTCLinAdaptWithDP.java`` —
  cluster transforms applied over a JOINTLY-LEARNED super model
  w_s = a_s∘w_g + b_s (the super block sits at the END of the joint
  parameter vector exactly like ``accumulateClusterModels`` :41-46;
  its G0 energy is scaled by η3/η4, ``calculateR1`` :57-70; gradients
  flow into both the cluster block and the super block per review,
  ``gradientByFunc`` :77-111).

Execution shape: the CRP sweep is inherently sequential over users (cheap —
per-user candidate scoring is a small dense op), while the M-step dominates
and distributes exactly like the repo's other joint objectives: per-user-
block (f, g) partials against the broadcast concatenated cluster models,
summed in fixed order, L-BFGS on the driver. Determinism: seeded Philox
streams replace the reference's unseeded Mersenne twisters (house policy).


``modelAdaptation/DirichletProcess/_DPAdaptStruct.java``'s per-user cluster pointer is the assign list here.
"""

from __future__ import annotations

import numpy as np

import ray

from ir_base_ray.pipelines.linadapt import MAX_VALUE
from ir_base_ray.pipelines.linear import lbfgs_minimize


def _loglik_clr(w, docs, l_norm=True):
    """RegLR calcLogLikelihood under cluster weights w (÷|adapt| when
    ``l_norm`` — the shipped main runs setLNormFlag(false),
    ``LinAdaptMain.java:123``, which is what lets the data term overcome
    the CRP's log(memSize) bonus)."""
    L = 0.0
    for tids, vals, y in docs:
        f = w[0] + float((w[tids + 1] * vals).sum())
        p = 1.0 / (1.0 + np.exp(-f)) if f > -500 else 0.0
        if y == 1:
            L += np.log(p) if p > 0.0 else -MAX_VALUE
        else:
            L += np.log(1.0 - p) if p < 1.0 else -MAX_VALUE
    return L / max(1, len(docs)) if l_norm else L


def _loglik_mtclin(A, sup, g_w, docs, l_norm=True):
    """MTCLinAdaptWithDP likelihood: cluster transform over the super
    weights w_s = a_s∘w_g + b_s."""
    F1 = g_w.size
    w_s = sup[:F1] * g_w + sup[F1:]
    return _loglik_clin(A, w_s, docs, l_norm)


def _loglik_mtclr(w, sup, q, docs, l_norm=True):
    """MTCLRWithDP/HDP/MMB likelihood: decision = q·(w_s·x) + w_c·x
    (``MTCLRWithDP.logit`` :41-45 / ``MTCLRWithHDP.logit`` :63-67)."""
    L = 0.0
    for tids, vals, y in docs:
        n = tids + 1
        f = (q * (sup[0] + float((sup[n] * vals).sum()))
             + w[0] + float((w[n] * vals).sum()))
        p = 1.0 / (1.0 + np.exp(-f)) if f > -500 else 0.0
        if y == 1:
            L += np.log(p) if p > 0.0 else -MAX_VALUE
        else:
            L += np.log(1.0 - p) if p < 1.0 else -MAX_VALUE
    return L / max(1, len(docs)) if l_norm else L


def _loglik_clin(A, g_w, docs, l_norm=True):
    """LinAdapt-style likelihood under cluster transform A = (a, b)."""
    F1 = g_w.size
    a, b = A[:F1], A[F1:]
    L = 0.0
    for tids, vals, y in docs:
        n = tids + 1
        f = a[0] * g_w[0] + b[0] + float(((a[n] * g_w[n] + b[n]) * vals).sum())
        p = 1.0 / (1.0 + np.exp(-f)) if f > -500 else 0.0
        if y == 1:
            L += np.log(p) if p > 0.0 else -MAX_VALUE
        else:
            L += np.log(1.0 - p) if p < 1.0 else -MAX_VALUE
    return L / max(1, len(docs)) if l_norm else L


def dp_block_fg(user_entries, x, g_w, pdim, model, n_clusters,
                l_norm=True, q=0.1):
    """Data-term partial for one user block: −L̄ under the user's assigned
    cluster model, gradient into that cluster's parameter block. Plain
    function — ``_dp_block_fg`` is its ray.remote wrapper; callers use the
    local form when the whole problem is driver-scale (the per-iteration
    remote-call latency would dominate a sub-millisecond partial)."""
    F1 = g_w.size
    f = 0.0
    g = np.zeros_like(x)
    for docs, cid in user_entries:
        off = pdim * cid
        n_adapt = max(1, len(docs)) if l_norm else 1
        if model == "mtclr":
            # MTCLR: decision q·w_s·x + w_c·x; gradient into the cluster
            # block and q-scaled into the super block at the end
            # (``MTCLRWithDP.gradientByFunc`` :62-84)
            sup_off = pdim * n_clusters
            w = x[off: off + pdim]
            ws = x[sup_off: sup_off + pdim]
            for tids, vals, y in docs:
                n = tids + 1
                s = (q * (ws[0] + float((ws[n] * vals).sum()))
                     + w[0] + float((w[n] * vals).sum()))
                p = 1.0 / (1.0 + np.exp(-s)) if s > -500 else 0.0
                if y == 1:
                    f -= (np.log(p) if p > 0.0 else -MAX_VALUE) / n_adapt
                else:
                    f -= (np.log(1.0 - p) if p < 1.0 else -MAX_VALUE) / n_adapt
                delta = (y - p) / n_adapt
                g[off] -= delta
                g[sup_off] -= q * delta
                np.subtract.at(g, off + n, delta * vals)
                np.subtract.at(g, sup_off + n, q * delta * vals)
        elif model == "clr":
            w = x[off: off + pdim]
            for tids, vals, y in docs:
                n = tids + 1
                s = w[0] + float((w[n] * vals).sum())
                p = 1.0 / (1.0 + np.exp(-s)) if s > -500 else 0.0
                if y == 1:
                    f -= (np.log(p) if p > 0.0 else -MAX_VALUE) / n_adapt
                else:
                    f -= (np.log(1.0 - p) if p < 1.0 else -MAX_VALUE) / n_adapt
                delta = (y - p) / n_adapt
                g[off] -= delta
                np.subtract.at(g, off + n, delta * vals)
        elif model == "clin":
            a = x[off: off + F1]
            b = x[off + F1: off + 2 * F1]
            for tids, vals, y in docs:
                n = tids + 1
                s = a[0] * g_w[0] + b[0] + float(
                    ((a[n] * g_w[n] + b[n]) * vals).sum())
                p = 1.0 / (1.0 + np.exp(-s)) if s > -500 else 0.0
                if y == 1:
                    f -= (np.log(p) if p > 0.0 else -MAX_VALUE) / n_adapt
                else:
                    f -= (np.log(1.0 - p) if p < 1.0 else -MAX_VALUE) / n_adapt
                delta = (y - p) / n_adapt
                g[off] -= delta * g_w[0]
                g[off + F1] -= delta
                np.subtract.at(g, off + n, delta * g_w[n] * vals)
                np.subtract.at(g, off + F1 + n, delta * vals)
        else:  # mtclin: cluster transform over the learned super model
            sup_off = pdim * n_clusters
            a = x[off: off + F1]
            b = x[off + F1: off + 2 * F1]
            a_s = x[sup_off: sup_off + F1]
            b_s = x[sup_off + F1: sup_off + 2 * F1]
            w_s = a_s * g_w + b_s
            for tids, vals, y in docs:
                n = tids + 1
                s = a[0] * w_s[0] + b[0] + float(
                    ((a[n] * w_s[n] + b[n]) * vals).sum())
                p = 1.0 / (1.0 + np.exp(-s)) if s > -500 else 0.0
                if y == 1:
                    f -= (np.log(p) if p > 0.0 else -MAX_VALUE) / n_adapt
                else:
                    f -= (np.log(1.0 - p) if p < 1.0 else -MAX_VALUE) / n_adapt
                delta = (y - p) / n_adapt
                # cluster block (gradientByFunc :93-104)
                g[off] -= delta * w_s[0]
                g[off + F1] -= delta
                np.subtract.at(g, off + n, delta * w_s[n] * vals)
                np.subtract.at(g, off + F1 + n, delta * vals)
                # super block (:96-110)
                g[sup_off] -= delta * a[0] * g_w[0]
                g[sup_off + F1] -= delta * a[0]
                np.subtract.at(g, sup_off + n, delta * a[n] * g_w[n] * vals)
                np.subtract.at(g, sup_off + F1 + n, delta * a[n] * vals)
    return f, g


_dp_block_fg = ray.remote(dp_block_fg)


def train_dp_adaptation(user_docs: dict, g_w: np.ndarray, *,
                        model: str = "clr", alpha: float = 1.0, M: int = 6,
                        burn_in: int = 3, n_iters: int = 8,
                        eta1: float = 0.5, eta2: float = 0.5,
                        eta3: float = 1.0, eta4: float = 1.0,
                        nuA: tuple = (0.0, 1.0), nuB: tuple = (1.0, 0.1),
                        seed: int = 29, n_blocks: int = 4,
                        lbfgs_iter: int = 60, l_norm: bool = False,
                        q: float = 0.1):
    """Full DP-adaptation EM. ``user_docs``: {user: [(tids, vals, y01)]},
    users with no adaptation data are skipped (like the reference).
    ``l_norm`` defaults to False — the shipped main disables the per-user
    likelihood normalization (``LinAdaptMain.java:123`` setLNormFlag(false));
    with it on, the CRP's log(memSize) term dominates the normalized data
    term and the sampler collapses to one cluster (measured).
    Returns ordered users, their cluster ids, the cluster models, per-user
    personalized weights and the kBar trace."""
    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    pdim = F1 if model in ("clr", "mtclr") else 2 * F1
    has_sup = model in ("mtclin", "mtclr")
    users = [u for u in user_docs if user_docs[u]]
    docs_by_user = [
        [(np.asarray(t, dtype=np.int64), np.asarray(v, dtype=np.float64),
          int(y)) for t, v, y in user_docs[u]]
        for u in users
    ]
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))

    def sample_g0(k):
        if model == "clr":
            return rng.normal(g_w, nuA[1], size=(k, F1))   # vctMean prior
        if model == "mtclr":
            # MTCLRWithDP.initPriorG0 :35-39 replaces G0 with the scalar
            # prior N(nuA) for the per-cluster w_u ("only for w_u")
            return rng.normal(nuA[0], nuA[1], size=(k, F1))
        out = np.empty((k, pdim))
        out[:, :F1] = rng.normal(nuB[0], nuB[1], size=(k, F1))
        out[:, F1:] = rng.normal(nuA[0], nuA[1], size=(k, F1))
        return out

    # initPriorG0 :50-54 (mtclin); MTCLRWithDP :35-39 samples the super
    # weights around the GLOBAL model (m_G0.sampling(m_gWeights, ...))
    if model == "mtclr":
        sup = rng.normal(g_w, nuA[1], size=F1)
    else:
        sup = sample_g0(1)[0].copy() if has_sup else None

    def loglik(theta, docs):
        if model == "clr":
            return _loglik_clr(theta, docs, l_norm)
        if model == "clin":
            return _loglik_clin(theta, g_w, docs, l_norm)
        if model == "mtclr":
            return _loglik_mtclr(theta, sup, q, docs, l_norm)
        return _loglik_mtclin(theta, sup, g_w, docs, l_norm)

    clusters: list[np.ndarray] = []      # kBar cluster models (in order)
    mem: list[int] = []
    assign = [-1] * len(users)
    p_new = np.log(alpha) - np.log(M)

    def sample_one(ui):
        aux = sample_g0(M)
        cands = clusters + [aux[m] for m in range(M)]
        props = np.empty(len(cands))
        logsum = 0.0
        for k, th in enumerate(cands):
            ll = loglik(th, docs_by_user[ui])
            ll += np.log(mem[k]) if k < len(clusters) else p_new
            props[k] = ll
            logsum = ll if k == 0 else np.logaddexp(logsum, ll)
        target = logsum + np.log(rng.random())
        k = 0
        acc = props[0]
        while acc < target and k < len(cands) - 1:
            k += 1
            acc = np.logaddexp(acc, props[k])
        # (the reference's hit-the-last k-- guard is unreachable here because
        # the walk stops at the final index; kept as the bound above)
        if k >= len(clusters):
            clusters.append(cands[k].copy())
            mem.append(0)
            k = len(clusters) - 1
        mem[k] += 1
        assign[ui] = k

    def e_step(first=False):
        for ui in range(len(users)):
            if not first:
                cid = assign[ui]
                mem[cid] -= 1
                if mem[cid] == 0:
                    # swap-delete with the last cluster (reference :238-241)
                    last = len(clusters) - 1
                    if cid != last:
                        clusters[cid], clusters[last] = (clusters[last],
                                                         clusters[cid])
                        mem[cid], mem[last] = mem[last], mem[cid]
                        for uj in range(len(users)):
                            if assign[uj] == last:
                                assign[uj] = cid
                    clusters.pop()
                    mem.pop()
            sample_one(ui)

    blocks = [list(range(len(users)))[i::n_blocks]
              for i in range(min(n_blocks, max(1, len(users))))]

    def m_step():
        nonlocal sup
        k_bar = len(clusters)
        parts = list(clusters) + ([sup] if has_sup else [])
        x0 = np.concatenate(parts) if parts else np.zeros(0)
        entries_refs = [
            ray.put([(docs_by_user[ui], assign[ui]) for ui in blk])
            for blk in blocks
        ]

        def value_grad(x):
            # R1: G0 energy of every cluster model (driver side, small)
            f = 0.0
            g = np.zeros_like(x)
            for i in range(k_bar):
                off = pdim * i
                if model == "clr":
                    d = x[off: off + pdim] - g_w
                    f += eta1 * float(d @ d) / (nuA[1] ** 2) / 2.0
                    g[off: off + pdim] += eta1 * d / (nuA[1] ** 2)
                elif model == "mtclr":
                    # per-cluster w_u close to 0 (scalar prior,
                    # MTCLRWithDP.calculateR1 :48-56 via super)
                    d = x[off: off + pdim] - nuA[0]
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
                # w_s close to w_0 with η2 (MTCLRWithDP.calculateR1 :48-56)
                off = pdim * k_bar
                d = x[off: off + F1] - g_w
                f += eta2 * float(d @ d) / (nuA[1] ** 2) / 2.0
                g[off: off + F1] += eta2 * d / (nuA[1] ** 2)
            elif has_sup:
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
                                    l_norm, q)
                for r in entries_refs
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

    if model == "clr":
        personalized = {u: clusters[assign[i]]
                        for i, u in enumerate(users)}
    elif model == "mtclr":
        # setPersonalizedModel :92-99: w_u + q·w_s
        personalized = {u: clusters[assign[i]] + q * sup
                        for i, u in enumerate(users)}
    else:
        base = g_w if model == "clin" else sup[:F1] * g_w + sup[F1:]
        personalized = {}
        for i, u in enumerate(users):
            A = clusters[assign[i]]
            personalized[u] = A[:F1] * base + A[F1:]
    return {"users": users, "assign": {u: assign[i]
                                       for i, u in enumerate(users)},
            "clusters": [c.copy() for c in clusters],
            "personalized": personalized, "k_trace": k_trace,
            "super_model": (None if sup is None else sup.copy()),
            "final_f": fv}
