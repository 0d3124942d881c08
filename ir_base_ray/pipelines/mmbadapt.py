"""Mixed-membership block model adaptation — the MMB core of
``modelAdaptation/MMB/CLRWithMMB.java`` (+ ``CLinAdaptWithMMB.java``):
CLRWithHDP extended with a user-user NETWORK whose directed edge
memberships share the HDP clusters, coupling text and network.

Transcribed semantics:

- every observed pair (i, j) carries two directed membership indicators
  z_{i→j}, z_{j→i} over the SAME HDP clusters as the document assignments;
- group popularity for BOTH document and edge sampling counts doc AND edge
  memberships (``calcGroupPopularity`` :154-158);
- edge likelihood is the collapsed Beta-Bernoulli predictive over
  cluster-pair connection counts (``calcLogLikelihoodEMarginal`` :163-179):
  p(e=1) = ρ(a+e₁)/(a+b+e₀+e₁), p(e=0) its complement; the joint-prior
  variant ``calcLogLikelihoodE`` (:181-195) drives the background gate;
- ``sampleEdge`` (:662-716): candidates = kBar existing clusters (marginal
  edge likelihood + log popularity) plus one NEW-cluster option at
  log(η·γ_e) + pNew[e] (``calcProbNew`` :145-151: pNew[1]=log(ρ·a/(a+b)),
  pNew[0]=log(1−ρ·a/(a+b))); the reference's walk STARTS at the
  new-cluster term (``sampleEdgeInLogSpace`` :719-737, k=−1) — new
  clusters stick-break γ like the HDP doc path;
- zero edges are a mixture of the MMB and a background model with weight
  (1−ρ) (``sampleC`` :635-660): each MMB-attributed zero edge is kept or
  released to background by a Bernoulli on
  p_mmb/(p_bk + p_mmb); released edges drop their memberships. The
  reference's joint zero-edge enumeration over (k+1)(k+2)/2 membership
  pairs (``sampleZeroEdgeJoint``) is replaced by the equivalent sequential
  per-direction conditional Gibbs sweep — the standard factorization of
  the same posterior (documented substitution);
- B matrix MLE with the Beta mode formula (e₁+a−1)/(e₀+e₁+a+b−2)
  (``MLEB`` :576-594);
- cluster count bookkeeping: edge memberships keep otherwise-empty
  clusters alive (cluster deletion requires zero docs AND zero edge
  memberships).

Doc-side machinery (Dirichlet-multinomial LM, Antoniak γ resampling,
distributed joint-φ L-BFGS M-step) is shared with pipelines/hdpadapt.py.
Defaults ρ=0.001, (a,b)=(0.1,0.01) per the reference (:29-36).


``modelAdaptation/MMB/_MMBAdaptStruct.java``'s edge-membership bookkeeping lives in the user_edge_mem/edge_ind maps here.
"""

from __future__ import annotations

import numpy as np

import ray

from ir_base_ray.pipelines.dpadapt import (_dp_block_fg, _loglik_clin,
                                           _loglik_clr, _loglik_mtclin,
                                           _loglik_mtclr, dp_block_fg)
from ir_base_ray.pipelines.hdpadapt import _log_gamma_division, _Stirling
from ir_base_ray.pipelines.linear import lbfgs_minimize


def train_mmb_adaptation(user_docs: dict, edges: dict, g_w: np.ndarray, *,
                         model: str = "clr", alpha: float = 1.0,
                         eta: float = 1.0, beta: float = 1.0, c: float = 1.0,
                         rho: float = 0.001, ab: tuple = (0.1, 0.01),
                         M: int = 6, burn_in: int = 2, n_iters: int = 5,
                         eta1: float = 0.05, eta2: float = 0.05,
                         eta3: float = 1.0, eta4: float = 1.0,
                         q: float = 0.1,
                         nuA: tuple = (0.0, 1.0), nuB: tuple = (1.0, 0.1),
                         seed: int = 47, n_blocks: int = 4,
                         lbfgs_iter: int = 60):
    """``edges``: {(user_a, user_b): 0/1} over unordered user pairs (the
    observed network). Returns cluster models, the B block matrix, per-user
    mixtures over clusters (doc + edge memberships), per-user personalized
    weights (majority cluster), background-edge count, k trace.

    ``model`` adds the multi-task variants "mtclr" (``MMB/MTCLRWithMMB.java``
    :49-103 — decision q·w_s·x + w_c·x with a jointly-learned super weight
    vector, R1 += η2·‖w_s−w_g‖²/σ²/2, identical to the HDP MT tier) and
    "mtclin" (``MMB/MTCLinAdaptWithMMB.java`` :42-115 — cluster transforms
    over w_s[n] = a_s[n]·w_g[n] + b_s[n], η3/η4 super energy)."""
    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    pdim = F1 if model in ("clr", "mtclr") else 2 * F1
    has_sup = model in ("mtclr", "mtclin")
    lm_dim = F1 - 1
    betas = c * np.ones(lm_dim) + beta
    beta_sum = float(betas.sum())
    a_p, b_p = ab
    p_new = {1: np.log(rho) + np.log(a_p) - np.log(a_p + b_p),
             0: np.log(1.0 - rho * a_p / (a_p + b_p))}
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))
    stirling = _Stirling()

    users = [u for u in user_docs if user_docs[u]]
    uix = {u: i for i, u in enumerate(users)}
    reviews = []
    for ui, u in enumerate(users):
        for t, v, y in user_docs[u]:
            reviews.append([ui, np.asarray(t, dtype=np.int64),
                            np.asarray(v, dtype=np.float64), int(y)])
    l4new = np.empty(len(reviews))
    for ri, (ui, t, v, _y) in enumerate(reviews):
        L, m = 0.0, 0.0
        for idx, val in zip(t.tolist(), v.tolist()):
            m += val
            L += _log_gamma_division(int(val), betas[idx], 0.0)
        l4new[ri] = L - _log_gamma_division(int(m), beta_sum, 0.0)

    pair_list = [((uix[a], uix[b]), int(e)) for (a, b), e in edges.items()
                 if a in uix and b in uix]

    # ---- mutable sampler state -------------------------------------------
    clusters: list[np.ndarray] = []
    lm_stats: list[np.ndarray] = []
    gammas: list[float] = []
    doc_mem: list[int] = []              # document membership count
    edge_mem_total: list[int] = []       # edge membership count
    conn0: dict[tuple[int, int], int] = {}   # cluster-pair e=0 counts
    conn1: dict[tuple[int, int], int] = {}
    user_doc_mem: list[dict[int, int]] = [dict() for _ in users]
    user_edge_mem: list[dict[int, int]] = [dict() for _ in users]
    doc_assign = [-1] * len(reviews)
    edge_ind: dict[tuple[int, int], int] = {}   # directed (i,j) → cluster
    in_mmb: dict[tuple[int, int], bool] = {}    # unordered pair key
    gamma_e = 1.0

    def sample_g0(k):
        if model in ("clr", "mtclr"):
            return rng.normal(g_w, nuA[1], size=(k, F1))
        out = np.empty((k, pdim))
        out[:, :F1] = rng.normal(nuB[0], nuB[1], size=(k, F1))
        out[:, F1:] = rng.normal(nuA[0], nuA[1], size=(k, F1))
        return out

    # super block init (MTCLRWithMMB.initPriorG0 :49-53 /
    # MTCLinAdaptWithMMB :54-58)
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

    def conn_counts(g, h):
        key = (g, h) if g <= h else (h, g)
        return conn0.get(key, 0), conn1.get(key, 0)

    def conn_update(g, h, e, d):
        key = (g, h) if g <= h else (h, g)
        tbl = conn1 if e == 1 else conn0
        tbl[key] = tbl.get(key, 0) + d
        if tbl[key] == 0:
            del tbl[key]

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

    def popularity(ui, k):
        """calcGroupPopularity: doc + η·γ + edge memberships."""
        return (user_doc_mem[ui].get(k, 0) + eta * gammas[k]
                + user_edge_mem[ui].get(k, 0))

    def edge_marginal(g, h, e):
        e0, e1 = conn_counts(g, h)
        p1 = (np.log(rho) + np.log(a_p + e1)
              - np.log(a_p + b_p + e0 + e1))
        return p1 if e == 1 else np.log(1.0 - np.exp(p1))

    def new_cluster(theta=None):
        nonlocal gamma_e
        clusters.append(sample_g0(1)[0] if theta is None else theta.copy())
        lm_stats.append(np.zeros(lm_dim))
        rnd = rng.beta(1.0, alpha)
        gammas.append(rnd * gamma_e)
        gamma_e = (1.0 - rnd) * gamma_e
        doc_mem.append(0)
        edge_mem_total.append(0)
        return len(clusters) - 1

    def maybe_delete(k):
        nonlocal gamma_e
        if doc_mem[k] > 0 or edge_mem_total[k] > 0:
            return
        gamma_e += gammas[k]
        last = len(clusters) - 1
        if k != last:
            for lst in (clusters, lm_stats, gammas, doc_mem,
                        edge_mem_total):
                lst[k], lst[last] = lst[last], lst[k]
            for rj in range(len(reviews)):
                if doc_assign[rj] == last:
                    doc_assign[rj] = k
            for d in (edge_ind,):
                for key, v in list(d.items()):
                    if v == last:
                        d[key] = k
            for um in user_doc_mem + user_edge_mem:
                if last in um:
                    um[k] = um.pop(last)
            remap = {}
            for tbl in (conn0, conn1):
                for (g, h), v in list(tbl.items()):
                    ng = k if g == last else g
                    nh = k if h == last else h
                    if (ng, nh) != (g, h):
                        del tbl[(g, h)]
                        nk = (ng, nh) if ng <= nh else (nh, ng)
                        tbl[nk] = tbl.get(nk, 0) + v
            del remap
        for lst in (clusters, lm_stats, gammas, doc_mem, edge_mem_total):
            lst.pop()

    # ---------------------------------------------------- document sampling
    def sample_review(ri, first=False):
        ui, t, v, y = reviews[ri]
        if not first:
            k_old = doc_assign[ri]
            user_doc_mem[ui][k_old] -= 1
            if user_doc_mem[ui][k_old] == 0:
                del user_doc_mem[ui][k_old]
            np.subtract.at(lm_stats[k_old], t, v)
            doc_mem[k_old] -= 1
            maybe_delete(k_old)
        aux = sample_g0(M)
        K = len(clusters)
        props = np.empty(K + M)
        logsum = 0.0
        for k in range(K + M):
            theta = clusters[k] if k < K else aux[k - K]
            ll = loglik_y(theta, t, v, y)
            if k < K:
                ll += loglik_x(k, ri)
                pop = popularity(ui, k)
            else:
                ll += l4new[ri]
                pop = eta * (gamma_e / M)
            ll += np.log(max(pop, 1e-300))
            props[k] = ll
            logsum = ll if k == 0 else np.logaddexp(logsum, ll)
        target = logsum + np.log(rng.random())
        k = 0
        acc = props[0]
        while acc < target and k < K + M - 1:
            k += 1
            acc = np.logaddexp(acc, props[k])
        if k >= K:
            k = new_cluster(aux[k - K])
        doc_mem[k] += 1
        user_doc_mem[ui][k] = user_doc_mem[ui].get(k, 0) + 1
        np.add.at(lm_stats[k], t, v)
        doc_assign[ri] = k

    # -------------------------------------------------------- edge sampling
    def remove_edge_dir(i, j, e):
        key = (i, j)
        if key not in edge_ind:
            return
        g = edge_ind.pop(key)
        other = edge_ind.get((j, i))
        user_edge_mem[i][g] -= 1
        if user_edge_mem[i][g] == 0:
            del user_edge_mem[i][g]
        edge_mem_total[g] -= 1
        if other is not None:
            conn_update(g, other, e, -1)
        maybe_delete(g)

    def sample_edge_dir(i, j, e):
        """sampleEdge(i,j,e): membership for the i→j direction given the
        j→i indicator (must exist)."""
        h = edge_ind.get((j, i))
        K = len(clusters)
        props = np.empty(K)
        new_term = np.log(eta * max(gamma_e, 1e-300)) + p_new[e]
        logsum = new_term
        for k in range(K):
            ll = (edge_marginal(k, h, e) if h is not None else p_new[e])
            ll += np.log(max(popularity(i, k), 1e-300))
            props[k] = ll
            logsum = np.logaddexp(logsum, ll)
        target = logsum + np.log(rng.random())
        # reference walk starts at the new-cluster term (k=-1)
        k = -1
        acc = new_term
        while acc < target and k < K - 1:
            k += 1
            acc = np.logaddexp(acc, props[k])
        if k == -1:
            k = new_cluster()
        user_edge_mem[i][k] = user_edge_mem[i].get(k, 0) + 1
        edge_mem_total[k] += 1
        if h is not None:
            conn_update(k, h, e, +1)
        edge_ind[(i, j)] = k

    def e_step_edges(first=False):
        for (i, j), e in pair_list:
            key = (i, j) if i <= j else (j, i)
            if first:
                in_mmb[key] = True
            if e == 0 and in_mmb[key] and not first:
                # sampleC background gate on the CURRENT memberships
                g, h = edge_ind.get((i, j)), edge_ind.get((j, i))
                if g is not None and h is not None:
                    e0, e1 = conn_counts(g, h)
                    p_mmb = np.exp(np.log(b_p + e0) + np.log(rho)
                                   - np.log(a_p + b_p + e0 + e1))
                    if rng.random() >= p_mmb / ((1.0 - rho) + p_mmb):
                        remove_edge_dir(i, j, 0)
                        remove_edge_dir(j, i, 0)
                        in_mmb[key] = False
                        continue
            if not in_mmb[key]:
                # background zero edge: Bernoulli re-entry with prob ρ-ish —
                # the reference re-evaluates via its joint zero sampler; the
                # conditional sweep re-admits with the prior MMB weight
                if e == 0 and rng.random() >= rho:
                    continue
                in_mmb[key] = True
            if not first:
                remove_edge_dir(i, j, e)
                remove_edge_dir(j, i, e)
            sample_edge_dir(i, j, e)
            sample_edge_dir(j, i, e)

    def sample_gamma():
        nonlocal gamma_e
        K = len(clusters)
        h_sizes = np.zeros(K)
        for ui in range(len(users)):
            merged: dict[int, int] = dict(user_doc_mem[ui])
            for k, n in user_edge_mem[ui].items():
                merged[k] = merged.get(k, 0) + n
            for k, n in merged.items():
                if n == 1:
                    h_sizes[k] += 1
                    continue
                eg = np.log(eta) + np.log(max(gammas[k], 1e-300))
                cache = np.array([h * eg + stirling(n, h)
                                  for h in range(1, n + 1)])
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
        nonlocal sup
        sample_gamma()
        k_bar = len(clusters)
        parts = list(clusters) + ([sup] if has_sup else [])
        x0 = np.concatenate(parts)
        entries = [
            [([(reviews[ri][1], reviews[ri][2], reviews[ri][3])],
              doc_assign[ri]) for ri in blk]
            for blk in blocks
        ]
        # driver-scale inputs skip the remote round-trips (latency-bound);
        # the distributed path is identical math at scale
        local = len(reviews) < 2000
        entry_refs = None if local else [ray.put(e) for e in entries]

        def value_grad(x):
            f = 0.0
            g = np.zeros_like(x)
            for i in range(k_bar):
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
                # w_s close to w_g, η2 (MTCLRWithMMB.calculateR1 :61-78)
                off = pdim * k_bar
                d = x[off: off + F1] - g_w
                f += eta2 * float(d @ d) / (nuA[1] ** 2) / 2.0
                g[off: off + F1] += eta2 * d / (nuA[1] ** 2)
            elif model == "mtclin":
                off = pdim * k_bar
                da = x[off: off + F1] - nuB[0]
                db = x[off + F1: off + 2 * F1] - nuA[0]
                f += (eta3 * float(da @ da) / (nuB[1] ** 2)
                      + eta4 * float(db @ db) / (nuA[1] ** 2)) / 2.0
                g[off: off + F1] += eta3 * da / (nuB[1] ** 2)
                g[off + F1: off + 2 * F1] += eta4 * db / (nuA[1] ** 2)
            if local:
                outs = [dp_block_fg(e, x, g_w, pdim, model, k_bar, False, q)
                        for e in entries]
            else:
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

    # ---- EM --------------------------------------------------------------
    for ri in range(len(reviews)):
        sample_review(ri, first=True)
    e_step_edges(first=True)
    k_trace = [len(clusters)]
    fv = 0.0
    for it in range(burn_in + n_iters):
        fv = m_step()
        for ri in range(len(reviews)):
            sample_review(ri)
        e_step_edges()
        k_trace.append(len(clusters))
    fv = m_step()

    # ---- outputs ---------------------------------------------------------
    K = len(clusters)
    B = np.zeros((K, K))
    for gidx in range(K):
        for h in range(gidx, K):
            e0, e1 = conn_counts(gidx, h)
            denom = e0 + e1 + a_p + b_p - 2.0
            B[gidx, h] = B[h, gidx] = ((e1 + a_p - 1.0) / denom
                                       if denom != 0 else 0.0)
    mixtures = {}
    personalized = {}
    if model == "mtclin":
        w_s = sup[:F1] * g_w + sup[F1:]
        cluster_p = [A[:F1] * w_s + A[F1:] for A in clusters]
    for ui, u in enumerate(users):
        merged: dict[int, int] = dict(user_doc_mem[ui])
        for k, n in user_edge_mem[ui].items():
            merged[k] = merged.get(k, 0) + n
        pi = np.zeros(K)
        for k, n in merged.items():
            pi[k] = n
        tot = pi.sum()
        mixtures[u] = pi / tot if tot else pi
        k = int(pi.argmax()) if tot else 0
        A = clusters[k]
        if model == "clr":
            personalized[u] = A
        elif model == "mtclr":
            personalized[u] = A + q * sup
        elif model == "mtclin":
            # REVIEW-membership-weighted mixture of per-cluster
            # personalized models (MTCLinAdaptWithHDP :274-301 —
            # getClusterAssignment counts the user's review thetas only,
            # not edge memberships)
            dm = user_doc_mem[ui]
            dtot = float(sum(dm.values()))
            if dtot:
                p = np.zeros(F1)
                for kk, n in dm.items():
                    p += (n / dtot) * cluster_p[kk]
                personalized[u] = p
            else:
                personalized[u] = cluster_p[k]
        else:
            personalized[u] = A[:F1] * g_w + A[F1:]
    n_background = sum(1 for v in in_mmb.values() if not v)
    return {"users": users, "clusters": [cl.copy() for cl in clusters],
            "B": B, "mixtures": mixtures, "personalized": personalized,
            "k_trace": k_trace, "n_background_edges": n_background,
            "gammas": list(gammas), "gamma_e": gamma_e,
            "super_model": (None if sup is None else sup.copy()),
            "final_f": fv}
