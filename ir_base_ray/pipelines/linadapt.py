"""LinAdapt — per-user scaling/shifting adaptation of a global logistic
model (``Classifier/supervised/modelAdaptation/CoLinAdapt/LinAdapt.java`` +
its ``RegLR/RegLR.java`` base and ``_LinAdaptStruct.java``; the reference's
shipped entry point — ``tmpRun.sh:1`` launches ``mains.LinAdaptMain``).

Semantics transcribed:

- per user u a transformation A_u = (a_0..a_{dim-1}, b_0..b_{dim-1}) over
  feature GROUPS (bias = group 0; with no group file dim = F+1 and the map is
  identity — ``loadFeatureGroupMap`` :67-76); a init 1, b init 0
  (``_LinAdaptStruct``);
- decision function (``linearFunc`` :121-131):
  f(x) = a_{g(0)}·w_0 + b_0 + Σ_n (a_{g(n)}·w_n + b_{g(n)})·x_n, P = σ(f);
- objective per user (``calculateFuncValue`` :143-157, ``calcLogLikelihood``
  RegLR:94-117): −L̄ + Σ_k [η1(a_k−1)² + η2 b_k²], with L̄ the log-likelihood
  normalized by the user's adaptation-set size (m_LNormFlag default true) and
  the reference's ±MAX_VALUE guards at saturated σ;
- gradient (``gradientByFunc`` :160-181, ``gradientByR1`` :184-193):
  δ = (y−P)/|adapt|; ∂a_{g(n)} −= δ·w_n·x_n, ∂b_{g(n)} −= δ·x_n, plus
  2η1(a_k−1) / 2η2 b_k;
- per-user batch L-BFGS (RegLR.train :186-232, m=6) — users are fully
  independent given the broadcast global weights, so the train IS a
  ``groupby(user).map_groups`` (each group optimizes its own 2·dim vector);
  η1 = η2 = 0.5 defaults (:32-34);
- personalized weights (``setPersonalizedModel`` :215-227):
  w^u_n = a_{g(n)}·w_n + b_{g(n)}, prediction P>0.5 → 1 (RegLR ``predict``).

Determinism: the optimization is deterministic given the data (no RNG).


``modelAdaptation/CoLinAdapt/_CoLinAdaptStruct.java``'s sharedA layout is the concatenated joint vector here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ir_base_ray.pipelines.linear import lbfgs_minimize

MAX_VALUE = 1e10  # utils.Utils.MAX_VALUE guard at saturated sigmoid


def _user_value_grad(A, g_w, docs, eta1, eta2):
    """Objective −L̄ + R1 and its gradient for one user. ``docs`` is a list
    of (tids, vals, y); identity feature-group map (dim = F+1)."""
    dim = A.size // 2
    a, b = A[:dim], A[dim:]
    n_adapt = max(1, len(docs))
    L = 0.0
    grad = np.zeros_like(A)
    for tids, vals, y in docs:
        n = tids + 1                       # feature index (bias at 0)
        f = a[0] * g_w[0] + b[0] + float(
            ((a[n] * g_w[n] + b[n]) * vals).sum())
        p = 1.0 / (1.0 + np.exp(-f)) if f > -500 else 0.0
        if y == 1:
            L += np.log(p) if p > 0.0 else -MAX_VALUE
        else:
            L += np.log(1.0 - p) if p < 1.0 else -MAX_VALUE
        delta = (y - p) / n_adapt
        grad[0] -= delta * g_w[0]
        grad[dim] -= delta
        np.subtract.at(grad, n, delta * g_w[n] * vals)
        np.subtract.at(grad, dim + n, delta * vals)
    L /= n_adapt
    R1 = eta1 * float(((a - 1.0) ** 2).sum()) + eta2 * float((b ** 2).sum())
    grad[:dim] += 2.0 * eta1 * (a - 1.0)
    grad[dim:] += 2.0 * eta2 * b
    return R1 - L, grad


def adapt_user(docs, g_w, *, eta1=0.5, eta2=0.5, m=6, max_iter=100,
               gtol=1e-5):
    """Per-user batch L-BFGS (RegLR.train). Returns (a, b, fvalue)."""
    F1 = g_w.size
    A0 = np.concatenate([np.ones(F1), np.zeros(F1)])
    A, f, _it = lbfgs_minimize(
        lambda x: _user_value_grad(x, g_w, docs, eta1, eta2), A0, m=m,
        gtol=gtol, max_iter=max_iter)
    return A[:F1], A[F1:], f


def personalized_weights(a, b, g_w):
    """setPersonalizedModel: w^u = a∘w_g + b (identity group map)."""
    return a * g_w + b


def train_linadapt(vec_ds, g_w: np.ndarray, *, user_col: str = "user",
                   eta1: float = 0.5, eta2: float = 0.5,
                   num_partitions: int = 8):
    """Distributed LinAdapt over a vectors Dataset (doc_id, tids, vals,
    label, user): one broadcast of the global weights, a groupby(user)
    shuffle, and a fully-local per-user L-BFGS inside ``map_groups``.
    Returns a Dataset of (doc_id, pred) — each user's docs scored with their
    personalized model."""
    g_ref = ray.put(np.asarray(g_w, dtype=np.float64))

    def fit_group(group: pd.DataFrame) -> pd.DataFrame:
        gw = ray.get(g_ref)
        docs = []
        for r in group.itertuples():
            docs.append((np.asarray(list(r.tids), dtype=np.int64),
                         np.asarray(list(r.vals), dtype=np.float64),
                         int(r.label)))
        a, b, _f = adapt_user(docs, gw, eta1=eta1, eta2=eta2)
        pw = personalized_weights(a, b, gw)
        ids, preds = [], []
        for r, (tids, vals, _y) in zip(group.itertuples(), docs):
            f = pw[0] + float((pw[tids + 1] * vals).sum())
            ids.append(int(r.doc_id))
            preds.append(1 if 1.0 / (1.0 + np.exp(-f)) > 0.5 else 0)
        return pd.DataFrame({"doc_id": ids, "pred": preds})

    return vec_ds.groupby(user_col).map_groups(fit_group,
                                               batch_format="pandas")


def train_linadapt_transforms(vec_ds, g_w: np.ndarray, *,
                              user_col: str = "user",
                              eta1: float = 0.5, eta2: float = 0.5):
    """Same distributed per-user L-BFGS as :func:`train_linadapt` but emits
    each user's learned transform ``a‖b`` instead of per-doc predictions —
    the persistence surface (``state.models.save_user_transforms``).
    Returns a Dataset of (user, transform list<double>)."""
    g_ref = ray.put(np.asarray(g_w, dtype=np.float64))

    def fit_group(group: pd.DataFrame) -> pd.DataFrame:
        gw = ray.get(g_ref)
        docs = [(np.asarray(list(r.tids), dtype=np.int64),
                 np.asarray(list(r.vals), dtype=np.float64), int(r.label))
                for r in group.itertuples()]
        a, b, _f = adapt_user(docs, gw, eta1=eta1, eta2=eta2)
        return pd.DataFrame({
            "user": [group[user_col].iloc[0]],
            "transform": [np.concatenate([a, b]).tolist()],
        })

    return vec_ds.groupby(user_col).map_groups(fit_group,
                                               batch_format="pandas")


# ------------------------------------------------------------------ CoLinAdapt

def _bow_profile(docs, F1):
    """User BoW profile = L2-normalized sum of the user's doc vectors (the
    ST_BoW similarity basis, ``_AdaptStruct.getSimilarity``)."""
    prof = np.zeros(F1 - 1)
    for tids, vals, _y in docs:
        np.add.at(prof, tids, vals)
    n = np.linalg.norm(prof)
    return prof / n if n else prof


def build_neighbors(user_docs, F1, topk: int):
    """Directed top-K cosine neighbor lists per user (``topK<0`` = fully
    connected, like the reference). Returns {i: [(j, sim), ...]}."""
    users = list(user_docs)
    profs = np.stack([_bow_profile(user_docs[u], F1) for u in users])
    sims = profs @ profs.T
    np.fill_diagonal(sims, -np.inf)
    nbrs = {}
    for i in range(len(users)):
        order = np.argsort(-sims[i], kind="stable")
        take = order if topk < 0 else order[:topk]
        nbrs[i] = [(int(j), float(sims[i, j])) for j in take
                   if np.isfinite(sims[i, j])]
    return users, nbrs


@ray.remote
def _colin_block_fg(user_idx_block, docs_block, x, g_w, dim, eta1, eta2,
                    eta3, eta4, nbrs_block):
    """Per-block partial of the joint objective: each user's LinAdapt data +
    R1 term plus the R2 coupling over the user's OUT-edges (each directed
    edge contributes once to f; its gradient hits both endpoints, exactly
    ``gradientByR2``)."""
    f = 0.0
    g = np.zeros_like(x)
    for ui, docs, edges in zip(user_idx_block, docs_block, nbrs_block):
        off_i = 2 * dim * ui
        A = x[off_i: off_i + 2 * dim]
        fu, gu = _user_value_grad(A, g_w, docs, eta1, eta2)
        f += fu
        g[off_i: off_i + 2 * dim] += gu
        ai, bi = A[:dim], A[dim:]
        for j, w in edges:
            off_j = 2 * dim * j
            aj = x[off_j: off_j + dim]
            bj = x[off_j + dim: off_j + 2 * dim]
            da, db = ai - aj, bi - bj
            f += w * (eta3 * float(da @ da) + eta4 * float(db @ db))
            g[off_i: off_i + dim] += 2.0 * w * eta3 * da
            g[off_i + dim: off_i + 2 * dim] += 2.0 * w * eta4 * db
            g[off_j: off_j + dim] -= 2.0 * w * eta3 * da
            g[off_j + dim: off_j + 2 * dim] -= 2.0 * w * eta4 * db
    return f, g


def train_colinadapt(user_docs: dict, g_w: np.ndarray, *, topk: int = 2,
                     eta1: float = 0.5, eta2: float = 0.5, eta3: float = 0.5,
                     eta4: float = 0.5, n_blocks: int = 4,
                     max_iter: int = 100, gtol: float = 1e-4,
                     nbrs_override: dict | None = None):
    """CoLinAdapt (``modelAdaptation/CoLinAdapt/CoLinAdapt.java``): ONE joint
    L-BFGS (reference m=5 over the concatenated sharedA) over every user's
    (a, b), coupling top-K BoW-similar neighbors through the R2 graph
    penalty Σ_edges sim·(η3‖a_i−a_j‖² + η4‖b_i−b_j‖²) on top of each user's
    LinAdapt data/R1 terms.

    Execution shape: the objective is a sum over users (data+R1) and
    directed edges (R2), so each L-BFGS iteration broadcasts the parameter
    vector and sums per-user-block (f, g) partials in fixed block order —
    the same distributed-L-BFGS device as pipelines/linear.py.

    Returns dict: users (ordered), A (n_users × 2·dim), personalized
    (n_users × F1) weight matrix."""
    F1 = g_w.size
    dim = F1
    users, nbrs = build_neighbors(user_docs, F1, topk)
    if nbrs_override is not None:      # NeighborhoodLearning's re-weighted
        nbrs = nbrs_override           # edge list (same topology)
    n = len(users)
    idx = list(range(n))
    blocks = [idx[i::n_blocks] for i in range(min(n_blocks, n))]
    g_ref = ray.put(np.asarray(g_w, dtype=np.float64))
    docs_refs = [ray.put([user_docs[users[i]] for i in blk])
                 for blk in blocks]
    nbrs_blocks = [[nbrs[i] for i in blk] for blk in blocks]

    x0 = np.concatenate([np.concatenate([np.ones(dim), np.zeros(dim)])
                         for _ in range(n)])

    def value_grad(x):
        x_ref = ray.put(x)
        outs = ray.get([
            _colin_block_fg.remote(blk, dref, x_ref, g_ref, dim, eta1, eta2,
                                   eta3, eta4, nb)
            for blk, dref, nb in zip(blocks, docs_refs, nbrs_blocks)
        ])
        f = 0.0
        g = np.zeros_like(x)
        for fp, gp in outs:          # fixed order: deterministic float sum
            f += fp
            g = g + gp
        return f, g

    x, _f, _it = lbfgs_minimize(value_grad, x0, m=5, gtol=gtol,
                                max_iter=max_iter)
    A = x.reshape(n, 2 * dim)
    personalized = np.stack([personalized_weights(A[i, :dim], A[i, dim:],
                                                  np.asarray(g_w))
                             for i in range(n)])
    return {"users": users, "A": A, "personalized": personalized,
            "neighbors": nbrs}


# ------------------------------------------------------------------ MT-SVM

@ray.remote
def _mtsvm_block_fg(rows, x, F1, n_users, sqrt_u, C):
    """Squared-hinge data partial over one review block. Row = (tids, vals,
    y±1, user_idx); score = w_u·φ(x) + w_g·φ(x)/√u with per-block bias at
    position 0 (the reference appends bias last — layout-internal, same
    math)."""
    g_off = F1 * n_users
    f = 0.0
    g = np.zeros_like(x)
    for tids, vals, y, uix in rows:
        u_off = F1 * uix
        n = tids + 1
        s = x[u_off] + x[g_off] / sqrt_u + float(
            ((x[u_off + n] + x[g_off + n] / sqrt_u) * vals).sum())
        margin = 1.0 - y * s
        if margin > 0:
            f += C * margin * margin
            coef = -2.0 * C * margin * y
            g[u_off] += coef
            g[g_off] += coef / sqrt_u
            np.add.at(g, u_off + n, coef * vals)
            np.add.at(g, g_off + n, coef * vals / sqrt_u)
    return f, g


def train_mtsvm(user_docs: dict, *, n_features: int, u: float = 1.0,
                C: float = 1.0, n_blocks: int = 4, max_iter: int = 200,
                gtol: float = 1e-4):
    """MultiTaskSVM (``modelAdaptation/MultiTaskSVM.java``) — the
    feature-augmentation multi-task SVM (Evgeniou & Pontil's public
    construction, used verbatim by the reference): every review appears
    twice in the joint feature space, once in its user's block (value x)
    and once in the global block (value x/√u, ``createLibLinearFV``
    :147-187); ONE binary SVM over (F+1)(U+1) weights; personalized model
    w_u = w_global/√u + w_user (``setPersonalizedModel`` :118-143 —
    liblinear's first-label sign flip is unnecessary here because the
    primal trainer fixes label 1 → +1). liblinear's dual hinge solver is
    substituted by the repo's primal squared-hinge L-BFGS (same trade as
    R6 ``svm_classify``). Distribution: per-review-block (f, g) partials
    against the broadcast joint weight vector, summed in fixed order.

    ``user_docs``: {user: [(tids, vals, y01), ...]}. Returns dict with
    ordered users, per-user personalized (F+1) weights and the global
    component."""
    F1 = n_features + 1
    users = [u_ for u_ in user_docs if user_docs[u_]]   # valid users only
    uix = {u_: i for i, u_ in enumerate(users)}
    n_users = len(users)
    sqrt_u = float(np.sqrt(u))
    rows = []
    for u_, docs in user_docs.items():
        if not docs:
            continue
        for tids, vals, y in docs:
            rows.append((np.asarray(tids, dtype=np.int64),
                         np.asarray(vals, dtype=np.float64),
                         1.0 if y == 1 else -1.0, uix[u_]))
    blocks = [rows[i::n_blocks] for i in range(min(n_blocks, max(1, len(rows))))]
    refs = [ray.put(b) for b in blocks]
    dim = F1 * (n_users + 1)

    def value_grad(x):
        x_ref = ray.put(x)
        outs = ray.get([
            _mtsvm_block_fg.remote(r, x_ref, F1, n_users, sqrt_u, C)
            for r in refs
        ])
        f = 0.5 * float(x @ x)
        g = x.copy()
        for fp, gp in outs:
            f += fp
            g = g + gp
        return f, g

    x, _f, _it = lbfgs_minimize(value_grad, np.zeros(dim), gtol=gtol,
                                max_iter=max_iter)
    g_off = F1 * n_users
    w_global = x[g_off: g_off + F1] / sqrt_u
    personalized = {u_: w_global + x[F1 * i: F1 * (i + 1)]
                    for u_, i in uix.items()}
    return {"users": users, "personalized": personalized,
            "global": w_global}


# --------------------------------------------------------- RegLR family

def _reglr_value_grad(w, g_w, docs, eta1):
    """RegLR per-user objective (``RegLR.java``): −L̄ + η1‖w−w_g‖² with the
    reference's MAX_VALUE saturation guards; w is the user's own (F+1)
    weight vector (``logit`` :78-83 uses the personal weights directly)."""
    n_adapt = max(1, len(docs))
    L = 0.0
    grad = np.zeros_like(w)
    for tids, vals, y in docs:
        n = tids + 1
        f = w[0] + float((w[n] * vals).sum())
        p = 1.0 / (1.0 + np.exp(-f)) if f > -500 else 0.0
        if y == 1:
            L += np.log(p) if p > 0.0 else -MAX_VALUE
        else:
            L += np.log(1.0 - p) if p < 1.0 else -MAX_VALUE
        delta = (y - p) / n_adapt
        grad[0] -= delta
        np.subtract.at(grad, n, delta * vals)
    L /= n_adapt
    diff = w - g_w
    grad += 2.0 * eta1 * diff
    return eta1 * float(diff @ diff) - L, grad


def adapt_user_reglr(docs, g_w, *, eta1=0.5, m=6, max_iter=100, gtol=1e-5):
    """Per-user batch L-BFGS from the zero init (``_User.initModel``)."""
    w, f, _it = lbfgs_minimize(
        lambda x: _reglr_value_grad(x, g_w, docs, eta1),
        np.zeros_like(np.asarray(g_w, dtype=np.float64)), m=m, gtol=gtol,
        max_iter=max_iter)
    return w, f


def train_reglr(vec_ds, g_w: np.ndarray, *, user_col: str = "user",
                eta1: float = 0.5):
    """Distributed RegLR (``RegLR.java`` — global-model-regularized per-user
    LR, the modelAdaptation base class run as its own model):
    groupby(user).map_groups, one broadcast of the global weights. Returns
    (doc_id, pred) rows under each user's personal model."""
    g_ref = ray.put(np.asarray(g_w, dtype=np.float64))

    def fit_group(group: pd.DataFrame) -> pd.DataFrame:
        gw = ray.get(g_ref)
        docs = [(np.asarray(list(r.tids), dtype=np.int64),
                 np.asarray(list(r.vals), dtype=np.float64), int(r.label))
                for r in group.itertuples()]
        w, _f = adapt_user_reglr(docs, gw, eta1=eta1)
        ids, preds = [], []
        for r, (tids, vals, _y) in zip(group.itertuples(), docs):
            f = w[0] + float((w[tids + 1] * vals).sum())
            ids.append(int(r.doc_id))
            preds.append(1 if 1.0 / (1.0 + np.exp(-f)) > 0.5 else 0)
        return pd.DataFrame({"doc_id": ids, "pred": preds})

    return vec_ds.groupby(user_col).map_groups(fit_group,
                                               batch_format="pandas")


@ray.remote
def _coreglr_block_fg(user_idx_block, docs_block, x, g_w, F1, eta1, eta2,
                      nbrs_block):
    """CoRegLR (``RegLR/CoRegLR.java``): per-user RegLR terms + the η2
    neighbor coupling Σ sim·‖w_i−w_j‖² (coef 2·η2·sim on both endpoints)."""
    f = 0.0
    g = np.zeros_like(x)
    for ui, docs, edges in zip(user_idx_block, docs_block, nbrs_block):
        off_i = F1 * ui
        w_i = x[off_i: off_i + F1]
        fu, gu = _reglr_value_grad(w_i, g_w, docs, eta1)
        f += fu
        g[off_i: off_i + F1] += gu
        for j, sim in edges:
            off_j = F1 * j
            d = w_i - x[off_j: off_j + F1]
            f += eta2 * sim * float(d @ d)
            g[off_i: off_i + F1] += 2.0 * eta2 * sim * d
            g[off_j: off_j + F1] -= 2.0 * eta2 * sim * d
    return f, g


def train_coreglr(user_docs: dict, g_w: np.ndarray, *, topk: int = 2,
                  eta1: float = 0.5, eta2: float = 0.5, n_blocks: int = 4,
                  max_iter: int = 100, gtol: float = 1e-4):
    """Joint CoRegLR over all users' weight vectors (same distributed
    L-BFGS shape as CoLinAdapt; neighbors from the BoW top-K graph)."""
    F1 = g_w.size
    users, nbrs = build_neighbors(user_docs, F1, topk)
    n = len(users)
    idx = list(range(n))
    blocks = [idx[i::n_blocks] for i in range(min(n_blocks, n))]
    g_ref = ray.put(np.asarray(g_w, dtype=np.float64))
    docs_refs = [ray.put([user_docs[users[i]] for i in blk])
                 for blk in blocks]
    nbrs_blocks = [[nbrs[i] for i in blk] for blk in blocks]
    x0 = np.zeros(n * F1)

    def value_grad(x):
        x_ref = ray.put(x)
        outs = ray.get([
            _coreglr_block_fg.remote(blk, dref, x_ref, g_ref, F1, eta1,
                                     eta2, nb)
            for blk, dref, nb in zip(blocks, docs_refs, nbrs_blocks)
        ])
        f = 0.0
        g = np.zeros_like(x)
        for fp, gp in outs:
            f += fp
            g = g + gp
        return f, g

    x, _f, _it = lbfgs_minimize(value_grad, x0, m=5, gtol=gtol,
                                max_iter=max_iter)
    return {"users": users,
            "personalized": {u: x[F1 * i: F1 * (i + 1)]
                             for u, i in ((users[i], i) for i in idx)}}


@ray.remote
def _mtreglr_block_fg(rows, x, F1, n_users, sqrt_u, g_w, eta1):
    """MTRegLR (``RegLR/MTRegLR.java``): per-review data term under
    w_u + √u·w_g, plus the per-user η1‖w_u + √u·w_g − w_0‖² regularizer —
    the R1 is attached to the user's FIRST row in the block so each user
    contributes it exactly once."""
    g_off = F1 * n_users
    f = 0.0
    g = np.zeros_like(x)
    seen = set()
    # group rows by user for L-normalization and the once-per-user R1
    by_user: dict[int, list] = {}
    for tids, vals, y, uix in rows:
        by_user.setdefault(uix, []).append((tids, vals, y))
    for uix, docs in by_user.items():
        u_off = F1 * uix
        n_adapt = len(docs)
        L = 0.0
        for tids, vals, y in docs:
            n = tids + 1
            s = x[u_off] + sqrt_u * x[g_off] + float(
                ((x[u_off + n] + sqrt_u * x[g_off + n]) * vals).sum())
            p = 1.0 / (1.0 + np.exp(-s)) if s > -500 else 0.0
            if y == 1:
                L += np.log(p) if p > 0.0 else -MAX_VALUE
            else:
                L += np.log(1.0 - p) if p < 1.0 else -MAX_VALUE
            delta = (y - p) / n_adapt
            g[u_off] -= delta
            g[g_off] -= sqrt_u * delta
            np.subtract.at(g, u_off + n, delta * vals)
            np.subtract.at(g, g_off + n, delta * sqrt_u * vals)
        f -= L / n_adapt
        if uix not in seen:
            seen.add(uix)
            eff = x[u_off: u_off + F1] + sqrt_u * x[g_off: g_off + F1] - g_w
            f += eta1 * float(eff @ eff)
            g[u_off: u_off + F1] += 2.0 * eta1 * eff
            g[g_off: g_off + F1] += 2.0 * eta1 * sqrt_u * eff
    return f, g


def train_mtreglr(user_docs: dict, g_w: np.ndarray, *, u: float = 1.0,
                  eta1: float = 0.001, n_blocks: int = 4,
                  max_iter: int = 200, gtol: float = 1e-4):
    """MTRegLR: ONE joint L-BFGS over (U+1)(F+1) weights — every user is
    (w_u + √u·w_g), regularized toward the OLD global model w_0; the global
    block starts AT w_0 and user blocks at zero (``loadUsers`` :36-44).
    Users must stay whole within a block (the per-user L̄ normalization and
    once-per-user R1), so blocks partition USERS."""
    F1 = g_w.size
    users = [u_ for u_ in user_docs if user_docs[u_]]
    uix = {u_: i for i, u_ in enumerate(users)}
    n_users = len(users)
    sqrt_u = float(np.sqrt(u))
    rows_by_block: list[list] = [[] for _ in range(min(n_blocks,
                                                       max(1, n_users)))]
    for u_, docs in user_docs.items():
        if not docs:
            continue
        blk = uix[u_] % len(rows_by_block)
        for tids, vals, y in docs:
            rows_by_block[blk].append((np.asarray(tids, dtype=np.int64),
                                       np.asarray(vals, dtype=np.float64),
                                       1 if y == 1 else 0, uix[u_]))
    refs = [ray.put(b) for b in rows_by_block]
    g_w = np.asarray(g_w, dtype=np.float64)
    x0 = np.zeros(F1 * (n_users + 1))
    x0[F1 * n_users:] = g_w                      # global block starts at w_0

    def value_grad(x):
        x_ref = ray.put(x)
        outs = ray.get([
            _mtreglr_block_fg.remote(r, x_ref, F1, n_users, sqrt_u, g_w,
                                     eta1)
            for r in refs
        ])
        f = 0.0
        g = np.zeros_like(x)
        for fp, gp in outs:
            f += fp
            g = g + gp
        return f, g

    x, _f, _it = lbfgs_minimize(value_grad, x0, m=6, gtol=gtol,
                                max_iter=max_iter)
    g_block = x[F1 * n_users:]
    personalized = {u_: x[F1 * i: F1 * (i + 1)] + sqrt_u * g_block
                    for u_, i in uix.items()}
    return {"users": users, "personalized": personalized,
            "global": sqrt_u * g_block}


# -------------------------------------------- WeightedAvgAdapt / asyncRegLR

def _avg_theta(nbrs):
    """WeightedAvgTransAdapt's neighborhood normalization (:44-66):
    θ_ii = 1/(1+Σsim), θ_ij = sim_ij/(1+Σsim) (selfSim = 1)."""
    out = {}
    for i, edges in nbrs.items():
        ssum = 1.0 + sum(s for _j, s in edges)
        out[i] = (1.0 / ssum, [(j, s / ssum) for j, s in edges])
    return out


@ray.remote
def _wavg_block_fg(user_idx_block, docs_block, x, g_w, F1, eta1,
                   theta_block):
    """WeightedAvgAdapt (``CoLinAdapt/WeightedAvgAdapt.java``) block
    partial: per user, logit under the θ-weighted average of self+neighbor
    FULL weight vectors (:46-58), R1 = η1‖w_i−w_g‖² (:60-69), gradient
    scattering θ_ii to the user and θ_ij to each neighbor (:71-97)."""
    f = 0.0
    g = np.zeros_like(x)
    for ui, docs, (self_th, edges) in zip(user_idx_block, docs_block,
                                          theta_block):
        off_i = F1 * ui
        n_adapt = max(1, len(docs))
        for tids, vals, y in docs:
            n = tids + 1
            s = self_th * (x[off_i] + float((x[off_i + n] * vals).sum()))
            for j, th in edges:
                off_j = F1 * j
                s += th * (x[off_j] + float((x[off_j + n] * vals).sum()))
            p = 1.0 / (1.0 + np.exp(-s)) if s > -500 else 0.0
            if y == 1:
                f -= (np.log(p) if p > 0.0 else -MAX_VALUE) / n_adapt
            else:
                f -= (np.log(1.0 - p) if p < 1.0 else -MAX_VALUE) / n_adapt
            delta = (y - p) / n_adapt
            g[off_i] -= delta * self_th
            np.subtract.at(g, off_i + n, delta * self_th * vals)
            for j, th in edges:
                off_j = F1 * j
                g[off_j] -= delta * th
                np.subtract.at(g, off_j + n, delta * th * vals)
        d = x[off_i: off_i + F1] - g_w
        f += eta1 * float(d @ d)
        g[off_i: off_i + F1] += 2.0 * eta1 * d
    return f, g


def train_weighted_avg_adapt(user_docs: dict, g_w: np.ndarray, *,
                             topk: int = 2, eta1: float = 0.5,
                             n_blocks: int = 4, max_iter: int = 100,
                             gtol: float = 1e-4):
    """WeightedAvgAdapt: every user owns a FULL weight vector (init = the
    global model, ``constructUserList`` :25-43), decisions use the
    normalized similarity-weighted average over self + top-K neighbors, and
    ONE joint L-BFGS fits all vectors (the same distributed per-user-block
    partial shape as CoLinAdapt)."""
    F1 = g_w.size
    users, nbrs = build_neighbors(user_docs, F1, topk)
    theta = _avg_theta(nbrs)
    n = len(users)
    idx = list(range(n))
    blocks = [idx[i::n_blocks] for i in range(min(n_blocks, n))]
    g_ref = ray.put(np.asarray(g_w, dtype=np.float64))
    docs_refs = [ray.put([user_docs[users[i]] for i in blk])
                 for blk in blocks]
    theta_blocks = [[theta[i] for i in blk] for blk in blocks]
    x0 = np.tile(np.asarray(g_w, dtype=np.float64), n)

    def value_grad(x):
        x_ref = ray.put(x)
        outs = ray.get([
            _wavg_block_fg.remote(blk, dref, x_ref, g_ref, F1, eta1, tb)
            for blk, dref, tb in zip(blocks, docs_refs, theta_blocks)
        ])
        f = 0.0
        g = np.zeros_like(x)
        for fp, gp in outs:
            f += fp
            g = g + gp
        return f, g

    x, _f, _it = lbfgs_minimize(value_grad, x0, m=5, gtol=gtol,
                                max_iter=max_iter)
    # personalized decision weights = the θ-weighted average
    personalized = {}
    for i, u in enumerate(users):
        self_th, edges = theta[i]
        pw = self_th * x[F1 * i: F1 * (i + 1)]
        for j, th in edges:
            pw = pw + th * x[F1 * j: F1 * (j + 1)]
        personalized[u] = pw
    return {"users": users, "personalized": personalized,
            "weights": {u: x[F1 * i: F1 * (i + 1)]
                        for i, u in enumerate(users)}}


def adapt_user_async_reglr(docs, g_w, *, eta1: float = 0.5,
                           init_step: float = 0.5, seed: int = 61):
    """asyncRegLR (``RegLR/asyncRegLR.java``): ONLINE per-review gradient
    descent — step = (0.5+0.5·U)·η0/(2+updateCount) (the reference's
    Math.random made deterministic with a seeded stream), gradient = one
    review's data term (L-normalized like the batch path) + the full R1
    pull toward the global model per step."""
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))
    w = np.zeros_like(np.asarray(g_w, dtype=np.float64))
    n_adapt = max(1, len(docs))
    for count, (tids, vals, y) in enumerate(docs):
        n = tids + 1
        fscore = w[0] + float((w[n] * vals).sum())
        p = 1.0 / (1.0 + np.exp(-fscore)) if fscore > -500 else 0.0
        delta = (y - p) / n_adapt
        grad = 2.0 * eta1 * (w - g_w)
        grad[0] -= delta
        np.subtract.at(grad, n, delta * vals)
        step = (0.5 + 0.5 * rng.random()) * init_step / (2.0 + count)
        w -= step * grad
    return w


def train_async_reglr(vec_ds, g_w: np.ndarray, *, user_col: str = "user",
                      eta1: float = 0.5, seed: int = 61):
    """Distributed asyncRegLR: per-user online pass inside
    groupby(user).map_groups (users independent, one global broadcast)."""
    g_ref = ray.put(np.asarray(g_w, dtype=np.float64))

    def fit_group(group: pd.DataFrame) -> pd.DataFrame:
        gw = ray.get(g_ref)
        group = group.sort_values("doc_id")
        docs = [(np.asarray(list(r.tids), dtype=np.int64),
                 np.asarray(list(r.vals), dtype=np.float64), int(r.label))
                for r in group.itertuples()]
        # per-user seed from the user key: deterministic and order-free
        # (stable md5-derived hash — Python's hash() is per-process salted)
        import hashlib as _hl

        u_key = str(group[user_col].iloc[0]).encode()
        u_seed = seed + int(_hl.md5(u_key).hexdigest()[:8], 16)
        w = adapt_user_async_reglr(docs, gw, eta1=eta1, seed=u_seed)
        ids, preds = [], []
        for r, (tids, vals, _y) in zip(group.itertuples(), docs):
            fscore = w[0] + float((w[tids + 1] * vals).sum())
            ids.append(int(r.doc_id))
            preds.append(1 if 1.0 / (1.0 + np.exp(-fscore)) > 0.5 else 0)
        return pd.DataFrame({"doc_id": ids, "pred": preds})

    return vec_ds.groupby(user_col).map_groups(fit_group,
                                               batch_format="pandas")


# ------------------------------------------------------------------ MTLinAdapt

def train_mtlinadapt(user_docs: dict, g_w: np.ndarray, *, eta1: float = 0.5,
                     eta2: float = 0.5, eta3: float = 0.5, eta4: float = 0.1,
                     n_blocks: int = 4, max_iter: int = 150,
                     gtol: float = 1e-4, l_norm: bool = False):
    """MTLinAdapt (``modelAdaptation/CoLinAdapt/MTLinAdapt.java``): every
    user's LinAdapt transform applies over a JOINTLY-LEARNED super model
    w_s = a_s∘w_g + b_s (``getSupWeights``/``logit`` :112-121), one joint
    L-BFGS over (U+1)·2(F+1) parameters — per-user R1 = η1(a−1)²+η2b²
    (:126-139) and the super R1 = η3(a_s−1)²+η4b_s² (``calculateRs``
    :149-158); gradients flow into both blocks per review
    (``gradientByFunc`` :170-199, the identical math transcribed in
    ``dpadapt._dp_block_fg``'s "mtclin" branch, which this trainer reuses
    with users playing the cluster role — each user is its own block).
    ``l_norm`` False per the shipped main's setLNormFlag(false)."""
    from ir_base_ray.pipelines.dpadapt import _dp_block_fg

    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    pdim = 2 * F1
    users = [u for u in user_docs if user_docs[u]]
    n = len(users)
    entries_all = [([(np.asarray(t, dtype=np.int64),
                      np.asarray(v, dtype=np.float64), int(y))
                     for t, v, y in user_docs[u]], i)
                   for i, u in enumerate(users)]
    blocks = [entries_all[i::n_blocks] for i in range(min(n_blocks, n))]
    refs = [ray.put(b) for b in blocks]
    unit = np.concatenate([np.ones(F1), np.zeros(F1)])
    x0 = np.tile(unit, n + 1)             # users' transforms + super at end

    def value_grad(x):
        f = 0.0
        g = np.zeros_like(x)
        for i in range(n):                # per-user R1
            off = pdim * i
            da = x[off: off + F1] - 1.0
            db = x[off + F1: off + 2 * F1]
            f += eta1 * float(da @ da) + eta2 * float(db @ db)
            g[off: off + F1] += 2.0 * eta1 * da
            g[off + F1: off + 2 * F1] += 2.0 * eta2 * db
        off = pdim * n                    # super R1 (calculateRs)
        da = x[off: off + F1] - 1.0
        db = x[off + F1: off + 2 * F1]
        f += eta3 * float(da @ da) + eta4 * float(db @ db)
        g[off: off + F1] += 2.0 * eta3 * da
        g[off + F1: off + 2 * F1] += 2.0 * eta4 * db
        x_ref = ray.put(x)
        outs = ray.get([
            _dp_block_fg.remote(r, x_ref, g_w, pdim, "mtclin", n, l_norm)
            for r in refs
        ])
        for fp, gp in outs:
            f += fp
            g = g + gp
        return f, g

    x, _f, _it = lbfgs_minimize(value_grad, x0, m=6, gtol=gtol,
                                max_iter=max_iter)
    sup = x[pdim * n:]
    w_s = sup[:F1] * g_w + sup[F1:]
    personalized = {}
    for i, u in enumerate(users):
        A = x[pdim * i: pdim * (i + 1)]
        personalized[u] = A[:F1] * w_s + A[F1:]
    return {"users": users, "personalized": personalized,
            "super_weights": w_s, "super_transform": sup.copy()}


# ------------------------------------------------------- MT-SVM with clusters

@ray.remote
def _mtsvm_cluster_block_fg(rows, x, F1, n_users, n_clusters, mi, mc, mu, C,
                            cluster_of_user):
    """MultiTaskSVMWithClusters (``MultiTaskSVMWithClusters.java``) data
    partial: three-block augmentation — user block at x·m_i, cluster block
    at x/m_c, global block at x/m_u (``createLibLinearFV`` :47-94, incl.
    the coefficient-zero guards). Row = (tids, vals, y±1, user_idx)."""
    c_base = F1 * n_users
    g_off = F1 * (n_users + n_clusters)
    ci = 0.0 if mi == 0 else mi          # user part MULTIPLIES
    cc = 0.0 if mc == 0 else 1.0 / mc    # cluster part divides
    cg = 0.0 if mu == 0 else 1.0 / mu    # global part divides
    f = 0.0
    g = np.zeros_like(x)
    for tids, vals, y, uix in rows:
        u_off = F1 * uix
        cl_off = c_base + F1 * cluster_of_user[uix]
        n = tids + 1
        s = ci * x[u_off] + cc * x[cl_off] + cg * x[g_off] + float(
            ((ci * x[u_off + n] + cc * x[cl_off + n] + cg * x[g_off + n])
             * vals).sum())
        margin = 1.0 - y * s
        if margin > 0:
            f += C * margin * margin
            coef = -2.0 * C * margin * y
            g[u_off] += coef * ci
            g[cl_off] += coef * cc
            g[g_off] += coef * cg
            np.add.at(g, u_off + n, coef * ci * vals)
            np.add.at(g, cl_off + n, coef * cc * vals)
            np.add.at(g, g_off + n, coef * cg * vals)
    return f, g


def train_mtsvm_clusters(user_docs: dict, cluster_of: dict, *,
                         n_features: int, n_clusters: int, mi: float = 1.0,
                         mc: float = 1.0, mu: float = 1.0, C: float = 1.0,
                         n_blocks: int = 4, max_iter: int = 200,
                         gtol: float = 1e-4):
    """Three-level MT-SVM: joint squared-hinge primal over
    (F+1)(U + #clusters + 1) weights. The reference's personalized model
    MULTIPLIES the coefficients (``setPersonalizedModel`` :95-125:
    m_u·w_g + m_c·w_c + m_i·w_u) while training DIVIDES for the cluster and
    global parts — an inconsistency quirk that cancels only at unit
    coefficients; both formulas are transcribed exactly and the mismatch is
    pinned by test."""
    F1 = n_features + 1
    users = [u for u in user_docs if user_docs[u]]
    uix = {u: i for i, u in enumerate(users)}
    n_users = len(users)
    cluster_arr = [int(cluster_of[u]) for u in users]
    rows = []
    for u, docs in user_docs.items():
        if not docs:
            continue
        for tids, vals, y in docs:
            rows.append((np.asarray(tids, dtype=np.int64),
                         np.asarray(vals, dtype=np.float64),
                         1.0 if y == 1 else -1.0, uix[u]))
    blocks = [rows[i::n_blocks]
              for i in range(min(n_blocks, max(1, len(rows))))]
    refs = [ray.put(b) for b in blocks]
    dim = F1 * (n_users + n_clusters + 1)

    def value_grad(x):
        x_ref = ray.put(x)
        outs = ray.get([
            _mtsvm_cluster_block_fg.remote(r, x_ref, F1, n_users, n_clusters,
                                           mi, mc, mu, C, cluster_arr)
            for r in refs
        ])
        f = 0.5 * float(x @ x)
        g = x.copy()
        for fp, gp in outs:
            f += fp
            g = g + gp
        return f, g

    x, _f, _it = lbfgs_minimize(value_grad, np.zeros(dim), gtol=gtol,
                                max_iter=max_iter)
    g_off = F1 * (n_users + n_clusters)
    w_g = x[g_off: g_off + F1]
    personalized = {}
    for u, i in uix.items():
        w_u = x[F1 * i: F1 * (i + 1)]
        cl = cluster_arr[i]
        w_c = x[F1 * (n_users + cl): F1 * (n_users + cl + 1)]
        personalized[u] = mu * w_g + mc * w_c + mi * w_u   # predict formula
    return {"users": users, "personalized": personalized,
            "global": w_g, "cluster_weights": [
                x[F1 * (n_users + c): F1 * (n_users + c + 1)]
                for c in range(n_clusters)]}


def cluster_users_kmeans(user_docs: dict, F1: int, k: int = 2,
                         n_iters: int = 20, seed: int = 3) -> dict:
    """Deterministic k-means over the users' L2-normalized BoW profiles —
    the external clustering the reference's mains feed into
    MultiTaskSVMWithClusters / L2RWithQueryClustering."""
    users = list(user_docs)
    profs = np.stack([_bow_profile(user_docs[u], F1) for u in users])
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))
    centers = profs[rng.choice(len(users), size=min(k, len(users)),
                               replace=False)]
    assign = np.zeros(len(users), dtype=np.int64)
    for _ in range(n_iters):
        d = ((profs[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        new_assign = d.argmin(axis=1)
        if (new_assign == assign).all():
            break
        assign = new_assign
        for c in range(centers.shape[0]):
            m = assign == c
            if m.any():
                centers[c] = profs[m].mean(axis=0)
    return {u: int(a) for u, a in zip(users, assign)}


def adapt_user_async_linadapt(docs, g_w, *, eta1: float = 0.5,
                              eta2: float = 0.5, init_step: float = 0.5,
                              seed: int = 67):
    """asyncLinAdapt (``CoLinAdapt/asyncLinAdapt.java``): ONLINE LinAdapt —
    as each review arrives, one gradient-descent step on the LinAdapt
    objective over the reviews seen so far (``calculateGradients(user)``
    iterates the user's revealed adaptation set) with asyncRegLR's decaying
    step (0.5+0.5·U)·η0/(2+t), seeded. Returns (a, b)."""
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))
    F1 = np.asarray(g_w).size
    A = np.concatenate([np.ones(F1), np.zeros(F1)])
    for count in range(len(docs)):
        _f, grad = _user_value_grad(A, g_w, docs[: count + 1], eta1, eta2)
        step = (0.5 + 0.5 * rng.random()) * init_step / (2.0 + count)
        A -= step * grad
    return A[:F1], A[F1:]


def train_async_colinadapt(user_docs: dict, g_w: np.ndarray, *,
                           topk: int = 2, eta1: float = 0.5,
                           eta2: float = 0.5, eta3: float = 0.5,
                           eta4: float = 0.5, init_step: float = 0.5,
                           seed: int = 71, reglr: bool = False,
                           first_order: bool = False,
                           nbr_history_weight: float = 0.0):
    """asyncCoLinAdapt / asyncCoRegLR
    (``CoLinAdapt/asyncCoLinAdapt.java``, ``RegLR/asyncCoRegLR.java``):
    ONLINE co-adaptation — reviews arrive round-robin across users; each
    arrival takes one decaying gradient step on the arriving user's block
    only: their data term over the newly arrived review (the adaptation
    cache, ``getAdaptationCacheSize``), their R1, and the R2 coupling
    against BOTH forward and REVERSE neighbors with the neighbor held
    constant (``gradientByR2(ui, uj, sim)`` :56-69 — the one-sided update
    that distinguishes the async variant from batch CoLinAdapt's symmetric
    gradient). ``reglr=True`` runs the asyncCoRegLR flavor (full weight
    vectors, R1 toward the global model). Step follows asyncRegLR's seeded
    (0.5+0.5·U)·η0/(2+count). Returns per-user personalized weights.

    ``first_order=True`` runs the FirstOrder subclasses
    (``asyncCoLinAdaptFirstOrder.java`` / ``asyncCoRegLRFirstOrder.java``):
    the R2 coupling becomes SYMMETRIC (gradient into both endpoints,
    :57-73), every forward+reverse neighbor also receives its own R1
    gradient (``gradientByRelatedR1`` :76-89) plus — when
    ``nbr_history_weight``>0 — a replay of its cached (most recently
    arrived) review's data gradient at that weight
    (``cachedGradientByNeighorsFunc`` :40-54), and the arrival updates the
    current user at inc=1 and each neighbor at its OWN decaying step with
    inc=1/3 (``gradientDescent`` :91-107) — fractional per-user update
    counts."""
    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    users, nbrs = build_neighbors(user_docs, F1, topk)
    n = len(users)
    reverse: dict[int, list] = {i: [] for i in range(n)}
    for i, edges in nbrs.items():
        for j, sim in edges:
            reverse[j].append((i, sim))
    pdim = F1 if reglr else 2 * F1
    if reglr:
        A = [np.zeros(F1) for _ in range(n)]
    else:
        A = [np.concatenate([np.ones(F1), np.zeros(F1)]) for _ in range(n)]
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))
    counts = [0.0] * n

    def _data_grad(j, cache, weight):
        """gradientByFunc for user j's block only (no R1)."""
        g = np.zeros(pdim)
        for tids, vals, y in cache:
            nn = np.asarray(tids, dtype=np.int64) + 1
            vv = np.asarray(vals, dtype=np.float64)
            if reglr:
                w = A[j]
                s = w[0] + float((w[nn] * vv).sum())
            else:
                a, b = A[j][:F1], A[j][F1:]
                s = a[0] * g_w[0] + b[0] + float(
                    ((a[nn] * g_w[nn] + b[nn]) * vv).sum())
            pr = 1.0 / (1.0 + np.exp(-s)) if s > -500 else 0.0
            delta = weight * (int(y) - pr)
            if reglr:
                g[0] -= delta
                np.subtract.at(g, nn, delta * vv)
            else:
                g[0] -= delta * g_w[0]
                g[F1] -= delta
                np.subtract.at(g, nn, delta * g_w[nn] * vv)
                np.subtract.at(g, F1 + nn, delta * vv)
        return g

    def _r1_grad(j):
        if reglr:
            return 2.0 * eta1 * (A[j] - g_w)
        g = np.empty(pdim)
        g[:F1] = 2.0 * eta1 * (A[j][:F1] - 1.0)
        g[F1:] = 2.0 * eta2 * A[j][F1:]
        return g

    max_docs = max(len(user_docs[u]) for u in users)
    for r_idx in range(max_docs):           # round-robin arrivals
        for i, u in enumerate(users):
            docs = user_docs[u]
            if r_idx >= len(docs):
                continue
            cache = [docs[r_idx]]
            nbr_grads: dict[int, np.ndarray] = {}
            if reglr:
                _f, grad = _reglr_value_grad(A[i], g_w, cache, eta1)
            else:
                _f, grad = _user_value_grad(A[i], g_w, cache, eta1, eta2)
                ai, bi = A[i][:F1], A[i][F1:]
                for j, sim in nbrs[i] + reverse[i]:
                    aj = A[j][:F1]
                    bj = A[j][F1:]
                    da = 2.0 * sim * eta3 * (ai - aj)
                    db = 2.0 * sim * eta4 * (bi - bj)
                    grad[:F1] += da
                    grad[F1:] += db
                    if first_order:       # symmetric R2 (:57-73)
                        gj = nbr_grads.setdefault(j, np.zeros(pdim))
                        gj[:F1] -= da
                        gj[F1:] -= db
            if reglr:
                for j, sim in nbrs[i] + reverse[i]:
                    d = 2.0 * sim * eta3 * (A[i] - A[j])
                    grad += d
                    if first_order:
                        nbr_grads.setdefault(j, np.zeros(pdim))
                        nbr_grads[j] -= d
            if first_order:
                for j, _sim in nbrs[i] + reverse[i]:
                    gj = nbr_grads.setdefault(j, np.zeros(pdim))
                    gj += _r1_grad(j)      # gradientByRelatedR1 (:76-89)
                    if nbr_history_weight > 0:
                        dj = user_docs[users[j]]
                        seen = min(r_idx, len(dj) - 1)
                        if seen >= 0:      # replay the neighbor's cache
                            gj += _data_grad(j, [dj[seen]],
                                             nbr_history_weight)
            step = (0.5 + 0.5 * rng.random()) * init_step / (2.0 + counts[i])
            A[i] = A[i] - step * grad
            counts[i] += 1.0
            if first_order:                # neighbor updates at inc=1/3
                for j, _sim in nbrs[i] + reverse[i]:
                    stp = ((0.5 + 0.5 * rng.random()) * init_step
                           / (2.0 + counts[j]))
                    A[j] = A[j] - stp * nbr_grads[j]
                    counts[j] += 1.0 / 3.0
    personalized = {}
    for i, u in enumerate(users):
        if reglr:
            personalized[u] = A[i].copy()
        else:
            personalized[u] = personalized_weights(A[i][:F1], A[i][F1:], g_w)
    return {"users": users, "personalized": personalized}


# ---------------------------------------------------- CLinAdaptWithKmeans

@ray.remote
def _clin_kmeans_block_fg(rows, x, g_w, F1, n_users, n_clusters, mi, mc, mu,
                          eta1, eta2, cluster_of_user, l_norm):
    """CLinAdaptWithKmeans (``DirichletProcess/CLinAdaptWithKmeans.java``)
    data+R1 partial: effective transform = m_u·(a_g,b_g) + m_c·(a_c,b_c) +
    m_i·(a_u,b_u) (``logit`` :78-94); the review gradient scatters into all
    three blocks with the matching coefficients (:121-163); per-user R1 =
    η1(a_u−1)²+η2b_u² (:166-175). Row = (tids, vals, y01, user_idx,
    n_adapt)."""
    pdim = 2 * F1
    c_base = pdim * n_users
    g_off = pdim * (n_users + n_clusters)
    f = 0.0
    g = np.zeros_like(x)
    for tids, vals, y, uixv, n_adapt in rows:
        u_off = pdim * uixv
        cl_off = c_base + pdim * cluster_of_user[uixv]
        n = tids + 1
        a_eff0 = (mu * x[g_off] + mc * x[cl_off] + mi * x[u_off])
        b_eff0 = (mu * x[g_off + F1] + mc * x[cl_off + F1]
                  + mi * x[u_off + F1])
        a_eff = (mu * x[g_off + n] + mc * x[cl_off + n] + mi * x[u_off + n])
        b_eff = (mu * x[g_off + F1 + n] + mc * x[cl_off + F1 + n]
                 + mi * x[u_off + F1 + n])
        s = a_eff0 * g_w[0] + b_eff0 + float(
            ((a_eff * g_w[n] + b_eff) * vals).sum())
        p = 1.0 / (1.0 + np.exp(-s)) if s > -500 else 0.0
        nrm = n_adapt if l_norm else 1
        if y == 1:
            f -= (np.log(p) if p > 0.0 else -MAX_VALUE) / nrm
        else:
            f -= (np.log(1.0 - p) if p < 1.0 else -MAX_VALUE) / nrm
        delta = (y - p) / nrm
        for off, co in ((u_off, mi), (cl_off, mc), (g_off, mu)):
            g[off] -= delta * co * g_w[0]
            g[off + F1] -= delta * co
            np.subtract.at(g, off + n, delta * co * g_w[n] * vals)
            np.subtract.at(g, off + F1 + n, delta * co * vals)
    return f, g


def train_clinadapt_kmeans(user_docs: dict, cluster_of: dict,
                           g_w: np.ndarray, *, n_clusters: int,
                           mi: float = 1.0, mc: float = 1.0,
                           mu: float = 1.0, eta1: float = 0.5,
                           eta2: float = 0.5, eta3: float = 0.1,
                           eta4: float = 0.1, n_blocks: int = 4,
                           max_iter: int = 150, gtol: float = 1e-4,
                           l_norm: bool = True):
    """Joint batch L-BFGS over (U + #clusters + 1)·2(F+1) transform
    parameters (``train`` :197-246): per-user R1 (η1/η2) + the cluster and
    global blocks' η3/η4 regularization (``calculateRcRg`` :100-118);
    all transform blocks initialized at the identity (a=1, b=0,
    ``constructUserList``). Distributed per-review-block partials."""
    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    pdim = 2 * F1
    users = [u for u in user_docs if user_docs[u]]
    uix = {u: i for i, u in enumerate(users)}
    n_users = len(users)
    cluster_arr = [int(cluster_of[u]) for u in users]
    rows = []
    for u, docs in user_docs.items():
        if not docs:
            continue
        for tids, vals, y in docs:
            rows.append((np.asarray(tids, dtype=np.int64),
                         np.asarray(vals, dtype=np.float64), int(y),
                         uix[u], len(docs)))
    blocks = [rows[i::n_blocks]
              for i in range(min(n_blocks, max(1, len(rows))))]
    refs = [ray.put(b) for b in blocks]
    unit = np.concatenate([np.ones(F1), np.zeros(F1)])
    x0 = np.tile(unit, n_users + n_clusters + 1)

    def value_grad(x):
        f = 0.0
        g = np.zeros_like(x)
        for i in range(n_users):              # per-user R1
            off = pdim * i
            da = x[off: off + F1] - 1.0
            db = x[off + F1: off + 2 * F1]
            f += eta1 * float(da @ da) + eta2 * float(db @ db)
            g[off: off + F1] += 2.0 * eta1 * da
            g[off + F1: off + 2 * F1] += 2.0 * eta2 * db
        for c in range(n_clusters + 1):       # cluster + global (RcRg)
            off = pdim * (n_users + c)
            da = x[off: off + F1] - 1.0
            db = x[off + F1: off + 2 * F1]
            f += eta3 * float(da @ da) + eta4 * float(db @ db)
            g[off: off + F1] += 2.0 * eta3 * da
            g[off + F1: off + 2 * F1] += 2.0 * eta4 * db
        x_ref = ray.put(x)
        outs = ray.get([
            _clin_kmeans_block_fg.remote(r, x_ref, g_w, F1, n_users,
                                         n_clusters, mi, mc, mu, eta1, eta2,
                                         cluster_arr, l_norm)
            for r in refs
        ])
        for fp, gp in outs:
            f += fp
            g = g + gp
        return f, g

    x, _f, _it = lbfgs_minimize(value_grad, x0, m=6, gtol=gtol,
                                max_iter=max_iter)
    g_off = pdim * (n_users + n_clusters)
    personalized = {}
    for u, i in uix.items():
        cl_off = pdim * (n_users + cluster_arr[i])
        u_off = pdim * i
        a = (mu * x[g_off: g_off + F1] + mc * x[cl_off: cl_off + F1]
             + mi * x[u_off: u_off + F1])
        b = (mu * x[g_off + F1: g_off + 2 * F1]
             + mc * x[cl_off + F1: cl_off + 2 * F1]
             + mi * x[u_off + F1: u_off + 2 * F1])
        personalized[u] = a * g_w + b
    return {"users": users, "personalized": personalized}


@ray.remote
def _wavgtrans_block_fg(user_idx_block, docs_block, x, g_w, F1, eta1, eta2,
                        theta_block, all_nbrs):
    """WeightedAvgTransAdapt (``CoLinAdapt/WeightedAvgTransAdapt.java``):
    per-user LinAdapt TRANSFORMS whose decision averages the θ-weighted
    linear functions of self + neighbors (``logit`` :69-81); per-user R1 =
    η1(a−1)²+η2b² (:83-96); the review gradient scatters δ·θ_p into every
    participant's transform block (:105-140). NOTE the reference's
    self-gradient indexes at ``m_dim*id`` where blocks are ``2*m_dim`` wide
    (:112 vs the neighbor part's ``2*m_dim*index``) — a genuine indexing
    bug that writes half the users' gradients into other users' parameter
    blocks; implemented here with the evident-intent offset (2·dim·id),
    documented as the same fix class as the repo's other dead/broken-path
    substitutions."""
    pdim = 2 * F1
    f = 0.0
    g = np.zeros_like(x)
    for ui, docs, (self_th, edges) in zip(user_idx_block, docs_block,
                                          theta_block):
        off_i = pdim * ui
        n_adapt = max(1, len(docs))
        parts = [(ui, self_th)] + list(edges)
        for tids, vals, y in docs:
            n = tids + 1
            s = 0.0
            for j, th in parts:
                off_j = pdim * j
                s += th * (x[off_j] * g_w[0] + x[off_j + F1] + float(
                    ((x[off_j + n] * g_w[n] + x[off_j + F1 + n])
                     * vals).sum()))
            p = 1.0 / (1.0 + np.exp(-s)) if s > -500 else 0.0
            if y == 1:
                f -= (np.log(p) if p > 0.0 else -MAX_VALUE) / n_adapt
            else:
                f -= (np.log(1.0 - p) if p < 1.0 else -MAX_VALUE) / n_adapt
            delta = (y - p) / n_adapt
            for j, th in parts:
                off_j = pdim * j
                g[off_j] -= delta * th * g_w[0]
                g[off_j + F1] -= delta * th
                np.subtract.at(g, off_j + n, delta * th * g_w[n] * vals)
                np.subtract.at(g, off_j + F1 + n, delta * th * vals)
        da = x[off_i: off_i + F1] - 1.0
        db = x[off_i + F1: off_i + 2 * F1]
        f += eta1 * float(da @ da) + eta2 * float(db @ db)
        g[off_i: off_i + F1] += 2.0 * eta1 * da
        g[off_i + F1: off_i + 2 * F1] += 2.0 * eta2 * db
    return f, g


def train_weighted_avg_trans_adapt(user_docs: dict, g_w: np.ndarray, *,
                                   topk: int = 2, eta1: float = 0.5,
                                   eta2: float = 0.5, n_blocks: int = 4,
                                   max_iter: int = 100, gtol: float = 1e-4):
    """Joint L-BFGS over all users' transforms under the θ-averaged
    decision (normalized similarities, selfSim = 1). Personalized decision
    weights = the θ-average of the personalized models."""
    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    users, nbrs = build_neighbors(user_docs, F1, topk)
    theta = _avg_theta(nbrs)
    n = len(users)
    idx = list(range(n))
    blocks = [idx[i::n_blocks] for i in range(min(n_blocks, n))]
    docs_refs = [ray.put([user_docs[users[i]] for i in blk])
                 for blk in blocks]
    theta_blocks = [[theta[i] for i in blk] for blk in blocks]
    x0 = np.tile(np.concatenate([np.ones(F1), np.zeros(F1)]), n)

    def value_grad(x):
        x_ref = ray.put(x)
        outs = ray.get([
            _wavgtrans_block_fg.remote(blk, dref, x_ref, g_w, F1, eta1,
                                       eta2, tb, None)
            for blk, dref, tb in zip(blocks, docs_refs, theta_blocks)
        ])
        f = 0.0
        g = np.zeros_like(x)
        for fp, gp in outs:
            f += fp
            g = g + gp
        return f, g

    x, _f, _it = lbfgs_minimize(value_grad, x0, m=5, gtol=gtol,
                                max_iter=max_iter)
    pdim = 2 * F1
    personalized = {}
    for i, u in enumerate(users):
        self_th, edges = theta[i]
        pw = np.zeros(F1)
        for j, th in [(i, self_th)] + list(edges):
            A = x[pdim * j: pdim * (j + 1)]
            pw = pw + th * (A[:F1] * g_w + A[F1:])
        personalized[u] = pw
    return {"users": users, "personalized": personalized}


# -------------------------------------------- MT-CoLinAdapt & SupUserNoAdapt

def train_mtcolinadapt(user_docs: dict, g_w: np.ndarray, *, topk: int = 2,
                       eta1: float = 0.5, eta2: float = 0.5,
                       eta3: float = 0.5, eta4: float = 0.1,
                       n_blocks: int = 4, max_iter: int = 150,
                       gtol: float = 1e-4, l_norm: bool = False):
    """MTCoLinAdapt (``CoLinAdapt/MTCoLinAdapt.java``): MTLinAdapt (user
    transforms over the jointly-learned super transform) PLUS CoLinAdapt's
    R2 neighbor coupling Σ_edges sim·(η3‖a_i−a_j‖² + η4‖b_i−b_j‖²)
    (``calculateFuncValue``/``gradientByR2`` :40-57 — the reference shares
    η3/η4 between the super R1 and R2). Data partials ride the shared
    mtclin remote; R2 and the R1s are vocab-sized driver terms."""
    from ir_base_ray.pipelines.dpadapt import _dp_block_fg

    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    pdim = 2 * F1
    users, nbrs = build_neighbors(user_docs, F1, topk)
    n = len(users)
    entries_all = [([(np.asarray(t, dtype=np.int64),
                      np.asarray(v, dtype=np.float64), int(y))
                     for t, v, y in user_docs[u]], i)
                   for i, u in enumerate(users)]
    blocks = [entries_all[i::n_blocks] for i in range(min(n_blocks, n))]
    refs = [ray.put(b) for b in blocks]
    unit = np.concatenate([np.ones(F1), np.zeros(F1)])
    x0 = np.tile(unit, n + 1)

    def value_grad(x):
        f = 0.0
        g = np.zeros_like(x)
        for i in range(n):                # per-user R1
            off = pdim * i
            da = x[off: off + F1] - 1.0
            db = x[off + F1: off + 2 * F1]
            f += eta1 * float(da @ da) + eta2 * float(db @ db)
            g[off: off + F1] += 2.0 * eta1 * da
            g[off + F1: off + 2 * F1] += 2.0 * eta2 * db
        off = pdim * n                    # super R1 (calculateRs)
        da = x[off: off + F1] - 1.0
        db = x[off + F1: off + 2 * F1]
        f += eta3 * float(da @ da) + eta4 * float(db @ db)
        g[off: off + F1] += 2.0 * eta3 * da
        g[off + F1: off + 2 * F1] += 2.0 * eta4 * db
        for i in range(n):                # R2 over directed edges
            off_i = pdim * i
            ai = x[off_i: off_i + F1]
            bi = x[off_i + F1: off_i + 2 * F1]
            for j, sim in nbrs[i]:
                off_j = pdim * j
                da = ai - x[off_j: off_j + F1]
                db = bi - x[off_j + F1: off_j + 2 * F1]
                f += sim * (eta3 * float(da @ da) + eta4 * float(db @ db))
                g[off_i: off_i + F1] += 2.0 * sim * eta3 * da
                g[off_i + F1: off_i + 2 * F1] += 2.0 * sim * eta4 * db
                g[off_j: off_j + F1] -= 2.0 * sim * eta3 * da
                g[off_j + F1: off_j + 2 * F1] -= 2.0 * sim * eta4 * db
        x_ref = ray.put(x)
        outs = ray.get([
            _dp_block_fg.remote(r, x_ref, g_w, pdim, "mtclin", n, l_norm)
            for r in refs
        ])
        for fp, gp in outs:
            f += fp
            g = g + gp
        return f, g

    x, _f, _it = lbfgs_minimize(value_grad, x0, m=6, gtol=gtol,
                                max_iter=max_iter)
    sup = x[pdim * n:]
    w_s = sup[:F1] * g_w + sup[F1:]
    personalized = {}
    for i, u in enumerate(users):
        A = x[pdim * i: pdim * (i + 1)]
        personalized[u] = A[:F1] * w_s + A[F1:]
    return {"users": users, "personalized": personalized,
            "super_weights": w_s, "super_transform": sup.copy(),
            "neighbors": nbrs}


@ray.remote
def _supnoadapt_block_fg(user_entries, x, g_w, n_users, p, q, l_norm):
    """MTLinAdaptWithSupUserNoAdapt data partial: user transforms over the
    UNADAPTED super combination p·w_s + q·w_g (``getSupWeights`` :60-63);
    the super block is a raw weight vector whose gradient takes only the
    a_i·p-scaled path (``gradientByFunc`` :79-106 — no transform on the
    super user)."""
    F1 = g_w.size
    sup_off = 2 * F1 * n_users
    ws = x[sup_off:]
    base = p * ws + q * g_w
    f = 0.0
    g = np.zeros_like(x)
    for docs, i in user_entries:
        off = 2 * F1 * i
        a = x[off: off + F1]
        b = x[off + F1: off + 2 * F1]
        n_adapt = max(1, len(docs)) if l_norm else 1
        for tids, vals, y in docs:
            nn = tids + 1
            s = a[0] * base[0] + b[0] + float(
                ((a[nn] * base[nn] + b[nn]) * vals).sum())
            pr = 1.0 / (1.0 + np.exp(-s)) if s > -500 else 0.0
            if y == 1:
                f -= (np.log(pr) if pr > 0.0 else -MAX_VALUE) / n_adapt
            else:
                f -= (np.log(1.0 - pr) if pr < 1.0 else -MAX_VALUE) / n_adapt
            delta = (y - pr) / n_adapt
            g[off] -= delta * base[0]
            g[off + F1] -= delta
            np.subtract.at(g, off + nn, delta * base[nn] * vals)
            np.subtract.at(g, off + F1 + nn, delta * vals)
            g[sup_off] -= delta * a[0] * p
            np.subtract.at(g, sup_off + nn, delta * a[nn] * p * vals)
    return f, g


def train_mtlinadapt_supnoadapt(user_docs: dict, g_w: np.ndarray, *,
                                p: float = 1.0, q: float = 1.0,
                                beta: float = 1.0, eta1: float = 0.5,
                                eta2: float = 0.5, n_blocks: int = 4,
                                max_iter: int = 150, gtol: float = 1e-4,
                                l_norm: bool = False):
    """MTLinAdaptWithSupUserNoAdapt
    (``CoLinAdapt/MTLinAdaptWithSupUserNoAdapt.java``): the super user is a
    raw weight VECTOR w_s (not a transform) — personalized decision
    A_i(p·w_s + q·w_g)ᵀx (:13-16), super R1 = β‖w_s‖² (``calculateRs``
    :65-71), w_s initialized from the loaded super model (= the global
    model here, ``loadUsers`` :48-52). One joint distributed L-BFGS."""
    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    pdim = 2 * F1
    users = [u for u in user_docs if user_docs[u]]
    n = len(users)
    entries_all = [([(np.asarray(t, dtype=np.int64),
                      np.asarray(v, dtype=np.float64), int(y))
                     for t, v, y in user_docs[u]], i)
                   for i, u in enumerate(users)]
    blocks = [entries_all[i::n_blocks] for i in range(min(n_blocks, n))]
    refs = [ray.put(b) for b in blocks]
    unit = np.concatenate([np.ones(F1), np.zeros(F1)])
    x0 = np.concatenate([np.tile(unit, n), g_w])

    def value_grad(x):
        f = 0.0
        g = np.zeros_like(x)
        for i in range(n):                # per-user R1
            off = pdim * i
            da = x[off: off + F1] - 1.0
            db = x[off + F1: off + 2 * F1]
            f += eta1 * float(da @ da) + eta2 * float(db @ db)
            g[off: off + F1] += 2.0 * eta1 * da
            g[off + F1: off + 2 * F1] += 2.0 * eta2 * db
        ws = x[pdim * n:]                 # super R1 = β‖w_s‖²
        f += beta * float(ws @ ws)
        g[pdim * n:] += 2.0 * beta * ws
        x_ref = ray.put(x)
        outs = ray.get([
            _supnoadapt_block_fg.remote(r, x_ref, g_w, n, p, q, l_norm)
            for r in refs
        ])
        for fp, gp in outs:
            f += fp
            g = g + gp
        return f, g

    x, _f, _it = lbfgs_minimize(value_grad, x0, m=6, gtol=gtol,
                                max_iter=max_iter)
    ws = x[pdim * n:]
    base = p * ws + q * g_w
    personalized = {}
    for i, u in enumerate(users):
        A = x[pdim * i: pdim * (i + 1)]
        personalized[u] = A[:F1] * base + A[F1:]
    return {"users": users, "personalized": personalized,
            "super_weights": ws.copy()}


# ------------------------------------------------- online MT / first-order

def train_async_mtreglr(user_docs: dict, g_w: np.ndarray, *,
                        u_coef: float = 1.0, init_step: float = 0.05,
                        seed: int = 73):
    """asyncMTRegLR (``RegLR/asyncMTRegLR.java``): ONLINE MTRegLR —
    users processed sequentially, each arriving review takes one decaying
    step on (w_user, w_global) jointly: decision w_u·x + u·w_glb·x
    (``logit`` :52-63), data gradient into both blocks (global part
    ×u, :65-82), R1 = 2η1(w_u + u·w_glb − w_g) into both (:84-96) with
    η1 = 1/n_users (``initLBFGS`` :42-50), w_glb starting from the old
    global model (:28-29); both blocks stepped with the USER's decaying
    step (``gradientDescent`` :148-168). Seeded Philox replaces the
    unseeded step jitter."""
    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    users = [u for u in user_docs if user_docs[u]]
    eta1 = 1.0 / max(1, len(users))
    w_glb = g_w.copy()
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))
    personalized = {}
    for uname in users:
        w_u = np.zeros(F1)
        for count, (tids, vals, y) in enumerate(user_docs[uname]):
            nn = np.asarray(tids, dtype=np.int64) + 1
            vv = np.asarray(vals, dtype=np.float64)
            s = (w_u[0] + u_coef * w_glb[0]
                 + float(((w_u[nn] + u_coef * w_glb[nn]) * vv).sum()))
            pr = 1.0 / (1.0 + np.exp(-s)) if s > -500 else 0.0
            g_user = np.zeros(F1)
            g_glb = np.zeros(F1)
            delta = (int(y) - pr)
            g_user[0] -= delta
            g_glb[0] -= u_coef * delta
            np.subtract.at(g_user, nn, delta * vv)
            np.subtract.at(g_glb, nn, delta * u_coef * vv)
            r1 = 2.0 * eta1 * (w_u + u_coef * w_glb - g_w)
            g_user += r1
            g_glb += r1 * u_coef
            step = (0.5 + 0.5 * rng.random()) * init_step / (2.0 + count)
            w_u = w_u - step * g_user
            w_glb = w_glb - step * g_glb
        personalized[uname] = w_u + u_coef * w_glb
    return {"users": users, "personalized": personalized,
            "global_weights": w_glb.copy()}


def train_async_mtlinadapt(user_docs: dict, g_w: np.ndarray, *,
                           eta1: float = 0.5, eta2: float = 0.5,
                           eta3: float = 0.5, eta4: float = 0.1,
                           init_step: float = 0.05, rpt: int = 3,
                           seed: int = 79):
    """asyncMTLinAdapt (``CoLinAdapt/asyncMTLinAdapt.java``): ONLINE
    MTLinAdapt by user — each arriving review computes ONE gradient
    (user's data term + user R1 + super Rs, ``calculateGradients``
    :50-54) and applies it m_rptTime=3 times at the same decaying step
    (``gradientDescent`` :183-210, the while(m_count--) repeat), updating
    both the user transform and the super transform."""
    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    users = [u for u in user_docs if user_docs[u]]
    sup = np.concatenate([np.ones(F1), np.zeros(F1)])
    A = {u: np.concatenate([np.ones(F1), np.zeros(F1)]) for u in users}
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))
    for uname in users:
        for count, (tids, vals, y) in enumerate(user_docs[uname]):
            nn = np.asarray(tids, dtype=np.int64) + 1
            vv = np.asarray(vals, dtype=np.float64)
            a = A[uname][:F1]
            b = A[uname][F1:]
            w_s = sup[:F1] * g_w + sup[F1:]
            s = a[0] * w_s[0] + b[0] + float(
                ((a[nn] * w_s[nn] + b[nn]) * vv).sum())
            pr = 1.0 / (1.0 + np.exp(-s)) if s > -500 else 0.0
            delta = int(y) - pr
            g_u = np.zeros(2 * F1)
            g_s = np.zeros(2 * F1)
            g_u[0] -= delta * w_s[0]
            g_u[F1] -= delta
            np.subtract.at(g_u, nn, delta * w_s[nn] * vv)
            np.subtract.at(g_u, F1 + nn, delta * vv)
            g_s[0] -= delta * a[0] * g_w[0]
            g_s[F1] -= delta * a[0]
            np.subtract.at(g_s, nn, delta * a[nn] * g_w[nn] * vv)
            np.subtract.at(g_s, F1 + nn, delta * a[nn] * vv)
            # R1 (user) + Rs (super)
            g_u[:F1] += 2.0 * eta1 * (a - 1.0)
            g_u[F1:] += 2.0 * eta2 * b
            g_s[:F1] += 2.0 * eta3 * (sup[:F1] - 1.0)
            g_s[F1:] += 2.0 * eta4 * sup[F1:]
            step = (0.5 + 0.5 * rng.random()) * init_step / (2.0 + count)
            for _ in range(rpt):
                A[uname] = A[uname] - step * g_u
                sup = sup - step * g_s
    w_s = sup[:F1] * g_w + sup[F1:]
    personalized = {u: A[u][:F1] * w_s + A[u][F1:] for u in users}
    return {"users": users, "personalized": personalized,
            "super_transform": sup.copy(), "super_weights": w_s}


# ------------------------------------- CoLinAdapt with diff feature groups

@ray.remote
def _diffgroups_block_fg(user_idx_block, docs_block, x, g_w, dim_a, dim_b,
                         map_a, map_b, n_users, g0, g1, nbrs_block,
                         eta1, eta2, eta3, eta4):
    """CoLinAdaptWithDiffFeatureGroups partial: per-user TWO-class softmax
    over separate transforms — class-0 score through (A, featureGroupMapA,
    g0·w_g), class-1 through (B, featureGroupMapB, g1·w_g)
    (``calcPosterior`` :166-192, ``gradientByFunc`` :194-233) — plus both
    R1s (:122-130, :236-247) and the R2 coupling on BOTH parameter sets
    over the user's out-edges (:131-143, :249-279)."""
    a_size = 2 * dim_a * n_users
    f = 0.0
    g = np.zeros_like(x)
    for ui, docs, edges in zip(user_idx_block, docs_block, nbrs_block):
        off_a = 2 * dim_a * ui
        off_b = a_size + 2 * dim_b * ui
        aA = x[off_a: off_a + dim_a]
        bA = x[off_a + dim_a: off_a + 2 * dim_a]
        aB = x[off_b: off_b + dim_b]
        bB = x[off_b + dim_b: off_b + 2 * dim_b]
        for tids, vals, y in docs:
            nn = np.asarray(tids, dtype=np.int64) + 1
            vv = np.asarray(vals, dtype=np.float64)
            kA = map_a[nn]
            kB = map_b[nn]
            e0 = (aA[map_a[0]] * g_w[0] * g0 + bA[map_a[0]]
                  + float(((aA[kA] * g_w[nn] * g0 + bA[kA]) * vv).sum()))
            e1 = (aB[map_b[0]] * g_w[0] * g1 + bB[map_b[0]]
                  + float(((aB[kB] * g_w[nn] * g1 + bB[kB]) * vv).sum()))
            m = max(e0, e1)
            z = np.exp(e0 - m) + np.exp(e1 - m)
            p0 = np.exp(e0 - m) / z
            p1 = 1.0 - p0
            f -= np.log(max(p0 if y == 0 else p1, 1e-300))
            dA = (1.0 - p0) if y == 0 else -p0
            dB = -p1 if y == 0 else (1.0 - p1)
            g[off_a + map_a[0]] -= dA * g_w[0] * g0
            g[off_a + dim_a + map_a[0]] -= dA
            g[off_b + map_b[0]] -= dB * g_w[0] * g1
            g[off_b + dim_b + map_b[0]] -= dB
            np.subtract.at(g, off_a + kA, dA * g_w[nn] * g0 * vv)
            np.subtract.at(g, off_a + dim_a + kA, dA * vv)
            np.subtract.at(g, off_b + kB, dB * g_w[nn] * g1 * vv)
            np.subtract.at(g, off_b + dim_b + kB, dB * vv)
        # R1 on both sets
        f += eta1 * float((aA - 1.0) @ (aA - 1.0)) + eta2 * float(bA @ bA)
        f += eta1 * float((aB - 1.0) @ (aB - 1.0)) + eta2 * float(bB @ bB)
        g[off_a: off_a + dim_a] += 2.0 * eta1 * (aA - 1.0)
        g[off_a + dim_a: off_a + 2 * dim_a] += 2.0 * eta2 * bA
        g[off_b: off_b + dim_b] += 2.0 * eta1 * (aB - 1.0)
        g[off_b + dim_b: off_b + 2 * dim_b] += 2.0 * eta2 * bB
        # R2 over out-edges, both sets, symmetric gradient
        for j, w in edges:
            off_ja = 2 * dim_a * j
            off_jb = a_size + 2 * dim_b * j
            daA = aA - x[off_ja: off_ja + dim_a]
            dbA = bA - x[off_ja + dim_a: off_ja + 2 * dim_a]
            daB = aB - x[off_jb: off_jb + dim_b]
            dbB = bB - x[off_jb + dim_b: off_jb + 2 * dim_b]
            f += w * (eta3 * (float(daA @ daA) + float(daB @ daB))
                      + eta4 * (float(dbA @ dbA) + float(dbB @ dbB)))
            g[off_a: off_a + dim_a] += 2.0 * w * eta3 * daA
            g[off_a + dim_a: off_a + 2 * dim_a] += 2.0 * w * eta4 * dbA
            g[off_ja: off_ja + dim_a] -= 2.0 * w * eta3 * daA
            g[off_ja + dim_a: off_ja + 2 * dim_a] -= 2.0 * w * eta4 * dbA
            g[off_b: off_b + dim_b] += 2.0 * w * eta3 * daB
            g[off_b + dim_b: off_b + 2 * dim_b] += 2.0 * w * eta4 * dbB
            g[off_jb: off_jb + dim_b] -= 2.0 * w * eta3 * daB
            g[off_jb + dim_b: off_jb + 2 * dim_b] -= 2.0 * w * eta4 * dbB
    return f, g


def train_colinadapt_diffgroups(user_docs: dict, g_w: np.ndarray, *,
                                topk: int = 2, group_a=None, group_b=None,
                                g0: float = 1.0, g1: float = 1.0,
                                eta1: float = 0.5, eta2: float = 0.5,
                                eta3: float = 0.5, eta4: float = 0.5,
                                n_blocks: int = 4, max_iter: int = 100,
                                gtol: float = 1e-4):
    """CoLinAdaptWithDiffFeatureGroups
    (``CoLinAdapt/CoLinAdaptWithDiffFeatureGroups.java``): each user owns
    TWO LinAdapt transforms — one per class — with their OWN feature-group
    maps (``loadFeatureGroupMapB`` :90-118; identity when no file, like
    the reference's null path), scores softmax-normalized
    (``calcPosterior``), CoLinAdapt's joint L-BFGS over the concatenated
    [all A-sets | all B-sets] vector with R1+R2 on both sets. ``group_a`` /
    ``group_b``: int arrays of length F+1 mapping feature index (0=bias) →
    group id. Returns per-user CLASS-1 personalized weights (decision
    score1−score0) plus both transform sets."""
    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    map_a = (np.arange(F1, dtype=np.int64) if group_a is None
             else np.asarray(group_a, dtype=np.int64))
    map_b = (np.arange(F1, dtype=np.int64) if group_b is None
             else np.asarray(group_b, dtype=np.int64))
    dim_a = int(map_a.max()) + 1
    dim_b = int(map_b.max()) + 1
    users, nbrs = build_neighbors(user_docs, F1, topk)
    n = len(users)
    idx = list(range(n))
    blocks = [idx[i::n_blocks] for i in range(min(n_blocks, n))]
    docs_refs = [ray.put([user_docs[users[i]] for i in blk])
                 for blk in blocks]
    nbrs_blocks = [[nbrs[i] for i in blk] for blk in blocks]
    x0 = np.concatenate([
        np.tile(np.concatenate([np.ones(dim_a), np.zeros(dim_a)]), n),
        np.tile(np.concatenate([np.ones(dim_b), np.zeros(dim_b)]), n),
    ])

    def value_grad(x):
        x_ref = ray.put(x)
        outs = ray.get([
            _diffgroups_block_fg.remote(blk, dref, x_ref, g_w, dim_a, dim_b,
                                        map_a, map_b, n, g0, g1, nb,
                                        eta1, eta2, eta3, eta4)
            for blk, dref, nb in zip(blocks, docs_refs, nbrs_blocks)
        ])
        f = 0.0
        g = np.zeros_like(x)
        for fp, gp in outs:
            f += fp
            g = g + gp
        return f, g

    x, _f, _it = lbfgs_minimize(value_grad, x0, m=5, gtol=gtol,
                                max_iter=max_iter)
    a_size = 2 * dim_a * n
    personalized = {}
    A_sets, B_sets = {}, {}
    for i, u in enumerate(users):
        off_a = 2 * dim_a * i
        off_b = a_size + 2 * dim_b * i
        aA = x[off_a: off_a + dim_a]
        bA = x[off_a + dim_a: off_a + 2 * dim_a]
        aB = x[off_b: off_b + dim_b]
        bB = x[off_b + dim_b: off_b + 2 * dim_b]
        A_sets[u] = np.concatenate([aA, bA])
        B_sets[u] = np.concatenate([aB, bB])
        # decision margin score1 − score0 expands to a linear model
        w1 = aB[map_b] * g_w * g1 + bB[map_b]
        w0 = aA[map_a] * g_w * g0 + bA[map_a]
        personalized[u] = w1 - w0
    return {"users": users, "personalized": personalized, "A": A_sets,
            "B": B_sets, "neighbors": nbrs}


# ------------------------------------------- CoLinAdapt neighborhood learning

def train_colinadapt_neighborhood(user_docs: dict, g_w: np.ndarray, *,
                                  topk: int = 2, lam: float = 0.1,
                                  max_rounds: int = 4, tol: float = 1e-10,
                                  svd_vectors: dict | None = None,
                                  eta1: float = 0.5, eta2: float = 0.5,
                                  eta3: float = 0.5, eta4: float = 0.5,
                                  n_blocks: int = 4, max_iter: int = 100,
                                  gtol: float = 1e-4):
    """CoLinAdaptWithNeighborhoodLearning
    (``CoLinAdapt/CoLinAdaptWithNeighborhoodLearning.java``): alternate
    (1) batch CoLinAdapt under the current edge similarities, (2) target
    similarities = per-user-NORMALIZED cosine between the learned user
    transforms (``calcSimA`` :132-151), (3) per-user logistic similarity
    models w_i over pair features x_ij = [1, BoW-cos, SVD-cos] fit by one
    L-BFGS on Σ simA_ij·log(1+e^(−w_i·x_ij)) + λ‖w‖²
    (``calculateFValueGradients`` :170-205, the NaN-SVD→0 guard
    ``constructXij`` :100-109), (4) new edge weights σ(w_i·x_ij)
    (``updateNeighborhood`` :208-228) — until both the transforms and the
    similarities stop moving (:57-77). The similarity L-BFGS is
    n_users·fDim-sized — driver-scale by design."""
    g_w = np.asarray(g_w, dtype=np.float64)
    F1 = g_w.size
    users, nbrs = build_neighbors(user_docs, F1, topk)
    n = len(users)
    fdim = 3
    # pair features, fixed across rounds (constructXijs :80-98)
    profs = {u: _bow_profile(user_docs[u], F1) for u in users}
    xijs: dict[int, list[np.ndarray]] = {}
    for i in range(n):
        rows = []
        for j, _sim in nbrs[i]:
            bow = float(profs[users[i]] @ profs[users[j]])
            if svd_vectors is not None:
                vi = np.asarray(svd_vectors.get(users[i], np.zeros(1)))
                vj = np.asarray(svd_vectors.get(users[j], np.zeros(1)))
                ni, nj = np.linalg.norm(vi), np.linalg.norm(vj)
                svd = float(vi @ vj / (ni * nj)) if ni and nj else 0.0
            else:
                svd = 0.0                       # the NaN→0 special case
            rows.append(np.array([1.0, bow, svd]))
        xijs[i] = rows
    cur = dict(nbrs)
    out = None
    prev_A = None
    for _round in range(max_rounds):
        out = train_colinadapt(user_docs, g_w, topk=topk, eta1=eta1,
                               eta2=eta2, eta3=eta3, eta4=eta4,
                               n_blocks=n_blocks, max_iter=max_iter,
                               gtol=gtol, nbrs_override=cur)
        A = out["A"]
        diff_a = (float(((A - prev_A) ** 2).sum())
                  if prev_A is not None else np.inf)
        prev_A = A.copy()
        # target sims: normalized cosine between transforms (calcSimA)
        sim_a: dict[int, np.ndarray] = {}
        for i in range(n):
            if not nbrs[i]:
                sim_a[i] = np.zeros(0)
                continue
            s = np.array([
                float(A[i] @ A[j]) /
                max(np.linalg.norm(A[i]) * np.linalg.norm(A[j]), 1e-300)
                for j, _ in nbrs[i]])
            tot = float(s.sum())
            sim_a[i] = s / tot if tot else s
        # per-user similarity LR (one joint L-BFGS, n·fdim params)
        def value_grad(w):
            f = lam * float(w @ w)
            g = 2.0 * lam * w
            for i in range(n):
                wi = w[i * fdim: (i + 1) * fdim]
                for jj, x in enumerate(xijs[i]):
                    e = np.exp(-float(wi @ x))
                    f += sim_a[i][jj] * np.log(1.0 + e)
                    g[i * fdim: (i + 1) * fdim] += (
                        e * (-x) * sim_a[i][jj] / (1.0 + e))
            return f, g

        w, _fv, _it = lbfgs_minimize(value_grad, np.zeros(n * fdim), m=6,
                                     gtol=1e-4, max_iter=100)
        # new edge weights σ(w_i·x_ij) (updateNeighborhood)
        diff_sim = 0.0
        new = {}
        for i in range(n):
            wi = w[i * fdim: (i + 1) * fdim]
            edges = []
            for (j, old), x in zip(cur[i], xijs[i]):
                s = 1.0 / (1.0 + np.exp(-float(wi @ x)))
                diff_sim += (s - old) ** 2
                edges.append((j, float(s)))
            new[i] = edges
        cur = new
        if diff_a <= tol and diff_sim <= tol:
            break
    out = dict(out)
    out["learned_neighbors"] = cur
    return out


# --------------------------------------- cross feature selection + SVM bases

def cross_feature_selection(vec_ds, *, n_classes: int, n_features: int,
                            k_fold: int = 4, k_means: int = 10,
                            C_reg: float = 1.0, seed: int = 83,
                            max_iter: int = 60):
    """CrossFeatureSelection (``Analyzer/CrossFeatureSelection.java``):
    random k-fold masks over the corpus (``shuffle`` :67-73, seeded Philox
    replacing the unseeded Random), one linear SVM per fold (:75-84,
    distributed squared-hinge like the R6 SVM), then KMeansAlg4Vct over the
    FEATURES — each feature described by its k-fold weight profile
    (``kMeans`` :86-93) — producing the feature-group map the
    MTLinAdapt/CoLinAdaptWithDiffFeatureGroups tier consumes (:95-106
    writes exactly that comma-separated group file). Returns
    (feature_group int array of length F+1 incl. bias→its own group,
    fold weight matrix)."""
    from ir_base_ray.pipelines.kmeans import kmeans_dense_cosine
    from ir_base_ray.pipelines.linear import train_linear_svm

    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))

    import pyarrow as pa

    def mask(batch: pa.Table) -> pa.Table:
        # per-doc fold by hash of doc_id (layout-independent, unlike the
        # reference's unseeded Random — documented determinism substitution)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ids = ids.astype(np.int64)
        fold = (ids * 2654435761 % 2**32) % k_fold
        return batch.append_column("fold", pa.array(fold, pa.int64()))

    folds_ds = vec_ds.map_batches(mask, batch_format="pyarrow")
    del rng
    weights = []
    for f in range(k_fold):
        sub = folds_ds.filter(lambda r, f=f: r["fold"] == f)
        W, _fv, _it = train_linear_svm(sub, n_classes=n_classes,
                                       n_features=n_features, C_reg=C_reg,
                                       max_iter=max_iter)
        # binary: the class-1 margin vector; multi: stack all classes
        weights.append(W[1] - W[0] if n_classes == 2 else W.ravel())
    Wk = np.stack(weights)                    # k_fold × (F+1)
    feat_profiles = Wk[:, 1:].T               # F × k_fold
    assign, _cent = kmeans_dense_cosine(feat_profiles, k=k_means, seed=seed)
    groups = np.empty(n_features + 1, dtype=np.int64)
    groups[0] = 0                             # bias keeps its own group
    groups[1:] = assign + 1
    return groups, Wk


def train_individual_svm(user_docs: dict, *, n_features: int,
                         C_reg: float = 1.0, max_iter: int = 100,
                         gtol: float = 1e-4):
    """IndividualSVM (``Classifier/supervised/IndividualSVM.java``): one
    linear SVM PER USER on the user's own adaptation data only (no
    sharing; the no-adaptation baseline of the MT-SVM family, L2R_L1LOSS
    → squared-hinge primal substitution as documented for MT-SVM).
    Embarrassingly parallel per user."""
    F1 = n_features + 1
    users = [u for u in user_docs if user_docs[u]]
    personalized = {}
    for u in users:
        rows = [(np.asarray(t, dtype=np.int64),
                 np.asarray(v, dtype=np.float64),
                 1.0 if y == 1 else -1.0) for t, v, y in user_docs[u]]

        def fg(w, rows=rows):
            f = 0.5 * float(w[1:] @ w[1:])
            g = np.zeros_like(w)
            g[1:] = w[1:]
            for tids, vals, y in rows:
                s = w[0] + float((w[tids + 1] * vals).sum())
                m = 1.0 - y * s
                if m > 0:
                    f += C_reg * m * m
                    coef = -2.0 * C_reg * m * y
                    g[0] += coef
                    np.add.at(g, tids + 1, coef * vals)
            return f, g

        w, _f, _it = lbfgs_minimize(fg, np.zeros(F1), m=6, gtol=gtol,
                                    max_iter=max_iter)
        personalized[u] = w
    return {"users": users, "personalized": personalized}


def train_global_svm(user_docs: dict, *, n_features: int, C_reg: float = 1.0,
                     max_iter: int = 100, gtol: float = 1e-4):
    """GlobalSVM (``Classifier/supervised/GlobalSVM.java``): ONE linear SVM
    over every user's pooled adaptation data; all users share the single
    model (the other no-adaptation baseline)."""
    rows = []
    users = [u for u in user_docs if user_docs[u]]
    for u in users:
        for t, v, y in user_docs[u]:
            rows.append((np.asarray(t, dtype=np.int64),
                         np.asarray(v, dtype=np.float64),
                         1.0 if y == 1 else -1.0))
    F1 = n_features + 1

    def fg(w):
        f = 0.5 * float(w[1:] @ w[1:])
        g = np.zeros_like(w)
        g[1:] = w[1:]
        for tids, vals, y in rows:
            s = w[0] + float((w[tids + 1] * vals).sum())
            m = 1.0 - y * s
            if m > 0:
                f += C_reg * m * m
                coef = -2.0 * C_reg * m * y
                g[0] += coef
                np.add.at(g, tids + 1, coef * vals)
        return f, g

    w, _f, _it = lbfgs_minimize(fg, np.zeros(F1), m=6, gtol=gtol,
                                max_iter=max_iter)
    return {"users": users, "personalized": {u: w for u in users}}
