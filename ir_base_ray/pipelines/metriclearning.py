"""metricLearning variants (``Classifier/metricLearning/``; SURVEY.md §2.7
R2 family tail): the two L2RMetricLearning subclass strategies.

1. LinearSVMMetricLearning (``LinearSVMMetricLearning.java``) — a
   GaussianFieldsByRandomWalk whose similarity is LEARNED:
   - ``selFeatures`` (:101-134): an L1-regularized L2-loss SVC on the train
     set picks the non-zero-weight features as the projection space
     (liblinear ``L1R_L2LOSS_SVC``; here a deterministic proximal-gradient
     (ISTA) solver — same objective ‖w‖₁ + C·Σ max(0,1−y·wx)², exact zeros
     via soft-thresholding; binary cSize=1 treatment kept);
   - pair generation (``trainLibLinear`` :136-194): for ordered train pairs
     (i<j), label +1 when yLabels match, −1 when |Δy|>bound, skip otherwise
     — with the reference's SEQUENTIAL caps transcribed: a same-class pair
     is skipped once PP>NN+1000, and any pair once the running
     mustLink/cannotLink imbalance passes 2000;
   - pair features (``createLinearFeature_diff`` :205-229): d = x_i−x_j in
     the projected space, lower-triangle of d·dᵀ (2·d_i·d_j off-diagonal,
     d_i² diagonal) at index 1+i(i+1)/2+j (``getIndex`` :259-267);
   - metric SVM: liblinear ``L2R_L1LOSS_SVC_DUAL`` over the pair features —
     substituted by the repo's primal squared-hinge L-BFGS (the same
     liblinear-replacement trade as R6 ``svm_classify``, documented);
   - similarity (``getSimilarity`` :59-85): exp(w·feat(d_i,d_j)), backing
     off to the default exp-BoW similarity when a projection is empty.

2. L2RWithQueryClustering (``L2RWithQueryClustering.java``) — one RankSVM
   per document cluster (``train`` :39-76: split the train set by cluster
   id, run L2RModelTraining per cluster), similarity
   exp(w_{cluster(d_i)} · normalize(genRankingFV(d_i,d_j))) — explicitly
   asymmetric (:78-93 "NOTE: this similarity is no longer symmetric!!").

Execution shape: feature selection + metric SVM are driver-side solvers on
small matrices; the O(n²) pair-feature generation and the learned-similarity
kNN graph both run as block-distributed map_batches over the broadcast
projected corpus (the same Q2 block-nested-loop shape as
pipelines/gaussianfields.build_knn_edges).
"""

from __future__ import annotations

import numpy as np

from ir_base_ray.pipelines.l2r import (RANK_FV_SIZE, build_l2r_queries,
                                       default_similarity, gen_ranking_fv)
from ir_base_ray.pipelines.linear import lbfgs_minimize


# ------------------------------------------------- L1 feature-selection SVC

def l1_svm_select(X_rows, y, n_features: int, *, C: float = 3.0,
                  max_iter: int = 400, tol: float = 1e-7):
    """L1R-L2LOSS SVC by proximal gradient: min ‖w‖₁ + C Σ max(0,1−y·wx)².
    ``X_rows`` = list of (tids, vals); y ∈ {±1}. Deterministic; returns
    (w, selected_index_map) with selected = {orig_fid: dense_pos} over
    non-zero weights (``selFeatures``'s m_selectedFVs)."""
    w = np.zeros(n_features)

    def smooth_grad(wv):
        f = 0.0
        g = np.zeros_like(wv)
        for (tids, vals), yy in zip(X_rows, y):
            margin = 1.0 - yy * float((wv[tids] * vals).sum())
            if margin > 0:
                f += C * margin * margin
                np.add.at(g, tids, -2.0 * C * margin * yy * vals)
        return f, g

    step = 1.0
    f, g = smooth_grad(w)
    for _ in range(max_iter):
        while True:
            cand = w - step * g
            # soft-threshold at step (the ℓ1 prox)
            w_new = np.sign(cand) * np.maximum(np.abs(cand) - step, 0.0)
            f_new, g_new = smooth_grad(w_new)
            d = w_new - w
            if f_new <= f + float(g @ d) + float(d @ d) / (2 * step) + 1e-12:
                break
            step *= 0.5
            if step < 1e-12:
                break
        if step < 1e-12 or float(np.abs(w_new - w).max()) < tol:
            w = w_new
            break
        w, f, g = w_new, f_new, g_new
        step = min(step * 1.3, 1.0)
    selected = {int(i): pos for pos, i in
                enumerate(np.flatnonzero(w != 0.0).tolist())}
    return w, selected


# --------------------------------------------- pair features + metric model

def project(tids, vals, selected: dict):
    """d.setProjectedFv: keep selected features, re-indexed densely."""
    keep = [(selected[int(t)], float(v)) for t, v in zip(tids, vals)
            if int(t) in selected]
    keep.sort()
    if not keep:
        return None
    idx, vv = zip(*keep)
    return np.asarray(idx, dtype=np.int64), np.asarray(vv)


def _tri_index(i: int, j: int) -> int:
    """getIndex (0-based here): lower triangle of the square matrix."""
    if i < j:
        i, j = j, i
    return i * (i + 1) // 2 + j


def pair_feature_diff(p1, p2, m: int) -> np.ndarray:
    """createLinearFeature_diff: dense triangle vector of (x1−x2)(x1−x2)ᵀ."""
    d = np.zeros(m)
    i1, v1 = p1
    i2, v2 = p2
    np.add.at(d, i1, v1)
    np.subtract.at(d, i2, v2)
    nz = np.flatnonzero(d)
    out = np.zeros(m * (m + 1) // 2)
    for a_pos, i in enumerate(nz.tolist()):
        for j in nz[:a_pos].tolist():
            out[_tri_index(i, j)] += 2.0 * d[i] * d[j]
        out[_tri_index(i, i)] += d[i] * d[i]
    return out


def build_metric_pairs(projected, labels, *, bound: int = 2):
    """trainLibLinear's pair sweep with the sequential caps transcribed."""
    fvs, targets = [], []
    pp = nn = must = cannot = 0
    n = len(projected)
    m = 0
    for p in projected:
        if p is not None and p[0].size:
            m = max(m, int(p[0].max()) + 1)
    for i in range(n):
        for j in range(i + 1, n):
            if labels[i] == labels[j]:
                label = 1
                if labels[i] == 1:
                    pp += 1
                else:
                    nn += 1
                if pp > nn + 1000:
                    continue
            elif abs(labels[i] - labels[j]) > bound:
                label = -1
            else:
                continue
            if (label == 1 and must > cannot + 2000) or \
                    (label == -1 and must + 2000 < cannot):
                continue
            if projected[i] is None or projected[j] is None:
                continue
            fvs.append(pair_feature_diff(projected[i], projected[j], m))
            targets.append(label)
            if label == 1:
                must += 1
            else:
                cannot += 1
    return fvs, targets, m


def train_metric_svm(fvs, targets, *, C: float = 1.0, max_iter: int = 200):
    """Binary squared-hinge SVM over the dense pair features (the primal
    substitute for liblinear's L2R_L1LOSS_SVC_DUAL)."""
    if not fvs:
        return np.zeros(0)
    X = np.stack(fvs)
    y = np.asarray(targets, dtype=np.float64)

    def fg(w):
        margins = 1.0 - y * (X @ w)
        act = margins > 0
        f = 0.5 * float(w @ w) + C * float((margins[act] ** 2).sum())
        g = w - 2.0 * C * ((y[act] * margins[act]) @ X[act])
        return f, g

    w, _f, _it = lbfgs_minimize(fg, np.zeros(X.shape[1]), max_iter=max_iter)
    return w


class LearnedMetricSimilarity:
    """getSimilarity: exp(w·feat_diff(di,dj)) with the default-similarity
    backoff when either projection is empty. Picklable → usable inside the
    distributed kNN edge builder."""

    def __init__(self, w, selected, m):
        self.w = w
        self.selected = selected
        self.m = m

    def __call__(self, di: dict, dj: dict) -> float:
        pi = project(di["tids"], di["vals"], self.selected)
        pj = project(dj["tids"], dj["vals"], self.selected)
        if pi is None or pj is None or self.w.size == 0:
            return default_similarity(di, dj)
        return float(np.exp(self.w @ pair_feature_diff(pi, pj, self.m)))


def train_linear_svm_metric(docs, *, n_features: int, bound: int = 2,
                            l1_C: float = 3.0, metric_C: float = 1.0):
    """Full LinearSVMMetricLearning training: L1 selection → pair sweep →
    metric SVM. ``docs`` = list of dicts with tids/vals/label (binary).
    Returns the similarity callable + the learned pieces."""
    X_rows = [(np.asarray(d["tids"], dtype=np.int64),
               np.asarray(d["vals"], dtype=np.float64)) for d in docs]
    y = np.asarray([1.0 if d["label"] == 1 else -1.0 for d in docs])
    _w_sel, selected = l1_svm_select(X_rows, y, n_features, C=l1_C)
    projected = [project(t, v, selected) for t, v in X_rows]
    labels = [int(d["label"]) for d in docs]
    fvs, targets, m = build_metric_pairs(projected, labels, bound=bound)
    w = train_metric_svm(fvs, targets, C=metric_C)
    return {"similarity": LearnedMetricSimilarity(w, selected, m),
            "selected": selected, "metric_w": w, "n_pairs": len(fvs)}


# ------------------------------------------- L2R with query clustering

class ClusterRankSimilarity:
    """L2RWithQueryClustering.getSimilarity: exp(w_{cluster(di)} ·
    normalize(genRankingFV(di, dj))) — asymmetric by construction."""

    def __init__(self, weights_by_cluster, mean, std):
        self.weights = weights_by_cluster
        self.mean = mean
        self.std = std

    def __call__(self, di: dict, dj: dict) -> float:
        w = self.weights[int(di["cluster"])]
        fv = (gen_ranking_fv(di, dj) - self.mean) / self.std
        return float(np.exp(w @ fv))


def train_l2r_query_clustering(docs, *, n_clusters: int, top_k: int = 10,
                               seed: int = 17):
    """One RankSVM per cluster: split ``docs`` (dicts with
    tids/vals/label/doc_len/cluster) by cluster id, run the existing L2R
    query building + RankSVM per group (independent → a
    groupby(cluster).map_groups at scale; driver loop here since the weight
    matrix is tiny). Falls back to zero weights for clusters with no
    trainable pairs (the reference would NPE)."""
    from ir_base_ray.pipelines.ranknet import train_ranksvm

    weights = {}
    mean = np.zeros(RANK_FV_SIZE)
    std = np.ones(RANK_FV_SIZE)
    for c in sorted({int(d["cluster"]) for d in docs}):
        sub = [d for d in docs if int(d["cluster"]) == c]
        queries, mean_c, std_c = build_l2r_queries(sub, top_k=top_k)
        if queries:
            w, _ = train_ranksvm(queries, C_reg=1.0, n_shards=1)
            weights[c] = w
            mean, std = mean_c, std_c
        else:
            weights[c] = np.zeros(RANK_FV_SIZE)
    return {"similarity": ClusterRankSimilarity(weights, mean, std),
            "weights": weights}
