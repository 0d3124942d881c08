"""Semi-supervised label propagation — GaussianFields by random walk
(``Classifier/semisupervised/GaussianFieldsByRandomWalk.java:61-144``,
``GaussianFields.java:100-162``, ``structures/_Node.java``; SURVEY.md §2.7
R6, the reference's style=SEMI entry point).

Semantics transcribed:
- graph: each UNLABELED doc gets its top-k labeled neighbors and top-k'
  unlabeled neighbors under the default similarity exp(BoWSim − TopicalSim)
  (``getSimilarity`` :159-162), bounded MyPriorityQueue per side;
- node init: unlabeled pred = classifier prediction
  (``_Node`` ctor :22-29); labeled nodes carry their true label;
- weighted-sum walk (:61-92): per unlabeled node i,
    pred_i = η·(α·fSumL + β·fSumU)/(α·wSumL + β·wSumU) + (1−η)·clfPred_i
  with per-edge weight = similarity (simFlag) or 1, fSum = weight·neighbor
  pred (labeled neighbors contribute their true label); all nodes update
  from the PREVIOUS round's preds; iterate until the mean |Δpred| ≤ δ
  (``updateFu`` :134-142);
- majority-vote walk (:96-131): class scores accumulate η·α (labeled) /
  η·β (unlabeled) per neighbor (×similarity with simFlag), plus (1−η) on
  the classifier's class; pred = argmax (first max wins);
- final label (``getLabel``): argmin |c − pred| over class ids.

Execution shape: the O(U·(L+U)) similarity scan is the distributed stage —
unlabeled docs stream through ``map_batches`` against the broadcast
labeled+unlabeled candidate set (Q2 block-nested-loop, same shape as the
reference's PairwiseSimCalculator thread pool). The propagation itself
iterates on the driver over the U×(k+k') edge arrays — the same memory the
reference's m_nodeList holds; at larger U the edge table is a Dataset and
each round is one groupby, noted in-line."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ir_base_ray.functions.topk import BoundedTopK
from ir_base_ray.perf import pool_size
from ir_base_ray.pipelines.l2r import default_similarity


def build_knn_edges(unlabeled: list[dict], labeled: list[dict], *,
                    k: int = 5, k_prime: int = 10, concurrency=4,
                    sim_fn=None):
    """Distributed edge construction → (uidx, labeled_nbrs, labeled_sims,
    unlabeled_nbrs, unlabeled_sims) per unlabeled doc. ``sim_fn`` overrides
    the default exp-BoW similarity — the metricLearning subclasses
    (pipelines/metriclearning.py) plug their LEARNED similarities in here
    (``LinearSVMMetricLearning.getSimilarity`` / ``L2RWithQueryClustering``);
    must be picklable (broadcast to the edge-builder actors)."""
    cand_ref = ray.put((unlabeled, labeled, sim_fn))

    class EdgeBuilder:
        def __init__(self):
            self.unlabeled, self.labeled, simf = ray.get(cand_ref)
            self.sim = simf or default_similarity

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {"uidx": [], "l_nbrs": [], "l_sims": [], "u_nbrs": [],
                   "u_sims": []}
            for ui in batch.column("uidx").to_pylist():
                q = self.unlabeled[ui]
                ql = BoundedTopK(k)
                for j, d in enumerate(self.labeled):
                    ql.add(self.sim(q, d), j)
                qu = BoundedTopK(k_prime)
                for j, d in enumerate(self.unlabeled):
                    if j != ui:
                        qu.add(self.sim(q, d), j)
                out["uidx"].append(ui)
                out["l_nbrs"].append([j for _, j in ql.result()])
                out["l_sims"].append([s for s, _ in ql.result()])
                out["u_nbrs"].append([j for _, j in qu.result()])
                out["u_sims"].append([s for s, _ in qu.result()])
            return pa.table({
                "uidx": pa.array(out["uidx"], pa.int64()),
                "l_nbrs": pa.array(out["l_nbrs"], pa.list_(pa.int64())),
                "l_sims": pa.array(out["l_sims"], pa.list_(pa.float64())),
                "u_nbrs": pa.array(out["u_nbrs"], pa.list_(pa.int64())),
                "u_sims": pa.array(out["u_sims"], pa.list_(pa.float64())),
            })

    idx = ray.data.from_arrow(pa.table({"uidx": pa.array(range(len(unlabeled)),
                                                         pa.int64())}))
    pdf = idx.map_batches(EdgeBuilder, batch_format="pyarrow",
                          concurrency=pool_size(concurrency),
                          num_cpus=1).to_pandas()
    return pdf.sort_values("uidx").reset_index(drop=True)


def random_walk(edges, labeled_labels: np.ndarray, clf_preds: np.ndarray, *,
                n_classes: int, alpha: float = 1.0, beta: float = 0.1,
                eta: float = 0.6, delta: float = 1e-4, max_iter: int = 50,
                weighted: bool = True, sim_weight: bool = True):
    """Iterate the reference's walk until mean |Δpred| ≤ δ. Returns
    (pred floats, hard labels via argmin |c − pred|)."""
    U = len(clf_preds)
    pred = clf_preds.astype(np.float64).copy()
    l_nbrs = [np.asarray(list(r), dtype=np.int64) for r in edges["l_nbrs"]]
    l_sims = [np.asarray(list(r), dtype=np.float64) for r in edges["l_sims"]]
    u_nbrs = [np.asarray(list(r), dtype=np.int64) for r in edges["u_nbrs"]]
    u_sims = [np.asarray(list(r), dtype=np.float64) for r in edges["u_sims"]]
    y_l = labeled_labels.astype(np.float64)

    for _ in range(max_iter):
        last = pred.copy()
        new = np.empty(U)
        for i in range(U):
            if weighted:
                wl = l_sims[i] if sim_weight else np.ones_like(l_sims[i])
                wu = u_sims[i] if sim_weight else np.ones_like(u_sims[i])
                f_l = float((wl * y_l[l_nbrs[i]]).sum())
                f_u = float((wu * last[u_nbrs[i]]).sum())
                denom = alpha * wl.sum() + beta * wu.sum()
                new[i] = (eta * (alpha * f_l + beta * f_u) / denom
                          + (1.0 - eta) * clf_preds[i]) if denom else clf_preds[i]
            else:  # majority vote (:96-131)
                scores = np.zeros(n_classes)
                for j, s in zip(u_nbrs[i], u_sims[i]):
                    lbl = int(np.argmin(np.abs(np.arange(n_classes) - last[j])))
                    scores[lbl] += (s if sim_weight else 1.0) * eta * beta
                for j, s in zip(l_nbrs[i], l_sims[i]):
                    scores[int(y_l[j])] += (s if sim_weight else 1.0) * eta * alpha
                scores[int(clf_preds[i])] += 1.0 - eta
                new[i] = float(np.argmax(scores))
        pred = new
        if float(np.abs(pred - last).mean()) <= delta:
            break
    hard = np.array([int(np.argmin(np.abs(np.arange(n_classes) - p)))
                     for p in pred])
    return pred, hard


def gaussian_fields_predict(unlabeled: list[dict], labeled: list[dict],
                            clf_preds: np.ndarray, *, n_classes: int,
                            k: int = 5, k_prime: int = 10, alpha: float = 1.0,
                            beta: float = 0.1, eta: float = 0.6,
                            delta: float = 1e-4, weighted: bool = True):
    """Full style=SEMI pipeline: distributed kNN edges → random walk."""
    edges = build_knn_edges(unlabeled, labeled, k=k, k_prime=k_prime)
    y_l = np.array([d["label"] for d in labeled])
    return random_walk(edges, y_l, np.asarray(clf_preds, dtype=np.float64),
                       n_classes=n_classes, alpha=alpha, beta=beta, eta=eta,
                       delta=delta, weighted=weighted)


def exact_propagation(edges, labeled_labels: np.ndarray, clf_preds: np.ndarray,
                      *, n_classes: int, alpha: float = 1.0, beta: float = 0.1,
                      eta: float = 0.6):
    """GaussianFields EXACT mode — the matrix-solution path
    (``GaussianFields.java:318-377``). The shipped reference code is dead:
    ``constructGraph``'s C+scale·Δ matrix body is commented out ("Currently,
    we only support random walk"), so ``test()`` would invert an empty
    matrix. The exact semantics are therefore pinned to the closed-form
    fixed point of the SAME weighted-sum update the random walk iterates
    (``updateFu``): per unlabeled node i

        f_i = η·(α·Σ_L w·y + β·Σ_U w·f)/(α·ΣwL + β·ΣwU) + (1−η)·clf_i

    rearranged to the U×U linear system (I − ηβ·D·W_UU) f = ηα·D·W_UL y +
    (1−η)·clf (D the per-row denominators) and solved directly with
    ``numpy.linalg`` — the harmonic-function solution (Zhu, Ghahramani &
    Lafferty 2003) of the reference's kNN graph. Agreement with the
    converged walk is pinned by tests/test_gaussianfields.py."""
    U = len(clf_preds)
    y_l = labeled_labels.astype(np.float64)
    A = np.eye(U)
    c = np.zeros(U)
    for i in range(U):
        l_nbrs = np.asarray(list(edges["l_nbrs"][i]), dtype=np.int64)
        l_sims = np.asarray(list(edges["l_sims"][i]), dtype=np.float64)
        u_nbrs = np.asarray(list(edges["u_nbrs"][i]), dtype=np.int64)
        u_sims = np.asarray(list(edges["u_sims"][i]), dtype=np.float64)
        denom = alpha * l_sims.sum() + beta * u_sims.sum()
        if denom == 0.0:
            c[i] = clf_preds[i]
            continue
        coef = eta / denom
        np.subtract.at(A[i], u_nbrs, coef * beta * u_sims)
        c[i] = coef * alpha * float((l_sims * y_l[l_nbrs]).sum()) \
            + (1.0 - eta) * clf_preds[i]
    pred = np.linalg.solve(A, c)
    hard = np.array([int(np.argmin(np.abs(np.arange(n_classes) - p)))
                     for p in pred])
    return pred, hard


def gaussian_fields_predict_exact(unlabeled: list[dict], labeled: list[dict],
                                  clf_preds: np.ndarray, *, n_classes: int,
                                  k: int = 5, k_prime: int = 10,
                                  alpha: float = 1.0, beta: float = 0.1,
                                  eta: float = 0.6):
    """style=SEMI exact pipeline: distributed kNN edges → direct solve.
    Small-L+U correctness anchor; the random walk is the scale path (the
    dense U×U solve is O(U³))."""
    edges = build_knn_edges(unlabeled, labeled, k=k, k_prime=k_prime)
    y_l = np.array([d["label"] for d in labeled])
    return exact_propagation(edges, y_l,
                             np.asarray(clf_preds, dtype=np.float64),
                             n_classes=n_classes, alpha=alpha, beta=beta,
                             eta=eta)
