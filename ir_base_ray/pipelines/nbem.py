"""Semi-supervised Naive Bayes with EM (SURVEY.md §2.7 R6 long tail):
``Classifier/semisupervised/NaiveBayesEM.java`` over the doc-vector
(tids/vals) representation — the reference's feature-indexed arrays
``m_pY[c]`` / ``m_Pxy[c][f]``.

Transcribed semantics:

- Docs carry ``label ≥ 0`` (reference sourceType 2, labeled) or ``label = -1``
  (sourceType 1, unlabeled).
- init (``:41-48``): an M-step at iter 0 — ONLY labeled docs contribute
  counts; unlabeled soft counts enter from iter 1 on.
- E-step (``:50-68``): per doc class log-joints
  cProb_i = pY_i + Σ_t Pxy_i[t]·x_t  (presence mode: x_t → 1); unlabeled docs
  store responsibilities r_i = exp(cProb_i − logSum) and add
  Σ_i r_i·cProb_i to the likelihood; labeled docs add cProb_{y}.
- M-step (``:70-97``): labeled docs hard counts, unlabeled docs soft counts
  weighted by r; normalisation EXACTLY as the reference —
  pY_i = ln(n_i + δ_y) − ln(Σn + δ_y·C),
  Pxy_i[j] = ln(δ_xy + s_ij) − ln(Σ_j s_ij + F·δ_xy)
  (the denominators sum the RAW counts, smoothing enters only per entry).
- Train loop (``:100-122``): iter starts at 1; converge = (last−current)/last
  with converge := 1 on the first pass; loop while iter < maxIter AND
  converge > 1e-5 (so at most maxIter−1 EM rounds). Returns the LAST E-step
  likelihood even though one more M-step has already been applied —
  reference quirk, mirrored.

Distributed execution: blocks pinned once (ray.put); each EM round runs ONE
fused remote task per block that computes the block's E-step (likelihood +
responsibilities) and immediately its M-step count partials — one cluster
round-trip per EM iteration. Driver sums partials in fixed block order
(deterministic; 1-block == serial bit-exact, pytest-pinned). The (C, F)
count partial is dense; with C small this is C·F·8 bytes per block — fine to
~10⁶ features, beyond which a sparse (class, tid, count) partial + groupby
(the A6 pattern in ``pipelines/classify.py``) is the drop-in replacement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ir_base_ray.pipelines.linear import _class_scores, _vec_block_arrays


def _joint_scores(log_py: np.ndarray, log_pxy: np.ndarray, j, v, lengths):
    """cProbs matrix (n, C): stack pY as the bias column and reuse the
    shared offset-layout scorer."""
    M = np.concatenate([log_py[:, None], log_pxy], axis=1)
    return _class_scores(M, j, v, lengths)


def nbem_block_step(tbl: pa.Table, log_py: np.ndarray, log_pxy: np.ndarray,
                    n_classes: int, n_features: int, presence: bool,
                    include_soft: bool):
    """Fused E+M partial for one block → (likelihood_part, pY_part (C,),
    Pxy_part (C, F)). ``include_soft=False`` reproduces ``MStep(·, 0)``:
    labeled counts only, no E-step likelihood."""
    C, F = n_classes, n_features
    j, v, lengths, y, _w = _vec_block_arrays(tbl)
    x = np.ones_like(v) if presence else v
    n = len(lengths)
    pY = np.zeros(C, dtype=np.float64)
    Pxy = np.zeros((C, F), dtype=np.float64)
    lik = 0.0
    if n == 0:
        return lik, pY, Pxy
    labeled = y >= 0
    doc_idx = np.repeat(np.arange(n), lengths)
    lab_pos = labeled[doc_idx]
    # hard counts from labeled docs (every M-step, including iter 0)
    np.add.at(pY, y[labeled], 1.0)
    if lab_pos.any():
        np.add.at(Pxy, (y[doc_idx][lab_pos], j[lab_pos]), x[lab_pos])
    if not include_soft:
        return lik, pY, Pxy
    # E-step: class log-joints under the current model
    S = _joint_scores(log_py, log_pxy, j, x, lengths)
    mx = S.max(axis=1)
    lse = mx + np.log(np.exp(S - mx[:, None]).sum(axis=1))
    if labeled.any():
        lik += float(S[labeled, y[labeled]].sum())
    unl = ~labeled
    if unl.any():
        R = np.exp(S[unl] - lse[unl, None])          # responsibilities
        lik += float((R * S[unl]).sum())
        pY += R.sum(axis=0)
        # soft counts: scatter val·r into (class, tid)
        unl_pos = unl[doc_idx]
        ju, xu = j[unl_pos], x[unl_pos]
        # map flat positions to rows of R
        unl_row = np.cumsum(unl) - 1                  # doc → index within unl
        ru = R[unl_row[doc_idx][unl_pos]]             # (P_u, C)
        for c in range(C):
            np.add.at(Pxy[c], ju, xu * ru[:, c])
    return lik, pY, Pxy


_block_step_remote = ray.remote(nbem_block_step)


def _normalize(pY_cnt: np.ndarray, Pxy_cnt: np.ndarray, delta_y: float,
               delta_xy: float):
    """The reference's exact normalisation (``MStep`` :89-96)."""
    C, F = Pxy_cnt.shape
    log_py = np.log(pY_cnt + delta_y) - np.log(pY_cnt.sum() + delta_y * C)
    row_sum = Pxy_cnt.sum(axis=1)
    log_pxy = (np.log(delta_xy + Pxy_cnt)
               - np.log(row_sum + F * delta_xy)[:, None])
    return log_py, log_pxy


def train_naive_bayes_em(vec_ds, *, n_classes: int, n_features: int,
                         delta_y: float = 0.1, delta_xy: float = 0.1,
                         presence: bool = False, max_iter: int = 50,
                         converge: float = 1e-5):
    """→ (log_py (C,), log_pxy (C, F), last E-step likelihood, iters run)."""
    blocks = [ray.put(b) for b in vec_ds.iter_batches(batch_format="pyarrow",
                                                      batch_size=None)]

    def run_round(log_py, log_pxy, include_soft):
        refs = [_block_step_remote.remote(
            b, log_py, log_pxy, n_classes, n_features, presence, include_soft)
            for b in blocks]
        lik = 0.0
        pY = np.zeros(n_classes, dtype=np.float64)
        Pxy = np.zeros((n_classes, n_features), dtype=np.float64)
        for l_p, py_p, pxy_p in ray.get(refs):   # fixed order: deterministic
            lik += l_p
            pY += py_p
            Pxy += pxy_p
        return lik, pY, Pxy

    # init: M-step at iter 0, labeled counts only
    _l, pY, Pxy = run_round(None, None, False)
    log_py, log_pxy = _normalize(pY, Pxy, delta_y, delta_xy)

    current, last, conv = 0.0, -1.0, 1.0
    it = 1
    while True:
        current, pY, Pxy = run_round(log_py, log_pxy, True)
        log_py, log_pxy = _normalize(pY, Pxy, delta_y, delta_xy)
        conv = 1.0 if it == 1 else (last - current) / last
        last = current
        it += 1
        if not (it < max_iter and conv > converge):
            break
    return log_py, log_pxy, last, it


def predict_naive_bayes_em(log_py: np.ndarray, log_pxy: np.ndarray, vec_ds,
                           *, presence: bool = False, id_col: str = "doc_id"):
    """Broadcast-model map_batches prediction: argmax cProbs, first max wins
    (``Utils.argmax``). → (id, pred) Dataset."""
    model_ref = ray.put((log_py, log_pxy))

    def pred(batch: pa.Table) -> pa.Table:
        lpy, lpxy = ray.get(model_ref)
        j, v, lengths, _y, _w = _vec_block_arrays(batch)
        x = np.ones_like(v) if presence else v
        S = _joint_scores(lpy, lpxy, j, x, lengths)
        preds = S.argmax(axis=1) if len(S) else np.empty(0, np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "pred": pa.array(preds.astype(np.int64), pa.int64()),
        })

    return vec_ds.map_batches(pred, batch_format="pyarrow")


# ------------------------------------------------------------ serial twin

def nbem_serial_train(tids_list, vals_list, labels, *, n_classes: int,
                      n_features: int, delta_y: float = 0.1,
                      delta_xy: float = 0.1, presence: bool = False,
                      max_iter: int = 50, converge: float = 1e-5):
    """Per-doc transcription of the reference train loop — parity oracle."""
    C, F = n_classes, n_features
    n = len(labels)
    docs = []
    for d in range(n):
        jj = np.asarray(tids_list[d], dtype=np.int64)
        vv = np.asarray(vals_list[d], dtype=np.float64)
        docs.append((jj, np.ones_like(vv) if presence else vv))
    y = np.asarray(labels, dtype=np.int64)
    sstat = np.zeros((n, C), dtype=np.float64)

    def mstep(it):
        pY = np.zeros(C)
        Pxy = np.zeros((C, F))
        for d in range(n):
            jj, xx = docs[d]
            if y[d] >= 0:
                pY[y[d]] += 1.0
                np.add.at(Pxy[y[d]], jj, xx)
            elif it > 0:
                pY += sstat[d]
                for i in range(C):
                    np.add.at(Pxy[i], jj, xx * sstat[d, i])
        return _normalize(pY, Pxy, delta_y, delta_xy)

    log_py, log_pxy = mstep(0)
    current, last, conv = 0.0, -1.0, 1.0
    it = 1
    while True:
        current = 0.0
        for d in range(n):
            jj, xx = docs[d]
            c = log_py + (log_pxy[:, jj] * xx).sum(axis=1)
            if y[d] >= 0:
                current += c[y[d]]
            else:
                mx = c.max()
                lse = mx + np.log(np.exp(c - mx).sum())
                sstat[d] = np.exp(c - lse)
                current += float(sstat[d] @ c)
        log_py, log_pxy = mstep(it)
        conv = 1.0 if it == 1 else (last - current) / last
        last = current
        it += 1
        if not (it < max_iter and conv > converge):
            break
    return log_py, log_pxy, last, it
