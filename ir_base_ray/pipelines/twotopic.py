"""twoTopic model (``topicmodels/twoTopic.java``): per-document single-topic
EM against the corpus background language model. Each doc's word
distribution is modelled as λ·bg + (1−λ)·θ_d; θ_d is estimated per doc by
EM — there is NO corpus-level training (``initialize_probability`` is
empty), which makes the whole model one embarrassingly-parallel
``map_batches`` stage over the doc vectors with the background LM broadcast
once.

Transcribed semantics:

- background (``_Corpus.getBackgroundProb`` :161-177): bg_w =
  (1 + TTF_w) / (ΣTTF + V) — add-one smoothing over corpus TTF (A2 stats).
- init (``initTestDoc`` + ``Utils.randomize`` :405-415): θ = normalize(β +
  U[0,1) per vocab entry) — full-vocab draws, so the normaliser depends on
  every entry; the reference's unseeded ``Math.random`` is a per-doc seeded
  Philox stream (SURVEY §7 determinism policy).
- E-step (:54-62): sstat_w = c(w,d)·(1−λ)θ_w / ((1−λ)θ_w + λ·bg_w);
  loglik = Σ c(w,d)·log(λ·bg_w + (1−λ)θ_w) with the PRE-update θ.
- M-step (:65-70): θ_w = (β−1+sstat_w) / (Σsstat + V·(β−1)); entries outside
  the doc get the bare smoothing mass (β−1)/denominator — they never feed
  back into the doc's E-step, so only the doc's own support is materialised
  after init.
- loop (``TopicModel.inference``): do E,M while |(last−cur)/last| > converge
  and iters < max (last starts at 1; at least one round runs).

Defaults per ``mains/TopicModelMain.java:73-77``: λ=0.9, β=1.001,
converge=1e-9, 50 iterations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def background_prob(ttf: np.ndarray) -> np.ndarray:
    """bg_w = (1 + TTF_w) / (ΣTTF + V)."""
    return (1.0 + ttf) / (ttf.sum() + len(ttf))


def two_topic_doc(jj: np.ndarray, vv: np.ndarray, bg: np.ndarray, *,
                  lam: float = 0.9, beta: float = 1.001,
                  converge: float = 1e-9, n_iters: int = 50,
                  rng: np.random.Generator):
    """One doc's EM → (theta over the doc's terms, loglik, iters run)."""
    V = len(bg)
    init = beta + rng.random(V)
    theta_d = init[jj] / init.sum()           # only the doc support is kept
    bg_d = bg[jj]
    smooth = V * (beta - 1.0)
    last, current = 1.0, 0.0
    i = 0
    while True:
        s = (1.0 - lam) * theta_d
        sstat = vv * s / (s + lam * bg_d)
        current = float((vv * np.log(lam * bg_d + s)).sum())
        denom = sstat.sum() + smooth
        theta_d = (beta - 1.0 + sstat) / denom
        delta = (last - current) / last
        last = current
        i += 1
        if not (abs(delta) > converge and i < n_iters):
            break
    return theta_d, current, i


def two_topic_stage(vec_ds, ttf: np.ndarray, *, lam: float = 0.9,
                    beta: float = 1.001, converge: float = 1e-9,
                    n_iters: int = 50, seed: int = 23,
                    id_col: str = "doc_id"):
    """Dataset (doc_id, tids, vals) → Dataset (doc_id, loglik, iters,
    top_tid, top_theta). Background broadcast once; per-doc EM inside
    map_batches (stateless, no shuffle)."""
    bg_ref = ray.put(background_prob(np.asarray(ttf, dtype=np.float64)))

    def run(batch: pa.Table) -> pa.Table:
        bg = ray.get(bg_ref)
        ids = batch.column(id_col).to_pylist()
        tids_col = batch.column("tids").to_pylist()
        vals_col = batch.column("vals").to_pylist()
        ll_out, it_out, top_tid, top_theta = [], [], [], []
        for did, jj, vv in zip(ids, tids_col, vals_col):
            jj = np.asarray(jj, dtype=np.int64)
            vv = np.asarray(vv, dtype=np.float64)
            rng = np.random.Generator(np.random.Philox(
                key=seed, counter=[int(did), 0, 0, 0]))
            if len(jj) == 0:
                ll_out.append(0.0)
                it_out.append(0)
                top_tid.append(-1)
                top_theta.append(0.0)
                continue
            theta_d, ll, it = two_topic_doc(
                jj, vv, bg, lam=lam, beta=beta, converge=converge,
                n_iters=n_iters, rng=rng)
            b = int(np.argmax(theta_d))       # first max wins (Utils.argmax)
            ll_out.append(ll)
            it_out.append(it)
            top_tid.append(int(jj[b]))
            top_theta.append(float(theta_d[b]))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "loglik": pa.array(ll_out, pa.float64()),
            "iters": pa.array(it_out, pa.int64()),
            "top_tid": pa.array(top_tid, pa.int64()),
            "top_theta": pa.array(top_theta, pa.float64()),
        })

    return vec_ds.map_batches(run, batch_format="pyarrow")
