"""pLSA with background language model — the reference's core topic model
(``topicmodels/pLSA/pLSA.java:110-260``) re-expressed for Ray.

Semantics transcribed exactly:
- background model p(w|θ_B) ∝ (β−1) + Σ_d tf(w,d), L1-normalized (:115-122);
- per-iteration reset: word-topic sstat = (β−1) pseudo counts, doc sstat =
  (α−1) (:153-162);
- E-step per posting (:173-200): s = Σ_k θ_dk φ_kj, background posterior
  propB = λ·bg_j / (λ·bg_j + (1−λ)s), expectation
  exp_k = v·(1−propB)·θ_dk·φ_kj / s accumulated into BOTH doc and corpus
  sstats;
- M-step (:204-215): φ_k ∝ corpus sstat row, θ_d ∝ doc sstat (:230-237);
- log-likelihood (:245-258): Σ tf·log(λ·bg + (1−λ)·Σ_k θφ) + (α−1)Σlog θ.

Architecture (SURVEY.md §2.5 A7, §2.3 T5): the EM loop is the ONE place the
Dataset API genuinely can't express the shape — each iteration needs (a)
per-doc θ carried across rounds and (b) a corpus-level K×V sufficient
statistic from the same pass. So document blocks are pinned in the object
store once (``ray.put`` per block), and each round runs one
``@ray.remote`` E-step task per block: in (block, θ_block, φ ref) → out
(θ'_block, K×V partial). The driver sums the tiny partials in fixed block
order (deterministic) and row-normalizes — exactly the reference's
worker-accumulate / driver-``accumluateStats`` design
(``topicmodels/multithreads/TopicModel_worker.java:52-102``), with the
shared-memory sstat replaced by per-task partials. Broadcast φ is one
``ray.put`` per round (T5).

Determinism fix (SURVEY.md §7): the reference randomizes φ with an unseeded
``Math.random``; here init is a seeded numpy Gumbel-free uniform.

The reference's worker classes (``topicmodels/multithreads/pLSA/pLSA_multithread.java``, ``TopicModelWorker.java``, ``updateParam_worker.java``) correspond to the per-block partial-sstat remotes here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _block_arrays(tbl: pa.Table):
    tids = tbl.column("tids")
    vals = tbl.column("vals")
    tids = tids.combine_chunks() if isinstance(tids, pa.ChunkedArray) else tids
    vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
    lengths = np.asarray(pa.compute.list_value_length(tids))
    return (tids.flatten().to_numpy(zero_copy_only=False).astype(np.int64),
            vals.flatten().to_numpy(zero_copy_only=False).astype(np.float64),
            lengths)


@ray.remote
def _estep_block(tbl: pa.Table, theta: np.ndarray, phi_ref, bg, lam: float,
                 alpha: float, beta_pseudo_unused: float, K: int, V: int,
                 doc_prior=None):
    """One E-step over one pinned block: returns (θ', K×V partial, loglik).
    ``doc_prior`` (n_docs×K), when given, replaces the scalar (α−1) doc
    pseudo-count — the pLSAGroup device (``pLSAGroup.enforceGroupPrior``:
    each doc's sstat is seeded with its group's averaged θ)."""
    phi = phi_ref  # ray resolves the ObjectRef argument to the array
    j, v, lengths = _block_arrays(tbl)
    doc_idx = np.repeat(np.arange(len(lengths)), lengths)

    phi_cols = phi[:, j].T                      # (P, K)
    th = theta[doc_idx]                         # (P, K)
    s = (th * phi_cols).sum(axis=1)             # Σ_k θ_dk φ_kj
    s[s == 0] = 1e-300
    pb_num = lam * bg[j]
    prop_b = pb_num / (pb_num + (1.0 - lam) * s)
    scale = v * (1.0 - prop_b) / s              # (P,)
    expect = (scale[:, None] * th * phi_cols)   # (P, K)

    # doc sstat: (α−1) pseudo (or the group prior) + per-doc segment sum
    starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    doc_sstat = np.add.reduceat(expect, starts, axis=0) if len(lengths) else \
        np.zeros((0, K))
    doc_sstat = doc_sstat + ((alpha - 1.0) if doc_prior is None else doc_prior)
    new_theta = doc_sstat / doc_sstat.sum(axis=1, keepdims=True)

    # corpus partial: scatter-add expectations into K×V
    partial = np.zeros((K, V), dtype=np.float64)
    np.add.at(partial.T, j, expect)

    # log-likelihood under CURRENT (θ, φ) — reference order (:245-258)
    prob = (1.0 - lam) * s + lam * bg[j]
    ll = float((v * np.log(prob)).sum() + ((alpha - 1.0) * np.log(theta)).sum())
    return new_theta, partial, ll


def train_plsa(analyzed_ds, *, n_topics: int, vocab_size: int, n_iters: int = 20,
               lam: float = 0.9, alpha: float = 1.05, beta: float = 1.01,
               seed: int = 7):
    """analyzed vectors Dataset (doc_id, tids:list<int64>, vals:list<double>)
    → dict with φ (K×V ``topic_term``), background model, per-block θ list and
    the log-likelihood trace. See module docstring for the exact reference
    semantics and the A7 execution shape."""
    K, V = n_topics, vocab_size
    blocks = [ray.put(b) for b in analyzed_ds.iter_batches(batch_format="pyarrow",
                                                           batch_size=None)]

    # background model: (β−1) + Σ tf per term, L1-normalized  (:115-122)
    bg = np.full(V, beta - 1.0)
    doc_counts = []
    for b in blocks:
        tbl = ray.get(b)
        j, v, lengths = _block_arrays(tbl)
        np.add.at(bg, j, v)
        doc_counts.append(len(lengths))
    bg = bg / bg.sum()

    rng = np.random.default_rng(seed)
    sstat = rng.random((K, V)) + (beta - 1.0)   # seeded analog of randomize()
    phi = sstat / sstat.sum(axis=1, keepdims=True)
    thetas = [np.full((n, K), 1.0 / K) for n in doc_counts]

    trace = []
    for _ in range(n_iters):
        phi_ref = ray.put(phi)
        outs = ray.get([
            _estep_block.remote(b, thetas[i], phi_ref, bg, lam, alpha, beta, K, V)
            for i, b in enumerate(blocks)
        ])
        # driver-side accumulate in fixed block order (deterministic)
        sstat = np.full((K, V), beta - 1.0)
        ll = 0.0
        for i, (new_theta, partial, block_ll) in enumerate(outs):
            thetas[i] = new_theta
            sstat += partial
            ll += block_ll
        phi = sstat / sstat.sum(axis=1, keepdims=True)
        trace.append(ll)

    return {"topic_term": phi, "background": bg, "thetas": thetas,
            "loglik_trace": trace}


def plsa_reference_serial(tids_list, vals_list, *, n_topics: int, vocab_size: int,
                          n_iters: int = 20, lam: float = 0.9, alpha: float = 1.05,
                          beta: float = 1.01, seed: int = 7):
    """Serial oracle: same formulas, plain per-doc loops (the shape of the
    reference's single-threaded EM) — used by tests to pin the distributed
    implementation."""
    K, V = n_topics, vocab_size
    bg = np.full(V, beta - 1.0)
    for j, v in zip(tids_list, vals_list):
        np.add.at(bg, np.asarray(j), np.asarray(v, dtype=np.float64))
    bg = bg / bg.sum()

    rng = np.random.default_rng(seed)
    sstat = rng.random((K, V)) + (beta - 1.0)
    phi = sstat / sstat.sum(axis=1, keepdims=True)
    theta = np.full((len(tids_list), K), 1.0 / K)

    trace = []
    for _ in range(n_iters):
        new_sstat = np.full((K, V), beta - 1.0)
        new_theta = np.empty_like(theta)
        ll = 0.0
        for d, (jj, vv) in enumerate(zip(tids_list, vals_list)):
            jj = np.asarray(jj)
            vv = np.asarray(vv, dtype=np.float64)
            s = theta[d] @ phi[:, jj]
            s[s == 0] = 1e-300
            prop_b = lam * bg[jj] / (lam * bg[jj] + (1 - lam) * s)
            expect = (vv * (1 - prop_b) / s)[None, :] * (theta[d][:, None] * phi[:, jj])
            dst = expect.sum(axis=1) + (alpha - 1.0)
            new_theta[d] = dst / dst.sum()
            np.add.at(new_sstat.T, jj, expect.T)
            ll += float((vv * np.log((1 - lam) * s + lam * bg[jj])).sum())
            ll += float(((alpha - 1.0) * np.log(theta[d])).sum())
        theta = new_theta
        phi = new_sstat / new_sstat.sum(axis=1, keepdims=True)
        trace.append(ll)
    return {"topic_term": phi, "theta": theta, "loglik_trace": trace}


def train_plsa_group(analyzed_ds, *, n_topics: int, vocab_size: int,
                     group_col: str = "group", n_iters: int = 20,
                     lam: float = 0.9, alpha: float = 1.05,
                     beta: float = 1.01, seed: int = 7):
    """pLSAGroup (``topicmodels/pLSA/pLSAGroup.java``): pLSA whose per-doc
    topic prior is re-derived EVERY iteration from the doc's group —
    ``enforceGroupPrior`` (:29-45): prior_g = ((α−1) + Σ_{d∈g} θ_d)/(1+|g|),
    seeded into each group member's sstat before the E-step accumulates.

    Execution shape: identical to :func:`train_plsa` (pinned blocks, one
    φ broadcast + partial merge per iteration); the group priors are a
    driver-side reduction over the small per-block θ matrices keyed by the
    blocks' group-id arrays (θ is n_docs×K — group state never touches the
    token stream). The reference requires group members adjacent in train
    order; here groups may span blocks freely."""
    import pyarrow.compute as pc

    K, V = n_topics, vocab_size
    blocks, group_arrs = [], []
    for b in analyzed_ds.iter_batches(batch_format="pyarrow",
                                      batch_size=None):
        blocks.append(ray.put(b.drop_columns([group_col])))
        col = b.column(group_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        group_arrs.append(np.asarray(col.to_pylist(), dtype=object))

    # global group index
    all_groups = sorted({g for arr in group_arrs for g in arr})
    gid = {g: i for i, g in enumerate(all_groups)}
    gidx = [np.array([gid[g] for g in arr], dtype=np.int64)
            for arr in group_arrs]
    n_groups = len(all_groups)
    group_sizes = np.zeros(n_groups)
    for arr in gidx:
        np.add.at(group_sizes, arr, 1.0)

    bg = np.full(V, beta - 1.0)
    doc_counts = []
    for b in blocks:
        tbl = ray.get(b)
        j, v, _lengths = _block_arrays(tbl)
        np.add.at(bg, j, v)
        doc_counts.append(tbl.num_rows)
    bg = bg / bg.sum()

    rng = np.random.default_rng(seed)
    sstat = rng.random((K, V)) + (beta - 1.0)
    phi = sstat / sstat.sum(axis=1, keepdims=True)
    thetas = [np.full((n, K), 1.0 / K) for n in doc_counts]

    trace = []
    for _ in range(n_iters):
        # enforceGroupPrior from the CURRENT θs
        gsum = np.full((n_groups, K), alpha - 1.0)
        for th, arr in zip(thetas, gidx):
            np.add.at(gsum, arr, th)
        gprior = gsum / (1.0 + group_sizes)[:, None]
        phi_ref = ray.put(phi)
        outs = ray.get([
            _estep_block.remote(b, thetas[i], phi_ref, bg, lam, alpha, beta,
                                K, V, gprior[gidx[i]])
            for i, b in enumerate(blocks)
        ])
        sstat = np.full((K, V), beta - 1.0)
        ll = 0.0
        for i, (new_theta, partial, block_ll) in enumerate(outs):
            thetas[i] = new_theta
            sstat += partial
            ll += block_ll
        phi = sstat / sstat.sum(axis=1, keepdims=True)
        trace.append(ll)

    return {"topic_term": phi, "background": bg, "thetas": thetas,
            "groups": all_groups, "group_prior": gprior,
            "loglik_trace": trace}
