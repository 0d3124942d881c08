"""KMeans clustering with cosine distance (``clustering/KMeansAlg.java``,
SURVEY.md §2.7 R6 tail — the reference wraps mallet's KMeans with its
CosineDistance metric; mallet is a library dependency, so the rebuild
implements the same model: Lloyd's iterations, cosine distance
1 − (a·b)/(‖a‖‖b‖), cluster means as centroids, assign-to-closest predict
with first-minimum tie-break like ``predict`` :71-85).

Determinism (SURVEY §7 policy): mallet's random init is replaced by seeded
k-means++ (numpy Philox).

Distributed shape (T5): doc-vector blocks pinned once; per iteration the
dense K×V centroid matrix broadcasts (``ray.put``) and one ``@ray.remote``
task per block returns (per-cluster vector sums, counts, assignment hash);
the driver merges partials in fixed block order and recomputes means —
the combiner-before-shuffle aggregation pattern, no per-doc driver work.
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
    lengths = np.asarray(pa.compute.list_value_length(tids), dtype=np.int64)
    j = tids.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    v = vals.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    ids = tbl.column("doc_id").to_numpy()
    return ids, j, v, lengths


def _assign(j, v, lengths, centroids):
    """Per-doc closest centroid under cosine distance (first min wins)."""
    n = len(lengths)
    doc_idx = np.repeat(np.arange(n), lengths)
    c_norm = np.sqrt((centroids ** 2).sum(axis=1))
    c_norm[c_norm == 0] = 1.0
    d_norm = np.sqrt(np.bincount(doc_idx, weights=v * v, minlength=n))
    d_norm[d_norm == 0] = 1.0
    K = centroids.shape[0]
    sims = np.empty((n, K))
    for k in range(K):
        dots = np.bincount(doc_idx, weights=centroids[k, j] * v, minlength=n)
        sims[:, k] = dots / (d_norm * c_norm[k])
    # distance = 1 − cos; argmin distance = argmax cos, FIRST max wins
    return sims.argmax(axis=1)


@ray.remote
def _kmeans_block(tbl: pa.Table, centroids, V: int):
    """One block's partials: (K×V cluster sums, K counts, assignments)."""
    _ids, j, v, lengths, = _block_arrays(tbl)
    K = centroids.shape[0]
    assign = _assign(j, v, lengths, centroids)
    sums = np.zeros((K, V))
    doc_idx = np.repeat(np.arange(len(lengths)), lengths)
    np.add.at(sums, (assign[doc_idx], j), v)
    counts = np.bincount(assign, minlength=K).astype(np.int64)
    return sums, counts, assign


def _kmeanspp_init(vecs_dense: np.ndarray, k: int, rng) -> np.ndarray:
    """Seeded k-means++ over a dense sample (cosine distance)."""
    n = len(vecs_dense)
    norms = np.sqrt((vecs_dense ** 2).sum(axis=1))
    norms[norms == 0] = 1.0
    unit = vecs_dense / norms[:, None]
    first = int(rng.integers(0, n))
    chosen = [first]
    d2 = 1.0 - unit @ unit[first]
    for _ in range(1, k):
        p = np.maximum(d2, 0)
        tot = p.sum()
        nxt = int(rng.choice(n, p=p / tot)) if tot > 0 else int(rng.integers(0, n))
        chosen.append(nxt)
        d2 = np.minimum(d2, 1.0 - unit @ unit[nxt])
    return vecs_dense[chosen].copy()


def train_kmeans(vec_ds, *, k: int, vocab_size: int, n_iters: int = 20,
                 seed: int = 19, init_sample: int = 512):
    """vectors Dataset (doc_id, tids, vals) → dict with ``centroids`` (K×V),
    per-block ``assignments`` and the per-iteration moved-count trace."""
    V = vocab_size
    blocks = [ray.put(b) for b in vec_ds.iter_batches(batch_format="pyarrow",
                                                      batch_size=None)]
    # seeded init from the first blocks' docs (deterministic sample)
    rng = np.random.default_rng(seed)
    sample = []
    for b in blocks:
        _ids, j, v, lengths = _block_arrays(ray.get(b))
        off = 0
        starts = np.concatenate(([0], np.cumsum(lengths)))
        for d in range(len(lengths)):
            row = np.zeros(V)
            row[j[starts[d]:starts[d + 1]]] = v[starts[d]:starts[d + 1]]
            sample.append(row)
            if len(sample) >= init_sample:
                break
        if len(sample) >= init_sample:
            break
    centroids = _kmeanspp_init(np.array(sample), k, rng)

    prev = None
    trace = []
    for _ in range(n_iters):
        c_ref = ray.put(centroids)
        outs = ray.get([_kmeans_block.remote(b, c_ref, V) for b in blocks])
        sums = np.zeros((k, V))
        counts = np.zeros(k, dtype=np.int64)
        assigns = []
        for s, c, a in outs:              # fixed block order: deterministic
            sums += s
            counts += c
            assigns.append(a)
        flat = np.concatenate(assigns) if assigns else np.empty(0, np.int64)
        moved = int((flat != prev).sum()) if prev is not None else len(flat)
        trace.append(moved)
        nz = counts > 0
        centroids[nz] = sums[nz] / counts[nz][:, None]  # empty keeps old mean
        if prev is not None and moved == 0:
            break
        prev = flat
    return {"centroids": centroids, "assignments": assigns, "trace": trace}


def kmeans_serial(tids_list, vals_list, *, k: int, vocab_size: int,
                  n_iters: int = 20, seed: int = 19, init_sample: int = 512):
    """Serial twin (same init, per-doc loops) for the parity test."""
    V = vocab_size
    dense = np.zeros((len(tids_list), V))
    for d, (jj, vv) in enumerate(zip(tids_list, vals_list)):
        dense[d, np.asarray(jj, dtype=np.int64)] = np.asarray(vv, dtype=np.float64)
    rng = np.random.default_rng(seed)
    centroids = _kmeanspp_init(dense[:init_sample], k, rng)
    prev = None
    for _ in range(n_iters):
        c_norm = np.sqrt((centroids ** 2).sum(axis=1))
        c_norm[c_norm == 0] = 1.0
        d_norm = np.sqrt((dense ** 2).sum(axis=1))
        d_norm[d_norm == 0] = 1.0
        sims = (dense @ centroids.T) / d_norm[:, None] / c_norm[None, :]
        assign = sims.argmax(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                centroids[c] = dense[m].mean(axis=0)
        if prev is not None and (assign == prev).all():
            break
        prev = assign
    return {"centroids": centroids, "assignments": assign}


def kmeans_dense_cosine(X: np.ndarray, *, k: int, n_iters: int = 20,
                        seed: int = 3):
    """KMeansAlg4Vct (``clustering/KMeansAlg4Vct.java``): cosine-distance
    k-means over DENSE vectors — the reference clusters each user's learned
    SVM weight vector (columns of ``m_weights``) to feed
    MultiTaskSVMWithClusters / L2RWithQueryClustering. Same seeded
    k-means++ init policy as the sparse path; rows of ``X`` are the
    instances. Returns (assignments, centroids)."""
    X = np.asarray(X, dtype=np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    Xn = X / norms
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))
    n = X.shape[0]
    k = min(k, n)
    # k-means++ on cosine distance (1 − sim)
    centers = [Xn[int(rng.integers(0, n))]]
    for _ in range(1, k):
        d = np.min(np.stack([1.0 - Xn @ c for c in centers]), axis=0)
        d = np.maximum(d, 0.0)
        tot = d.sum()
        probs = d / tot if tot > 0 else np.full(n, 1.0 / n)
        centers.append(Xn[int(rng.choice(n, p=probs))])
    C = np.stack(centers)
    assign = np.zeros(n, dtype=np.int64)
    for _ in range(n_iters):
        sims = Xn @ C.T
        new_assign = sims.argmax(axis=1)
        if (new_assign == assign).all() and _ > 0:
            break
        assign = new_assign
        for c in range(k):
            m = assign == c
            if m.any():
                v = Xn[m].mean(axis=0)
                nv = np.linalg.norm(v)
                C[c] = v / nv if nv else v
    return assign, C
