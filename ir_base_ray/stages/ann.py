"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k — per-batch numpy matmul against a
  broadcast query matrix (``ray.put`` once, read per actor), per-batch local
  top-k, driver merge of tiny partials. Scales linearly; the baseline.
- lsh_topk: random-hyperplane LSH — bucket signature per vector, candidates
  share a signature prefix with the query; the 10^12-scale path (probes only
  matching buckets). Exactness is traded for bucket recall; verified against
  brute force in tests on recall.
- embedding_near_dup: all-pairs near-duplicate detection via the same LSH
  bucketing + exact cosine verify within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ir_base_ray.perf import pool_size


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(batch)
    return flat.reshape(n, -1)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.sqrt((m * m).sum(axis=1, keepdims=True))
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceScorer:
    """Actor: holds the normalized query matrix (broadcast ref resolved once);
    per batch emits (query_id, vec_id, cosine) local top-k rows."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id", vec_col: str = "embedding"):
        self.q_ids, q_mat = ray.get(queries_ref)
        self.q = _normalize_rows(q_mat)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        # grow-only per-actor scratch (BASELINE.md §8: fresh batch-sized
        # anonymous allocations pay the host fault wall under concurrency)
        self._bufs: dict[str, np.ndarray] = {}

    def _scr(self, name: str, shape: tuple) -> np.ndarray:
        need = 1
        for s in shape:
            need *= int(s)
        buf = self._bufs.get(name)
        if buf is None or buf.size < need:
            buf = np.empty(max(need, 1024), np.float64)
            self._bufs[name] = buf
        return buf[:need].reshape(shape)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        raw = _batch_matrix(batch, self.vec_col)
        m = self._scr("m", raw.shape)
        np.copyto(m, raw)
        sq = self._scr("sq", raw.shape)
        np.multiply(m, m, out=sq)
        # same pairwise-summation reduction as _normalize_rows (bit-exact)
        norms = np.sqrt(sq.sum(axis=1, keepdims=True))
        norms[norms == 0] = 1.0
        m /= norms
        sims = self._scr("sims", (self.q.shape[0], m.shape[0]))
        np.matmul(self.q, m.T, out=sims)  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, k - 1)[:k]
            out_q.append(np.full(k, self.q_ids[qi], dtype=np.int64))
            out_v.append(ids[top])
            out_s.append(row[top])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            self.id_col: pa.array(np.concatenate(out_v), pa.int64()),
            "cosine": pa.array(np.concatenate(out_s), pa.float64()),
        })


def brute_force_topk(ds, query_ids: np.ndarray, query_mat: np.ndarray, k: int = 10,
                     *, id_col: str = "vec_id", vec_col: str = "embedding",
                     concurrency=4) -> pd.DataFrame:
    """Exact cosine top-k for each query vector. Returns a small pandas frame
    (query_id, vec_id, cosine, rank) — per-batch partial top-k in actors,
    final merge on the driver (k × n_queries rows only)."""
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), np.asarray(query_mat, dtype=np.float64)))
    partial = ds.map_batches(
        BruteForceScorer,
        fn_constructor_kwargs={"queries_ref": ref, "k": k, "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow", concurrency=pool_size(concurrency), num_cpus=1,
    ).to_pandas()
    out = []
    for qid, g in partial.groupby("query_id"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        out.append(g)
    return pd.concat(out, ignore_index=True) if out else partial


class HyperplaneLSH:
    """Random-hyperplane signatures: sign bits of V·H for seeded H."""

    def __init__(self, dim: int, n_bits: int = 16, seed: int = 5):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits))

    def signature(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes) > 0
        out = np.zeros(mat.shape[0], dtype=np.int64)
        for b in range(bits.shape[1]):
            out |= bits[:, b].astype(np.int64) << b
        return out


def lsh_bucket_dataset(ds, *, dim: int, n_bits: int = 12, seed: int = 5,
                       id_col: str = "vec_id", vec_col: str = "embedding"):
    """Append an LSH bucket column (stateful actor holds the plane matrix)."""

    class Bucketer:
        def __init__(self):
            self.lsh = HyperplaneLSH(dim, n_bits, seed)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize_rows(_batch_matrix(batch, vec_col))
            return batch.append_column("bucket", pa.array(self.lsh.signature(m), pa.int64()))

    return ds.map_batches(Bucketer, batch_format="pyarrow", concurrency=pool_size(2), num_cpus=1)


def multi_lsh_bucket_dataset(ds, *, dim: int, n_bits: int = 8, n_tables: int = 8,
                             seed: int = 5, id_col: str = "vec_id",
                             vec_col: str = "embedding"):
    """n_tables independent hyperplane tables (seeds seed..seed+n_tables−1);
    each row is emitted once per table with a table-tagged bucket id, so ONE
    downstream groupby covers all tables. Recall ≈ 1−(1−p^n_bits)^n_tables."""

    class MultiBucketer:
        def __init__(self):
            self.tables = [HyperplaneLSH(dim, n_bits, seed + t) for t in range(n_tables)]

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize_rows(_batch_matrix(batch, vec_col))
            parts = []
            for t, lsh in enumerate(self.tables):
                sig = lsh.signature(m) | (np.int64(t) << n_bits)
                parts.append(batch.append_column("bucket", pa.array(sig, pa.int64())))
            return pa.concat_tables(parts)

    return ds.map_batches(MultiBucketer, batch_format="pyarrow", concurrency=pool_size(2), num_cpus=1)


def embedding_near_dup(ds, *, dim: int, threshold: float = 0.95, n_bits: int = 10,
                       n_tables: int = 1, seed: int = 5, id_col: str = "vec_id",
                       vec_col: str = "embedding"):
    """Embedding-cosine near-dup pairs: LSH bucket groupby → exact cosine
    within buckets → pairs with cosine ≥ threshold (cosine rounded to 6 before
    the cut so the boundary matches the exact oracle); multi-table recall via
    n_tables>1 with a final (id_a, id_b) max-dedup groupby."""
    if n_tables > 1:
        bucketed = multi_lsh_bucket_dataset(ds, dim=dim, n_bits=n_bits, n_tables=n_tables,
                                            seed=seed, id_col=id_col, vec_col=vec_col)
    else:
        bucketed = lsh_bucket_dataset(ds, dim=dim, n_bits=n_bits, seed=seed,
                                      id_col=id_col, vec_col=vec_col)

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        id_dtype = group[id_col].dtype
        if len(group) < 2:
            # typed empty frame: keeps block schemas consistent (an untyped
            # empty frame would default id columns to float64)
            return pd.DataFrame({"id_a": pd.Series([], dtype=id_dtype),
                                 "id_b": pd.Series([], dtype=id_dtype),
                                 "cosine": pd.Series([], dtype="float64")})
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        mat = _normalize_rows(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        r = np.round(sims[ia, ib], 6)
        keep = r >= threshold
        return pd.DataFrame({
            "id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "cosine": r[keep],
        })

    pairs = bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")
    if n_tables > 1:
        from ray.data.aggregate import Max

        pairs = pairs.groupby(["id_a", "id_b"]).aggregate(Max("cosine", alias_name="cosine"))
    return pairs


class _BlockPairScorer:
    """Actor: broadcast (ids, normalized matrix) resolved once; each batch
    computes its block-row of the N×N cosine matrix — a blocked O(N²/P)
    exact cross product distributed over the batches."""

    def __init__(self, all_ref, threshold: float, id_col: str, vec_col: str):
        self.all_ids, self.all_mat = ray.get(all_ref)
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        m = _normalize_rows(_batch_matrix(batch, self.vec_col))
        r = np.round(m @ self.all_mat.T, 6)
        ia, ib = np.nonzero(r >= self.threshold)
        keep = ids[ia] < self.all_ids[ib]  # emit each unordered pair once
        return pa.table({
            "id_a": pa.array(ids[ia][keep], pa.int64()),
            "id_b": pa.array(self.all_ids[ib][keep], pa.int64()),
            "cosine": pa.array(r[ia, ib][keep], pa.float64()),
        })


def exact_near_dup(ds, *, threshold: float = 0.45, id_col: str = "vec_id",
                   vec_col: str = "embedding", concurrency=4):
    """Exact all-pairs near-dup (the correctness anchor for the LSH path):
    gather the table once, ``ray.put`` it, stream the same table through a
    block-row scorer. Small/medium-scale exact path — at 10^12 vectors use
    :func:`embedding_near_dup`. Cosine rounded to 6 BEFORE the threshold cut
    (mirrors the DuckDB oracle's round-then-filter)."""
    pdf = ds.to_pandas()
    ids = pdf[id_col].to_numpy().astype(np.int64)
    mat = _normalize_rows(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((ids, mat))
    return ds.map_batches(
        _BlockPairScorer,
        fn_constructor_kwargs={"all_ref": ref, "threshold": threshold,
                               "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow", concurrency=pool_size(concurrency), num_cpus=1,
    )


# -------------------------------------------------------------- IVF top-k

def assign_ivf_clusters(ds, centroids: np.ndarray, *, vec_col: str = "embedding",
                        out_col: str = "ivf_cluster", concurrency=2):
    """Persist each vector's coarse-quantizer cell as a column — computed
    ONCE per corpus (broadcast centroid matrix, one matmul+argmax per batch)
    and reused by every probe-restricted scan. At crawl scale this column is
    the partitioning key for a cluster-keyed shuffle/layout."""
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    class ClusterAssign:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize_rows(_batch_matrix(batch, vec_col))
            cl = (m @ self.cent.T).argmax(axis=1)
            return batch.append_column(out_col,
                                       pa.array(cl.astype(np.int64), pa.int64()))

    return ds.map_batches(ClusterAssign, batch_format="pyarrow",
                          concurrency=pool_size(concurrency), num_cpus=1)


def ivf_topk(ds, query_ids: np.ndarray, query_mat: np.ndarray, *, k: int = 10,
             n_clusters: int = 16, n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 19,
             kmeans_iters: int = 10) -> pd.DataFrame:
    """IVF (inverted-file) approximate cosine top-k — the coarse-quantizer
    scale path for ANN (public design: IVF-Flat; the brute-force scan is the
    verified baseline, `brute_force_topk`). Built from this repo's own
    pieces:

    1. coarse quantizer: cosine KMeans over the embeddings
       (`pipelines/kmeans.train_kmeans` — distributed per-block partials);
    2. cluster id persisted as a column (:func:`assign_ivf_clusters` —
       computed once, never per scorer call);
    3. each query probes its ``n_probe`` nearest centroids (driver-side:
       the centroid table is tiny); the probe table is inverted once per
       actor into cluster → probing-query lists;
    4. scoring: ONE map_batches pass — each batch is cluster-sorted and
       each present cell's slice is matmul'd ONLY against the queries
       probing that cell, so per-batch FLOPs are
      ``rows × n_queries × n_probe / n_clusters`` (true inverted-file
       pruning, not post-hoc masking); per-query partial top-k is selected
       by (cosine desc, id asc) — deterministic under ties;
    5. driver merge identical to brute_force_topk (score desc, vec_id asc).

    At 10^12 scale the persisted cluster column becomes the shuffle /
    layout key so a probe touches only its cells' partitions; the one-pass
    cluster-sorted form keeps bench scale to a single scan. Recall vs the
    exact baseline is pinned by tests/test_capability.py; full probing
    (n_probe == n_clusters) is provably exact and hash-checked."""
    from ir_base_ray.pipelines.kmeans import train_kmeans

    q_ids = np.asarray(query_ids, dtype=np.int64)
    q_mat = np.asarray(query_mat, dtype=np.float64)
    dim = q_mat.shape[1]

    def to_sparse(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch, vec_col)
        n = len(batch)
        return pa.table({
            "doc_id": batch.column(id_col),
            "tids": pa.array([list(range(dim))] * n, pa.list_(pa.int64())),
            "vals": pa.array([row.tolist() for row in m], pa.list_(pa.float64())),
        })

    vec_ds = ds.map_batches(to_sparse, batch_format="pyarrow")
    km = train_kmeans(vec_ds, k=n_clusters, vocab_size=dim,
                      n_iters=kmeans_iters, seed=seed)
    centroids = _normalize_rows(km["centroids"])
    qn = _normalize_rows(q_mat)
    probe = np.argsort(-(qn @ centroids.T), axis=1, kind="stable")[:, :n_probe]
    state_ref = ray.put((q_ids, qn, probe, n_clusters))

    class IVFScorer:
        def __init__(self):
            self.q_ids, self.q, probe_tbl, n_cells = ray.get(state_ref)
            # inverted probe lists: cell -> indices of queries probing it
            self.queries_of = [np.nonzero((probe_tbl == c).any(axis=1))[0]
                               for c in range(n_cells)]
            self._bufs: dict[str, np.ndarray] = {}

        def _scr(self, name: str, shape: tuple) -> np.ndarray:
            need = 1
            for s in shape:
                need *= int(s)
            buf = self._bufs.get(name)
            if buf is None or buf.size < need:
                buf = np.empty(max(need, 1024), np.float64)
                self._bufs[name] = buf
            return buf[:need].reshape(shape)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy()
            cl = batch.column("ivf_cluster").to_numpy(zero_copy_only=False)
            raw = _batch_matrix(batch, vec_col)
            m = self._scr("m", raw.shape)
            np.copyto(m, raw)
            sq = self._scr("sq", raw.shape)
            np.multiply(m, m, out=sq)
            norms = np.sqrt(sq.sum(axis=1, keepdims=True))
            norms[norms == 0] = 1.0
            m /= norms
            order = np.argsort(cl, kind="stable")
            cl_sorted = cl[order]
            cells, starts = np.unique(cl_sorted, return_index=True)
            bounds = np.append(starts, len(cl_sorted))
            nq = len(self.q_ids)
            cand_v: list[list[np.ndarray]] = [[] for _ in range(nq)]
            cand_s: list[list[np.ndarray]] = [[] for _ in range(nq)]
            for ci, c in enumerate(cells):
                qidx = self.queries_of[int(c)]
                if qidx.size == 0:
                    continue
                rows = order[bounds[ci]: bounds[ci + 1]]
                sims = self.q[qidx] @ m[rows].T  # (nq_cell, n_rows_cell)
                for local, qi in enumerate(qidx):
                    row = sims[local]
                    kk = min(k, row.size)
                    top = np.argpartition(-row, kk - 1)[:kk] if kk < row.size \
                        else np.arange(row.size)
                    cand_v[qi].append(ids[rows][top])
                    cand_s[qi].append(row[top])
            out_q, out_v, out_s = [], [], []
            for qi in range(nq):
                if not cand_v[qi]:
                    continue
                vs = np.concatenate(cand_v[qi])
                ss = np.concatenate(cand_s[qi])
                sel = np.lexsort((vs, -ss))[:k]  # cosine desc, id asc
                out_q.append(np.full(sel.size, self.q_ids[qi], dtype=np.int64))
                out_v.append(vs[sel])
                out_s.append(ss[sel])
            if not out_q:
                return pa.table({
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                })
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_v), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            })

    clustered = assign_ivf_clusters(ds, centroids, vec_col=vec_col)
    partial = clustered.map_batches(IVFScorer, batch_format="pyarrow",
                                    concurrency=pool_size(4), num_cpus=1).to_pandas()
    out = []
    for qid, g in partial.groupby("query_id"):
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        out.append(g)
    return pd.concat(out, ignore_index=True) if out else partial
