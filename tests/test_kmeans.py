"""KMeans (cosine): distributed-vs-serial assignment parity, determinism,
and recovery of planted clusters."""

import numpy as np
import pyarrow as pa

import ray.data

from ir_base_ray.pipelines.kmeans import kmeans_serial, train_kmeans


def _planted(seed=8, per=20, k=3, V=30):
    rng = np.random.default_rng(seed)
    tids_list, vals_list = [], []
    for c in range(k):
        lo = c * (V // k)
        for _ in range(per):
            tids = np.unique(rng.choice(range(lo, lo + V // k), 4, replace=False))
            vals = rng.integers(1, 4, tids.size).astype(float)
            tids_list.append(tids.tolist())
            vals_list.append(vals.tolist())
    return tids_list, vals_list, V


def _as_ds(tids_list, vals_list, nparts=1):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(tids_list)), pa.int64()),
        "tids": pa.array(tids_list, pa.list_(pa.int64())),
        "vals": pa.array(vals_list, pa.list_(pa.float64())),
    }))
    return ds.repartition(nparts) if nparts > 1 else ds


def test_distributed_matches_serial(ray_session):
    tids_list, vals_list, V = _planted()
    ds = _as_ds(tids_list, vals_list)
    dist = train_kmeans(ds, k=3, vocab_size=V, n_iters=15, seed=19)
    ser = kmeans_serial(tids_list, vals_list, k=3, vocab_size=V,
                        n_iters=15, seed=19)
    assert np.array_equal(np.concatenate(dist["assignments"]),
                          ser["assignments"])
    assert np.allclose(dist["centroids"], ser["centroids"], atol=1e-12)


def test_planted_clusters_recovered(ray_session):
    tids_list, vals_list, V = _planted(per=25)
    ds = _as_ds(tids_list, vals_list, nparts=3)
    out = train_kmeans(ds, k=3, vocab_size=V, n_iters=25, seed=19)
    assign = np.concatenate(out["assignments"])
    truth = np.repeat(np.arange(3), 25)
    # cluster ids are permuted: each planted group must be pure
    for c in range(3):
        grp = assign[truth == c]
        assert (grp == grp[0]).all(), (c, grp)
    assert len(set(assign[truth == c][0] for c in range(3))) == 3


def test_deterministic(ray_session):
    tids_list, vals_list, V = _planted()
    ds = _as_ds(tids_list, vals_list, nparts=2)
    a = train_kmeans(ds, k=3, vocab_size=V, seed=19)
    b = train_kmeans(ds, k=3, vocab_size=V, seed=19)
    assert np.array_equal(a["centroids"], b["centroids"])


def test_kmeans_dense_cosine(ray_session):
    """KMeansAlg4Vct: cosine k-means over dense vectors separates two
    direction-planted groups regardless of magnitude; deterministic."""
    import numpy as np

    from ir_base_ray.pipelines.kmeans import kmeans_dense_cosine

    rng = np.random.default_rng(9)
    a = rng.standard_normal(12)
    b = rng.standard_normal(12)
    rows = []
    for i in range(30):
        base = a if i % 2 == 0 else b
        rows.append(base * rng.uniform(0.1, 10.0)
                    + 0.05 * rng.standard_normal(12))
    X = np.stack(rows)
    assign, C = kmeans_dense_cosine(X, k=2, seed=3)
    g1, g2 = set(assign[0::2].tolist()), set(assign[1::2].tolist())
    assert len(g1) == 1 and len(g2) == 1 and g1 != g2
    assign2, _ = kmeans_dense_cosine(X, k=2, seed=3)
    assert (assign == assign2).all()
