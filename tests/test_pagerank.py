"""J8 per-item PageRank: dense==sparse equivalence at top_k ≥ n, score
sanity (hub docs rank higher), and the groupby pipeline shape."""

import numpy as np
import pyarrow as pa

import ray.data

from ir_base_ray.pipelines.pagerank import pagerank_group, pagerank_weights


def _vectors(seed=6, n=14):
    """Doc 0 overlaps every other doc (hub); the rest are near-disjoint."""
    rng = np.random.default_rng(seed)
    vecs = []
    hub = np.arange(4)
    vecs.append((hub, np.ones(4) / 2.0))
    for i in range(1, n):
        tids = np.unique(np.concatenate([[i % 4], 4 + rng.choice(40, 3)]))
        vals = np.ones(tids.size) / np.sqrt(tids.size)
        vecs.append((tids.astype(np.int64), vals))
    return vecs


def test_dense_equals_sparse_when_k_covers_all():
    vecs = _vectors()
    r_dense = pagerank_group(vecs, top_k=len(vecs), max_iter=20)
    r_sparse = pagerank_group(vecs, top_k=len(vecs) - 1, max_iter=20)
    # with k = n−1 the sparse queue keeps every j≠i: graphs identical
    assert np.allclose(r_dense, r_sparse, atol=1e-12)


def test_hub_doc_scores_highest():
    vecs = _vectors()
    r = pagerank_group(vecs, top_k=5, max_iter=50)
    assert int(np.argmax(r)) == 0


def test_pagerank_weights_pipeline(ray_session):
    rows = []
    rng = np.random.default_rng(1)
    for item in ("A", "B"):
        for d in range(12):
            tids = np.sort(rng.choice(30, 4, replace=False))
            rows.append({"doc_id": len(rows), "item": item,
                         "tids": tids.tolist(),
                         "vals": (np.ones(4) / 2.0).tolist()})
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "item": pa.array([r["item"] for r in rows], pa.string()),
        "tids": pa.array([r["tids"] for r in rows], pa.list_(pa.int64())),
        "vals": pa.array([r["vals"] for r in rows], pa.list_(pa.float64())),
    }))
    out = pagerank_weights(ds, item_col="item", top_k=5,
                           min_group_size=10).to_pandas()
    assert len(out) == 24                        # both groups pass the filter
    assert (out["weight"] > 1.0).all()           # 1 + 10·(positive score)
    # per-group scores are L2-normalized before weighting
    for item, g in out.groupby("item"):
        r = (g["weight"].to_numpy() - 1.0) / 10.0
        assert np.isclose(float(r @ r), 1.0, atol=1e-8)
