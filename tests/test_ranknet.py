"""R4 RankNet/RankSVM: pair extraction semantics, gradient sanity,
deterministic training, and ranking accuracy on separable pairs."""

import numpy as np

from ir_base_ray.pipelines.ranknet import (
    extract_ranknet_pairs, extract_ranksvm_pairs, pairwise_accuracy,
    train_ranknet, train_ranksvm,
)


def _queries(seed=4, n_queries=6, n_docs=8, F=10):
    """Relevant docs have higher feature 0 and lower feature 1."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_queries):
        y = (rng.random(n_docs) > 0.5).astype(np.int64)
        fv = rng.normal(size=(n_docs, F)) * 0.1
        fv[:, 0] += y * 1.5
        fv[:, 1] -= y * 1.0
        out.append((fv, y))
    return out


def test_extract_ranknet_pairs_direction():
    fv = np.array([[1.0, 0.0], [0.0, 1.0], [2.0, 2.0]])
    y = np.array([1, 0, 1])
    diffs = extract_ranknet_pairs([(fv, y)])
    # pairs (i=1,j=0): y1<y0 → fv0−fv1 ; (i=2,j=1): y2>y1 → fv2−fv1
    assert diffs.shape == (2, 2)
    assert np.array_equal(diffs[0], fv[0] - fv[1])
    assert np.array_equal(diffs[1], fv[2] - fv[1])


def test_extract_ranksvm_parity():
    fv = np.array([[1.0, 0.0], [0.0, 1.0], [2.0, 2.0]])
    y = np.array([1, 0, 1])
    X, lab = extract_ranksvm_pairs([(fv, y)])
    assert lab.tolist() == [-1.0, 1.0]      # even index → −1, then +1
    assert np.array_equal(X[0], fv[1] - fv[0])   # worse − better at −1
    assert np.array_equal(X[1], fv[2] - fv[1])   # better − worse at +1


def test_ranknet_trains_and_ranks(ray_session):
    qs = _queries()
    w, f = train_ranknet(qs, lam=0.5, n_shards=3, seed=23)
    assert pairwise_accuracy(qs, w) >= 0.9
    # deterministic
    w2, f2 = train_ranknet(qs, lam=0.5, n_shards=3, seed=23)
    assert np.array_equal(w, w2) and f == f2


def test_ranksvm_trains_and_ranks(ray_session):
    qs = _queries()
    w, f = train_ranksvm(qs, C_reg=1.0, n_shards=2)
    assert pairwise_accuracy(qs, w) >= 0.9
