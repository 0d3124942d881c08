"""R2 L2R feature generation: golden-trace fv values, the reference's exact
z-score divisor quirk, acceptance filter, and the R2→R3 LambdaRank hookup."""

import math

import numpy as np
import pytest

from ir_base_ray.pipelines.l2r import (RANK_FV_SIZE, build_l2r_queries,
                                       default_similarity, gen_ranking_fv,
                                       train_l2r_lambdarank)


def _doc(tids, vals, label, doc_len=None, **kw):
    d = {"tids": np.array(tids, dtype=np.int64),
         "vals": np.array(vals, dtype=np.float64),
         "label": label,
         "doc_len": doc_len if doc_len is not None else len(tids)}
    d.update(kw)
    return d


def test_gen_ranking_fv_golden():
    q = _doc([0, 2, 5], [1.0, 2.0, 1.0], 1, doc_len=4,
             topics=[0.7, 0.3], item_id="A", senti=0.5,
             pos_vct=[1.0, 0.0], asp_vct=[0.0, 1.0])
    d = _doc([2, 5, 7], [1.0, 1.0, 3.0], 0, doc_len=5,
             topics=[0.4, 0.6], item_id="A", senti=0.1,
             pos_vct=[1.0, 1.0], asp_vct=[0.0, 2.0],
             stopword_prop=0.25, avg_idf=1.5)
    fv = gen_ranking_fv(q, d)
    assert fv[0] == 2.0 * 1.0 + 1.0 * 1.0            # dot over shared tids 2,5
    # Utils.KLsymmetric = Σ (p−q)·log(p/q)  (Utils.java:784-794)
    kl = (0.7 - 0.4) * math.log(0.7 / 0.4) + (0.3 - 0.6) * math.log(0.3 / 0.6)
    assert fv[1] == pytest.approx(kl / 2, rel=1e-12)
    assert fv[2] == 1.0                               # same item
    assert fv[3] == pytest.approx(abs(4 - 5) / 4.0)
    assert fv[4] == pytest.approx(2 / 4)              # {2,5} over {0,2,5,7}
    assert fv[5] == pytest.approx(0.4)
    assert fv[6] == pytest.approx(1.0 / math.sqrt(2))
    assert fv[7] == pytest.approx(2.0 / 2.0)
    assert fv[8] == 0.25 and fv[9] == 1.5


def test_default_similarity():
    q = _doc([0], [1.0], 1)
    d = _doc([0], [2.0], 0)
    assert default_similarity(q, d) == pytest.approx(math.exp(2.0))


def _toy_docs(n_per=12, seed=2):
    """Binary-labeled docs: label-1 docs share features 0-3, label-0 share
    4-7, with slight overlap so similarity ranking mixes both."""
    rng = np.random.default_rng(seed)
    docs = []
    for label in (1, 0):
        base = 0 if label == 1 else 4
        for _ in range(n_per):
            tids = np.unique(np.concatenate([
                rng.choice(range(base, base + 4), 3, replace=False),
                rng.choice(8, 1)]))
            vals = rng.integers(1, 3, tids.size).astype(float) / 3.0
            docs.append(_doc(tids.tolist(), vals.tolist(), label))
    return docs


def test_zscore_uses_reference_divisor(ray_session):
    docs = _toy_docs()
    queries, mean, std = build_l2r_queries(docs, top_k=6)
    assert queries, "no accepted queries"
    # recompute with the reference quirk: divisor = total ENTRY count (10·P)
    raw, _, _ = build_l2r_queries(docs, top_k=6)
    all_fv = np.concatenate([fv * std + mean for fv, _ in queries], axis=0)
    size = float(all_fv.size)
    exp_mean = all_fv.sum(axis=0) / size
    assert np.allclose(mean, exp_mean, atol=1e-12)
    # the quirk divisor makes mean[i] ≈ true_mean/10
    true_mean = all_fv.mean(axis=0)
    assert np.allclose(mean * RANK_FV_SIZE, true_mean, atol=1e-12)


def test_acceptance_requires_both_labels(ray_session):
    """All-same-label corpus → every query rejected (irrelevant == 0)."""
    docs = [_doc([i % 4], [1.0], 1) for i in range(8)]
    queries, _, _ = build_l2r_queries(docs, top_k=4)
    assert queries == []


def test_l2r_feeds_lambdarank(ray_session):
    docs = _toy_docs(n_per=15)
    w, trace, mean, std = train_l2r_lambdarank(docs, top_k=8, n_workers=2,
                                               rounds=4, seed=17)
    assert w.shape == (RANK_FV_SIZE,)
    assert trace[-1] <= trace[0]  # training reduces misordered pairs
