"""twoTopic (per-doc background-mixture EM): hand-checked E/M steps,
convergence behaviour, lambda edge cases, distributed stage determinism."""

import numpy as np
import pyarrow as pa

import ray.data

from ir_base_ray.pipelines.twotopic import (
    background_prob, two_topic_doc, two_topic_stage,
)


def test_background_prob():
    ttf = np.array([3.0, 1.0, 0.0])
    bg = background_prob(ttf)
    assert np.allclose(bg, [4 / 7, 2 / 7, 1 / 7])
    assert abs(bg.sum() - 1.0) < 1e-12


def test_single_em_step_hand_computed():
    # V=2, doc = {0: 2}, fixed theta via a stub rng returning zeros
    class StubRng:
        def random(self, n):
            return np.zeros(n)

    bg = np.array([0.5, 0.5])
    beta, lam = 1.5, 0.4
    # init: theta = (beta + 0) / (2*beta) -> [0.5, 0.5]; doc support [0]
    jj = np.array([0])
    vv = np.array([2.0])
    theta_d, ll, it = two_topic_doc(jj, vv, bg, lam=lam, beta=beta,
                                    converge=np.inf, n_iters=1,
                                    rng=StubRng())
    # E: s = 0.6*0.5 = 0.3; sstat = 2*0.3/(0.3+0.4*0.5) = 1.2
    # ll = 2*log(0.2+0.3)
    assert abs(ll - 2 * np.log(0.5)) < 1e-12
    # M: denom = 1.2 + 2*0.5 = 2.2; theta_0 = (0.5+1.2)/2.2
    assert abs(theta_d[0] - 1.7 / 2.2) < 1e-12
    assert it == 1


def test_em_converges_and_improves():
    rng = np.random.default_rng(1)
    bg = background_prob(rng.integers(1, 50, 30).astype(float))
    jj = np.arange(0, 8)
    vv = rng.integers(1, 6, 8).astype(float)
    r1 = np.random.Generator(np.random.Philox(key=5, counter=[0, 0, 0, 0]))
    _, ll1, _ = two_topic_doc(jj, vv, bg, n_iters=1, converge=1e-9, rng=r1)
    r2 = np.random.Generator(np.random.Philox(key=5, counter=[0, 0, 0, 0]))
    theta, ll50, it = two_topic_doc(jj, vv, bg, n_iters=50, converge=1e-9,
                                    rng=r2)
    assert ll50 >= ll1 - 1e-9
    assert it <= 50
    # the doc-topic concentrates on the doc's own words: loglik beats the
    # pure-background model
    ll_bg = float((vv * np.log(bg[jj])).sum())
    assert ll50 > ll_bg


def test_lambda_one_is_pure_background():
    bg = np.array([0.25, 0.25, 0.5])
    jj = np.array([0, 2])
    vv = np.array([1.0, 3.0])
    rng = np.random.Generator(np.random.Philox(key=7, counter=[0, 0, 0, 0]))
    _, ll, _ = two_topic_doc(jj, vv, bg, lam=1.0, n_iters=5, rng=rng)
    assert abs(ll - float((vv * np.log(bg[jj])).sum())) < 1e-12


def test_stage_deterministic(ray_session):
    rng = np.random.default_rng(3)
    rows = {
        "doc_id": pa.array(range(12), pa.int64()),
        "tids": pa.array([sorted(rng.choice(20, 5, replace=False).tolist())
                          for _ in range(12)], pa.list_(pa.int64())),
        "vals": pa.array([rng.integers(1, 4, 5).astype(float).tolist()
                          for _ in range(12)], pa.list_(pa.float64())),
    }
    ds = ray.data.from_arrow(pa.table(rows)).repartition(3)
    ttf = rng.integers(1, 100, 20).astype(float)
    a = two_topic_stage(ds, ttf).to_pandas().sort_values("doc_id")
    b = two_topic_stage(ds, ttf).to_pandas().sort_values("doc_id")
    assert np.array_equal(a["loglik"].to_numpy(), b["loglik"].to_numpy())
    assert np.array_equal(a["top_tid"].to_numpy(), b["top_tid"].to_numpy())
    assert (a["iters"] >= 1).all()
    # every top term is inside the doc's own support
    for tid, tids in zip(a["top_tid"], rows["tids"].to_pylist()):
        assert tid in tids
