"""CLRWithHDP / CLinAdaptWithHDP pins (modelAdaptation/HDP/)."""

import math

import numpy as np

from ir_base_ray.pipelines.hdpadapt import (_Stirling, _log_gamma_division,
                                            train_hdp_adaptation)


def test_stirling_and_gamma_division():
    """log unsigned Stirling numbers of the first kind (s(3,·)=2,3,1;
    s(4,2)=11) and the ascending logGammaDivision identity
    Σ log(i+β+N) = lgamma(n+β+N) − lgamma(β+N)."""
    st = _Stirling()
    assert abs(st(3, 1) - math.log(2)) < 1e-12
    assert abs(st(3, 2) - math.log(3)) < 1e-12
    assert st(3, 3) == 0.0
    assert abs(st(4, 2) - math.log(11)) < 1e-12
    assert st(4, 0) == -np.inf and st(3, 5) == -np.inf
    for n, b, N in ((3, 2.5, 1.0), (7, 0.4, 3.2), (0, 1.0, 0.0)):
        want = math.lgamma(n + b + N) - math.lgamma(b + N)
        assert abs(_log_gamma_division(n, b, N) - want) < 1e-9


def _two_pop(F=8, n_users=10, n_docs=10, seed=5):
    rng = np.random.default_rng(seed)
    wA = rng.standard_normal(F + 1) * 2
    wB = -wA

    def docs_for(w, n, s):
        r = np.random.default_rng(s)
        out = []
        for _ in range(n):
            tids = np.sort(r.choice(F, size=4, replace=False)).astype(np.int64)
            vals = np.ones(4)
            out.append((tids, vals,
                        1 if (w[0] + float((w[tids + 1] * vals).sum())) > 0
                        else 0))
        return out

    user_docs = {f"u{i}": docs_for(wA if i % 2 == 0 else wB, n_docs, 100 + i)
                 for i in range(n_users)}
    return user_docs, wA, wB, docs_for


def test_hdp_recovers_review_level_grouping(ray_session):
    """Two opposite populations: every user's majority cluster must be
    population-pure, held-out accuracy high, runs deterministic."""
    user_docs, wA, wB, docs_for = _two_pop()
    out = train_hdp_adaptation(user_docs, np.zeros(wA.size), model="clr",
                               burn_in=3, n_iters=5, seed=41)
    mc = out["user_major_cluster"]
    ca = {mc[f"u{i}"] for i in range(0, 10, 2)}
    cb = {mc[f"u{i}"] for i in range(1, 10, 2)}
    assert not (ca & cb), (ca, cb)
    accs = []
    for i in range(10):
        w_true = wA if i % 2 == 0 else wB
        pw = out["personalized"][f"u{i}"]
        docs = docs_for(w_true, 30, 300 + i)
        accs.append(sum(
            int(((pw[0] + float((pw[t + 1] * v).sum())) > 0) == (y == 1))
            for t, v, y in docs) / 30)
    assert np.mean(accs) >= 0.85, accs
    # γ bookkeeping: stick weights + remainder sum to 1
    assert abs(sum(out["gammas"]) + out["gamma_e"] - 1.0) < 1e-9
    out2 = train_hdp_adaptation(user_docs, np.zeros(wA.size), model="clr",
                                burn_in=3, n_iters=5, seed=41)
    assert out["review_assign"] == out2["review_assign"]


def test_hdp_clinadapt_variant(ray_session):
    """CLinAdaptWithHDP: cluster-shared transforms over the global model."""
    user_docs, wA, wB, docs_for = _two_pop()
    out = train_hdp_adaptation(user_docs, wA, model="clin", burn_in=3,
                               n_iters=8, eta1=0.01, eta2=0.01, seed=43)
    accs = []
    for i in range(10):
        w_true = wA if i % 2 == 0 else wB
        pw = out["personalized"][f"u{i}"]
        docs = docs_for(w_true, 30, 400 + i)
        accs.append(sum(
            int(((pw[0] + float((pw[t + 1] * v).sum())) > 0) == (y == 1))
            for t, v, y in docs) / 30)
    assert np.mean(accs) >= 0.8, accs


def test_hdp_mt_variants(ray_session):
    """MTCLRWithHDP + MTCLinAdaptWithHDP: both multi-task variants recover
    the two-population split with good held-out accuracy, return a super
    block, and run deterministically."""
    user_docs, wA, wB, docs_for = _two_pop()

    def heldout_acc(out):
        accs = []
        for i in range(10):
            w_true = wA if i % 2 == 0 else wB
            pw = out["personalized"][f"u{i}"]
            docs = docs_for(w_true, 30, 700 + i)
            accs.append(sum(
                int(((pw[0] + float((pw[t + 1] * v).sum())) > 0) == (y == 1))
                for t, v, y in docs) / 30)
        return float(np.mean(accs))

    out = train_hdp_adaptation(user_docs, wA, model="mtclr", burn_in=3,
                               n_iters=5, seed=41)
    assert out["super_model"] is not None and out["super_model"].size == wA.size
    assert heldout_acc(out) >= 0.8
    out2 = train_hdp_adaptation(user_docs, wA, model="mtclr", burn_in=3,
                                n_iters=5, seed=41)
    assert out["review_assign"] == out2["review_assign"]

    outl = train_hdp_adaptation(user_docs, wA, model="mtclin", burn_in=3,
                                n_iters=8, eta1=0.01, eta2=0.01, seed=43)
    assert outl["super_model"] is not None
    assert outl["super_model"].size == 2 * wA.size
    assert heldout_acc(outl) >= 0.8


def test_hdp_multiple_e(ray_session):
    """MTCLinAdaptWithHDPMultipleE: thinning>1 accumulates per-review
    assignment counts across E-steps and weights the MLE by them; still
    recovers the split and is deterministic."""
    user_docs, wA, wB, docs_for = _two_pop()
    out = train_hdp_adaptation(user_docs, wA, model="mtclin", burn_in=3,
                               n_iters=4, thinning=3, eta1=0.01, eta2=0.01,
                               seed=47)
    accs = []
    for i in range(10):
        w_true = wA if i % 2 == 0 else wB
        pw = out["personalized"][f"u{i}"]
        docs = docs_for(w_true, 30, 800 + i)
        accs.append(sum(
            int(((pw[0] + float((pw[t + 1] * v).sum())) > 0) == (y == 1))
            for t, v, y in docs) / 30)
    assert np.mean(accs) >= 0.8, accs
    out2 = train_hdp_adaptation(user_docs, wA, model="mtclin", burn_in=3,
                                n_iters=4, thinning=3, eta1=0.01, eta2=0.01,
                                seed=47)
    assert out["review_assign"] == out2["review_assign"]
    assert np.allclose(out["super_model"], out2["super_model"])
