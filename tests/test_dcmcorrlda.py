"""DCM-CorrLDA: fixed-point helper sanity, determinism, parent-owned-table
invariants, and parent/child topic coupling on a planted fixture."""

import numpy as np
from collections import Counter

from ir_base_ray.functions.gammamath import digamma
from ir_base_ray.pipelines.dcmcorrlda import (
    _update_alpha, _update_alpha_c, train_dcmcorrlda,
)


def test_update_alpha_matches_direct_loop():
    # histogram evaluation == direct per-parent loop (one Newton iteration)
    rng = np.random.default_rng(0)
    K = 3
    alpha0 = np.array([0.5, 0.3, 0.2])
    lens = [20, 25, 20, 30]
    ndks = rng.integers(0, 9, size=(4, K))
    len_hist = Counter(lens)
    ndk_hists = [Counter(ndks[:, k].tolist()) for k in range(K)]
    got = _update_alpha(alpha0, len_hist, ndk_hists, newton_iter=1,
                        newton_converge=0.0)
    total = alpha0.sum()
    denom = sum(digamma(l + total) - digamma(total) for l in lens)
    want = alpha0.copy()
    for k in range(K):
        num = sum(digamma(alpha0[k] + n) - digamma(alpha0[k])
                  for n in ndks[:, k])
        want[k] = alpha0[k] * num / denom
    assert np.allclose(got, want, rtol=1e-12)


def test_update_alpha_c_shifted_digammas():
    # the continuous muDp*npar shift enters both digamma arguments
    K = 2
    alpha_c = np.array([0.4, 0.6])
    pairs = [(np.array([1.5, 0.5]), np.array([3.0, 1.0]), 4.0, 0.5),
             (np.array([0.2, 2.0]), np.array([0.0, 5.0]), 5.0, 0.5)]
    got = _update_alpha_c(alpha_c, pairs, newton_iter=1, newton_converge=0.0)
    total = alpha_c.sum()
    denom = sum(digamma(cl + total + mu) - digamma(total + mu)
                for (_s, _n, cl, mu) in pairs)
    want = alpha_c.copy()
    for k in range(K):
        num = sum(digamma(alpha_c[k] + s[k] + n[k])
                  - digamma(alpha_c[k] + s[k]) for (s, n, _cl, _mu) in pairs)
        want[k] = alpha_c[k] * num / denom
    assert np.allclose(got, want, rtol=1e-12)


def _units(seed=6, n_units=10, V=12):
    rng = np.random.default_rng(seed)
    units = []
    for u in range(n_units):
        h = u % 2
        base = h * 6
        p_tids = np.arange(base, base + 6)
        p_vals = rng.integers(3, 8, 6).astype(float)
        children = [
            (np.arange(base, base + 4),
             rng.integers(2, 5, 4).astype(float))
            for _ in range(2)
        ]
        units.append(((p_tids, p_vals), children))
    return units, V


def test_deterministic(ray_session):
    units, V = _units(n_units=6)
    a = train_dcmcorrlda(units, n_topics=2, vocab_size=V, n_em_iters=3,
                         inner_iters=3, seed=47, n_blocks=3)
    b = train_dcmcorrlda(units, n_topics=2, vocab_size=V, n_em_iters=3,
                         inner_iters=3, seed=47, n_blocks=3)
    assert np.array_equal(a["alpha"], b["alpha"])
    assert np.array_equal(a["alpha_c"], b["alpha_c"])
    assert np.array_equal(a["beta"], b["beta"])
    for x, y in zip(a["parent_topics"], b["parent_topics"]):
        assert np.array_equal(x, y)


def test_parent_child_coupling(ray_session):
    units, V = _units(n_units=12)
    out = train_dcmcorrlda(units, n_topics=2, vocab_size=V, n_em_iters=12,
                           inner_iters=8, seed=47, n_blocks=3)
    # hyperparameters finite; alpha positive (alpha_c may legitimately hit
    # an exact-0 degenerate fixed point when children track parents fully)
    assert (out["alpha"] > 0).all() and np.isfinite(out["alpha"]).all()
    assert (out["alpha_c"] >= 0).all() and np.isfinite(out["alpha_c"]).all()
    assert (out["beta"] > 0).all() and np.isfinite(out["beta"]).all()
    # each child's dominant topic matches its parent's (children share the
    # parent's vocab and its word-topic tables)
    agree = total = 0
    for pt, cts in zip(out["parent_topics"], out["child_topics"]):
        for ct in cts:
            total += 1
            agree += int(np.argmax(ct) == np.argmax(pt))
    assert agree >= 0.8 * total, (agree, total)
    # proportions normalized
    for pt in out["parent_topics"]:
        assert abs(pt.sum() - 1.0) < 1e-9
