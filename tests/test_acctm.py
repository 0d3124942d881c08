"""ACCTM (correspondence topic model): serial parity, determinism, μ
computation, gamma-ratio identity, and parent/child topic coupling."""

import math

import numpy as np

from ir_base_ray.pipelines.acctm import (
    _gamma_func_ratio, acctm_serial, cosine_mu, train_acctm,
)


def _units(seed=3, n_units=8, V=12):
    """Unit u: parent on vocab half h=u%2, two children echoing the same
    half (with a noise term from the other half)."""
    rng = np.random.default_rng(seed)
    units = []
    for u in range(n_units):
        h = u % 2
        base = h * 6
        p_tids = np.arange(base, base + 6)
        p_vals = rng.integers(1, 4, 6).astype(float)
        children = []
        for _ in range(2):
            c_tids = np.concatenate([np.arange(base, base + 4),
                                     [(1 - h) * 6]])
            c_vals = np.concatenate([rng.integers(1, 3, 4), [1]]).astype(float)
            children.append((c_tids, c_vals))
        units.append(((p_tids, p_vals), children))
    return units, V


def test_cosine_mu():
    assert abs(cosine_mu([0, 1], [1.0, 2.0], [1, 2], [2.0, 3.0])
               - (2 * 2) / (math.sqrt(5) * math.sqrt(13))) < 1e-12
    assert cosine_mu([0], [1.0], [1], [1.0]) == 0.0
    assert cosine_mu([0], [0.0], [0], [1.0]) == 0.0


def test_gamma_func_ratio_identity():
    # product form == Gamma-function identity
    for nc, m, A in [(0, 0.3, 1.1), (1, 0.5, 2.0), (5, 0.25, 1.7),
                     (12, 1.5, 0.9)]:
        got = _gamma_func_ratio(nc, m, A)
        want = math.exp(
            math.lgamma(A + m + nc) - math.lgamma(A + m)
            - math.lgamma(A + nc) + math.lgamma(A))
        assert abs(got - want) <= 1e-10 * max(1.0, want), (nc, m, A)


def test_one_block_matches_serial(ray_session):
    units, V = _units(n_units=5)
    d = train_acctm(units, n_topics=3, vocab_size=V, n_iters=8,
                    seed=19, n_blocks=1)
    s = acctm_serial(units, n_topics=3, vocab_size=V, n_iters=8, seed=19)
    assert np.array_equal(d["topic_term"], s["topic_term"])
    for a, b in zip(d["parent_topics"], s["parent_topics"]):
        assert np.array_equal(a, b)
    for ua, ub in zip(d["child_topics"], s["child_topics"]):
        for a, b in zip(ua, ub):
            assert np.array_equal(a, b)


def test_multiblock_deterministic(ray_session):
    units, V = _units(n_units=8)
    a = train_acctm(units, n_topics=3, vocab_size=V, n_iters=6,
                    seed=19, n_blocks=3)
    b = train_acctm(units, n_topics=3, vocab_size=V, n_iters=6,
                    seed=19, n_blocks=3)
    assert np.array_equal(a["topic_term"], b["topic_term"])
    for x, y in zip(a["parent_topics"], b["parent_topics"]):
        assert np.array_equal(x, y)


def test_topic_recovery_and_correspondence(ray_session):
    units, V = _units(n_units=12)
    out = train_acctm(units, n_topics=2, vocab_size=V, n_iters=30,
                      seed=19, n_blocks=3)
    phi = out["topic_term"]
    # topics separate the two vocab halves
    mass_low = phi[:, :6].sum(axis=1)
    assert mass_low.max() > 0.8 and mass_low.min() < 0.2, mass_low
    # each child's dominant topic matches its parent's dominant topic
    agree = 0
    total = 0
    for pt, cts in zip(out["parent_topics"], out["child_topics"]):
        for ct in cts:
            total += 1
            agree += int(np.argmax(ct) == np.argmax(pt))
    assert agree >= 0.85 * total, (agree, total)
    # mu was computed from overlapping vocab: strictly positive
    assert all(m > 0 for ms in out["mus"] for m in ms)
