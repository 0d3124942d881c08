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


# ---------------------------------------------------------------- ACCTM_C

from ir_base_ray.pipelines.acctm import train_acctm_c


def _units_with_local(seed=4, n_units=10, V=16):
    """Parents on vocab halves 0-5/6-11; children echo the parent's half
    PLUS child-only slang words 12-15 that no parent ever uses — the x=1
    local distribution should absorb those."""
    rng = np.random.default_rng(seed)
    units = []
    for u in range(n_units):
        h = u % 2
        base = h * 6
        p_tids = np.arange(base, base + 6)
        p_vals = rng.integers(2, 6, 6).astype(float)
        children = []
        for _ in range(2):
            c_tids = np.concatenate([np.arange(base, base + 4),
                                     np.arange(12, 16)])
            c_vals = np.concatenate([rng.integers(1, 4, 4),
                                     rng.integers(2, 5, 4)]).astype(float)
            children.append((c_tids, c_vals))
        units.append(((p_tids, p_vals), children))
    return units, V


def test_acctm_c_deterministic(ray_session):
    units, V = _units_with_local(n_units=6)
    a = train_acctm_c(units, n_topics=2, vocab_size=V, n_iters=8,
                      seed=19, n_blocks=3)
    b = train_acctm_c(units, n_topics=2, vocab_size=V, n_iters=8,
                      seed=19, n_blocks=3)
    assert np.array_equal(a["topic_term"], b["topic_term"])
    for xa, xb in zip(a["child_xprop"], b["child_xprop"]):
        for p, q in zip(xa, xb):
            assert np.array_equal(p, q)


def test_acctm_c_local_words_absorbed(ray_session):
    units, V = _units_with_local()
    out = train_acctm_c(units, n_topics=2, vocab_size=V, n_iters=40,
                        seed=19, n_blocks=3)
    # per-child local (x=1) distributions concentrate on the slang words,
    # and more sharply than any global topic does — the x-switch routes
    # child-specific vocabulary to the local component (how much of the
    # slang MASS goes local depends on the gamma prior and rich-get-richer
    # x counts; on this fixture most tokens stay global, which is
    # legitimate Gibbs behaviour, so we assert the conditional shape, not
    # the split)
    phi = out["topic_term"]
    loc = np.mean([lw[12:].sum() for lws in out["child_local"]
                   for lw in lws])
    assert loc > 0.6, loc
    assert loc > phi[:, 12:].sum(axis=1).max()
    # x proportions: normalized, both switches alive
    for xs in out["child_xprop"]:
        for x in xs:
            assert abs(x.sum() - 1.0) < 1e-9
            assert 0.01 < x[1] < 0.99


def test_acctm_cz_variant(ray_session):
    units, V = _units_with_local(n_units=8)
    a = train_acctm_c(units, n_topics=2, vocab_size=V, n_iters=20,
                      seed=19, n_blocks=3, variant="cz")
    b = train_acctm_c(units, n_topics=2, vocab_size=V, n_iters=20,
                      seed=19, n_blocks=3, variant="cz")
    assert np.array_equal(a["topic_term"], b["topic_term"])
    # CZ genuinely differs from C at equal seed (different child/influence
    # distributions)
    c = train_acctm_c(units, n_topics=2, vocab_size=V, n_iters=20,
                      seed=19, n_blocks=3, variant="c")
    assert not np.array_equal(a["topic_term"], c["topic_term"])
    # local distribution still absorbs child-only vocabulary
    loc = np.mean([lw[12:].sum() for lws in a["child_local"] for lw in lws])
    assert loc > 0.5, loc
    # CZ child stats are raw x=0 counts (no alpha add): normalized anyway
    for ts in a["child_topics"]:
        for t in ts:
            assert abs(t.sum() - 1.0) < 1e-9 or t.sum() == 0.0


def test_acctm_chard_variant(ray_session):
    units, V = _units_with_local(n_units=8)
    a = train_acctm_c(units, n_topics=2, vocab_size=V, n_iters=20,
                      seed=19, n_blocks=3, variant="chard")
    b = train_acctm_c(units, n_topics=2, vocab_size=V, n_iters=20,
                      seed=19, n_blocks=3, variant="chard")
    assert np.array_equal(a["topic_term"], b["topic_term"])
    # hard constraint: parent-shared child words can never enter the local
    # distribution — every child's local SAMPLE mass (above the uniform
    # beta' smoothing floor, slang share 4/16) lives on the slang words;
    # children whose x=1 collapsed entirely sit exactly at the floor
    flat = [lw for lws in a["child_local"] for lw in lws]
    for lw in flat:
        assert lw[12:].sum() >= 0.25 - 1e-9, lw
    sharp = sum(1 for lw in flat if lw[12:].sum() > 0.9)
    assert sharp >= 0.5 * len(flat), (sharp, len(flat))


def test_corrlda_variant(ray_session):
    units, V = _units(n_units=10)
    a = train_acctm(units, n_topics=2, vocab_size=V, n_iters=25,
                    seed=19, n_blocks=3, variant="corr")
    b = train_acctm(units, n_topics=2, vocab_size=V, n_iters=25,
                    seed=19, n_blocks=3, variant="corr")
    assert np.array_equal(a["topic_term"], b["topic_term"])
    # corrLDA differs from ACCTM at equal seed
    c = train_acctm(units, n_topics=2, vocab_size=V, n_iters=25,
                    seed=19, n_blocks=3)
    assert not np.array_equal(a["topic_term"], c["topic_term"])
    # topics still separate the vocab halves
    phi = a["topic_term"]
    mass_low = phi[:, :6].sum(axis=1)
    assert mass_low.max() > 0.8 and mass_low.min() < 0.2, mass_low
    # corrLDA children follow the parent proportions exactly (pure
    # correspondence): dominant topics agree
    agree = total = 0
    for pt, cts in zip(a["parent_topics"], a["child_topics"]):
        for ct in cts:
            total += 1
            agree += int(np.argmax(ct) == np.argmax(pt))
    assert agree >= 0.85 * total, (agree, total)


def test_fit_x_lr_newton_optimal_and_orientation():
    from ir_base_ray.pipelines.acctm import _fit_x_lr

    F = np.array([[2.0, 0.0], [3.0, 0.0], [0.0, 2.0], [1.0, 3.0]])

    def mk(x):
        return [np.array([1, 2, 3, 4]), None, np.array(x),
                None, None, None, None, None, F]

    # exact optimum of the liblinear L2R_LR objective (C=1, no intercept):
    # gradient of 0.5||w||^2 + sum log(1+exp(-y*Xw)) vanishes
    w = _fit_x_lr([mk([1, 1, 0, 0])])
    y = np.array([1.0, 1.0, -1.0, -1.0])  # first word x=1 -> +1 class = x=1
    g = w - F.T @ (y / (1.0 + np.exp(y * (F @ w))))
    assert np.abs(g).max() < 1e-10, g
    # x=1 rows are the child-only profile [c,0] -> positive child-tf weight
    assert w[0] > 0 and w[1] < 0, w
    # first-occurrence orientation quirk (Linear.groupClasses:112-160):
    # inverting EVERY x label leaves w unchanged, because the positive
    # class follows the first label seen — while xProb4Word always reads w
    # as the x=1 direction
    w_inv = _fit_x_lr([mk([0, 0, 1, 1])])
    assert np.allclose(w, w_inv, atol=1e-12)
    # degenerate single-class problem still has a finite regularized optimum
    w_one = _fit_x_lr([mk([1, 1, 1, 1])])
    g1 = w_one - F.T @ (1.0 / (1.0 + np.exp(F @ w_one)))
    assert np.abs(g1).max() < 1e-10


def test_acctm_czlr_variant(ray_session):
    from ir_base_ray.pipelines.acctm import train_acctm_czlr

    units, V = _units_with_local(n_units=8)
    a = train_acctm_czlr(units, n_topics=2, vocab_size=V, n_outer=4,
                         n_inner=5, seed=19, n_blocks=3)
    b = train_acctm_czlr(units, n_topics=2, vocab_size=V, n_outer=4,
                         n_inner=5, seed=19, n_blocks=3)
    assert np.array_equal(a["topic_term"], b["topic_term"])
    assert all(np.array_equal(x, y)
               for x, y in zip(a["x_weights"], b["x_weights"]))
    # the logistic x-switch genuinely diverges from the count-based CZ
    c = train_acctm_c(units, n_topics=2, vocab_size=V, n_iters=20,
                      seed=19, n_blocks=3, variant="cz")
    assert not np.array_equal(a["topic_term"], c["topic_term"])
    # every parent's LR was fit (M-step ran) and uses the parent-tf
    # coordinate — the feature separating shared from child-only words
    assert all(np.abs(w).sum() > 0 for w in a["x_weights"])
    assert sum(1 for w in a["x_weights"] if abs(w[1]) > 1e-6) == len(units)
    # the local distribution still absorbs the child-only slang vocabulary
    loc = np.mean([lw[12:].sum() for lws in a["child_local"] for lw in lws])
    assert loc > 0.5, loc
