"""Weighted Correspondence Model: Newton-helper parity, determinism, and
parent-topic separation (the shipped reference's pi gradient bug — digamma
where trigamma belongs — leaves child pi near its prior, transcribed
as-is, so assertions target gamma/beta)."""

import numpy as np

from ir_base_ray.functions.gammamath import digamma, trigamma
from ir_base_ray.pipelines.wcm import _newton_param, train_wcm


def test_newton_param_single_step():
    # one iteration == the reference's constrained-Newton formulas
    param = np.array([0.8, 1.2, 2.0])
    mult = 5.0
    const = np.array([-0.3, 0.1, -0.5])
    got = _newton_param(param, mult, const, max_iter=1, var_converge=0.0)
    S = param.sum()
    grad = mult * (digamma(S) - np.array([digamma(x) for x in param])) \
        + const
    diag = -mult * np.array([trigamma(x) for x in param])
    hess_c = mult * trigamma(S)
    c = float((grad / diag).sum()) / (1.0 / hess_c + float((1.0 / diag).sum()))
    want = param - (grad - c) / diag
    assert np.allclose(got, want, rtol=1e-12)


def _units(seed=2, n_units=8, V=12):
    rng = np.random.default_rng(seed)
    units = []
    for u in range(n_units):
        h = u % 2
        base = h * 6
        jj = np.arange(base, base + 6)
        vv = rng.integers(3, 8, 6).astype(float)
        kids = [(np.arange(base, base + 4),
                 rng.integers(2, 5, 4).astype(float)) for _ in range(2)]
        units.append(((jj, vv), kids))
    return units, V


def test_deterministic(ray_session):
    units, V = _units(n_units=6)
    a = train_wcm(units, n_topics=2, vocab_size=V, n_em_iters=5,
                  var_max_iter=3, n_blocks=3)
    b = train_wcm(units, n_topics=2, vocab_size=V, n_em_iters=5,
                  var_max_iter=3, n_blocks=3)
    assert np.array_equal(a["beta"], b["beta"])
    for x, y in zip(a["parent_gamma"], b["parent_gamma"]):
        assert np.array_equal(x, y)


def test_gamma_separation_and_shapes(ray_session):
    units, V = _units()
    out = train_wcm(units, n_topics=2, vocab_size=V, n_em_iters=10,
                    var_max_iter=4, n_blocks=3)
    # parent gammas concentrate (the thread-level topic is identifiable)
    conc = np.array([g.max() for g in out["parent_gamma"]])
    assert (conc > 0.9).mean() >= 0.75, conc
    # beta tilts toward the halves (weak — only every-5th-iteration Newton
    # updates run, per the reference's M-step gate), and most parents pick
    # the beta-aligned topic for their vocab half (cross-parent alignment
    # flows ONLY through beta: the parent-owned lambda tables can pin a
    # parent's words to either topic locally, which is faithful DCM
    # behaviour)
    low = out["beta"][:, :6].sum(axis=1) / out["beta"].sum(axis=1)
    assert abs(low[0] - low[1]) > 0.1, low
    tops = np.array([int(np.argmax(g)) for g in out["parent_gamma"]])
    low_topic = int(np.argmax(low))
    aligned = sum(1 for i, t in enumerate(tops)
                  if t == (low_topic if i % 2 == 0 else 1 - low_topic))
    assert aligned >= 0.7 * len(tops), (tops, low)
    # child pis normalized (they stay near-uniform under the shipped
    # reference's buggy pi gradient — transcribed as-is)
    for ps in out["child_pi"]:
        for p in ps:
            assert abs(p.sum() - 1.0) < 1e-9
