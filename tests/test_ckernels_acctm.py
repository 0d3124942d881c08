"""Bit-exact parity pins for the ACCTM-family C kernels
(functions/ckernels.acctm_kernel) against the pure-Python fallback in
pipelines/acctm._sample_unit / ._sample_unit_c: same Philox stream, same
IEEE op sequence, identical arrays after multiple sweeps."""

import numpy as np
import pytest

from ir_base_ray.functions import ckernels
from ir_base_ray.pipelines.acctm import (_init_unit, _init_unit_c,
                                         _sample_unit, _sample_unit_c)

K, V = 4, 30


def _vec(rng, n_terms):
    tids = np.sort(rng.choice(V, size=n_terms, replace=False)).astype(np.int64)
    vals = rng.integers(1, 4, size=n_terms).astype(np.float64)
    return tids, vals


def _units(seed=11, n_units=3):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_units):
        pv = _vec(rng, 12)
        cvs = [_vec(rng, 8) for _ in range(2)]
        out.append((pv, cvs))
    return out


def _run(variant, use_kernel, monkeypatch, kind):
    """3 sweeps over 3 units; returns every mutated array + next draw."""
    if not use_kernel:
        monkeypatch.setattr(ckernels, "_acctm_tried", True)
        monkeypatch.setattr(ckernels, "_acctm_lib", None)
    alpha, beta = 1.01, 1.001
    gamma = np.array([0.2, 0.8])
    wts = np.full((K, V), beta)
    m_sstat = np.full(K, beta * V)
    rng = np.random.Generator(np.random.Philox(key=5, counter=[0, 0, 0, 0]))
    states = []
    for (pv, cvs) in _units():
        if kind == "base":
            us = _init_unit(pv, cvs, K, rng)
            np.add.at(wts, (us[1], us[0]), 1.0)
            np.add.at(m_sstat, us[1], 1.0)
            for (cw, cz, _cs, _mu) in us[3]:
                np.add.at(wts, (cz, cw), 1.0)
                np.add.at(m_sstat, cz, 1.0)
        else:
            us = _init_unit_c(pv, cvs, K, V, beta * 0.001, rng, variant)
            if variant == "czlr":
                us[4] = np.array([0.3, -0.7])   # exercise the logistic
            np.add.at(wts, (us[1], us[0]), 1.0)
            np.add.at(m_sstat, us[1], 1.0)
            for ch in us[3]:
                g0 = ch[2] == 0
                np.add.at(wts, (ch[1][g0], ch[0][g0]), 1.0)
                np.add.at(m_sstat, ch[1][g0], 1.0)
        states.append(us)
    for it in range(1, 4):
        rng = np.random.Generator(np.random.Philox(key=5,
                                                   counter=[it, 0, 0, 0]))
        for us in states:
            if kind == "base":
                _sample_unit(us, wts, m_sstat, K, alpha, rng, variant)
            else:
                _sample_unit_c(us, wts, m_sstat, K, alpha, gamma, rng,
                               variant)
    return states, wts, m_sstat, rng.random()


@pytest.mark.parametrize("variant", ["acctm", "corr"])
def test_sample_unit_kernel_parity(variant, monkeypatch):
    if ckernels.acctm_kernel() is None:
        pytest.skip("no C compiler")
    sk, wk, mk, uk = _run(variant, True, monkeypatch, "base")
    with monkeypatch.context() as m:
        sp, wp, mp, up = _run(variant, False, m, "base")
    assert np.array_equal(wk, wp) and np.array_equal(mk, mp)
    assert uk == up          # identical number of Philox draws consumed
    for a, b in zip(sk, sp):
        assert np.array_equal(a[1], b[1]) and np.array_equal(a[2], b[2])
        for ca, cb in zip(a[3], b[3]):
            assert np.array_equal(ca[1], cb[1])
            assert np.array_equal(ca[2], cb[2])


@pytest.mark.parametrize("variant", ["c", "cz", "chard", "czlr"])
def test_sample_unit_c_kernel_parity(variant, monkeypatch):
    if ckernels.acctm_kernel() is None:
        pytest.skip("no C compiler")
    sk, wk, mk, uk = _run(variant, True, monkeypatch, "x")
    with monkeypatch.context() as m:
        sp, wp, mp, up = _run(variant, False, m, "x")
    assert np.array_equal(wk, wp) and np.array_equal(mk, mp)
    assert uk == up
    for a, b in zip(sk, sp):
        assert np.array_equal(a[1], b[1]) and np.array_equal(a[2], b[2])
        for ca, cb in zip(a[3], b[3]):
            for slot in (1, 2, 3, 4, 5):    # z, x, xt0, local, xs
                assert np.array_equal(ca[slot], cb[slot]), slot
            assert ca[6] == cb[6]           # local_total


def test_dcmcorr_kernel_parity(monkeypatch):
    """DCM-CorrLDA kernel == python bit-exact over 3 sweeps."""
    from ir_base_ray.pipelines import dcmcorrlda as dc

    if ckernels.dcmcorr_kernel() is None:
        pytest.skip("no C compiler")

    def run(use_kernel, m):
        if not use_kernel:
            m.setattr(ckernels, "_dcmcorr_tried", True)
            m.setattr(ckernels, "_dcmcorr_lib", None)
        rngf = np.random.default_rng(7)
        alpha = rngf.uniform(0.5, 1.5, K)
        alpha_c = rngf.uniform(0.5, 1.5, K)
        beta = rngf.uniform(0.01, 0.2, (K, V))
        total_beta = beta.sum(axis=1)
        rng = np.random.Generator(np.random.Philox(key=9,
                                                   counter=[0, 0, 0, 0]))
        states = [dc._init_unit(pv, cvs, K, V, rng)
                  for (pv, cvs) in _units(seed=21)]
        for it in range(1, 4):
            rng = np.random.Generator(np.random.Philox(key=9,
                                                       counter=[it, 0, 0, 0]))
            for us in states:
                dc._sample_unit(us, alpha, alpha_c, beta, total_beta, K, rng)
        return states, rng.random()

    sk, uk = run(True, monkeypatch)
    with monkeypatch.context() as m:
        sp, up = run(False, m)
    assert uk == up
    for a, b in zip(sk, sp):
        for slot in (1, 2, 3, 4):        # p_z, npar, word_topic, topic_stat
            assert np.array_equal(a[slot], b[slot]), slot
        for ca, cb in zip(a[6], b[6]):
            assert np.array_equal(ca[1], cb[1])
            assert np.array_equal(ca[2], cb[2])


def test_sparsedcm_kernel_parity(monkeypatch):
    """sparseDCMLDA topic + indicator kernels == python bit-exact, both
    sparse and cluster walks, over 3 (topics, indicators) rounds."""
    from ir_base_ray.pipelines import sparsedcmlda as sd

    if ckernels.sparsedcm_kernel() is None:
        pytest.skip("no C compiler")

    def run(use_kernel, m, cluster):
        if not use_kernel:
            m.setattr(ckernels, "_sparse_tried", True)
            m.setattr(ckernels, "_sparse_lib", None)
        rngf = np.random.default_rng(13)
        alpha = rngf.uniform(0.1, 0.8, K)
        beta = rngf.uniform(0.01, 0.2, (K, V))
        total_beta = beta.sum(axis=1)
        rng = np.random.Generator(np.random.Philox(key=3,
                                                   counter=[0, 0, 0, 0]))
        docs = []
        for (pv, _cvs) in _units(seed=31):
            w = sd._expand(*pv)
            docs.append(sd._init_doc(w, K, V, alpha, rng))
        cl_wt = np.full((K, V), 0.5) if cluster else None
        cl_ts = cl_wt.sum(axis=1) if cluster else None
        for _ in range(3):
            for d in docs:
                sd._sample_topics(d, alpha, beta, total_beta, rng,
                                  cluster_wt=cl_wt, cluster_ts=cl_ts)
                sd._sample_indicators(d, alpha, K, 10.0, 10.0, rng)
        return docs, cl_wt, cl_ts, rng.random()

    for cluster in (False, True):
        dk, wk, tk, uk = run(True, monkeypatch, cluster)
        with monkeypatch.context() as m:
            dp_, wp, tp, up = run(False, m, cluster)
        assert uk == up, cluster
        if cluster:
            assert np.array_equal(wk, wp) and np.array_equal(tk, tp)
        for a, b in zip(dk, dp_):
            for key in ("z", "n_dk", "n_dkw", "x"):
                assert np.array_equal(a[key], b[key]), (cluster, key)
            assert a["alpha_doc"] == b["alpha_doc"]
            assert a["n_on"] == b["n_on"]
