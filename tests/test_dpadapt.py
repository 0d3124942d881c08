"""CLRWithDP / CLinAdaptWithDP pins (modelAdaptation/DirichletProcess/)."""

import numpy as np

import ray

from ir_base_ray.pipelines.dpadapt import _dp_block_fg, train_dp_adaptation


def _two_pop_users(F=8, n_users=12, n_docs=15, scale=2.0, seed=5):
    rng = np.random.default_rng(seed)
    wA = rng.standard_normal(F + 1) * scale
    wB = -wA

    def docs_for(w, n, s):
        r = np.random.default_rng(s)
        out = []
        for _ in range(n):
            tids = np.sort(r.choice(F, size=4, replace=False)).astype(np.int64)
            vals = r.uniform(0.5, 1.5, size=4)
            out.append((tids, vals,
                        1 if (w[0] + float((w[tids + 1] * vals).sum())) > 0
                        else 0))
        return out

    user_docs = {f"u{i}": docs_for(wA if i % 2 == 0 else wB, n_docs, 100 + i)
                 for i in range(n_users)}
    return user_docs, wA, wB, docs_for


def test_dp_block_gradient(ray_session):
    rng = np.random.default_rng(7)
    F = 6
    user_docs, wA, wB, _mk = _two_pop_users(F=F, n_users=4, n_docs=5)
    entries = [([(np.asarray(t), np.asarray(v), y)
                 for t, v, y in docs], i % 2)
               for i, docs in enumerate(user_docs.values())]
    for model, pdim in (("clr", F + 1), ("clin", 2 * (F + 1))):
        x = 0.1 * rng.standard_normal(2 * pdim)
        f0, g = ray.get(_dp_block_fg.remote(entries, x, wA, pdim, model, 2,
                                            False))
        eps = 1e-6
        for i in range(0, x.size, 3):
            xp = x.copy()
            xp[i] += eps
            fp, _ = ray.get(_dp_block_fg.remote(entries, xp, wA, pdim,
                                                model, 2, False))
            assert abs((fp - f0) / eps - g[i]) < 1e-3 * max(1.0, abs(g[i])), \
                (model, i)


def test_dp_recovers_two_populations(ray_session):
    """Two opposite user populations under a neutral global model: the DP
    must discover two pure clusters (unnormalized likelihood, the shipped
    main's setLNormFlag(false) mode) and the cluster models must predict
    held-out docs; the run is deterministic."""
    user_docs, wA, wB, docs_for = _two_pop_users()
    g_w = np.zeros(wA.size)
    out = train_dp_adaptation(user_docs, g_w, model="clr", burn_in=4,
                              n_iters=8, eta1=0.05, seed=29)
    a = out["assign"]
    ca = {a[f"u{i}"] for i in range(0, 12, 2)}
    cb = {a[f"u{i}"] for i in range(1, 12, 2)}
    assert not (ca & cb) and len(ca) == 1 and len(cb) == 1, (ca, cb)
    accs = []
    for i in range(12):
        w_true = wA if i % 2 == 0 else wB
        pw = out["personalized"][f"u{i}"]
        docs = docs_for(w_true, 30, 200 + i)
        accs.append(sum(
            int(((pw[0] + float((pw[t + 1] * v).sum())) > 0) == (y == 1))
            for t, v, y in docs) / 30)
    assert np.mean(accs) >= 0.9, accs
    out2 = train_dp_adaptation(user_docs, g_w, model="clr", burn_in=4,
                               n_iters=8, eta1=0.05, seed=29)
    assert out["assign"] == out2["assign"]
    assert all(np.array_equal(c1, c2) for c1, c2 in
               zip(out["clusters"], out2["clusters"]))


def test_lnorm_collapse_quirk(ray_session):
    """With the per-user likelihood normalization ON (the class default the
    shipped main turns off), the CRP's log(memSize) dominates and the
    sampler collapses toward one cluster — pinned as the documented
    behavior difference."""
    user_docs, wA, _wB, _mk = _two_pop_users()
    out = train_dp_adaptation(user_docs, np.zeros(wA.size), model="clr",
                              burn_in=4, n_iters=8, eta1=0.05, seed=29,
                              l_norm=True)
    # collapsed or near-collapsed: strictly fewer effective clusters than
    # the unnormalized run's clean 2, with cross-population mixing
    a = out["assign"]
    ca = {a[f"u{i}"] for i in range(0, 12, 2)}
    cb = {a[f"u{i}"] for i in range(1, 12, 2)}
    assert (ca & cb) or len(out["clusters"]) == 1


def test_clinadapt_dp_variant(ray_session):
    """CLinAdaptWithDP: cluster-shared (a, b) transforms of the global
    model; with a usable global model and opposite populations the
    transforms must separate and fit both (a≈−1-style flips are exactly
    what the scaling space can express)."""
    user_docs, wA, wB, docs_for = _two_pop_users(scale=2.0)
    out = train_dp_adaptation(user_docs, wA, model="clin", burn_in=4,
                              n_iters=8, eta1=0.05, eta2=0.05, seed=31)
    accs = []
    for i in range(12):
        w_true = wA if i % 2 == 0 else wB
        pw = out["personalized"][f"u{i}"]
        docs = docs_for(w_true, 30, 300 + i)
        accs.append(sum(
            int(((pw[0] + float((pw[t + 1] * v).sum())) > 0) == (y == 1))
            for t, v, y in docs) / 30)
    assert np.mean(accs) >= 0.85, accs


def test_mtclin_dp_variant(ray_session):
    """MTCLinAdaptWithDP: gradient check of the cluster+super joint
    objective, and recovery — with a ZERO global model only the learned
    super model can carry signal (the cluster transforms alone have nothing
    to scale), so good held-out accuracy proves the super block learns."""
    rng = np.random.default_rng(11)
    user_docs, wA, wB, docs_for = _two_pop_users(scale=2.0)
    F = wA.size - 1
    # gradient check: 2 clusters + super at the end
    entries = [([(np.asarray(t), np.asarray(v), y)
                 for t, v, y in docs], i % 2)
               for i, docs in enumerate(list(user_docs.values())[:4])]
    pdim = 2 * (F + 1)
    x = np.concatenate([np.ones(F + 1), np.zeros(F + 1)] * 3) \
        + 0.1 * rng.standard_normal(3 * pdim)
    f0, g = ray.get(_dp_block_fg.remote(entries, x, wA, pdim, "mtclin", 2,
                                        False))
    eps = 1e-6
    for i in range(0, x.size, 5):
        xp = x.copy()
        xp[i] += eps
        fp, _ = ray.get(_dp_block_fg.remote(entries, xp, wA, pdim, "mtclin",
                                            2, False))
        assert abs((fp - f0) / eps - g[i]) < 1e-3 * max(1.0, abs(g[i])), i

    out = train_dp_adaptation(user_docs, wA, model="mtclin", burn_in=4,
                              n_iters=8, eta1=0.05, eta2=0.05, seed=37)
    accs = []
    for i in range(12):
        w_true = wA if i % 2 == 0 else wB
        pw = out["personalized"][f"u{i}"]
        docs = docs_for(w_true, 30, 400 + i)
        accs.append(sum(
            int(((pw[0] + float((pw[t + 1] * v).sum())) > 0) == (y == 1))
            for t, v, y in docs) / 30)
    assert np.mean(accs) >= 0.85, accs
    assert out["super_model"] is not None


def test_mtclr_dp_variant(ray_session):
    """MTCLRWithDP: gradient check of the cluster+q-scaled-super joint
    objective (gradientByFunc :62-84), recovery on the two-population
    fixture, and the super block coming back non-trivial."""
    rng = np.random.default_rng(13)
    user_docs, wA, wB, docs_for = _two_pop_users(scale=2.0)
    F1 = wA.size
    entries = [([(np.asarray(t), np.asarray(v), y)
                 for t, v, y in docs], i % 2)
               for i, docs in enumerate(list(user_docs.values())[:4])]
    # 2 clusters + super at the end
    x = 0.3 * rng.standard_normal(3 * F1)
    from ir_base_ray.pipelines.dpadapt import dp_block_fg
    f0, g = dp_block_fg(entries, x, wA, F1, "mtclr", 2, False, 0.1)
    eps = 1e-6
    for i in range(0, x.size, 3):
        xp = x.copy()
        xp[i] += eps
        fp, _ = dp_block_fg(entries, xp, wA, F1, "mtclr", 2, False, 0.1)
        assert abs((fp - f0) / eps - g[i]) < 1e-3 * max(1.0, abs(g[i])), i

    out = train_dp_adaptation(user_docs, wA, model="mtclr", burn_in=4,
                              n_iters=8, eta1=0.05, eta2=0.05, seed=39)
    accs = []
    for i in range(12):
        w_true = wA if i % 2 == 0 else wB
        pw = out["personalized"][f"u{i}"]
        docs = docs_for(w_true, 30, 500 + i)
        accs.append(sum(
            int(((pw[0] + float((pw[t + 1] * v).sum())) > 0) == (y == 1))
            for t, v, y in docs) / 30)
    assert np.mean(accs) >= 0.85, accs
    assert out["super_model"] is not None
    assert out["super_model"].size == wA.size
    out2 = train_dp_adaptation(user_docs, wA, model="mtclr", burn_in=4,
                               n_iters=8, eta1=0.05, eta2=0.05, seed=39)
    assert out["assign"] == out2["assign"]
