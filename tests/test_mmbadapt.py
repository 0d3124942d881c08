"""CLRWithMMB core pins (modelAdaptation/MMB/CLRWithMMB.java)."""

import numpy as np

from ir_base_ray.pipelines.mmbadapt import train_mmb_adaptation


def _world(F=8, n_users=10, n_docs=12, seed=5):
    rng = np.random.default_rng(seed)
    wA = rng.standard_normal(F + 1) * 4
    wB = -wA

    def docs_for(w, n, s):
        r = np.random.default_rng(s)
        out = []
        for _ in range(n):
            tids = np.sort(r.choice(F, size=5, replace=False)).astype(np.int64)
            vals = np.full(5, 2.0)
            out.append((tids, vals,
                        1 if (w[0] + float((w[tids + 1] * vals).sum())) > 0
                        else 0))
        return out

    user_docs = {f"u{i}": docs_for(wA if i % 2 == 0 else wB, n_docs, 100 + i)
                 for i in range(n_users)}
    edges = {}
    for i in range(n_users):
        for j in range(i + 1, n_users):
            edges[(f"u{i}", f"u{j}")] = 1 if (i % 2) == (j % 2) else 0
    return user_docs, edges, wA, wB, docs_for


def test_mmb_text_network_coupling(ray_session):
    """Same-population users are friends, cross-population pairs are
    non-edges: the MMB must (a) separate the populations' majority
    clusters, (b) release the cross-population zero edges to the (1−ρ)
    background model, (c) learn a block matrix whose within-population
    entries dominate the cross entries (the reference's MLEB uses the Beta
    MODE formula (e₁+a−1)/(e₀+e₁+a+b−2) with a=0.1, b=0.01 — invalid for
    low counts, so values may leave [0,1]; the ORDER is the meaningful
    signal — quirk transcribed), (d) fit held-out docs, (e) run
    deterministically."""
    user_docs, edges, wA, wB, docs_for = _world()
    out = train_mmb_adaptation(user_docs, edges, np.zeros(wA.size),
                               model="clr", burn_in=3, n_iters=6, seed=47)
    mx = out["mixtures"]
    major = {u: int(np.argmax(mx[u])) for u in mx}
    ca = {major[f"u{i}"] for i in range(0, 10, 2)}
    cb = {major[f"u{i}"] for i in range(1, 10, 2)}
    assert not (ca & cb), (ca, cb)
    # (b) all 25 cross-population zero edges should end in the background
    assert out["n_background_edges"] >= 20
    # (c) within-block connectivity dominates
    ka = next(iter(ca))
    kb = next(iter(cb))
    B = out["B"]
    assert B[ka, ka] > B[ka, kb]
    # (d) held-out accuracy through the majority-cluster models
    accs = []
    for i in range(10):
        w_true = wA if i % 2 == 0 else wB
        pw = out["personalized"][f"u{i}"]
        docs = docs_for(w_true, 30, 300 + i)
        accs.append(sum(
            int(((pw[0] + float((pw[t + 1] * v).sum())) > 0) == (y == 1))
            for t, v, y in docs) / 30)
    assert np.mean(accs) >= 0.8, accs
    # γ bookkeeping
    assert abs(sum(out["gammas"]) + out["gamma_e"] - 1.0) < 1e-9
    out2 = train_mmb_adaptation(user_docs, edges, np.zeros(wA.size),
                                model="clr", burn_in=3, n_iters=6, seed=47)
    assert all(np.array_equal(mx[u], out2["mixtures"][u]) for u in mx)


def test_mmb_clin_variant(ray_session):
    """CLinAdaptWithMMB: the same network coupling with cluster-shared
    LinAdapt transforms."""
    user_docs, edges, wA, wB, docs_for = _world(seed=7)
    out = train_mmb_adaptation(user_docs, edges, wA, model="clin",
                               burn_in=3, n_iters=6, eta1=0.01, eta2=0.01,
                               seed=53)
    accs = []
    for i in range(10):
        w_true = wA if i % 2 == 0 else wB
        pw = out["personalized"][f"u{i}"]
        docs = docs_for(w_true, 30, 400 + i)
        accs.append(sum(
            int(((pw[0] + float((pw[t + 1] * v).sum())) > 0) == (y == 1))
            for t, v, y in docs) / 30)
    assert np.mean(accs) >= 0.75, accs


def test_mmb_mt_variants(ray_session):
    """MTCLRWithMMB + MTCLinAdaptWithMMB: the multi-task super block joins
    the MMB doc+edge sampler; both recover the two-population split with
    good held-out accuracy and run deterministically."""
    user_docs, edges, wA, wB, docs_for = _world()

    def heldout_acc(out):
        accs = []
        for i in range(10):
            w_true = wA if i % 2 == 0 else wB
            pw = out["personalized"][f"u{i}"]
            docs = docs_for(w_true, 30, 900 + i)
            accs.append(sum(
                int(((pw[0] + float((pw[t + 1] * v).sum())) > 0) == (y == 1))
                for t, v, y in docs) / 30)
        return float(np.mean(accs))

    out = train_mmb_adaptation(user_docs, edges, wA, model="mtclr",
                               burn_in=2, n_iters=4, seed=47)
    assert out["super_model"] is not None and out["super_model"].size == wA.size
    assert heldout_acc(out) >= 0.8
    out2 = train_mmb_adaptation(user_docs, edges, wA, model="mtclr",
                                burn_in=2, n_iters=4, seed=47)
    assert np.allclose(out["super_model"], out2["super_model"])

    user_docs7, edges7, wA7, wB7, docs_for7 = _world(seed=7)
    outl = train_mmb_adaptation(user_docs7, edges7, wA7, model="mtclin",
                                burn_in=3, n_iters=6, eta1=0.01, eta2=0.01,
                                seed=53)
    assert outl["super_model"] is not None
    assert outl["super_model"].size == 2 * wA7.size
    accs = []
    for i in range(10):
        w_true = wA7 if i % 2 == 0 else wB7
        pw = outl["personalized"][f"u{i}"]
        docs = docs_for7(w_true, 30, 950 + i)
        accs.append(sum(
            int(((pw[0] + float((pw[t + 1] * v).sum())) > 0) == (y == 1))
            for t, v, y in docs) / 30)
    assert np.mean(accs) >= 0.75, accs
