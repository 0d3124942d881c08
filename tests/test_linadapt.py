"""LinAdapt pins (modelAdaptation/CoLinAdapt/LinAdapt.java + RegLR.java)."""

import numpy as np
import pandas as pd

import ray.data

from ir_base_ray.pipelines.linadapt import (_user_value_grad, adapt_user,
                                            personalized_weights,
                                            train_linadapt)


def _docs_for_weights(w, n, seed, flip=None):
    """Linearly-separable docs under weight vector w (bias w[0]); ``flip``
    optionally inverts the labels (a user disagreeing with the global
    model)."""
    rng = np.random.default_rng(seed)
    F = w.size - 1
    docs = []
    for _ in range(n):
        tids = np.sort(rng.choice(F, size=4, replace=False)).astype(np.int64)
        vals = rng.uniform(0.5, 1.5, size=4)
        f = w[0] + float((w[tids + 1] * vals).sum())
        y = 1 if f > 0 else 0
        if flip:
            y = 1 - y
        docs.append((tids, vals, y))
    return docs


def test_gradient_matches_numeric():
    rng = np.random.default_rng(0)
    F = 6
    g_w = rng.standard_normal(F + 1)
    docs = _docs_for_weights(g_w, 5, 1)
    A = np.concatenate([np.ones(F + 1), np.zeros(F + 1)]) \
        + 0.1 * rng.standard_normal(2 * (F + 1))
    f0, g = _user_value_grad(A, g_w, docs, 0.5, 0.5)
    eps = 1e-6
    for i in range(A.size):
        Ap = A.copy()
        Ap[i] += eps
        fp, _ = _user_value_grad(Ap, g_w, docs, 0.5, 0.5)
        num = (fp - f0) / eps
        assert abs(num - g[i]) < 1e-4 * max(1.0, abs(g[i])), (i, num, g[i])


def test_adaptation_corrects_disagreeing_user():
    """A user whose labels invert the global decision should be fixed by
    their personal (a, b) while a strongly-regularized user stays global."""
    rng = np.random.default_rng(3)
    F = 10
    g_w = rng.standard_normal(F + 1) * 2.0
    docs = _docs_for_weights(g_w, 30, 4, flip=True)

    def acc(pw):
        ok = 0
        for tids, vals, y in docs:
            f = pw[0] + float((pw[tids + 1] * vals).sum())
            ok += int((f > 0) == (y == 1))
        return ok / len(docs)

    assert acc(g_w) <= 0.2                      # global is wrong for them
    a, b, _ = adapt_user(docs, g_w, eta1=0.01, eta2=0.01)
    assert acc(personalized_weights(a, b, g_w)) >= 0.9
    # heavy regularization pins a≈1, b≈0 → personalized ≈ global
    a2, b2, _ = adapt_user(docs, g_w, eta1=1e6, eta2=1e6)
    assert np.allclose(a2, 1.0, atol=1e-3) and np.allclose(b2, 0.0, atol=1e-3)


def test_distributed_matches_serial(ray_session):
    """groupby(user).map_groups == the per-user serial loop."""
    rng = np.random.default_rng(7)
    F = 8
    g_w = rng.standard_normal(F + 1)
    rows = []
    serial = {}
    for u in range(3):
        docs = _docs_for_weights(g_w, 12, 10 + u, flip=(u == 1))
        a, b, _ = adapt_user(docs, g_w)
        pw = personalized_weights(a, b, g_w)
        for i, (tids, vals, y) in enumerate(docs):
            did = u * 100 + i
            rows.append({"doc_id": did, "tids": tids.tolist(),
                         "vals": vals.tolist(), "label": y, "user": f"u{u}"})
            f = pw[0] + float((pw[tids + 1] * vals).sum())
            serial[did] = 1 if 1.0 / (1.0 + np.exp(-f)) > 0.5 else 0
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = train_linadapt(ds, g_w).to_pandas().sort_values("doc_id")
    got = dict(zip(out["doc_id"], out["pred"]))
    assert got == serial


def test_colinadapt_gradient_and_decoupling(ray_session):
    """CoLinAdapt joint objective: analytic gradient matches numeric, and
    with eta3=eta4=0 the joint optimum decomposes into independent per-user
    LinAdapt solutions."""
    import ray as _ray

    from ir_base_ray.pipelines.linadapt import (_colin_block_fg,
                                                build_neighbors,
                                                train_colinadapt)

    rng = np.random.default_rng(11)
    F = 5
    g_w = rng.standard_normal(F + 1)
    user_docs = {f"u{u}": _docs_for_weights(g_w, 8, 20 + u, flip=(u == 2))
                 for u in range(3)}
    users, nbrs = build_neighbors(user_docs, F + 1, topk=-1)
    dim = F + 1
    x = np.concatenate([np.concatenate([np.ones(dim), np.zeros(dim)])
                        for _ in users]) + 0.05 * rng.standard_normal(3 * 2 * dim)
    idx = list(range(3))
    f0, g = _ray.get(_colin_block_fg.remote(
        idx, [user_docs[u] for u in users], x, g_w, dim, 0.5, 0.5, 0.3, 0.4,
        [nbrs[i] for i in idx]))
    eps = 1e-6
    for i in range(0, x.size, 7):
        xp = x.copy()
        xp[i] += eps
        fp, _ = _ray.get(_colin_block_fg.remote(
            idx, [user_docs[u] for u in users], xp, g_w, dim, 0.5, 0.5, 0.3,
            0.4, [nbrs[i2] for i2 in idx]))
        num = (fp - f0) / eps
        assert abs(num - g[i]) < 1e-3 * max(1.0, abs(g[i])), (i, num, g[i])

    out = train_colinadapt(user_docs, g_w, topk=2, eta3=0.0, eta4=0.0,
                           n_blocks=2)
    for u, pw_joint in zip(out["users"], out["personalized"]):
        a, b, _ = adapt_user(user_docs[u], g_w)
        assert np.allclose(pw_joint, personalized_weights(a, b, g_w),
                           atol=5e-3), u


def test_colinadapt_coupling_pulls_sparse_user(ray_session):
    """A data-poor user coupled to a data-rich disagreeing-with-global
    neighbor should inherit the neighbor's correction through R2."""
    from ir_base_ray.pipelines.linadapt import train_colinadapt

    rng = np.random.default_rng(13)
    F = 8
    g_w = rng.standard_normal(F + 1) * 2.0
    rich = _docs_for_weights(g_w, 40, 30, flip=True)
    poor = _docs_for_weights(g_w, 2, 31, flip=True)
    user_docs = {"rich": rich, "poor": poor}

    def acc(pw, docs):
        ok = 0
        for tids, vals, y in docs:
            f = pw[0] + float((pw[tids + 1] * vals).sum())
            ok += int((f > 0) == (y == 1))
        return ok / len(docs)

    test_docs = _docs_for_weights(g_w, 30, 32, flip=True)
    uncoupled = train_colinadapt(user_docs, g_w, topk=-1, eta3=0.0, eta4=0.0)
    coupled = train_colinadapt(user_docs, g_w, topk=-1, eta3=2.0, eta4=2.0,
                               eta1=0.05, eta2=0.05)
    pw_u = dict(zip(uncoupled["users"], uncoupled["personalized"]))["poor"]
    pw_c = dict(zip(coupled["users"], coupled["personalized"]))["poor"]
    assert acc(pw_c, test_docs) >= acc(pw_u, test_docs)
    assert acc(pw_c, test_docs) >= 0.8


def test_mtsvm_gradient_sharing_and_parity(ray_session):
    """MT-SVM: numeric-gradient check on the joint augmented objective;
    a data-poor user inherits the shared signal through the global block;
    block count does not change the optimum (deterministic fixed-order
    partial sums over an identical objective)."""
    import ray as _ray

    from ir_base_ray.pipelines.linadapt import _mtsvm_block_fg, train_mtsvm

    rng = np.random.default_rng(17)
    F = 6
    w_true = rng.standard_normal(F + 1) * 2.0
    user_docs = {
        "a": [(t, v, y) for t, v, y in _docs_for_weights(w_true, 20, 40)],
        "b": [(t, v, y) for t, v, y in _docs_for_weights(w_true, 20, 41)],
        "poor": [(t, v, y) for t, v, y in _docs_for_weights(w_true, 2, 42)],
    }
    # numeric gradient on one block
    rows = []
    for i, (u, docs) in enumerate(user_docs.items()):
        for t, v, y in docs[:4]:
            rows.append((t, v, 1.0 if y == 1 else -1.0, i))
    dim = (F + 1) * 4
    x = 0.1 * rng.standard_normal(dim)
    f0, g = _ray.get(_mtsvm_block_fg.remote(rows, x, F + 1, 3, 1.0, 1.0))
    eps = 1e-6
    for i in range(0, dim, 5):
        xp = x.copy()
        xp[i] += eps
        fp, _ = _ray.get(_mtsvm_block_fg.remote(rows, xp, F + 1, 3, 1.0, 1.0))
        assert abs((fp - f0) / eps - g[i]) < 1e-3 * max(1.0, abs(g[i])), i

    out = train_mtsvm(user_docs, n_features=F, u=1.0, C=1.0, n_blocks=2)

    def acc(pw, docs):
        ok = 0
        for t, v, y in docs:
            s = pw[0] + float((pw[t + 1] * v).sum())
            ok += int((s > 0) == (y == 1))
        return ok / len(docs)

    test_docs = _docs_for_weights(w_true, 40, 43)
    # the 2-doc user must inherit the sharable signal through the global part
    assert acc(out["personalized"]["poor"], test_docs) >= 0.85
    out1 = train_mtsvm(user_docs, n_features=F, u=1.0, C=1.0, n_blocks=1)
    for u in out["users"]:
        assert np.allclose(out["personalized"][u], out1["personalized"][u],
                           atol=1e-4), u


def test_reglr_family(ray_session):
    """RegLR: numeric gradient; heavy η1 pins the user to the global model;
    CoRegLR with η2=0 decomposes to per-user RegLR; MTRegLR numeric
    gradient + data-poor-user sharing through the global block."""
    import ray as _ray

    from ir_base_ray.pipelines.linadapt import (_mtreglr_block_fg,
                                                _reglr_value_grad,
                                                adapt_user_reglr,
                                                train_coreglr, train_mtreglr)

    rng = np.random.default_rng(23)
    F = 6
    g_w = rng.standard_normal(F + 1)
    docs = _docs_for_weights(g_w, 10, 50, flip=True)
    w = 0.2 * rng.standard_normal(F + 1)
    f0, g = _reglr_value_grad(w, g_w, docs, 0.5)
    eps = 1e-6
    for i in range(F + 1):
        wp = w.copy()
        wp[i] += eps
        fp, _ = _reglr_value_grad(wp, g_w, docs, 0.5)
        assert abs((fp - f0) / eps - g[i]) < 1e-4 * max(1.0, abs(g[i])), i

    w_pinned, _ = adapt_user_reglr(docs, g_w, eta1=1e6)
    assert np.allclose(w_pinned, g_w, atol=1e-3)

    user_docs = {f"u{k}": _docs_for_weights(g_w, 10, 60 + k, flip=(k == 1))
                 for k in range(3)}
    out = train_coreglr(user_docs, g_w, topk=2, eta2=0.0, n_blocks=2)
    for u in out["users"]:
        w_solo, _ = adapt_user_reglr(user_docs[u], g_w)
        assert np.allclose(out["personalized"][u], w_solo, atol=5e-3), u

    # MTRegLR gradient check
    rows = []
    for i, (u, docs_u) in enumerate(user_docs.items()):
        for t, v, y in docs_u[:4]:
            rows.append((t, v, y, i))
    dim = (F + 1) * 4
    x = 0.1 * rng.standard_normal(dim)
    f0, g = _ray.get(_mtreglr_block_fg.remote(rows, x, F + 1, 3, 1.0, g_w,
                                              0.001))
    for i in range(0, dim, 5):
        xp = x.copy()
        xp[i] += eps
        fp, _ = _ray.get(_mtreglr_block_fg.remote(rows, xp, F + 1, 3, 1.0,
                                                  g_w, 0.001))
        assert abs((fp - f0) / eps - g[i]) < 1e-3 * max(1.0, abs(g[i])), i

    mt_docs = {
        "a": [(t, v, y) for t, v, y in _docs_for_weights(g_w, 20, 70,
                                                         flip=True)],
        "b": [(t, v, y) for t, v, y in _docs_for_weights(g_w, 20, 71,
                                                         flip=True)],
        "poor": [(t, v, y) for t, v, y in _docs_for_weights(g_w, 2, 72,
                                                            flip=True)],
    }
    mt = train_mtreglr(mt_docs, g_w, eta1=0.001)
    # rich users fit their adaptation data exactly (the data term dominates
    # at small η1); NOTE the MTRegLR objective has no joint ℓ2 term, so HOW
    # the fit splits between w_u and the global block is unidentifiable —
    # only the effective per-user model is pinned
    for u in ("a", "b"):
        pw = mt["personalized"][u]
        ok = sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                     == (y == 1)) for t, v, y in mt_docs[u])
        assert ok == len(mt_docs[u]), u
    # heavy η1 pins every effective model to the old global w_0
    mt_pin = train_mtreglr(mt_docs, g_w, eta1=1e6)
    for u in mt_pin["users"]:
        assert np.allclose(mt_pin["personalized"][u], g_w, atol=1e-2), u
    mt2 = train_mtreglr(mt_docs, g_w, eta1=0.001)
    for u in mt["users"]:
        assert np.array_equal(mt["personalized"][u], mt2["personalized"][u])


def test_weighted_avg_adapt(ray_session):
    """WeightedAvgAdapt: numeric gradient of the averaged-logit objective;
    with topk=0 (no neighbors, θ_ii=1) it reduces to per-user RegLR."""
    import ray as _ray

    from ir_base_ray.pipelines.linadapt import (_avg_theta, _wavg_block_fg,
                                                adapt_user_reglr,
                                                build_neighbors,
                                                train_weighted_avg_adapt)

    rng = np.random.default_rng(31)
    F = 6
    g_w = rng.standard_normal(F + 1)
    user_docs = {f"u{k}": _docs_for_weights(g_w, 10, 80 + k, flip=(k == 1))
                 for k in range(3)}
    users, nbrs = build_neighbors(user_docs, F + 1, topk=-1)
    theta = _avg_theta(nbrs)
    x = np.tile(g_w, 3) + 0.1 * rng.standard_normal(3 * (F + 1))
    idx = [0, 1, 2]
    f0, g = _ray.get(_wavg_block_fg.remote(
        idx, [user_docs[u] for u in users], x, g_w, F + 1, 0.5,
        [theta[i] for i in idx]))
    eps = 1e-6
    for i in range(0, x.size, 4):
        xp = x.copy()
        xp[i] += eps
        fp, _ = _ray.get(_wavg_block_fg.remote(
            idx, [user_docs[u] for u in users], xp, g_w, F + 1, 0.5,
            [theta[i2] for i2 in idx]))
        assert abs((fp - f0) / eps - g[i]) < 1e-3 * max(1.0, abs(g[i])), i

    out = train_weighted_avg_adapt(user_docs, g_w, topk=0, n_blocks=2)
    for u in out["users"]:
        w_solo, _ = adapt_user_reglr(user_docs[u], g_w)
        assert np.allclose(out["personalized"][u], w_solo, atol=5e-3), u


def test_async_reglr_online(ray_session):
    """asyncRegLR: the online pass moves a disagreeing user away from the
    global model in the right direction, deterministically."""
    from ir_base_ray.pipelines.linadapt import adapt_user_async_reglr

    rng = np.random.default_rng(37)
    F = 8
    g_w = rng.standard_normal(F + 1) * 2.0
    docs = _docs_for_weights(g_w, 60, 90, flip=True)
    w = adapt_user_async_reglr(docs, g_w, eta1=0.01, init_step=2.0)
    w2 = adapt_user_async_reglr(docs, g_w, eta1=0.01, init_step=2.0)
    assert np.array_equal(w, w2)

    def acc(pw):
        return sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                       == (y == 1)) for t, v, y in docs) / len(docs)

    assert acc(w) > acc(g_w)   # moved toward the user's flipped labels


def test_mtlinadapt(ray_session):
    """MTLinAdapt: per-user transforms over a learned super model. With a
    zero global model, signal can only flow through the super SHIFTING
    block (scaling multiplies zeros) — good fit proves the joint super
    learning; heavy user-R1 pins every user's transform to identity so all
    personalized models collapse onto the super weights."""
    from ir_base_ray.pipelines.linadapt import train_mtlinadapt

    rng = np.random.default_rng(41)
    F = 8
    w_true = rng.standard_normal(F + 1) * 2.0
    user_docs = {
        f"u{k}": [(t, v, y) for t, v, y in _docs_for_weights(w_true, 20,
                                                             50 + k)]
        for k in range(3)
    }
    out = train_mtlinadapt(user_docs, np.zeros(F + 1), eta1=0.01, eta2=0.01,
                           eta3=0.01, eta4=0.001)
    for u, docs in user_docs.items():
        pw = out["personalized"][u]
        ok = sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                     == (y == 1)) for t, v, y in docs)
        assert ok / len(docs) >= 0.9, u
    pinned = train_mtlinadapt(user_docs, np.zeros(F + 1), eta1=1e6,
                              eta2=1e6, eta3=0.01, eta4=0.001)
    ws = pinned["super_weights"]
    for u in pinned["users"]:
        assert np.allclose(pinned["personalized"][u], ws, atol=1e-2), u


def test_mtsvm_clusters(ray_session):
    """MT-SVM-with-clusters: numeric gradient of the three-block objective;
    at unit coefficients it matches plain MT-SVM's behavior class (fits
    users); the divide-train / multiply-predict coefficient quirk is pinned
    (they disagree away from 1)."""
    import ray as _ray

    from ir_base_ray.pipelines.linadapt import (_mtsvm_cluster_block_fg,
                                                cluster_users_kmeans,
                                                train_mtsvm_clusters)

    rng = np.random.default_rng(43)
    F = 6
    wA = rng.standard_normal(F + 1) * 2.0
    user_docs = {
        f"u{k}": [(t, v, y) for t, v, y in
                  _docs_for_weights(wA, 15, 60 + k, flip=(k >= 2))]
        for k in range(4)
    }
    clusters = {f"u{k}": 0 if k < 2 else 1 for k in range(4)}
    rows = []
    for i, (u, docs) in enumerate(user_docs.items()):
        for t, v, y in docs[:4]:
            rows.append((t, v, 1.0 if y == 1 else -1.0, i))
    dim = (F + 1) * 7
    x = 0.1 * rng.standard_normal(dim)
    f0, g = _ray.get(_mtsvm_cluster_block_fg.remote(
        rows, x, F + 1, 4, 2, 0.7, 1.3, 2.0, 1.0, [0, 0, 1, 1]))
    eps = 1e-6
    for i in range(0, dim, 6):
        xp = x.copy()
        xp[i] += eps
        fp, _ = _ray.get(_mtsvm_cluster_block_fg.remote(
            rows, xp, F + 1, 4, 2, 0.7, 1.3, 2.0, 1.0, [0, 0, 1, 1]))
        assert abs((fp - f0) / eps - g[i]) < 1e-3 * max(1.0, abs(g[i])), i

    out = train_mtsvm_clusters(user_docs, clusters, n_features=F,
                               n_clusters=2)
    for u, docs in user_docs.items():
        pw = out["personalized"][u]
        ok = sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                     == (y == 1)) for t, v, y in docs)
        assert ok / len(docs) >= 0.9, u
    km = cluster_users_kmeans(user_docs, F + 1, k=2)
    assert set(km.values()) <= {0, 1} and len(km) == 4


def test_async_linadapt_online(ray_session):
    """asyncLinAdapt: the online transform pass moves a disagreeing user's
    personalized model toward their labels, deterministically."""
    from ir_base_ray.pipelines.linadapt import adapt_user_async_linadapt

    rng = np.random.default_rng(47)
    F = 8
    g_w = rng.standard_normal(F + 1) * 2.0
    docs = _docs_for_weights(g_w, 50, 95, flip=True)
    a, b = adapt_user_async_linadapt(docs, g_w, eta1=0.01, eta2=0.01,
                                     init_step=2.0)
    a2, b2 = adapt_user_async_linadapt(docs, g_w, eta1=0.01, eta2=0.01,
                                       init_step=2.0)
    assert np.array_equal(a, a2) and np.array_equal(b, b2)
    pw = personalized_weights(a, b, g_w)

    def acc(w):
        return sum(int(((w[0] + float((w[t + 1] * v).sum())) > 0)
                       == (y == 1)) for t, v, y in docs) / len(docs)

    assert acc(pw) > acc(g_w)


def test_async_colinadapt_online(ray_session):
    """asyncCoLinAdapt: online co-adaptation corrects a disagreeing user
    and couples a data-poor user to its rich neighbor (one-sided R2);
    deterministic; the reglr flavor (asyncCoRegLR) runs too."""
    from ir_base_ray.pipelines.linadapt import train_async_colinadapt

    rng = np.random.default_rng(53)
    F = 8
    g_w = rng.standard_normal(F + 1) * 2.0
    rich = _docs_for_weights(g_w, 40, 70, flip=True)
    poor = _docs_for_weights(g_w, 2, 71, flip=True)
    user_docs = {"rich": rich, "poor": poor}
    out = train_async_colinadapt(user_docs, g_w, topk=-1, eta1=0.05,
                                 eta2=0.05, eta3=1.0, eta4=1.0,
                                 init_step=2.0)
    out2 = train_async_colinadapt(user_docs, g_w, topk=-1, eta1=0.05,
                                  eta2=0.05, eta3=1.0, eta4=1.0,
                                  init_step=2.0)
    for u in out["users"]:
        assert np.array_equal(out["personalized"][u],
                              out2["personalized"][u])

    def acc(pw, docs):
        return sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                       == (y == 1)) for t, v, y in docs) / len(docs)

    test_docs = _docs_for_weights(g_w, 30, 72, flip=True)
    assert acc(out["personalized"]["rich"], test_docs) > acc(g_w, test_docs)
    # poor user pulled toward the rich neighbor's correction
    assert acc(out["personalized"]["poor"], test_docs) >= acc(g_w, test_docs)
    reg = train_async_colinadapt(user_docs, g_w, topk=-1, eta1=0.05,
                                 eta3=1.0, init_step=2.0, reglr=True)
    assert acc(reg["personalized"]["rich"], test_docs) > acc(g_w, test_docs)


def test_clinadapt_kmeans(ray_session):
    """CLinAdaptWithKmeans: numeric gradient of the three-level transform
    objective; fits users; heavy user-R1 pushes the fit into the shared
    cluster/global transform blocks (all same-cluster users collapse onto
    one model)."""
    import ray as _ray

    from ir_base_ray.pipelines.linadapt import (_clin_kmeans_block_fg,
                                                train_clinadapt_kmeans)

    rng = np.random.default_rng(59)
    F = 6
    g_w = rng.standard_normal(F + 1) * 2.0
    user_docs = {
        f"u{k}": [(t, v, y) for t, v, y in
                  _docs_for_weights(g_w, 12, 80 + k, flip=(k >= 2))]
        for k in range(4)
    }
    clusters = {f"u{k}": 0 if k < 2 else 1 for k in range(4)}
    rows = []
    for i, (u, docs) in enumerate(user_docs.items()):
        for t, v, y in docs[:3]:
            rows.append((t, v, y, i, 3))
    dim = 2 * (F + 1) * 7
    x = np.tile(np.concatenate([np.ones(F + 1), np.zeros(F + 1)]), 7) \
        + 0.05 * rng.standard_normal(dim)
    f0, g = _ray.get(_clin_kmeans_block_fg.remote(
        rows, x, g_w, F + 1, 4, 2, 1.0, 1.0, 1.0, 0.5, 0.5, [0, 0, 1, 1],
        True))
    eps = 1e-6
    for i in range(0, dim, 9):
        xp = x.copy()
        xp[i] += eps
        fp, _ = _ray.get(_clin_kmeans_block_fg.remote(
            rows, xp, g_w, F + 1, 4, 2, 1.0, 1.0, 1.0, 0.5, 0.5,
            [0, 0, 1, 1], True))
        assert abs((fp - f0) / eps - g[i]) < 1e-3 * max(1.0, abs(g[i])), i

    out = train_clinadapt_kmeans(user_docs, clusters, g_w, n_clusters=2,
                                 eta1=0.05, eta2=0.05)
    for u, docs in user_docs.items():
        pw = out["personalized"][u]
        ok = sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                     == (y == 1)) for t, v, y in docs)
        assert ok / len(docs) >= 0.8, u
    pinned = train_clinadapt_kmeans(user_docs, clusters, g_w, n_clusters=2,
                                    eta1=1e6, eta2=1e6, eta3=0.01,
                                    eta4=0.01)
    pa = pinned["personalized"]
    assert np.allclose(pa["u0"], pa["u1"], atol=1e-2)   # same cluster
    assert np.allclose(pa["u2"], pa["u3"], atol=1e-2)


def test_weighted_avg_trans_adapt(ray_session):
    """WeightedAvgTransAdapt: numeric gradient of the θ-averaged transform
    objective (with the documented self-offset bug fix); with topk=0 it
    reduces to per-user LinAdapt."""
    import ray as _ray

    from ir_base_ray.pipelines.linadapt import (_avg_theta,
                                                _wavgtrans_block_fg,
                                                build_neighbors,
                                                train_weighted_avg_trans_adapt)

    rng = np.random.default_rng(61)
    F = 5
    g_w = rng.standard_normal(F + 1)
    user_docs = {f"u{k}": _docs_for_weights(g_w, 8, 90 + k, flip=(k == 1))
                 for k in range(3)}
    users, nbrs = build_neighbors(user_docs, F + 1, topk=-1)
    theta = _avg_theta(nbrs)
    pdim = 2 * (F + 1)
    x = np.tile(np.concatenate([np.ones(F + 1), np.zeros(F + 1)]), 3) \
        + 0.05 * rng.standard_normal(3 * pdim)
    idx = [0, 1, 2]
    f0, g = _ray.get(_wavgtrans_block_fg.remote(
        idx, [user_docs[u] for u in users], x, g_w, F + 1, 0.5, 0.5,
        [theta[i] for i in idx], None))
    eps = 1e-6
    for i in range(0, x.size, 5):
        xp = x.copy()
        xp[i] += eps
        fp, _ = _ray.get(_wavgtrans_block_fg.remote(
            idx, [user_docs[u] for u in users], xp, g_w, F + 1, 0.5, 0.5,
            [theta[i2] for i2 in idx], None))
        assert abs((fp - f0) / eps - g[i]) < 1e-3 * max(1.0, abs(g[i])), i

    out = train_weighted_avg_trans_adapt(user_docs, g_w, topk=0, n_blocks=2)
    for u in out["users"]:
        a, b, _ = adapt_user(user_docs[u], g_w)
        assert np.allclose(out["personalized"][u],
                           personalized_weights(a, b, g_w), atol=5e-3), u


def test_mtcolinadapt(ray_session):
    """MTCoLinAdapt: MTLinAdapt + the R2 neighbor graph. Fit holds; the
    coupling pulls a sparse user toward its data-rich neighbor (same
    device as the CoLinAdapt coupling test, now through the super model)."""
    from ir_base_ray.pipelines.linadapt import train_mtcolinadapt

    rng = np.random.default_rng(43)
    F = 8
    w_true = rng.standard_normal(F + 1) * 2.0
    user_docs = {
        f"u{k}": [(t, v, y) for t, v, y in _docs_for_weights(w_true, 20,
                                                             60 + k)]
        for k in range(3)
    }
    user_docs["sparse"] = _docs_for_weights(w_true, 1, 99)
    out = train_mtcolinadapt(user_docs, np.zeros(F + 1), topk=2, eta1=0.01,
                             eta2=0.01, eta3=0.05, eta4=0.05)
    for u in ("u0", "u1", "u2"):
        pw = out["personalized"][u]
        docs = user_docs[u]
        ok = sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                     == (y == 1)) for t, v, y in docs)
        assert ok / len(docs) >= 0.9, u
    # sparse user's held-out accuracy benefits from the coupling
    heldout = _docs_for_weights(w_true, 30, 123)
    pw = out["personalized"]["sparse"]
    ok = sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0) == (y == 1))
             for t, v, y in heldout)
    assert ok / 30 >= 0.7, ok / 30


def test_mtlinadapt_supnoadapt(ray_session):
    """MTLinAdaptWithSupUserNoAdapt: decision A_i(p·w_s + q·w_g)ᵀx with a
    RAW super weight vector. Gradient check vs finite differences, then
    fit with a zero global model (q-path dead ⇒ w_s must carry signal)."""
    from ir_base_ray.pipelines.linadapt import (_supnoadapt_block_fg,
                                                train_mtlinadapt_supnoadapt)

    rng = np.random.default_rng(47)
    F = 6
    F1 = F + 1
    g_w = rng.standard_normal(F1)
    docs = _docs_for_weights(g_w, 5, 7)
    entries = [([(np.asarray(t), np.asarray(v), y) for t, v, y in docs], 0),
               ([(np.asarray(t), np.asarray(v), y)
                 for t, v, y in docs[:3]], 1)]
    x = np.concatenate([np.ones(F1), np.zeros(F1)] * 2 + [g_w * 0.5]) \
        + 0.05 * rng.standard_normal(5 * F1)
    f0, g = ray.get(_supnoadapt_block_fg.remote(entries, x, g_w, 2, 0.7,
                                                0.3, False))
    eps = 1e-6
    for i in range(0, x.size, 3):
        xp = x.copy()
        xp[i] += eps
        fp, _ = ray.get(_supnoadapt_block_fg.remote(entries, xp, g_w, 2,
                                                    0.7, 0.3, False))
        assert abs((fp - f0) / eps - g[i]) < 1e-3 * max(1.0, abs(g[i])), i

    w_true = rng.standard_normal(F1) * 2.0
    user_docs = {f"u{k}": _docs_for_weights(w_true, 20, 70 + k)
                 for k in range(3)}
    out = train_mtlinadapt_supnoadapt(user_docs, np.zeros(F1), eta1=0.01,
                                      eta2=0.01, beta=0.01)
    for u, docs in user_docs.items():
        pw = out["personalized"][u]
        ok = sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                     == (y == 1)) for t, v, y in docs)
        assert ok / len(docs) >= 0.9, u


def test_async_mt_variants(ray_session):
    """asyncMTRegLR + asyncMTLinAdapt: online MT updates improve on the
    zero/global start, are deterministic, and move the shared block."""
    from ir_base_ray.pipelines.linadapt import (train_async_mtlinadapt,
                                                train_async_mtreglr)

    rng = np.random.default_rng(53)
    F = 8
    w_true = rng.standard_normal(F + 1) * 2.0
    user_docs = {f"u{k}": _docs_for_weights(w_true, 30, 80 + k)
                 for k in range(4)}

    g_half = 0.5 * w_true      # a weak pre-trained global model (the R1
    out = train_async_mtreglr(user_docs, g_half, init_step=0.5)
    accs = []                  # anchors w_u + u·w_glb to it)
    for u, docs in user_docs.items():
        pw = out["personalized"][u]
        accs.append(sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                            == (y == 1)) for t, v, y in docs) / len(docs))
    assert np.mean(accs) >= 0.9, accs
    assert not np.allclose(out["global_weights"], g_half)
    out2 = train_async_mtreglr(user_docs, g_half, init_step=0.5)
    assert np.allclose(out["global_weights"], out2["global_weights"])

    outl = train_async_mtlinadapt(user_docs, w_true, init_step=0.05)
    accs = []
    for u, docs in user_docs.items():
        pw = outl["personalized"][u]
        accs.append(sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                            == (y == 1)) for t, v, y in docs) / len(docs))
    assert np.mean(accs) >= 0.8, accs
    outl2 = train_async_mtlinadapt(user_docs, w_true, init_step=0.05)
    assert np.allclose(outl["super_transform"], outl2["super_transform"])


def test_async_first_order(ray_session):
    """asyncCoLinAdaptFirstOrder / asyncCoRegLRFirstOrder: neighbor blocks
    move on every arrival (symmetric R2 + related R1 + cache replay),
    runs deterministic, and still learns the two-population split."""
    from ir_base_ray.pipelines.linadapt import train_async_colinadapt

    rng = np.random.default_rng(59)
    F = 8
    wA = rng.standard_normal(F + 1) * 2.0
    # one population: BoW-profile neighbors are label-uninformative in this
    # fixture, so the coupling must HELP, not fight, the shared signal
    user_docs = {f"u{i}": _docs_for_weights(wA, 15, 90 + i)
                 for i in range(8)}
    out = train_async_colinadapt(user_docs, np.zeros(F + 1), topk=2,
                                 first_order=True, nbr_history_weight=0.1)
    accs = []
    for i in range(8):
        u = f"u{i}"
        pw = out["personalized"][u]
        accs.append(sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                            == (y == 1))
                        for t, v, y in user_docs[u]) / len(user_docs[u]))
    assert np.mean(accs) >= 0.75, accs
    out2 = train_async_colinadapt(user_docs, np.zeros(F + 1), topk=2,
                                  first_order=True, nbr_history_weight=0.1)
    assert all(np.allclose(out["personalized"][u], out2["personalized"][u])
               for u in user_docs)
    # differs from the base async variant (the neighbor updates are real)
    base = train_async_colinadapt(user_docs, np.zeros(F + 1), topk=2)
    assert not np.allclose(out["personalized"]["u0"],
                           base["personalized"]["u0"])
    outr = train_async_colinadapt(user_docs, np.zeros(F + 1), topk=2,
                                  reglr=True, first_order=True,
                                  nbr_history_weight=0.1)
    outr2 = train_async_colinadapt(user_docs, np.zeros(F + 1), topk=2,
                                   reglr=True, first_order=True,
                                   nbr_history_weight=0.1)
    assert all(np.allclose(outr["personalized"][u], outr2["personalized"][u])
               for u in user_docs)


def test_colinadapt_diffgroups(ray_session):
    """CoLinAdaptWithDiffFeatureGroups: finite-difference gradient check of
    the two-transform softmax block (incl. non-identity group maps), and
    the fit recovering a user's labels."""
    from ir_base_ray.pipelines.linadapt import (_diffgroups_block_fg,
                                                build_neighbors,
                                                train_colinadapt_diffgroups)

    rng = np.random.default_rng(61)
    F = 6
    F1 = F + 1
    g_w = rng.standard_normal(F1)
    user_docs = {f"u{k}": _docs_for_weights(g_w, 8, 200 + k)
                 for k in range(3)}
    users, nbrs = build_neighbors(user_docs, F1, 2)
    # non-identity group maps: A halves the space, B identity
    map_a = np.array([0] + [1 + i // 2 for i in range(F)], dtype=np.int64)
    map_b = np.arange(F1, dtype=np.int64)
    dim_a = int(map_a.max()) + 1
    x = np.concatenate([
        np.tile(np.concatenate([np.ones(dim_a), np.zeros(dim_a)]), 3),
        np.tile(np.concatenate([np.ones(F1), np.zeros(F1)]), 3),
    ]) + 0.05 * rng.standard_normal(3 * 2 * dim_a + 3 * 2 * F1)
    blk = [0, 1, 2]
    docs_blk = [user_docs[users[i]] for i in blk]
    nbrs_blk = [nbrs[i] for i in blk]
    f0, g = ray.get(_diffgroups_block_fg.remote(
        blk, docs_blk, x, g_w, dim_a, F1, map_a, map_b, 3, 1.0, 1.0,
        nbrs_blk, 0.1, 0.1, 0.1, 0.1))
    eps = 1e-6
    for i in range(0, x.size, 4):
        xp = x.copy()
        xp[i] += eps
        fp, _ = ray.get(_diffgroups_block_fg.remote(
            blk, docs_blk, xp, g_w, dim_a, F1, map_a, map_b, 3, 1.0, 1.0,
            nbrs_blk, 0.1, 0.1, 0.1, 0.1))
        assert abs((fp - f0) / eps - g[i]) < 1e-3 * max(1.0, abs(g[i])), i

    w_true = rng.standard_normal(F1) * 2.0
    user_docs = {f"u{k}": _docs_for_weights(w_true, 20, 210 + k)
                 for k in range(3)}
    out = train_colinadapt_diffgroups(user_docs, w_true, topk=2, eta1=0.05,
                                      eta2=0.05, eta3=0.05, eta4=0.05)
    for u, docs in user_docs.items():
        pw = out["personalized"][u]
        ok = sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                     == (y == 1)) for t, v, y in docs)
        assert ok / len(docs) >= 0.9, u


def test_colinadapt_neighborhood(ray_session):
    """CoLinAdaptWithNeighborhoodLearning: the alternation re-weights edges
    through the learned per-user similarity LR (weights in (0,1)), keeps
    the fit, and is deterministic."""
    from ir_base_ray.pipelines.linadapt import train_colinadapt_neighborhood

    rng = np.random.default_rng(67)
    F = 8
    w_true = rng.standard_normal(F + 1) * 2.0
    user_docs = {f"u{k}": _docs_for_weights(w_true, 15, 220 + k)
                 for k in range(5)}
    out = train_colinadapt_neighborhood(user_docs, w_true, topk=2,
                                        max_rounds=2, eta1=0.1, eta2=0.1,
                                        eta3=0.1, eta4=0.1)
    for u, docs in user_docs.items():
        pw = out["personalized"][out["users"].index(u)]
        ok = sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                     == (y == 1)) for t, v, y in docs)
        assert ok / len(docs) >= 0.85, u
    for i, edges in out["learned_neighbors"].items():
        for j, s in edges:
            assert 0.0 < s < 1.0, (i, j, s)
    out2 = train_colinadapt_neighborhood(user_docs, w_true, topk=2,
                                         max_rounds=2, eta1=0.1, eta2=0.1,
                                         eta3=0.1, eta4=0.1)
    assert np.allclose(out["A"], out2["A"])


def test_cross_feature_selection(ray_session):
    """CrossFeatureSelection: k-fold SVMs + KMeansAlg4Vct over per-feature
    weight profiles produce a usable feature-group map — correlated
    features land in the same group, deterministic."""
    import ray.data as rd

    from ir_base_ray.pipelines.linadapt import cross_feature_selection

    rng = np.random.default_rng(71)
    F = 12
    w_true = np.zeros(F + 1)
    w_true[1:5] = 3.0          # features 0-3 strongly positive
    w_true[5:9] = -3.0         # features 4-7 strongly negative
    rows = []
    for d in range(120):
        tids = np.sort(rng.choice(F, size=5, replace=False)).astype(np.int64)
        vals = np.ones(5)
        y = 1 if (w_true[0] + float((w_true[tids + 1] * vals).sum())) > 0 \
            else 0
        rows.append({"doc_id": d, "tids": tids.tolist(),
                     "vals": vals.tolist(), "label": y})
    ds = rd.from_pandas(pd.DataFrame(rows))
    groups, wk = cross_feature_selection(ds, n_classes=2, n_features=F,
                                         k_fold=3, k_means=3, max_iter=40)
    assert groups.shape == (F + 1,)
    assert groups[0] == 0                    # bias keeps its own group
    assert wk.shape == (3, F + 1)
    # positive-block features cluster together, negative-block together,
    # and the two blocks are separated
    pos = set(groups[1:5].tolist())
    neg = set(groups[5:9].tolist())
    assert len(pos) == 1 and len(neg) == 1 and pos != neg, groups
    groups2, _ = cross_feature_selection(ds, n_classes=2, n_features=F,
                                         k_fold=3, k_means=3, max_iter=40)
    assert np.array_equal(groups, groups2)


def test_individual_and_global_svm(ray_session):
    """IndividualSVM fits each user's own (even disagreeing) labels;
    GlobalSVM gives everyone the pooled model — the disagreeing user is
    badly served by global, perfectly by individual."""
    from ir_base_ray.pipelines.linadapt import (train_global_svm,
                                                train_individual_svm)

    rng = np.random.default_rng(73)
    F = 8
    w_true = rng.standard_normal(F + 1) * 2.0
    user_docs = {"a": _docs_for_weights(w_true, 25, 300),
                 "b": _docs_for_weights(w_true, 25, 301),
                 "contrarian": _docs_for_weights(w_true, 25, 302,
                                                 flip=True)}

    def acc(pw, docs):
        return sum(int(((pw[0] + float((pw[t + 1] * v).sum())) > 0)
                       == (y == 1)) for t, v, y in docs) / len(docs)

    ind = train_individual_svm(user_docs, n_features=F)
    glb = train_global_svm(user_docs, n_features=F)
    for u, docs in user_docs.items():
        assert acc(ind["personalized"][u], docs) >= 0.95, u
    assert acc(glb["personalized"]["contrarian"],
               user_docs["contrarian"]) <= 0.5
    assert np.allclose(glb["personalized"]["a"], glb["personalized"]["b"])
