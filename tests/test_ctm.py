"""CTM (variational correlated topic model): coordinate-update math checks,
per-doc ELBO improvement, KKT at the lambda optimum, topic recovery and
determinism."""

import numpy as np

from ir_base_ray.pipelines.ctm import (
    _likelihood, _opt_lambda, _opt_phi, _opt_zeta, _var_inference, train_ctm,
)


def test_opt_zeta_and_phi():
    K, K2 = 3, 2
    lam = np.array([0.5, -0.2, 0.0])
    nu2 = np.array([1.0, 0.5, 0.0])
    assert abs(_opt_zeta(lam, nu2, K2)
               - (1 + np.exp(1.0) + np.exp(0.05))) < 1e-12
    rng = np.random.default_rng(0)
    log_beta = np.log(rng.dirichlet(np.ones(8), size=K))
    jj = np.array([1, 4])
    phi = _opt_phi(jj, log_beta, lam)
    want = np.exp(log_beta[:, jj].T + lam[None, :])
    want /= want.sum(axis=1, keepdims=True)
    assert np.allclose(phi, want, atol=1e-12)
    assert np.allclose(phi.sum(axis=1), 1.0, atol=1e-12)


def test_lambda_optimum_kkt():
    rng = np.random.default_rng(3)
    K, K2, V = 3, 2, 10
    jj = np.arange(5)
    vv = rng.integers(1, 4, 5).astype(float)
    log_beta = np.log(rng.dirichlet(np.ones(V), size=K))
    phi = _opt_phi(jj, log_beta, np.zeros(K))
    nu2 = np.array([0.5, 0.5, 0.0])
    mu = np.array([0.1, -0.3])
    inv_cov = np.linalg.inv(np.array([[1.0, 0.3], [0.3, 2.0]]))
    zeta = _opt_zeta(np.zeros(K), nu2, K2)
    total = float(vv.sum())
    lam = _opt_lambda(jj, vv, phi, np.zeros(K), nu2, zeta, mu, inv_cov,
                      total, K2)
    # gradient of the (negated) objective at the solution ~ 0
    sum_phi = (vv[:, None] * phi[:, :K2]).sum(axis=0)
    g = sum_phi - inv_cov @ (lam[:K2] - mu) \
        - total * np.exp(lam[:K2] + 0.5 * nu2[:K2]) / zeta
    assert np.linalg.norm(g) < 1e-2 * max(1.0, np.linalg.norm(lam))
    assert lam[K2] == 0.0                      # pinned dimension


def test_var_inference_improves_elbo():
    rng = np.random.default_rng(7)
    K, K2, V = 3, 2, 12
    jj = np.array([0, 3, 5, 8])
    vv = rng.integers(1, 5, 4).astype(float)
    log_beta = np.log(rng.dirichlet(np.ones(V), size=K))
    mu = np.zeros(K2)
    inv_cov = np.eye(K2)
    lam = np.zeros(K)
    nu2 = np.full(K, 10.0)
    nu2[K2] = 0.0
    phi = np.full((len(jj), K), 1.0 / K)
    ll0 = _likelihood(jj, vv, phi, lam, nu2, 10.0, mu, inv_cov, 0.0,
                      log_beta, float(vv.sum()), K2)
    st, ll = _var_inference(jj, vv, (lam, nu2, 10.0, phi), mu, inv_cov, 0.0,
                            log_beta, K2, 20, 1e-6)
    assert ll > ll0
    lam2, nu22, zeta2, phi2 = st
    assert (nu22[:K2] > 0).all()
    assert np.allclose(phi2.sum(axis=1), 1.0, atol=1e-10)


def _group_docs(n=40, V=12, seed=5):
    """Docs need enough tokens for the likelihood to beat the logistic-
    normal prior's pull toward the corpus mean — short docs sit at the
    symmetric mean-field saddle (cov collapses, lambda pinned to mu), which
    is faithful CTM behaviour, not a bug."""
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        base = (i % 2) * 6
        jj = np.arange(base, base + 6)
        vv = rng.integers(5, 15, 6).astype(float)   # ~60 tokens per doc
        docs.append((jj, vv))
    return docs, V


def test_train_recovery_and_determinism(ray_session):
    docs, V = _group_docs()
    a = train_ctm(docs, n_topics=2, vocab_size=V, em_max_iter=25,
                  var_max_iter=15, seed=41, n_blocks=3)
    b = train_ctm(docs, n_topics=2, vocab_size=V, em_max_iter=25,
                  var_max_iter=15, seed=41, n_blocks=3)
    assert np.array_equal(a["log_topic_term"], b["log_topic_term"])
    assert np.array_equal(a["mu"], b["mu"])
    phi = np.exp(a["log_topic_term"])
    mass_low = phi[:, :6].sum(axis=1)
    assert mass_low.max() > 0.8 and mass_low.min() < 0.2, mass_low
    # doc lambdas separate the two groups on the single free dimension
    lams = np.array([l[0] for l in a["doc_lambdas"]])
    g0, g1 = lams[::2], lams[1::2]
    assert (g0.mean() - g1.mean()) * (phi[0, :6].sum() - phi[1, :6].sum()) > 0
    # covariance stays symmetric and positive on the diagonal
    assert np.allclose(a["cov"], a["cov"].T, atol=1e-12)
    assert (np.diag(a["cov"]) > 0).all()
