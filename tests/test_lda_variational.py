"""LDA variational EM (R7): determinism, ELBO improvement, planted-topic
recovery."""

import numpy as np
import pyarrow as pa

import ray.data

from ir_base_ray.pipelines.lda_variational import train_lda_variational


def _toy(seed=3, per=15, V=10):
    rng = np.random.default_rng(seed)
    tids_list, vals_list = [], []
    for d in range(2 * per):
        base = 0 if d % 2 == 0 else 5
        tids = np.arange(base, base + 5)
        vals = rng.integers(2, 6, size=5)
        tids_list.append(tids.tolist())
        vals_list.append(vals.tolist())
    return tids_list, vals_list, V


def _as_ds(tids_list, vals_list, nparts=1):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(tids_list)), pa.int64()),
        "tids": pa.array(tids_list, pa.list_(pa.int64())),
        "vals": pa.array(vals_list, pa.list_(pa.float64())),
    }))
    return ds.repartition(nparts) if nparts > 1 else ds


def test_deterministic(ray_session):
    t, v, V = _toy()
    ds = _as_ds(t, v, 2)
    a = train_lda_variational(ds, n_topics=3, vocab_size=V, n_iters=4, seed=31)
    b = train_lda_variational(ds, n_topics=3, vocab_size=V, n_iters=4, seed=31)
    assert np.array_equal(a["log_topic_term"], b["log_topic_term"])
    assert np.array_equal(a["alpha"], b["alpha"])


def test_elbo_improves(ray_session):
    t, v, V = _toy()
    ds = _as_ds(t, v, 2)
    out = train_lda_variational(ds, n_topics=2, vocab_size=V, n_iters=8,
                                seed=31)
    trace = out["elbo_trace"]
    assert trace[-1] > trace[1]  # post-init ELBO rises over EM rounds


def test_topic_recovery(ray_session):
    t, v, V = _toy(per=25)
    ds = _as_ds(t, v, 3)
    out = train_lda_variational(ds, n_topics=2, vocab_size=V, n_iters=12,
                                alpha=0.5, beta=1.01, seed=31)
    beta = np.exp(out["log_topic_term"])
    mass_low = beta[:, :5].sum(axis=1)
    assert mass_low.max() > 0.8 and mass_low.min() < 0.2, mass_low
    # docs' inferred topics separate by construction
    th = np.concatenate(out["doc_topics"])
    even = th[::2].argmax(axis=1)
    odd = th[1::2].argmax(axis=1)
    assert (even == even[0]).mean() > 0.9 and (odd == 1 - even[0]).mean() > 0.9
