"""LDA Gibbs (R7): 1-block distributed == serial bit-exact (AD-LDA with one
block IS collapsed Gibbs), determinism, and topic recovery on a synthetic
two-topic corpus."""

import numpy as np
import pyarrow as pa

import ray.data

from ir_base_ray.pipelines.lda import lda_gibbs_serial, train_lda_gibbs


def _toy_corpus(seed=3):
    """Two planted topics: word ids 0-4 vs 5-9."""
    rng = np.random.default_rng(seed)
    tids_list, vals_list = [], []
    for d in range(30):
        topic = d % 2
        base = 0 if topic == 0 else 5
        tids = np.arange(base, base + 5)
        vals = rng.integers(1, 5, size=5)
        tids_list.append(tids.tolist())
        vals_list.append(vals.tolist())
    return tids_list, vals_list, 10


def _as_ds(tids_list, vals_list):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(tids_list)), pa.int64()),
        "tids": pa.array(tids_list, pa.list_(pa.int64())),
        "vals": pa.array(vals_list, pa.list_(pa.float64())),
    }))


def test_single_block_matches_serial(ray_session):
    tids_list, vals_list, V = _toy_corpus()
    ds = _as_ds(tids_list, vals_list).repartition(1)
    dist = train_lda_gibbs(ds, n_topics=3, vocab_size=V, n_iters=12, seed=11)
    ser = lda_gibbs_serial(tids_list, vals_list, n_topics=3, vocab_size=V,
                           n_iters=12, seed=11)
    assert np.array_equal(dist["topic_term"], ser["topic_term"])
    assert np.array_equal(dist["doc_topics"][0], ser["doc_topics"])


def test_multiblock_deterministic(ray_session):
    tids_list, vals_list, V = _toy_corpus()
    ds = _as_ds(tids_list, vals_list).repartition(3)
    a = train_lda_gibbs(ds, n_topics=3, vocab_size=V, n_iters=10, seed=11)
    b = train_lda_gibbs(ds, n_topics=3, vocab_size=V, n_iters=10, seed=11)
    assert np.array_equal(a["topic_term"], b["topic_term"])


def test_topic_recovery(ray_session):
    """With two disjoint planted word sets, the learned topics separate them:
    for each planted set there is a topic putting >80% mass on it."""
    tids_list, vals_list, V = _toy_corpus()
    ds = _as_ds(tids_list, vals_list).repartition(2)
    out = train_lda_gibbs(ds, n_topics=2, vocab_size=V, n_iters=40,
                          alpha=0.5, beta=0.1, seed=11)
    phi = out["topic_term"]
    mass_low = phi[:, :5].sum(axis=1)   # per-topic mass on planted set A
    assert mass_low.max() > 0.8 and mass_low.min() < 0.2, mass_low


def test_gibbs_ckernel_bit_exact_parity():
    """The C sweep kernels (LDA + DCM-LDA) must match the pure-Python walks
    bit-exactly on the same Philox stream (pre-drawn uniforms == per-token
    draws)."""
    import os

    import numpy as np

    from ir_base_ray.functions import ckernels
    from ir_base_ray.pipelines.dcmlda import train_dcmlda
    from ir_base_ray.pipelines.lda import lda_gibbs_serial

    rng = np.random.default_rng(3)
    tids = [np.unique(rng.integers(0, 300, size=rng.integers(3, 40)))
            for _ in range(60)]
    vals = [rng.integers(1, 4, size=len(t)) for t in tids]
    docs = [(t.tolist(), v.tolist()) for t, v in zip(tids, vals)]

    lda_c = lda_gibbs_serial(tids, vals, n_topics=4, vocab_size=300,
                             n_iters=6, seed=11)
    dcm_c = train_dcmlda(docs, n_topics=4, vocab_size=300, n_em_iters=2,
                         inner_iters=3, seed=41)
    os.environ["IRBR_NO_CKERNELS"] = "1"
    ckernels._lda_tried = ckernels._dcm_tried = False
    ckernels._lda_lib = ckernels._dcm_lib = None
    try:
        lda_py = lda_gibbs_serial(tids, vals, n_topics=4, vocab_size=300,
                                  n_iters=6, seed=11)
        dcm_py = train_dcmlda(docs, n_topics=4, vocab_size=300, n_em_iters=2,
                              inner_iters=3, seed=41)
    finally:
        del os.environ["IRBR_NO_CKERNELS"]
        ckernels._lda_tried = ckernels._dcm_tried = False
        ckernels._lda_lib = ckernels._dcm_lib = None
    assert np.array_equal(lda_c["topic_term"], lda_py["topic_term"])
    assert np.array_equal(dcm_c["topic_term"], dcm_py["topic_term"])


def test_heldout_perplexity(ray_session):
    """LDA_Gibbs_test.Evaluation: frozen-model inference perplexity on
    held-out words beats the uniform bound on a planted two-half corpus,
    is deterministic, and degrades when the model is garbage."""
    import pandas as pd
    import ray.data as rd

    from ir_base_ray.pipelines.lda import (lda_heldout_perplexity,
                                           train_lda_gibbs)

    rng = np.random.default_rng(3)
    V, K = 20, 4

    def make(n, offset=0):
        rows = []
        for d in range(n):
            half = d % 2
            vocab = np.arange(10) + 10 * half
            t = np.sort(rng.choice(vocab, size=6, replace=False))
            rows.append({"doc_id": d + offset, "tids": t.tolist(),
                         "vals": [2] * 6})
        return rd.from_pandas(pd.DataFrame(rows))

    train = make(60)
    test = make(20, 1000)
    out = train_lda_gibbs(train, n_topics=K, vocab_size=V, n_iters=25,
                          beta=0.1, seed=19)
    ev = lda_heldout_perplexity(test, out, n_topics=K, test_prop=0.25,
                                n_iters=15, seed=91)
    assert ev["perplexity"] < V          # beats uniform over the vocab
    assert ev["per_doc"]["test_len"].sum() > 0
    ev2 = lda_heldout_perplexity(test, out, n_topics=K, test_prop=0.25,
                                 n_iters=15, seed=91)
    assert ev["perplexity"] == ev2["perplexity"]
    # a garbage model (uniform tables) must do no better than uniform
    bad = {"word_topic_sstat": np.ones_like(out["word_topic_sstat"]),
           "m_sstat": np.full(K, float(V)),
           "topic_term": np.full((K, V), 1.0 / V)}
    evb = lda_heldout_perplexity(test, bad, n_topics=K, test_prop=0.25,
                                 n_iters=15, seed=91)
    assert evb["perplexity"] >= V - 1e-6
    assert ev["perplexity"] < evb["perplexity"]
