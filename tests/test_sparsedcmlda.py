"""sparseDCMLDA / sparseClusterDCMLDA pins (topicmodels/DCM/sparseDCMLDA.java,
sparseClusterDCMLDA.java)."""

import numpy as np

from ir_base_ray.pipelines.sparsedcmlda import (_init_doc, _sample_topics,
                                                train_sparse_cluster_dcmlda,
                                                train_sparse_dcmlda)


def _two_vocab_docs(n=60, seed=2):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        base = 0 if i % 2 == 0 else 30
        tid = np.unique(rng.integers(base, base + 30,
                                     size=rng.integers(5, 25)))
        docs.append((tid.tolist(), rng.integers(1, 3, size=len(tid)).tolist()))
    return docs


def test_sparse_walk_off_by_one_quirk(ray_session):
    """sparseDCMLDA.java:160-165: the subtract-then-increment walk starts at
    tid=0, so after one full sweep NO token can remain on topic 0 — the
    chosen topic is always searchsorted+1 (capped K-1). Transcribed quirk."""
    rng = np.random.Generator(np.random.Philox(key=9, counter=[0, 0, 0, 0]))
    K, V = 5, 40
    alpha = np.full(K, 1.05)
    beta = np.full((K, V), 1.01)
    words = np.repeat(np.arange(20, dtype=np.int64), 3)
    doc = _init_doc(words, K, V, alpha, rng)
    _sample_topics(doc, alpha, beta, beta.sum(axis=1), rng)
    assert 0 not in set(doc["z"].tolist())
    # the cluster variant uses the corrected increment-first walk and CAN
    # assign topic 0
    cl_wt = np.zeros((K, V))
    cl_ts = np.zeros(K)
    doc2 = _init_doc(words, K, V, alpha, rng)
    cl_ts += doc2["n_dk"]
    cl_wt += doc2["n_dkw"]
    _sample_topics(doc2, alpha, beta, beta.sum(axis=1), rng,
                   cluster_wt=cl_wt, cluster_ts=cl_ts)
    # (not guaranteed for one random draw set — assert over many sweeps)
    seen0 = 0 in set(doc2["z"].tolist())
    for _ in range(10):
        _sample_topics(doc2, alpha, beta, beta.sum(axis=1), rng,
                       cluster_wt=cl_wt, cluster_ts=cl_ts)
        seen0 = seen0 or 0 in set(doc2["z"].tolist())
    assert seen0


def test_sparse_dcmlda_determinism_and_indicators(ray_session):
    docs = _two_vocab_docs()
    out1 = train_sparse_dcmlda(docs, n_topics=4, vocab_size=60,
                               n_em_iters=2, inner_iters=3, seed=43)
    out2 = train_sparse_dcmlda(docs, n_topics=4, vocab_size=60,
                               n_em_iters=2, inner_iters=3, seed=43)
    assert np.array_equal(out1["topic_term"], out2["topic_term"])
    assert all(np.array_equal(a, b) for a, b in
               zip(out1["doc_indicators"], out2["doc_indicators"]))
    # rows L1-normalized
    assert np.allclose(out1["topic_term"].sum(axis=1), 1.0)
    # every topic with counts must carry an ON indicator (forced-on rule),
    # and the indicator field must actually be sparse somewhere
    any_off = False
    for blk_t, blk_x in zip(out1["doc_topics"], out1["doc_indicators"]):
        for th, x in zip(blk_t, blk_x):
            assert (th[~x] == 0).all()      # off topics carry no θ mass
            any_off = any_off or (~x).any()
    assert any_off


def test_sparse_cluster_dcmlda_recovers_grouping(ray_session):
    """Two disjoint-vocabulary doc groups should mostly co-cluster. Groups
    are split first-half/second-half so the round-robin block split mixes
    both groups into every block (a block holding only one group has no
    local signal to coordinate cluster labels across blocks)."""
    rng = np.random.default_rng(5)
    docs = []
    n = 40
    for i in range(n):
        base = 0 if i < n // 2 else 30
        tid = np.unique(rng.integers(base, base + 30,
                                     size=rng.integers(5, 25)))
        docs.append((tid.tolist(), rng.integers(1, 3, size=len(tid)).tolist()))
    out = train_sparse_cluster_dcmlda(docs, n_topics=4, vocab_size=60,
                                      n_clusters=2, n_em_iters=3,
                                      inner_iters=3, seed=53, n_blocks=2)
    n_blocks = out["block_split"]
    cid = np.empty(len(docs), dtype=np.int64)
    for b, arr in enumerate(out["doc_clusters"]):
        cid[b::n_blocks] = arr
    g1, g2 = cid[:n // 2], cid[n // 2:]
    purity = max(
        (np.mean(g1 == 0) + np.mean(g2 == 1)) / 2,
        (np.mean(g1 == 1) + np.mean(g2 == 0)) / 2)
    assert purity >= 0.75, purity
    out2 = train_sparse_cluster_dcmlda(docs, n_topics=4, vocab_size=60,
                                       n_clusters=2, n_em_iters=3,
                                       inner_iters=3, seed=53, n_blocks=2)
    assert all(np.array_equal(a, b) for a, b in
               zip(out["doc_clusters"], out2["doc_clusters"]))
