"""LDA via collapsed Gibbs sampling — the reference's most-used topic model
(``topicmodels/LDA/LDA_Gibbs.java``, Griffiths & Steyvers). Semantics
transcribed exactly:

- init (:49-66): word_topic_sstat[k][v] = β pseudo-counts, m_sstat[k] = β·V;
  every token gets a random initial topic (``_Doc.setTopics4Gibbs``), doc
  sstat = α + per-topic token counts;
- per-token resample (:113-151): remove the token's assignment, then
  p_k ∝ doc_sstat[k] · wts[k][wid] / m_sstat[k] (``topicInDocProb`` ·
  ``wordByTopicProb``), draw u = rand()·Σp and walk the cache until it goes
  ≤ 0 — replicated as searchsorted-left on the cumulative sum;
- sample accumulation (:168-188): after burn-in, every ``lag`` iterations
  topic_term += word_topic_sstat and per-doc m_topics += doc sstat;
- final estimate (:210-223): L1-normalize both.

Determinism decisions (same policy as pLSA, SURVEY.md §7): the reference's
unseeded ``Random`` and its train-set permutation (:94-105, ``d.permutation``)
are replaced by a per-block seeded ``numpy`` Philox stream and fixed doc
order — runs are reproducible.

Distributed execution: collapsed Gibbs serializes on the shared K×V count
table, so the multi-block path is **AD-LDA** (Approximate Distributed LDA,
Newman, Asuncion, Smyth & Welling, JMLR 2009 — a public algorithm): document
blocks are pinned once (``ray.put``); each iteration broadcasts the global
(word_topic_sstat, m_sstat), every block samples one epoch against its LOCAL
copy, and the driver merges ``global' = global + Σ_b (local_b − global)`` in
fixed block order. With ONE block the merge is the identity and the algorithm
IS the reference's serial collapsed Gibbs — pytest pins 1-block == serial
bit-exact; multi-block is the standard AD-LDA approximation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _expand_block(tbl: pa.Table):
    """vector block → per-token word ids + doc boundaries (tf-expanded:
    a token with tf=3 is 3 Gibbs tokens, like the reference's _Word array)."""
    tids = tbl.column("tids")
    vals = tbl.column("vals")
    tids = tids.combine_chunks() if isinstance(tids, pa.ChunkedArray) else tids
    vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
    lengths = np.asarray(pa.compute.list_value_length(tids), dtype=np.int64)
    j = tids.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    v = vals.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    # expand by tf
    words = np.repeat(j, v)
    doc_of_posting = np.repeat(np.arange(len(lengths)), lengths)
    doc_of_word = np.repeat(doc_of_posting, v)
    n_docs = len(lengths)
    return words, doc_of_word, n_docs


def _gibbs_epoch(words, doc_of_word, z, doc_sstat, wts, m_sstat, rng):
    """One in-place sweep over all tokens (reference :113-151 order: doc
    blocks ascending, tokens in stored order).

    Uniforms are pre-drawn in ONE ``rng.random(n)`` call (identical Philox
    stream to per-token draws) and the walk runs in the compile-once C
    kernel (functions/ckernels.lda_kernel) with the identical IEEE op
    sequence — 1-block == serial stays bit-exact (pinned by test_lda); the
    Python loop below is the compiler-less fallback and parity oracle."""
    from ir_base_ray.functions.ckernels import lda_kernel

    K = m_sstat.size
    if words.size == 0:
        return z
    us = rng.random(words.size)
    lib = lda_kernel()
    if lib is not None:
        import ctypes

        P = ctypes.POINTER
        cache = np.empty(K, dtype=np.float64)
        words_c = np.ascontiguousarray(words, dtype=np.int64)
        docs_c = np.ascontiguousarray(doc_of_word, dtype=np.int64)
        assert z.flags.c_contiguous and doc_sstat.flags.c_contiguous \
            and wts.flags.c_contiguous and m_sstat.flags.c_contiguous
        lib.lda_sweep(
            words_c.ctypes.data_as(P(ctypes.c_int64)),
            docs_c.ctypes.data_as(P(ctypes.c_int64)), words.size,
            z.ctypes.data_as(P(ctypes.c_int64)),
            doc_sstat.ctypes.data_as(P(ctypes.c_double)),
            wts.ctypes.data_as(P(ctypes.c_double)),
            m_sstat.ctypes.data_as(P(ctypes.c_double)),
            us.ctypes.data_as(P(ctypes.c_double)),
            cache.ctypes.data_as(P(ctypes.c_double)),
            K, wts.shape[1])
        return z
    for i in range(words.size):
        wid = words[i]
        d = doc_of_word[i]
        t = z[i]
        doc_sstat[d, t] -= 1.0
        wts[t, wid] -= 1.0
        m_sstat[t] -= 1.0
        cache = doc_sstat[d] * wts[:, wid] / m_sstat
        cum = np.cumsum(cache)
        u = cum[-1] * us[i]
        t = int(np.searchsorted(cum, u, side="left"))
        if t >= K:
            t = K - 1
        z[i] = t
        doc_sstat[d, t] += 1.0
        wts[t, wid] += 1.0
        m_sstat[t] += 1.0
    return z


def _init_block(words, doc_of_word, n_docs, K, alpha, rng):
    """setTopics4Gibbs: random topic per token; doc sstat = α + counts."""
    z = rng.integers(0, K, size=words.size)
    doc_sstat = np.full((n_docs, K), alpha, dtype=np.float64)
    np.add.at(doc_sstat, (doc_of_word, z), 1.0)
    return z, doc_sstat


@ray.remote
def _lda_block_epoch(tbl: pa.Table, state, global_wts, global_msstat,
                     K: int, V: int, alpha: float, seed: int, it: int,
                     collect: bool):
    """One AD-LDA epoch for one block: local copy of the global counts,
    full Gibbs sweep, returns (state', local_wts, local_msstat)."""
    words, doc_of_word, n_docs = _expand_block(tbl)
    rng = np.random.Generator(np.random.Philox(key=seed, counter=[it, 0, 0, 0]))
    if state is None:
        z, doc_sstat = _init_block(words, doc_of_word, n_docs, K, alpha, rng)
        topics_acc = np.zeros((n_docs, K), dtype=np.float64)
        # initial assignment counts enter the local (=global) table
        wts = global_wts.copy()
        m_sstat = global_msstat.copy()
        np.add.at(wts, (z, words), 1.0)
        np.add.at(m_sstat, z, 1.0)
        return (z, doc_sstat, topics_acc), wts, m_sstat
    z, doc_sstat, topics_acc = state
    z = z.copy()                       # object-store arrays are read-only
    doc_sstat = doc_sstat.copy()
    wts = global_wts.copy()
    m_sstat = global_msstat.copy()
    z = _gibbs_epoch(words, doc_of_word, z, doc_sstat, wts, m_sstat, rng)
    if collect:  # calculate_M_step doc side (:185-188)
        topics_acc = topics_acc + doc_sstat
    return (z, doc_sstat, topics_acc), wts, m_sstat


def train_lda_gibbs(vec_ds, *, n_topics: int, vocab_size: int,
                    n_iters: int = 30, alpha: float = 1.05, beta: float = 1.01,
                    burn_in: float = 0.4, lag: int = 2, seed: int = 11):
    """vectors Dataset (doc_id, tids, vals) → dict with the accumulated,
    L1-normalized ``topic_term`` (K×V) and per-block ``doc_topics``.
    α/β defaults follow the reference mains (d_alpha=1.05, d_beta=1.01)."""
    K, V = n_topics, vocab_size
    blocks = [ray.put(b) for b in vec_ds.iter_batches(batch_format="pyarrow",
                                                      batch_size=None)]
    n_burn = int(burn_in * n_iters)

    wts = np.full((K, V), beta, dtype=np.float64)
    m_sstat = np.full(K, beta * V, dtype=np.float64)
    states = [None] * len(blocks)

    # init epoch (it=0): random assignments counted into the global table
    outs = ray.get([
        _lda_block_epoch.remote(b, None, wts, m_sstat, K, V, alpha,
                                seed + i, 0, False)
        for i, b in enumerate(blocks)
    ])
    new_wts = wts.copy()
    new_m = m_sstat.copy()
    for i, (state, local_wts, local_m) in enumerate(outs):
        states[i] = state
        new_wts += local_wts - wts
        new_m += local_m - m_sstat
    wts, m_sstat = new_wts, new_m

    topic_term_acc = np.zeros((K, V), dtype=np.float64)
    for it in range(1, n_iters + 1):
        collect = it > n_burn and it % lag == 0
        outs = ray.get([
            _lda_block_epoch.remote(b, states[i], wts, m_sstat, K, V, alpha,
                                    seed + i, it, collect)
            for i, b in enumerate(blocks)
        ])
        new_wts = wts.copy()
        new_m = m_sstat.copy()
        for i, (state, local_wts, local_m) in enumerate(outs):
            states[i] = state
            new_wts += local_wts - wts    # AD-LDA merge, fixed block order
            new_m += local_m - m_sstat
        wts, m_sstat = new_wts, new_m
        if collect:                        # calculate_M_step corpus side
            topic_term_acc += wts

    norm = topic_term_acc.sum(axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    doc_topics = []
    for state in states:
        acc = state[2]
        s = acc.sum(axis=1, keepdims=True)
        s[s == 0] = 1.0
        doc_topics.append(acc / s)
    return {"topic_term": topic_term_acc / norm, "doc_topics": doc_topics}


def lda_gibbs_serial(tids_list, vals_list, *, n_topics: int, vocab_size: int,
                     n_iters: int = 30, alpha: float = 1.05, beta: float = 1.01,
                     burn_in: float = 0.4, lag: int = 2, seed: int = 11):
    """Serial collapsed Gibbs oracle: the exact reference control flow with
    the pinned RNG — tests assert 1-block train_lda_gibbs matches bit-exact."""
    K, V = n_topics, vocab_size
    words_parts, doc_parts = [], []
    for d, (jj, vv) in enumerate(zip(tids_list, vals_list)):
        w = np.repeat(np.asarray(jj, dtype=np.int64),
                      np.asarray(vv, dtype=np.int64))
        words_parts.append(w)
        doc_parts.append(np.full(w.size, d, dtype=np.int64))
    words = np.concatenate(words_parts) if words_parts else np.empty(0, np.int64)
    doc_of_word = np.concatenate(doc_parts) if doc_parts else np.empty(0, np.int64)
    n_docs = len(tids_list)
    n_burn = int(burn_in * n_iters)

    wts = np.full((K, V), beta, dtype=np.float64)
    m_sstat = np.full(K, beta * V, dtype=np.float64)
    rng0 = np.random.Generator(np.random.Philox(key=seed, counter=[0, 0, 0, 0]))
    z, doc_sstat = _init_block(words, doc_of_word, n_docs, K, alpha, rng0)
    np.add.at(wts, (z, words), 1.0)
    np.add.at(m_sstat, z, 1.0)

    topic_term_acc = np.zeros((K, V), dtype=np.float64)
    topics_acc = np.zeros((n_docs, K), dtype=np.float64)
    for it in range(1, n_iters + 1):
        rng = np.random.Generator(np.random.Philox(key=seed, counter=[it, 0, 0, 0]))
        z = _gibbs_epoch(words, doc_of_word, z, doc_sstat, wts, m_sstat, rng)
        if it > n_burn and it % lag == 0:
            topic_term_acc += wts
            topics_acc += doc_sstat
    norm = topic_term_acc.sum(axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    s = topics_acc.sum(axis=1, keepdims=True)
    s[s == 0] = 1.0
    return {"topic_term": topic_term_acc / norm, "doc_topics": topics_acc / s}
