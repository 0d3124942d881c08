"""sparseLDA — word-sparsity LDA with GLOBAL topic-word tables
(``topicmodels/LDA/sparseLDA.java``; LDA_Gibbs + per-doc on/off topic
indicators, SURVEY.md §2.8 R7 / LDA family).

Semantics transcribed:

- init (``initialize_probability`` :31-50): word_topic_sstat[k][v] = β,
  m_sstat[k] = β·V; per doc the 2-arg ``_Doc4SparseDCMLDA.setTopics4Gibbs``
  (:90-120) — indicators x_k ~ nextBoolean, αDoc = α·n_on, each token
  rejection-samples a topic until its indicator is on (all-off vectors are
  redrawn, same documented deviation as pipelines/sparsedcmlda.py);
- E-step per doc (``calculate_E_step`` :53-63): token sweep THEN indicator
  sweep. Token sweep (``sampleTopicAssignment`` :65-107): remove the token
  from the doc AND global tables, p_k = x_k · (n_dk+α)/(αDoc+Σn_dk) ·
  wts[k][wid]/m_sstat[k] (``topicInDocProb``·``wordByTopicProb``), the
  off-by-one subtract walk (:90-96 — tid = searchsorted_left+1 capped at
  K−1, topic 0 never re-sampled; the same quirk as sparseDCMLDA's walk,
  pinned by test). Indicator sweep = sparseDCMLDA's ``sampleOnOffIndicator``
  verbatim (:109-143; shared C kernel ``sparse_indicators``);
- sample accumulation (``collectStats`` :149-161, after burn-in every lag
  iterations): m_topics[d,k] += n_dk+α (ALL k), indicator_prob[d,k] += x_k,
  indicator_distribution[d] += n_on; final estimates (``estThetaInDoc``
  :163-172): L1-normalized topics, prob /= iters, dist /= iters·K.
  Topic-term side accumulates the global table like LDA_Gibbs;
- defaults: tParam = sParam = 1 (``TopicModelMain.java:372-373``), α/β as
  LDA_Gibbs (1.05 / 1.01).

Distribution: AD-LDA over pinned doc blocks exactly like pipelines/lda.py —
the global (wts, m_sstat) broadcast per iteration, block-local sweeps on a
copy, fixed-order delta merge; the per-doc indicator state never leaves its
block. 1-block == the reference's serial schedule. Uniform draws pre-drawn
per doc (token count, then the indicator count pre-counted from the
read-only n_dk), bit-identical Philox stream to per-token draws; the C
kernel (functions/ckernels.sparselda_kernel) replicates the numpy IEEE op
order — kernel == python pinned by test.
"""

from __future__ import annotations

import numpy as np

import ray

from ir_base_ray.pipelines.lda import _expand_block
from ir_base_ray.pipelines.sparsedcmlda import _sample_indicators


def _init_docs(words, doc_of_word, n_docs, K, alpha, rng):
    """Per-doc 2-arg setTopics4Gibbs (:90-120)."""
    docs = []
    for d in range(n_docs):
        w = words[doc_of_word == d]
        while True:
            x = rng.integers(0, 2, size=K).astype(bool)
            if x.any():
                break  # all-off would spin the rejection loop forever
        z = np.empty(w.size, dtype=np.int64)
        for i in range(w.size):
            while True:
                t = int(rng.integers(0, K))
                if x[t]:
                    break
            z[i] = t
        n_dk = np.zeros(K)
        np.add.at(n_dk, z, 1.0)
        docs.append({"words": w, "z": z, "n_dk": n_dk, "x": x,
                     "alpha_doc": float(alpha * x.sum()),
                     "n_on": int(x.sum())})
    return docs


def _sample_topics_lda(doc, wts, m_sstat, alpha, rng, use_kernel=True):
    """sampleTopicAssignment (:65-107) over one doc against the (local
    copies of the) global tables."""
    from ir_base_ray.functions.ckernels import sparselda_kernel

    words, z, n_dk, x = doc["words"], doc["z"], doc["n_dk"], doc["x"]
    K, V = wts.shape
    if words.size == 0:
        return
    us = rng.random(words.size)
    xf = x.astype(np.float64)
    lib = sparselda_kernel() if use_kernel else None
    if lib is not None:
        import ctypes

        P = ctypes.POINTER
        f64, i64 = ctypes.c_double, ctypes.c_int64
        cache = np.empty(K, dtype=np.float64)
        lib.sparselda_topics(
            np.ascontiguousarray(words).ctypes.data_as(P(i64)),
            words.size,
            z.ctypes.data_as(P(i64)),
            n_dk.ctypes.data_as(P(f64)),
            wts.ctypes.data_as(P(f64)),
            m_sstat.ctypes.data_as(P(f64)),
            float(alpha),
            xf.ctypes.data_as(P(f64)),
            float(doc["alpha_doc"]), K, V,
            us.ctypes.data_as(P(f64)),
            cache.ctypes.data_as(P(f64)))
        return
    for i in range(words.size):
        wid = int(words[i])
        t = int(z[i])
        n_dk[t] -= 1.0
        wts[t, wid] -= 1.0
        m_sstat[t] -= 1.0
        den = doc["alpha_doc"] + float(n_dk.sum())
        cache = xf * ((n_dk + alpha) / den) * (wts[:, wid] / m_sstat)
        cum = np.cumsum(cache)
        u = cum[-1] * us[i]
        t = int(np.searchsorted(cum, u, side="left")) + 1
        if t >= K - 1:
            t = K - 1
        z[i] = t
        n_dk[t] += 1.0
        wts[t, wid] += 1.0
        m_sstat[t] += 1.0


@ray.remote
def _sparselda_block_epoch(tbl, state, global_wts, global_msstat, K, V,
                           alpha, s_param, t_param, seed, it, collect,
                           use_kernel=True):
    """One AD-LDA epoch for one block: doc-by-doc token sweep + indicator
    sweep against local copies of the global tables."""
    words, doc_of_word, n_docs = _expand_block(tbl)
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[it, 0, 0, 0]))
    alpha_vec = np.full(K, alpha)
    if state is None:
        docs = _init_docs(words, doc_of_word, n_docs, K, alpha, rng)
        wts = global_wts.copy()
        m_sstat = global_msstat.copy()
        for doc in docs:
            np.add.at(wts, (doc["z"], doc["words"]), 1.0)
            np.add.at(m_sstat, doc["z"], 1.0)
        acc = {"topics": np.zeros((n_docs, K)),
               "ind_prob": np.zeros((n_docs, K)),
               "ind_dist": np.zeros(n_docs), "iters": 0}
        return (docs, acc), wts, m_sstat
    docs, acc = state
    docs = [{k: (v.copy() if isinstance(v, np.ndarray) else v)
             for k, v in doc.items()} for doc in docs]
    acc = {k: (v.copy() if isinstance(v, np.ndarray) else v)
           for k, v in acc.items()}
    wts = global_wts.copy()
    m_sstat = global_msstat.copy()
    for doc in docs:                     # calculate_E_step (:53-63)
        _sample_topics_lda(doc, wts, m_sstat, alpha, rng, use_kernel)
        _sample_indicators(doc, alpha_vec, K, s_param, t_param, rng)
    if collect:                          # collectStats (:149-161)
        acc["iters"] += 1
        for d, doc in enumerate(docs):
            acc["topics"][d] += doc["n_dk"] + alpha
            acc["ind_prob"][d] += doc["x"]
            acc["ind_dist"][d] += doc["n_on"]
    return (docs, acc), wts, m_sstat


def train_sparse_lda(vec_ds, *, n_topics: int, vocab_size: int,
                     n_iters: int = 30, alpha: float = 1.05,
                     beta: float = 1.01, s_param: float = 1.0,
                     t_param: float = 1.0, burn_in: float = 0.4,
                     lag: int = 2, seed: int = 19, use_kernel: bool = True):
    """vectors Dataset (doc_id, tids, vals) → accumulated L1-normalized
    ``topic_term`` (K×V), per-block doc topics, indicator probabilities and
    the per-doc indicator density."""
    K, V = n_topics, vocab_size
    blocks = [ray.put(b) for b in vec_ds.iter_batches(batch_format="pyarrow",
                                                      batch_size=None)]
    n_burn = int(burn_in * n_iters)
    wts0 = np.full((K, V), beta)
    msstat0 = np.full(K, beta * V)
    states = [None] * len(blocks)
    g_wts, g_msstat = wts0, msstat0
    tt_acc = np.zeros((K, V))
    tt_iters = 0
    for it in range(n_iters + 1):
        collect = it > n_burn and ((it - n_burn) % lag == 0)
        wts_ref = ray.put(g_wts)
        ms_ref = ray.put(g_msstat)
        outs = ray.get([
            _sparselda_block_epoch.remote(
                blk, states[b], wts_ref, ms_ref, K, V, alpha, s_param,
                t_param, seed + b, it, collect, use_kernel)
            for b, blk in enumerate(blocks)
        ])
        new_wts = g_wts.copy()
        new_ms = g_msstat.copy()
        for b, (st, lw, lm) in enumerate(outs):  # fixed-order delta merge
            states[b] = st
            new_wts += lw - g_wts
            new_ms += lm - g_msstat
        g_wts, g_msstat = new_wts, new_ms
        if collect:
            tt_acc += g_wts
            tt_iters += 1
    if tt_iters == 0:                    # tiny runs: use the final state
        tt_acc = g_wts.copy()
        tt_iters = 1
    topic_term = tt_acc / tt_acc.sum(axis=1, keepdims=True)
    doc_topics = []
    ind_probs = []
    ind_dens = []
    for st in states:
        docs, acc = st
        iters = max(1, acc["iters"])
        tp = acc["topics"] if acc["iters"] else np.stack(
            [d["n_dk"] + alpha for d in docs])
        tp = tp / tp.sum(axis=1, keepdims=True)
        doc_topics.append(tp)
        ip = (acc["ind_prob"] / iters if acc["iters"]
              else np.stack([d["x"].astype(float) for d in docs]))
        ind_probs.append(ip)
        dd = (acc["ind_dist"] / (iters * K) if acc["iters"]
              else np.array([d["n_on"] / K for d in docs]))
        ind_dens.append(dd)
    return {"topic_term": topic_term,
            "doc_topics": np.concatenate(doc_topics),
            "indicator_prob": np.concatenate(ind_probs),
            "indicator_density": np.concatenate(ind_dens),
            "word_topic_sstat": g_wts, "m_sstat": g_msstat}
