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
    return {"topic_term": topic_term_acc / norm, "doc_topics": doc_topics,
            "word_topic_sstat": wts, "m_sstat": m_sstat}


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


# ------------------------------------------------- held-out perplexity eval

class _LdaInferActor:
    """Frozen-model Gibbs inference over test docs — the reference's
    evaluation harness (``topicmodels/LDA/LDA_Gibbs_test.java``):

    - per doc, testLength = ⌈prop·L⌉ tokens held out at seeded-random
      positions (``_Doc.setTopics4GibbsTest`` :303-334; seeded Philox
      replaces the unseeded draws, house policy), the remaining tokens get
      random initial topics feeding the doc sstat;
    - ``inferenceDoc`` (:151-166): number_of_iteration sweeps of the
      LDA_Gibbs walk with m_collectCorpusStats = false — the global
      (word_topic_sstat, m_sstat) stay FROZEN, only the doc sstat moves
      (C kernel ``lda_sweep_frozen``); stats collected while
      i < burnIn and i % lag == 0 (the harness's inverted-burn-in quirk,
      transcribed);
    - held-out log-likelihood per test word: log Σ_k θ_dk·φ_kw
      (``cal_logLikelihood_partial`` :168-185) with θ the L1-normalized
      collected topics and φ the trained topic_term_probabilty.

    Stateful actor: tables land once per actor via the broadcast object
    refs; each batch is embarrassingly parallel over docs."""

    def __init__(self, wts_ref, msstat_ref, phi_ref, K, alpha, test_prop,
                 n_iters, lag, burn_in, seed):
        self.wts = ray.get(wts_ref)
        self.msstat = ray.get(msstat_ref)
        self.phi = ray.get(phi_ref)
        self.K = K
        self.alpha = alpha
        self.test_prop = test_prop
        self.n_iters = n_iters
        self.lag = lag
        self.n_burn = max(1, int(burn_in * n_iters))
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ir_base_ray.functions.ckernels import lda_infer_kernel

        lib = lda_infer_kernel()
        K = self.K
        ids, logliks, testlens = [], [], []
        doc_ids = batch.column("doc_id").to_pylist()
        tids_col = batch.column("tids").to_pylist()
        vals_col = batch.column("vals").to_pylist()
        for did, tids, vals in zip(doc_ids, tids_col, vals_col):
            words = np.repeat(np.asarray(tids, dtype=np.int64),
                              np.asarray(vals, dtype=np.int64))
            L = words.size
            rng = np.random.Generator(np.random.Philox(
                key=self.seed, counter=[int(did), 0, 0, 0]))
            test_len = int(self.test_prop * L)
            if L == 0:
                ids.append(did)
                logliks.append(0.0)
                testlens.append(0)
                continue
            perm = rng.permutation(L)
            test_idx = np.zeros(L, dtype=bool)
            test_idx[perm[:test_len]] = True
            train_w = words[~test_idx]
            test_w = words[test_idx]
            z = rng.integers(0, K, size=train_w.size)
            sstat = np.full(K, self.alpha)
            np.add.at(sstat, z, 1.0)
            topics = np.zeros(K)
            for it in range(self.n_iters):
                us = rng.random(train_w.size)
                if lib is not None and train_w.size:
                    import ctypes

                    P = ctypes.POINTER
                    f64, i64 = ctypes.c_double, ctypes.c_int64
                    cache = np.empty(K)
                    wc = np.ascontiguousarray(train_w)
                    lib.lda_sweep_frozen(
                        wc.ctypes.data_as(P(i64)), train_w.size,
                        z.ctypes.data_as(P(i64)),
                        sstat.ctypes.data_as(P(f64)),
                        self.wts.ctypes.data_as(P(f64)),
                        self.msstat.ctypes.data_as(P(f64)),
                        us.ctypes.data_as(P(f64)),
                        cache.ctypes.data_as(P(f64)), K,
                        self.wts.shape[1])
                else:
                    for i in range(train_w.size):
                        wid = train_w[i]
                        t = z[i]
                        sstat[t] -= 1.0
                        cache = sstat * self.wts[:, wid] / self.msstat
                        cum = np.cumsum(cache)
                        t = int(np.searchsorted(cum, cum[-1] * us[i],
                                                side="left"))
                        if t >= K:
                            t = K - 1
                        z[i] = t
                        sstat[t] += 1.0
                if it < self.n_burn and it % self.lag == 0:
                    topics = topics + sstat    # the harness quirk
            theta = topics / topics.sum() if topics.sum() else \
                np.full(K, 1.0 / K)
            ll = 0.0
            for wid in test_w.tolist():
                ll += float(np.log((theta * self.phi[:, wid]).sum()))
            ids.append(did)
            logliks.append(ll)
            testlens.append(int(test_len))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "loglik": pa.array(logliks, pa.float64()),
                         "test_len": pa.array(testlens, pa.int64())})


def lda_heldout_perplexity(test_ds, train_out, *, n_topics: int,
                           alpha: float = 1.05, test_prop: float = 0.2,
                           n_iters: int = 20, lag: int = 2,
                           burn_in: float = 0.4, seed: int = 91,
                           concurrency: int = 2):
    """``Evaluation()`` (LDA_Gibbs_test.java :108-144): distributed
    frozen-model inference over the test Dataset, then
    perplexity = exp(−Σ loglik / Σ test words) and the mean per-doc
    log-likelihood. ``train_out`` = train_lda_gibbs's result dict (its
    final word_topic_sstat/m_sstat drive the walk; its normalized
    topic_term drives the held-out likelihood)."""
    wts_ref = ray.put(np.ascontiguousarray(train_out["word_topic_sstat"]))
    ms_ref = ray.put(np.ascontiguousarray(train_out["m_sstat"]))
    phi_ref = ray.put(np.ascontiguousarray(train_out["topic_term"]))
    out = test_ds.map_batches(
        _LdaInferActor, batch_format="pyarrow",
        fn_constructor_args=(wts_ref, ms_ref, phi_ref, n_topics, alpha,
                             test_prop, n_iters, lag, burn_in, seed),
        concurrency=concurrency).to_pandas()
    total_words = int(out["test_len"].sum())
    sum_ll = float(out["loglik"].sum())
    perplexity = float(np.exp(-sum_ll / total_words)) if total_words else \
        float("inf")
    return {"perplexity": perplexity,
            "avg_doc_loglik": sum_ll / max(1, len(out)),
            "per_doc": out}
