"""sparseLDA pins (topicmodels/LDA/sparseLDA.java)."""

import numpy as np
import pandas as pd

import ray.data

from ir_base_ray.pipelines.sparselda import train_sparse_lda


def _planted(n_docs=30, V=20, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for d in range(n_docs):
        half = d % 2
        vocab = np.arange(10) + 10 * half
        tids = np.sort(rng.choice(vocab, size=6, replace=False))
        rows.append({"doc_id": d, "tids": tids.tolist(), "vals": [2] * 6})
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_sparselda_kernel_parity_and_sparsity(ray_session):
    """C kernel == python fallback bit-exact over a full run; indicators
    stay genuinely sparse (density < 1) while topics separate the planted
    vocabulary halves; deterministic."""
    ds = _planted()
    out = train_sparse_lda(ds, n_topics=4, vocab_size=20, n_iters=12,
                           seed=19)
    out_py = train_sparse_lda(ds, n_topics=4, vocab_size=20, n_iters=12,
                              seed=19, use_kernel=False)
    assert np.array_equal(out["topic_term"], out_py["topic_term"])
    assert np.array_equal(out["indicator_prob"], out_py["indicator_prob"])
    assert np.array_equal(out["doc_topics"], out_py["doc_topics"])
    # normalizations
    assert np.allclose(out["topic_term"].sum(axis=1), 1.0)
    assert np.allclose(out["doc_topics"].sum(axis=1), 1.0)
    # sparsity: the average on-density is strictly below always-on
    assert 0.0 < out["indicator_density"].mean() < 0.9
    # NOTE: unlike LDA_Gibbs (whose walk is the correct tid=-1 increment-
    # then-subtract, LDA_Gibbs.java:137-140), sparseLDA's walk
    # (sparseLDA.java:90-96) subtracts BEFORE incrementing — every draw is
    # shifted +1 and topic 0 is unreachable by resampling, so the faithful
    # model cannot cleanly separate planted topics; we pin the quirk's
    # consequences (below + test_sparselda_walk_quirk), not separation.
    out2 = train_sparse_lda(ds, n_topics=4, vocab_size=20, n_iters=12,
                            seed=19)
    assert np.array_equal(out["topic_term"], out2["topic_term"])


def test_sparselda_walk_quirk(ray_session):
    """The reference's off-by-one subtract walk: topic 0 is never
    RE-sampled — after enough sweeps no token holds topic 0 unless it was
    never resampled (statistically: far fewer than uniform)."""
    ds = _planted(n_docs=20, seed=7)
    out = train_sparse_lda(ds, n_topics=5, vocab_size=20, n_iters=15,
                           seed=23)
    # column 0 of every doc's final counts comes only from init leftovers;
    # doc_topics[:, 0] mass must sit at the alpha floor for most docs
    share0 = out["doc_topics"][:, 0].mean()
    others = out["doc_topics"][:, 1:].mean()
    assert share0 < others, (share0, others)
