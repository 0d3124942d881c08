"""Query-likelihood language-model ranker (R1 in SURVEY.md §2.7) — exact
transcription of ``topicmodels/languageModelBaseLine.java``:

- reference model (A5): p(w) = TTF(w) / Σ TTF (``:41-66``);
- per (query, doc) score (``rankChild4StnByLanguageModel``, ``:167-202``):
    α_d = μ / (μ + len_d)                 (μ = 1000 default, ctor 800)
    score = Σ_w qval_w · ln( (1-α_d)·tf_{w,d}/len_d + α_d·p(w) )
  EVERY query term contributes to every candidate doc (absent terms via the
  α·p(w) smoothing mass), so scoring is a full scan over docs — vectorized
  over the whole doc-length array with per-term posting scatter-adds;
- ranking: full descending sort (``sortHashMap4String``, ``:240-259``), here
  with doc_id as the deterministic tie-break.
"""

from __future__ import annotations

import numpy as np

from ir_base_ray.pipelines.query_engine import IndexSegment


class LMRanker:
    """Wraps an IndexSegment with Jelinek-Mercer/Dirichlet-style smoothing
    scoring. p(w) comes from the index dictionary's TTF column."""

    def __init__(self, segment: IndexSegment, mu: float = 1000.0):
        self.seg = segment
        self.mu = mu
        import pandas as pd

        # p(w) lookup by term_id (TTF / ΣTTF)
        ttf = segment.ttf_by_tid.astype(np.float64)
        self.p_w = ttf / ttf.sum()
        self.alpha = mu / (mu + segment.doc_len.astype(np.float64))
        with np.errstate(divide="ignore", invalid="ignore"):
            self.inv_len = np.where(segment.doc_len > 0, 1.0 / segment.doc_len, 0.0)

    def score_all(self, text: str) -> np.ndarray:
        """→ float64 score for EVERY doc_id (log-likelihood; empty query →
        zeros)."""
        tids, qtfs = self.seg.query_vector(text)
        scores = np.zeros(self.seg.doc_len.size, dtype=np.float64)
        for tid, qtf in zip(tids, qtfs):
            pw = self.p_w[tid]
            tf = np.zeros(self.seg.doc_len.size, dtype=np.float64)
            rng = self.seg._tid_starts.get(int(tid))
            if rng is not None:
                for i in range(rng[0], rng[1]):
                    d, f = self.seg._decode_block(i)
                    tf[d] = f
            smoothing = (1 - self.alpha) * tf * self.inv_len + self.alpha * pw
            with np.errstate(divide="ignore"):
                scores += qtf * np.log(smoothing)
        return scores

    def rank(self, text: str, k: int | None = None) -> list[tuple[int, float]]:
        """Full descending sort (Q3), tie-break doc_id ascending."""
        scores = self.score_all(text)
        order = np.lexsort((np.arange(scores.size), -scores))
        if k is not None:
            order = order[:k]
        return [(int(d), float(scores[d])) for d in order]
