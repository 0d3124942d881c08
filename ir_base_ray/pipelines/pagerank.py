"""Per-item PageRank instance weighting (``influence/PageRank.java:46-170``,
SURVEY.md §2.4 J8) — the optional doc-weighting step of the reference's main
lifecycle (``mains/Execution.java:80-84``).

Semantics transcribed exactly:
- docs GROUP per item (the reference streams docs sorted by itemID and cuts
  groups on id change, ``train`` :46-66; here an explicit
  ``groupby(item).map_groups`` — the Ray-native J8 shape). Groups of ≤
  ``min_group_size`` (10) docs are skipped ("graph is too small"; the
  reference's looser >5 rule for the LAST group is an artifact of its stream
  order and is not reproduced — pinned substitution);
- graph (``constructSparseGraph`` :68-96): out-edges of doc i = its top-K
  most similar docs under the provided similarity (dot product of the docs'
  weighted vectors) via the MyPriorityQueue bounded heap (incumbent-wins
  ties, candidates in ascending j order); edge weight
  exp(sim)/Σ exp(sim) over the kept edges. Dense variant when N ≤ topK
  (``constructDenseGraph`` :98-127: all j≠i, exp-normalized);
- power iteration (``calcPageRank`` :129-166): r⁰_i = 1/√N;
  r'_i = α/N + (1−α)·Σ_j T[j,i]·r_j; L2-normalize r' per iteration;
  delta = √(Σ(r'−r)²/N); stop at maxIter or delta ≤ converge;
- output doc weight = 1 + 10·r_i (:160).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ir_base_ray.functions.topk import BoundedTopK


def pagerank_group(vectors: list[tuple[np.ndarray, np.ndarray]], *,
                   alpha: float = 0.1, top_k: int = 10, max_iter: int = 50,
                   converge: float = 1e-4) -> np.ndarray:
    """One item group's PageRank scores (r vector, L2-normalized)."""
    n = len(vectors)
    # dense doc×term matrix over the group's local vocabulary
    all_tids = np.unique(np.concatenate([t for t, _ in vectors])) if n else np.empty(0)
    col = {int(t): i for i, t in enumerate(all_tids)}
    D = np.zeros((n, len(all_tids)))
    for i, (tids, vals) in enumerate(vectors):
        for t, v in zip(tids, vals):
            D[i, col[int(t)]] = v
    S = D @ D.T                                   # Utils.dotProduct(di, dj)

    T = np.zeros((n, n))
    if n <= top_k:                                # dense graph (:98-127)
        E = np.exp(S)
        np.fill_diagonal(E, 0.0)
        row_sum = E.sum(axis=1)
        row_sum[row_sum == 0] = 1.0
        T = E / row_sum[:, None]
        np.fill_diagonal(T, 0.0)
    else:                                         # sparse top-K graph (:68-96)
        for i in range(n):
            q = BoundedTopK(top_k)
            for j in range(n):
                if j != i:
                    q.add(float(S[i, j]), j)
            kept = q.result()
            es = np.array([np.exp(s) for s, _ in kept])
            tot = es.sum()
            for (s, j), e in zip(kept, es):
                T[i, j] = e / tot

    r = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(max_iter):
        r_new = alpha / n + (1.0 - alpha) * (T.T @ r)
        norm = np.sqrt(float(r_new @ r_new))
        if norm:
            r_new = r_new / norm
        delta = np.sqrt(float(((r - r_new) ** 2).sum()) / n)
        r = r_new
        if delta <= converge:
            break
    return r


def pagerank_weights(vec_ds, *, item_col: str, alpha: float = 0.1,
                     top_k: int = 10, max_iter: int = 50,
                     converge: float = 1e-4, min_group_size: int = 10):
    """(doc_id, tids, vals, item) Dataset → (item, doc_id, weight) Dataset
    via ``groupby(item).map_groups`` — weight = 1 + 10·PageRank score. Docs
    in groups of ≤ min_group_size keep the reference's default weight of 1
    implicitly (they are omitted from the output, like the skipped graphs)."""

    def per_item(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id").reset_index(drop=True)
        if len(g) <= min_group_size:
            return pd.DataFrame({item_col: [], "doc_id": [], "weight": []})
        vectors = [(np.asarray(list(t), dtype=np.int64),
                    np.asarray(list(v), dtype=np.float64))
                   for t, v in zip(g["tids"], g["vals"])]
        r = pagerank_group(vectors, alpha=alpha, top_k=top_k,
                           max_iter=max_iter, converge=converge)
        return pd.DataFrame({
            item_col: g[item_col],
            "doc_id": g["doc_id"].astype(np.int64),
            "weight": 1.0 + 10.0 * r,
        })

    return vec_ds.groupby(item_col).map_groups(per_item, batch_format="pandas")
