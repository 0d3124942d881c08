"""Deterministic query-set generator (FIXTURES.md §2): head terms, tail
terms, mixed, multi-term, an all-OOV query, and repeated-term queries.
Derived from the corpus itself so df strata are meaningful."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from ir_base_ray.config import AnalyzerSpec
from ir_base_ray.functions.analyzer import Analyzer, analyze_simple


def synth_queries(corpus_table: pa.Table, n_queries: int = 50, seed: int = 42,
                  spec: AnalyzerSpec | None = None) -> pa.Table:
    spec = spec or AnalyzerSpec()
    if spec.mode == "full":
        analyzer = Analyzer(ngram=spec.ngram)
        count = analyzer.term_counts
    else:
        count = lambda t: Counter(analyze_simple(t))

    df: Counter = Counter()
    texts = corpus_table.column("text").to_pylist()
    sample = texts[:: max(1, len(texts) // 500)]
    for t in sample:
        df.update(set(count(t or "").keys()))
    ranked = [t for t, _ in df.most_common()]
    if not ranked:
        ranked = ["empty"]
    head = ranked[: max(3, len(ranked) // 50)]
    tail = [t for t, c in df.items() if c == 1] or ranked[-5:]
    mid = ranked[len(ranked) // 4: len(ranked) // 2] or ranked

    rng = np.random.default_rng(seed)
    qids, qtexts, ks = [], [], []

    def pick(pool, n):
        return [pool[int(rng.integers(len(pool)))] for _ in range(n)]

    for qid in range(n_queries):
        mode = qid % 6
        if mode == 0:
            words = pick(head, 1 + int(rng.integers(2)))
        elif mode == 1:
            words = pick(tail, 1 + int(rng.integers(3)))
        elif mode == 2:
            words = pick(head, 1) + pick(mid, 2)
        elif mode == 3:
            words = pick(mid, 1 + int(rng.integers(4)))
        elif mode == 4:
            w = pick(mid, 1)
            words = w + w + pick(head, 1)  # repeated term → qtf=2
        else:
            words = pick(mid, 2) + pick(tail, 1)
        k = 10 if qid % 7 else (1 if qid % 14 else 100)
        qids.append(qid)
        qtexts.append(" ".join(words))
        ks.append(k)
    # planted all-OOV query
    qids.append(n_queries)
    qtexts.append("zzzzqqqqxxxx yyqqzz")
    ks.append(10)
    return pa.table({
        "query_id": pa.array(qids, pa.int64()),
        "text": pa.array(qtexts, pa.string()),
        "k": pa.array(ks, pa.int64()),
    })
