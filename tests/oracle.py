"""The pinned conformance oracle (FIXTURES.md §3, SURVEY.md §5): a serial,
full-scan, pure-Python transcription of the reference pipeline —

  DocAnalyzer.TokenizerNormalizeStemmer (via the shared pinned analyzer spec)
  → DF/TTF corpus stats (Analyzer.java:38-40, _stat.java:55-62)
  → Analyzer.setFeatureValues("BM25") scalar math (Analyzer.java:235-263)
  → full-scan query scoring, sparse-dot in term_id order (Utils.java:380-399)
  → MyPriorityQueue top-k tie semantics (MyPriorityQueue.java:40-74)

The distributed Ray engine must match this bit-for-bit (doc ids, order,
float64 scores).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass

import pyarrow as pa

from ir_base_ray.config import AnalyzerSpec
from ir_base_ray.functions.analyzer import Analyzer, analyze_simple
from ir_base_ray.functions.topk import BoundedTopK


@dataclass
class OracleIndex:
    doc_ids: list[int]
    urls: list[str]
    doc_vecs: list[dict[str, int]]  # term -> tf per doc (doc_id order)
    doc_len: list[int]
    df: dict[str, int]
    ttf: dict[str, int]
    term_id: dict[str, int]
    N: int
    avgdl: float
    spec: AnalyzerSpec


def oracle_build(corpus: pa.Table, spec: AnalyzerSpec | None = None) -> OracleIndex:
    spec = spec or AnalyzerSpec()
    if spec.mode == "full":
        analyzer = Analyzer(ngram=spec.ngram)
        count = analyzer.term_counts
    else:
        count = lambda t: Counter(analyze_simple(t))

    rows = sorted(
        zip(corpus.column("url").to_pylist(), corpus.column("text").to_pylist()),
        key=lambda r: r[0],
    )
    urls, vecs, lens = [], [], []
    df: Counter = Counter()
    ttf: Counter = Counter()
    for url, text in rows:
        counts = count(text or "")
        if len(counts) <= spec.length_threshold:
            continue  # filtered before stats (M8 filter-then-aggregate)
        urls.append(url)
        vecs.append(dict(counts))
        lens.append(sum(counts.values()))
        for term, tf in counts.items():
            df[term] += 1
            ttf[term] += tf
    n = len(urls)
    avgdl = (sum(lens) / n) if n else 0.0
    term_id = {t: i for i, t in enumerate(sorted(df.keys()))}
    return OracleIndex(
        doc_ids=list(range(n)), urls=urls, doc_vecs=vecs, doc_len=lens,
        df=dict(df), ttf=dict(ttf), term_id=term_id, N=n, avgdl=avgdl, spec=spec,
    )


def oracle_bm25_weight(idx: OracleIndex, term: str, tf: int, doc_len: int,
                       k1: float = 1.5, b: float = 0.75) -> float:
    """Scalar W4, exact expression shape of Analyzer.java:253-256."""
    TF = float(tf)
    DF = float(idx.df[term])
    n = doc_len / idx.avgdl
    IDF = math.log((idx.N - DF + 0.5) / (DF + 0.5))
    return IDF * TF * (k1 + 1) / (k1 * (1 - b + b * n) + TF)


def oracle_query_vector(idx: OracleIndex, text: str) -> list[tuple[str, int]]:
    """query terms present in vocabulary, ascending term_id, with qtf."""
    if idx.spec.mode == "full":
        analyzer = Analyzer(ngram=idx.spec.ngram)
        counts = analyzer.term_counts(text)
    else:
        counts = Counter(analyze_simple(text))
    known = [(t, c) for t, c in counts.items() if t in idx.term_id]
    known.sort(key=lambda tc: idx.term_id[tc[0]])
    return known

def oracle_topk(idx: OracleIndex, text: str, k: int) -> list[tuple[int, float]]:
    """Full scan in doc_id order; candidates = docs sharing ≥1 query term;
    score = Σ qtf·W4 accumulated in ascending term_id order; BoundedTopK."""
    qvec = oracle_query_vector(idx, text)
    if not qvec:
        return []
    queue = BoundedTopK(k)
    for doc_id in idx.doc_ids:
        vec = idx.doc_vecs[doc_id]
        score = 0.0
        hit = False
        for term, qtf in qvec:
            tf = vec.get(term)
            if tf is not None:
                hit = True
                score += qtf * oracle_bm25_weight(idx, term, tf, idx.doc_len[doc_id])
        if hit:
            queue.add(score, doc_id)
    return [(doc, score) for score, doc in queue.result()]
