"""R2: learning-to-rank feature generation — the 10-dim pairwise ranking
feature vector, query construction and z-score normalization of
``Classifier/metricLearning/L2RMetricLearning.java:215-383``, composed from
the existing similarity kernels and feeding ``train_lambdarank_parallel``.

Feature layout (``genRankingFV`` :347-383):
  0 BoW similarity           = sparse dot of the docs' weighted vectors
  1 topical similarity       = KLsymmetric(topics)/topicSize (0 if absent)
  2 same product             = item_id equality (``_Doc.sameProduct`` :364)
  3 length difference        = |len_q − len_d| / len_q
  4 jaccard                  = |idx∩| / |idx∪| over sparse indices
  5 |senti_q − senti_d|      (M13-dependent; 0 when senti scores absent —
                              same value the reference yields for docs with
                              no SentiWordNet hits)
  6 POS-vector cosine        (M12-dependent; cosine of zero vectors = 0)
  7 aspect-vector cosine     (same)
  8 stopword proportion of d (TokenizeResult side stat)
  9 avgIDF of d              (``_Doc.getAvgIDF``)

Query construction (``createTrainingCorpus`` :215-296): each training doc is
a candidate query; the other docs are ranked by the DEFAULT similarity
exp(BoWSim − TopicalSim) (``GaussianFields.getSimilarity`` :160-162) with a
top-K bounded queue (MyPriorityQueue tie semantics); a query is accepted iff
its neighbor set has BOTH relevant (same label) and irrelevant docs and the
pos/neg query balance rule holds (label==1 queries are skipped while
negQ < 1.1·posQ — transcribed exactly, including the sequential counter).
The unseeded ``Math.random()<0.02`` noise-neighbor injection is omitted
(noiseRatio=0 path; determinism policy of SURVEY §7).

Z-score (``normalize`` :298-329) keeps the reference's exact arithmetic —
``size`` increments once per (pair, feature), so the divisor is
10·#pairs, NOT #pairs; transcribed as-is for parity.

Scale shape: the all-pairs similarity over the LABELED TRAINing set is the
reference's own O(n²) design (`m_LabeledCache`); here each query doc scans a
broadcast candidate table inside ``map_batches`` (Q2 block-nested-loop) —
the labeled set is small by construction, the scan is distributed over query
blocks."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray

from ir_base_ray.functions.similarity import (kl_symmetric, sparse_dot,
                                              sparse_jaccard)
from ir_base_ray.functions.topk import BoundedTopK
from ir_base_ray.perf import pool_size

RANK_FV_SIZE = 10


def gen_ranking_fv(q: dict, d: dict) -> np.ndarray:
    """One (query doc, candidate doc) → 10-dim fv (:347-383)."""
    fv = np.zeros(RANK_FV_SIZE)
    fv[0] = sparse_dot(q["tids"], q["vals"], d["tids"], d["vals"])
    qt, dt = q.get("topics"), d.get("topics")
    if qt is not None and dt is not None:
        fv[1] = kl_symmetric(qt, dt) / len(qt)
    qi, di = q.get("item_id"), d.get("item_id")
    fv[2] = 1.0 if (qi is not None and di is not None and qi == di) else 0.0
    fv[3] = abs(float(q["doc_len"] - d["doc_len"])) / float(q["doc_len"]) \
        if q["doc_len"] else 0.0
    fv[4] = sparse_jaccard(q["tids"], d["tids"])
    fv[5] = abs(q.get("senti", 0.0) - d.get("senti", 0.0))
    fv[6] = _cos_or_zero(q.get("pos_vct"), d.get("pos_vct"))
    fv[7] = _cos_or_zero(q.get("asp_vct"), d.get("asp_vct"))
    fv[8] = d.get("stopword_prop", 0.0)
    fv[9] = d.get("avg_idf", 0.0)
    return fv


def _cos_or_zero(a, b) -> float:
    if a is None or b is None:
        return 0.0
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    na, nb = math.sqrt(float(a @ a)), math.sqrt(float(b @ b))
    if na == 0 or nb == 0:
        return 0.0
    return float(a @ b) / na / nb


def default_similarity(q: dict, d: dict) -> float:
    """exp(BoWSim − TopicalSim) (``GaussianFields.getSimilarity``)."""
    bow = sparse_dot(q["tids"], q["vals"], d["tids"], d["vals"])
    qt, dt = q.get("topics"), d.get("topics")
    topical = kl_symmetric(qt, dt) / len(qt) if qt is not None and dt is not None else 0.0
    return math.exp(bow - topical)


def _neighbor_stage(docs: list[dict], cand_ref, top_k: int):
    """Distributed part: for each query doc, rank the broadcast candidate set
    by default similarity, keep top-K, emit the 10-dim fvs + labels +
    relevant/irrelevant counts. Returns a Dataset of per-query rows."""

    class Ranker:
        def __init__(self):
            self.cands = ray.get(cand_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            idxs = batch.column("idx").to_pylist()
            out_idx, out_fv, out_y, out_rel, out_irr = [], [], [], [], []
            for qi in idxs:
                q = self.cands[qi]
                heap = BoundedTopK(top_k)
                for ci, d in enumerate(self.cands):
                    if ci == qi:
                        continue
                    heap.add(default_similarity(q, d), ci)
                fvs, ys = [], []
                rel = irr = 0
                for _sim, ci in heap.result():
                    d = self.cands[ci]
                    y = 1 if d["label"] == q["label"] else 0
                    if y:
                        rel += 1
                    else:
                        irr += 1
                    fvs.append(gen_ranking_fv(q, d).tolist())
                    ys.append(y)
                out_idx.append(qi)
                out_fv.append(fvs)
                out_y.append(ys)
                out_rel.append(rel)
                out_irr.append(irr)
            return pa.table({
                "idx": pa.array(out_idx, pa.int64()),
                "fvs": pa.array(out_fv, pa.list_(pa.list_(pa.float64()))),
                "ys": pa.array(out_y, pa.list_(pa.int64())),
                "relevant": pa.array(out_rel, pa.int64()),
                "irrelevant": pa.array(out_irr, pa.int64()),
            })

    import ray.data

    idx_ds = ray.data.from_arrow(pa.table({"idx": pa.array(range(len(docs)), pa.int64())}))
    return idx_ds.map_batches(Ranker, batch_format="pyarrow",
                              concurrency=pool_size(4), num_cpus=1)


def build_l2r_queries(docs: list[dict], *, top_k: int = 20):
    """Full R2 pipeline → (queries, mean, std) where ``queries`` is a list of
    (z-scored feature matrix, relevance labels) per accepted query — the
    exact input shape of ``train_lambdarank_parallel``.

    ``docs``: list of doc dicts with keys tids/vals/doc_len/label and the
    optional topics/item_id/senti/pos_vct/asp_vct/stopword_prop/avg_idf."""
    cand_ref = ray.put(docs)
    rows = _neighbor_stage(docs, cand_ref, top_k).to_pandas()
    rows = rows.sort_values("idx").reset_index(drop=True)

    # sequential acceptance filter (:270-280) — driver-side, O(n) booleans
    pos_q = neg_q = 0
    accepted = []
    for _, r in rows.iterrows():
        label = docs[int(r["idx"])]["label"]
        if r["relevant"] == 0 or r["irrelevant"] == 0 or \
                (label == 1 and neg_q < 1.1 * pos_q):
            continue
        if label == 1:
            pos_q += 1
        else:
            neg_q += 1
        fv = np.array([list(x) for x in r["fvs"]], dtype=np.float64)
        y = np.array(list(r["ys"]), dtype=np.int64)
        accepted.append((fv, y))

    # z-score with the reference's exact divisor (size = 10·#pairs, :303-315)
    if accepted:
        all_fv = np.concatenate([fv for fv, _ in accepted], axis=0)
        size = float(all_fv.size)            # n_pairs * RANK_FV_SIZE
        mean = all_fv.sum(axis=0) / size
        std = np.sqrt((all_fv ** 2).sum(axis=0) / size - mean ** 2)
        std[std == 0] = 1.0
        accepted = [((fv - mean) / std, y) for fv, y in accepted]
    else:
        mean = np.zeros(RANK_FV_SIZE)
        std = np.ones(RANK_FV_SIZE)
    return accepted, mean, std


def train_l2r_lambdarank(docs: list[dict], *, top_k: int = 20,
                         n_workers: int = 4, rounds: int = 5, seed: int = 17):
    """R2 feature generation → R3 LambdaRank training (the reference's
    ``L2RMetricLearning`` style=LambdaRank path, :137-147)."""
    from ir_base_ray.pipelines.lambdarank import train_lambdarank_parallel

    queries, mean, std = build_l2r_queries(docs, top_k=top_k)
    if not queries:
        return np.zeros(RANK_FV_SIZE), [], mean, std
    w, trace = train_lambdarank_parallel(queries, RANK_FV_SIZE,
                                         n_workers=n_workers, rounds=rounds,
                                         seed=seed)
    return w, trace, mean, std
