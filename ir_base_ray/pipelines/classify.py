"""Classifiers (capability tier, SURVEY.md §2.7 R6):

- NaiveBayes: exact transcription of
  ``Classifier/supervised/NaiveBayes.java:70-110`` — training is the A6
  sufficient-statistics aggregation (per-class Σ tf per term, partial+final
  groupby pattern); prediction is a broadcast-weights map_batches stage.
- kNN: top-k nearest neighbours by sparse cosine/dot against a broadcast
  candidate set (Q2 block-nested-loop with per-row bounded heap,
  ``Classifier/semisupervised/PairwiseSimCalculator.java:36-78``).


``Classifier/BaseClassifier.java`` (train/test/CV harness base) is covered by these trainers plus pipelines/evalmetrics.py.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ir_base_ray.perf import pool_size

from ir_base_ray.functions.topk import BoundedTopK


class NaiveBayesModel:
    """log p(y) + per-(class, term) log p(x|y), δ-smoothed exactly like the
    reference (δ_y = δ_xy = 0.1 defaults; ``NaiveBayes.java:29-37,80-88``)."""

    def __init__(self, classes: list, log_py: np.ndarray, log_pxy: dict,
                 presence: bool = False):
        self.classes = classes
        self.log_py = log_py
        self.log_pxy = log_pxy  # {class -> {term -> logprob}}
        self.default_logp = {}  # class -> log(δ) - log(sum) for unseen terms
        self.presence = presence

    def predict_counts(self, counts: Counter):
        best, best_c = -math.inf, self.classes[0]
        for ci, c in enumerate(self.classes):
            s = self.log_py[ci]
            table = self.log_pxy[c]
            default = self.default_logp[c]
            for term, tf in counts.items():
                v = 1.0 if self.presence else float(tf)
                s += table.get(term, default) * v
            if s > best:
                best, best_c = s, c
        return best_c


def train_naive_bayes(ds, *, label_col: str, text_col: str, tokenizer,
                      delta_y: float = 0.1, delta_xy: float = 0.1,
                      presence: bool = False) -> NaiveBayesModel:
    """Distributed sufficient stats (combiner + groupby-sum, A6) → driver
    normalization (``NaiveBayes.java:80-88``):
      pY[c]   = ln(count_c + δ_y)
      Pxy[c][t] = ln(δ_xy + Σtf) - ln(Σ_t Σtf + V·δ_xy)
    V = global vocabulary size (the reference uses its feature-space size)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # tokenization is per-doc (the tokenizer mirrors the SQL oracle); the
        # (label, term) merge is batched — flat label/term/tf arrays, one
        # pandas factorize + bincount instead of a Python Counter over tuples
        labs: list[str] = []
        terms: list[str] = []
        tfs: list[float] = []
        for lab, t in zip(batch.column(label_col).to_pylist(),
                          batch.column(text_col).to_pylist()):
            counts = tokenizer(t or "")
            lab = str(lab)
            labs.extend([lab] * len(counts))
            terms.extend(counts.keys())
            tfs.extend(counts.values())
        if not terms:
            return pa.table({"label": pa.array([], pa.string()),
                             "term": pa.array([], pa.string()),
                             "tf_part": pa.array([], pa.float64())})
        import numpy as np
        import pandas as pd

        key = pd.MultiIndex.from_arrays([labs, terms])
        codes, uniq = pd.factorize(key, sort=True)
        w = (np.ones(len(tfs)) if presence
             else np.asarray(tfs, dtype=np.float64))
        sums = np.bincount(codes, weights=w, minlength=len(uniq))
        return pa.table({
            "label": pa.array(uniq.get_level_values(0), pa.string()),
            "term": pa.array(uniq.get_level_values(1), pa.string()),
            "tf_part": pa.array(sums, pa.float64()),
        })

    stats = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "term"])
        .aggregate(Sum("tf_part", alias_name="sum_tf"))
        .to_pandas()
    )
    from ray.data.aggregate import Count

    class_counts = (
        ds.groupby(label_col).aggregate(Count(alias_name="n")).to_pandas()
    )
    classes = sorted(class_counts[label_col].astype(str))
    n_by_class = dict(zip(class_counts[label_col].astype(str), class_counts["n"]))
    vocab = stats["term"].nunique()

    log_py = np.array([math.log(n_by_class[c] + delta_y) for c in classes])
    log_pxy = {}
    default_logp = {}
    for c in classes:
        sub = stats[stats["label"] == c]
        total = float(sub["sum_tf"].sum())
        log_sum = math.log(total + vocab * delta_xy)
        log_pxy[c] = {
            t: math.log(delta_xy + v) - log_sum
            for t, v in zip(sub["term"], sub["sum_tf"])
        }
        default_logp[c] = math.log(delta_xy) - log_sum
    model = NaiveBayesModel(classes, log_py, log_pxy, presence)
    model.default_logp = default_logp
    return model


def predict_naive_bayes(ds, model: NaiveBayesModel, *, id_col: str,
                        text_col: str, tokenizer, concurrency=4):
    """Broadcast-model actor-pool prediction stage."""
    model_ref = ray.put(model)

    class Predictor:
        def __init__(self):
            self.model = ray.get(model_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            preds = [
                self.model.predict_counts(tokenizer(t or ""))
                for t in batch.column(text_col).to_pylist()
            ]
            return pa.table({
                id_col: batch.column(id_col),
                "pred": pa.array(preds, pa.string()),
            })

    return ds.map_batches(Predictor, batch_format="pyarrow",
                          concurrency=pool_size(concurrency), num_cpus=1)


def knn_topk(ds, candidates: pd.DataFrame, *, k: int, id_col: str,
             vec_terms_col: str = "terms", vec_tfs_col: str = "tfs",
             concurrency=4):
    """Q2: for each row, scan ALL candidates, keep top-k by cosine over
    sparse term vectors. Candidates broadcast once (ray.put); per-row bounded
    heap with the reference's tie semantics. Returns (id, rank,
    neighbor_id, sim) rows."""
    cand_vecs = []
    for _, row in candidates.iterrows():
        counts = dict(zip(row[vec_terms_col], row[vec_tfs_col]))
        norm = math.sqrt(sum(v * v for v in counts.values()))
        cand_vecs.append((row[id_col], counts, norm))
    cand_ref = ray.put(cand_vecs)

    class Scorer:
        def __init__(self):
            self.cands = ray.get(cand_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_id, out_rank, out_n, out_s = [], [], [], []
            ids = batch.column(id_col).to_pylist()
            terms = batch.column(vec_terms_col).to_pylist()
            tfs = batch.column(vec_tfs_col).to_pylist()
            for rid, ts, fs in zip(ids, terms, tfs):
                counts = dict(zip(ts, fs))
                norm = math.sqrt(sum(v * v for v in counts.values()))
                heap = BoundedTopK(k)
                for cid, cvec, cnorm in self.cands:
                    if cid == rid:
                        continue
                    dot = 0.0
                    small, big = (counts, cvec) if len(counts) < len(cvec) else (cvec, counts)
                    for t, v in small.items():
                        w = big.get(t)
                        if w is not None:
                            dot += v * w
                    sim = dot / norm / cnorm if norm and cnorm else 0.0
                    heap.add(sim, cid)
                for rank, (sim, cid) in enumerate(heap.result()):
                    out_id.append(rid)
                    out_rank.append(rank)
                    out_n.append(cid)
                    out_s.append(sim)
            return pa.table({
                id_col: pa.array(out_id),
                "rank": pa.array(out_rank, pa.int64()),
                "neighbor_id": pa.array(out_n),
                "sim": pa.array(out_s, pa.float64()),
            })

    return ds.map_batches(Scorer, batch_format="pyarrow",
                          concurrency=pool_size(concurrency), num_cpus=1)


def knn_lsh_classify(train_df, test_ds, *, n_features: int, classes,
                     k: int = 5, n_planes: int = 10, seed: int = 97,
                     id_col: str = "doc_id", concurrency=4):
    """KNN (``Classifier/supervised/KNN.java``): the LSH-bucketed k-nearest-
    neighbor classifier — ``l`` random hyperplanes in [−1,1)^F hash every
    train doc into a sign-pattern bucket (``init``/``getHashCode``
    :28-41,66-72, seeded Philox replacing the unseeded Random); prediction
    hashes the test doc, ranks its OWN BUCKET's docs by sparse dot product
    in a bounded k-heap and majority-votes their labels (first max wins,
    ``predict`` :74-97 — the reference ignores similarity in the vote, its
    own 'why don't we consider the similarity?' comment kept as-is). Docs
    whose bucket holds fewer than k train docs fall back to the whole
    train set (the reference errors out; documented grace). Train buckets
    broadcast once; at crawl scale the same sign-hash becomes the
    co-location groupby key so each bucket scan stays block-local.

    ``train_df``: pandas (doc_id, tids, vals, label-int). Returns a
    Dataset (id, pred) with pred = class index."""
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))
    planes = 2.0 * rng.random((n_planes, n_features)) - 1.0

    def sign_hash(tids, vals):
        code = 0
        for p in range(n_planes):
            s = float((planes[p, tids] * vals).sum())
            code = (code << 1) | (1 if s > 0 else 0)
        return code

    buckets: dict[int, list] = {}
    all_train = []
    for row in train_df.itertuples():
        t = np.asarray(row.tids, dtype=np.int64)
        v = np.asarray(row.vals, dtype=np.float64)
        y = int(row.label)
        entry = (t, v, y)
        all_train.append(entry)
        buckets.setdefault(sign_hash(t, v), []).append(entry)
    state_ref = ray.put((planes, buckets, all_train))
    n_classes = len(classes)

    class Knn:
        def __init__(self):
            self.planes, self.buckets, self.all = ray.get(state_ref)

        def _hash(self, t, v):
            code = 0
            for p in range(n_planes):
                s = float((self.planes[p, t] * v).sum())
                code = (code << 1) | (1 if s > 0 else 0)
            return code

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_pylist()
            tids = batch.column("tids").to_pylist()
            vals = batch.column("vals").to_pylist()
            preds = []
            for t, v in zip(tids, vals):
                t = np.asarray(t, dtype=np.int64)
                v = np.asarray(v, dtype=np.float64)
                cands = self.buckets.get(self._hash(t, v), [])
                if len(cands) < k:
                    cands = self.all
                dense = np.zeros(n_features)
                dense[t] = v
                sims = [(float((dense[ct] * cv).sum()), i, cy)
                        for i, (ct, cv, cy) in enumerate(cands)]
                # bounded k-heap, reference tie semantics: incumbent wins
                # (stable sort on (-sim, insertion order))
                sims.sort(key=lambda x: (-x[0], x[1]))
                counts = np.zeros(n_classes)
                for _s, _i, cy in sims[:k]:
                    counts[cy] += 1
                preds.append(int(np.argmax(counts)))   # first max wins
            return pa.table({id_col: batch.column(id_col),
                             "pred": pa.array(preds, pa.int64())})

    return test_ds.map_batches(Knn, batch_format="pyarrow",
                               concurrency=concurrency)
