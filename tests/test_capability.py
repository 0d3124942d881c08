"""Capability-tier tests: similarity kernels, evaluators (golden Java
traces), LM ranker vs serial transcription, NaiveBayes, weighting schemes,
feature selection, dedup + ANN on planted data."""

import math
import os
import re

import numpy as np
import pandas as pd
import pytest

from ir_base_ray.functions.similarity import (
    count_occurrences,
    ends_with_punct,
    entropy,
    euclidean_distance_sq,
    is_number,
    kl_divergence,
    kl_symmetric,
    lcs_length,
    log_sum,
    log_sum2,
    sparse_cosine,
    sparse_dot,
    sparse_index_of,
    sparse_jaccard,
    sparse_rbf,
)
from ir_base_ray.pipelines.evalmetrics import average_precision, ndcg_at_k


def test_sparse_kernels():
    i1, v1 = [0, 2, 5, 9], [1.0, 2.0, 3.0, 4.0]
    i2, v2 = [2, 5, 7], [10.0, 20.0, 30.0]
    assert sparse_dot(i1, v1, i2, v2) == 2.0 * 10 + 3.0 * 20
    assert sparse_jaccard(i1, i2) == 2 / (4 + 3 - 2)
    assert sparse_rbf(i1, v1, i2, v2, 2.0) == math.exp(-((2 - 10) ** 2 + (3 - 20) ** 2) / 2.0)
    expected_cos = (2.0 * 10 + 3.0 * 20) / math.sqrt(1 + 4 + 9 + 16) / math.sqrt(100 + 400 + 900)
    assert abs(sparse_cosine(i1, v1, i2, v2) - expected_cos) < 1e-15
    assert sparse_index_of(i1, 5) == 2
    assert sparse_index_of(i1, 4) == -1
    assert sparse_index_of([], 1) == -1


def test_scalar_functions():
    assert is_number("0042") and not is_number("x1") and not is_number("")
    assert abs(entropy([0.5, 0.5]) - math.log(2)) < 1e-15
    xs = [-1.0, -2.0, -3.0]
    assert abs(log_sum(xs) - math.log(sum(math.exp(x) for x in xs))) < 1e-12
    assert log_sum2(float("-inf"), -1.0) == -1.0
    assert kl_divergence([0.5, 0.5, 0.0], [0.25, 0.75, 0.1]) == pytest.approx(
        0.5 * math.log(2) + 0.5 * math.log(0.5 / 0.75)
    )
    assert kl_symmetric([0.5, 0.5], [0.5, 0.5]) == 0.0
    assert euclidean_distance_sq([0, 0], [3, 4]) == 25.0  # squared, no sqrt
    assert lcs_length("abcde", "ace") == 3
    assert lcs_length(["a", "b"], ["b", "a"]) == 1
    assert count_occurrences("aaa", "aa") == 1  # non-overlapping, Java semantics
    assert ends_with_punct("end.") and not ends_with_punct("end")


def test_eval_golden_traces(golden_dir):
    bad = []
    with open(os.path.join(golden_dir, "eval_traces.txt")) as f:
        for line in f:
            m = re.match(r"T (\d+) k=(\d+) in=(\S*) ap=(\S+) ndcg=(\S+)", line)
            if not m:
                continue
            k = int(m.group(2))
            pairs = [p.split(":") for p in m.group(3).split(",") if p]
            labels = [int(a) for a, _ in pairs]
            scores = [float(b) for _, b in pairs]
            ap, nd = average_precision(scores, labels), ndcg_at_k(scores, labels, k)
            exp_ap, exp_nd = float(m.group(4)), float(m.group(5))
            if not ((ap == exp_ap or (math.isnan(ap) and math.isnan(exp_ap)))
                    and (nd == exp_nd or (math.isnan(nd) and math.isnan(exp_nd)))):
                bad.append(m.group(1))
    assert not bad, f"eval trace mismatches: {bad[:5]}"


def test_lm_ranker_matches_serial(ray_session, tmp_path):
    """LMRanker over the index == direct serial transcription of
    rankChild4StnByLanguageModel over the oracle vectors."""
    import ray.data

    from ir_base_ray.config import AnalyzerSpec, IndexConfig
    from ir_base_ray.pipelines.build_index import build_index
    from ir_base_ray.pipelines.lm_ranker import LMRanker
    from ir_base_ray.pipelines.query_engine import IndexSegment
    from ir_base_ray.sources.corpus import synth_corpus
    from tests.oracle import oracle_build, oracle_query_vector

    tbl = synth_corpus(150, seed=5)
    out = str(tmp_path / "lmidx")
    cfg = IndexConfig(out_dir=out, block_doc_range=32, num_partitions=4,
                      analyzer_concurrency=2, analyzer=AnalyzerSpec(ngram=1))
    build_index(ray.data.from_arrow(tbl).select_columns(["url", "text"]), cfg)
    oi = oracle_build(tbl, AnalyzerSpec(ngram=1))
    seg = IndexSegment(out)
    ranker = LMRanker(seg, mu=1000.0)

    total_ttf = sum(oi.ttf.values())
    for text in ["zubeta kero the", "lesuhogo nala", "the and of"]:
        got = dict(zip(range(seg.doc_len.size), ranker.score_all(text)))
        qvec = oracle_query_vector(oi, text)
        for doc_id in oi.doc_ids[:40]:
            dl = oi.doc_len[doc_id]
            alpha = 1000.0 / (1000.0 + dl)
            expected = 0.0
            for term, qtf in qvec:
                tf_d = oi.doc_vecs[doc_id].get(term, 0)
                p_w = oi.ttf[term] / total_ttf
                smoothing = (1 - alpha) * tf_d / dl + alpha * p_w
                expected += qtf * math.log(smoothing)
            assert got[doc_id] == pytest.approx(expected, rel=1e-12, abs=1e-12)


def test_naive_bayes_roundtrip(ray_session):
    """NB on a trivially separable corpus recovers the classes."""
    import ray.data
    from collections import Counter

    from ir_base_ray.pipelines.classify import predict_naive_bayes, train_naive_bayes

    rows = []
    for i in range(60):
        if i % 2 == 0:
            rows.append({"id": i, "text": "apple banana fruit sweet", "label": "fruit"})
        else:
            rows.append({"id": i, "text": "engine wheel metal fast", "label": "car"})
    ds = ray.data.from_items(rows)
    tok = lambda t: Counter(t.split())
    model = train_naive_bayes(ds, label_col="label", text_col="text", tokenizer=tok)
    preds = predict_naive_bayes(ds, model, id_col="id", text_col="text",
                                tokenizer=tok, concurrency=2).to_pandas()
    merged = preds.merge(pd.DataFrame(rows), on="id")
    assert (merged["pred"] == merged["label"]).all()


def test_weighting_schemes_match_reference_formulas(ray_session, tmp_path):
    """W1-W6 over the analyzed dataset == scalar reference formulas."""
    import ray.data

    from ir_base_ray.config import AnalyzerSpec, IndexConfig
    from ir_base_ray.pipelines.build_index import build_index
    from ir_base_ray.stages.weighting import set_feature_values
    from tests.oracle import oracle_build
    from ir_base_ray.sources.corpus import synth_corpus

    tbl = synth_corpus(120, seed=9)
    out = str(tmp_path / "widx")
    cfg = IndexConfig(out_dir=out, block_doc_range=64, num_partitions=4,
                      analyzer_concurrency=2, analyzer=AnalyzerSpec(ngram=1))
    build_index(ray.data.from_arrow(tbl).select_columns(["url", "text"]), cfg)
    oi = oracle_build(tbl, AnalyzerSpec(ngram=1))

    import ray

    analyzed = ray.data.read_parquet(os.path.join(out, "analyzed"))
    dict_pdf = ray.data.read_parquet(os.path.join(out, "dict")).to_pandas().sort_values("term_id")
    dict_ref = ray.put((pd.Index(dict_pdf["term"]), dict_pdf["df"].to_numpy()))

    for scheme in ("TF", "TFIDF", "TFIDF-sublinear", "BM25", "PLN"):
        weighted = set_feature_values(
            analyzed, dict_ref, N=oi.N, avgdl=oi.avgdl, scheme=scheme, norm=0
        ).to_pandas().set_index("doc_id").sort_index()
        # check a handful of docs against scalar math
        for doc_id in [0, 3, 7]:
            row = weighted.loc[doc_id]
            terms = list(row["terms"])
            vals = np.asarray(row["values"])
            dl = oi.doc_len[doc_id]
            for t, got in zip(terms[:10], vals[:10]):
                tf = oi.doc_vecs[doc_id][t]
                df = float(oi.df[t])
                if scheme == "TF":
                    exp = float(tf)
                elif scheme == "TFIDF":
                    exp = tf / dl * math.log((oi.N + 1) / df)
                elif scheme == "TFIDF-sublinear":
                    exp = (1 + math.log10(tf)) * (1 + math.log10(oi.N / df))
                elif scheme == "BM25":
                    n = dl / oi.avgdl
                    idf = math.log((oi.N - df + 0.5) / (df + 0.5))
                    exp = idf * tf * 2.5 / (1.5 * (1 - 0.75 + 0.75 * n) + tf)
                else:  # PLN
                    n = dl / oi.avgdl
                    idf = math.log((oi.N + 1) / df)
                    exp = (1 + math.log(1 + math.log(tf)) / (1 - 0.5 + 0.5 * n)) * idf
                assert got == pytest.approx(exp, rel=1e-12), (scheme, t)

    # L2 norm
    weighted = set_feature_values(
        analyzed, dict_ref, N=oi.N, avgdl=oi.avgdl, scheme="TFIDF", norm=2
    ).to_pandas().set_index("doc_id").sort_index()
    v = np.asarray(weighted.loc[0]["values"])
    assert np.sqrt((v * v).sum()) == pytest.approx(1.0)


def test_featsel_reference_quirks():
    from ir_base_ray.stages.featsel import (
        chi_square,
        df_scores,
        proportional_select,
        top_k_select,
        union_selectors,
    )

    stats = pd.DataFrame({"term": list("abcdef"), "df": [1, 5, 6, 10, 50, 100]})
    # exclusive band: df > 5 and df < 100 keeps c, d, e only
    kept = df_scores(stats, 5, 100)
    assert sorted(kept["term"]) == ["c", "d", "e"]
    # proportional select: ascending by score, [start*n, end*n)
    scored = pd.DataFrame({"term": list("abcd"), "score": [4.0, 1.0, 3.0, 2.0]})
    assert proportional_select(scored, 0.25, 0.75) == ["d", "c"]
    assert top_k_select(scored, 2) == ["a", "c"]
    assert union_selectors(["a", "b"], ["b", "c"]) == ["a", "b", "c"]
    # ChiSquare formula spot-check (Utils.java:900-907)
    v = chi_square(100, np.array([10.0]), np.array([8.0]), 40)
    A, B, C, D = 8.0, 2.0, 32.0, 58.0
    exp = 100 * (A * D - B * C) ** 2 / 40 / (B + D) / 10.0 / (C + D)
    assert v[0] == pytest.approx(exp)


def test_exact_dedup_planted(ray_session):
    import ray.data

    from ir_base_ray.stages.dedup import exact_dedup

    rows = [{"doc_id": i, "text": f"unique text {i}"} for i in range(20)]
    rows += [{"doc_id": 100 + i, "text": "duplicated body"} for i in range(5)]
    out = exact_dedup(ray.data.from_items(rows)).to_pandas()
    dup_row = out[out["n_dups"] == 5]
    assert len(dup_row) == 1 and int(dup_row["doc_id"].iloc[0]) == 100
    assert len(out) == 21


def test_minhash_and_jaccard_agree(ray_session):
    """LSH candidates verified with exact Jaccard must be a subset of (and on
    near-dups equal to) the exact inverted-index pairs."""
    import ray.data

    from ir_base_ray.stages.dedup import minhash_lsh_dedup, ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [{"doc_id": i, "text": f"totally different text number {i} " + "filler " * (i % 5)} for i in range(15)]
    rows.append({"doc_id": 50, "text": base})
    rows.append({"doc_id": 51, "text": base + " extra"})
    ds = ray.data.from_items(rows)
    exact = ngram_jaccard_pairs(ds, shingle_n=3, threshold=0.5).to_pandas()
    lsh = minhash_lsh_dedup(ds, num_perm=64, num_bands=32, shingle_n=3, threshold=0.5).to_pandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    lsh_pairs = set(zip(lsh["id_a"], lsh["id_b"]))
    assert (50, 51) in exact_pairs
    assert (50, 51) in lsh_pairs
    assert lsh_pairs <= exact_pairs


def test_simhash_near_pairs(ray_session):
    import ray.data

    from ir_base_ray.stages.dedup import simhash_dataset, simhash_near_pairs

    base = " ".join(f"tok{i}" for i in range(60))
    rows = [{"doc_id": 0, "text": base},
            {"doc_id": 1, "text": base.replace("tok3", "tokX")},
            {"doc_id": 2, "text": " ".join(f"other{i}" for i in range(60))}]
    sim = simhash_dataset(ray.data.from_items(rows), concurrency=1)
    # one-token edits on short uniform-weight docs still flip ~25% of the
    # near-zero accumulator bits (deterministic here with the md5 token hash:
    # d(0,1)=10, d(0,2)=36, d(1,2)=32), so the near-dup budget is 20 bits
    pairs = simhash_near_pairs(sim, max_hamming=20).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_ann_brute_force_exact(ray_session):
    import ray.data

    from ir_base_ray.stages.ann import brute_force_topk

    rng = np.random.default_rng(4)
    mat = rng.standard_normal((200, 16))
    rows = [{"vec_id": i, "embedding": mat[i].astype(np.float32).tolist()} for i in range(200)]
    ds = ray.data.from_items(rows)
    q = mat[:3].astype(np.float32).astype(np.float64)
    out = brute_force_topk(ds, np.arange(3), q, k=5, concurrency=2)
    # verify vs full numpy
    m64 = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mn = m64 / np.linalg.norm(m64, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ mn.T
    for qi in range(3):
        expected = np.lexsort((np.arange(200), -sims[qi]))[:5]
        got = out[out["query_id"] == qi].sort_values("rank")["vec_id"].to_numpy()
        np.testing.assert_array_equal(got, expected)


def test_knn_topk(ray_session):
    import ray.data

    from ir_base_ray.pipelines.classify import knn_topk

    rows = [
        {"id": 0, "terms": ["a", "b"], "tfs": [1, 1]},
        {"id": 1, "terms": ["a", "b"], "tfs": [2, 2]},  # same direction as 0
        {"id": 2, "terms": ["c", "d"], "tfs": [1, 1]},
    ]
    cand = pd.DataFrame(rows)
    out = knn_topk(ray.data.from_items(rows), cand, k=1, id_col="id",
                   concurrency=1).to_pandas()
    assert int(out[out["id"] == 0]["neighbor_id"].iloc[0]) == 1
    assert int(out[out["id"] == 1]["neighbor_id"].iloc[0]) == 0


def test_media_features(ray_session):
    import ray.data

    from ir_base_ray.stages.multimodal import media_features, synth_media_table

    tbl = synth_media_table(30, seed=1)
    out = media_features(ray.data.from_arrow(tbl), concurrency=1).to_pandas()
    assert len(out) == 30
    assert all(len(f) == 8 for f in out["feature"])
    # deterministic stub decode
    out2 = media_features(ray.data.from_arrow(tbl), concurrency=1).to_pandas()
    assert out.sort_values("media_id")["feature"].map(tuple).tolist() == \
        out2.sort_values("media_id")["feature"].map(tuple).tolist()


def test_media_decode_resolver_both_paths():
    """resolve_decode_fn picks the PIL-backed real decode when PIL is
    importable and the deterministic stub otherwise; both produce the same
    output contract (8x8 float32 in [0,1]), so the pipeline schema is
    decode-implementation-independent."""
    from ir_base_ray.stages import multimodal as mm

    fn = mm.resolve_decode_fn()
    try:
        import PIL.Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if has_pil:
        assert fn is mm.pil_decode
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (32, 16), (10, 200, 30)).save(buf, "PNG")
        out = fn(buf.getvalue(), 32, 16)
    else:
        assert fn is mm.deterministic_fake_decode
        out = fn(b"\x07" * 256, 32, 16)
    assert out.shape == (8, 8)
    assert out.dtype == np.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # the actor resolves decode_fn=None through the same guard
    assert mm.MediaFeatureActor(decode_fn=None).decode is fn


def test_near_dup_lsh_subset_of_exact(ray_session):
    """Multi-table LSH near-dup pairs are a subset of the exact all-pairs
    result, with deterministic recall at fixed seeds/params."""
    import ray.data

    from ir_base_ray.stages.ann import embedding_near_dup, exact_near_dup

    rng = np.random.default_rng(11)
    base = rng.standard_normal((120, 16))
    # plant 20 near-dup pairs: tiny perturbations of existing rows
    dups = base[:20] + 0.03 * rng.standard_normal((20, 16))
    mat = np.vstack([base, dups]).astype(np.float32)
    tbl = pd.DataFrame({"vec_id": np.arange(len(mat), dtype=np.int64),
                        "embedding": [list(map(float, r)) for r in mat]})
    ds = ray.data.from_pandas(tbl)

    exact = exact_near_dup(ds, threshold=0.95).to_pandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    assert len(exact_pairs) >= 20  # all planted pairs found

    lsh = embedding_near_dup(ds, dim=16, threshold=0.95, n_bits=6,
                             n_tables=8).to_pandas()
    lsh_pairs = set(zip(lsh["id_a"], lsh["id_b"]))
    assert lsh_pairs <= exact_pairs  # no false positives (exact verify inside buckets)
    recall = len(lsh_pairs) / len(exact_pairs)
    assert recall >= 0.9  # high-threshold near-dups: multi-table LSH recall ~1


def test_plsa_matches_serial_reference(ray_session):
    """Distributed pLSA (A7 partial-sstat pattern) vs the serial oracle with
    identical seeds/formulas: φ equal to float tolerance, loglik increasing."""
    import ray.data

    from ir_base_ray.pipelines.plsa import plsa_reference_serial, train_plsa

    rng = np.random.default_rng(3)
    V, K, n_docs = 60, 4, 80
    tids_list, vals_list, rows = [], [], []
    for d in range(n_docs):
        n = rng.integers(5, 15)
        jj = np.sort(rng.choice(V, size=n, replace=False))
        vv = rng.integers(1, 5, size=n).astype(float)
        tids_list.append(jj.tolist())
        vals_list.append(vv.tolist())
        rows.append({"doc_id": d, "tids": jj.tolist(), "vals": vv.tolist()})

    ds = ray.data.from_items(rows)
    dist = train_plsa(ds, n_topics=K, vocab_size=V, n_iters=8, seed=11)
    ser = plsa_reference_serial(tids_list, vals_list, n_topics=K, vocab_size=V,
                               n_iters=8, seed=11)
    np.testing.assert_allclose(dist["topic_term"], ser["topic_term"],
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(dist["loglik_trace"], ser["loglik_trace"], rtol=1e-9)
    # EM must not decrease the (complete-data) likelihood over the run
    assert dist["loglik_trace"][-1] > dist["loglik_trace"][0]


def test_sentence_split_analyzer(ray_session):
    """M11: per-sentence vectors; sentence kept iff >2 distinct terms, doc
    kept iff >= stn_threshold sentences (DocAnalyzer.java:491-541)."""
    import ray.data

    from ir_base_ray.stages.sentences import analyze_with_sentences, split_sentences

    assert split_sentences("One ran far. Two jumped high! Three?") == \
        ["One ran far.", "Two jumped high!", "Three?"]
    assert split_sentences("Dr. J. Smith arrived. He sat down.")[-1] == "He sat down."

    rows = [
        {"doc_id": 0, "text": "Wolves hunted deer nightly. Rivers flooded valley plains. Extra words here matter."},
        {"doc_id": 1, "text": "Short. Tiny. No."},  # every sentence <= 2 terms -> dropped
    ]
    out = analyze_with_sentences(ray.data.from_items(rows), concurrency=1).to_pandas()
    assert list(out["doc_id"]) == [0]
    assert len(out["sentences"].iloc[0]) >= 2
    assert all(len(t) > 2 for t in out["stn_terms"].iloc[0])


def test_lambdarank_parallel(ray_session):
    """A10 weight averaging: 1-worker parallel == serial shard training
    bit-for-bit; multi-worker training reduces pairwise misorder on linearly
    rankable data."""
    from ir_base_ray.pipelines.lambdarank import (
        misorder_count, train_lambdarank_parallel, train_shard)

    rng = np.random.default_rng(5)
    w_true = np.array([2.0, -1.0, 0.5])
    queries = []
    for _ in range(24):
        fv = rng.standard_normal((6, 3))
        score = fv @ w_true + 0.05 * rng.standard_normal(6)
        y = np.argsort(np.argsort(score))  # relevance = rank of true score
        queries.append((fv, y.astype(np.int64)))

    # exact equivalence: one worker == serial with the same seed
    w_par, _ = train_lambdarank_parallel(queries, 3, n_workers=1, rounds=1,
                                         max_iter=2, seed=17)
    w_ser = train_shard(queries, np.zeros(3), max_iter=2, window_size=5,
                        init_step=1.0, shrinkage=0.95, lam=1e-3, seed=17)
    np.testing.assert_allclose(w_par, w_ser, rtol=0, atol=0)

    # learning: 4-worker averaged training cuts misorder well below random
    w4, trace = train_lambdarank_parallel(queries, 3, n_workers=4, rounds=6,
                                          max_iter=2, seed=17)
    assert trace[-1] < trace[0] * 0.35, trace


def test_ivf_topk_recall_vs_exact(ray_session):
    """IVF-Flat with generous probing must recover most of the exact top-k;
    with n_probe == n_clusters it IS exact (every bucket scanned)."""
    import pyarrow as pa
    import ray.data

    from ir_base_ray.stages.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(12)
    n, dim = 400, 16
    mat = rng.normal(size=(n, dim))
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(tbl)
    q_ids = np.arange(5, dtype=np.int64)
    q_mat = mat[:5]
    exact = brute_force_topk(ds, q_ids, q_mat, k=10)
    # full probe == exact (same tie-break: score desc, vec_id asc)
    full = ivf_topk(ds, q_ids, q_mat, k=10, n_clusters=8, n_probe=8, seed=19)
    for qid in q_ids:
        e = exact[exact["query_id"] == qid]["vec_id"].tolist()
        f = full[full["query_id"] == qid]["vec_id"].tolist()
        assert e == f, (qid, e, f)
    # partial probe: recall ≥ 0.6 on random data with 8 clusters / 3 probes
    approx = ivf_topk(ds, q_ids, q_mat, k=10, n_clusters=8, n_probe=3, seed=19)
    hits = total = 0
    for qid in q_ids:
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.6, hits / total


def test_shuffled_sample_partition_invariant(ray_session):
    """Q8 seeded hash shuffle: the md5('7:'||doc_id) order is a pure
    function of the row — the sampled set must not depend on the block
    layout (the property Dataset.random_shuffle(seed) does NOT have)."""
    import hashlib

    import pyarrow as pa
    import ray as _ray

    def key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        ks = [hashlib.md5(f"7:{i}".encode()).hexdigest() for i in ids]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "shuffle_key": pa.array(ks, pa.string())})

    rows = [{"doc_id": i} for i in range(500)]
    picks = []
    for nb in (1, 7):
        ds = _ray.data.from_items(rows, override_num_blocks=nb)
        out = (ds.map_batches(key, batch_format="pyarrow")
               .sort("shuffle_key").limit(50).to_pandas())
        picks.append(list(out["doc_id"]))
    assert picks[0] == picks[1]
    assert len(set(picks[0])) == 50


def test_repetition_stats(ray_session):
    """Gopher-style repetition signals: hand-checked fractions."""
    import pyarrow as pa
    import ray as _ray

    from ir_base_ray.stages.textstats import repetition_stats

    docs = [
        {"doc_id": 0, "text": "a b a b\nx y\nx y"},
        {"doc_id": 1, "text": "hello world"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "x x x x"},
    ]
    out = (repetition_stats(_ray.data.from_items(docs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["n_lines"]) == [3, 1, 0, 1]
    # doc 0: 3 lines, 2 distinct -> 1/3; dup chars 3 of 13; bigrams
    # [a b, b a, a b, b x, x y, y x, x y] -> top 2/7
    assert abs(out["dup_line_frac"][0] - round(1 / 3, 6)) < 1e-9
    assert abs(out["dup_line_char_frac"][0] - round(3 / 13, 6)) < 1e-9
    assert abs(out["top_bigram_frac"][0] - round(2 / 7, 6)) < 1e-9
    # doc 3: single repeated token -> top bigram 'x x' = 3/3
    assert out["top_bigram_frac"][3] == 1.0
    assert out["dup_line_frac"][3] == 0.0
    assert list(out["top_bigram_frac"][[1, 2]]) == [1.0, 0.0]


def test_fingerprint_ckernel_parity():
    """The compile-once C fingerprint kernel must reproduce the per-byte
    Python rolling hash bit-exactly (incl. nulls, empty, short-of-window and
    multibyte UTF-8 docs); when no compiler exists the actor must still run
    via the Python path."""
    import numpy as np
    import pyarrow as pa

    from ir_base_ray.stages.textstats import FingerprintActor

    rng = np.random.default_rng(5)
    texts = ["".join(chr(rng.integers(32, 127)) for _ in range(int(n)))
             for n in rng.integers(0, 300, 64)]
    texts += ["", None, "short", "exactly-16-bytes", "é中文 \U0001F600 mixed" * 7]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    act = FingerprintActor()
    got = act(batch)
    want = act._call_py(batch)
    assert got.equals(want)
    if act.lib is None:  # compiler-less environment: Python path already used
        assert got.column("fingerprint").to_pylist() == \
            want.column("fingerprint").to_pylist()


def test_plsa_group_prior(ray_session):
    """pLSAGroup (pLSAGroup.java): the per-iteration group prior must equal
    ((α−1) + Σ_{d∈g} θ_d)/(1+|g|), and the prior must pull same-group docs'
    θ together relative to plain pLSA."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ir_base_ray.pipelines.plsa import train_plsa, train_plsa_group

    rng = np.random.default_rng(4)
    rows = []
    for i in range(24):
        base = 0 if i % 2 == 0 else 15
        tids = np.unique(rng.integers(base, base + 15,
                                      size=rng.integers(4, 10)))
        rows.append({"doc_id": i, "tids": tids.tolist(),
                     "vals": [1.0] * len(tids), "group": f"g{i % 2}"})
    ds = ray.data.from_pandas(pd.DataFrame(rows))

    # 1 iteration from the uniform θ init: prior_g = ((α−1) + n_g/K)/(1+n_g)
    out1 = train_plsa_group(ds, n_topics=4, vocab_size=30, n_iters=1,
                            seed=7, alpha=1.05)
    n_g = 12
    want = ((1.05 - 1.0) + n_g / 4.0) / (1.0 + n_g)
    assert np.allclose(out1["group_prior"], want)

    out = train_plsa_group(ds, n_topics=4, vocab_size=30, n_iters=8, seed=7)
    base = train_plsa(ds.drop_columns(["group"]), n_topics=4, vocab_size=30,
                      n_iters=8, seed=7)

    def cohesion(thetas_blocks, groups_of_doc):
        # mean pairwise L1 distance within groups (blocks concatenated in
        # block order; group ids aligned the same way)
        th = np.concatenate(thetas_blocks)
        d0 = th[groups_of_doc == 0]
        d1 = th[groups_of_doc == 1]
        tot, cnt = 0.0, 0
        for grp in (d0, d1):
            for a in range(len(grp)):
                for b in range(a + 1, len(grp)):
                    tot += float(np.abs(grp[a] - grp[b]).sum())
                    cnt += 1
        return tot / cnt

    gids = np.array([i % 2 for i in range(24)])
    assert cohesion(out["thetas"], gids) < cohesion(base["thetas"], gids)
    out2 = train_plsa_group(ds, n_topics=4, vocab_size=30, n_iters=8, seed=7)
    assert all(np.array_equal(a, b) for a, b in zip(out["thetas"],
                                                    out2["thetas"]))


def test_attribute_aware_lda(ray_session):
    """AttributeAwareLDA (topicmodels/multithreads/LDA/AttributeAware…):
    the per-word pairwise-PR projection must (a) satisfy the dual KKT
    conditions, (b) drive a topic PAIR apart onto disjoint planted
    vocabulary halves where unregularized variational LDA leaves them
    mixed, (c) run deterministically."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ir_base_ray.pipelines.attrlda import (_pair_index, solve_pair_dual,
                                               train_attr_lda)

    rng = np.random.default_rng(1)
    p = rng.dirichlet(np.ones(6))
    s = rng.uniform(0, 5, 6)
    lam, q = solve_pair_dual(p, s)
    w = p * np.exp(-s * lam)
    qn = w / w.sum()
    grad = 2 * 0.1 * lam - s * qn
    for l_, g_ in zip(lam, grad):
        assert (l_ > 1e-9 and abs(g_) < 1e-3) or (l_ <= 1e-9 and g_ >= -1e-3)
    assert np.allclose(q, qn)
    assert list(_pair_index(6)) == [1, 0, 3, 2, 5, 4]

    rows = []
    r = np.random.default_rng(3)
    for d in range(60):
        base = 0 if d % 2 == 0 else 15
        tids = np.unique(r.integers(base, base + 15, size=8))
        rows.append({"doc_id": d, "tids": tids.tolist(),
                     "vals": [2.0] * len(tids)})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = train_attr_lda(ds, n_aspects=1, vocab_size=30, n_iters=6,
                         pr_start=2, seed=59)
    tt = out["topic_term"]
    h0 = float(tt[0][:15].sum() / tt[0].sum())
    h1 = float(tt[1][:15].sum() / tt[1].sum())
    assert abs(h0 - h1) >= 0.9, (h0, h1)      # pair split onto the halves
    no_pr = train_attr_lda(ds, n_aspects=1, vocab_size=30, n_iters=6,
                           pr_start=99, seed=59)
    tn = no_pr["topic_term"]
    n0 = float(tn[0][:15].sum() / tn[0].sum())
    n1 = float(tn[1][:15].sum() / tn[1].sum())
    assert abs(h0 - h1) > abs(n0 - n1) + 0.5  # PR does the separating
    out2 = train_attr_lda(ds, n_aspects=1, vocab_size=30, n_iters=6,
                          pr_start=2, seed=59)
    assert np.array_equal(tt, out2["topic_term"])


def test_minhash_vectorized_sigs_match_per_doc_walk():
    """The Arrow/C MinHash signature pass must be VALUE-identical to the
    straightforward per-doc walk (_word_shingles distinct-set + minwise over
    (a*h+b) mod 2^64), across long docs, short docs (<n tokens), empty and
    whitespace-only docs."""
    import numpy as np
    import pyarrow as pa

    from ir_base_ray.stages.dedup import (
        _MERSENNE,
        MinHashActor,
        _minhash_params,
        _shingle_hashes,
        _word_shingles,
    )

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "x", "NUM", "ülm", "a-b"]
    texts = []
    for _ in range(200):
        k = int(rng.integers(0, 30))
        texts.append(" ".join(rng.choice(words, k)))
    texts += ["", "   ", "one", "one two", "\tone\n two  three "]

    actor = MinHashActor(num_perm=64, shingle_n=3, seed=7)
    out = actor(pa.table({"doc_id": list(range(len(texts))), "text": texts}))
    got = np.asarray(out.column("sig").combine_chunks().flatten()
                     .to_numpy(zero_copy_only=False)).reshape(len(texts), 64)

    a, b = _minhash_params(64, 7)
    for i, t in enumerate(texts):
        sh = _word_shingles(t.split(), 3)
        if not sh:
            exp = np.full(64, np.uint64(_MERSENNE), np.uint64)
        else:
            h = _shingle_hashes(sh)
            exp = (h[:, None] * a[None, :] + b[None, :]).min(axis=0)
        assert np.array_equal(got[i].astype(np.uint64), exp), (i, t)


def test_connected_components_both_arms(ray_session):
    """connected_components: driver union-find arm == distributed
    label-propagation arm == naive union-find oracle, on a graph mixing a
    chain, a clique, a 2-node component and a random gnm graph."""
    import ray.data

    from ir_base_ray.stages.dedup import connected_components

    rng = np.random.RandomState(11)
    edges = [(1, 2), (2, 3), (3, 4),                    # chain
             (10, 11), (10, 12), (11, 12),              # clique
             (20, 21)]                                  # pair
    nodes = rng.choice(np.arange(100, 200), size=60, replace=False)
    for _ in range(40):                                 # random gnm
        a, b = rng.choice(nodes, 2, replace=False)
        edges.append((int(a), int(b)))
    df = pd.DataFrame(edges, columns=["id_a", "id_b"]).astype(np.int64)

    # naive union-find oracle
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = sorted((n, find(n)) for n in parent)

    ds = ray.data.from_pandas(df)
    drv = (connected_components(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    dist = (connected_components(ds, edge_broadcast_max=0, num_partitions=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    got_drv = list(zip(drv["doc_id"], drv["cluster_id"]))
    got_dist = list(zip(dist["doc_id"], dist["cluster_id"]))
    assert got_drv == expect
    assert got_dist == expect
