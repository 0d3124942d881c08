

def test_lm_ppl_filter_discriminates(ray_session, tmp_path):
    """Bigram-LM quality filter: docs drawn from the training bigram chain
    score lower perplexity than token-shuffled (chain-breaking) docs."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ir_base_ray.pipelines.ops import lm_ppl_filter

    rng = np.random.default_rng(5)
    chain = ["alpha", "beta", "gamma", "delta", "epsilon"]
    rows = []
    for d in range(40):
        if d % 4 == 3:                       # scrambled docs (odd ids too)
            toks = [chain[rng.integers(0, 5)] for _ in range(30)]
        else:                                # chain-following docs
            start = int(rng.integers(0, 5))
            toks = [chain[(start + i) % 5] for i in range(30)]
        rows.append({"doc_id": d, "text": " ".join(toks),
                     "lang": "en", "source": "t", "n_chars": 1})
    pq.write_table(__import__("pyarrow").Table.from_pandas(
        pd.DataFrame(rows)), str(tmp_path / "documents.parquet"))
    out = lm_ppl_filter(str(tmp_path))
    chain_ppl = out.loc[out["doc_id"] % 4 != 3, "ppl"].mean()
    scram_ppl = out.loc[out["doc_id"] % 4 == 3, "ppl"].mean()
    assert chain_ppl < scram_ppl, (chain_ppl, scram_ppl)
    assert (out["n_bigrams"] == 29).all()
    out2 = lm_ppl_filter(str(tmp_path))
    assert out["ppl"].tolist() == out2["ppl"].tolist()


def test_substring_dedup(ray_session):
    """Exact-substring dedup: a planted 10-token span shared by two docs
    is flagged in both; a unique doc reports zero duplicated windows."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ir_base_ray.stages.dedup import substring_dup_stats

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = pd.DataFrame([
        {"doc_id": 0, "text": "one two three " + span + " four five"},
        {"doc_id": 1, "text": "six seven " + span + " eight nine ten"},
        {"doc_id": 2, "text": "eleven twelve thirteen fourteen fifteen "
                              "sixteen seventeen eighteen nineteen twenty"},
    ])
    out = (substring_dup_stats(rd.from_pandas(docs), window=8)
           .to_pandas().set_index("doc_id").sort_index())
    # the shared 10-token span yields 3 duplicated 8-gram windows per doc
    assert out.loc[0, "dup_windows"] == 3, out
    assert out.loc[1, "dup_windows"] == 3, out
    assert out.loc[2, "dup_windows"] == 0, out
    assert (out["n_windows"] > 0).all()
    # scale arm: dup_broadcast_max=0 forces the shingle-keyed semi-join
    # (left_outer join + doc_id groupby — no broadcast set, nothing
    # corpus-sized on the driver); rows must match the broadcast arm exactly
    docs_edge = pd.concat([docs, pd.DataFrame(
        [{"doc_id": 3, "text": "tiny"}, {"doc_id": 4, "text": ""}])],
        ignore_index=True)
    broad = (substring_dup_stats(rd.from_pandas(docs_edge), window=8)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    joined = (substring_dup_stats(rd.from_pandas(docs_edge), window=8,
                                  dup_broadcast_max=0, num_partitions=4)
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert broad[["doc_id", "n_windows", "dup_windows"]].astype("int64").equals(
        joined[["doc_id", "n_windows", "dup_windows"]].astype("int64"))
