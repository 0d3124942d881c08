"""End-to-end inverted-index build — the flagship Ray Data pipeline
(SURVEY.md §7.1/§7.2, mirroring the reference's two-pass lifecycle
``mains/Execution.java:59-77``: stats pass → vectorize/index pass, with the
shared mutable dictionary replaced by groupby-aggregate).

    read_parquet(corpus)                         # S1, column-pruned
      → assign doc_id (global url sort → dense rank)        # §7.0 decision 2
      → map_batches(AnalyzerActor, concurrency=N)           # M1-M8 actor pool
      → write analyzed.parquet (token cache: pass 2 never re-tokenizes)
      → docs.parquet (doc_id, url, doc_len) + meta.json (N, avgdl)
      → dictionary: combiner + groupby(term) → term_id dense rank   # A1/A2
      → postings: explode → broadcast dict join → hash-part shuffle
        → per-partition encode (delta+varbyte, block max-score)      # §7.3
      → per-partition manifests (resume)

Index directory layout::

    index_dir/
      meta.json           N, avgdl, analyzer spec, knobs, stage timings
      docs/*.parquet      doc_id, url, doc_len, n_terms (sorted by doc_id)
      analyzed/*.parquet  doc_id, terms, tfs, doc_len (intermediate cache)
      dict/*.parquet      term, term_id, df, ttf
      postings/part=K/blocks.parquet
      manifests/part-K.json
"""

from __future__ import annotations

import json
import os
import time

import glob

import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _count_parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )

from ir_base_ray.config import IndexConfig
from ir_base_ray.stages.analyze import analyze_dataset
from ir_base_ray.stages.docids import driver_key_id_map
from ir_base_ray.stages.postings import build_postings


def _stage_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_DONE"))


def _mark_done(path: str) -> None:
    with open(os.path.join(path, "_DONE"), "w") as f:
        f.write(str(time.time()))


def _fresh_dir(path: str) -> None:
    """Wipe a stage dir that exists WITHOUT a _DONE marker (partial write from
    a killed run) so write_parquet can't append duplicate files."""
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)


def build_index(corpus_ds: "ray.data.Dataset", cfg: IndexConfig) -> dict:
    """Build the full index from a corpus Dataset with columns (url, text).
    Returns the meta dict (also written to ``meta.json``).

    Every stage output (analyzed/, docs/, dict/, each postings partition) is a
    resumable unit: finished stages are skipped on re-run, partially-written
    stage dirs (no ``_DONE`` marker) are wiped and rebuilt."""
    os.makedirs(cfg.out_dir, exist_ok=True)
    timings: dict[str, float] = {}
    # the docs/dictionary stages below execute Datasets from two driver
    # threads; guard Ray's per-call optional-import probe against the
    # concurrent-import race (see perf.harden_ray_path_resolution)
    from ir_base_ray.perf import harden_ray_path_resolution

    harden_ray_path_resolution()

    # --- pass 0+1: doc ids, analyze, cache tokens --------------------------
    analyzed_dir = os.path.join(cfg.out_dir, "analyzed")
    if not _stage_done(analyzed_dir):
        _fresh_dir(analyzed_dir)
        t0 = time.time()
        # doc_id = rank of url under the global sort. Size-based dispatch:
        # up to cfg.driver_id_map_max_rows the url column (~1% of corpus
        # bytes) is gathered + sorted on the driver and broadcast so the
        # analyzer assigns ids inline (text never enters a shuffle); above
        # the bound the ids come from a distributed sort of the url column
        # and a hash join back onto the corpus (text shuffles once — the
        # unavoidable cost once the url set exceeds driver memory).
        if cfg.corpus_paths:
            import pyarrow.parquet as _pqm

            n_rows = sum(_pqm.read_metadata(p).num_rows for p in cfg.corpus_paths)
        else:
            n_rows = corpus_ds.count()
        id_map_ref = None
        if n_rows <= cfg.driver_id_map_max_rows:
            if cfg.corpus_paths:
                from ir_base_ray.stages.docids import driver_key_id_map_from_parquet

                url_index = driver_key_id_map_from_parquet(list(cfg.corpus_paths), key="url")
            else:
                url_index = driver_key_id_map(corpus_ds, key="url")
            id_map_ref = ray.put(url_index)
        else:
            from ir_base_ray.stages.docids import assign_dense_ids

            urls_ds = (ray.data.read_parquet(list(cfg.corpus_paths), columns=["url"])
                       if cfg.corpus_paths else corpus_ds.select_columns(["url"]))
            mapping = assign_dense_ids(urls_ds, "url", "doc_id")
            corpus_ds = corpus_ds.join(mapping, "inner", cfg.num_partitions,
                                       on=("url",))
        timings["url_id_map"] = time.time() - t0
        t0 = time.time()
        analyzed = analyze_dataset(
            corpus_ds,
            cfg.analyzer,
            keep_cols=("doc_id", "url"),
            concurrency=cfg.analyzer_concurrency,
            batch_size=cfg.analyzer_batch_size,
            id_map_ref=id_map_ref,
        )
        analyzed.write_parquet(analyzed_dir)
        _mark_done(analyzed_dir)
        timings["analyze"] = time.time() - t0

    analyzed = ray.data.read_parquet(analyzed_dir)

    # --- docs table (runs CONCURRENTLY with the dictionary stage below: the
    # two read disjoint columns of analyzed/ and write disjoint outputs, so
    # serializing them just leaves CPUs idle at stage edges) ----------------
    docs_dir = os.path.join(cfg.out_dir, "docs")

    def _write_docs() -> float:
        t0 = time.time()
        if not _stage_done(docs_dir):
            _fresh_dir(docs_dir)
            (ray.data.read_parquet(
                analyzed_dir, columns=["doc_id", "url", "doc_len", "n_terms"])
             .write_parquet(docs_dir))
            _mark_done(docs_dir)
        return time.time() - t0

    from concurrent.futures import ThreadPoolExecutor

    _docs_pool = ThreadPoolExecutor(max_workers=1)
    _docs_fut = _docs_pool.submit(_write_docs)

    # --- pass 2a: dictionary (combiner + distributed groupby) --------------
    # Size dispatch mirrors the doc-id map (build_index.py url_id_map above):
    # vocabularies up to cfg.driver_dict_max_terms finalize on the driver
    # (sort + arange — one vocab-sized frame) and broadcast into the postings
    # explode; above the bound the dictionary is rank-assigned distributed
    # (stages/stats.build_dictionary) and the postings explode joins on term
    # instead of broadcasting — no vocabulary-sized object in any one process.
    t0 = time.time()
    dict_dir = os.path.join(cfg.out_dir, "dict")
    import pyarrow.parquet as _pq

    from ir_base_ray.stages.stats import dictionary_aggregate, finalize_aggregate

    vocab_n: int
    dict_pdf = None
    if not _stage_done(dict_dir):
        _fresh_dir(dict_dir)
        os.makedirs(dict_dir, exist_ok=True)
        # column-pruned re-read with few, large blocks: partial-combiner output
        # is vocab × #blocks rows, so block count — not row count — is what the
        # groupby shuffle pays for. The groupby-sum runs distributed; only the
        # (post-aggregate) dictionary ever leaves it, and only on the driver
        # branch.
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        dict_src = ray.data.read_parquet(analyzed_dir, columns=["terms", "tfs"],
                                         override_num_blocks=max(32, ncpu * 2))
        agg = dictionary_aggregate(dict_src).materialize()
        vocab_n = agg.count()
        if vocab_n <= cfg.driver_dict_max_terms:
            dict_pdf = finalize_aggregate(agg)
            _pq.write_table(pa.Table.from_pandas(dict_pdf, preserve_index=False),
                            os.path.join(dict_dir, "dictionary.parquet"))
        else:
            from ir_base_ray.stages.docids import assign_dense_ids

            assign_dense_ids(agg, key="term", id_col="term_id").write_parquet(dict_dir)
        _mark_done(dict_dir)
    else:
        vocab_n = _count_parquet_rows(dict_dir)
        if vocab_n <= cfg.driver_dict_max_terms:
            dict_pdf = (
                ray.data.read_parquet(dict_dir).to_pandas()
                .sort_values("term_id").reset_index(drop=True)
            )
    dict_mode = "driver" if dict_pdf is not None else "distributed"
    timings["dictionary"] = time.time() - t0
    timings["docs"] = _docs_fut.result()
    _docs_pool.shutdown()

    # scalars: N from docs parquet metadata, total token count = Σ TTF
    # (doc_len = Σ tf over a doc's terms, so Σ doc_len == Σ ttf exactly)
    t0 = time.time()
    n_docs = _count_parquet_rows(docs_dir)
    if dict_pdf is not None:
        vocab_n = len(dict_pdf)
        total_len = int(dict_pdf["ttf"].sum())
    else:
        total_len = int(ray.data.read_parquet(dict_dir, columns=["ttf"])
                        .sum("ttf") or 0)
    scalars = {"N": n_docs, "avgdl": total_len / n_docs if n_docs else 0.0,
               "total_len": float(total_len)}
    timings["scalars"] = time.time() - t0

    # broadcast the dictionary once (J1): term→term_id index + df-by-tid
    # array (driver mode only — distributed mode joins on term instead)
    t0 = time.time()
    dict_ref = idf_ref = dict_ds = None
    if dict_pdf is not None:
        term_index = pd.Index(dict_pdf["term"])
        df_by_tid = dict_pdf["df"].to_numpy()
        dict_ref = ray.put((term_index, df_by_tid))
        from ir_base_ray.functions.scoring import bm25_idf_by_tid

        idf_ref = ray.put(bm25_idf_by_tid(scalars["N"], df_by_tid))
    else:
        dict_ds = ray.data.read_parquet(dict_dir)
    timings["broadcast_dict"] = time.time() - t0

    # --- pass 2b: postings (broadcast-join explode → disk exchange → encode)
    t0 = time.time()
    part_metrics = build_postings(
        analyzed.select_columns(["doc_id", "terms", "tfs", "doc_len"]),
        dict_ref,
        idf_ref,
        index_dir=cfg.out_dir,
        block_doc_range=cfg.block_doc_range,
        num_parts=cfg.num_partitions,
        N=scalars["N"],
        avgdl=scalars["avgdl"],
        timings=timings,
        dict_ds=dict_ds,
        vocab_n=int(vocab_n),
    )
    timings["postings"] = time.time() - t0

    meta = {
        "N": scalars["N"],
        "avgdl": scalars["avgdl"],
        "total_len": scalars["total_len"],
        "vocab_size": int(vocab_n),
        "dict_mode": dict_mode,
        "block_doc_range": cfg.block_doc_range,
        "num_partitions": cfg.num_partitions,
        "analyzer": {
            "ngram": cfg.analyzer.ngram,
            "length_threshold": cfg.analyzer.length_threshold,
            "mode": cfg.analyzer.mode,
            "lang": cfg.analyzer.lang,
        },
        "bm25": {"k1": cfg.bm25.k1, "b": cfg.bm25.b},
        "partitions_built": int(len(part_metrics)),
        "timings_s": {k: round(v, 3) for k, v in timings.items()},
    }
    with open(os.path.join(cfg.out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta
