"""Segment merge: combine independently-built index segments into one global
index with docID remapping (the north rule's segment-merge stage; the
reference has no segment concept — its single-JVM corpus is the 'segment' —
so this stage is specified by the rebuild's own layout, SURVEY.md §7).

Design:
- doc ids: segment i's ids shift by a PRE-AGGREGATED offset that is a
  multiple of ``block_doc_range``, so every posting block's chunk id maps by
  pure addition (``chunk' = chunk + offset//range``) and intra-block delta
  encoding stays valid;
- term ids: union dictionary (groupby-sum of per-segment dicts, term_id =
  sorted rank) broadcast once; per-block remap is a vectorized ``get_indexer``
  over the segment's old dictionary — a J1 broadcast join, no shuffle;
- postings: one Ray task per (segment, partition) decodes its blocks to raw
  rows and hive-scatters them by ``hash(term_id', chunk')`` (same disk
  exchange as the build), then the build's own ``encode_task`` re-encodes
  each output partition with the MERGED scalars (N', avgdl', df') — BM25
  max-scores must be recomputed because every global statistic changed;
- resume: the encode stage reuses the per-partition manifest protocol, so a
  killed merge re-encodes only missing partitions.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ir_base_ray.stages.postings import _hash_part


def _load_meta(d: str) -> dict:
    with open(os.path.join(d, "meta.json")) as f:
        return json.load(f)


def _read_dir(d: str) -> pa.Table:
    return pa.concat_tables([pq.read_table(f) for f in sorted(
        glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))])


@ray.remote
def _scatter_segment_part(part_file: str, old_terms, new_index_ref, doc_offset: int,
                          block_doc_range: int, num_parts: int,
                          doc_len_ref, raw_dir: str, uid: str) -> int:
    """Decode one source partition, remap (term_id, doc_id), hive-scatter."""
    tbl = pq.read_table(part_file)
    old_tid = tbl.column("term_id").to_numpy()
    counts = tbl.column("count").to_numpy()
    new_index = new_index_ref
    tid_map = new_index.get_indexer(old_terms)  # old tid -> new tid
    doc_len = doc_len_ref

    # batch decode: all blocks in one pass (C kernel via
    # decode_postings_concat — varbyte + per-block delta reset fused);
    # equivalent to the old per-block varbyte_decode + cumsum loop
    from ir_base_ray.functions.codec import decode_postings_concat

    doc_bufs = tbl.column("doc_bytes").to_pylist()
    tf_bufs = tbl.column("tf_bytes").to_pylist()
    if tbl.num_rows:
        did, tf, dec_counts = decode_postings_concat(doc_bufs, tf_bufs)
        if not np.array_equal(dec_counts, counts.astype(np.int64)):
            # explicit raise (not assert): this guards against corrupt
            # posting decodes and must survive `python -O`
            raise ValueError(
                f"posting decode count mismatch in {part_file}: "
                f"decoded {dec_counts.sum()} vs recorded {counts.sum()}")
        tid = np.repeat(tid_map[old_tid], counts.astype(np.int64))
        did = did + doc_offset
    else:
        tid = did = tf = np.empty(0, np.int64)
    dl = doc_len[did]
    chunk = did // block_doc_range
    part = _hash_part(tid, chunk, num_parts)

    order = np.argsort(part, kind="stable")
    rows = pa.table({
        "term_id": pa.array(tid[order], pa.int64()),
        "doc_id": pa.array(did[order], pa.int64()),
        "tf": pa.array(tf[order].astype(np.int32), pa.int32()),
        "doc_len": pa.array(dl[order].astype(np.int32), pa.int32()),
    })
    sp = part[order]
    bounds = np.flatnonzero(np.diff(sp)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(sp)]))
    for s, e in zip(starts, ends):
        pdir = os.path.join(raw_dir, f"part={int(sp[s])}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(rows.slice(s, e - s), os.path.join(pdir, f"{uid}.parquet"))
    return int(tid.size)


def merge_segments(segment_dirs: list[str], out_dir: str, *, num_parts: int = 32):
    """Merge index segments (each a ``build_index`` output) into a global
    index at ``out_dir``. Returns the merged meta dict."""
    metas = [_load_meta(d) for d in segment_dirs]
    rng0 = metas[0]["block_doc_range"]
    if not all(m["block_doc_range"] == rng0 for m in metas):
        raise ValueError("segments must share block_doc_range")
    if not all(m["analyzer"] == metas[0]["analyzer"] for m in metas):
        raise ValueError("segments must share the analyzer spec")

    raw_done = os.path.join(out_dir, "postings_raw", "_DONE")
    resuming = os.path.exists(raw_done)
    if not resuming:
        # a merge whose scatter didn't finish can't be trusted partition-wise;
        # start clean. A finished scatter (+ docs/dict) resumes at the encode
        # stage: only partitions without a manifest are re-encoded.
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir)

    # ---- doc offsets (range-aligned) + merged docs table ------------------
    offsets = []
    acc = 0
    docs_tbls = []
    for d in segment_dirs:
        docs = _read_dir(os.path.join(d, "docs"))
        offsets.append(acc)
        ids = pa.compute.add(docs.column("doc_id"), acc)
        docs_tbls.append(docs.set_column(docs.schema.get_field_index("doc_id"),
                                         "doc_id", ids))
        max_id = int(docs.column("doc_id").to_numpy().max()) + 1 if docs.num_rows else 0
        acc += int(np.ceil(max_id / rng0)) * rng0
    merged_docs = pa.concat_tables(docs_tbls)
    if not resuming:
        os.makedirs(os.path.join(out_dir, "docs"))
        pq.write_table(merged_docs, os.path.join(out_dir, "docs", "docs.parquet"))

    # ---- union dictionary -------------------------------------------------
    dicts = [_read_dir(os.path.join(d, "dict")).to_pandas() for d in segment_dirs]
    union = (pd.concat(dicts, ignore_index=True)
             .groupby("term", as_index=False)[["df", "ttf"]].sum()
             .sort_values("term").reset_index(drop=True))
    union["term_id"] = np.arange(len(union), dtype=np.int64)
    if not resuming:
        os.makedirs(os.path.join(out_dir, "dict"))
        pq.write_table(pa.Table.from_pandas(union, preserve_index=False),
                       os.path.join(out_dir, "dict", "dictionary.parquet"))

    n_docs = merged_docs.num_rows
    total_len = float(union["ttf"].sum())
    avgdl = total_len / n_docs if n_docs else 0.0

    # broadcasts: new term index, merged doc_len lookup (doc_id-addressed)
    new_index_ref = ray.put(pd.Index(union["term"]))
    doc_len = np.zeros(acc if acc else 1, dtype=np.int64)
    doc_len[merged_docs.column("doc_id").to_numpy()] = \
        merged_docs.column("doc_len").to_numpy()
    doc_len_ref = ray.put(doc_len)

    # ---- scatter: one task per (segment, source partition) ----------------
    raw_dir = os.path.join(out_dir, "postings_raw")
    n_postings = -1
    if not resuming:
        os.makedirs(raw_dir)
        tasks = []
        for si, d in enumerate(segment_dirs):
            seg_dict = _read_dir(os.path.join(d, "dict")).to_pandas() \
                .sort_values("term_id")
            old_terms_ref = ray.put(seg_dict["term"].to_numpy())
            for pf in sorted(glob.glob(os.path.join(d, "postings", "part=*",
                                                    "blocks.parquet"))):
                uid = f"s{si}_{os.path.basename(os.path.dirname(pf))}"
                tasks.append(_scatter_segment_part.remote(
                    pf, old_terms_ref, new_index_ref, offsets[si],
                    rng0, num_parts, doc_len_ref, raw_dir, uid))
        n_postings = sum(ray.get(tasks))
        with open(os.path.join(raw_dir, "_DONE"), "w") as f:
            f.write("merge")

    # ---- encode with merged scalars (reuses the build's encode stage) -----
    from ir_base_ray.functions.scoring import bm25_idf_by_tid
    from ir_base_ray.stages.postings import build_postings  # noqa: F401 (layout)
    from ir_base_ray.state.manifest import finished_parts
    from ir_base_ray.stages.postings import _encode_arrays

    dict_ref = ray.put((pd.Index(union["term"]), union["df"].to_numpy()))
    idf_ref = ray.put(bm25_idf_by_tid(n_docs, union["df"].to_numpy()))

    @ray.remote
    def encode_task(part: int) -> dict:
        import time as _t

        t0 = _t.time()
        files = sorted(glob.glob(os.path.join(raw_dir, f"part={part}", "*.parquet")))
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        idf_by_tid = ray.get(idf_ref)
        return _encode_arrays(
            part, tbl.column("term_id").to_numpy(), tbl.column("doc_id").to_numpy(),
            tbl.column("tf").to_numpy().astype(np.int64),
            tbl.column("doc_len").to_numpy().astype(np.int64),
            index_dir=out_dir, block_doc_range=rng0, avgdl=avgdl,
            idf_by_tid=idf_by_tid, t0=t0)

    all_parts = sorted(int(os.path.basename(p).split("=")[1])
                       for p in glob.glob(os.path.join(raw_dir, "part=*")))
    todo = [p for p in all_parts if p not in finished_parts(out_dir)]
    ray.get([encode_task.remote(p) for p in todo])

    meta = {
        "N": n_docs, "avgdl": avgdl, "total_len": total_len,
        "vocab_size": int(len(union)), "block_doc_range": rng0,
        "num_partitions": num_parts, "analyzer": metas[0]["analyzer"],
        "bm25": metas[0]["bm25"],
        "merged_from": [os.path.abspath(d) for d in segment_dirs],
        "doc_offsets": offsets, "postings": int(n_postings),
        "partitions_built": len(all_parts),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta
