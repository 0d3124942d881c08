"""Posting-list construction: (doc_id, terms, tfs) → delta-encoded,
varbyte-compressed, block-structured posting lists with per-block max-score
metadata (the north rule's index format; the reference keeps postings as
uncompressed per-doc sparse arrays, ``structures/_SparseFeature.java``).

Skew design (SURVEY.md §7.3): the group key is ``(term_id, chunk)`` with
``chunk = doc_id // block_doc_range`` — a head term ("the", df≈N) dissolves
into #chunks independent groups, each of which is ALREADY a final posting
block, so the per-term "merge" is just reading blocks in chunk order. The
shuffle itself is keyed by ``part = hash64(term_id, chunk) % P`` so one
``map_groups`` task encodes a whole partition vectorized, and each partition
is a separately-written, separately-manifested, resumable output unit.

Block metadata: (term_id, chunk, count, min/max doc_id, max_score) where
max_score is the exact maximum BM25 weight (W4, ``Analyzer.java:253-256``)
within the block — block-max WAND pruning reads it at query time.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ir_base_ray.functions.codec import varbyte_encode_with_lengths
from ir_base_ray.functions.scoring import bm25_weights_from_idf


_FNV64_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV64_PRIME = np.uint64(0x100000001B3)


def _hash_part(term_id: np.ndarray, chunk: np.ndarray, num_parts: int) -> np.ndarray:
    """Deterministic 64-bit mix of (term_id, chunk) → partition id (FNV-style,
    stable across runs/processes — never Python hash())."""
    h = np.full(term_id.shape, _FNV64_OFFSET, dtype=np.uint64)
    for col in (term_id.astype(np.uint64), chunk.astype(np.uint64)):
        h = (h ^ col) * _FNV64_PRIME
        h = (h ^ (col >> np.uint64(32))) * _FNV64_PRIME
    return (h % np.uint64(num_parts)).astype(np.int64)


def explode_postings(analyzed_ds, dict_ref, *, block_doc_range: int, num_parts: int):
    """analyzed docs → posting rows (term_id, doc_id, tf, doc_len, part).

    ``dict_ref`` is a ``ray.put`` handle to a pandas Index/array pair mapping
    term → term_id (broadcast once, read per task from the local object store
    — J1 broadcast-hash-join, never a per-row shuffle)."""

    def to_postings(batch: pa.Table) -> pa.Table:
        term_index, _df_arr = ray.get(dict_ref)
        terms = batch.column("terms")
        tfs = batch.column("tfs")
        terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        tfs = tfs.combine_chunks() if isinstance(tfs, pa.ChunkedArray) else tfs
        lengths = np.asarray(pa.compute.list_value_length(terms))
        doc_ids = np.repeat(batch.column("doc_id").to_numpy(), lengths)
        doc_lens = np.repeat(batch.column("doc_len").to_numpy(), lengths)
        flat_terms = terms.flatten().to_numpy(zero_copy_only=False)
        flat_tfs = tfs.flatten().to_numpy()
        tids = term_index.get_indexer(flat_terms)
        keep = tids >= 0  # OOV impossible when dict was built from same corpus
        if not keep.all():
            doc_ids, doc_lens, flat_tfs, tids = (
                doc_ids[keep], doc_lens[keep], flat_tfs[keep], tids[keep]
            )
        chunk = doc_ids // block_doc_range
        part = _hash_part(tids, chunk, num_parts)
        return pa.table({
            "term_id": pa.array(tids, pa.int64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "tf": pa.array(flat_tfs, pa.int64()),
            "doc_len": pa.array(doc_lens, pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    return analyzed_ds.map_batches(to_postings, batch_format="pyarrow")


def encode_partition(group: pd.DataFrame, *, index_dir: str, block_doc_range: int,
                     N: int, avgdl: float, idf_by_tid_ref) -> pd.DataFrame:
    """One shuffle partition → one parquet file of encoded posting blocks +
    one manifest. Runs inside groupby("part").map_groups."""
    t0 = time.time()
    part = int(group["part"].iloc[0])
    idf_by_tid = ray.get(idf_by_tid_ref)

    tid = group["term_id"].to_numpy()
    did = group["doc_id"].to_numpy()
    tf = group["tf"].to_numpy()
    dl = group["doc_len"].to_numpy()
    order = np.lexsort((did, tid))
    tid, did, tf, dl = tid[order], did[order], tf[order], dl[order]
    chunk = did // block_doc_range

    # group boundaries over sorted (term_id, chunk)
    boundary = np.empty(tid.size, dtype=bool)
    boundary[0] = True
    np.logical_or(tid[1:] != tid[:-1], chunk[1:] != chunk[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    ends = np.append(starts[1:], tid.size)

    # exact per-posting BM25 weight → per-block max (float64, W4 expression,
    # IDF from the scalar-libm lookup array so max_score is bit-identical to
    # the score the query engine recomputes — a sound, tight pruning bound)
    weights = bm25_weights_from_idf(tf, dl, idf_by_tid[tid], avgdl)

    # batch codec: delta-encode doc ids against the previous posting, reset at
    # block starts, then ONE varbyte call over every posting in the partition;
    # per-value byte lengths give the block boundaries to slice at
    gaps = np.empty_like(did)
    gaps[1:] = did[1:] - did[:-1]
    gaps[starts] = did[starts]
    doc_blob, doc_lens = varbyte_encode_with_lengths(gaps.astype(np.uint64))
    tf_blob, tf_lens = varbyte_encode_with_lengths(tf.astype(np.uint64))
    doc_off = np.concatenate(([0], np.cumsum(doc_lens)))
    tf_off = np.concatenate(([0], np.cumsum(tf_lens)))
    doc_mv = memoryview(doc_blob)
    tf_mv = memoryview(tf_blob)

    rows = {
        "term_id": tid[starts],
        "chunk": chunk[starts],
        "count": ends - starts,
        "min_doc": did[starts],
        "max_doc": did[ends - 1],
        "max_score": np.maximum.reduceat(weights, starts),
        "doc_bytes": [bytes(doc_mv[doc_off[s]: doc_off[e]]) for s, e in zip(starts, ends)],
        "tf_bytes": [bytes(tf_mv[tf_off[s]: tf_off[e]]) for s, e in zip(starts, ends)],
    }

    out = pa.table({
        "term_id": pa.array(rows["term_id"], pa.int64()),
        "chunk": pa.array(rows["chunk"], pa.int64()),
        "count": pa.array(rows["count"], pa.int64()),
        "min_doc": pa.array(rows["min_doc"], pa.int64()),
        "max_doc": pa.array(rows["max_doc"], pa.int64()),
        "max_score": pa.array(rows["max_score"], pa.float64()),
        "doc_bytes": pa.array(rows["doc_bytes"], pa.binary()),
        "tf_bytes": pa.array(rows["tf_bytes"], pa.binary()),
    })
    part_dir = os.path.join(index_dir, "postings", f"part={part}")
    os.makedirs(part_dir, exist_ok=True)
    tmp = os.path.join(part_dir, "blocks.parquet.tmp")
    pq.write_table(out, tmp)
    os.replace(tmp, os.path.join(part_dir, "blocks.parquet"))

    from ir_base_ray.state.manifest import content_hash_of, write_manifest

    write_manifest(
        index_dir, part,
        rows=len(out), terms=int(np.unique(tid[starts]).size),
        postings=int(tid.size),
        content_hash=content_hash_of(rows["doc_bytes"][:64]),
        elapsed_s=time.time() - t0,
    )
    return pd.DataFrame({"part": [part], "blocks": [len(out)], "postings": [int(tid.size)]})


def build_postings(analyzed_ds, dict_ref, idf_by_tid_ref, *, index_dir: str,
                   block_doc_range: int, num_parts: int, N: int, avgdl: float,
                   resume: bool = True):
    """Full posting-build stage. Returns a small per-partition metrics
    DataFrame. With ``resume=True``, partitions whose manifest already exists
    are filtered out of the shuffle input and not rebuilt."""
    import functools

    postings = explode_postings(
        analyzed_ds, dict_ref, block_doc_range=block_doc_range, num_parts=num_parts
    )

    if resume:
        from ir_base_ray.state.manifest import finished_parts

        done = finished_parts(index_dir)
        if done:
            done_arr = np.array(sorted(done), dtype=np.int64)

            def drop_done(batch: pa.Table) -> pa.Table:
                part = batch.column("part").to_numpy()
                keep = ~np.isin(part, done_arr)
                return batch.filter(pa.array(keep))

            postings = postings.map_batches(drop_done, batch_format="pyarrow")

    encode = functools.partial(
        encode_partition, index_dir=index_dir, block_doc_range=block_doc_range,
        N=N, avgdl=avgdl, idf_by_tid_ref=idf_by_tid_ref,
    )
    metrics = postings.groupby("part").map_groups(encode, batch_format="pandas")
    return metrics.to_pandas()
