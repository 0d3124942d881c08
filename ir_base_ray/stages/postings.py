"""Posting-list construction: (doc_id, terms, tfs) → delta-encoded,
varbyte-compressed, block-structured posting lists with per-block max-score
metadata (the north rule's index format; the reference keeps postings as
uncompressed per-doc sparse arrays, ``structures/_SparseFeature.java``).

Skew design (SURVEY.md §7.3): the group key is ``(term_id, chunk)`` with
``chunk = doc_id // block_doc_range`` — a head term ("the", df≈N) dissolves
into #chunks independent groups, each of which is ALREADY a final posting
block, so the per-term "merge" is just reading blocks in chunk order.

Shuffle strategy: a DISK-BASED partitioned exchange instead of Ray's
sort-based groupby — the explode stage hive-writes posting rows to
``postings_raw/part=K/`` (``part = hash64(term_id, chunk) % P``), then one
independent encode task per partition reads its directory, sorts, encodes and
writes ``postings/part=K/blocks.parquet`` + a lineage manifest. Measured 4×
faster than the in-memory sort shuffle at 32 CPUs on this corpus, scales with
#partitions, and doubles as the resume checkpoint (a killed run re-encodes
only partitions without manifests, reading the already-materialized raw
partition — no recompute of the analyze pass).
"""

from __future__ import annotations

import glob
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ir_base_ray.functions.codec import varbyte_encode_with_lengths
from ir_base_ray.functions.scoring import BM25_B, BM25_K1, bm25_weights_from_idf


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


def explode_postings(analyzed_ds, dict_ref, *, block_doc_range: int, num_parts: int,
                     compact_ids: bool = False):
    """analyzed docs → posting rows (term_id, doc_id, tf, doc_len, part).

    ``dict_ref`` is a ``ray.put`` handle to a pandas Index/array pair mapping
    term → term_id (broadcast once, read per task from the local object store
    — J1 broadcast-hash-join, never a per-row shuffle).

    ``compact_ids``: emit int32 term_id/doc_id (caller guarantees N and vocab
    fit) — the exchange is the single largest disk/IO volume of the build, so
    halving its id bytes speeds both the scatter write and the encode read."""
    id_type = pa.int32() if compact_ids else pa.int64()

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
        np_id = np.int32 if compact_ids else np.int64
        return pa.table({
            "term_id": pa.array(tids.astype(np_id), id_type),
            "doc_id": pa.array(doc_ids.astype(np_id), id_type),
            "tf": pa.array(flat_tfs.astype(np.int32), pa.int32()),
            "doc_len": pa.array(doc_lens.astype(np.int32), pa.int32()),
            "part": pa.array(part.astype(np.int32), pa.int32()),
        })

    return analyzed_ds.map_batches(to_postings, batch_format="pyarrow")


def explode_postings_distributed(analyzed_ds, dict_ds, *, block_doc_range: int,
                                 num_parts: int,
                                 num_join_partitions: int | None = None):
    """Distributed-dictionary variant of :func:`explode_postings`: when the
    vocabulary exceeds the driver broadcast bound
    (``IndexConfig.driver_dict_max_terms``), term_id/df are attached by a
    hash-partitioned ``Dataset.join`` keyed on term (both sides shuffle by
    term hash — no vocabulary-sized object ever exists in one process). The
    per-posting ``df`` column rides along to the encode stage, which derives
    the BM25 idf from it (scalar-libm per distinct df — bit-identical to the
    broadcast path's lookup array)."""

    def flatten_rows(batch: pa.Table) -> pa.Table:
        terms = batch.column("terms")
        tfs = batch.column("tfs")
        terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        tfs = tfs.combine_chunks() if isinstance(tfs, pa.ChunkedArray) else tfs
        lengths = np.asarray(pa.compute.list_value_length(terms))
        return pa.table({
            "term": terms.flatten(),
            "doc_id": pa.array(np.repeat(batch.column("doc_id").to_numpy(), lengths),
                               pa.int64()),
            "tf": pa.compute.cast(tfs.flatten(), pa.int32()),
            "doc_len": pa.array(
                np.repeat(batch.column("doc_len").to_numpy(), lengths).astype(np.int32),
                pa.int32()),
        })

    rows = analyzed_ds.map_batches(flatten_rows, batch_format="pyarrow")
    if num_join_partitions is None:
        # scale with the cluster, but never demand more aggregator slots
        # than a small session can grant (the join deadlocks if its actor
        # pool can't schedule)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        num_join_partitions = max(2, min(64, ncpu))
    joined = rows.join(dict_ds.select_columns(["term", "term_id", "df"]),
                       "inner", num_join_partitions, on=("term",))

    def finish(batch: pa.Table) -> pa.Table:
        tids = batch.column("term_id").to_numpy(zero_copy_only=False)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        chunk = doc_ids // block_doc_range
        return pa.table({
            "term_id": pa.array(tids.astype(np.int64), pa.int64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "tf": batch.column("tf"),
            "doc_len": batch.column("doc_len"),
            "df": pa.compute.cast(batch.column("df"), pa.int64()),
            "part": pa.array(_hash_part(tids.astype(np.int64), chunk, num_parts),
                             pa.int64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


# per-process grow-only scratch for the C encode kernel: a worker's first
# partition faults the buffers in, the rest of its group reuses them
# (BASELINE.md §8 pattern — encode was the allocation-bound stage)
_ENC_SCR: dict = {}


def _enc_scratch(name: str, n: int, dtype) -> np.ndarray:
    buf = _ENC_SCR.get(name)
    if buf is None or len(buf) < n:
        buf = np.empty(max(n, 1024, 0 if buf is None else 2 * len(buf)), dtype)
        _ENC_SCR[name] = buf
    return buf


def _idf_per_posting(tid, df, idf_by_tid, N, out: np.ndarray) -> np.ndarray:
    """Per-posting IDF, aligned with the (unsorted) input rows, written into
    ``out``: broadcast-LUT gather on the driver-dictionary path, scalar-libm
    per DISTINCT df on the distributed path (bit-identical both ways)."""
    if df is not None:
        from ir_base_ray.functions.scoring import bm25_idf_exact

        uniq_df, inv = np.unique(df, return_inverse=True)
        idf_lut = np.array([bm25_idf_exact(N, float(d)) for d in uniq_df],
                           dtype=np.float64)
        np.take(idf_lut, inv, out=out)
    else:
        np.take(idf_by_tid, tid, out=out)
    return out


def _encode_arrays_c(lib, part: int, tid, did, tf, dl, *, index_dir: str,
                     block_doc_range: int, avgdl: float, idf_by_tid=None,
                     df=None, N=None, t0: float) -> dict:
    """C-kernel twin of the numpy ``_encode_arrays`` body (pinned
    byte-identical by pytest): radix sort + block split + BM25 block max +
    delta/varbyte emission in one call over per-process scratch. The output
    table never escapes this function (written to parquet, then dropped), so
    the binary columns can view the scratch blobs zero-copy."""
    import ctypes

    n = int(tid.size)
    i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    s_tid = _enc_scratch("tid", n, np.int64)
    s_did = _enc_scratch("did", n, np.int64)
    s_tf = _enc_scratch("tf", n, np.int64)
    s_dl = _enc_scratch("dl", n, np.int64)
    np.copyto(s_tid[:n], tid)
    np.copyto(s_did[:n], did)
    np.copyto(s_tf[:n], tf)
    np.copyto(s_dl[:n], dl)
    idf = _idf_per_posting(s_tid[:n], df, idf_by_tid, N,
                           _enc_scratch("idf", n, np.float64)[:n])
    key = _enc_scratch("key", n, np.uint64)
    key_tmp = _enc_scratch("key_tmp", n, np.uint64)
    ord_ = _enc_scratch("ord", n, np.int64)
    ord_tmp = _enc_scratch("ord_tmp", n, np.int64)
    cnt = _enc_scratch("cnt", 65536, np.int64)
    o_term = _enc_scratch("o_term", n, np.int64)
    o_chunk = _enc_scratch("o_chunk", n, np.int64)
    o_count = _enc_scratch("o_count", n, np.int64)
    o_mindoc = _enc_scratch("o_mindoc", n, np.int64)
    o_maxdoc = _enc_scratch("o_maxdoc", n, np.int64)
    o_maxscore = _enc_scratch("o_maxscore", n, np.float64)
    doc_bounds = _enc_scratch("doc_bounds", n + 1, np.int64)
    tf_bounds = _enc_scratch("tf_bounds", n + 1, np.int64)
    doc_blob = _enc_scratch("doc_blob", 10 * n, np.uint8)
    tf_blob = _enc_scratch("tf_blob", 10 * n, np.uint8)
    scalars = np.zeros(3, np.int64)
    nb = int(lib.encode_partition(
        i64p(s_tid), i64p(s_did), i64p(s_tf), i64p(s_dl),
        idf.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        int(block_doc_range), float(avgdl), float(BM25_K1), float(BM25_B),
        key.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        key_tmp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        i64p(ord_), i64p(ord_tmp), i64p(cnt),
        i64p(o_term), i64p(o_chunk), i64p(o_count),
        i64p(o_mindoc), i64p(o_maxdoc),
        o_maxscore.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        i64p(doc_bounds), i64p(tf_bounds),
        doc_blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        tf_blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        i64p(scalars)))

    def _binary_col(blob: np.ndarray, size: int, bounds: np.ndarray) -> pa.Array:
        if size <= np.iinfo(np.int32).max:
            return pa.Array.from_buffers(
                pa.binary(), nb,
                [None, pa.py_buffer(bounds[:nb + 1].astype(np.int32)),
                 pa.py_buffer(blob[:size])])
        return pa.Array.from_buffers(
            pa.large_binary(), nb,
            [None, pa.py_buffer(bounds[:nb + 1].copy()), pa.py_buffer(blob[:size])])

    out = pa.table({
        "term_id": pa.array(o_term[:nb], pa.int64()),
        "chunk": pa.array(o_chunk[:nb], pa.int64()),
        "count": pa.array(o_count[:nb], pa.int64()),
        "min_doc": pa.array(o_mindoc[:nb], pa.int64()),
        "max_doc": pa.array(o_maxdoc[:nb], pa.int64()),
        "max_score": pa.array(o_maxscore[:nb], pa.float64()),
        "doc_bytes": _binary_col(doc_blob, int(scalars[0]), doc_bounds),
        "tf_bytes": _binary_col(tf_blob, int(scalars[1]), tf_bounds),
    })
    part_dir = os.path.join(index_dir, "postings", f"part={part}")
    os.makedirs(part_dir, exist_ok=True)
    tmp = os.path.join(part_dir, "blocks.parquet.tmp")
    pq.write_table(out, tmp)
    os.replace(tmp, os.path.join(part_dir, "blocks.parquet"))

    from ir_base_ray.state.manifest import content_hash_of, write_manifest

    write_manifest(
        index_dir, part,
        rows=nb, terms=int(scalars[2]), postings=n,
        content_hash=content_hash_of(out.column("doc_bytes").slice(0, 64).to_pylist()),
        elapsed_s=time.time() - t0,
    )
    return {"part": part, "blocks": nb, "postings": n}


def _encode_arrays(part: int, tid, did, tf, dl, *, index_dir: str,
                   block_doc_range: int, avgdl: float, idf_by_tid=None,
                   df=None, N=None, t0: float) -> dict:
    """Sort + block-split + batch varbyte encode one partition's posting rows;
    write blocks.parquet + manifest. Returns metrics. The BM25 idf comes from
    the broadcast ``idf_by_tid`` lookup (driver-dictionary path) or is derived
    from the aligned per-posting ``df`` column (distributed-dictionary path) —
    scalar libm per distinct df, so both paths produce bit-identical
    max_score. Dispatches to the C kernel (``_encode_arrays_c``) when ids fit
    the fused 64-bit sort key; this numpy body is the fallback/parity twin."""
    from ir_base_ray.functions.ckernels import encode_kernel

    _lib = encode_kernel()
    if (_lib is not None and tid.size
            and not os.environ.get("IR_ENCODE_NUMPY")
            and int(tid.max()) < (1 << 31) and int(did.max()) < (1 << 32)
            and int(did.min()) >= 0):
        return _encode_arrays_c(
            _lib, part, tid, did, tf, dl, index_dir=index_dir,
            block_doc_range=block_doc_range, avgdl=avgdl,
            idf_by_tid=idf_by_tid, df=df, N=N, t0=t0)
    if (tid.size and int(tid.max()) < (1 << 31) and int(did.max()) < (1 << 32)
            and int(did.min()) >= 0):
        # single-key stable sort: one pass instead of lexsort's two (tid is
        # ascending-bounded by the dictionary size; guard keeps the fused
        # uint64 key exact). Falls back to lexsort at >2^32 doc ids.
        key = (tid.astype(np.uint64) << np.uint64(32)) | did.astype(np.uint64)
        order = np.argsort(key, kind="stable")
    else:
        order = np.lexsort((did, tid))
    tid, did, tf, dl = tid[order], did[order], tf[order], dl[order]
    if df is not None:
        df = df[order]
    chunk = did // block_doc_range

    boundary = np.empty(tid.size, dtype=bool)
    boundary[0] = True
    np.logical_or(tid[1:] != tid[:-1], chunk[1:] != chunk[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    ends = np.append(starts[1:], tid.size)

    # exact per-posting BM25 weight → per-block max (float64, W4 expression,
    # IDF from the scalar-libm lookup array so max_score is bit-identical to
    # the score the query engine recomputes — a sound, tight pruning bound)
    if df is not None:
        from ir_base_ray.functions.scoring import bm25_idf_exact

        uniq_df, inv = np.unique(df, return_inverse=True)
        idf_lut = np.array([bm25_idf_exact(N, float(d)) for d in uniq_df],
                           dtype=np.float64)
        idf = idf_lut[inv]
    else:
        idf = idf_by_tid[tid]
    weights = bm25_weights_from_idf(tf, dl, idf, avgdl)

    # batch codec: delta against the previous posting, reset at block starts,
    # ONE varbyte call per column; per-value byte lengths → block boundaries
    gaps = np.empty(did.shape, dtype=np.int64)
    gaps[1:] = did[1:].astype(np.int64) - did[:-1].astype(np.int64)
    gaps[starts] = did[starts]
    doc_blob, doc_lens_b = varbyte_encode_with_lengths(gaps.astype(np.uint64))
    tf_blob, tf_lens_b = varbyte_encode_with_lengths(tf.astype(np.uint64))
    doc_off = np.concatenate(([0], np.cumsum(doc_lens_b)))
    tf_off = np.concatenate(([0], np.cumsum(tf_lens_b)))

    # blocks tile each blob contiguously in sorted order (ends[i]==starts[i+1]),
    # so the binary columns are built ZERO-COPY from (blob, offsets-at-starts)
    # instead of materializing one Python bytes object per block.
    def _binary_col(blob: bytes, off: np.ndarray) -> pa.Array:
        n = starts.size
        bounds = np.empty(n + 1, dtype=np.int64)
        bounds[:n] = off[starts]
        bounds[n] = off[-1]
        if bounds[n] <= np.iinfo(np.int32).max:
            return pa.Array.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(bounds.astype(np.int32)), pa.py_buffer(blob)])
        return pa.Array.from_buffers(
            pa.large_binary(), n, [None, pa.py_buffer(bounds), pa.py_buffer(blob)])

    out = pa.table({
        "term_id": pa.array(tid[starts].astype(np.int64), pa.int64()),
        "chunk": pa.array(chunk[starts].astype(np.int64), pa.int64()),
        "count": pa.array(ends - starts, pa.int64()),
        "min_doc": pa.array(did[starts].astype(np.int64), pa.int64()),
        "max_doc": pa.array(did[ends - 1].astype(np.int64), pa.int64()),
        "max_score": pa.array(np.maximum.reduceat(weights, starts), pa.float64()),
        "doc_bytes": _binary_col(doc_blob, doc_off),
        "tf_bytes": _binary_col(tf_blob, tf_off),
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
        content_hash=content_hash_of(out.column("doc_bytes").slice(0, 64).to_pylist()),
        elapsed_s=time.time() - t0,
    )
    return {"part": part, "blocks": len(out), "postings": int(tid.size)}


def build_postings(analyzed_ds, dict_ref, idf_by_tid_ref, *, index_dir: str,
                   block_doc_range: int, num_parts: int, N: int, avgdl: float,
                   resume: bool = True, timings: dict | None = None,
                   dict_ds=None, vocab_n: int | None = None):
    """Full posting-build stage (disk-exchange shuffle; see module docstring).
    Returns a small per-partition metrics DataFrame. With ``resume=True``,
    partitions whose manifest already exists are skipped entirely. Pass a
    ``timings`` dict to get the scatter/encode wall-time split.

    ``dict_ds`` (instead of ``dict_ref``/``idf_by_tid_ref``) selects the
    distributed-dictionary path: term_id/df attach by a term-keyed
    ``Dataset.join`` and idf is derived per partition from the df column —
    byte-identical index output (pinned by tests/test_index_e2e.py)."""
    if timings is None:
        timings = {}
    t_scatter0 = time.time()
    raw_dir = os.path.join(index_dir, "postings_raw")
    done_marker = os.path.join(raw_dir, "_DONE")

    # stage 1: scatter — hive-partitioned write of raw posting rows
    if not os.path.exists(done_marker):
        import shutil

        if os.path.isdir(raw_dir):
            shutil.rmtree(raw_dir)
        if dict_ds is not None:
            postings = explode_postings_distributed(
                analyzed_ds, dict_ds, block_doc_range=block_doc_range,
                num_parts=num_parts)
        else:
            compact = (N < 2 ** 31 and vocab_n is not None and vocab_n < 2 ** 31)
            postings = explode_postings(
                analyzed_ds, dict_ref, block_doc_range=block_doc_range,
                num_parts=num_parts, compact_ids=compact)
        postings.write_parquet(raw_dir, partition_cols=["part"])
        with open(done_marker, "w") as f:
            f.write(str(time.time()))

    timings["postings_scatter"] = time.time() - t_scatter0
    t_encode0 = time.time()

    # stage 2: gather — one independent encode task per partition
    from ir_base_ray.state.manifest import finished_parts

    all_parts = sorted(
        int(os.path.basename(d).split("=", 1)[1])
        for d in glob.glob(os.path.join(raw_dir, "part=*"))
    )
    todo = [p for p in all_parts if not (resume and p in finished_parts(index_dir))]

    # Grouped scheduling: W workers each encode ~P/W partitions SERIALLY in
    # one task. A worker's first partition faults its heap pages in; the rest
    # reuse the warmed arenas — on fault-bound hosts (BASELINE.md §4) this
    # measured ~2× faster than one task per partition (16.5 s vs 29 s fresh,
    # 4.8 s steady-state for 32 partitions at 32 CPUs), and it caps peak
    # concurrent allocation pressure. Per-partition manifests still make each
    # partition an independent resume unit.
    # Worker count: measured ladder on this host (32 partitions, 1M docs) —
    # 4w=7.4s / 8w=6.3s / 12w=9.0s at 16 cpus; 8w=9.1s / 16w=12.1s / 32w=32.1s
    # at 32 cpus — encode is allocation-bound, so concurrency helps only up to
    # ~8 heavy writers per host before allocator/fault collision reverses it.
    # The num_cpus reservation per task is what generalizes to a real cluster:
    # each node co-hosts at most ncpu/group_cpus encoders regardless of cap.
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    _env_nw = os.environ.get("IR_ENCODE_WORKERS")  # experiment override
    n_workers = (int(_env_nw) if _env_nw
                 else max(1, min(len(todo), max(4, min(8, ncpu // 2)))))
    groups = [todo[i::n_workers] for i in range(n_workers)]
    group_cpus = max(1, ncpu // n_workers)

    @ray.remote
    def encode_group(parts: list) -> list:
        import pyarrow.dataset as pads

        idf_by_tid = ray.get(idf_by_tid_ref) if idf_by_tid_ref is not None else None
        out = []
        for part in parts:
            t0 = time.time()
            files = sorted(glob.glob(os.path.join(raw_dir, f"part={part}", "*.parquet")))
            # the exchange leaves ~#explode-blocks small files per partition;
            # the dataset scanner amortizes per-file overhead across the
            # task's reserved cpus (measured ~2× vs a per-file read loop)
            tbl = pads.dataset(files, format="parquet").to_table()
            df_col = (tbl.column("df").to_numpy().astype(np.int64)
                      if "df" in tbl.column_names else None)
            out.append(_encode_arrays(
                part,
                tbl.column("term_id").to_numpy(),
                tbl.column("doc_id").to_numpy(),
                tbl.column("tf").to_numpy().astype(np.int64),
                tbl.column("doc_len").to_numpy().astype(np.int64),
                index_dir=index_dir, block_doc_range=block_doc_range,
                avgdl=avgdl, idf_by_tid=idf_by_tid, df=df_col, N=N, t0=t0,
            ))
        return out

    refs = [encode_group.options(num_cpus=group_cpus).remote(g) for g in groups if g]
    metrics = [m for grp in ray.get(refs) for m in grp]
    timings["postings_encode"] = time.time() - t_encode0
    return pd.DataFrame(metrics, columns=["part", "blocks", "postings"])
