"""Deterministic doc_id assignment: doc_id := dense rank of ``url`` under the
global ascending sort (SURVEY.md §7.0 decision 2 — the reference's
arrival-order int id, ``DocAnalyzer.java:284``, has no stable equivalent under
distributed execution, so the rebuild pins sort order instead).

Algorithm (no driver-side row materialization):
  1. ``ds.sort(key)`` — Ray Data's range-partitioned distributed sort.
  2. materialize, then a metadata-only pass collects (block_min_key, rows)
     per block — tiny (one row per block).
  3. offsets = cumsum over blocks ordered by min key (driver, O(#blocks));
     broadcast the {min_key → start_offset} map.
  4. one zero-copy pass appends ``id_col = offset[batch_min] + arange``.

Blocks hold disjoint key ranges after a sort, so each block's min key
identifies it uniquely; ids are contiguous, 0-based, partition-independent and
reproducible. At petabyte scale step 2's materialize would be replaced by
writing the sorted table to parquet and reading it back — same shape.

The same routine assigns ``term_id`` to the sorted dictionary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def driver_key_id_map(ds, key: str):
    """Gather ONLY the key column to the driver and return a sorted
    ``pd.Index`` whose position IS the dense id (same id semantics as
    :func:`assign_dense_ids`: rank under the global ascending sort).

    Rationale: sorting the whole corpus moves the text payload through an
    all-to-all exchange just to compute ids; the key column is ~1% of the
    bytes (urls), so gather-and-sort-on-driver wins by a wide margin and the
    broadcast map lets the analyzer actors assign ids inline — ZERO shuffle
    touches the text. Scale bound: 10^9 urls × ~80 B ≈ 80 GB — beyond driver
    memory, switch back to :func:`assign_dense_ids` (distributed sort of the
    key column + hash-partitioned join on url)."""
    import pandas as pd

    parts = [
        b.column(key).to_numpy(zero_copy_only=False)
        for b in ds.select_columns([key]).iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    arr = np.concatenate(parts) if parts else np.array([], dtype=object)
    arr.sort(kind="stable")
    return pd.Index(arr)


def driver_key_id_map_from_parquet(path_or_paths, key: str):
    """Same as :func:`driver_key_id_map` but reads the key column straight
    from parquet with one Ray task per row-group chunk — the column decode
    happens in parallel workers and only the decoded strings reach the
    driver (a single-file corpus otherwise serializes on one read task)."""
    import pandas as pd
    import pyarrow.parquet as pq

    paths = [path_or_paths] if isinstance(path_or_paths, str) else list(path_or_paths)

    import pyarrow as pa
    import pyarrow.compute as pc

    @ray.remote
    def read_rgs(path: str, lo: int, hi: int) -> "pa.Array":
        f = pq.ParquetFile(path)
        tbl = f.read_row_groups(list(range(lo, hi)), columns=[key])
        # Arrow arrays ship as raw buffers (no per-string pickling) and feed
        # Arrow's parallel sort on the driver — UTF-8 byte order == code-point
        # order, so the ranks are identical to a Python-str sort
        return tbl.column(key).combine_chunks()

    refs = []
    for p in paths:
        n_rg = pq.ParquetFile(p).metadata.num_row_groups
        step = max(1, n_rg // 16)
        for lo in range(0, n_rg, step):
            refs.append(read_rgs.remote(p, lo, min(lo + step, n_rg)))
    parts = ray.get(refs)
    if not parts:
        return pd.Index(np.array([], dtype=object))
    combined = pa.chunked_array(parts)
    sorted_arr = pc.take(combined, pc.sort_indices(combined))
    return pd.Index(sorted_arr.to_numpy(zero_copy_only=False))


def assign_dense_ids(ds, key: str, id_col: str):
    """Sort `ds` by `key` (must be unique per row) and append contiguous
    0-based `id_col` ranks. Returns a MaterializedDataset."""
    sorted_ds = ds.sort(key).materialize()

    def block_meta(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"min_key": pa.array([], pa.string()), "rows": pa.array([], pa.int64())})
        return pa.table({
            "min_key": [batch.column(key)[0].as_py()],
            "rows": [len(batch)],
        })

    meta = sorted_ds.map_batches(block_meta, batch_size=None, batch_format="pyarrow").take_all()
    meta.sort(key=lambda r: r["min_key"])
    offsets: dict = {}
    acc = 0
    for row in meta:
        offsets[row["min_key"]] = acc
        acc += row["rows"]
    offsets_ref = ray.put(offsets)

    def add_ids(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column(id_col, pa.array([], pa.int64()))
        off = ray.get(offsets_ref)[batch.column(key)[0].as_py()]
        ids = np.arange(off, off + len(batch), dtype=np.int64)
        return batch.append_column(id_col, pa.array(ids, pa.int64()))

    return sorted_ds.map_batches(add_ids, batch_size=None, batch_format="pyarrow")
