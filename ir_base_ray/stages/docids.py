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
