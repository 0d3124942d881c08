"""Corpus statistics: the dictionary (term, term_id, df, ttf) plus scalars
(N, avgdl) — the rebuild's immutable replacement for the reference's shared
mutable vocabulary + ``_stat`` DF/TTF table (``Analyzer/Analyzer.java:38-40``,
``structures/_stat.java:55-62``, lock-guarded in
``MultiThreadedUserAnalyzer.java:64-68`` — replaced by groupby-aggregate, no
locks, SURVEY.md §3/§4).

Skew handling: DF/TTF are pre-aggregated per batch inside ``map_batches``
(combiner pattern) so the ``groupby("term")`` shuffle moves one row per
distinct term per batch, not one row per posting — head terms like "the"
contribute #batches rows instead of #docs rows.

Per-doc dedup inside the combiner makes DF exact (A1: +1 per doc containing
the term, ``DocAnalyzer.java:392-394``; TTF +1 per token, ``:404-405``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Count, Mean, Sum

from ir_base_ray.stages.docids import assign_dense_ids


def _partial_stats(batch: pa.Table) -> pa.Table:
    """per-batch combiner: rows (term, df, ttf) with df = #docs in batch
    containing term, ttf = Σ tf in batch."""
    terms = batch.column("terms")
    tfs = batch.column("tfs")
    flat_terms = pa.chunked_array([c.flatten() for c in terms.chunks]) if isinstance(terms, pa.ChunkedArray) else terms.flatten()
    flat_tfs = pa.chunked_array([c.flatten() for c in tfs.chunks]) if isinstance(tfs, pa.ChunkedArray) else tfs.flatten()
    # terms are distinct within a doc (Counter keys), so df = row count and
    # ttf = Σ tf — aggregated with Arrow's C++ hash groupby (zero Python
    # per-string work)
    flat = pa.table({"term": flat_terms, "tf": flat_tfs})
    agg = flat.group_by("term").aggregate([("tf", "sum"), ("term", "count")])
    return pa.table({
        "term": agg.column("term"),
        "df": pa.compute.cast(agg.column("term_count"), pa.int64()),
        "ttf": pa.compute.cast(agg.column("tf_sum"), pa.int64()),
    })


def dictionary_aggregate(analyzed_ds):
    """analyzed Dataset → aggregated (term, df, ttf) Dataset — the common
    prefix of both dictionary finalize paths (combiner partials, one
    distributed groupby-sum). term_id is NOT assigned yet."""
    partials = analyzed_ds.map_batches(_partial_stats, batch_format="pyarrow",
                                       batch_size=None)
    return partials.groupby("term").aggregate(
        Sum("df", alias_name="df"), Sum("ttf", alias_name="ttf")
    )


def build_dictionary(analyzed_ds):
    """analyzed Dataset → dictionary Dataset (term, df, ttf, term_id) with
    term_id = dense rank of term (sorted order — deterministic, unlike the
    reference's grow-on-first-sight arrival order, ``Analyzer.java:126-130``).
    Fully-distributed term_id assignment (sort + offset ranks) — use when the
    vocabulary is too large to finalize on the driver."""
    return assign_dense_ids(dictionary_aggregate(analyzed_ds),
                            key="term", id_col="term_id")


def finalize_aggregate(agg_ds):
    """aggregated (term, df, ttf) Dataset → final dictionary pandas frame:
    a vocab-sized driver finalize (sort + dense term_id ranks). Same ids as
    :func:`build_dictionary` (both rank terms under the ascending sort)."""
    pdf = agg_ds.to_pandas()
    if "term" not in pdf.columns:
        # a fully-empty Dataset loses its schema through to_pandas() (e.g.
        # every doc dropped by a zero-overlap frozen CV) — normalize so the
        # build produces a valid EMPTY index instead of a KeyError
        import pandas as _pd

        pdf = _pd.DataFrame({"term": _pd.Series([], dtype=object),
                             "df": _pd.Series([], dtype="int64"),
                             "ttf": _pd.Series([], dtype="int64")})
    pdf = pdf.sort_values("term").reset_index(drop=True)
    pdf["term_id"] = np.arange(len(pdf), dtype=np.int64)
    return pdf


def finalize_partials(partials_ds):
    """(term, df, ttf) combiner partials Dataset → final dictionary pandas
    frame: distributed groupby-sum (partial rows ≈ vocab × #blocks), then a
    vocab-sized driver finalize (sort + dense term_id ranks)."""
    return finalize_aggregate(partials_ds.groupby("term").aggregate(
        Sum("df", alias_name="df"), Sum("ttf", alias_name="ttf")
    ))


def build_dictionary_driver(analyzed_ds):
    """Same result as :func:`build_dictionary` but finalizes the (combiner-
    shrunk) aggregate on the driver: one distributed execution (partials →
    groupby-sum), then a driver-side sort + arange for term_id. Web
    vocabularies (10^6-10^8 terms × ~24 B) fit driver memory comfortably; the
    distributed variant exists for when they don't (``build_index`` dispatches
    on ``IndexConfig.driver_dict_max_terms``). Returns a pandas frame sorted
    by term_id."""
    return finalize_aggregate(dictionary_aggregate(analyzed_ds))


def build_dictionary_driver_fast(analyzed_ds):
    """Fastest small/medium-vocab path: per-block combiner partials stream to
    the driver and a single pandas groupby-sum finalizes them (no distributed
    shuffle at all — partial rows ≈ vocab × #blocks, tiny next to postings).
    Scale path: swap in :func:`build_dictionary` (distributed groupby + dense
    ranks) when vocab × #blocks outgrows the driver."""
    partials = analyzed_ds.map_batches(_partial_stats, batch_format="pyarrow",
                                       batch_size=None)  # whole blocks: one
    # combiner output per block keeps partial rows ≈ vocab × #blocks
    frames = [b.to_pandas() for b in partials.iter_batches(batch_format="pyarrow")]
    import pandas as pd

    allp = pd.concat(frames, ignore_index=True)
    agg = allp.groupby("term", as_index=False, sort=True).agg(
        df=("df", "sum"), ttf=("ttf", "sum")
    )
    agg["term_id"] = np.arange(len(agg), dtype=np.int64)
    return agg


def corpus_scalars(analyzed_ds) -> dict:
    """N (corpus size) and avgdl (mean Σ-tf doc length), ``Analyzer.java:191,
    239-242``. avgdl is recomputed exactly as the reference does: Σ doclen / N
    in float64."""
    agg = analyzed_ds.aggregate(Count(alias_name="n_docs"), Sum("doc_len", alias_name="total_len"))
    n = int(agg["n_docs"])
    total = float(agg["total_len"]) if agg["total_len"] is not None else 0.0
    return {"N": n, "avgdl": total / n if n else 0.0, "total_len": total}
