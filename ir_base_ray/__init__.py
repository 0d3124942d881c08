"""ray-fulltext: a Ray-Data-native inverted-index builder + BM25 top-k query
engine with the query/data-processing capabilities of mikelatch/IR_Base
(see SURVEY.md). Built from scratch on ray.data.Dataset pipelines."""

__version__ = "0.1.0"

from ir_base_ray.perf import tune_malloc as _tune_malloc

_tune_malloc()  # per-process allocator tuning; see perf.py for the numbers

# Ray Data's schema-dedup helper logs "Failed to hash the schemas ...
# unhashable type: 'dict'" per batch for parquet blocks carrying pandas
# metadata (harmless, ray-internal). This module imports in every worker
# that deserializes one of our UDFs, so raising the logger level here
# silences the spam fleet-wide without touching real warnings elsewhere.
import logging as _logging

_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow").setLevel(_logging.ERROR)
