"""ray-fulltext: a Ray-Data-native inverted-index builder + BM25 top-k query
engine with the query/data-processing capabilities of mikelatch/IR_Base
(see SURVEY.md). Built from scratch on ray.data.Dataset pipelines."""

__version__ = "0.1.0"

from ir_base_ray.perf import tune_malloc as _tune_malloc

_tune_malloc()  # per-process allocator tuning; see perf.py for the numbers
