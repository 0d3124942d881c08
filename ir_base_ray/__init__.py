"""ray-fulltext: a Ray-Data-native inverted-index builder + BM25 top-k query
engine with the query/data-processing capabilities of mikelatch/IR_Base
(see SURVEY.md). Built from scratch on ray.data.Dataset pipelines."""

__version__ = "0.1.0"
