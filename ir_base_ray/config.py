"""Engine configuration: analyzer spec, BM25 parameters, index layout knobs.

The analyzer spec is the rebuild's pluggable equivalent of the reference's
analyzer constructor arguments (tokenizer model / ngram / length threshold,
``Analyzer/DocAnalyzer.java:56-92``); the index knobs size the Ray Data
pipeline for scale (SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class AnalyzerSpec:
    """Pluggable analyzer config (SURVEY.md §2.12)."""

    ngram: int = 1
    length_threshold: int = 0  # doc accepted iff #distinct terms > threshold (M8)
    stopwords_path: str | None = None  # None -> packaged 749-word list
    mode: str = "full"  # "full" = tokenize/NFKC/stem chain; "simple" = SQL-parity mode
    # stemmer language (the reference selects among 16 vendored Snowball
    # stemmers in its analyzer constructor; see functions/snowball.py for the
    # registry — "en" = Porter2, de/es/fr = pure-Python Snowball)
    lang: str = "en"


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.5  # Analyzer.java:237
    b: float = 0.75  # Analyzer.java:238


@dataclass(frozen=True)
class IndexConfig:
    """Physical layout + parallelism knobs for the index build."""

    out_dir: str = "/tmp/ir_index"
    # docs-per-chunk RANGE for posting blocks: postings are grouped by
    # (term_id, doc_id // block_doc_range); hot (head) terms therefore split
    # into many independent groups — the Zipf-skew salting of SURVEY.md §7.3
    block_doc_range: int = 4096
    # number of hash partitions for the posting-encode shuffle; each partition
    # becomes one resumable output directory with a manifest
    num_partitions: int = 32
    # doc-id assignment shards (range partitions over the url keyspace)
    id_shards: int = 16
    # analyzer actor pool
    analyzer_concurrency: int | tuple[int, int] = 4
    analyzer_batch_size: int | None = None  # None = whole blocks: keeps output blocks,
    # parquet row groups, and downstream combiner batches large
    analyzer: AnalyzerSpec = field(default_factory=AnalyzerSpec)
    bm25: BM25Params = field(default_factory=BM25Params)
    # optional: the corpus parquet path(s); lets the url→doc_id map read the
    # key column with parallel row-group tasks instead of via the Dataset
    corpus_paths: tuple[str, ...] | None = None
    # auto-dispatch threshold for doc-id assignment: corpora up to this many
    # rows use the driver-sorted broadcast url map (text never shuffles);
    # larger corpora switch to the distributed sort + hash join
    # (stages/docids.assign_dense_ids) — ~50M urls ≈ 4 GB driver heap is the
    # safe single-driver bound
    driver_id_map_max_rows: int = 50_000_000
    # auto-dispatch threshold for the dictionary finalize: vocabularies up to
    # this many terms are sorted + rank-assigned on the driver and broadcast
    # to the postings explode; larger vocabularies use the fully distributed
    # path (stages/stats.build_dictionary dense ranks + a term-keyed
    # Dataset.join in the postings explode, df→idf derived per partition) —
    # ~100M terms ≈ 8 GB driver heap is the safe single-driver bound
    driver_dict_max_terms: int = 100_000_000
