"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (inverted-index build + BM25 top-k
through the block-max query engine) on sf0.001. ``queries()`` exposes one
callable per implemented operator/pipeline from SURVEY.md §2 (plus the
training-data tier: dedup / ANN / text analysis / multimodal plumbing);
``oracle_sql()`` holds the DuckDB mirrors for everything SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship on /root/testdata/sf0.001: build the full inverted index over
    the documents corpus (full analyzer mode: tokenize → normalize → Porter2
    stem → stopword/len filter), then answer a query batch through the
    stateful query-actor pool. Returns the (query_id, rank, doc_id, score)
    result Dataset."""
    import shutil

    import ray.data

    from ir_base_ray.config import AnalyzerSpec, IndexConfig
    from ir_base_ray.pipelines.build_index import build_index
    from ir_base_ray.pipelines.query_engine import search
    from ir_base_ray.sources.corpus import corpus_from_documents
    from ir_base_ray.sources.queries import synth_queries

    sf_dir = "/root/testdata/sf0.001"
    index_dir = "/tmp/ir_index_entry"
    shutil.rmtree(index_dir, ignore_errors=True)
    cfg = IndexConfig(
        out_dir=index_dir,
        block_doc_range=1024,
        num_partitions=8,
        analyzer_concurrency=2,
        analyzer=AnalyzerSpec(ngram=1, mode="full"),
    )
    corpus = corpus_from_documents(sf_dir)
    build_index(corpus, cfg)

    import pyarrow.parquet as pq

    docs_tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    corpus_tbl = docs_tbl.rename_columns(["doc_id", "text"])
    queries = synth_queries(corpus_tbl, n_queries=20, seed=3)
    return search(ray.data.from_arrow(queries), index_dir, concurrency=2)


def queries() -> dict[str, Callable[[str], Any]]:
    """Exactly 50 entries (the driver's gate window): the 44 oracle-backed
    queries first, then six rows-only family suites that union every
    remaining model variant under a ``model`` column (see the suite wrappers
    at the bottom of ``ops.py``). Per-variant functions remain public in
    ``ops`` and are pinned individually by pytest."""
    from ir_base_ray.pipelines import ops

    return {
        # A. corpus statistics (SURVEY.md §2.5)
        "term_stats": ops.term_stats,                    # A1+A2 DF/TTF
        "corpus_scalars": ops.corpus_scalars_op,         # A4 N/avgdl
        "corpus_lm": ops.corpus_lm,                      # A5 background LM
        "class_counts": ops.class_counts,                # A3
        "nb_stats": ops.nb_stats,                        # A6 NaiveBayes sstats
        # W. weighting (§2.7)
        "bm25_weights": ops.bm25_weights,                # W4
        "weight_schemes": ops.weight_schemes,            # W2/W3/W5/W6 folded (scheme col)
        # flagship index + query engine (§7.1, Q1/J2/J3)
        "topk_bm25_indexed": ops.topk_bm25_indexed,
        "topk_bm25_merged": ops.topk_bm25_merged,        # segment merge + docID remap
        # F. feature selection (§2.6)
        "df_band": ops.df_band,                          # F1
        "ig_select": ops.ig_select,                      # F2
        "mi_select": ops.mi_select,                      # F3
        "chi_select": ops.chi_select,                    # F4
        "top_ttf_terms": ops.top_ttf_terms,              # F6/Q7 sort+limit
        # grouping / joins / windows / splits (§2.4, §2.8)
        "events_user_agg": ops.events_user_agg,          # J6
        "events_hourly_window": ops.events_hourly_window,
        "time_split": ops.time_split,                    # Q4
        "region_revenue": ops.region_revenue,            # J5/J7 broadcast join
        "lineitem_pricing": ops.lineitem_pricing,        # wide groupby agg
        "fold_assign": ops.fold_assign,                  # Q5 deterministic folds
        "seeded_sample": ops.seeded_sample,              # Q6 deterministic sample
        "selector_union": ops.selector_union,            # F6 union + dedup
        "shuffled_sample": ops.shuffled_sample,          # Q8 seeded hash shuffle
        # training-data tier: dedup / similarity / text analysis
        "dedup_exact": ops.dedup_exact,
        "dedup_near_pairs": ops.dedup_near_pairs,        # MinHash-LSH + ngram-Jaccard folded
        "dedup_substring": ops.dedup_substring,          # exact-substring spans (Lee et al. 2021)
        "dedup_suffix_stats": ops.dedup_suffix_stats,    # suffix-array arbitrary-length spans
        "dedup_global_stats": ops.dedup_global_stats,    # cross-shard rolling-hash path
        "dedup_global_spans": ops.dedup_global_spans,    # maximal duplicated spans
        "dedup_global_cut": ops.dedup_global_cut,        # the cut applied (cleaned corpus)
        "dedup_clusters": ops.dedup_clusters,            # pair graph → connected components
        "dedup_simhash": ops.dedup_simhash,              # SQL-mirrored simhash
        "ann_topk": ops.ann_topk,                        # brute + IVF-Flat folded (variant col)
        "lm_ppl_filter": ops.lm_ppl_filter,              # bigram-LM quality filter (CCNet-style)
        "embedding_near_dup_exact": ops.embedding_near_dup_exact,
        "embedding_near_dup": ops.embedding_near_dup_pairs,  # LSH
        "text_quality": ops.text_quality_scores,
        "repetition_stats": ops.repetition_stats_scores,  # Gopher repetition cuts
        "token_counts": ops.token_count_scores,
        "lang_id": ops.lang_id_predictions,
        "doc_fingerprints": ops.doc_fingerprints,        # SQL-mirrored rolling hash
        "media_features": ops.media_feature_extract,     # metadata hash-checked; stub decode pytest-pinned
        "pagerank_weights": ops.pagerank_item_weights,   # J8 per-item PageRank
        "lm_rank_children": ops.lm_rank_children,        # correspondence LM baseline
        "pos_adjadv_vector": ops.pos_adjadv_vector,      # M12 (rule tagger)
        "senti_scores": ops.senti_doc_scores,            # M13 (lexicon)
        "lm_dual_vectors": ops.lm_dual_vectors,          # MultiThreadedLMAnalyzer dual spaces
        "iso_user_split": ops.iso_user_split,            # IsoUserAnalyzer allocation
        "bipartite_maps": ops.bipartite_maps,            # BipartiteAnalyzer adjacency
        # rows-only family suites (union of per-model outputs, `model` column)
        "topic_term_models": ops.topic_term_models,      # R7: pLSA/LDA×2/DCM-LDA(+sparse)
        "mixture_profiles": ops.mixture_profiles,        # R7: CTM/twoTopic/TUIR
        "sentence_models": ops.sentence_models,          # M11 + HTMM/HTSM/LR-HTMM/LR-HTSM
        "corr_topic_models": ops.corr_topic_models,      # ACCTM×5/corrLDA/DCM-CorrLDA/WCM
        "classify_suite": ops.classify_suite,            # R6: LR/NBEM/PRLR/SVM/KMeans/GF(+LinAdapt)
        "l2r_rank_training": ops.l2r_rank_training,      # R2+R3/R4 (rows-only)
    }


def oracle_sql() -> dict[str, str]:
    from ir_base_ray.pipelines import ops

    return {
        "term_stats": ops.SQL_TERM_STATS,
        "corpus_scalars": ops.SQL_CORPUS_SCALARS,
        "corpus_lm": ops.SQL_CORPUS_LM,
        "class_counts": ops.SQL_CLASS_COUNTS,
        "nb_stats": ops.SQL_NB_STATS,
        "bm25_weights": ops.SQL_BM25_WEIGHTS,
        "weight_schemes": ops.SQL_WEIGHT_SCHEMES,
        "topk_bm25_indexed": ops.sql_topk_bm25(),
        "topk_bm25_merged": ops.sql_topk_bm25(),
        "df_band": ops.SQL_DF_BAND,
        "ig_select": ops.SQL_IG_SELECT,
        "mi_select": ops.SQL_MI_SELECT,
        "chi_select": ops.SQL_CHI_SELECT,
        "top_ttf_terms": ops.SQL_TOP_TTF,
        "events_user_agg": ops.SQL_EVENTS_USER_AGG,
        "events_hourly_window": ops.SQL_EVENTS_HOURLY,
        "time_split": ops.SQL_TIME_SPLIT,
        "region_revenue": ops.SQL_REGION_REVENUE,
        "lineitem_pricing": ops.SQL_LINEITEM_PRICING,
        "fold_assign": ops.SQL_FOLD_ASSIGN,
        "seeded_sample": ops.SQL_SEEDED_SAMPLE,
        "shuffled_sample": ops.SQL_SHUFFLED_SAMPLE,
        "selector_union": ops.SQL_SELECTOR_UNION,
        "dedup_exact": ops.SQL_DEDUP_EXACT,
        "dedup_near_pairs": ops.sql_dedup_near_pairs(),
        "dedup_substring": ops.SQL_DEDUP_SUBSTRING,
        "dedup_suffix_stats": ops.SQL_DEDUP_COVERAGE_STATS,
        "dedup_global_stats": ops.SQL_DEDUP_COVERAGE_STATS,
        "dedup_global_spans": ops.SQL_DEDUP_COVERAGE_SPANS,
        "dedup_global_cut": ops.SQL_DEDUP_GLOBAL_CUT,
        "dedup_clusters": ops.sql_dedup_clusters(),
        "dedup_simhash": ops.SQL_SIMHASH,
        "doc_fingerprints": ops.sql_fingerprints(),
        "ann_topk": ops.SQL_ANN_TOPK,
        "lm_ppl_filter": ops.SQL_LM_PPL_FILTER,
        "embedding_near_dup_exact": ops.SQL_NEAR_DUP_EXACT,
        "embedding_near_dup": ops.sql_embedding_lsh(),
        "text_quality": ops.SQL_TEXT_QUALITY,
        "repetition_stats": ops.SQL_REPETITION,
        "token_counts": ops.SQL_TOKEN_COUNTS,
        "pagerank_weights": ops.SQL_PAGERANK,
        "lm_rank_children": ops.SQL_LM_RANK_CHILDREN,
        "lang_id": ops.SQL_LANG_ID,
        "pos_adjadv_vector": ops.SQL_POS_ADJADV,
        "senti_scores": ops.SQL_SENTI,
        "media_features": ops.SQL_MEDIA_FEATURES,
        "lm_dual_vectors": ops.SQL_LM_DUAL_VECTORS,
        "iso_user_split": ops.SQL_ISO_USER_SPLIT,
        "bipartite_maps": ops.SQL_BIPARTITE_MAPS,
    }
