"""wicsmmiretl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the floschne/wicsmmirETL reference pipeline,
re-expressed Spark-first (DataFrame/SQL/Catalyst, Structured Streaming) and
extended with large-scale training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Design notes
------------
* Everything is a lazy DataFrame plan; Catalyst does pushdown/pruning/join
  selection. No RDDs, no driver-side loops over collect().
* Python crosses the JVM boundary only through Arrow-batched pandas UDFs /
  mapInPandas, and only for semantics the built-in functions can't express
  (image decode, model-backed NLP backends).
* All operators are designed for multi-executor clusters (broadcast hints for
  dims, salting hooks for skew, AQE-friendly plans) even though tests run on
  local[*].

Public API
----------
The operators below are the supported surface; everything else is an
implementation detail. Quickstart::

    from wicsmmiretl_spark import get_spark, load_table, exact_dedup

    spark = spark_session = get_spark("app")
    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    exact_dedup(docs, key_cols=["text"], id_col="doc_id").show()
"""

from wicsmmiretl_spark.catalog import TESTDATA_TABLES, load_table, load_tables
from wicsmmiretl_spark.functions.repetition import repetition_stats
from wicsmmiretl_spark.functions.scrub import scrub_pii
from wicsmmiretl_spark.functions.urls import canonicalize_url, url_host
from wicsmmiretl_spark.functions.strings import (
    add_punct,
    concat_corpus,
    strip_control_chars,
    wikimedia_urls,
)
from wicsmmiretl_spark.functions.text import (
    bigram_surprisal,
    caption_stats,
    feature_hash,
    fingerprint,
    heaps_fit,
    language_id,
    pmi_collocations,
    pos_tag_stats,
    quality_score,
    token_counts,
    vocab,
    zipf_fit,
)
from wicsmmiretl_spark.operators.aggregates import (
    ab_test_stats,
    category_entropy,
    chi_square_independence,
    conformal_interval,
    cusum_changepoint,
    gini_coefficient,
    grouped_ks_report,
    hll_intersect_estimate,
    information_gain,
    poisson_bootstrap_ci,
    psi,
    psi_bin_expr,
    psi_from_binned,
    ks_test,
    weighted_quantiles,
    column_stats,
    cms_estimate,
    cms_heavy_hitters,
    cms_join_size,
    cms_merge,
    cms_sketch,
    corr_matrix,
    histogram,
    histogram_quantiles,
    hll_estimate,
    hll_merge,
    hll_sketch,
    profile_drift,
    profile_table,
    resample_ffill,
    resample_interpolate,
    robust_outliers,
    incremental_agg_build,
    incremental_agg_merge,
    binary_auc,
    calibration_curve,
    roc_curve,
    grouped_ols,
    grouped_theil_sen,
    grouped_trimmed_stats,
    grouped_stats_matrix,
    quantile_transform,
    seasonal_naive_error,
    spearman_corr,
    null_count,
    skew_report,
    table_fingerprint,
    target_encode,
    trailing_aggregate,
)
from wicsmmiretl_spark.operators.decontaminate import ngram_contamination
from wicsmmiretl_spark.operators.dedup import (
    containment_pairs,
    content_defined_chunks,
    dup_clusters,
    duplicated_span_stats,
    exact_dedup,
    jaccard_pairs,
    jaccard_prefix_join,
    lsh_candidate_pairs,
    lsh_probe_pairs,
    minhash_signatures,
    semantic_dedup,
    simhash_near_pairs,
    sorted_neighborhood_pairs,
    winnowing_fingerprints,
    winnowing_overlap_pairs,
)
from wicsmmiretl_spark.operators.filters import apply_filters, drop_null
from wicsmmiretl_spark.operators.layout import cluster_by_zorder, zonemap_pruning_report, zorder_value
from wicsmmiretl_spark.operators.joins import (
    asof_join,
    attach,
    drop_failures,
    fuzzy_match,
    keep_successes,
    null_bypass_join,
    range_join,
    salted_join,
)
from wicsmmiretl_spark.operators.bpe import bpe_encode, bpe_train
from wicsmmiretl_spark.operators.cohorts import retention_cohorts, survival_curve
from wicsmmiretl_spark.operators.intervals import interval_overlap_join, merge_intervals
from wicsmmiretl_spark.operators.merge import apply_cdc, golden_record, merge_scd2, merge_upsert, point_in_time_join, snapshot_diff
from wicsmmiretl_spark.operators.pruning import bloom_prune, bloom_semi_filter, bloom_words
from wicsmmiretl_spark.operators.quality import benford_test, dq_gate, dq_report, fd_check, k_anonymity, key_skew_profile, l_diversity
from wicsmmiretl_spark.operators.packing import chunk_documents, pack_sequences
from wicsmmiretl_spark.operators.ranking import association_pairs, bm25_rank, inverted_index, ndcg_at_k, retrieval_metrics, rrf_fuse, tfidf_cosine_pairs
from wicsmmiretl_spark.operators.graph import bfs_levels, butterfly_stats, connected_components, degree_profile, hits, kcore, label_propagation, link_prediction, pagerank, personalized_pagerank, shortest_paths, triangle_stats
from wicsmmiretl_spark.operators.sampling import (
    cap_per_group,
    deterministic_sample,
    deterministic_shuffle,
    hash_split,
    kfold_assign,
    mix_corpus,
    negative_samples,
    referential_sample,
    temperature_mix,
    quantile_bins,
    stable_index,
    stratified_sample,
    token_budget_sample,
    top_k,
    train_test_split,
    weighted_sample,
)
from wicsmmiretl_spark.operators.nb import nb_classify, nb_confusion, nb_train, nb_uncertainty_queue
from wicsmmiretl_spark.operators.sequences import ewma, frequent_sequences, rolling_corr, time_weighted_avg, transition_matrix
from wicsmmiretl_spark.operators.skyline import skyline_2d
from wicsmmiretl_spark.operators.sets import union_checked
from wicsmmiretl_spark.operators.similarity import (
    cosine_pairs,
    embedding_centroid_drift,
    embedding_pair_profile,
    kcenter_select,
    random_projection,
    simplified_silhouette,
    cosine_topk,
    hyperplane_lsh_topk,
    hyperplane_pairs,
    ivf_topk,
    kmeans_train,
    knn_classify,
    mmr_topk,
    pq_encode,
    sq8_encode,
    sq8_topk,
    sq8_train,
    pq_topk,
    pq_train,
)
from wicsmmiretl_spark.multimodal.audio import audio_features, synth_wav
from wicsmmiretl_spark.session import get_spark, stop_spark
from wicsmmiretl_spark.sources.captions_source import CaptionListDataSource
from wicsmmiretl_spark.streaming.windows import stream_cms_sketch, stream_histogram, stream_hll_registers, stream_static_enrich, stream_psi

__all__ = [
    # session / catalog
    "get_spark",
    "stop_spark",
    "load_table",
    "load_tables",
    "TESTDATA_TABLES",
    # filters / joins / sets
    "apply_filters",
    "drop_null",
    "attach",
    "keep_successes",
    "drop_failures",
    "range_join",
    "asof_join",
    "salted_join",
    "null_bypass_join",
    "merge_upsert",
    "apply_cdc",
    "golden_record",
    "merge_scd2",
    "snapshot_diff",
    "point_in_time_join",
    "union_checked",
    "fuzzy_match",
    "bloom_words",
    "bloom_prune",
    "bloom_semi_filter",
    "merge_intervals",
    "interval_overlap_join",
    "retention_cohorts",
    "survival_curve",
    "transition_matrix",
    "ewma",
    "frequent_sequences",
    "skyline_2d",
    "duplicated_span_stats",
    "chi_square_independence",
    "conformal_interval",
    "weighted_quantiles",
    "random_projection",
    "retrieval_metrics",
    "containment_pairs",
    "time_weighted_avg",
    "kcenter_select",
    "nb_train",
    "nb_uncertainty_queue",
    "nb_classify",
    "nb_confusion",
    "ks_test",
    "label_propagation",
    "link_prediction",
    "cusum_changepoint",
    "hll_intersect_estimate",
    "simplified_silhouette",
    "poisson_bootstrap_ci",
    "psi",
    "information_gain",
    "rolling_corr",
    "gini_coefficient",
    "grouped_ks_report",
    "benford_test",
    "psi_bin_expr",
    "psi_from_binned",
    "embedding_centroid_drift",
    "embedding_pair_profile",
    "zipf_fit",
    "stream_psi",
    "dq_report",
    "fd_check",
    "k_anonymity",
    "l_diversity",
    "dq_gate",
    "key_skew_profile",
    "bpe_train",
    "bpe_encode",
    "inverted_index",
    "cms_sketch",
    "cms_merge",
    "cms_estimate",
    "cms_heavy_hitters",
    "cms_join_size",
    "corr_matrix",
    "profile_drift",
    "grouped_ols",
    "grouped_theil_sen",
    "grouped_trimmed_stats",
    "binary_auc",
    "spearman_corr",
    "calibration_curve",
    "roc_curve",
    "quantile_transform",
    "seasonal_naive_error",
    "pmi_collocations",
    "feature_hash",
    "target_encode",
    "ab_test_stats",
    "category_entropy",
    "association_pairs",
    "jaccard_prefix_join",
    "triangle_stats",
    "butterfly_stats",
    "degree_profile",
    "hits",
    "kcore",
    "quantile_bins",
    "stable_index",
    "stream_hll_registers",
    "stream_cms_sketch",
    "stream_histogram",
    "stream_static_enrich",
    "CaptionListDataSource",
    # aggregates
    "column_stats",
    "grouped_stats_matrix",
    "null_count",
    "trailing_aggregate",
    "skew_report",
    "incremental_agg_build",
    "incremental_agg_merge",
    "histogram",
    "histogram_quantiles",
    "hll_sketch",
    "hll_merge",
    "hll_estimate",
    "profile_table",
    "table_fingerprint",
    "robust_outliers",
    "resample_ffill",
    "resample_interpolate",
    # sampling / splits
    "deterministic_shuffle",
    "deterministic_sample",
    "train_test_split",
    "hash_split",
    "kfold_assign",
    "top_k",
    "stratified_sample",
    "mix_corpus",
    "negative_samples",
    "referential_sample",
    "temperature_mix",
    "token_budget_sample",
    "cap_per_group",
    "weighted_sample",
    # dedup
    "exact_dedup",
    "content_defined_chunks",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "lsh_probe_pairs",
    "jaccard_pairs",
    "semantic_dedup",
    "simhash_near_pairs",
    "sorted_neighborhood_pairs",
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "dup_clusters",
    "bfs_levels",
    "shortest_paths",
    "connected_components",
    "pagerank",
    "personalized_pagerank",
    # similarity / ANN
    "cosine_topk",
    "cosine_pairs",
    "hyperplane_pairs",
    "hyperplane_lsh_topk",
    "kmeans_train",
    "ivf_topk",
    "knn_classify",
    "mmr_topk",
    "pq_train",
    "sq8_encode",
    "sq8_topk",
    "sq8_train",
    "pq_encode",
    "pq_topk",
    # ranking / packing / decontamination / layout
    "bm25_rank",
    "tfidf_cosine_pairs",
    "ndcg_at_k",
    "synth_wav",
    "audio_features",
    "rrf_fuse",
    "chunk_documents",
    "pack_sequences",
    "ngram_contamination",
    "zorder_value",
    "cluster_by_zorder",
    "zonemap_pruning_report",
    # text analysis
    "caption_stats",
    "vocab",
    "language_id",
    "quality_score",
    "fingerprint",
    "heaps_fit",
    "token_counts",
    "pos_tag_stats",
    "repetition_stats",
    "bigram_surprisal",
    "scrub_pii",
    "canonicalize_url",
    "url_host",
    # strings
    "strip_control_chars",
    "add_punct",
    "concat_corpus",
    "wikimedia_urls",
]

__version__ = "0.2.0"
