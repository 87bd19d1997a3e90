"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps every
implemented SURVEY §2 operator (plus the large-scale pipeline extensions) to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the DuckDB
equivalent for the hash-match correctness gate. Implementations live in
``s3parq_spark.workload``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from s3parq_spark.workload import ORACLE_SQL, QUERIES  # noqa: E402


def _pin_session_confs(spark: SparkSession) -> None:
    """The driver owns the SparkSession; results must not depend on its
    config. UTC makes timestamp collection timezone-independent (matching
    the naive-timestamp DuckDB oracle); nanosAsLong lets the events table's
    TIMESTAMP(NANOS) column load; MILLIS output is reference write parity."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _pin_session_confs(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _pin_session_confs(spark)
    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


# Queries that already have a green (hash-matched) row in a prior round's
# CORRECTNESS_r{01..04}.json. The driver only records the first 50 entries
# of queries(), so registration order IS verification coverage: we lead with
# two sentinel parity queries, then every query that has never had a driver
# row (including anything newly added this round), then the already-verified
# remainder. Rotate this set forward each round as new rows land.
_VERIFIED_PRIOR_ROUNDS = frozenset(
    {
        # r01-r03 greens
        "ann_topk", "anti_join", "asof_clicks", "audio_features",
        "cube_pricing", "dedup_exact", "distinct_counts", "doc_fingerprint",
        "emb_neardup", "events_json", "events_sessionize", "events_sliding",
        "events_stream_tumbling", "events_tumbling", "except_nations",
        "fetch_all", "fetch_decimal", "fetch_diff", "fetch_diff_reverse",
        "fetch_filter_bool", "fetch_filter_datetime", "fetch_filter_eq",
        "fetch_filter_float_eq", "fetch_filter_gt", "fetch_filter_in",
        "fetch_filter_neq", "frame_sample", "grouping_sets",
        "intersect_nations", "lang_id", "media_features", "minhash_pairs",
        "nation_revenue", "neardup_jaccard", "order_item_arrays",
        "partition_diff_values", "partition_max", "partition_values",
        "pivot_status", "pricing_summary", "quantiles", "rollup_pricing",
        "scalar_functions", "semi_join", "simhash_pairs", "text_quality",
        "token_stats", "top_revenue_orders", "topk_orders", "union_distinct",
        "window_top_orders",
        # r04 greens (CORRECTNESS_r04.json, 48/50)
        "ann_batch_topk", "approx_distinct_counts", "band_join",
        "bm25_search", "brand_size_revenue", "catalog_join",
        "chunk_documents", "customer_distribution", "dedup_incremental",
        "disjunctive_parts", "embedding_centroids", "embedding_normalize",
        "events_stream_dedup", "events_stream_join", "events_stream_publish",
        "events_stream_sessions", "forecast_revenue", "fuzzy_titles_d2",
        "interval_join", "ivf_batch_topk", "ivf_topk", "knn_graph",
        "large_volume_customers", "lsh_topk", "market_share",
        "neardup_clusters", "ngram_contamination", "ngram_lm_quality",
        "order_priority_exists", "pii_scrub", "product_type_profit",
        "promo_revenue", "returned_item_ranking", "salted_revenue",
        "schema_evolution_fetch", "small_qty_revenue", "sql_front_door",
        "stratified_fixed_n", "stratified_sample", "tf_idf_top_terms",
        "top_supplier", "vocab_topk", "volume_shipping", "waiting_customers",
        "window_running",
        # NOT here (deliberately): "doc_dup_ngrams" — r04-green, but its
        # oracle tokenization changed this round (regex split), so it
        # re-verifies via _NEW_THIS_ROUND; "repetition_quality" and
        # "embedding_quantize" — r04 RED, fixed this round, re-verify as
        # never-verified.
        #
        # ROUND-6 HANDOFF: after r05's 50 rows land, these 39 queries will
        # still lack a driver CORRECTNESS row (the r05 window was full);
        # they are first in line for round 6's _NEW_THIS_ROUND / head —
        # all pass the local driver-parity gate (sf0.01 full suite; the
        # session's additions also spot-checked at sf0.1):
        #   repartition_fetch multi_supplier_waiting hidden_partition_fetch
        #   delete_where_fetch dataset_stats ivf_pq_at_rest
        #   update_where_fetch expectations_publish hard_negatives oov_rate
        #   fuzzy_dedup_at_rest dsir_select quantized_rescore expire_fetch
        #   span_dedup time_travel_ts attach_at_sql cas_publish
        #   compact_fetch stream_hidden_fetch corpus_overlap
        #   containment_dedup dataset_card files_table
        #   rename_evolution_fetch dml_change_feed merge_change_feed
        #   cdc_mirror_fetch hidden_pushdown_fetch source_entropy
        #   gumbel_sample events_stream_topk winsorized_pricing
        #   zscore_by_flag split_leakage partition_stats cluster_exemplars
        #   embedding_outliers semantic_decontaminate
    }
)

_SENTINELS = ("fetch_filter_eq", "pricing_summary")

# Queries added or changed this round, promoted right after the sentinels so
# they get a CORRECTNESS row in their first round instead of waiting out the
# rotation.
_NEW_THIS_ROUND: tuple[str, ...] = (
    "repetition_quality",   # r04 red: oracle SUM now CAST AS BIGINT
    "embedding_quantize",   # r04 red: output posexploded to scalars
    "doc_dup_ngrams",       # oracle tokenization changed to regex split
    "vacuum_roundtrip",     # new: orphan-file vacuum under the gate
    "bpe_roundtrip",        # new: BPE train/apply under the gate
    "ivf_pruned_topk",      # new: IVF-at-rest via partition-pruned fetch
    "semantic_dedup",       # new: SemDeDup-style embedding dedup
    "sorted_publish_fetch", # new: clustered publish + range read
    "zorder_publish_fetch", # new: Morton-key multi-dim clustering
    "fetch_changes",        # new: CDC incremental read between versions
    "bucketed_join",        # new: publish_bucketed + shuffle-free SMJ
    "quality_classifier",   # new: hashing-trick linear quality model
    "shipping_priority_split",  # new: TPC-H Q12 shape (CASE counting)
    "temperature_mix",      # new: sqrt-temperature source mixing
    "pq_topk",              # new: product-quantization ADC ANN
    "split_assign",         # new: deterministic train/val/test assignment
    "token_budget_select",  # new: per-source token-budget selection
    "line_dedup",           # new: cross-doc line-level boilerplate dedup
    "decontaminate",        # new: benchmark n-gram decontamination (corpus out)
    "minhash_dedup_corpus", # new: full fuzzy dedup, kept corpus out
    "restore_fetch",        # new: dataset rollback (restore) lifecycle
    "ivf_pq_topk",          # new: IVF + product-quantization ADC ANN
)


def _driver_order(names: list[str]) -> list[str]:
    head = [*_SENTINELS, *(n for n in _NEW_THIS_ROUND if n in names)]
    never_verified = [
        n for n in names
        if n not in _VERIFIED_PRIOR_ROUNDS and n not in head
    ]
    rest = [n for n in names if n in _VERIFIED_PRIOR_ROUNDS and n not in head]
    return [*head, *never_verified, *rest]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(QUERIES[name]) for name in _driver_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
