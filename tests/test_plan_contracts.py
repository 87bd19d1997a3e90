"""Physical-plan contracts for the scale-critical queries.

Correctness gates prove values; these tests pin the PLANS the engine must
produce — partition pruning at the file index, broadcasts for dims, top-k
pushdown, and the absence of cartesian products. A refactor that keeps
values but regresses a plan (e.g. loses a broadcast and shuffles the fact
side) fails here instead of at 100 TB.

explain-only: no query executes, so the whole module costs seconds.
"""

import re

import pytest

from s3parq_spark.workload import QUERIES


def _plan(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


NO_CARTESIAN = [
    "neardup_jaccard",
    "minhash_pairs",
    "simhash_pairs",
    "interval_join",
    "knn_graph",
    "ngram_contamination",
    "emb_neardup",
    "asof_clicks",
    "volume_shipping",
]


@pytest.mark.parametrize("name", NO_CARTESIAN)
def test_no_cartesian_product(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name


def test_fetch_filter_prunes_at_file_index(spark, sf_dir):
    plan = _plan(spark, sf_dir, "fetch_filter_eq")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "l_returnflag" in m.group(1)


def test_nation_revenue_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan or "lineitem" not in plan.split(
        "SortMergeJoin"
    )[0]


def test_topk_orders_avoids_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_knn_graph_pushes_window_topk(spark, sf_dir):
    plan = _plan(spark, sf_dir, "knn_graph")
    # partial WindowGroupLimit before the exchange: top-k computed map-side
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_fetch_diff_prunes_partitions_no_join(spark, sf_dir):
    """r15: when the diff column is a same-typed partition column on both
    sides, fetch_diff collapses to a partition-pruning isin filter over
    the input scan — survivors computed driver-side from the manifests.
    No join, no aggregate, no exchange; pruning at the file index."""
    plan = _plan(spark, sf_dir, "fetch_diff")
    assert re.search(r"PartitionFilters: \[.*o_orderpriority.* IN ", plan)
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan


def test_band_join_broadcasts_the_dim(spark, sf_dir):
    plan = _plan(spark, sf_dir, "band_join")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_windows_per_bucket(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pack_sequences")
    m = re.search(r"hashpartitioning\(bucket", plan)
    assert m, "window must partition by the hash bucket, not a global sort"


def test_aggregates_have_map_side_partials(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    # two HashAggregates around one exchange = partial + final
    assert len(re.findall(r"HashAggregate", plan)) >= 2


def test_scan_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "vocab_topk")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "doc_id" not in m.group(1), "projection must prune to text"


def test_dedup_priority_is_one_hash_agg_no_window(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_priority")
    assert "Window" not in plan  # winner via min(struct), not row_number
    # struct min buffers aren't fixed-width, so Spark picks SortAggregate —
    # still partial + final around one exchange (map-side combine intact)
    assert len(re.findall(r"HashAggregate|ObjectHashAggregate|SortAggregate", plan)) >= 2


def test_corpus_upsample_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "corpus_upsample")
    assert "Exchange" not in plan  # pure scan -> filter -> explode


def test_volume_shipping_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "volume_shipping")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # supp, cust, (small) orders


def test_contamination_dedups_before_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ngram_contamination")
    # DISTINCT shingle aggregation must sit below the join on both sides
    join_pos = plan.find("Join")
    assert join_pos > 0
    assert len(re.findall(r"HashAggregate", plan)) >= 4  # 2x partial+final dedup


class TestRound5PlanContracts:
    def test_split_assign_is_shuffle_free(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "split_assign")
        assert "Exchange" not in plan
        assert "codegen id" in plan  # the md5-bucket CASE stays codegen'd

    def test_decontaminate_broadcasts_never_shuffles_corpus(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "decontaminate")
        # the clean-corpus join is a broadcast left-anti — the training
        # rows themselves never move
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        assert "CartesianProduct" not in plan

    def test_token_budget_window_partitioned_by_group(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "token_budget_select")
        assert "CartesianProduct" not in plan
        # per-source window: the only exchange key is the group column
        assert "hashpartitioning(source" in plan

    def test_line_dedup_no_cartesian(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "line_dedup")
        assert "CartesianProduct" not in plan

    def test_multi_supplier_waiting_semi_anti_takeordered(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "multi_supplier_waiting")
        assert "LeftSemi" in plan and "LeftAnti" in plan
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan

    def test_ivf_pq_scoring_scan_has_no_joins(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from s3parq_spark.operators import ivf_pq_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") == 0)
        df = ivf_pq_topk(emb, "vec_id", "embedding", q, k=5)
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(jmode)
        # index build ran eagerly (kmeans jobs); the QUERY plan left behind
        # is pure scan -> filter -> project -> TakeOrdered: no join of any
        # kind, no exchange other than the top-k's single-partition gather
        for op in ("Join", "CartesianProduct", "Exchange hashpartitioning"):
            assert op not in plan, op
        assert "TakeOrderedAndProject" in plan


class TestSessionNewOpPlanContracts:
    def test_dsir_lambda_table_broadcast_no_cartesian(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "dsir_select")
        # the totals frame (1 row) and the lambda table (<= n_buckets rows)
        # are the only non-keyed joins, and both must be broadcasts
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan
        # final ranking is top-k pushdown, not a global sort
        assert "TakeOrderedAndProject" in plan

    def test_quantized_rescore_broadcasts_candidates(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "quantized_rescore")
        # stage 2 joins the tiny candidate set back onto the vector table:
        # broadcast, never a corpus reshuffle
        assert "BroadcastHashJoin" in plan
        # the only cartesian-shaped node is the broadcast of the query batch
        assert "CartesianProduct" not in plan
        # both rankings run as per-query window group-limits
        assert "WindowGroupLimit" in plan

    def test_span_dedup_no_cartesian_keyed_joins(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "span_dedup")
        assert "CartesianProduct" not in plan
        # duplicate-set join and coverage anti-structure stay hash joins
        assert "BroadcastNestedLoopJoin" not in plan

    def test_containment_no_cartesian(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "containment_dedup")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_corpus_overlap_broadcast_pair_spine(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "corpus_overlap")
        assert "CartesianProduct" not in plan
        # the O(groups) signature frames pair via broadcast
        assert "Broadcast" in plan

    def test_dataset_card_single_broadcast_total(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "dataset_card")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


class TestRound6PlanContracts:
    def test_pq_batch_is_one_plan_with_window_topk(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "pq_batch_topk")
        # N queries, ONE plan: ranking is the per-query window group-limit,
        # never a per-query driver loop (which would show N separate scans)
        assert "WindowGroupLimit" in plan
        # the only cartesian-shaped node is the broadcast of the tiny
        # query frame carrying its ADC lookup tables
        assert "CartesianProduct" not in plan
        # corpus + query source, each listed once in the details section
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2

    def test_ivf_pq_batch_broadcast_probe_equi_join(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "ivf_pq_batch_topk")
        # candidates come from the (probe cell = assigned cell) equi-join
        # with the query x probe frame broadcast — never a cartesian, and
        # the corpus side is never reshuffled for the join
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan
        assert "WindowGroupLimit" in plan
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2

    def test_null_partition_merge_fetch_is_plain_scan(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "null_partition_merge")
        # the query returns a fetch of the merged dataset: one pruned scan,
        # no joins left in the read plan
        assert "CartesianProduct" not in plan
        assert "Scan parquet" in plan

    def test_winnow_matches_is_fingerprint_equi_join(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "winnow_matches")
        # candidates come from ONE equi-join on the fingerprint key —
        # never a doc x doc comparison
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestRound7Contracts:
    def test_partition_evolution_union_per_spec_prune(self, spark, sf_dir):
        """The evolved read is a UNION of per-spec scans: the old-spec
        slice carries the filter as PartitionFilters (file-index prune),
        the new-spec slice pushes it to parquet on the data column, and
        the union introduces no exchange."""
        plan = _plan(spark, sf_dir, "partition_evolution_fetch")
        assert "Union" in plan
        m = re.search(r"PartitionFilters: \[([^\]]*o_orderpriority[^\]]*)\]", plan)
        assert m, "old-spec slice lost its PartitionFilters prune"
        assert re.search(
            r"PushedFilters: \[[^\]]*EqualTo\(o_orderpriority", plan
        ), "new-spec slice lost its parquet pushdown"
        assert "Exchange" not in plan, "a spec-union read must not shuffle"

    def test_domain_cap_narrow_window_and_key_join(self, spark, sf_dir):
        """The cap's row_number window partitions on the derived domain
        over a narrow projection; the payload returns via a key equi-join
        — and the text column never reaches the winner branches."""
        plan = _plan(spark, sf_dir, "domain_cap_select")
        assert "Window" in plan
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        assert sum("text" in s for s in schemas) <= 1, (
            "payload leaked into a winner branch"
        )
        assert "CartesianProduct" not in plan


def test_zonemap_fetch_prunes_before_the_file_index(spark, sf_dir):
    """The zone-mapped value-column range filter must never appear as a
    partition predicate; the scan's file index must already be smaller
    than the manifest (driver-side skipping), and the exact predicate
    must ride as a pushed row filter."""
    from s3parq_spark import metadata
    from s3parq_spark.workload_ext2 import _zonemap_fixture

    plan = _plan(spark, sf_dir, "zonemap_fetch")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "l_linestatus" in m.group(1)
    assert "l_orderkey" not in m.group(1)
    assert re.search(r"PushedFilters: \[[^\]]*l_orderkey", plan)
    n_index = len(QUERIES["zonemap_fetch"](spark, sf_dir).inputFiles())
    meta = metadata.read_sidecar(spark, _zonemap_fixture(spark, sf_dir))
    assert n_index < len(meta.manifest_files())


def test_pagerank_no_cartesian_no_collect_shape(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pagerank_graph")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-20 never a global sort
    # per-iteration aggregates are hash aggregates over the node key
    assert plan.count("HashAggregate") >= 6


def test_mor_delete_union_keeps_per_slice_scan(spark, sf_dir):
    """The tombstoned era carries the NOT(pred) row filter; the
    post-tombstone era scans clean; both slices stay parquet scans under
    one Union (no shuffle introduced by the delete)."""
    plan = _plan(spark, sf_dir, "mor_delete_fetch")
    assert "Union" in plan
    assert "o_totalprice" in plan and "Exchange" not in plan.split(
        "Union", 1
    )[1], "merge-on-read union must not introduce an exchange"


def test_bloom_fetch_prunes_before_the_file_index(spark, sf_dir):
    """The key probe must never be a partition predicate; the scan's file
    index must already be fingerprint-pruned below the manifest; the
    exact IN predicate rides as a pushed row filter into the survivors."""
    from s3parq_spark import metadata
    from s3parq_spark.workload import _ds_path

    plan = _plan(spark, sf_dir, "bloom_point_fetch")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert "l_orderkey" not in (m.group(1) if m else "")
    assert re.search(r"PushedFilters: \[[^\]]*In\(l_orderkey", plan)
    n_index = len(QUERIES["bloom_point_fetch"](spark, sf_dir).inputFiles())
    meta = metadata.read_sidecar(spark, _ds_path(sf_dir, "li_bloom"))
    assert n_index < len(meta.manifest_files())


def test_funnel_single_shuffle_of_the_event_log(spark, sf_dir):
    """Every running-min window phase and the per-user aggregate ride ONE
    hashpartitioning exchange on user_id; the global fold is a 1-row
    SinglePartition side show; no joins anywhere."""
    plan = _plan(spark, sf_dir, "funnel_events")
    assert plan.count("hashpartitioning(user_id") <= 1
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 3


def test_hybrid_rrf_rankers_bound_the_fusion(spark, sf_dir):
    """Corpus-scale work stays inside the rankers: BM25 ends in a
    TakeOrderedAndProject(limit=20) and the cosine side broadcasts its
    1-row query; the fusion's single-partition windows sit above LIMITed
    inputs only (bounded by construction)."""
    plan = _plan(spark, sf_dir, "hybrid_search_rrf")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("row_number") == 2


def test_mor_upsert_era_antijoin_no_rewrite(spark, sf_dir):
    """The OLD era anti-joins the eq-delete key files as a broadcast
    (no shuffle of the data side), newer eras scan clean under one
    Union; no rewrite machinery anywhere in the read plan."""
    plan = _plan(spark, sf_dir, "mor_upsert_fetch")
    assert "LeftAnti" in plan and "BroadcastExchange" in plan
    assert "Union" in plan
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(o_orderkey" not in plan, (
        "the eq-delete anti-join must broadcast the bounded key side, "
        "never shuffle the data side on the key"
    )


def test_ivf_probe_prunes_cells_scores_as_projection(spark, sf_dir):
    """The ANN probe (r11 ivf_index_append) must prune at the FILE INDEX
    on the cell partition — non-probed cells cost zero I/O — and score
    as a pure projection: no join and no shuffle below the final top-k
    (the removal tombstone is a row filter on the pre-removal eras, not
    a join)."""
    plan = _plan(spark, sf_dir, "ivf_index_append")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:800]
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_capped_search_reads_live_postings_only(spark, sf_dir):
    """A max_df search (r11) must read the LIVE index alone: the stopped
    sibling and the forward table are maintenance-plane datasets and
    must appear NOWHERE in the search plan — that absence IS the cap's
    query-time win (stop terms cost nothing). Bucket pruning unchanged."""
    plan = _plan(spark, sf_dir, "text_index_maxdf_maintain")
    assert "_stopped" not in plan and "_fwd" not in plan
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1)
    assert "CartesianProduct" not in plan


def test_stream_indexed_search_plan_is_batch_identical(spark, sf_dir):
    """stream_index_docs (r12): the steady-state search over a
    STREAM-maintained index must be the same bucket-pruned, term-pushed
    scan a batch-built index serves — the landing dir, checkpoint, and
    foreachBatch plumbing appear nowhere, and the cap companions stay
    out of the query plane. Streaming ingestion costs the query plan
    nothing."""
    plan = _plan(spark, sf_dir, "stream_index_docs")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:800]
    assert "In(term" in plan
    assert "_stopped" not in plan and "_fwd" not in plan
    assert "StreamingRelation" not in plan and "checkpoint" not in plan
    assert "CartesianProduct" not in plan


def test_pq_refine_is_bounded_point_fetch_no_shuffle(spark, sf_dir):
    """pq_refine_search (r12): the refine phase must be ONE bounded
    point-fetch of the k*f ADC candidates' true vectors — id IN (...)
    pushed into the companion scan (bloom-pruned at the file index) —
    re-ranked as a projection: no join, no shuffle, never a corpus
    scan."""
    plan = _plan(spark, sf_dir, "pq_refine_search")
    assert "In(vec_id" in plan, plan[:800]
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # candidate re-rank shuffles nothing
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_stream_upserted_index_refine_has_one_era_per_commit(spark, sf_dir):
    """ann_stream_upsert (r12): the post-CDC refine reads the companion
    eras as a union — ONE branch per committed batch (the ledger-skipped
    replay adds none) — with upsert tombstones as row-level NOT-IN
    filters, candidates pushed as id IN (...), and no shuffle below the
    top-k."""
    plan = _plan(spark, sf_dir, "ann_stream_upsert")
    assert "In(vec_id" in plan, plan[:800]
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan
    assert "StreamingRelation" not in plan


def test_incremental_analyze_serves_metadata_only(spark, sf_dir):
    """incremental_analyze (r13): the SERVED stats read is the sidecar
    record alone — the returned plan must contain NO parquet scan of
    the analyzed dataset (that is the whole point of the stats plane:
    collect once, answer from metadata forever)."""
    plan = _plan(spark, sf_dir, "incremental_analyze")
    assert "Scan parquet" not in plan, plan[:800]
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan


def test_rebuilt_index_search_plan_is_fresh_build_identical(spark, sf_dir):
    """ann_rebuild_search (r13): a search over the REBUILT family must
    be the same plan a fresh build serves — cell partition pruning at
    the file index, candidates pushed as id IN (...) into the
    companion, exact re-rank as a projection (no join, no shuffle
    below the top-k), and none of the rebuild's temp/parked paths
    anywhere (the swap left no plan residue)."""
    plan = _plan(spark, sf_dir, "ann_rebuild_search")
    assert "In(vec_id" in plan, plan[:800]
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert ".rebuilding" not in plan and ".prerebuild" not in plan


def test_maintained_family_search_pays_no_mor_tax(spark, sf_dir):
    """maintain_ann_family (r13): after the policy loop's family
    compaction the search plan must carry NO merge-on-read residue —
    no era anti-join filters (the tombstones were materialized), one
    clean bounded point-fetch for refine, no shuffle below the
    top-k. This absence IS the compaction's query-time win."""
    plan = _plan(spark, sf_dir, "maintain_ann_family")
    assert "In(vec_id" in plan, plan[:800]
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan
    # materialized debt: no NOT-IN tombstone filters survive the rewrite
    assert "Not(In(vec_id" not in plan, plan[:800]


def test_maintained_plain_dataset_stats_serve_metadata_only(spark, sf_dir):
    """maintain_plain_dataset (r14): the gate's returned frame is the
    STORED ANALYZE record plus a fetch aggregate over the compacted
    dataset — the stats rows must come from the sidecar (no second
    parquet scan for them), and the one data scan that remains is the
    fetch half of the contract. At most one scan of the maintained
    dataset may appear in the plan."""
    plan = _plan(spark, sf_dir, "maintain_plain_dataset")
    assert plan.count("Scan parquet") <= 1, plan[:1200]
    # the stats half is driver-materialized rows
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan


def test_drift_rebuilt_search_plan_is_fresh_build_identical(spark, sf_dir):
    """maintain_drift_rebuild (r14): after the policy loop's
    retrain-and-swap the flat-index search must be the plan a fresh
    build serves — cell partition pruning at the file index, scoring
    as a projection, zero Exchange below the top-k, and none of the
    rebuild's temp/parked paths anywhere."""
    plan = _plan(spark, sf_dir, "maintain_drift_rebuild")
    assert "TakeOrderedAndProject" in plan, plan[:800]
    assert "Exchange" not in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert ".rebuilding" not in plan and ".prerebuild" not in plan


def test_repaired_crash_family_search_plan_is_clean(spark, sf_dir):
    """text_crash_repair_search (r15): after the manufactured crash
    window is refused and repaired, the served search must be the
    STANDARD capped-index shape — bucket pruning at the file index,
    term equality pushed, live postings only (the stopped sibling whose
    list was double-resident moments earlier appears nowhere), no
    Cartesian — i.e. the repair converges the PLAN, not just the
    values."""
    plan = _plan(spark, sf_dir, "text_crash_repair_search")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:800]
    assert "In(term" in plan
    assert "_stopped" not in plan and "_fwd" not in plan
    assert "CartesianProduct" not in plan


def test_spilled_partition_stats_serve_metadata_only(spark, sf_dir):
    """partition_stats_spilled (r15): the stats half of the gate's
    output is read back THROUGH the manifest pointer — driver-side
    columnar read, no Spark scan — so the only parquet scan in the
    plan is the fetch half's single scan of the compacted dataset. The
    spilled representation must cost the query plane nothing."""
    plan = _plan(spark, sf_dir, "partition_stats_spilled")
    assert plan.count("Scan parquet") <= 1, plan[:1200]
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
