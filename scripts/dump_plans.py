"""Regenerate PLANS.md: physical-plan evidence for the scale-critical
queries, with one line on what each plan must show. Run from the repo root:

    python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = [
    (
        "fetch_filter_eq",
        "Partition pruning: the filter must appear as PartitionFilters on the "
        "scan (file-index prune, zero data I/O for pruned partitions), and "
        "ReadSchema shows column pruning.",
    ),
    (
        "pricing_summary",
        "Q1 shape: the date predicate is a PushedFilter (row-group level), "
        "partial aggregation (HashAggregate x2) around one shuffle, "
        "whole-stage codegen spans the scan->agg pipeline.",
    ),
    (
        "top_revenue_orders",
        "Q3 shape: the customer dim is BroadcastHashJoin (no shuffle of the "
        "fact side for it); final ordering is TakeOrderedAndProject, never a "
        "global Sort.",
    ),
    (
        "band_join",
        "Range join against a 3-row dim: BroadcastNestedLoopJoin BuildRight "
        "- broadcasting the dim is the only plan that avoids shuffling the "
        "fact table for a theta-join.",
    ),
    (
        "order_priority_exists",
        "Correlated EXISTS: planned as LeftSemi BroadcastHashJoin with the "
        "non-equi date term as the join residual; no decorrelation "
        "machinery, no duplicate-producing inner join.",
    ),
    (
        "brand_size_revenue",
        "Q19 shape: the OR-of-ranges splits - equi key joins, the residual "
        "stays in the join condition, and the inferred per-side bounds "
        "(l_quantity between 1 and 30) are pushed into the fact scan.",
    ),
    (
        "neardup_jaccard",
        "Prefix-filtered set-similarity join: exchanges are on the 8-byte "
        "hash prefix key and the distinct candidate pairs only; the exact "
        "verify is a join on doc id, no cross join anywhere.",
    ),
    (
        "ann_topk",
        "Brute-force cosine: one scan + TakeOrderedAndProject (per-partition "
        "top-k, k-row merge); the query vector is a broadcast.",
    ),
    (
        "fetch_diff",
        "Dataset anti-join: LeftAnti BroadcastHashJoin - the distinct "
        "partition-value side broadcasts, the big side streams through "
        "with no shuffle.",
    ),
    (
        "interval_join",
        "Big-big range join: bucketized to an equi-join on (key, bucket) "
        "with the interval predicate as residual - SortMergeJoin/HashJoin, "
        "never BroadcastNestedLoop or Cartesian.",
    ),
    (
        "asof_clicks",
        "As-of join: ONE shuffle-sort on (key, ts) and a carry-forward "
        "window - no range explosion; the single Sort+Window pair is the "
        "whole cost.",
    ),
    (
        "tf_idf_top_terms",
        "TF-IDF: partial aggregation on (doc, term), a second agg on term, "
        "one equi-join, then a per-doc window top-k - every exchange is on "
        "a key; no global sort, no collect.",
    ),
    (
        "stratified_sample",
        "Deterministic sampling: a pure Filter over the scan (hash "
        "arithmetic in the predicate) - no shuffle, no sample() RNG node; "
        "composes with partition pruning.",
    ),
    (
        "dedup_incremental",
        "Incremental corpus dedup: LeftAnti join on the md5 fingerprint "
        "(fixed-width key), broadcast when the corpus side is small - the "
        "batch never shuffles its payload columns.",
    ),
    (
        "volume_shipping",
        "Q7 shape: nation-filtered supplier/customer dims broadcast into the "
        "fact; the only potential shuffle join is lineitem-orders on the "
        "order key; the nation-pair disjunction is a post-join Filter, "
        "never a cartesian.",
    ),
    (
        "ngram_contamination",
        "Contamination check: both corpus halves reduce to DISTINCT shingles "
        "before ONE equi-join on the shingle string; the pair output dedups "
        "on (train_doc, bench_doc) - no cross join at any stage.",
    ),
    (
        "knn_graph",
        "kNN graph: label-blocked equi-join candidates, per-vector "
        "row_number window over (cosine desc, id) - the window partitions "
        "by vec_id so ranking is a per-key sort, not a global one.",
    ),
    (
        "embedding_centroids",
        "Per-label centroids: posexplode then ONE (label,pos) hash "
        "aggregate with map-side partials; output stays as rows - no "
        "array reassembly, no driver-side matrix.",
    ),
    (
        "pack_sequences",
        "Sequence packing: the running-offset window partitions by the "
        "portable hash bucket (Exchange on bucket, per-bucket Sort) - "
        "parallel across buckets, never a single global ordered cumsum.",
    ),
    (
        "fuzzy_titles",
        "FastSS fuzzy matching: variant expansion feeds ONE equi-join on the "
        "64-bit variant hash (Exchange on __vh, SortMergeJoin/ShuffledHashJoin) "
        "- no CartesianProduct, no BroadcastNestedLoop; levenshtein verify "
        "runs post-join as a codegen filter.",
    ),
    (
        "user_skew",
        "Heavy-hitter top-k: hash-agg counts then TakeOrderedAndProject "
        "(per-partition heaps) - no global Sort; the total is a 1-row "
        "broadcast, not a driver collect.",
    ),
    (
        "weekly_cohorts",
        "Cohort retention: cohort min-agg and the join-back both hash-"
        "partition on user_id (the aggregate side reuses its partitioning), "
        "then one distinct-count Expand aggregate.",
    ),
    (
        "shingle_index",
        "Inverted index: per-doc-distinct shingles dedup BEFORE the exchange "
        "(partial aggregate under the shuffle), posting lists built by "
        "collect_set inside one hash aggregate.",
    ),
    (
        "ann_batch_topk",
        "Batch ANN: ONE corpus scan, the N-row query batch broadcast "
        "(BroadcastNestedLoopJoin BuildRight), and per-query ranking as "
        "WindowGroupLimit with a Partial (map-side) pass under the "
        "query_id exchange - no driver loop, no SortMergeJoin, no global "
        "sort.",
    ),
    (
        "fuzzy_titles_d2",
        "Radius-2 FastSS: the recursed deletion neighborhood still feeds "
        "ONE equi-join on the 64-bit variant hash - variant count grows "
        "L^2 but the join stays hash-partitioned; no CartesianProduct, "
        "no BroadcastNestedLoop.",
    ),
    (
        "catalog_join",
        "Catalog sweep: both sides are metastore tables; the "
        "l_linestatus = 'F' predicate prunes at the catalog partition "
        "level (PartitionFilters on the li_flag scan), and the by-name "
        "join is a plain equi-join on l_orderkey - the catalog path adds "
        "zero plan overhead over fetch_path.",
    ),
    (
        "ivf_topk",
        "IVF ANN with the kmeans quantizer: index build is bounded "
        "driver-side work (k x dim matrix); the probed-cell filter is a "
        "codegen'd isin over the assigned cell - the corpus scan never "
        "materializes non-probed cells past the filter, and at ingest "
        "time the same assignment partitions the corpus for file-level "
        "pruning.",
    ),
    (
        "bm25_search",
        "BM25: the query-term isin filter sits UNDER the tf aggregate's "
        "exchange (only matching tokens shuffle); N/avgdl is a 1-row "
        "BroadcastExchange; final ranking is TakeOrderedAndProject, "
        "never a global Sort.",
    ),
    (
        "ngram_lm_quality",
        "Bigram LM scoring: two hash aggregates build the model (bigram "
        "and unigram counts); scoring joins on the bigram key then w1, "
        "vocabulary V is a 1-row broadcast, and the per-doc mean is one "
        "hash aggregate - every exchange is on a key, no cartesian.",
    ),
    (
        "stratified_fixed_n",
        "Exact-N stratified sampling: ONE exchange on the stratum key and "
        "a per-stratum WindowGroupLimit with a Partial (map-side) top-N "
        "under it - never a global sort; output bounded at N per stratum.",
    ),
    (
        "doc_dup_ngrams",
        "Duplicated-n-gram ratio: shingle explode feeds one hash "
        "aggregate on the n-gram (document frequency), one join-back on "
        "the same key, one per-doc aggregate - no distinct-expand, no "
        "cross join.",
    ),
    (
        "ivf_batch_topk",
        "Batch IVF: per-query probe selection is a codegen'd array-sort "
        "projection (no driver collect of query vectors); candidates come "
        "from ONE equi-join on the probed cell with the query x probe "
        "pairs broadcast; per-query WindowGroupLimit ranks - no cartesian "
        "against the corpus.",
    ),
    (
        "schema_evolution_fetch",
        "Evolved-schema fetch: ONE FileScan over both publish generations "
        "with the merged sidecar ReadSchema - the missing column in "
        "pre-evolution files materializes as NULL inside the scan, no "
        "per-generation union in the plan.",
    ),
    (
        "sorted_publish_fetch",
        "Clustered publish read: l_linestatus=F appears as PartitionFilters "
        "(partition pruning) and the l_shipdate range as PushedFilters on "
        "the scan - with sort_within_files the files' min/max stats on "
        "l_shipdate are disjoint ranges, so the pushed range skips whole "
        "row groups/files instead of filtering rows.",
    ),
    (
        "ivf_pruned_topk",
        "IVF at rest: the corpus scan's PartitionFilters shows 'cell INSET "
        "<probed cells>' (plus a dynamicpruning expression from the "
        "broadcast probe join) - the file index keeps only the probed "
        "cells' files, so the query reads n_probe/n_cells of the corpus "
        "through the engine's own pruning, not a post-scan filter.",
    ),
    (
        "pq_topk",
        "PQ asymmetric-distance search: encode + ADC score is a single "
        "Project over the corpus scan (codebooks are literal arrays), the "
        "1-row query is the only BroadcastExchange, ranking is "
        "TakeOrderedAndProject - zero shuffles end to end.",
    ),
    (
        "bucketed_join",
        "Pre-shuffled co-located join: both scans read bucketed files "
        "(SelectedBucketsCount), SortMergeJoin with NO Exchange below it - "
        "the shuffle was paid once at write time.",
    ),
    (
        "quality_classifier",
        "Hashed linear model: one Project over the scan - per-token "
        "bucket/weight/logit are array expressions, no UDF, no join, no "
        "shuffle; the only Exchange would be absent entirely.",
    ),
    (
        "shipping_priority_split",
        "Q12 shape: shipdate range is a PushedFilter on the lineitem scan, "
        "orders broadcasts, CASE-counting rides the single group-key "
        "exchange.",
    ),
    (
        "temperature_mix",
        "Temperature mixing: the counts aggregate is one small job; the "
        "replication itself is Generate(explode) over a Project - a 1->N "
        "flatMap with no shuffle.",
    ),
    (
        "fetch_changes",
        "CDC delta read: the scan's file index holds ONLY the delta "
        "manifest's files (InMemoryFileIndex path count = files added in "
        "the version range), with PartitionFilters still applied on top.",
    ),
    (
        "dsir_select",
        "DSIR importance weights: the bucket table aggregate is "
        "n_buckets-bounded with map-side partials; totals (1 row) and the "
        "lambda table are BroadcastHashJoins back onto the n-gram stream - "
        "the corpus shuffles only on bucket and doc id; final ranking is "
        "TakeOrderedAndProject, no cartesian.",
    ),
    (
        "quantized_rescore",
        "Two-stage ANN: stage 1 broadcasts the quantized query batch over "
        "one corpus scan (BroadcastNestedLoopJoin of an 8-row frame); both "
        "rankings are WindowGroupLimit; stage 2 re-joins the candidate set "
        "by BroadcastHashJoin - the vector table is never reshuffled.",
    ),
    (
        "span_dedup",
        "Exact substring dedup: gram generation is array-side (no per-doc "
        "window sort); duplicate set is one fingerprint HashAggregate; "
        "coverage join and reassembly are keyed hash joins/aggregates - no "
        "cartesian, no BroadcastNestedLoopJoin.",
    ),
    (
        "containment_dedup",
        "Containment near-dup: asymmetric prefix filter - small side "
        "explodes its sorted-hash prefix, big side full index; candidates "
        "are a shingle-hash equi-join; exact array_intersect verify on "
        "distinct candidates only.",
    ),
    (
        "corpus_overlap",
        "Corpus overlap: corpus collapses to a distinct (group, shingle) "
        "table; exact intersection joins on the shingle key (never doc x "
        "doc); signatures are one-pass min-aggregates and the pair spine "
        "is a broadcast of O(groups) frames.",
    ),
    (
        "hidden_pushdown_fetch",
        "Transform-predicate pushdown: the filter names ts only, yet the "
        "scan's PartitionFilters carries the derived event_day bound "
        "(file-index prune from the recorded transform) with the exact ts "
        "predicate as a row-level Filter above it.",
    ),
    (
        "pq_batch_topk",
        "Batch ADC PQ: one plan for N queries - the broadcast query frame "
        "carries per-query ADC lookup tables (computed JVM-side in the "
        "query row), pairwise scoring is m array lookups with zero dot "
        "products, ranking is the per-query WindowGroupLimit; no "
        "cartesian, single corpus scan.",
    ),
    (
        "ivf_pq_batch_topk",
        "Batch IVF-PQ: per-query probe cells AND ADC lookup tables both "
        "live in the broadcast query frame; candidates come from the "
        "(probe cell = assigned cell) BroadcastHashJoin - the corpus is "
        "never reshuffled and raw vectors are never read at query time.",
    ),
    (
        "partition_evolution_fetch",
        "Partition-evolved read: a Union of per-spec scans - the old "
        "spec's slice carries the o_orderpriority predicate as "
        "PartitionFilters (file-index prune under its layout), the new "
        "spec's slice applies it as a DataFilter/PushedFilter on the data "
        "column - no shuffle introduced by the union, zero data movement "
        "at evolution time.",
    ),
    (
        "domain_cap_select",
        "Per-domain cap: the row_number Window partitions on the derived "
        "domain over a NARROW (key, domain) projection (ReadSchema on the "
        "winner side excludes text); full rows return via a key equi-join "
        "- the Zipf-skewed domain never routes the payload.",
    ),
    (
        "zonemap_fetch",
        "Zone-map fetch: the scan's file list is ALREADY driver-pruned to "
        "the surviving files (the l_orderkey range filter appears only as "
        "a PushedFilter/row filter - never as a partition predicate); "
        "PartitionFilters carries the l_linestatus prune; skipped files "
        "appear nowhere in the plan.",
    ),
    (
        "pagerank_graph",
        "PageRank: per iteration one src-keyed join + one dst-keyed "
        "HashAggregate (partial+final around a single node-key exchange); "
        "the degree table is joined once onto the edge list, never per "
        "round; no CartesianProduct, no driver collect of ranks.",
    ),
    (
        "bloom_point_fetch",
        "Bloom point fetch: the scan's file list is ALREADY driver-pruned "
        "by the per-file fingerprints (the key probe appears only as a "
        "PushedFilter/row filter - min/max could never prune this "
        "ingest-ordered layout); skipped files appear nowhere in the plan.",
    ),
    (
        "funnel_events",
        "Ordered funnel: ONE hashpartitioning exchange on user_id feeds "
        "every chained running-min Window phase and the per-user "
        "HashAggregate (stacked on a single Sort); the global stage fold "
        "is a 1-row side show - no self-joins, no second shuffle of the "
        "event log.",
    ),
    (
        "mor_upsert_fetch",
        "MoR upsert read: per-era union - the OLD era anti-joins the "
        "eq-delete key files (BroadcastHashJoin LeftAnti: the key side "
        "is a bounded CDC batch, broadcast from recorded sizes), newer "
        "eras scan clean; no shuffle of the data side, no rewrite "
        "anywhere in the plan.",
    ),
    (
        "text_index_search",
        "Index-at-rest BM25: ONE term filter - hidden-partition pushdown "
        "prunes the scan to the query terms' buckets (the InMemoryFileIndex "
        "path count is the pruned set, bloom-skipped within buckets); "
        "df_t and the ranking run over the tiny posting slice; the corpus "
        "appears nowhere in the plan.",
    ),
    (
        "hybrid_search_rrf",
        "Hybrid RRF: corpus-scale work is inside the rankers (BM25: "
        "term-keyed partial aggregates + TakeOrderedAndProject; cosine: "
        "one scan with the 1-row query broadcast); the fusion windows run "
        "over two 20-row lists - the single-partition exchange is bounded "
        "by construction, never corpus-sized.",
    ),
    (
        "text_index_reindex",
        "Reindexed search (r10): same plan contract as text_index_search — "
        "bucket-pruned scan + bloom skip — now over a dataset with a "
        "pending eq-delete: the pre-reindex era anti-joins the doc-id key "
        "frame (BroadcastHashJoin LeftAnti, key side = the changed-doc "
        "batch) and the reindex era scans clean; the corpus and the "
        "unchanged postings appear nowhere.",
    ),
    (
        "events_stream_upsert",
        "Streamed mirror read (r10): per-era union of the bootstrap scan "
        "anti-joined against the stream batch's eq-delete keys (broadcast "
        "from recorded sizes) plus the batch's row images; one row per "
        "user by construction — no window, no global sort, no rewrite.",
    ),
    (
        "stream_upsert_exactly_once",
        "Exactly-once mirror read (r11): the crash-replayed batch was "
        "SKIPPED by the txn ledger, so the plan is identical to "
        "events_stream_upsert — one bootstrap era + ONE eq-delete era "
        "(no duplicate snapshot union branch), keys broadcast.",
    ),
    (
        "text_index_maxdf_maintain",
        "Capped-index search after full maintenance (r11): the SAME "
        "bucket-pruned + bloom-skipped scan shape as every index search "
        "— the stopped sibling and the forward table appear NOWHERE in "
        "the plan (search reads live postings only; the cap's companions "
        "are maintenance-plane datasets). Pending eq-deletes/tombstones "
        "from the maintenance ops anti-join/filter per era, key frames "
        "broadcast.",
    ),
    (
        "ivf_index_append",
        "ANN probe over the maintained index (r11): PartitionFilters on "
        "cell at the FileScan (the probe prunes at the file index — "
        "non-probed cells cost zero I/O), appended files inside the "
        "probed cells scan in the same node, the removal tombstone is a "
        "row-level filter on the pre-removal eras, and scoring is a "
        "projection (no join, no shuffle before TakeOrderedAndProject).",
    ),
    (
        "stream_index_docs",
        "Steady-state search over the STREAM-maintained text index "
        "(r12): the landing directory, checkpoint, and foreachBatch "
        "plumbing appear NOWHERE — the plan is the same bucket-pruned "
        "(PartitionFilters on bucket) + term-pushed (PushedFilters In("
        "term,...)) BM25 scan a batch-built index serves; the CDC "
        "reindex waves surface only as per-era eq-delete anti-joins "
        "(keys broadcast) pending compaction. Streaming ingestion "
        "costs the QUERY plan nothing.",
    ),
    (
        "pq_refine_search",
        "PQ + exact refine (r12): two bounded phases — ADC ranks as a "
        "pure projection over the code columns inside the probed cells "
        "(PartitionFilters on cell; non-probed cells are zero I/O), "
        "then refine point-fetches the k*f candidates' TRUE vectors "
        "from the id-bloomed companion (id IN (...) pushed to its "
        "scan, O(candidate files) via the blooms) and re-ranks exact "
        "cosine. Never a corpus scan; the candidate list is the only "
        "driver-side state (bounded k*f).",
    ),
    (
        "ann_stream_upsert",
        "Post-CDC probe over the streaming-upserted IVF index (r12): "
        "PartitionFilters on cell at the FileScan; re-arrived (negated) "
        "vectors scan in their NEW cells only; the upsert tombstones "
        "are row-level NOT-IN filters on pre-upsert eras. Exactly-once "
        "is an ABSENCE in the plan — the txn-ledger-skipped replay adds "
        "no duplicate era, so the union has exactly one branch per "
        "committed batch.",
    ),
    (
        "ann_rebuild_search",
        "Probe over the REBUILT family (r13 drift remedy): the plan must "
        "be fresh-build identical — PartitionFilters on cell, candidates "
        "pushed as id IN (...) into the companion point-fetch, exact "
        "re-rank as a projection with no Exchange below the top-k, and "
        "no .rebuilding/.prerebuild path residue (the swap left nothing "
        "in the read plane).",
    ),
    (
        "maintain_ann_family",
        "Probe after the POLICY LOOP's family compaction (r13): no "
        "merge-on-read residue survives — no NOT-IN tombstone filters, "
        "no era union branches beyond the compacted snapshot, one clean "
        "bounded refine point-fetch. The absence IS the maintenance "
        "win: every pre-compaction read paid those filters per probe.",
    ),
    (
        "incremental_analyze",
        "Served stats read (r13): LocalTableScan only — the record "
        "answers from the sidecar with ZERO parquet scans. The fold "
        "that produced it scanned the appended delta, not the table; "
        "min/max/n_nulls/row_count exact, NDV an HLL union estimate.",
    ),
    (
        "maintain_plain_dataset",
        "Nightly maintenance pass (r14): the stats half of the frame is "
        "driver-materialized sidecar rows (LocalTableScan); the ONE "
        "parquet scan is the post-compaction fetch proving the data "
        "plane agrees with the stats plane through the rewrite. The "
        "refresh that produced the record ran BEFORE the compaction — "
        "an O(delta) fold, then a provably-current restamp to v1.",
    ),
    (
        "maintain_drift_rebuild",
        "Search after the POLICY LOOP's drift-triggered retrain-and-swap "
        "(r14): byte-identical shape to a fresh build's flat search — "
        "cell partition pruning at the file index, cosine as a "
        "projection, TakeOrderedAndProject with zero Exchange below the "
        "top-k, and none of the rebuild's .rebuilding/.prerebuild paths "
        "in the plan (the two-rename swap left no residue).",
    ),
    (
        "text_crash_repair_search",
        "Search after the text family's manufactured crash window was "
        "REFUSED and repaired by the policy loop (r15): the standard "
        "capped-index shape — bucket PartitionFilters at the file "
        "index, term equality pushed (PushedFilters In(term)), live "
        "postings only (the stopped sibling whose list was "
        "double-resident appears nowhere), no Cartesian. The repair "
        "converges the PLAN, not just the values.",
    ),
    (
        "partition_stats_spilled",
        "Spilled partition-stats serve (r15): the stats half reads "
        "back THROUGH the columnar manifest pointer driver-side "
        "(LocalTableScan in the plan, zero parquet scans for it); the "
        "one scan is the fetch half of the data-plane agreement check. "
        "The sidecar stays O(1) at any combo count — the 100 TB "
        "date-by-domain layout costs the query plane nothing.",
    ),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from s3parq_spark.session import get_spark
    from s3parq_spark import workload

    spark = get_spark(app_name="dump_plans")
    out = [
        "# PLANS — physical-plan evidence (auto-generated by "
        "scripts/dump_plans.py)",
        "",
        f"Plans captured at `{sf_dir}`. Each section states what the plan "
        "must show for the operator to hold at scale; regenerate after any "
        "planner-relevant change.",
        "",
    ]
    for name, claim in CASES:
        df = workload.QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = re.sub(r"file:[^\],\s]*", "file:...", plan)  # strip local paths
        out.append(f"## {name}")
        out.append("")
        out.append(claim)
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"PLANS.md written ({len(CASES)} plans)")


if __name__ == "__main__":
    main()
