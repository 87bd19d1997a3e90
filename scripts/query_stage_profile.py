"""Stage-level accounting for arbitrary headline queries (r15
optimization round): run a workload query N times, pull per-stage task
metrics from the UI REST API with a stage-id watermark (the
publish_write_stage_profile.py pattern), and print where the wall time
goes — per-stage run/cpu/GC, shuffle bytes, and the job count. The two
near-dup pair queries are the default targets (the largest read entries).

Usage: python scripts/query_stage_profile.py [query ...]
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3parq_spark import workload  # noqa: E402


def _rest(spark, suffix):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{suffix}") as r:
        return json.loads(r.read().decode())


def profile(spark, label, fn, runs=3):
    best_wall = None
    for i in range(runs):
        mark_ids = [st["stageId"] for st in _rest(spark, "/stages")]
        mark = max(mark_ids) if mark_ids else -1
        t0 = time.time()
        fn()
        wall = time.time() - t0
        if best_wall is None or wall < best_wall:
            best_wall, best_mark = wall, mark
    time.sleep(0.5)
    rows = sorted(
        (st for st in _rest(spark, "/stages?status=complete")
         if st["stageId"] > best_mark),
        key=lambda s: s["stageId"],
    )
    cores = spark.sparkContext.defaultParallelism
    print(f"\n== {label}: best wall {best_wall:.3f}s over {runs} runs "
          f"(stage table from the run after watermark {best_mark}) ==")
    print(f"{'stage':>5} {'tasks':>5} {'run_s':>7} {'cpu_s':>7} {'gc_s':>5} "
          f"{'shW_MB':>7} {'shR_MB':>7} {'in_MB':>7} {'recs':>9}  name")
    tot_run = tot_cpu = 0.0
    for st in rows:
        run = st.get("executorRunTime", 0) / 1000.0
        cpu = st.get("executorCpuTime", 0) / 1e9
        gc = st.get("jvmGcTime", 0) / 1000.0
        tot_run += run
        tot_cpu += cpu
        print(f"{st['stageId']:>5} {st.get('numCompleteTasks', 0):>5} "
              f"{run:7.2f} {cpu:7.2f} {gc:5.2f} "
              f"{st.get('shuffleWriteBytes', 0) / 1e6:7.1f} "
              f"{st.get('shuffleReadBytes', 0) / 1e6:7.1f} "
              f"{st.get('inputBytes', 0) / 1e6:7.1f} "
              f"{st.get('inputRecords', 0):>9} "
              f" {st.get('name', '')[:44]}")
    eff = tot_run / (best_wall * cores) if best_wall else 0.0
    print(f"sum run {tot_run:.2f}s = {eff:.0%} of wall*cores; "
          f"stages {len(rows)}")


def _spark_with_ui():
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName("query_stage_profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
        .config("spark.ui.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or ["neardup_jaccard", "minhash_pairs"]
    spark = _spark_with_ui()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    for name in names:
        fn = workload.QUERIES[name]
        fn(spark, sf_dir).count()  # warm (fixture build etc.)
        profile(spark, name, lambda: fn(spark, sf_dir).count())


if __name__ == "__main__":
    main()
