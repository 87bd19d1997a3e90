"""Stage-level accounting INSIDE the headline publish's Spark write job
(r15 — VERDICT r14 #4): the phase table showed publish is >=94% the
`writer.parquet` call itself, so the next second lives INSIDE the job.
This drops one level down: run the cold `_li_flag_ds` publish (the bench
`publish` entry) and pull the per-stage task metrics from the Spark UI
REST API — task counts, executor run/CPU time, GC, shuffle bytes, output
bytes/records — plus the resulting file geometry, and derive where the
wall time actually goes:

- `cpu_frac` ~ 1.0 with run-time ~ wall*cores => irreducible codec/
  encode work (snappy + parquet encoding), nothing left to schedule
  away;
- run-time << wall*cores => scheduling gaps / too few tasks for the
  cores (fan-out geometry is the lever);
- high shuffle time => the AQE rebalance exchange is the cost, not the
  file write.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
       python scripts/publish_write_stage_profile.py
"""

import json
import os
import re
import shutil
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


def _stage_rows(spark, after_stage_id):
    rows = [
        st for st in _rest(spark, "/stages?status=complete")
        if st["stageId"] > after_stage_id
    ]
    return sorted(rows, key=lambda s: s["stageId"])


def _max_stage_id(spark):
    ids = [st["stageId"] for st in _rest(spark, "/stages")]
    return max(ids) if ids else -1


def profile(spark, label, fn):
    mark = _max_stage_id(spark)  # stage-id watermark: exact attribution
    t0 = time.time()
    fn()
    wall = time.time() - t0
    time.sleep(0.5)  # let the UI ingest the last stage
    rows = _stage_rows(spark, mark)
    cores = spark.sparkContext.defaultParallelism
    print(f"\n== {label}: wall {wall:.2f}s, {len(rows)} stages, "
          f"{cores} cores ==")
    hdr = (f"{'stage':>5} {'tasks':>5} {'run_s':>7} {'cpu_s':>7} "
           f"{'gc_s':>5} {'shW_MB':>7} {'shR_MB':>7} {'out_MB':>7} "
           f"{'recs':>9}  name")
    print(hdr)
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
              f"{st.get('outputBytes', 0) / 1e6:7.1f} "
              f"{st.get('outputRecords', 0):>9} "
              f" {st.get('name', '')[:48]}")
    eff = tot_run / (wall * cores) if wall else 0.0
    cpu_frac = tot_cpu / tot_run if tot_run else 0.0
    print(f"sum executorRunTime {tot_run:.2f}s = {eff:.0%} of "
          f"wall*cores ({wall:.2f}s * {cores}); cpu/run = {cpu_frac:.0%}")
    return wall, rows


def _spark_with_ui():
    """get_spark's exact tuning, but with the UI on — the REST status
    API is the stage-metrics source and rides the UI server."""
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName("publish_stage_profile")
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
    spark = _spark_with_ui()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    key = re.sub(r"[^A-Za-z0-9_.-]", "_", sf_dir.strip("/"))

    def cold_publish():
        shutil.rmtree(os.path.join(workload._CACHE_ROOT, key),
                      ignore_errors=True)
        workload._li_flag_ds(spark, sf_dir)

    # min-of-3 cold publishes, stage table from the LAST (repr.) run
    walls = []
    for i in range(3):
        wall, rows = profile(spark, f"publish cold run {i + 1}",
                             cold_publish)
        walls.append(wall)
    print(f"\ncold publish walls: {[round(w, 2) for w in walls]} "
          f"(min {min(walls):.2f}s)")

    # resulting file geometry of the headline dataset
    ds = workload._li_flag_ds(spark, sf_dir)
    sizes = []
    for dirpath, _dn, fns in os.walk(ds):
        for f in fns:
            if f.endswith(".parquet"):
                sizes.append(os.path.getsize(os.path.join(dirpath, f)))
    if sizes:
        print(f"file geometry: {len(sizes)} files, "
              f"total {sum(sizes) / 1e6:.1f} MB, "
              f"avg {sum(sizes) / len(sizes) / 1e6:.2f} MB, "
              f"min {min(sizes) / 1e6:.2f} MB, max {max(sizes) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
