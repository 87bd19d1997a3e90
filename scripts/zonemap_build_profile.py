"""Phase + stage attribution for the zonemap fixture cold rebuild (the
bench `zonemap_build` probe): wraps the expensive publish internals with
wall-clock timers and prints the per-stage task metrics from the UI REST
API for one representative run.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
       python scripts/zonemap_build_profile.py
"""

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib

pub = importlib.import_module("s3parq_spark.publish")  # noqa: E402
meta_mod = importlib.import_module("s3parq_spark.metadata")  # noqa: E402


def _rest(spark, suffix):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{suffix}") as r:
        return json.loads(r.read().decode())


PHASES = []


def _wrap(mod, name):
    orig = getattr(mod, name)

    def timed(*a, **kw):
        t0 = time.time()
        try:
            return orig(*a, **kw)
        finally:
            PHASES.append((name, time.time() - t0))

    setattr(mod, name, timed)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.appName("zonemap_profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from s3parq_spark.workload_ext2 import _zonemap_fixture

    # warm: a REAL rebuild (the fixture may already exist as a cache hit)
    path = _zonemap_fixture(spark, sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    _zonemap_fixture(spark, sf_dir)

    for name in (
        "_collect_file_zone_stats",
        "_estimate_rows_per_file",
        "_small_file_split_count",
    ):
        if hasattr(pub, name):
            _wrap(pub, name)
    for name in ("write_sidecar", "append_manifest"):
        if hasattr(meta_mod, name):
            _wrap(meta_mod, name)

    shutil.rmtree(path, ignore_errors=True)
    mark = max([s["stageId"] for s in _rest(spark, "/stages")] or [-1])
    t0 = time.time()
    _zonemap_fixture(spark, sf_dir)
    wall = time.time() - t0
    time.sleep(0.5)

    print(f"\n== cold rebuild wall {wall:.2f}s ==")
    for name, dt in PHASES:
        print(f"  phase {name:>28}: {dt:6.2f}s")
    rows = sorted(
        [s for s in _rest(spark, "/stages?status=complete") if s["stageId"] > mark],
        key=lambda s: s["stageId"],
    )
    print(f"{'stage':>5} {'tasks':>5} {'run_s':>7} {'cpu_s':>7} {'out_MB':>7} {'recs':>9}  name")
    tot_run = 0.0
    for st in rows:
        run = st.get("executorRunTime", 0) / 1000.0
        tot_run += run
        print(
            f"{st['stageId']:>5} {st.get('numCompleteTasks', 0):>5} "
            f"{run:7.2f} {st.get('executorCpuTime', 0) / 1e9:7.2f} "
            f"{st.get('outputBytes', 0) / 1e6:7.1f} "
            f"{st.get('outputRecords', 0):>9} "
            f" {st.get('name', '')[:60]}"
        )
    print(f"sum executorRunTime {tot_run:.2f}s over {wall:.2f}s wall * {cpus} cores")
    spark.stop()


if __name__ == "__main__":
    main()
