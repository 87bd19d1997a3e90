"""Job-level inventory of ONE cold headline publish (_li_flag_ds): list
every Spark job it launches (description, duration, stage count) via the
UI REST API, so non-write jobs (sizing samples, empty checks, distinct
probes, listings) are visible by name.  Load-tolerant: job NAMES and
COUNTS are stable under host noise even when wall times are not.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
       python scripts/publish_job_inventory.py [ds_name ...]
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
from scripts.query_stage_profile import _spark_with_ui  # noqa: E402


def _rest(spark, suffix):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}{suffix}") as r:
        return json.loads(r.read().decode())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or ["li_flag"]
    spark = _spark_with_ui()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    builders = {
        "li_flag": workload._li_flag_ds,
        "li_month": workload._li_month_ds,
        "orders_prio": workload._orders_prio_ds,
        "orders_prio_subset": workload._orders_prio_subset_ds,
    }
    for name in names:
        key = re.sub(r"[^A-Za-z0-9_.-]", "_", sf_dir.strip("/"))
        shutil.rmtree(os.path.join(workload._CACHE_ROOT, key, name),
                      ignore_errors=True)
        jobs0 = {j["jobId"] for j in _rest(spark, "/jobs")}
        t0 = time.time()
        builders[name](spark, sf_dir)
        wall = time.time() - t0
        time.sleep(0.5)
        jobs = sorted(
            (j for j in _rest(spark, "/jobs") if j["jobId"] not in jobs0),
            key=lambda j: j["jobId"],
        )
        print(f"\n== cold publish {name}: wall {wall:.3f}s, "
              f"{len(jobs)} jobs ==")
        for j in jobs:
            from datetime import datetime

            def ts(s):
                return datetime.fromisoformat(
                    s.replace("GMT", "+00:00")).timestamp()

            dur = ts(j["completionTime"]) - ts(j["submissionTime"]) \
                if "completionTime" in j else float("nan")
            ntask = j.get("numCompletedTasks", 0)
            print(f"  job {j['jobId']:>4} {dur:7.3f}s tasks={ntask:>4} "
                  f"{(j.get('description') or j.get('name', ''))[:100]}")


if __name__ == "__main__":
    main()
