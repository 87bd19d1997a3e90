"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The publish step (write path) is timed as its own entry; fetch-family
queries then run against the already-published dataset, so read and write
costs are visible separately.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time
from posixpath import join as posixpath_join

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "fetch_all",
    "fetch_filter_eq",
    "fetch_filter_datetime",
    "fetch_diff",
    "partition_values",
    "pricing_summary",
    "top_revenue_orders",
    "nation_revenue",
    "window_top_orders",
    "events_tumbling",
    "events_sessionize",
    "dedup_exact",
    "neardup_jaccard",
    "minhash_pairs",
    "ann_topk",
    "token_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    from s3parq_spark.session import get_spark
    from s3parq_spark import workload

    spark = get_spark(app_name="s3parq_spark_bench")

    # JVM / codegen / datasource warmup so session startup isn't billed to
    # the first timed entry (standard benchmarking practice)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(posixpath_join(sf_dir, "region.parquet")).count()

    # cold publish timing: force a rebuild of the main round-trip dataset
    key = re.sub(r"[^A-Za-z0-9_.-]", "_", sf_dir.strip("/"))
    shutil.rmtree(os.path.join(workload._CACHE_ROOT, key), ignore_errors=True)

    timings: dict[str, float] = {}
    t0 = time.time()
    workload._li_flag_ds(spark, sf_dir)
    timings["publish"] = round(time.time() - t0, 3)

    # the other datasets headline queries read from: their (cold) publishes
    # are write-path work, timed as one entry so query timings measure reads.
    # Independent datasets publish concurrently (S8: chunked parallel publish
    # through Spark's scheduler — the reference used an upload thread pool)
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [
            pool.submit(fn, spark, sf_dir)
            for fn in (
                workload._li_month_ds,
                workload._orders_prio_ds,
                workload._orders_prio_subset_ds,
            )
        ]
        for f in futs:
            f.result()
    timings["publish_aux"] = round(time.time() - t0, 3)

    for name in HEADLINE:
        fn = workload.QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        del n

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
