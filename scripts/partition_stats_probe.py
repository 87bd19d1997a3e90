"""Partition-stats spill probe (r14, verdict #7): measure the sidecar
size with the partitions section INLINE vs SPILLED at rising combo
counts, and verify the incremental fold still runs against the spilled
representation on a real layout.

The sidecar is parsed by EVERY metadata read, so it must stay
O(versions + columns); a date x domain layout at 100 TB reaches
10^5-10^6 partition-value combinations. This probe publishes a real
hive layout at 10^4 combos, ANALYZEs it both ways, and records:

- sidecar bytes with the record inline (spill disabled)
- sidecar bytes with the record spilled (default threshold)
- the spilled manifest's own size (columnar, off the hot path)
- the fold mode after an append (must stay "incremental")

Usage: python scripts/partition_stats_probe.py [n_combos]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from s3parq_spark.publish import publish_path  # noqa: E402
from s3parq_spark.session import get_spark  # noqa: E402
from s3parq_spark.stats import (  # noqa: E402
    collect_partition_stats,
    read_partition_stats,
    read_stats,
)


def main() -> None:
    n_combos = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_spark(app_name="partition-stats-probe")
    import tempfile

    base = tempfile.mkdtemp(prefix="pstats_probe_")
    path = os.path.join(base, "ds")
    sidecar = os.path.join(path, "_s3parq_metadata.json")

    # 2 rows per combo so the fold has something to add to
    df = spark.range(n_combos * 2).select(
        F.col("id").alias("k"),
        (F.col("id") % n_combos).cast("string").alias("p"),
    )
    t0 = time.time()
    publish_path(spark, path, df, ["p"])
    t_pub = time.time() - t0

    t0 = time.time()
    collect_partition_stats(spark, path, spill_threshold=10**9)  # inline
    t_inline = time.time() - t0
    inline_bytes = os.path.getsize(sidecar)

    t0 = time.time()
    collect_partition_stats(spark, path)  # default threshold: spills
    t_spill = time.time() - t0
    spilled_bytes = os.path.getsize(sidecar)
    rec = read_stats(spark, path)
    ptr = rec["partitions_manifest"]
    manifest_bytes = os.path.getsize(os.path.join(path, ptr["path"]))

    # fold against the spilled record: append one combo's worth, refresh
    publish_path(
        spark, path,
        spark.range(5).select(
            (F.col("id") + 10**7).alias("k"), F.lit("0").alias("p")
        ),
        ["p"], mode="append",
    )
    t0 = time.time()
    folded = collect_partition_stats(spark, path, incremental=True)
    t_fold = time.time() - t0
    mode = read_stats(spark, path)["last_partitions_analyze_mode"]
    total = sum(r["n_rows"] for r in read_partition_stats(spark, path))

    print(json.dumps({
        "n_combos": n_combos,
        "publish_sec": round(t_pub, 2),
        "inline_analyze_sec": round(t_inline, 2),
        "sidecar_bytes_inline": inline_bytes,
        "spill_analyze_sec": round(t_spill, 2),
        "sidecar_bytes_spilled": spilled_bytes,
        "manifest_bytes": manifest_bytes,
        "sidecar_shrink_factor": round(inline_bytes / spilled_bytes, 1),
        "fold_sec": round(t_fold, 2),
        "fold_mode": mode,
        "row_count_after_fold": total,
        "expected_rows": n_combos * 2 + 5,
        "n_folded_combos": len(folded),
    }))
    import shutil

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
