"""Phase accounting for the TWO HEADLINE publish entries of bench.py
(r14, verdict #5): the cold `publish` (_li_flag_ds) and `publish_aux`
(the three concurrent aux datasets) are ~38% of the quiet headline
total. Wraps the same internal phases as publish_micro_profile.py and
attributes wall time per phase for each entry, so the next second of
publish-plane work has a name before anything is changed.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
       python scripts/headline_publish_profile.py
"""

import os
import re
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import s3parq_spark as sq  # noqa: E402
from s3parq_spark import fs as fsmod  # noqa: E402
from s3parq_spark import metadata as md  # noqa: E402
from s3parq_spark import workload  # noqa: E402
import pyspark.sql.readwriter as rw  # noqa: E402

pub = sys.modules["s3parq_spark.publish"]

agg = defaultdict(float)
cnt = defaultdict(int)


def wrap(obj, name, label):
    orig = getattr(obj, name)

    def wrapped(*a, **kw):
        t = time.time()
        out = orig(*a, **kw)
        agg[label] += time.time() - t
        cnt[label] += 1
        return out

    setattr(obj, name, wrapped)
    return orig


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = sq.get_spark(app_name="headline_pub_profile")
    # same warmup as bench.py (r15: including BOTH write-path warmups —
    # without them this profile re-measures the JIT the bench excludes)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    import tempfile as _tf

    _wtmp = os.path.join(_tf.gettempdir(), "s3parq_profile_write_warmup")
    shutil.rmtree(_wtmp, ignore_errors=True)
    spark.range(10_000).selectExpr(
        "id", "cast(id as string) s", "cast(id as double) d"
    ).write.mode("overwrite").parquet(_wtmp)
    shutil.rmtree(_wtmp, ignore_errors=True)
    (spark.range(10_000)
        .selectExpr("id", "cast(id % 4 as string) p", "cast(id as double) d")
        .repartition(4)
        .write.mode("overwrite").partitionBy("p").parquet(_wtmp))
    shutil.rmtree(_wtmp, ignore_errors=True)

    wrap(md, "read_sidecar", "read_sidecar")
    wrap(md, "write_sidecar", "write_sidecar")
    wrap(md, "write_stats_manifest", "write_stats_manifest")
    wrap(md, "write_manifest", "write_manifest") if hasattr(
        md, "write_manifest") else None
    wrap(fsmod, "list_files", "fs.list_files")
    wrap(pub, "_list_scoped", "_list_scoped")
    wrap(pub, "_touched_partition_dirs", "_touched_dirs")
    wrap(pub, "_estimate_rows_per_file", "_estimate_rows")
    wrap(pub, "_collect_file_zone_stats", "_zone_stats_agg")
    wrap(pub, "check_empty_dataframe", "check_empty")
    wrap(rw.DataFrameWriter, "parquet", "writer.parquet")

    key = re.sub(r"[^A-Za-z0-9_.-]", "_", sf_dir.strip("/"))
    shutil.rmtree(os.path.join(workload._CACHE_ROOT, key),
                  ignore_errors=True)

    def phase(label, fn):
        agg.clear()
        cnt.clear()
        t0 = time.time()
        fn()
        total = time.time() - t0
        print(f"\n== {label}: TOTAL {total:.2f}s ==")
        print(f"{'phase':<22} {'n':>3} {'sec':>7}")
        for lab in sorted(agg, key=lambda k: -agg[k]):
            print(f"{lab:<22} {cnt[lab]:>3} {agg[lab]:7.2f}")
        print(f"instrumented sum: {sum(agg.values()):.2f}s "
              "(phases nest inside publish calls)")

    phase("publish (_li_flag_ds, cold)",
          lambda: workload._li_flag_ds(spark, sf_dir))

    from concurrent.futures import ThreadPoolExecutor

    def aux():
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

    phase("publish_aux (3 concurrent, cold)", aux)


if __name__ == "__main__":
    main()
