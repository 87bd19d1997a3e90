"""Micro-profile ONE capped reindex at 50k docs: wall time per internal
phase of each publish/eq-delete commit (sidecar reads, listings, sizing,
write job, stats aggregate, sidecar write) — finds where the 3-4 s per
small companion append actually goes (r11 verdict #3 follow-up)."""
import os
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import s3parq_spark as sq  # noqa: E402
from s3parq_spark import text_index as ti  # noqa: E402
from s3parq_spark import metadata as md  # noqa: E402
from s3parq_spark import fs as fsmod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
import pyspark.sql.readwriter as rw  # noqa: E402

pub = sys.modules["s3parq_spark.publish"]

spark = sq.get_spark(app_name="pub_micro")

sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/s3parq_sf1")
docs1 = spark.read.parquet(os.path.join(sf1_dir, "documents.parquet")).select(
    "doc_id", "text"
)
n = docs1.count()

base = "/tmp/capped_base_50k"
suffixes = ("", "_stats", "_doclens", "_stopped", "_fwd")
if not os.path.exists(base):
    ti.build_text_index(spark, docs1, base, "doc_id", "text",
                        n_buckets=64, max_df=n // 2)
work = "/tmp/capped_work_50k"
for s in suffixes:
    shutil.rmtree(work + s, ignore_errors=True)
    if os.path.exists(base + s):
        shutil.copytree(base + s, work + s)

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


wrap(md, "read_sidecar", "read_sidecar")
wrap(md, "write_sidecar", "write_sidecar")
wrap(md, "write_stats_manifest", "write_stats_manifest")
wrap(fsmod, "list_files", "fs.list_files")
wrap(pub, "_list_scoped", "_list_scoped")
wrap(pub, "_touched_partition_dirs", "_touched_dirs")
wrap(pub, "_estimate_rows_per_file", "_estimate_rows")
wrap(pub, "_collect_file_zone_stats", "_zone_stats_agg")
wrap(pub, "check_empty_dataframe", "check_empty")
wrap(rw.DataFrameWriter, "parquet", "writer.parquet")

changed = docs1.filter("doc_id % 97 = 3").withColumn(
    "text", F.concat(F.lit("probe probe "), F.col("text"))
)
t0 = time.time()
ti.reindex_documents(spark, changed, work, "doc_id", "text")
total = time.time() - t0
print(f"\ncapped reindex 1pct TOTAL: {total:.2f}s")
print(f"{'phase':<22} {'n':>3} {'sec':>7}")
for label in sorted(agg, key=lambda k: -agg[k]):
    print(f"{label:<22} {cnt[label]:>3} {agg[label]:7.2f}")
print(f"instrumented sum: {sum(agg.values()):.2f}s "
      "(phases nest: writer.parquet etc. are inside publish calls)")
for s in suffixes:
    shutil.rmtree(work + s, ignore_errors=True)
