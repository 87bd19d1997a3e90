"""Profile the capped-index maintenance path at bench scale (50k docs).

Instruments every commit-producing call (publish_path, delete_where,
eq_delete_append) during reindex_documents on a max_df index, printing a
per-commit timing breakdown — the r11 verdict #3 probe
(text_capped_reindex_1pct 22.3 s vs 13.1 s full capped rebuild).
"""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import s3parq_spark as sq  # noqa: E402
from s3parq_spark import text_index as ti  # noqa: E402
# the package re-exports a `publish` FUNCTION that shadows the submodule
pub = sys.modules["s3parq_spark.publish"]  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = sq.get_spark(app_name="capped_profile")

sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/s3parq_sf1")
if not os.path.exists(os.path.join(sf1_dir, "documents.parquet")):
    import bench
    bench._build_sf1(spark, "/root/testdata/sf0.1", sf1_dir)

docs1 = spark.read.parquet(os.path.join(sf1_dir, "documents.parquet")).select(
    "doc_id", "text"
)
n = docs1.count()
print(f"docs: {n}")

base = "/tmp/capped_profile_idx"
for p in (base, base + "_stats", base + "_doclens", base + "_stopped",
          base + "_fwd"):
    shutil.rmtree(p, ignore_errors=True)

t0 = time.time()
ti.build_text_index(spark, docs1, base, "doc_id", "text",
                    n_buckets=64, max_df=n // 2)
print(f"capped build: {time.time() - t0:.2f}s")

# --- instrument the commit-producing calls -------------------------------
log = []


def _wrap(mod, name):
    orig = getattr(mod, name)

    def wrapped(*a, **kw):
        # identify the target dataset path (2nd positional arg)
        path = a[1] if len(a) > 1 and isinstance(a[1], str) else kw.get(
            "path", "?")
        t = time.time()
        out = orig(*a, **kw)
        log.append((name, os.path.basename(str(path)), time.time() - t))
        return out

    setattr(mod, name, wrapped)
    return orig


origs = []
for name in ("publish_path", "eq_delete_append"):
    origs.append((ti, name, _wrap(ti, name)))
origs.append((pub, "delete_where", _wrap(pub, "delete_where")))

changed = docs1.filter("doc_id % 97 = 3").withColumn(
    "text", F.concat(F.lit("probe probe "), F.col("text"))
)
t0 = time.time()
ti.reindex_documents(spark, changed, base, "doc_id", "text")
total = time.time() - t0
print(f"\ncapped reindex 1pct: {total:.2f}s")
print(f"{'call':<18} {'dataset':<28} {'sec':>7}")
for name, path, dt in log:
    print(f"{name:<18} {path:<28} {dt:7.2f}")
print(f"commits: {len(log)}, sum: {sum(d for _, _, d in log):.2f}s, "
      f"outside-commit time: {total - sum(d for _, _, d in log):.2f}s")

for mod, name, orig in origs:
    setattr(mod, name, orig)
for p in (base, base + "_stats", base + "_doclens", base + "_stopped",
          base + "_fwd"):
    shutil.rmtree(p, ignore_errors=True)
