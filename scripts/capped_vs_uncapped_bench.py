"""Min-of-3 capped vs uncapped reindex at 50k docs (the r11 verdict #3
done-criterion: capped 1pct reindex under ~2x the uncapped one)."""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import s3parq_spark as sq  # noqa: E402
from s3parq_spark import text_index as ti  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = sq.get_spark(app_name="capped_ab")
sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/s3parq_sf1")
docs1 = spark.read.parquet(os.path.join(sf1_dir, "documents.parquet")).select(
    "doc_id", "text"
)
n = docs1.count()
changed = docs1.filter("doc_id % 97 = 3").withColumn(
    "text", F.concat(F.lit("probe probe "), F.col("text"))
)
suffixes = ("", "_stats", "_doclens", "_stopped", "_fwd")


def bases():
    out = {}
    for name, max_df in (("capped", n // 2), ("uncapped", None)):
        b = f"/tmp/ab_{name}_base"
        if not os.path.exists(b):
            kw = {"max_df": max_df} if max_df else {}
            ti.build_text_index(spark, docs1, b, "doc_id", "text",
                                n_buckets=64, **kw)
        out[name] = b
    return out


results = {}
for name, base in bases().items():
    best = None
    for trial in range(3):
        work = f"/tmp/ab_{name}_work"
        for s in suffixes:
            shutil.rmtree(work + s, ignore_errors=True)
            if os.path.exists(base + s):
                shutil.copytree(base + s, work + s)
        t0 = time.time()
        ti.reindex_documents(spark, changed, work, "doc_id", "text")
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(f"{name} trial {trial}: {dt:.2f}s")
        for s in suffixes:
            shutil.rmtree(work + s, ignore_errors=True)
    results[name] = best
print(f"\nRESULT capped={results['capped']:.2f}s "
      f"uncapped={results['uncapped']:.2f}s "
      f"ratio={results['capped']/results['uncapped']:.2f}")
