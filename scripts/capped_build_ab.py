"""Warm interleaved A/B of build_text_index (capped vs uncapped) at sf1,
plus the routing-pipeline plan capture. Usage:
    python scripts/capped_build_ab.py [reps] [plan_out_path]
Measures the CAPPED build (the VERDICT r15 #1 target) and the uncapped
control in ABAB order; prints per-rep walls and mins."""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s3parq_spark.session import get_spark
from s3parq_spark.text_index import build_text_index

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
plan_out = sys.argv[2] if len(sys.argv) > 2 else None

spark = get_spark(app_name="capped_build_ab")
spark.range(1_000_000).selectExpr("sum(id)").collect()

docs = spark.read.parquet("/tmp/s3parq_sf1/documents.parquet").select(
    "doc_id", "text"
)
n_docs = docs.count()
base = "/tmp/capped_ab"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)


def clean(p):
    for s in ("", "_stats", "_doclens", "_stopped", "_fwd"):
        shutil.rmtree(p + s, ignore_errors=True)


def run(tag, **kw):
    p = os.path.join(base, tag)
    clean(p)
    t0 = time.time()
    build_text_index(spark, docs, p, "doc_id", "text", n_buckets=64, **kw)
    dt = time.time() - t0
    clean(p)
    return dt


# warm both paths once (JIT/codegen), then ABAB
run("warm_capped", max_df=n_docs // 2)
run("warm_uncapped")
capped, uncapped = [], []
for i in range(reps):
    capped.append(run(f"c{i}", max_df=n_docs // 2))
    uncapped.append(run(f"u{i}"))
print("capped  ", [round(x, 2) for x in capped], "min", round(min(capped), 3))
print("uncapped", [round(x, 2) for x in uncapped], "min", round(min(uncapped), 3))

if plan_out:
    # the routing pipeline's plan: what the live-postings publish scans
    from s3parq_spark.text_index import _tokenize
    import io
    import contextlib
    from pyspark.sql import functions as F

    postings, dl = _tokenize(docs, "doc_id", "text")
    mode = os.environ.get("CAPPED_AB_PLAN", "after")
    if mode == "before":
        from pyspark.sql.window import Window

        w = Window.partitionBy("term")
        tagged = postings.withColumn("__df", F.count(F.lit(1)).over(w))
        live = tagged.filter(F.col("__df") <= n_docs // 2).drop("__df")
    else:
        # the r16 driver routing: df as a small aggregate, stop terms
        # collected, live = NOT IN (exactly what build_text_index runs)
        postings = postings.persist()
        df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
        stops = [
            r[0]
            for r in df_t.filter(F.col("__df") > n_docs // 2)
            .select("term").collect()
        ]
        print("n_stop_terms:", len(stops))
        live = postings.filter(~F.col("term").isin(stops))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        live.explain("formatted")
    with open(plan_out, "w") as fh:
        fh.write(buf.getvalue())
    print("plan written to", plan_out)
