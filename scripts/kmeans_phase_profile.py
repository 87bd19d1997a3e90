"""Phase profile of kmeans_centroids at sf1 (guide §1: measure first).
Times, per Lloyd iteration: (a) the assignment scan alone (noop sink over
cell ids), (b) the full explode -> decimal-mean -> collect job, and the
whole kmeans_centroids call as the reference wall."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from s3parq_spark.session import get_spark
from s3parq_spark.operators.similarity import (
    _cell_scores, kmeans_centroids,
)

spark = get_spark(app_name="kmeans_phase")
spark.range(1_000_000).selectExpr("sum(id)").collect()

emb = spark.read.parquet("/tmp/s3parq_sf1/embeddings.parquet").select(
    "vec_id", "embedding"
)
print("rows:", emb.count(), "dim:", emb.select(F.size(F.col("embedding").cast("array<double>"))).first()[0])

corpus = emb.select(
    F.col("vec_id").alias("__id"),
    F.col("embedding").cast("array<double>").alias("__vec"),
).filter(F.col("__vec").isNotNull())

k = 16
init = corpus.orderBy("__id").limit(k).collect()
cents = [list(r["__vec"]) for r in init]
cnorms = [max(1e-12, sum(x * x for x in v) ** 0.5) for v in cents]
s = _cell_scores(F.col("__vec"), cents, cnorms)
assigned = corpus.withColumn(
    "__cell", (F.array_position(s, F.array_max(s)) - 1).cast("int")
)


def t(label, fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:32s} {best:.3f}s (min of {n})")


spark.sparkContext.setJobDescription("assign-only noop")
t("assign-only (noop)", lambda: assigned.select("__cell").write.format(
    "noop").mode("overwrite").save())
spark.sparkContext.setJobDescription("assign full row noop")
t("assign full rows (noop)", lambda: assigned.write.format(
    "noop").mode("overwrite").save())
spark.sparkContext.setJobDescription("means job")


def means():
    (
        assigned.select("__cell", F.posexplode("__vec").alias("__pos", "__x"))
        .groupBy("__cell", "__pos")
        .agg(
            (
                F.sum(F.col("__x").cast("decimal(30,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("__m")
        )
        .collect()
    )


t("explode+decimal-mean+collect", means)

spark.sparkContext.setJobDescription("kmeans full k=16 iters=2")
t("kmeans_centroids k=16 iters=2", lambda: kmeans_centroids(
    emb, "vec_id", "embedding", k=16, iters=2), n=3)
