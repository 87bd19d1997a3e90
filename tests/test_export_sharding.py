"""export_jsonl's collision-free shard exchange (r16, guide §2.5):
driver-side Murmur3 parity with Spark's hash partitioning, injective
placement, and unchanged shard membership."""

from pyspark.sql import functions as F

from s3parq_spark.export import (
    _collision_free_partition_count,
    _murmur3_hash_long,
    export_jsonl,
    read_jsonl,
)


def test_murmur3_parity_with_spark_hash(spark):
    vals = list(range(0, 100)) + [2**33, -5, 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in df.select("v", F.hash("v").alias("h")).collect()}
    for v in vals:
        assert _murmur3_hash_long(v) == got[v], v


def test_placement_is_injective_and_matches_spark(spark):
    for n in (8, 16, 32, 64):
        n_parts = _collision_free_partition_count(n)
        assert n_parts >= n
        # predicted placement is injective
        placed = {_murmur3_hash_long(s) % n_parts for s in range(n)}
        assert len(placed) == n
        # and matches Spark's actual partitioning
        df = spark.range(n).select(F.col("id").alias("shard"))
        rows = (
            df.repartition(n_parts, "shard")
            .select("shard", F.spark_partition_id().alias("p"))
            .collect()
        )
        by_part = {}
        for r in rows:
            by_part.setdefault(r["p"], set()).add(r["shard"])
        assert all(len(v) == 1 for v in by_part.values())
        assert len(by_part) == n


def test_export_roundtrip_membership_unchanged(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    p = str(tmp_path / "jsonl")
    export_jsonl(docs, p, "doc_id", n_shards=8)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    back = read_jsonl(spark, p, schema)
    # membership is the documented pure function of the row
    got = {
        (r["doc_id"], r["shard"])
        for r in back.select("doc_id", "shard").collect()
    }
    exp = {
        (r["doc_id"], r["s"])
        for r in docs.select(
            "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(8)).alias("s")
        ).collect()
    }
    assert got == exp
    # one data file per shard directory (each shard = one write task)
    import glob

    for s in range(8):
        files = [
            f
            for f in glob.glob(p + f"/shard={s}/*")
            if not f.endswith((".crc", "_SUCCESS"))
        ]
        assert len(files) == 1, (s, files)
