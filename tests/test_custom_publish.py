"""custom_publish / decimal round-trip (S9, FIXTURES.md F4), null partition
values (F5 fixture), Spectrum DDL wiring through a recording SessionHelper,
and the 60 MB file-sizing contract (S7)."""

import decimal

import pandas as pd
import pytest
from pyspark.sql import types as T

from s3parq_spark import (
    SessionHelper,
    custom_publish,
    fetch,
    publish,
    validate_redshift_params,
)
from s3parq_spark.metadata import read_sidecar


def custom_frame():
    """FIXTURES.md F4: the reference's canonical custom/decimal frame
    (testing_helper.py:283-296)."""
    return pd.DataFrame(
        {
            "colA": ["A", "B", "C"],
            "colB": [4, 5, 6],
            "colC": [4.12, 5.22, 6.57],
            "colD": [
                decimal.Decimal("4.1289"),
                decimal.Decimal("5.2200"),
                decimal.Decimal("6.5770"),
            ],
            "colE": ["test1", "test2", "test3"],
            "colF": [True, False, True],
        }
    )


CUSTOM_COLUMNS = {
    "colA": "VARCHAR(1000)",
    "colB": "BIGINT",
    "colC": "REAL",
    "colD": "DECIMAL(5,4)",
    "colE": "VARCHAR",
    "colF": "BOOLEAN",
}


def redshift_params():
    return {
        "schema_name": "MySchema",
        "table_name": "MyTable",
        "iam_role": "arn:aws:iam::1:role/r",
        "region": "us-east-1",
        "cluster_id": "c1",
        "host": "h",
        "port": "5439",
        "db_name": "db",
        "ec2_user": None,
    }


def test_custom_publish_decimal_round_trip(spark, tmp_dataset_dir):
    sdf = spark.createDataFrame(
        custom_frame(),
        schema=T.StructType(
            [
                T.StructField("colA", T.StringType()),
                T.StructField("colB", T.LongType()),
                T.StructField("colC", T.DoubleType()),
                T.StructField("colD", T.DecimalType(5, 4)),
                T.StructField("colE", T.StringType()),
                T.StructField("colF", T.BooleanType()),
            ]
        ),
    )
    custom_publish(
        tmp_dataset_dir, "", ["colA", "colB"], sdf, CUSTOM_COLUMNS, spark=spark
    )
    meta = read_sidecar(spark, tmp_dataset_dir)
    # F4 expectation (tests/test_publish_parq.py:247-248 shape)
    assert meta.partition_data_types == {"colA": "string", "colB": "integer"}
    assert meta.column_types["colD"] == "decimal(5,4)"
    got = fetch(tmp_dataset_dir, "", spark=spark)
    assert dict(got.dtypes)["colD"] == "decimal(5,4)"
    vals = sorted(r.colD for r in got.collect())
    assert vals == [
        decimal.Decimal("4.1289"),
        decimal.Decimal("5.2200"),
        decimal.Decimal("6.5770"),
    ]


def test_null_partition_values_round_trip(spark, tmp_dataset_dir):
    """F5 fixture shape: nulls in a partition column become
    __HIVE_DEFAULT_PARTITION__ on disk and come back as nulls."""
    pdf = pd.DataFrame(
        {"colA": [1.0, 2.0, None], "colB": ["DDD", None, "FFF"], "x": [1, 2, 3]}
    )
    publish(tmp_dataset_dir, "", ["colB"], pdf, spark=spark)
    got = fetch(tmp_dataset_dir, "", spark=spark, as_pandas=True).sort_values("x")
    assert list(got.colB) == ["DDD", None, "FFF"]


def test_validate_redshift_params():
    params = validate_redshift_params(redshift_params())
    assert params["schema_name"] == "myschema"  # lowercased
    assert params["table_name"] == "mytable"
    with pytest.raises(ValueError, match="Expected parameters"):
        validate_redshift_params({"schema_name": "s"})
    bad = redshift_params()
    bad["host"] = ""
    with pytest.raises(ValueError, match="No value assigned"):
        validate_redshift_params(bad)
    missing = redshift_params()
    missing.pop("host")
    missing["hosty"] = "h"
    with pytest.raises(KeyError, match="host"):
        validate_redshift_params(missing)


def test_publish_with_spectrum_ddl(spark, tmp_dataset_dir):
    """publish(redshift_params=...) emits schema + table + partition DDL
    through the session helper (reference flow publish_parq.py:515-543,
    255-257), recorded by the dry-run executor."""
    helper = SessionHelper("us-east-1", "c1", "h", "5439", "db", None)
    helper.configure_session_helper()
    pdf = pd.DataFrame({"a": [1, 2], "p": ["x", "y"]})
    publish(
        tmp_dataset_dir,
        "",
        ["p"],
        pdf,
        redshift_params=redshift_params(),
        session_helper=helper,
        spark=spark,
    )
    sql = "\n".join(helper.executed)
    assert "CREATE EXTERNAL SCHEMA IF NOT EXISTS myschema" in sql
    assert "CREATE EXTERNAL TABLE myschema.mytable (a BIGINT)" in sql
    assert "PARTITIONED BY (p VARCHAR)" in sql
    assert "ADD IF NOT EXISTS PARTITION (p='x')" in sql
    assert "ADD IF NOT EXISTS PARTITION (p='y')" in sql


def test_publish_rejects_index_with_redshift(spark, tmp_dataset_dir):
    pdf = pd.DataFrame({"index": [1], "p": ["x"]})
    with pytest.raises(ValueError, match="reserved keyword in Redshift"):
        publish(
            tmp_dataset_dir, "", ["p"], pdf,
            redshift_params=redshift_params(), spark=spark,
        )


def test_parquet_source_sizing_shortcut(spark, tmp_path):
    """S7 sizing: an untransformed parquet scan sizes files from the source
    footers (exact compressed bytes/row, zero Spark jobs); any transformed
    plan falls back to the sampled row-size model (r5 verdict #5)."""
    import os

    from pyspark.sql import functions as F

    from s3parq_spark.publish import (
        TARGET_FILE_BYTES, _parquet_scan_row_bytes,
    )

    src = str(tmp_path / "src.parquet")
    spark.range(10_000).selectExpr(
        "id", "CAST(id AS STRING) AS s"
    ).coalesce(1).write.parquet(src)
    df = spark.read.parquet(src)
    got = _parquet_scan_row_bytes(df)
    assert got is not None
    disk = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src) if f.endswith(".parquet")
    )
    assert abs(got - disk / 10_000) < 1e-6
    assert int(TARGET_FILE_BYTES / got) > 0
    # r14: width-ACCOUNTABLE transforms still use footers — a projection
    # is priced per column (pass-through columns from the column-chunk
    # sizes, computed fixed-width ones from the model cell over the
    # ratio), and a filter never changes row width at all
    narrowed = _parquet_scan_row_bytes(df.select("id"))
    assert narrowed is not None and narrowed < got
    widened = _parquet_scan_row_bytes(df.withColumn("x", F.lit(1)))
    assert widened is not None and widened > narrowed
    filtered = _parquet_scan_row_bytes(df.filter("id % 2 = 0"))
    assert filtered == got  # same files, same row width
    # a computed VARIABLE-width column is the one thing footers cannot
    # price: bail to the sampled row-size model
    assert _parquet_scan_row_bytes(
        df.withColumn("x", F.concat(F.lit("a"), F.col("s")))
    ) is None


def test_small_file_split_count(spark, tmp_path):
    """r15: a SORTED publish with a requested file size far below the
    60 MB target gets an explicit writer-task count (range exchange; AQE
    never coalesces it) so thousands of small files are not written by a
    couple of serial tasks — and normal geometry stays on the rebalance
    path (returns None)."""
    from s3parq_spark.publish import (
        _SMALL_FILES_PER_TASK, _small_file_split_count,
    )

    src = str(tmp_path / "split_src.parquet")
    spark.range(200_000).selectExpr(
        "id", "id % 7 AS k", "CAST(id % 2 AS STRING) AS p"
    ).coalesce(1).write.parquet(src)
    df = spark.read.parquet(src)
    n = _small_file_split_count(df, 100)  # ~2000 requested files
    assert n is not None and n >= 2
    # bounded by files-per-task above and by 2x parallelism below
    par = spark.sparkContext.defaultParallelism
    assert n <= 2 * par
    est_files = 200_000 / 100
    assert n >= min(est_files / _SMALL_FILES_PER_TASK, 2 * par) - 1
    # normal file geometry (requested size near the target): rebalance
    assert _small_file_split_count(df, 10_000_000) is None
    # unpriceable plan (computed variable-width column): rebalance
    from pyspark.sql import functions as F

    assert _small_file_split_count(
        df.withColumn("x", F.concat(F.lit("a"), F.col("p"))), 100
    ) is None


def test_source_footers_prove_nonempty(spark, tmp_path):
    """r15: the warm-publish empty check must be job-free when the plan is
    row-count-preserving over a local parquet scan, and must still REJECT
    every actually-empty frame (the footer proof never fires for a Filter
    or a local relation — only a job can prove those)."""
    from pyspark.sql import functions as F

    from s3parq_spark.publish import (
        _source_proves_nonempty, check_empty_dataframe,
    )

    src = str(tmp_path / "proof_src.parquet")
    spark.range(100).selectExpr("id", "CAST(id AS STRING) AS s")\
        .coalesce(1).write.parquet(src)
    df = spark.read.parquet(src)
    assert _source_proves_nonempty(df) is True
    assert _source_proves_nonempty(df.select("id")) is True
    check_empty_dataframe(df)  # no job needed, no raise
    # a Filter layer bails to the job — and an empty survivor set raises
    assert _source_proves_nonempty(df.filter("id < 0")) is False
    with pytest.raises(ValueError, match="empty"):
        check_empty_dataframe(df.filter("id < 0"))
    # local relations never qualify; empty ones still raise
    assert _source_proves_nonempty(spark.range(5).toDF("id")) is False
    with pytest.raises(ValueError, match="empty"):
        check_empty_dataframe(spark.createDataFrame([], "a int"))
    # an empty parquet source (schema-only file) falls through to the job
    empty_src = str(tmp_path / "proof_empty.parquet")
    spark.range(0).coalesce(1).write.parquet(empty_src)
    empty_df = spark.read.parquet(empty_src)
    assert _source_proves_nonempty(empty_df) is False
    with pytest.raises(ValueError, match="empty"):
        check_empty_dataframe(empty_df)


def test_footer_sizing_cache_replays_identically(spark, tmp_path):
    """The (path, schema) sizing cache must replay the SAME rows-per-file
    the footer shortcut computed: the cache stores the model's
    uncompressed unit, so a wrong conversion factor would make repeated
    publishes to one dataset silently produce 16x-oversized files."""
    from s3parq_spark.publish import _ROW_BYTES_CACHE, _estimate_rows_per_file

    src = str(tmp_path / "cache_src.parquet")
    spark.range(5_000).selectExpr(
        "id", "CAST(id AS STRING) AS s"
    ).coalesce(1).write.parquet(src)
    df = spark.read.parquet(src)
    _ROW_BYTES_CACHE.clear()
    first = _estimate_rows_per_file(df, path="/ds/cachekey")
    assert ("/ds/cachekey", df.schema.json()) in _ROW_BYTES_CACHE
    replay = _estimate_rows_per_file(df, path="/ds/cachekey")
    assert replay == first


def test_max_records_per_file_contract(spark, tmp_dataset_dir):
    """S7: explicit maxRecordsPerFile bounds file row counts (the 60 MB
    contract is rows-per-file × row size; row cap is the enforceable knob)."""
    pdf = pd.DataFrame({"a": range(1000), "p": ["x"] * 1000})
    files = publish(
        tmp_dataset_dir, "", ["p"], pdf, max_records_per_file=100, spark=spark
    )
    assert len(files) >= 10
    counts = [
        spark.read.parquet(f"{tmp_dataset_dir}/{f}").count() for f in files[:3]
    ]
    assert all(c <= 100 for c in counts)
