"""DDL-string parity (reference ``publish_redshift.py``, tested there with
mocked sessions — same strategy here with a recording executor) and S3 naming
rules (``s3_naming_helper.py``)."""

import pytest
from pyspark.sql import types as T

from s3parq_spark import naming, redshift


def test_create_schema_sql():
    sql = redshift.create_schema_sql("my_schema", "my_db", "arn:aws:iam::1:role/r")
    assert "CREATE EXTERNAL SCHEMA IF NOT EXISTS my_schema" in sql
    assert "FROM DATA CATALOG" in sql
    assert "database 'my_db'" in sql
    assert "iam_role 'arn:aws:iam::1:role/r'" in sql


def test_create_table_sql_partitioned():
    sql = redshift.create_table_sql(
        "t",
        "s",
        {"a": "VARCHAR", "b": "BIGINT"},
        {"p": "TIMESTAMP"},
        "s3://bucket/key",
    )
    assert sql == (
        "CREATE EXTERNAL TABLE s.t (a VARCHAR, b BIGINT) "
        "PARTITIONED BY (p TIMESTAMP) STORED AS PARQUET "
        "LOCATION 's3://bucket/key';"
    )


def test_create_table_sql_unpartitioned():
    sql = redshift.create_table_sql("t", "s", {"a": "VARCHAR"}, {}, "s3://b/k")
    assert "PARTITIONED BY" not in sql


def test_create_partitions_sql():
    sql = redshift.create_partitions_sql(
        "bkt", "sch", "tbl", "path/to/data/apple=abcd/banana=1234/abcd1234.parquet"
    )
    assert "ALTER TABLE sch.tbl ADD IF NOT EXISTS" in sql
    assert "PARTITION (apple='abcd', banana='1234')" in sql
    assert "LOCATION 's3://bkt/path/to/data/apple=abcd/banana=1234';" in sql


def test_partition_location_requires_partitions():
    with pytest.raises(ValueError, match="No partitions"):
        redshift.partition_location("path/to/file.parquet")


def test_executors_record_sql():
    executed = []
    redshift.create_custom_table(
        "t",
        "s",
        ["colA"],
        "s3://b/k",
        {"colA": "VARCHAR(1000)", "colB": "DECIMAL(5,4)"},
        executed.append,
    )
    # existence probe first (reference publish_redshift.py:220-224), then
    # the CREATE — the recorder returns None, so the CREATE always runs
    assert len(executed) == 2
    assert "SVV_EXTERNAL_TABLES" in executed[0]
    assert "PARTITIONED BY (colA VARCHAR(1000))" in executed[1]
    assert "(colB DECIMAL(5,4))" in executed[1]


def test_create_table_skipped_when_probe_reports_existing():
    calls = []

    def exec_with_rows(sql):
        calls.append(sql)
        return [(1,)] if "SVV_EXTERNAL_TABLES" in sql else None

    redshift.create_table(
        "t", "s", {"a": "VARCHAR"}, {}, "s3://b/k", exec_with_rows
    )
    # probe said the table exists: CREATE EXTERNAL TABLE must NOT execute
    # (Redshift has no IF NOT EXISTS for external tables)
    assert len(calls) == 1 and "SVV_EXTERNAL_TABLES" in calls[0]


def test_validate_name_rules():
    with pytest.raises(ValueError, match="reserved"):
        redshift.validate_name("select")
    with pytest.raises(ValueError, match="spaces or quotations"):
        redshift.validate_name("bad name")
    with pytest.raises(ValueError, match="127"):
        redshift.validate_name("x" * 128)
    redshift.validate_name("fine_name_123")


def test_spark_type_to_redshift():
    f = redshift.spark_type_to_redshift
    assert f(T.IntegerType()) == "INTEGER"
    assert f(T.LongType()) == "BIGINT"
    assert f(T.FloatType()) == "REAL"
    assert f(T.DoubleType()) == "FLOAT"
    assert f(T.TimestampType()) == "TIMESTAMP"
    assert f(T.BooleanType()) == "BOOLEAN"
    assert f(T.StringType()) == "VARCHAR"
    assert f(T.DecimalType(5, 4)) == "DECIMAL(5,4)"


def test_redshift_type_to_vocab():
    f = redshift.redshift_type_to_vocab
    assert f("VARCHAR(1000)") == "string"
    assert f("BIGINT") == "integer"
    assert f("REAL") == "float"
    assert f("DECIMAL(5,4)") == "decimal(5,4)"
    assert f("BOOLEAN") == "boolean"
    assert f("TIMESTAMP") == "datetime"


def test_register_spark_table(spark, tmp_dataset_dir, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    df.write.parquet(tmp_dataset_dir)
    redshift.register_spark_table(
        spark,
        "region_ext",
        "s3parq_test",
        {f.name: f.dataType for f in df.schema.fields},
        [],
        tmp_dataset_dir,
    )
    assert spark.sql("SELECT count(*) FROM s3parq_test.region_ext").first()[0] == 5
    spark.sql("DROP TABLE s3parq_test.region_ext")
    spark.sql("DROP DATABASE s3parq_test")


def test_bucket_name_rules():
    naming.validate_bucket_name("valid-bucket-name")
    for bad in ["ab", "UPPER", "bad_underscore", "1.2.3.4", "-start", "end-"]:
        with pytest.raises(ValueError):
            naming.validate_bucket_name(bad)
    # local paths pass through (test-suite role of moto)
    naming.validate_bucket_name("/tmp/x")


def test_s3_path_rules():
    naming.validate_s3_path("s3://valid-bucket/some/key=1/file.parquet")
    with pytest.raises(ValueError):
        naming.validate_s3_path("s3://UPPER/key")
    with pytest.raises(ValueError):
        naming.validate_s3_path("s3://valid-bucket/bad key")
