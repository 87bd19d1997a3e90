"""Catalog / DDL layer.

The reference generates Redshift Spectrum DDL and executes it over SQLAlchemy
(``/root/reference/s3parq/publish_redshift.py``). Here each operation is split
into (a) a pure DDL-string generator — unit-testable exactly like the
reference's mocked-session tests — and (b) an optional executor: either a
user-supplied callable (JDBC, psycopg2, …) or the Spark session catalog via
``spark.sql`` (``CREATE DATABASE`` / ``CREATE TABLE ... USING PARQUET`` /
``ALTER TABLE ... ADD PARTITION``), which is the Glue/Hive-metastore route a
Spark deployment would actually use.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional

from pyspark.sql import SparkSession
from pyspark.sql import types as T

# Redshift reserved words (public AWS documentation list, same set the
# reference checks in publish_redshift.py:10-15).
_RESERVED = frozenset(
    """AES128 AES256 ALL ALLOWOVERWRITE ANALYSE ANALYZE AND ANY ARRAY AS ASC
    AUTHORIZATION BACKUP BETWEEN BINARY BLANKSASNULL BOTH BYTEDICT BZIP2 CASE
    CAST CHECK COLLATE COLUMN CONSTRAINT CREATE CREDENTIALS CROSS CURRENT_DATE
    CURRENT_TIME CURRENT_TIMESTAMP CURRENT_USER CURRENT_USER_ID DEFAULT
    DEFERRABLE DEFLATE DEFRAG DELTA DELTA32K DESC DISABLE DISTINCT DO ELSE
    EMPTYASNULL ENABLE ENCODE ENCRYPT ENCRYPTION END EXCEPT EXPLICIT FALSE FOR
    FOREIGN FREEZE FROM FULL GLOBALDICT256 GLOBALDICT64K GRANT GROUP GZIP
    HAVING IDENTITY IGNORE ILIKE IN INITIALLY INNER INTERSECT INTO IS ISNULL
    JOIN LANGUAGE LEADING LEFT LIKE LIMIT LOCALTIME LOCALTIMESTAMP LUN LUNS
    LZO LZOP MINUS MOSTLY13 MOSTLY32 MOSTLY8 NATURAL NEW NOT NOTNULL NULL
    NULLS OFF OFFLINE OFFSET OID OLD ON ONLY OPEN OR ORDER OUTER OVERLAPS
    PARALLEL PARTITION PERCENT PERMISSIONS PLACING PRIMARY RAW READRATIO
    RECOVER REFERENCES RESPECT REJECTLOG RESORT RESTORE RIGHT SELECT
    SESSION_USER SIMILAR SNAPSHOT SOME SYSDATE SYSTEM TABLE TAG TDES TEXT255
    TEXT32K THEN TIMESTAMP TO TOP TRAILING TRUE TRUNCATECOLUMNS UNION UNIQUE
    USER USING VERBOSE WALLET WHEN WHERE WITH WITHOUT""".split()
)

Executor = Callable[[str], object]


def validate_name(name: str) -> None:
    """Identifier rules (``publish_redshift.py:18-47``): not reserved, starts
    alphanumeric/underscore, no spaces/quotes, 1-127 chars."""
    if name.upper() in _RESERVED:
        raise ValueError(f"name: {name} cannot be a reserved SQL keyword")
    if not re.match(r"^[a-zA-Z0-9_]", name):
        raise ValueError(
            f"name: {name} can only start with an alphanumeric or an underscore"
        )
    if re.search(r"([ '\"])", name):
        raise ValueError(f"name: {name} cannot contain spaces or quotations")
    if not 1 <= len(name) <= 127:
        raise ValueError(f"name: {name} must be between 1 and 127 characters")


def spark_type_to_redshift(dtype: T.DataType) -> str:
    """Spark type → Redshift DDL type (reference ``_datatype_mapper``,
    ``publish_redshift.py:148-178``, translated from pandas dtypes)."""
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType)):
        return "INTEGER"
    if isinstance(dtype, T.LongType):
        return "BIGINT"
    if isinstance(dtype, T.FloatType):
        return "REAL"
    if isinstance(dtype, T.DoubleType):
        return "FLOAT"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "TIMESTAMP"
    if isinstance(dtype, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dtype, T.DecimalType):
        return f"DECIMAL({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.StringType):
        return "VARCHAR"
    raise ValueError(f"{dtype.simpleString()} cannot be mapped to Redshift")


def redshift_type_to_vocab(redshift_type: str) -> str:
    """Redshift DDL type → sidecar vocabulary (inverse of the reference's
    custom-publish typing, ``publish_parq.py:362-400`` DECIMAL branch)."""
    t = redshift_type.strip().upper()
    m = re.match(r"^DECIMAL\s*\((\d+)\s*,\s*(\d+)\)$", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if t.startswith("VARCHAR") or t in ("TEXT", "CHAR"):
        return "string"
    if t in ("SMALLINT", "INTEGER", "INT", "BIGINT", "INT2", "INT4", "INT8"):
        return "integer"
    if t in ("REAL", "FLOAT", "FLOAT4", "FLOAT8", "DOUBLE PRECISION"):
        return "float"
    if t in ("TIMESTAMP", "DATE", "TIMESTAMPTZ"):
        return "datetime"
    if t in ("BOOLEAN", "BOOL"):
        return "boolean"
    raise ValueError(f"unsupported custom column type {redshift_type!r}")


def _columns_ddl(columns: Dict[str, str]) -> str:
    inner = ", ".join(f"{c} {t}" for c, t in columns.items())
    return f"({inner})"


# ---------------------------------------------------------------------------
# DDL string generators (pure; parity-testable) — SURVEY §2.1 S11-S14
# ---------------------------------------------------------------------------

def create_schema_sql(schema_name: str, db_name: str, iam_role: str) -> str:
    validate_name(schema_name)
    validate_name(db_name)
    return (
        f"CREATE EXTERNAL SCHEMA IF NOT EXISTS {schema_name} "
        f"FROM DATA CATALOG database '{db_name}' iam_role '{iam_role}';"
    )


def create_table_sql(
    table_name: str,
    schema_name: str,
    columns: Dict[str, str],
    partitions: Dict[str, str],
    path: str,
) -> str:
    """``CREATE EXTERNAL TABLE`` (``publish_redshift.py:202-239``); ``columns``
    and ``partitions`` map name → Redshift DDL type (partition columns must
    not repeat in ``columns``)."""
    validate_name(table_name)
    validate_name(schema_name)
    ddl = f"CREATE EXTERNAL TABLE {schema_name}.{table_name} {_columns_ddl(columns)}"
    if partitions:
        ddl += f" PARTITIONED BY {_columns_ddl(partitions)}"
    return ddl + f" STORED AS PARQUET LOCATION '{path}';"


def partitions_from_filepath(filepath: str) -> List[str]:
    """``['k=v', ...]`` components of a data file path
    (``publish_redshift.py:50-68``)."""
    return [d for d in filepath.split("/") if "=" in d]


def partition_location(filepath: str) -> str:
    """Directory of the last partition component
    (``publish_redshift.py:124-145``)."""
    parts = filepath.split("/")
    idx = max((i for i, p in enumerate(parts) if "=" in p), default=None)
    if idx is None:
        raise ValueError(f"No partitions in this filepath {filepath}")
    return "/".join(parts[: idx + 1])


def create_partitions_sql(bucket: str, schema: str, table: str, filepath: str) -> str:
    """``ALTER TABLE ... ADD IF NOT EXISTS PARTITION``
    (``publish_redshift.py:300-332``). Path components are hive-ESCAPED by
    the writer (``:`` in every datetime value becomes ``%3A``); the
    registered partition VALUE must be the unescaped original or Spectrum
    queries comparing against the real value match zero partitions — the
    same unquote ``fetch._hive_path_values`` applies on the read side."""
    from urllib.parse import unquote

    parts = partitions_from_filepath(filepath)
    formatted = ", ".join(
        f"{k}='{unquote(v)}'" for k, v in (p.split("=", 1) for p in parts)
    )
    location = partition_location(filepath)
    return (
        f"ALTER TABLE {schema}.{table} ADD IF NOT EXISTS "
        f"PARTITION ({formatted}) LOCATION 's3://{bucket}/{location}';"
    )


# ---------------------------------------------------------------------------
# executors
# ---------------------------------------------------------------------------

def create_schema(
    schema_name: str, db_name: str, iam_role: str, executor: Executor
) -> str:
    sql = create_schema_sql(schema_name, db_name, iam_role)
    executor(sql)
    return sql


def table_exists_sql(table_name: str, schema_name: str) -> str:
    """The reference's existence probe (``publish_redshift.py:220-224``):
    Redshift's ``CREATE EXTERNAL TABLE`` has no ``IF NOT EXISTS``, so an
    unguarded re-CREATE on the second publish to a dataset errors."""
    validate_name(table_name)
    validate_name(schema_name)
    return (
        "SELECT 1 FROM SVV_EXTERNAL_TABLES WHERE "
        f"schemaname = '{schema_name}' AND tablename = '{table_name}';"
    )


def create_table(
    table_name: str,
    schema_name: str,
    columns: Dict[str, str],
    partitions: Dict[str, str],
    path: str,
    executor: Executor,
) -> str:
    """Guarded CREATE (reference ``publish_redshift.py:202-239``): probe
    SVV_EXTERNAL_TABLES first and skip the CREATE when the table already
    exists — append publishes re-register partitions, not the table.

    Executor contract for probe queries: return an iterable of result rows
    (empty = table absent, non-empty = present) or None (the dry-run
    recorder — always proceeds with the CREATE). Non-iterable returns
    (DBAPI status strings, rowcount ints like 0/-1) are ambiguous — a
    truthy one must NOT silently skip table creation — so they are
    rejected loudly instead of guessed at."""
    probe = executor(table_exists_sql(table_name, schema_name))
    exists = False
    if probe is not None:
        if isinstance(probe, (str, bytes)):
            # a DBAPI status string ('SELECT 1') is iterable and would
            # silently read as "table exists" — exactly the ambiguity
            # this contract rejects
            raise TypeError(
                "create_table executor must return result rows (an "
                "iterable of rows) or None for existence probes; got a "
                f"status string {probe!r} — it cannot distinguish 'table "
                "exists' from 'statement ran'"
            )
        try:
            exists = bool(list(probe))
        except TypeError:
            raise TypeError(
                "create_table executor must return result rows (an "
                "iterable) or None for existence probes; got "
                f"{type(probe).__name__!r} — a status/rowcount return "
                "cannot distinguish 'table exists' from 'statement ran'"
            ) from None
    sql = create_table_sql(table_name, schema_name, columns, partitions, path)
    if exists:
        return sql
    executor(sql)
    return sql


def create_custom_table(
    table_name: str,
    schema_name: str,
    partitions: List[str],
    path: str,
    custom_redshift_columns: Dict[str, str],
    executor: Executor,
) -> str:
    """``create_custom_table`` (``publish_redshift.py:241-297``): user-declared
    types, split into partition / value columns by name; same existence
    guard as ``create_table``."""
    cols = {k: v for k, v in custom_redshift_columns.items() if k not in partitions}
    parts = {k: v for k, v in custom_redshift_columns.items() if k in partitions}
    return create_table(table_name, schema_name, cols, parts, path, executor)


def create_partitions(
    bucket: str, schema: str, table: str, filepath: str, executor: Executor
) -> str:
    sql = create_partitions_sql(bucket, schema, table, filepath)
    executor(sql)
    return sql


# ---------------------------------------------------------------------------
# Spark-catalog route: same operations against the session catalog
# ---------------------------------------------------------------------------

def register_spark_table(
    spark: SparkSession,
    table_name: str,
    schema_name: str,
    columns: Dict[str, T.DataType],
    partitions: List[str],
    path: str,
) -> None:
    """Register the dataset in the Spark/Hive/Glue catalog so it is queryable
    by name — the deployment-real equivalent of Spectrum registration."""
    validate_name(table_name)
    validate_name(schema_name)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {schema_name}")
    cols_ddl = ", ".join(f"{c} {t.simpleString()}" for c, t in columns.items())
    part_ddl = ", ".join(partitions)
    ddl = (
        f"CREATE TABLE IF NOT EXISTS {schema_name}.{table_name} ({cols_ddl}) "
        f"USING PARQUET "
        + (f"PARTITIONED BY ({part_ddl}) " if partitions else "")
        + f"LOCATION '{path}'"
    )
    spark.sql(ddl)
    if partitions:
        spark.sql(f"MSCK REPAIR TABLE {schema_name}.{table_name}")
