"""Non-parquet ingestion sources.

The reference is parquet-only (SURVEY §2.1: every source and sink is
``pd.read_parquet``/``to_parquet``); a training-data pipeline also lands
CSV/TSV extracts and JSONL shards. These readers are thin by design —
Spark's datasource is already distributed, predicate-pushing, and
schema-enforcing — but they pin the ENGINE'S ingestion contract:

- explicit schema, never inference (same rule as the sidecar-typed fetch:
  inference changes types across runs and engines);
- malformed rows are LOUD by default (``mode=FAILFAST``) — a silently
  NULL-filled corrupt extract poisons everything downstream of ingest;
  pass ``permissive_col`` to route bad rows to a rescue column instead
  (the dead-letter pattern ``publish_with_expectations`` can then gate).

JSONL reading lives in ``export.read_jsonl`` (the export counterpart).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    permissive_col: Optional[str] = None,
    **options,
) -> DataFrame:
    """Distributed CSV read under an EXPLICIT schema.

    ``permissive_col=None`` (default): FAILFAST — any row that does not
    parse under the schema aborts the job (corrupt extracts surface at
    ingest, not as silent NULLs three joins later). With
    ``permissive_col='_corrupt'``, parsing is PERMISSIVE and unparseable
    rows land whole in that string column for dead-letter routing.
    """
    reader = (
        spark.read.schema(
            T.StructType(
                [*schema.fields]
                + (
                    [T.StructField(permissive_col, T.StringType(), True)]
                    if permissive_col
                    else []
                )
            )
        )
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
    )
    if permissive_col:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", permissive_col
        )
    else:
        reader = reader.option("mode", "FAILFAST")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)
