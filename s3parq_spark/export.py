"""Training-data export: newline-delimited JSON (JSONL) shards.

Tokenizer/trainer pipelines consume JSONL, not parquet. This sink writes a
DataFrame as deterministic, content-addressed JSONL shards:

- Shard assignment is ``xxhash64(id) mod n_shards`` — a pure function of
  the row, so re-running the export (or running it on a different cluster
  size) produces the identical shard membership. Training-data layouts must
  be reproducible; "whatever partitioning the job happened to have" is not.
- One ``repartition`` on the shard key co-locates each shard, and
  ``partitionBy`` writes ``shard=N/`` directories — a layout both Spark and
  non-Spark consumers (a Python loader walking shard dirs) can address.
- The writer is Spark's JSON datasource: JVM-side Jackson serialization,
  no Python in the path.

``read_jsonl`` reads the export back with an EXPLICIT schema — JSON carries
no types, and schema inference at 100 TB is a full extra pass; the schema
contract travels with the caller, mirroring the sidecar discipline of the
parquet plane (``fetch.py``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def export_jsonl(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int = 32,
    compression: Optional[str] = None,
) -> None:
    """Write ``df`` as ``shard=N/`` JSONL directories under ``path``.

    ``n_shards`` sizes the export for the consumer (loader workers), not
    for Spark: each shard is one task's output after the hash repartition.
    ``compression`` may be ``gzip`` (universal for JSONL consumers).

    ``shard`` is the export's reserved partition-directory column; a frame
    that already carries one is refused loudly — ``withColumn`` would
    silently REPLACE the business column with the synthetic hash and the
    original data would be unrecoverable from the export. The write
    replaces any existing export at ``path`` (mode=overwrite).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if "shard" in df.columns:
        raise ValueError(
            "export_jsonl: input already has a 'shard' column, which is "
            "the export's reserved partition-directory name — rename it "
            "before exporting (the synthetic shard would overwrite it)"
        )
    out = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
    writer = (
        out.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read a JSONL export back under an explicit schema (plus the
    ``shard`` partition column Spark recovers from the directory names)."""
    return spark.read.schema(schema).json(path)
