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


def _murmur3_hash_long(value: int, seed: int = 42) -> int:
    """Spark's ``Murmur3_x86_32.hashLong`` (the hash behind ``F.hash``
    and hash partitioning, seed 42), as a signed 32-bit int — so shard
    placement can be computed driver-side. Parity with ``F.hash`` is
    pinned by test."""
    mask = 0xFFFFFFFF

    def mix_k1(k1: int) -> int:
        k1 = (k1 * 0xCC9E2D51) & mask
        k1 = ((k1 << 15) | (k1 >> 17)) & mask
        return (k1 * 0x1B873593) & mask

    def mix_h1(h1: int, k1: int) -> int:
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & mask
        return (h1 * 5 + 0xE6546B64) & mask

    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = mix_h1(seed & mask, mix_k1(v & mask))
    h1 = mix_h1(h1, mix_k1((v >> 32) & mask))
    h1 ^= 8
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & mask
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & mask
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def _collision_free_partition_count(n_shards: int) -> int:
    """Smallest partition count >= ``n_shards`` under which Spark's hash
    partitioning places every shard id 0..n-1 in its OWN partition.

    ``repartition(n_shards, "shard")`` hashes n values into n partitions
    — birthday collisions stack 2-4 shards on some write tasks and leave
    a third of them empty (measured at n=32: 20/32 tasks used, worst
    task 3 shards), so the export tail runs ~3x a balanced one (guide
    §2.5: synthetic keys with too few distinct values). Placement is a
    pure function of (value, count), so the fix is driver-side: probe
    counts until placement is injective. The search is cheap (a few
    dozen candidates at worst for realistic shard counts) and the empty
    partitions the larger count schedules are no-op tasks."""
    for n_parts in range(n_shards, 64 * n_shards + 1):
        seen = set()
        for s in range(n_shards):
            p = _murmur3_hash_long(s) % n_parts
            if p in seen:
                break
            seen.add(p)
        else:
            return n_parts
    return 64 * n_shards  # pragma: no cover — unreachable in practice


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
    # r16 (guide §2.5): a collision-free partition count — every shard
    # owns exactly one write task instead of hash collisions stacking
    # 2-4 shards on a task while a third of the tasks sit empty
    writer = (
        out.repartition(_collision_free_partition_count(n_shards), "shard")
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
