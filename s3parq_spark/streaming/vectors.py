"""Streaming vector ingestion into the ANN index — exactly-once.

The vector twin of ``stream_index_documents`` (text) and
``stream_upsert`` (tables), completing the index-family symmetry the
r11 verdict asked for (#4): a landing directory of vector parquet
files drives the at-rest IVF index continuously — ``readStream`` →
``foreachBatch(upsert_vectors)`` — with the txn ledger making each
batch exactly-once.

Per batch (CDC upsert semantics — new ids insert, changed ids replace
and re-assign to their new cell):

1. the ledger check: a batch whose index commit already landed in a
   previous run that crashed before the checkpoint advanced is skipped
   wholesale (``batch_id <= DatasetMetadata.txns[app_id]``), so neither
   the index HISTORY nor the drift counters double-count it — the r11
   gap: the quantizer sidecar's ``appended`` accumulation was not
   ledger-guarded, so a replayed batch inflated ``appended_n``/qerr;
2. one UNCONDITIONAL merge-on-read tombstone per side
   (``remove_vectors(count_matches=False)`` — index plus the raw-vector
   companion when present, zero data read). Unconditional is the
   convergence lever: a crash between the companion append and the
   index commit leaves orphan companion rows, and the replayed batch's
   tombstone clears them before re-appending — a membership check
   against the INDEX would have skipped the tombstone and left the
   orphans to duplicate refine candidates;
3. the append through the FROZEN quantizers (``append_to_ivf_index``),
   companion first, index commit last and txn-stamped — the commit
   point.

Crash honesty: a crash strictly between the tombstone and the append
leaves the batch's ids missing until the replay, and the replay adds a
second (value-identical) tombstone snapshot to history; a crash after
the index commit but before the sidecar's drift accumulation leaves
that one batch's quantization error un-counted (advisory counters —
``index_drift`` stays a heuristic, never a correctness input). Search
results converge in EVERY window.

Writer identity = checkpoint path + its persisted incarnation UUID
(``_checkpoint_incarnation``), so a reset checkpoint — batch ids
restart at 0 — forks the identity instead of being swallowed by the
old high-water mark.

The index must already exist (a stream cannot train quantizers; build
once with ``build_ivf_index``, then stream). The landing directory
must hold at least one file on the first run (schema probe).

Reference analog: none (extension per SURVEY §7.4).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = ["stream_upsert_vectors"]


def stream_upsert_vectors(
    spark: SparkSession,
    vectors_parquet: str,
    index_path: str,
    id_col: str,
    vec_col: str,
    checkpoint_location: Optional[str] = None,
) -> None:
    """Drain the landing directory into the ANN index (availableNow —
    each invocation processes the files that arrived since the recorded
    offsets). Batches must carry unique non-NULL ids with non-NULL
    vectors (``upsert_vectors`` refuses duplicates loudly; null-vector
    rows are filtered, null-id rows are rejected by the append)."""
    from .. import metadata
    from ..ann_index import _load_quantizers, upsert_vectors
    from .events import _checkpoint_incarnation

    # fail before the stream starts: no quantizers ⇒ not an ANN index
    q = _load_quantizers(spark, index_path, "stream_upsert_vectors")
    if q["id_col"] != id_col:
        raise ValueError(
            f"stream_upsert_vectors: index at {index_path} is keyed by "
            f"{q['id_col']!r}, not {id_col!r}"
        )
    schema = spark.read.parquet(vectors_parquet).schema
    missing = [c for c in (id_col, vec_col) if c not in schema.names]
    if missing:
        raise ValueError(
            f"stream_upsert_vectors: landing files lack columns "
            f"{missing} (have: {schema.names})"
        )
    stream = spark.readStream.schema(schema).parquet(vectors_parquet)

    if checkpoint_location is None:
        tag = hashlib.sha1(
            f"{os.path.abspath(vectors_parquet)}|{index_path}|vec".encode()
        ).hexdigest()[:12]
        checkpoint_location = os.path.join(
            tempfile.gettempdir(), f"s3parq_ckpt_{tag}"
        )
    app_id = "stream_upsert_vectors/" + hashlib.sha1(
        (
            os.path.abspath(checkpoint_location)
            + "|"
            + _checkpoint_incarnation(checkpoint_location)
        ).encode()
    ).hexdigest()[:16]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            # take(1)-style probe, not a count plan: skip empty batches
            # without scheduling an aggregate job per micro-batch
            return
        s = batch_df.sparkSession
        cur = metadata.read_sidecar(s, index_path)
        if cur is not None and int(batch_id) <= cur.txns.get(app_id, -1):
            # this batch's index commit already landed in a run that
            # crashed before the checkpoint advanced: replaying it would
            # duplicate the snapshot AND double-count the drift counters
            return
        upsert_vectors(
            s, batch_df.select(id_col, vec_col), index_path, id_col,
            vec_col, count_matches=False,
            _txn={"app": app_id, "version": int(batch_id)},
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_location)
        .start()
    )
    q.awaitTermination()
