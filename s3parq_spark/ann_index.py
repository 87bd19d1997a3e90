"""ANN vector index AT REST, with maintenance: IVF (flat or PQ-coded)
served from storage through the engine's partition-pruned fetch path.

``operators/similarity.py`` builds IVF/PQ structures per query — right
for ad-hoc analysis; the at-rest gate (``ivf_pq_at_rest``) showed the
serving layout: the corpus published ``partitionBy(cell)`` so a probe
reads only its cells' files. What r10 left missing (verdict #3) was the
MAINTENANCE story: new or changed vectors required republishing the
whole celled corpus. This module closes it by composing the r10
train/serve split (persisted deterministic quantizers —
``kmeans_centroids`` + ``pq_encode(books=)``) with the engine's
storage lifecycle:

- ``build_ivf_index`` trains the coarse quantizer (and optionally PQ
  codebooks) and publishes ``(id, cell, payload)`` partitioned by
  ``cell`` with id bloom fingerprints; the quantizers land in a JSON
  sidecar next to the dataset (the FAISS trained-index shape), stamped
  with the training corpus's mean quantization error.
- ``append_to_ivf_index`` assigns NEW vectors with the PERSISTED
  centroids/books — one shuffle-free projection, O(new) — and appends
  into the cell partitions; the appended batch's quantization error
  accumulates in the sidecar so drift is observable.
- ``remove_vectors`` is one zero-data-read merge-on-read tombstone per
  call (the same machinery as ``text_index.remove_documents``);
  ``compact_ivf_index`` materializes the accumulated debt across the
  index AND its raw-vector companion on the usual cadence.
- ``search_ivf_index`` ranks cells against the persisted centroids,
  issues ONE partition filter on ``cell`` (file-index prune), and
  scores candidates — exact cosine for flat indexes, ADC lookup-table
  adds for PQ — entirely in JVM expressions.
- ``index_drift`` compares appended vs training quantization error —
  the retrain signal (appends use frozen centroids; a distribution
  shift shows up as rising error, exactly FAISS's re-train heuristic).
  ``maintenance.dataset_health`` folds it in when the quantizer
  sidecar is present.

Scale shape at 100 TB: cells are hive partitions, so probes prune at
the file index (zero non-probed bytes read); appends touch only the
new rows' cells; removals are O(1) metadata commits; the driver holds
only the k×dim centroid matrix and m×codes×(dim/m) codebooks (bounded
quantizer state, never data). Training determinism (fixed init,
decimal-exact means) makes append-time encoding identical to what a
retrain over the same corpus would produce — the property the gate's
oracle replays in SQL.

Reference analog: none (extension per SURVEY §7.4).
"""

from __future__ import annotations

import json
import posixpath
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fs, metadata
from .fetch import fetch_path
from .filters import in_literals
from .local_frames import local_rows_df
from .operators.similarity import _cell_scores, kmeans_centroids, pq_encode
from .publish import delete_where, publish_path

__all__ = [
    "QuantizerEpochError",
    "rollback_rebuild",
    "append_to_ivf_index",
    "attach_vectors_companion",
    "build_ivf_index",
    "compact_ivf_index",
    "index_drift",
    "rebuild_ivf_index",
    "remove_vectors",
    "search_ivf_index",
    "search_ivf_index_batch",
    "upsert_vectors",
]


class QuantizerEpochError(RuntimeError):
    """The index rows and the quantizer sidecar disagree about which
    quantizers the rows were encoded against — the crash window between
    an ANN rebuild's index-dir rename and its quantizer-JSON rename.
    Serving would silently misprobe (and, for PQ, decode with the wrong
    codebooks), so every quantizer consumer refuses loudly instead."""


def _quantizers_path(index_path: str) -> str:
    return index_path.rstrip("/") + "_quantizers.json"


def _vectors_path(index_path: str) -> str:
    """Raw-vector companion (``store_vectors=True`` builds): (id, vec)
    with id bloom fingerprints — the point-lookup side table exact
    re-ranking reads O(candidate files) from, never the corpus."""
    return index_path.rstrip("/") + "_vectors"


def _cnorms(cents: list) -> list:
    return [max(1e-12, sum(x * x for x in v) ** 0.5) for v in cents]


def _assign_cells(df: DataFrame, vec_col: str, cents: list) -> DataFrame:
    """Attach the IVF cell (argmax of dot/||c|| — ties to the lowest cell
    id, matching ``kmeans_centroids``'s own assignment) as one
    shuffle-free vectorized pass (r16, guide §4.2 — bit-identical to the
    literal-matrix expression form; parity pinned by
    tests/test_assign_parity.py)."""
    from .operators.similarity import _assign_whole_vec

    tmp = "__assign_vec_d"
    out = _assign_whole_vec(
        df.withColumn(tmp, F.col(vec_col).cast("array<double>")),
        tmp, "cell", cents, _cnorms(cents),
    )
    return out.drop(tmp)


def _batch_qerr(df: DataFrame, vec_col: str, cents: list) -> tuple:
    """(n, sum of per-vector quantization error) where the error is
    ``1 - cos(v, assigned centroid)`` — decimal-exact accumulation so
    the recorded drift numbers don't depend on aggregation order.
    r16: the per-row error runs vectorized (guide §4.2, bit-identical
    to the expression form — see ``qerr_arrow``; 14 s → ~1 s at
    k=256·dim=64 over 200k sf1 vectors); the decimal-cast sum and the
    count stay in Catalyst, so the recorded drift doubles are unchanged
    to the bit."""
    from .operators.similarity import qerr_arrow

    base = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(vec_col).cast("array<double>").alias("__v")
    )
    scored = qerr_arrow(base, "__v", cents, _cnorms(cents))
    row = scored.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__qerr").cast("decimal(30,12)")).cast("double").alias("s"),
    ).collect()[0]
    return int(row["n"]), float(row["s"] or 0.0)


def _reject_null_ids(df: DataFrame, id_col: str, op: str) -> None:
    """A NULL-id row would be indexed yet permanently unremovable:
    ``remove_vectors`` drops ``None`` from its id list and
    ``upsert_vectors`` filters null ids before appending — so a null-id
    vector admitted here could never be replaced or deleted. Mirror the
    text index's non-NULL-key contract and refuse loudly (ADVICE r11).
    Only rows that would actually be INDEXED are checked (null-vector
    rows are filtered out upstream, like everywhere else)."""
    if df.filter(F.col(id_col).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"{op}: NULL {id_col} in the batch — a null-id vector could "
            "never be removed or upserted (every id predicate drops "
            "NULL); assign ids before indexing"
        )


def _write_quantizers(spark: SparkSession, index_path: str, q: dict) -> None:
    fs.write_text(spark, _quantizers_path(index_path), json.dumps(q))


def _quantizer_epoch(q: dict) -> str:
    """Deterministic content hash of the quantizer STATE the index rows
    depend on (centroids/books/geometry — not the drift counters, which
    appends legitimately advance under the same encoding). Stamped into
    both the quantizer JSON (``epoch``) and the index dataset's sidecar
    (``ann_epoch``, which travels atomically with the index directory in
    every rename-based swap), so a crash between a rebuild's two renames
    is DETECTABLE: the halves carry different epochs."""
    import hashlib

    payload = json.dumps(
        {
            "id_col": q["id_col"],
            "m": q["m"],
            "centroids": q["centroids"],
            "books": q["books"],
        },
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _load_quantizers(
    spark: SparkSession,
    index_path: str,
    op: str,
    check_epoch: bool = True,
) -> dict:
    p = _quantizers_path(index_path)
    if not fs.exists(spark, p):
        raise ValueError(
            f"{op}: no quantizer sidecar at {p} — not an ANN index "
            "(build_ivf_index first)"
        )
    q = json.loads(fs.read_text(spark, p))
    if not check_epoch:
        # rebuild_ivf_index passes False: it is the CONVERGING remedy
        # for a mismatch, reads only geometry from here plus raw vectors
        # from at-rest state (never decodes PQ codes), so it must not
        # refuse on the very state it exists to repair
        return q
    # crash-window refusal (r14): the index dir and the quantizer JSON
    # swap one rename apart during rebuild_ivf_index; if a crash split
    # them, serving with the mismatched half would misprobe SILENTLY.
    # Either side present requires the SAME value on the other: a
    # missing half counts as a mismatch — the crashed UPGRADE rebuild of
    # a pre-pin index leaves pinned-new rows with old epoch-less
    # quantizers, and a crashed overwrite-build's early window leaves an
    # unpinned fresh sidecar with the old stamped quantizers. Only a
    # fully UNPINNED family skips the check (pre-pin index at rest —
    # back-compat: neither half has ever been stamped).
    meta = metadata.read_sidecar(spark, index_path)
    pinned = meta.ann_epoch if meta is not None else None
    stamped = q.get("epoch")
    if (pinned or stamped) and pinned != stamped:
        raise QuantizerEpochError(
            f"{op}: quantizer epoch mismatch at {index_path} — the index "
            f"rows pin epoch {pinned or 'nothing'} but {p} carries "
            f"{stamped or 'no epoch stamp'}. A crash between an index "
            "build/rebuild's two commit steps leaves this state; re-run "
            "rebuild_ivf_index to converge forward, or "
            "rollback_rebuild(spark, index_path) to restore the parked "
            f"pre-rebuild family ({index_path.rstrip('/')}.prerebuild / "
            f"{p}.prerebuild)."
        )
    return q


def build_ivf_index(
    spark: SparkSession,
    vectors: DataFrame,
    index_path: str,
    id_col: str,
    vec_col: str,
    k: int = 16,
    iters: int = 2,
    m: Optional[int] = None,
    codes: int = 8,
    pq_iters: int = 1,
    max_records_per_file: Optional[int] = None,
    store_vectors: bool = False,
) -> None:
    """Train + publish the IVF index (overwrite — a rebuild). ``m=None``
    stores the vector itself per row (IVF-flat: exact scores inside the
    probed cells); ``m`` set stores PQ codes only (``m`` small ints per
    vector — the memory lever that fits billion-vector indexes). Either
    way the layout is ``partitionBy(cell)`` + id blooms, and the trained
    quantizers persist beside the dataset for O(new) appends.

    ``store_vectors=True`` (PQ builds) additionally publishes the raw
    vectors as an id-bloomed side dataset, enabling
    ``search_ivf_index(refine_factor=...)`` — FAISS's IndexRefineFlat:
    ADC ranks cheaply over codes, the top candidates' true vectors are
    point-fetched (bloom-pruned, O(candidate files)), and exact cosine
    re-ranks. Maintenance keeps the companion in step (appends append,
    removals tombstone)."""
    if "cell" in (id_col, vec_col):
        raise ValueError("'cell' is reserved for the IVF partition column")
    _reject_null_ids(
        vectors.filter(F.col(vec_col).isNotNull()), id_col,
        "build_ivf_index",
    )
    cents = kmeans_centroids(vectors, id_col, vec_col, k=k, iters=iters)
    assigned = _assign_cells(
        vectors.filter(F.col(vec_col).isNotNull()), vec_col, cents
    )
    books = None
    if m is not None:
        enc, books = pq_encode(
            assigned, id_col, vec_col, m=m, codes=codes,
            kmeans_iters=pq_iters,
        )
        rows = enc.select(
            F.col(id_col), "cell",
            *[F.col(f"__code_{j}").alias(f"code_{j}") for j in range(m)],
        )
    else:
        rows = assigned.select(
            F.col(id_col), "cell",
            F.col(vec_col).cast("array<double>").alias("vec"),
        )
    if store_vectors and m is None:
        raise ValueError(
            "build_ivf_index: store_vectors is for PQ builds — a "
            "flat index already stores the vectors themselves"
        )
    # The NEW quantizer epoch depends only on geometry (centroids/books
    # — not the drift counters), so it is known BEFORE any publish. An
    # overwrite-build over an EXISTING index used to fail OPEN in the
    # publish→pin gap: the overwritten sidecar CARRIES the old
    # ann_epoch, which still matches the old quantizer JSON, so a crash
    # there served the new rows against the OLD centroids silently
    # (found by this round's fault injection — pre-existing, the
    # sequential build had the same gap). Pre-pinning the NEW epoch
    # into the existing sidecar closes it: the overwrite carries the
    # new pin forward, and any crash before _write_quantizers leaves a
    # mismatched pair that refuses.
    new_epoch = _quantizer_epoch(
        {"id_col": id_col, "m": m, "centroids": cents, "books": books}
    )
    pre_meta = metadata.read_sidecar(spark, index_path)
    prev_epoch = None
    pre_pinned = None
    pre_companion = None
    if pre_meta is not None:
        prev_epoch = pre_meta.ann_epoch
        pre_meta.ann_epoch = new_epoch
        metadata.write_sidecar(spark, index_path, pre_meta)
        pre_pinned = pre_meta.to_dict()
        _pc = metadata.read_sidecar(spark, _vectors_path(index_path))
        pre_companion = None if _pc is None else _pc.to_dict()
    # The index publish, the optional raw-vector companion publish, and
    # the training-quality pass (_batch_qerr — read-only over the source
    # and the already-collected centroids) are mutually independent:
    # overlap them (guide §2.6) so the qerr scan back-fills the write
    # job's straggler tail. Warm sf1 flat build: 10.5 -> ~5.5 s (the
    # phases were publish 2.1 + qerr 2.9 serial). The crash-window
    # ordering is untouched: the sidecar epoch pin below still happens
    # only after the publish has committed.
    from concurrent.futures import ThreadPoolExecutor

    def _publish_index():
        publish_path(
            spark, index_path, rows, ["cell"], mode="overwrite",
            file_bloom_columns=[id_col],
            max_records_per_file=max_records_per_file,
        )

    def _publish_companion():
        if store_vectors:
            publish_path(
                spark, _vectors_path(index_path),
                assigned.select(
                    F.col(id_col),
                    F.col(vec_col).cast("array<double>").alias("vec"),
                ),
                [], mode="overwrite", file_bloom_columns=[id_col],
            )
        else:
            fs.delete(spark, _vectors_path(index_path))

    try:
        with ThreadPoolExecutor(max_workers=3) as pool:
            qerr_fut = pool.submit(_batch_qerr, vectors, vec_col, cents)
            pub_futs = [pool.submit(_publish_index),
                        pool.submit(_publish_companion)]
            for f in pub_futs:
                f.result()
            n, s = qerr_fut.result()
        q = {
            "id_col": id_col,
            "m": m,
            "centroids": cents,
            "books": books,
            "train": {"n": n, "sum_qerr": s},
            "appended": {"n": 0, "sum_qerr": 0.0},
        }
        q["epoch"] = new_epoch
        # pin the epoch in the index sidecar before the quantizer write:
        # the fresh-path build has no pre-existing sidecar to pre-pin
        # (the publish creates it), so the pin lands here; for the
        # overwrite-build the pre-pin above already covered the
        # publish→pin gap and this write is the (idempotent) re-stamp of
        # the same value
        idx_meta = metadata.read_sidecar(spark, index_path)
        if idx_meta is None:
            # publish_path above must have stamped a sidecar; reaching
            # here without one means the index publish did not complete
            # (or the path was clobbered between publish and pin) —
            # refuse with a diagnosable error instead of an opaque
            # AttributeError (ADVICE r14)
            raise ValueError(
                f"build_ivf_index: index publish left no sidecar at "
                f"{index_path} — the build did not commit; re-run it"
            )
        idx_meta.ann_epoch = q["epoch"]
        metadata.write_sidecar(spark, index_path, idx_meta)
        _write_quantizers(spark, index_path, q)
    except Exception:
        # ADVICE r15: an ORDINARY pre-write failure (validation error,
        # ConcurrentWriteError, sizing-sample job failure — all raised
        # before writer.parquet touches the data) leaves the old rows and
        # old quantizers fully consistent; without this handler the
        # pre-pin would force a previously healthy index to refuse until
        # a full rebuild. Restore the previous epoch ONLY when the
        # sidecar is still byte-identical to the pre-pinned write — any
        # destructive publish activity either commits a merged sidecar
        # (different dict) or deletes it with the data directory (None),
        # and in both cases the fail-closed pre-pin / missing sidecar
        # must stand. A hard crash never reaches this handler, so the
        # closed publish→pin window the fault-injection test pins is
        # unchanged.
        if pre_pinned is not None:
            try:
                cur = metadata.read_sidecar(spark, index_path)
                _cc = metadata.read_sidecar(spark, _vectors_path(index_path))
                cur_companion = None if _cc is None else _cc.to_dict()
                # the companion must be untouched too: its publish runs
                # concurrently, and an old-epoch index over a REWRITTEN
                # companion would refine against the wrong vectors
                if (
                    cur is not None
                    and cur.to_dict() == pre_pinned
                    and cur_companion == pre_companion
                ):
                    cur.ann_epoch = prev_epoch
                    metadata.write_sidecar(spark, index_path, cur)
            except Exception:
                pass  # best-effort: the fail-closed pre-pin stands
        raise


def append_to_ivf_index(
    spark: SparkSession,
    new_vectors: DataFrame,
    index_path: str,
    id_col: str,
    vec_col: str,
    validate_new_ids: bool = False,
    _txn: Optional[dict] = None,
) -> None:
    """Add NEW vectors in O(new): cell assignment and (for PQ indexes)
    encoding run against the PERSISTED quantizers — zero training jobs,
    one projection — and the rows append into the cell partitions.
    Caller contract: ids are not already indexed — ``upsert_vectors``
    is the replace path. ``validate_new_ids=True`` CHECKS it before
    writing (one id-bloom point fetch over the index, O(files holding
    the batch ids)); stated-not-checked remains the default because the
    check costs a read the contract usually makes redundant. The
    batch's quantization error accumulates in the
    quantizer sidecar (``index_drift`` is the retrain signal: appends
    never move the centroids, so a drifting distribution degrades
    recall silently without it).

    Commit order: the raw-vector companion (when present) appends
    FIRST, then the index rows — the index publish is the commit point
    (``_txn`` stamps it for the streaming ledger). A crash in between
    leaves companion rows whose ids are not yet indexed, which refine
    never reads (it point-fetches only indexed candidate ids) and which
    the streaming upsert path's unconditional tombstone clears on
    replay; the reverse order would leave INDEXED ids with no true
    vector — a silent refine miss. NULL ids are rejected loudly
    (ADVICE r11): a null-id row could never be removed or upserted."""
    q = _load_quantizers(spark, index_path, "append_to_ivf_index")
    if q["id_col"] != id_col:
        raise ValueError(
            f"append_to_ivf_index: index at {index_path} is keyed by "
            f"{q['id_col']!r}, not {id_col!r}"
        )
    cents = q["centroids"]
    batch = new_vectors.filter(F.col(vec_col).isNotNull())
    _reject_null_ids(batch, id_col, "append_to_ivf_index")
    if validate_new_ids:
        ids = [r[0] for r in batch.select(id_col).distinct().collect()]
        hit = fetch_path(
            spark, index_path,
            filters=[
                {"partition": id_col, "comparison": "==", "values": ids}
            ],
        ).select(id_col).limit(5).collect() if ids else []
        if hit:
            raise ValueError(
                "append_to_ivf_index: batch ids already indexed "
                f"(e.g. {[r[0] for r in hit]}) — appending would "
                "duplicate their rows; use upsert_vectors to replace"
            )
    assigned = _assign_cells(batch, vec_col, cents)
    if q["m"] is not None:
        enc, _ = pq_encode(
            assigned, id_col, vec_col, m=q["m"],
            codes=max(len(b) for b in q["books"]), books=q["books"],
        )
        rows = enc.select(
            F.col(id_col), "cell",
            *[
                F.col(f"__code_{j}").alias(f"code_{j}")
                for j in range(q["m"])
            ],
        )
    else:
        rows = assigned.select(
            F.col(id_col), "cell",
            F.col(vec_col).cast("array<double>").alias("vec"),
        )
    if rows.limit(1).count() == 0:
        return
    # The batch's quantization-error pass is read-only over the batch
    # and the already-loaded centroids — overlap it with the publishes
    # (guide §2.6). The COMMIT order is untouched: companion first,
    # then the index rows (the docstring's crash-window contract), and
    # the quantizer-counter write below still follows the index commit.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        qerr_fut = pool.submit(_batch_qerr, batch, vec_col, cents)
        if metadata.read_sidecar(spark, _vectors_path(index_path)) is not None:
            publish_path(
                spark, _vectors_path(index_path),
                batch.select(
                    F.col(id_col),
                    F.col(vec_col).cast("array<double>").alias("vec"),
                ),
                [], mode="append",
            )
        publish_path(spark, index_path, rows, ["cell"], mode="append", _txn=_txn)
        n, s = qerr_fut.result()
    q["appended"] = {
        "n": q["appended"]["n"] + n,
        "sum_qerr": q["appended"]["sum_qerr"] + s,
    }
    _write_quantizers(spark, index_path, q)


def remove_vectors(
    spark: SparkSession,
    ids: List,
    index_path: str,
    id_col: str,
    count_matches: bool = True,
) -> int:
    """Remove vectors by id: one zero-data-read merge-on-read tombstone
    (matches proven by the id-bloom-pruned point fetch, so the commit
    itself reads nothing). Idempotent; returns the number of vectors
    actually removed. ``compact_dataset`` materializes on the usual
    merge-on-read cadence.

    ``count_matches=False`` (r11 verdict #7) skips the membership
    point-fetch and tombstones UNCONDITIONALLY (returns -1 — unknown):
    the zero-job shape for callers that don't need the count, and the
    convergence lever for the streaming upsert sink — an unconditional
    tombstone clears companion rows a crash orphaned between the
    companion append and the index commit, which a membership check
    against the INDEX would skip."""
    q = _load_quantizers(spark, index_path, "remove_vectors")
    if q["id_col"] != id_col:
        raise ValueError(
            f"remove_vectors: index at {index_path} is keyed by "
            f"{q['id_col']!r}, not {id_col!r}"
        )
    want = sorted({i for i in ids if i is not None})
    if not want:
        return 0
    meta = metadata.read_sidecar(spark, index_path)
    if count_matches:
        present = fetch_path(
            spark, index_path,
            filters=[
                {"partition": id_col, "comparison": "==", "values": want}
            ],
        ).count()
        if not present:
            return 0
    else:
        present = -1
    vocab = meta.column_types.get(id_col, "string")
    pred = f"{id_col} IN ({in_literals(want, vocab)})"
    delete_where(
        spark, index_path, pred, mode="merge-on-read", count_matches=False
    )
    if metadata.read_sidecar(spark, _vectors_path(index_path)) is not None:
        delete_where(
            spark, _vectors_path(index_path), pred,
            mode="merge-on-read", count_matches=False,
        )
    return int(present)


def upsert_vectors(
    spark: SparkSession,
    vectors: DataFrame,
    index_path: str,
    id_col: str,
    vec_col: str,
    count_matches: bool = True,
    _txn: Optional[dict] = None,
) -> int:
    """REPLACE vectors by id (the CRUD corner append's not-already-
    indexed contract leaves open): one tombstone removes any existing
    rows under the batch's ids, then the batch appends through the
    frozen quantizers — a changed vector re-assigns to its NEW cell, so
    probes find it where the centroids say it now lives. Two commits
    (remove, then append): a crash between them loses the ids' rows
    until the re-run, never duplicates them — re-running the same batch
    converges. Returns the number of ids that were already indexed
    (replaced); the rest inserted.

    ``count_matches=False`` makes the tombstone UNCONDITIONAL (and the
    return value -1): one fewer point-fetch per call, and the streaming
    sink's convergence lever — see ``remove_vectors``. ``_txn`` stamps
    the append's index commit for the idempotent-writer ledger
    (``streaming.stream_upsert_vectors`` passes both)."""
    dup = (
        vectors.filter(F.col(id_col).isNotNull())
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter("__n > 1")
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            "upsert_vectors: batch ids must be unique (two rows under "
            f"one id would both survive the replace; offender: "
            f"{dup[0][0]!r})"
        )
    ids = [
        r[0]
        for r in vectors.select(id_col).distinct().collect()
        if r[0] is not None
    ]
    if not ids:
        return 0
    replaced = remove_vectors(
        spark, ids, index_path, id_col, count_matches=count_matches
    )
    append_to_ivf_index(
        spark, vectors.filter(F.col(id_col).isNotNull()),
        index_path, id_col, vec_col, _txn=_txn,
    )
    return replaced


def attach_vectors_companion(
    spark: SparkSession,
    index_path: str,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
) -> int:
    """Backfill the raw-vector companion for an EXISTING PQ index
    without a rebuild (r11 verdict #5) — enables
    ``search_ivf_index(refine_factor=...)`` on indexes built before
    ``store_vectors=True``, or whose companion was dropped. Publishes
    ``vectors`` as the id-bloomed side dataset (overwrite — the
    companion is derived state, replaceable wholesale).

    Id parity is VERIFIED before anything is written — a companion that
    disagrees with the index would silently corrupt refine (a missing
    candidate drops out of the exact re-rank; a stale extra can't be
    read but hides the drift): the batch must carry every indexed id
    exactly once (unique, non-NULL) and nothing else. Two anti-joins
    over the (id-only) index projection — O(index ids), a backfill-time
    cost, never paid at search. Returns the number of vectors
    attached."""
    q = _load_quantizers(spark, index_path, "attach_vectors_companion")
    if q["id_col"] != id_col:
        raise ValueError(
            f"attach_vectors_companion: index at {index_path} is keyed "
            f"by {q['id_col']!r}, not {id_col!r}"
        )
    if q["m"] is None:
        raise ValueError(
            "attach_vectors_companion: a flat index already stores its "
            "vectors — the companion is for PQ (code-only) indexes"
        )
    batch = vectors.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec")
    ).persist()
    try:
        _reject_null_ids(batch, id_col, "attach_vectors_companion")
        dup = (
            batch.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter("__n > 1").limit(1).collect()
        )
        if dup:
            raise ValueError(
                "attach_vectors_companion: batch ids must be unique "
                f"(offender: {dup[0][0]!r}) — refine point-fetches one "
                "true vector per candidate id"
            )
        idx_ids = fetch_path(spark, index_path).select(id_col)
        missing = (
            idx_ids.join(batch.select(id_col), id_col, "left_anti")
            .limit(5).collect()
        )
        if missing:
            raise ValueError(
                "attach_vectors_companion: indexed ids absent from the "
                f"batch (e.g. {[r[0] for r in missing]}) — refine would "
                "silently drop them from the exact re-rank"
            )
        extra = (
            batch.select(id_col).join(idx_ids, id_col, "left_anti")
            .limit(5).collect()
        )
        if extra:
            raise ValueError(
                "attach_vectors_companion: batch ids not in the index "
                f"(e.g. {[r[0] for r in extra]}) — attach exactly the "
                "indexed corpus"
            )
        n = batch.count()
        publish_path(
            spark, _vectors_path(index_path), batch, [],
            mode="overwrite", file_bloom_columns=[id_col],
        )
        return int(n)
    finally:
        batch.unpersist()


def compact_ivf_index(
    spark: SparkSession,
    index_path: str,
    max_records_per_file: Optional[int] = None,
) -> dict:
    """Materialize the index family's merge-on-read debt in one
    maintenance call — the ANN mirror of ``compact_text_index``.

    Continuous ingestion (``append_to_ivf_index`` batches,
    ``stream_upsert_vectors`` micro-batches) leaves one small file set
    per touched cell per commit, and every ``remove_vectors``/
    ``upsert_vectors`` leaves a tombstone that taxes each probe with a
    row filter over the pre-removal eras. This compacts the index
    dataset (cell partitioning, id blooms, and — when the index is a
    streaming sink — the exactly-once txn ledger all ride
    ``compact_dataset``'s sidecar carry-through) and, when present, the
    raw-vector companion, clustered by id (``sort_by``): refine's
    point-fetch pushes ``id IN (...)`` into the scan, so id-disjoint
    files let parquet row-group stats skip everything but the
    candidates' groups. Quantizers are a sibling JSON sidecar — the
    two-rename swap never touches them, so drift counters and frozen
    centroids/books survive by construction (pinned by test).

    Search before == search after (probes, scores, refine) — compaction
    only rewrites file geometry. Returns {member: n files rewritten}.
    """
    q = _load_quantizers(spark, index_path, "compact_ivf_index")
    from concurrent.futures import ThreadPoolExecutor

    from .publish import compact_dataset

    # index and companion are distinct datasets and each compaction is
    # content-preserving: run them concurrently (guide §2.6, the same
    # overlap as compact_text_index)
    def _compact_index():
        return compact_dataset(
            spark, index_path,
            max_records_per_file=max_records_per_file,
        )

    def _compact_companion():
        if metadata.read_sidecar(spark, _vectors_path(index_path)) is None:
            return None
        return compact_dataset(
            spark, _vectors_path(index_path),
            max_records_per_file=max_records_per_file,
            sort_by=[q["id_col"]],
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        idx_fut = pool.submit(_compact_index)
        comp_fut = pool.submit(_compact_companion)
        report = {"index": len(idx_fut.result())}
        comp = comp_fut.result()
        if comp is not None:
            report["vectors"] = len(comp)
    return report


def rebuild_ivf_index(
    spark: SparkSession,
    index_path: str,
    vectors: Optional[DataFrame] = None,
    vec_col: str = "vec",
    k: Optional[int] = None,
    iters: int = 2,
    codes: Optional[int] = None,
    pq_iters: int = 1,
    max_records_per_file: Optional[int] = None,
    drop_tags: bool = False,
) -> dict:
    """Retrain-and-swap: the REMEDY for ``index_drift`` (r12 left it
    advisory-only). Appends encode against frozen quantizers, so a
    shifted distribution quantizes worse and recall decays silently;
    past the drift threshold the fix is new quantizers trained over the
    CURRENT corpus — which this does without the caller hand-running
    ``build_ivf_index`` and swapping paths themselves.

    The current corpus is recovered from at-rest state: a flat index
    stores its vectors per row; a PQ index reads its raw-vector
    companion (``store_vectors=True`` builds). A PQ index WITHOUT a
    companion has no true vectors at rest — pass ``vectors`` explicitly
    (it then DEFINES the rebuilt corpus; ``attach_vectors_companion``
    is the parity-checked way to make future rebuilds self-sufficient).
    Geometry carries by default: same k, same m, same codes — override
    k/codes to re-size while retraining.

    Swap discipline: the new family (index, companion, quantizer
    sidecar) is built COMPLETELY in sibling temp paths — the same
    deterministic Lloyd training as ``build_ivf_index`` — then swapped
    in with two renames per member, old state parked at ``.prerebuild``
    until the swap completes. The exactly-once txn ledger carries into
    the rebuilt index sidecar (a streaming sink's crash-replay after a
    routine rebuild must not re-apply a committed batch — the same
    carry compaction does); drift counters reset (train = the new
    corpus, appended = 0) because the new quantizers ARE trained on
    everything current. Crash-window honesty (r14: fail-LOUD): the
    index directory and the quantizer JSON are two storage objects, so
    a crash between their swaps (one rename apart) leaves new cells
    paired with old centroids — but the index sidecar pins the epoch of
    the quantizers its rows were encoded against (``ann_epoch``,
    riding inside the directory rename), so every quantizer consumer
    raises ``QuantizerEpochError`` in that window instead of silently
    misprobing. Re-running the rebuild converges; the parked
    ``.prerebuild`` state allows manual restore. A failed rename
    mid-swap unwinds every already-swapped member in reverse, leaving
    the old family fully live.

    Returns ``{"n_vectors", "k", "m", "train_qerr",
    "prev_train_qerr", "prev_drift_ratio"}``.
    """
    from .publish import TagPinnedError, _require_no_staged

    q = _load_quantizers(
        spark, index_path, "rebuild_ivf_index", check_epoch=False
    )
    id_col = q["id_col"]
    old_meta = metadata.read_sidecar(spark, index_path)
    if old_meta is None:
        raise ValueError(
            f"rebuild_ivf_index: no dataset sidecar at {index_path}"
        )
    _require_no_staged(old_meta, index_path, "rebuild_ivf_index")
    if old_meta.tags and not drop_tags:
        raise TagPinnedError(
            f"rebuild_ivf_index: snapshot tags {old_meta.tags} at "
            f"{index_path} pin versions the rewrite would destroy; "
            "delete_tag them or pass drop_tags=True"
        )
    has_companion = (
        metadata.read_sidecar(spark, _vectors_path(index_path)) is not None
    )
    if vectors is None:
        if q["m"] is None:
            vectors = fetch_path(spark, index_path).select(
                F.col(id_col), F.col("vec")
            )
        elif has_companion:
            vectors = fetch_path(spark, _vectors_path(index_path)).select(
                F.col(id_col), F.col("vec")
            )
        else:
            raise ValueError(
                "rebuild_ivf_index: a PQ index without a raw-vector "
                "companion has no true vectors at rest — pass the "
                "current corpus as `vectors` (or "
                "attach_vectors_companion first)"
            )
        vec_col = "vec"

    try:
        prev_drift = index_drift(spark, index_path)
    except QuantizerEpochError:
        # re-run after a crashed swap: the mismatched halves make the
        # pre-rebuild drift numbers meaningless — report-only fields, so
        # degrade instead of refusing the converging remedy
        prev_drift = {"train_qerr": None, "drift_ratio": None}
    k = int(k) if k is not None else len(q["centroids"])
    m = q["m"]
    if codes is None:
        codes = max(len(b) for b in q["books"]) if q["books"] else 8

    tmp = index_path.rstrip("/") + ".rebuilding"
    for p in (tmp, _vectors_path(tmp), _quantizers_path(tmp)):
        fs.delete(spark, p)
    build_ivf_index(
        spark, vectors, tmp, id_col, vec_col,
        k=k, iters=iters, m=m, codes=codes, pq_iters=pq_iters,
        max_records_per_file=max_records_per_file,
        store_vectors=(m is not None and has_companion),
    )
    if old_meta.txns:
        tmp_meta = metadata.read_sidecar(spark, tmp)
        tmp_meta.txns = dict(old_meta.txns)
        if tmp_meta.snapshots:
            # squash-base stamp, same as compaction: keeps the claims
            # provable from history across a later restore_dataset
            tmp_meta.snapshots[-1]["txns"] = dict(old_meta.txns)
        metadata.write_sidecar(spark, tmp, tmp_meta)
    new_q = json.loads(fs.read_text(spark, _quantizers_path(tmp)))

    # swap each member: park old at .prerebuild, rename new in. The
    # index dir and quantizer JSON swap back-to-back (see docstring).
    swaps = [(index_path, tmp)]
    if m is not None and has_companion:
        swaps.append((_vectors_path(index_path), _vectors_path(tmp)))
    swaps.append((_quantizers_path(index_path), _quantizers_path(tmp)))
    # a failed rename must unwind EVERY member already swapped, in
    # reverse, not just the failing one: members swap index-dir-first,
    # so a partial swap would leave a live index served against the old
    # quantizer sidecar — for PQ that decodes with the WRONG codebooks,
    # not just misprobes. (The epoch pin would make serving refuse, but
    # an error return must leave the old family fully live, not wedged.)
    done: list = []  # (live, fresh, old) completed swaps, in order

    def _unwind() -> None:
        for live, fresh, old in reversed(done):
            fs.rename(spark, live, fresh)  # new state back to its temp
            if fs.exists(spark, old):
                fs.rename(spark, old, live)  # parked old state back live

    for live, fresh in swaps:
        old = live.rstrip("/") + ".prerebuild"
        fs.delete(spark, old)
        if fs.exists(spark, live) and not fs.rename(spark, live, old):
            _unwind()
            raise IOError(
                f"rebuild_ivf_index: could not move {live} aside"
            )
        if not fs.rename(spark, fresh, live):
            if fs.exists(spark, old):
                fs.rename(spark, old, live)  # roll this member back
            _unwind()
            raise IOError(
                f"rebuild_ivf_index: could not swap in {fresh}"
            )
        done.append((live, fresh, old))
    for live, _, old in done:
        # park-time stamp before the cleanup delete (ADVICE r14): a
        # crash in this window leaves parked trees whose mtimes rename
        # preserved — the stamp's own mtime carries the actual park
        # time so the maintenance sweep's retention window works. Only
        # directory members take a stamp (the quantizer JSON is a
        # file; its crash window is covered by the epoch-mismatch
        # sweep suspension and the live-sibling age gate).
        if not live.endswith(".json"):
            fs.stamp_parked(spark, old)
        fs.delete(spark, old)
    if m is not None and not has_companion:
        # caller-supplied corpus for a companion-less PQ index: the
        # rebuild does not manufacture a companion the operator never
        # declared (attach_vectors_companion is the opt-in for that)
        fs.delete(spark, _vectors_path(index_path))
    train = new_q["train"]
    return {
        "n_vectors": int(train["n"]),
        "k": k,
        "m": m,
        "train_qerr": train["sum_qerr"] / max(1, train["n"]),
        "prev_train_qerr": prev_drift["train_qerr"],
        "prev_drift_ratio": prev_drift["drift_ratio"],
    }


def rollback_rebuild(spark: SparkSession, index_path: str) -> dict:
    """Roll a CRASHED rebuild swap back to the parked pre-rebuild family
    — the programmatic form of the manual restore every
    ``QuantizerEpochError`` names (r14). For each family member whose
    ``.prerebuild`` sibling exists, the partially-swapped NEW state is
    deleted (it was never fully committed and is fully derivable — a
    re-run of ``rebuild_ivf_index`` reproduces it from the restored
    at-rest corpus) and the parked old state renamed back live, in
    REVERSE swap order (quantizers, companion, index — the same order
    the failed-rename unwind uses): a crash mid-rollback leaves a
    half-pinned family that REFUSES, never one that silently misprobes.

    Refuses when there is nothing parked, and when the live family is
    already CONSISTENT (epochs agree) — then the rebuild completed and
    the parked state is residue, not a rollback point; deleting a
    healthy new index because leftover temp dirs exist would be data
    loss (``maintain_dataset(vacuum_retention_hours=...)`` sweeps aged
    residue instead). Returns ``{"restored": [paths...]}``."""
    members = [
        _quantizers_path(index_path),
        _vectors_path(index_path),
        index_path,
    ]
    parked = [
        (live, live.rstrip("/") + ".prerebuild")
        for live in members
        if fs.exists(spark, live.rstrip("/") + ".prerebuild")
    ]
    if not parked:
        raise ValueError(
            f"rollback_rebuild: no parked .prerebuild state at "
            f"{index_path} — nothing to roll back"
        )
    consistent = True
    try:
        _load_quantizers(spark, index_path, "rollback_rebuild")
    except (QuantizerEpochError, ValueError):
        consistent = False
    if consistent:
        raise ValueError(
            f"rollback_rebuild: the live family at {index_path} is "
            "consistent (the rebuild swap completed) — the parked "
            ".prerebuild state is residue, not a rollback point; "
            "vacuum it via maintain_dataset(vacuum_retention_hours=...) "
            "instead of destroying a healthy index"
        )
    restored = []
    for live, old in parked:
        fs.delete(spark, live)
        if not fs.rename(spark, old, live):
            raise IOError(
                f"rollback_rebuild: could not restore {old} to {live}"
            )
        restored.append(live)
    # converged: the restored family must load cleanly
    _load_quantizers(spark, index_path, "rollback_rebuild")
    # the crashed attempt's temp state is now pure residue
    tmp = index_path.rstrip("/") + ".rebuilding"
    for p in (tmp, _vectors_path(tmp), _quantizers_path(tmp)):
        fs.delete(spark, p)
    return {"restored": restored}


def search_ivf_index(
    spark: SparkSession,
    index_path: str,
    query_vec: List[float],
    k: int = 10,
    nprobe: int = 4,
    refine_factor: Optional[int] = None,
) -> DataFrame:
    """Top-``k`` ids for ``query_vec`` from the index alone: the persisted
    centroids rank cells driver-side (k×dim floats), ONE partition
    filter prunes the scan to the probed cells' files, and scoring is a
    JVM projection — exact cosine against the stored vector (flat) or
    the ADC lookup-table sum (PQ). Returns ``(id, score)`` ordered by
    score desc, id asc.

    ``refine_factor=f`` (PQ + ``store_vectors`` builds — FAISS's
    IndexRefineFlat): ADC selects the top ``k*f`` candidates cheaply
    over codes, their TRUE vectors point-fetch from the id-bloomed
    companion (O(candidate files), never the corpus), and exact cosine
    re-ranks the final ``k`` — quantization error leaves the top of the
    list at the cost of k*f point reads."""
    q = _load_quantizers(spark, index_path, "search_ivf_index")
    id_col = q["id_col"]
    cents, qv = q["centroids"], [float(x) for x in query_vec]
    cn = _cnorms(cents)
    order = sorted(
        range(len(cents)),
        key=lambda j: (
            -sum(a * b for a, b in zip(qv, cents[j])) / cn[j],
            j,
        ),
    )
    cells = sorted(order[: max(1, nprobe)])
    hits = fetch_path(
        spark, index_path,
        filters=[{"partition": "cell", "comparison": "==", "values": cells}],
    )
    if q["m"] is not None:
        sub = len(q["books"][0][0])
        score = None
        for j, book in enumerate(q["books"]):
            qj = qv[j * sub : (j + 1) * sub]
            lut = [float(sum(a * b for a, b in zip(qj, c))) for c in book]
            term = F.element_at(
                F.lit(lut), (F.col(f"code_{j}") + 1).cast("int")
            )
            score = term if score is None else score + term
    else:
        qn = max(1e-12, sum(x * x for x in qv) ** 0.5)
        dot = F.aggregate(
            F.zip_with(F.col("vec"), F.lit(qv), lambda a, b: a * b),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        vnorm = F.greatest(
            F.lit(1e-12),
            F.sqrt(
                F.aggregate(
                    F.col("vec"), F.lit(0.0), lambda a, x: a + x * x
                )
            ),
        )
        score = dot / (vnorm * F.lit(qn))
    ranked = (
        hits.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
    )
    if refine_factor is None:
        return ranked.limit(k)
    if q["m"] is None:
        raise ValueError(
            "search_ivf_index: refine_factor is for PQ indexes — a flat "
            "index already scores exact cosine"
        )
    vp = _vectors_path(index_path)
    if metadata.read_sidecar(spark, vp) is None:
        raise ValueError(
            f"search_ivf_index: no vectors companion at {vp} — rebuild "
            "with build_ivf_index(store_vectors=True) to enable "
            "refine_factor"
        )
    # candidate ids collect to the driver (k*f, bounded — the same
    # boundedness as every filter-values list), then point-fetch their
    # TRUE vectors through the id blooms
    cand = [
        r[0] for r in ranked.limit(max(k, k * int(refine_factor))).collect()
    ]
    if not cand:
        return ranked.limit(0)
    true_vecs = fetch_path(
        spark, vp,
        filters=[{"partition": id_col, "comparison": "==", "values": cand}],
    )
    qn = max(1e-12, sum(x * x for x in qv) ** 0.5)
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.lit(qv), lambda a, b: a * b),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    vnorm = F.greatest(
        F.lit(1e-12),
        F.sqrt(
            F.aggregate(F.col("vec"), F.lit(0.0), lambda a, x: a + x * x)
        ),
    )
    return (
        true_vecs.select(
            F.col(id_col), (dot / (vnorm * F.lit(qn))).alias("score")
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def search_ivf_index_batch(
    spark: SparkSession,
    index_path: str,
    queries: dict,
    k: int = 10,
    nprobe: int = 4,
    refine_factor: Optional[int] = None,
) -> DataFrame:
    """Serve MANY query vectors in ONE pass over the index — the batch
    shape of ``ivf_batch_topk``, at rest: every query's probed cells are
    ranked driver-side against the persisted centroids (nq × k×dim
    float work — quantizer state, not data), the UNION of probed cells
    issues a single partition-pruned fetch, a broadcast
    (query_id, cell[, per-query scoring state]) frame restricts each
    candidate row to the queries that probed its cell, and one windowed
    top-k per query ranks. Per-query results are BIT-IDENTICAL to
    ``search_ivf_index`` per query (pinned by test): flat indexes score
    exact cosine against the stored vector; PQ indexes score the ADC
    lookup-table sum with per-query LUTs carried on the broadcast
    frame. Returns (query_id, id, score), ordered within each query by
    score desc, id asc.

    ``refine_factor=f`` (PQ + companion builds — r11 verdict #6, batch
    parity with per-query refine): each query's top ``k*f`` ADC
    candidates are collected (bounded: nq × k×f id pairs — the same
    boundedness as the per-query path), ONE union point-fetch pulls
    every candidate's true vector from the id-bloomed companion
    (O(candidate files), never the corpus), and exact cosine re-ranks
    per query — bit-identical to ``search_ivf_index(refine_factor=f)``
    per query (pinned by test)."""
    from pyspark.sql.window import Window

    if not queries:
        raise ValueError("search_ivf_index_batch needs at least one query")
    q = _load_quantizers(spark, index_path, "search_ivf_index_batch")
    id_col = q["id_col"]
    cents = q["centroids"]
    cn = _cnorms(cents)
    per_q = {}
    for qid, vec in queries.items():
        qv = [float(x) for x in vec]
        order = sorted(
            range(len(cents)),
            key=lambda j: (
                -sum(a * b for a, b in zip(qv, cents[j])) / cn[j], j,
            ),
        )
        per_q[str(qid)] = (qv, sorted(order[: max(1, nprobe)]))
    all_cells = sorted({c for _, cells in per_q.values() for c in cells})
    hits = fetch_path(
        spark, index_path,
        filters=[
            {"partition": "cell", "comparison": "==", "values": all_cells}
        ],
    )
    if q["m"] is not None:
        sub = len(q["books"][0][0])
        rows = []
        for qid, (qv, cells) in per_q.items():
            luts = [
                [
                    float(sum(a * b for a, b in zip(
                        qv[j * sub:(j + 1) * sub], c
                    )))
                    for c in book
                ]
                for j, book in enumerate(q["books"])
            ]
            rows.extend((qid, c, luts) for c in cells)
        qframe = local_rows_df(
            spark, rows,
            "query_id string, cell int, luts array<array<double>>",
        )
        score = None
        for j in range(q["m"]):
            term = F.element_at(
                F.element_at("luts", j + 1),
                (F.col(f"code_{j}") + 1).cast("int"),
            )
            score = term if score is None else score + term
    else:
        rows = []
        for qid, (qv, cells) in per_q.items():
            qn = max(1e-12, sum(x * x for x in qv) ** 0.5)
            rows.extend((qid, c, qv, qn) for c in cells)
        qframe = local_rows_df(
            spark, rows,
            "query_id string, cell int, qv array<double>, qn double",
        )
        dot = F.aggregate(
            F.zip_with(F.col("vec"), F.col("qv"), lambda a, b: a * b),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        vnorm = F.greatest(
            F.lit(1e-12),
            F.sqrt(
                F.aggregate(
                    F.col("vec"), F.lit(0.0), lambda a, x: a + x * x
                )
            ),
        )
        score = dot / (vnorm * F.col("qn"))
    scored = (
        hits.withColumn("cell", F.col("cell").cast("int"))
        .join(F.broadcast(qframe), "cell")
        .select("query_id", F.col(id_col), score.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc(id_col)
    )
    if refine_factor is None:
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
            .orderBy("query_id", F.desc("score"), F.asc(id_col))
        )
    if q["m"] is None:
        raise ValueError(
            "search_ivf_index_batch: refine_factor is for PQ indexes — "
            "a flat index already scores exact cosine"
        )
    vp = _vectors_path(index_path)
    if metadata.read_sidecar(spark, vp) is None:
        raise ValueError(
            f"search_ivf_index_batch: no vectors companion at {vp} — "
            "rebuild with build_ivf_index(store_vectors=True) or "
            "attach_vectors_companion to enable refine_factor"
        )
    topf = max(k, k * int(refine_factor))
    cand = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= topf)
        .select("query_id", id_col)
        .collect()
    )
    if not cand:
        empty = scored.limit(0).select("query_id", F.col(id_col), "score")
        return empty
    all_ids = sorted({r[id_col] for r in cand})
    true_vecs = fetch_path(
        spark, vp,
        filters=[
            {"partition": id_col, "comparison": "==", "values": all_ids}
        ],
    )
    from pyspark.sql import types as T

    pairs = local_rows_df(
        spark,
        [(r["query_id"], r[id_col]) for r in cand],
        T.StructType([
            T.StructField("query_id", T.StringType()),
            T.StructField(id_col, true_vecs.schema[id_col].dataType),
        ]),
    )
    qrows = [
        (qid, qv, max(1e-12, sum(x * x for x in qv) ** 0.5))
        for qid, (qv, _) in per_q.items()
    ]
    q2 = local_rows_df(
        spark, qrows, "query_id string, qv array<double>, qn double"
    )
    dot = F.aggregate(
        F.zip_with(F.col("vec"), F.col("qv"), lambda a, b: a * b),
        F.lit(0.0), lambda a, x: a + x,
    )
    vnorm = F.greatest(
        F.lit(1e-12),
        F.sqrt(F.aggregate(F.col("vec"), F.lit(0.0),
                           lambda a, x: a + x * x)),
    )
    exact = (
        true_vecs.join(F.broadcast(pairs), id_col)
        .join(F.broadcast(q2), "query_id")
        .select(
            "query_id", F.col(id_col),
            (dot / (vnorm * F.col("qn"))).alias("score"),
        )
    )
    return (
        exact.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .orderBy("query_id", F.desc("score"), F.asc(id_col))
    )


def index_drift(spark: SparkSession, index_path: str) -> dict:
    """The retrain signal: mean quantization error of the appended
    vectors vs the training corpus. Appends encode against FROZEN
    quantizers, so a shifted distribution quantizes worse — recall
    degrades with no correctness error anywhere. A ratio drifting past
    ~1.2–1.5 is the usual rebuild trigger (advisory, like every health
    number). Metadata-only: reads the quantizer sidecar, never data."""
    q = _load_quantizers(spark, index_path, "index_drift")
    train = q["train"]["sum_qerr"] / max(1, q["train"]["n"])
    app = q["appended"]
    appended = app["sum_qerr"] / app["n"] if app["n"] else None
    return {
        "train_qerr": train,
        "appended_qerr": appended,
        "appended_n": app["n"],
        "drift_ratio": (
            appended / train if appended is not None and train > 0 else None
        ),
    }
