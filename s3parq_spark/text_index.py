"""Text search index AT REST: BM25 retrieval without scanning the corpus.

``bm25_scores`` (operators/text.py) answers a query by tokenizing the
whole corpus per query — right for ad-hoc analysis, wrong for a serving
path: at 100 TB of documents every search would be a full scan. This
module materializes the classic inverted-index layout as a normal engine
dataset and answers the SAME BM25 ranking from the index alone:

- ``build_text_index`` tokenizes the corpus (one exploded pass feeding
  the tf and dl aggregates) and publishes posting rows ``(term, doc id,
  tf, dl)`` under a HIDDEN bucket partition — ``derived_partitions``
  records ``bucket = hash60(term) % n_buckets`` in the sidecar, so the
  layout is the dataset's own contract, not caller-side bookkeeping —
  with a per-file BLOOM fingerprint on ``term`` (round 9's point-lookup
  plane), plus a 1-row corpus-stats dataset (n_docs, total_len, and the
  build's ``max_df`` so maintenance ops can enforce its semantics) and a
  per-doc length dataset ``(id, dl)`` bloom-fingerprinted on the id —
  the point-lookup side table ``reindex_documents`` folds stats with.
  Per-term document frequency is NOT stored: all postings of a term are
  co-located, so ``df_t`` falls out of the fetched rows themselves.
- ``search_text_index`` issues ONE filter, on ``term``. The engine's
  hidden-partition pushdown computes the query terms' buckets from the
  recorded transform (file-index prune), the pushdown residual drives
  the bloom prune inside the kept buckets (r9's residual/data-skipping
  composition), and the exact predicate re-applies row-level. Scoring
  uses literally the same expression sequence as ``bm25_scores``, so
  the result is bit-identical to running it over the original corpus
  (pinned by test). Query cost is O(postings of the query terms), never
  O(corpus).
- ``append_to_text_index`` adds NEW documents in O(new docs);
  ``reindex_documents`` replaces CHANGED documents in O(changed docs)
  by composing the engine's equality key-deletes (merge-on-read upsert
  machinery): one snapshot deletes a doc's old posting list under its
  id key and appends the new one.

Scale notes: posting rows are (term, id, 2 ints) — a few percent of the
corpus bytes; a stop-term's posting list splits across files
(maxRecordsPerFile), and ``max_df`` drops terms above a document-
frequency cap from SEARCH (standard stopword semantics, the one stated
divergence from corpus-side BM25).

``max_df`` + maintenance (r11, closing the r10 "maintenance-dead"
gap): a capped build keeps EVERY posting, physically split — under-cap
terms in the live index (all search ever reads: query cost stays
O(useful postings), stop terms cost nothing at query time), over-cap
terms in a sibling ``{index}_stopped`` dataset with the identical
bucket/bloom layout — plus a forward side table ``{index}_fwd`` of
``(id, term)`` pairs, id-bloom-fingerprinted, so maintenance can learn
a changed/removed document's OLD vocabulary with a point fetch instead
of an index scan. The invariant: a term's posting list lives whole in
exactly one of live/stopped, live ⟺ df ≤ max_df. Maintenance
re-derives df exactly for the batch-affected terms only (increments
from the batch, decrements from the forward table, current counts from
ONE term-pruned live∪stopped fetch — live counts are ≤ max_df
rows/term by the invariant, and the affected stop terms' rows are read
once for residency and count together) and MOVES crossing terms'
posting lists between the two datasets. The move rides the same
commit as the batch-routed append — one publish per destination
dataset per maintenance call (r11 verdict #3) — and the moved terms'
sources tombstone after (copy first: a crash between the append and
its tombstones leaves a term double-resident in favor of the copy;
``repair_capped_index`` detects and fixes it exactly — bounded by
stop-term cardinality, never a rebuild). One more capped crash window, stated plainly: a capped
reindex that committed its id tombstones but crashed before its
appends leaves df counts the RE-RUN's classification reads
post-delete while the forward table still holds the pre-crash pairs —
the re-run can misclassify a term near the cap (a COMPLETED capped
reindex re-run converges exactly: the forward table then agrees with
the batch, so every delta cancels). Search therefore equals a full
rebuild-with-max_df over the updated corpus exactly (gated). The
driver holds the batch's distinct-term list, the same change-set
boundedness contract as the changed-id lists. Capped indexes built
BEFORE the forward table existed (r10) still refuse maintenance
loudly: without the stopped postings and forward pairs the cap cannot
be enforced incrementally; rebuild.

Commit discipline: a REBUILD writes three datasets (index, doclens,
stats) non-atomically; rebuild into a fresh path and repoint readers —
the same recommendation every multi-dataset pipeline in this engine
follows. Incremental writes commit postings, then doclens, then the
stats row; a crash between commits leaves n_docs/total_len stale, and —
honesty over optimism — NO later incremental write recomputes them from
ground truth (each folds forward from the stored row; a reindex/removal
replayed after a partial crash finds its doclens rows already written/
tombstoned and folds nothing). ``repair_index_stats`` is the recovery
tool: it recomputes the stats row from the doclens side table (one
O(docs) scan of 2-column rows, never the corpus) — run it after any
crashed maintenance op. The index itself cannot be corrupted by the
window: postings and doclens are keyed, replayable state; re-running
the SAME append after a partial failure is NOT idempotent (duplicate
postings), re-running the same reindex IS (key-deletes replace).

Fail-loud crash windows (r15): both documented silent-damage states —
the half-moved posting list and the stale stats fold — are now
DETECTED, not just repairable. Every completed op's final stats write
stamps the postings/stopped head versions into both the stats and
postings sidecars (``_stamp_family_epoch``); searches and maintenance
ops recompute the token from the live heads and raise
``TextIndexEpochError`` on any disagreement, naming the repair pair.
A pre-r15 family serves unstamped (back-compat) until its first
maintenance op adopts it. This is the same sidecar-authority contract
as the reference's stamped-metadata plane
(/root/reference/s3parq/publish_parq.py:259-266, applied as the r14
ANN epoch pin was): state that can be wrong must be detectably wrong.

Reference analog: none (extension per SURVEY §7.4).
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fs
from .fetch import fetch_path

# shared with ann_index (r11 verdict #7): the typed IN-literal builder
# lives with the rest of the predicate vocabulary in filters.py
from .filters import in_literals as _in_literals
from .local_frames import local_rows_df
from .publish import eq_delete_append, publish_path

__all__ = [
    "TextIndexEpochError",
    "append_to_text_index",
    "build_text_index",
    "compact_text_index",
    "reindex_documents",
    "remove_documents",
    "repair_capped_index",
    "repair_index_stats",
    "search_text_index",
    "search_text_index_batch",
    "text_index_info",
]


class TextIndexEpochError(RuntimeError):
    """The text-index family's commit stamps disagree with its live
    state: a maintenance op crashed somewhere in its multi-commit
    sequence (module docstring), leaving either a half-moved posting
    list (search would double-count the term) or stale BM25 constants
    (every score would be skewed). Raised at serve AND maintenance time
    instead of silently serving the damage — run
    ``repair_capped_index`` then ``repair_index_stats`` to converge
    (the r14 ANN quantizer-epoch discipline applied to the text
    family)."""

#: the recorded hidden-partition transform (term -> bucket): the engine's
#: portable 60-bit md5 folded to the bucket count. Stored in the sidecar
#: at build; search never computes it — hidden-partition pushdown does.
_BUCKET_EXPR = (
    "cast(pmod(cast(conv(substring(md5(cast(term as binary)), 1, 15), "
    "16, 10) as bigint), {n}) as int)"
)

_POSTING_COLS = ("term", "tf", "dl", "bucket")

#: rows-per-file for maintenance-plane appends: posting/pair rows are a
#: few dozen bytes, so this keeps the 60 MB file contract while letting
#: the publish skip its sizing sample — maintenance batches are change
#: sets, far below one file's worth (see publish_path _write_hints)
_MAINT_ROWS_PER_FILE = 2_000_000

#: capped builds route rows live/stopped by driver-held over-cap term
#: set when it is at most this large (the set is bounded by
#: total_postings/max_df — a handful of high-df terms for any stopword
#: cap); degenerate caps past it fall back to the window tagging, which
#: never collects terms. Env-overridable for constrained drivers.
_STOP_TERMS_DRIVER_MAX = int(
    os.environ.get("SPARK_GRAFT_STOP_TERMS_DRIVER_MAX", "65536")
)


def _n_buckets_of(meta) -> Optional[int]:
    """The bucket count recorded in the index's derived-partition
    transform (None for a non-engine layout)."""
    import re as _re

    expr = (meta.derived_partitions or {}).get("bucket", "")
    m = _re.search(r"%?\s*(?:pmod[^,]*,\s*)?(\d+)\)+\s*as int", expr)
    return int(m.group(1)) if m else None


def _bucket_of(term: str, n_buckets: int) -> int:
    """Driver-side twin of ``_BUCKET_EXPR`` — the same portable 60-bit
    md5 fold the JVM computes at write, so maintenance can hand publish
    the exact hive dirs a batch touches without a distinct job
    (JVM⇄driver parity pinned by test, the bloom plane's contract)."""
    import hashlib

    return int(
        hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16
    ) % n_buckets


def _bucket_dirs(meta, terms) -> Optional[List[str]]:
    """``touched_dirs`` publish hint for posting rows of ``terms`` —
    None when the layout's bucket count can't be recovered (hint simply
    not passed; publish falls back to its own distinct job)."""
    n = _n_buckets_of(meta)
    if n is None:
        return None
    return sorted({f"bucket={_bucket_of(t, n)}" for t in terms})


def _stats_path(index_path: str) -> str:
    return index_path.rstrip("/") + "_stats"


def _doclens_path(index_path: str) -> str:
    return index_path.rstrip("/") + "_doclens"


def _stopped_path(index_path: str) -> str:
    """Over-cap terms' postings (max_df builds only) — same layout as the
    live index; search never reads it."""
    return index_path.rstrip("/") + "_stopped"


def _fwd_path(index_path: str) -> str:
    """Forward table (id, term) for max_df builds — the id-keyed
    transposition of the postings, so maintenance learns a document's
    old vocabulary with an id-bloom point fetch."""
    return index_path.rstrip("/") + "_fwd"


def _check_names(id_col: str, text_col: str) -> None:
    """The posting schema reserves term/tf/dl/bucket: an id column named
    one of them would be ambiguous at build and mis-detected by search's
    id recovery (ADVICE r9). text_col is never stored, but sharing the id
    name would make the build's explode self-referential."""
    if id_col in _POSTING_COLS:
        raise ValueError(
            f"id_col {id_col!r} collides with the reserved posting "
            f"columns {_POSTING_COLS}; rename the id column"
        )
    if text_col == id_col:
        raise ValueError("id_col and text_col must be different columns")


def _tokenize(docs: DataFrame, id_col: str, text_col: str):
    """(postings-without-bucket, per-doc dl) for ``docs`` — tokenization
    matches ``bm25_scores`` exactly: whitespace split of
    ``trim(lower(text))``. dl IS the token count of the doc (postings
    cover ALL terms, so sum(tf) per doc equals the split's size) — it is
    computed per row BEFORE the explode and carried through the tf
    grouping, so the whole pipeline runs in ONE exchange: the
    dl-aggregate exchange and the tf⨝dl join the r15-and-earlier shape
    paid (two more postings-sized exchanges) are gone. Ids are treated
    as unique per doc, the contract every maintenance entry validates;
    a NULL text splits to NULL and is dropped exactly as the explode
    always dropped it. The caller persists dl — the corpus is tokenized
    exactly once however many consumers follow."""
    toks_col = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = docs.select(
        F.col(id_col),
        toks_col.alias("__toks"),
        F.size(toks_col).cast("long").alias("dl"),
    ).where(F.col("__toks").isNotNull())
    toks = base.select(
        F.col(id_col), F.col("dl"), F.explode("__toks").alias("term")
    )
    tf = toks.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    postings = tf.select("term", id_col, "tf", "dl")
    dl = base.select(F.col(id_col), F.col("dl"))
    return postings, dl


def _write_stats(
    spark: SparkSession,
    index_path: str,
    n_docs: int,
    total_len: int,
    max_df: Optional[int],
) -> None:
    stats = local_rows_df(
        spark,
        [(int(n_docs), int(total_len), max_df if max_df is None else int(max_df))],
        "n_docs long, total_len long, max_df long",
    )
    # a literal 1-row local frame: provably nonempty, sizing irrelevant
    publish_path(
        spark, _stats_path(index_path), stats, [], mode="overwrite",
        _write_hints={"rows_per_file": 1},
    )
    # the stats write is the LAST commit of every op: stamping here
    # closes the op's crash window (r15 — see the family-stamp block).
    # The same atomic sidecar write carries the serve-path MIRROR of
    # the row, so searches read n_docs/avgdl driver-side (zero Spark
    # jobs on the metadata plane).
    _stamp_family_epoch(
        spark, index_path,
        stats_mirror=(int(n_docs), int(total_len), max_df),
    )


_UNSET = object()


def _read_stats(spark: SparkSession, index_path: str, _stats_meta=_UNSET):
    """The corpus stats → (n_docs, total_len, max_df). Served from the
    stats sidecar MIRROR when present (r15): one driver-side JSON read,
    ZERO Spark jobs — the mirror rides the same atomic sidecar write as
    the commit stamp, so any crash that could stale it also stales the
    stamp and serving refuses first. Pre-r15 families (no mirror) fall
    back to collecting the 1-row dataset, which remains the
    recomputable source of truth (``repair_index_stats``). Pre-r10
    stats rows have no max_df column; they read as None — matching
    their era's append semantics (the cap was not recorded, appends
    proceeded)."""
    from . import metadata

    sm = (
        _stats_meta
        if _stats_meta is not _UNSET
        else metadata.read_sidecar(spark, _stats_path(index_path))
    )
    ts = sm.text_stats if sm is not None else None
    if ts is not None:
        mdf = ts.get("max_df")
        return int(ts["n_docs"]), int(ts["total_len"]), (
            None if mdf is None else int(mdf)
        )
    row = fetch_path(spark, _stats_path(index_path)).collect()[0]
    d = row.asDict()
    mdf = d.get("max_df")
    return int(d["n_docs"]), int(d["total_len"]), (
        None if mdf is None else int(mdf)
    )


# ---------------------------------------------------------------------------
# Family commit stamp (r15): fail-loud crash windows.
#
# Every maintenance op here is a multi-commit sequence (routed appends,
# mover tombstones, doclens, stats); a crash in the middle used to leave
# damage that served SILENTLY — a cap-crossing term double-resident
# (search double-counts it) or stale n_docs/total_len (every BM25 score
# skewed) — until an operator happened to run the repair tools. The fix
# is the r14 ANN quantizer-epoch discipline: the op's FINAL commit (the
# stats write) stamps a token binding the postings and stopped siblings'
# head snapshot versions into BOTH the stats sidecar and the postings
# sidecar (two atomic driver-side JSON writes; mid-op commits carry the
# pre-op stamp forward unchanged). At serve and maintenance time the
# token is recomputed from the LIVE heads and compared against both
# halves — any crash that left a commit sequence unfinished moved a head
# the stamps no longer match, and the family REFUSES, naming the repair
# tools. Symmetric refusal (the r14 near-miss): either half stamped
# without full agreement refuses; only a fully UNSTAMPED pair (a pre-r15
# family at rest) serves for back-compat, and the first maintenance op
# adopts it by stamping the current state BEFORE committing anything.
#
# Zero extra I/O on the serving path beyond one small sidecar read: the
# postings sidecar is already loaded, the check is a string compare.
# ---------------------------------------------------------------------------


# Sentinel stamped into the stats sidecar for the DURATION of a full
# rebuild (build_text_index over an existing family): an overwrite
# resets every member's head to v1, so the head-version token cannot
# distinguish "rebuild completed" from "rebuild crashed after some
# members landed" — the sentinel can never equal a live "vN:..." token,
# so any crash mid-build refuses until the build is re-run to
# completion (whose final _write_stats stamp replaces it).
_REBUILDING_STAMP = "rebuilding"


def _head_version(meta) -> int:
    """Newest NON-STAGED snapshot version. Staged (write-audit-publish)
    snapshots are excluded deliberately: their rows are invisible to
    search, so they cannot damage what the family serves — and the
    WAP-specific refusal (``PendingAuditError`` from the eq-delete
    plane) must surface as itself, not as a misleading crash
    diagnosis."""
    if meta is None:
        return 0
    versions = [
        s["version"] for s in (meta.snapshots or []) if not s.get("staged")
    ]
    return max(versions) if versions else 0


def _family_state_token(spark: SparkSession, index_path: str,
                        meta=None) -> str:
    """Token binding the family's mutable commit state: the postings and
    stopped siblings' head (non-staged) snapshot versions. Every
    maintenance op's first commit moves one of these (postings commit
    first in every sequence; a batch routed entirely to the stopped
    side moves that head), so a stale stamp detects every crash
    window."""
    from . import metadata

    if meta is None:
        meta = metadata.read_sidecar(spark, index_path)
    ph = _head_version(meta)
    sm = metadata.read_sidecar(spark, _stopped_path(index_path))
    if sm is None:
        return f"v{ph}:-"
    return f"v{ph}:v{_head_version(sm)}"


def _stamp_family_epoch(spark: SparkSession, index_path: str,
                        stats_mirror=None) -> str:
    """Stamp the CURRENT family state into both halves — stats sidecar
    first, then postings (a crash between the two leaves disagreeing
    halves, which refuse). The final step of every completed op.
    ``stats_mirror``: (n_docs, total_len, max_df) to mirror into the
    stats sidecar in the SAME atomic write as the stamp (r15 — the
    serve-path shortcut); None leaves any existing mirror as is."""
    from . import metadata

    token = _family_state_token(spark, index_path)
    sm = metadata.read_sidecar(spark, _stats_path(index_path))
    if sm is None:
        raise ValueError(
            f"_stamp_family_epoch: no stats dataset at "
            f"{_stats_path(index_path)} — stamp must follow the stats "
            "write"
        )
    sm.text_epoch = token
    if stats_mirror is not None:
        n_docs, total_len, max_df = stats_mirror
        sm.text_stats = {
            "n_docs": int(n_docs),
            "total_len": int(total_len),
            "max_df": None if max_df is None else int(max_df),
        }
    metadata.write_sidecar(spark, _stats_path(index_path), sm)
    pm = metadata.read_sidecar(spark, index_path)
    if pm is not None:
        pm.text_epoch = token
        metadata.write_sidecar(spark, index_path, pm)
    return token


def _refuse_mid_rebuild(spark: SparkSession, index_path: str,
                        op: str) -> None:
    """The repair tools converge BOUNDED maintenance-op damage (a
    half-moved posting list, a stale stats fold); a crashed REBUILD's
    members may mix two corpora, which no repair can converge — only a
    re-run of the build can. Refuse rather than re-stamp a mixed family
    as healthy (the policy loop's opt-in auto-repair then records the
    failure and keeps compaction suspended)."""
    from . import metadata

    sm = metadata.read_sidecar(spark, _stats_path(index_path))
    if sm is not None and sm.text_epoch == _REBUILDING_STAMP:
        raise TextIndexEpochError(
            f"{op}: text-index family at {index_path} has a rebuild in "
            "flight or crashed mid-publish — its members may mix two "
            "corpora, which repairs cannot converge. Re-run "
            "build_text_index over the intended corpus."
        )


def _check_family_epoch(spark: SparkSession, index_path: str, meta,
                        op: str):
    """Refuse to serve or maintain a family whose stamps disagree with
    its live heads (or with each other). ``meta`` is the already-loaded
    postings sidecar. Returns the loaded STATS sidecar so serve paths
    can read the corpus-stats mirror without a second driver read (one
    GET per search on an object store)."""
    from . import metadata

    sm = metadata.read_sidecar(spark, _stats_path(index_path))
    stats_stamp = sm.text_epoch if sm is not None else None
    postings_stamp = meta.text_epoch if meta is not None else None
    if stats_stamp is None and postings_stamp is None:
        return sm  # pre-r15 family: never stamped (back-compat, like ANN)
    if stats_stamp == _REBUILDING_STAMP:
        raise TextIndexEpochError(
            f"{op}: text-index family at {index_path} has a rebuild "
            "in flight or crashed mid-publish (the stats sidecar "
            "carries the 'rebuilding' stamp) — its members may mix two "
            "corpora, which would serve SILENTLY WRONG. Re-run "
            "build_text_index over the intended corpus to converge."
        )
    expected = _family_state_token(spark, index_path, meta=meta)
    if stats_stamp != expected or postings_stamp != expected:
        raise TextIndexEpochError(
            f"{op}: text-index family at {index_path} has commit stamps "
            f"that do not match its live state (live {expected}, stats "
            f"sidecar {stats_stamp or 'unstamped'}, postings sidecar "
            f"{postings_stamp or 'unstamped'}) — a maintenance op "
            "crashed mid-sequence, leaving a half-moved posting list "
            "and/or stale BM25 stats that would serve SILENTLY WRONG. "
            "Run repair_capped_index(spark, path) then "
            "repair_index_stats(spark, path) to converge (or "
            "maintain_dataset(..., repair_text_on_epoch_mismatch=True))."
        )
    return sm


def _check_or_adopt_epoch(spark: SparkSession, index_path: str, meta,
                          op: str) -> None:
    """Maintenance-op entry check: refuse a damaged family (folding
    forward from a crashed op's stale stats would LAUNDER the damage
    into freshly-stamped wrong values); adopt an unstamped pre-r15
    family by stamping its current state before the op's first commit —
    the upgrade window a stamp-at-end-only scheme would leave open."""
    from . import metadata

    sm = metadata.read_sidecar(spark, _stats_path(index_path))
    stats_stamp = sm.text_epoch if sm is not None else None
    postings_stamp = meta.text_epoch if meta is not None else None
    if sm is not None and stats_stamp is None and postings_stamp is None:
        _stamp_family_epoch(spark, index_path)
        return
    _check_family_epoch(spark, index_path, meta, op)


def build_text_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    n_buckets: int = 64,
    max_df: Optional[int] = None,
    max_records_per_file: Optional[int] = None,
) -> None:
    """Materialize the inverted index for ``corpus`` at ``index_path``
    (overwrite — a rebuild; see the module docstring for the rebuild
    contract)."""
    _check_names(id_col, text_col)
    if max_df is not None and max_df < 1:
        raise ValueError("build_text_index: max_df must be >= 1")
    postings, dl = _tokenize(corpus, id_col, text_col)
    dl = dl.persist()
    stopped = None
    tagged = None
    full_postings = None
    n_stop = 0
    try:
        if max_df is not None:
            # r16 (guide §2.4): df routing without re-shuffling the
            # postings. The r15 shape paid a full postings Exchange +
            # Sort + Window on "term" just to tag every row with its
            # term's document frequency; but df is a PER-TERM aggregate
            # — vocabulary-sized, orders of magnitude smaller than the
            # postings — so compute it as a small map-side-combined
            # aggregate over the persisted postings and route rows by
            # driver-side membership in the (bounded) over-cap term set:
            # stop terms number at most total_postings/max_df. Over-cap
            # terms are SPLIT OUT, not dropped: the stopped sibling
            # keeps their postings so maintenance can re-admit a term
            # whose df later falls under the cap. A degenerate cap
            # (max_df so low that the over-cap set is huge) falls back
            # to the r15 window tagging, which never collects terms.
            postings = full_postings = postings.persist()
            df_t = postings.groupBy("term").agg(
                F.count(F.lit(1)).alias("__df")
            )
            counts = df_t.agg(
                F.count(F.lit(1)).alias("n_terms"),
                F.count(F.when(F.col("__df") > max_df, 1)).alias("n_stop"),
            ).collect()[0]
            n_terms, n_stop = int(counts["n_terms"]), int(counts["n_stop"])
            if n_terms == n_stop:
                raise ValueError(
                    f"build_text_index: max_df={max_df} leaves no "
                    "under-cap terms — every term in the corpus is a "
                    "stop term; raise the cap"
                )
            if n_stop == 0:
                pass  # nothing to split; postings publish whole
            elif n_stop <= _STOP_TERMS_DRIVER_MAX:
                stops = [
                    r[0]
                    for r in df_t.filter(F.col("__df") > max_df)
                    .select("term").collect()
                ]
                is_stop = F.col("term").isin(stops)
                stopped = postings.filter(is_stop)
                postings = postings.filter(~is_stop)
            else:
                from pyspark.sql.window import Window

                w = Window.partitionBy("term")
                tagged = postings.withColumn(
                    "__df", F.count(F.lit(1)).over(w)
                ).persist()
                stopped = tagged.filter(F.col("__df") > max_df).drop("__df")
                postings = tagged.filter(
                    F.col("__df") <= max_df
                ).drop("__df")
        # The family's member datasets (live postings, stopped sibling,
        # forward table, doclens) derive independently from the persisted
        # tokenize output, so their publishes run CONCURRENTLY from a small
        # thread pool (guide §2.6: overlap independent jobs — each write's
        # straggler tail back-fills with the next write's tasks; measured
        # at sf1/50k docs: capped build wall 13.1 -> ~7 s, uncapped
        # 5.5 -> ~4 s, the four publishes were 10.7 s of the 13.1 SERIAL).
        # Crash-window semantics: the stats write + family stamp
        # (_write_stats) remain the FINAL commit, issued only after every
        # member publish has succeeded. The head-version token alone
        # cannot detect a crashed REBUILD over an existing family (an
        # overwrite resets every member to v1, so the old stamps still
        # match — true of the sequential build too, found by this
        # round's fault-injection test), so the stats sidecar is stamped
        # with a sentinel BEFORE any member publishes: a crash anywhere
        # in the build leaves the sentinel and every consumer refuses,
        # naming the remedy (re-run the build); the final stamp clears
        # it. A FRESH path has no stats sidecar to stamp — a crash
        # there fails loudly anyway (no stats dataset to serve from).
        from concurrent.futures import ThreadPoolExecutor

        from . import metadata as _md

        _pre_sm = _md.read_sidecar(spark, _stats_path(index_path))
        if _pre_sm is not None:
            _pre_sm.text_epoch = _REBUILDING_STAMP
            _md.write_sidecar(spark, _stats_path(index_path), _pre_sm)

        def _publish_live():
            publish_path(
                spark,
                index_path,
                postings,
                [],
                mode="overwrite",
                derived_partitions={
                    "bucket": _BUCKET_EXPR.format(n=n_buckets)
                },
                sort_within_files=["term"],
                max_records_per_file=max_records_per_file,
                file_bloom_columns=["term"],
            )

        def _publish_stopped():
            # nonemptiness is known driver-side from the df aggregate
            # (n_stop), so no limit(1).count() job runs here (r16)
            if n_stop > 0:
                publish_path(
                    spark,
                    _stopped_path(index_path),
                    stopped.select("term", id_col, "tf", "dl"),
                    [],
                    mode="overwrite",
                    derived_partitions={
                        "bucket": _BUCKET_EXPR.format(n=n_buckets)
                    },
                    sort_within_files=["term"],
                    max_records_per_file=max_records_per_file,
                    file_bloom_columns=["term"],
                )
            else:
                # a rebuild must not leave a previous build's stopped
                # postings behind (they would resurrect on the next move)
                fs.delete(spark, _stopped_path(index_path))

        def _publish_fwd():
            # forward table: EVERY (id, term) pair, live and stopped —
            # the id-bloomed point-lookup plane for df decrements;
            # reads the persisted FULL postings (pre-routing)
            fwd = full_postings.select(F.col(id_col), F.col("term"))
            publish_path(
                spark,
                _fwd_path(index_path),
                fwd,
                [],
                mode="overwrite",
                file_bloom_columns=[id_col],
            )

        def _publish_doclens():
            # per-doc lengths, id-fingerprinted: reindex_documents'
            # O(changed) point lookups ride the same bloom plane
            # searches use for terms
            publish_path(
                spark,
                _doclens_path(index_path),
                dl.select(F.col(id_col), F.col("dl")),
                [],
                mode="overwrite",
                file_bloom_columns=[id_col],
            )

        def _corpus_agg():
            return dl.agg(
                F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
            ).collect()[0]

        members = [_publish_live, _publish_doclens]
        if max_df is not None:
            members += [_publish_stopped, _publish_fwd]
        with ThreadPoolExecutor(max_workers=len(members) + 1) as pool:
            agg_fut = pool.submit(_corpus_agg)
            futs = [pool.submit(m) for m in members]
            for f in futs:
                f.result()
            agg = agg_fut.result()
        if max_df is None:
            # an uncapped rebuild over a previously capped index drops
            # the cap's companion datasets with the cap itself
            fs.delete(spark, _stopped_path(index_path))
            fs.delete(spark, _fwd_path(index_path))
        _write_stats(
            spark, index_path, int(agg["n"]), int(agg["t"] or 0), max_df
        )
    finally:
        # unpersist in a finally (ADVICE r15): a member-publish failure
        # must not leak the cached tokenize output for the session
        dl.unpersist()
        if full_postings is not None:
            full_postings.unpersist()
        if tagged is not None:
            tagged.unpersist()


def _require_index(spark: SparkSession, index_path: str):
    from . import metadata

    meta = metadata.read_sidecar(spark, index_path)
    if meta is None or "bucket" not in (meta.derived_partitions or {}):
        raise ValueError(
            f"no text index at {index_path} (build_text_index first)"
        )
    return meta


def _index_id_col(meta, index_path: str) -> str:
    id_cols = [c for c in meta.column_types if c not in _POSTING_COLS]
    if len(id_cols) != 1:
        raise ValueError(
            f"{index_path} does not look like a text index "
            f"(columns: {list(meta.column_types)})"
        )
    return id_cols[0]


def _capped(spark: SparkSession, index_path: str, max_df: Optional[int],
            op: str) -> bool:
    """True when the index enforces a maintainable ``max_df`` cap. A
    capped index WITHOUT the forward table predates r11's split layout
    (its over-cap postings were dropped at build, so the cap cannot be
    enforced incrementally) — refuse loudly, as r10 did."""
    if max_df is None:
        return False
    from . import metadata

    if metadata.read_sidecar(spark, _fwd_path(index_path)) is None:
        raise ValueError(
            f"{op}: this index was built with max_df={max_df} before "
            "the split live/stopped layout existed — its over-cap "
            "postings were dropped at build, so incremental writes "
            "would re-introduce them with partial lists and inflated "
            "idf. Rebuild with build_text_index."
        )
    return True


def _term_filter(terms) -> list:
    return [
        {"partition": "term", "comparison": "==", "values": sorted(terms)}
    ]


def _companion_append(
    spark: SparkSession,
    index_path: str,
    dst: str,
    rows: DataFrame,
    like_meta,
    write_hints: Optional[dict] = None,
) -> None:
    """Append posting rows into ``dst`` (live or stopped), creating it
    with the live index's recorded layout (bucket transform + term
    blooms) on first use — the stopped sibling is born lazily, on the
    first over-cap crossing."""
    from . import metadata

    if metadata.read_sidecar(spark, dst) is None:
        publish_path(
            spark, dst, rows, [], mode="append",
            derived_partitions=dict(like_meta.derived_partitions),
            sort_within_files=["term"],
            file_bloom_columns=["term"],
            _write_hints=write_hints,
        )
    else:
        publish_path(
            spark, dst, rows, [], mode="append",
            sort_within_files=["term"],
            _write_hints=write_hints,
        )


def _commit_capped_routing(
    spark: SparkSession,
    index_path: str,
    meta,
    id_col: str,
    live_rows,
    stop_rows,
    inc: dict,
    live_terms,
    stop_terms,
    movers_up,
    movers_down,
) -> None:
    """ONE publish per destination dataset per maintenance call (r11
    verdict #3 — the commit-overhead collapse): each side's append
    carries its batch-routed rows AND the other side's cap-crossing
    posting lists in the same commit, then the movers' sources tombstone
    (two zero-read metadata commits). Copy-first is preserved — a crash
    after an append but before its tombstones leaves crossing terms
    double-resident in favor of the copy, exactly the state
    ``repair_capped_index`` fixes — but the copy now rides the routed
    append instead of paying its own publish. The mover fetches are lazy
    (evaluated inside the write job), so they see the id tombstones the
    caller already committed; the live append lands first and adds only
    live-term rows, so the stopped side's mover copy (live-resident
    posting lists of ``movers_up``) reads an unchanged set. Emptiness is
    decided DRIVER-side from the already-collected term routing — no
    ``limit(1)`` probe jobs: a side publishes iff it receives batch rows
    (some ``inc`` term routed to it) or a mover's posting list."""
    sp = _stopped_path(index_path)

    def _sel(df: DataFrame) -> DataFrame:
        return df.select("term", F.col(id_col), "tf", "dl")

    def _union(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    batch_terms = {t for t, n in inc.items() if n > 0}
    live_batch = batch_terms & set(live_terms)
    stop_batch = batch_terms & set(stop_terms)
    live_parts = []
    if live_rows is not None and live_batch:
        live_parts.append(_sel(live_rows))
    if movers_down:
        live_parts.append(
            _sel(fetch_path(spark, sp, filters=_term_filter(movers_down)))
        )
    stop_parts = []
    if stop_rows is not None and stop_batch:
        stop_parts.append(_sel(stop_rows))
    if movers_up:
        stop_parts.append(
            _sel(
                fetch_path(
                    spark, index_path, filters=_term_filter(movers_up)
                )
            )
        )
    if live_parts:
        dirs = _bucket_dirs(meta, live_batch | set(movers_down))
        publish_path(
            spark, index_path, _union(live_parts), [], mode="append",
            sort_within_files=["term"],
            _write_hints={
                "rows_per_file": _MAINT_ROWS_PER_FILE,
                **({"touched_dirs": dirs} if dirs is not None else {}),
            },
        )
    if stop_parts:
        dirs = _bucket_dirs(meta, stop_batch | set(movers_up))
        _companion_append(
            spark, index_path, sp, _union(stop_parts), meta,
            write_hints={
                "rows_per_file": _MAINT_ROWS_PER_FILE,
                **({"touched_dirs": dirs} if dirs is not None else {}),
            },
        )
    from .publish import delete_where

    if movers_up:
        delete_where(
            spark, index_path,
            f"term IN ({_in_literals(sorted(movers_up), 'string')})",
            mode="merge-on-read", count_matches=False,
        )
    if movers_down:
        delete_where(
            spark, sp,
            f"term IN ({_in_literals(sorted(movers_down), 'string')})",
            mode="merge-on-read", count_matches=False,
        )


def _group_counts(df: DataFrame, col: str) -> dict:
    return {
        r[col]: int(r["__n"])
        for r in df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }


def _classify_terms(
    spark: SparkSession,
    index_path: str,
    max_df: int,
    inc: dict,
    dec: dict,
) -> tuple:
    """Exact post-batch state for every batch-affected term. Returns
    ``(live_terms, stop_terms, movers_up, movers_down)`` where the
    first two partition the AFFECTED set (batch rows route by them) and
    the movers are existing posting lists that cross the cap AND still
    have rows to move once the caller's id tombstones land (a term whose
    surviving postings all belong to the batch ids has nothing to copy —
    its batch rows alone re-seed the destination side). df arithmetic:
    new_df = current - dec + inc, with current read term-pruned in ONE
    job — a live∪stopped union fetch of the affected terms, grouped by
    (term, side): live counts are ≤ max_df rows/term by the residency
    invariant, stopped rows were read anyway to learn WHICH terms are
    stopped, so counting them in the same pass costs nothing extra
    (r11 verdict #3: this was three separate fetch jobs)."""
    affected = sorted(set(inc) | set(dec))
    if not affected:
        return set(), set(), [], []
    sp = _stopped_path(index_path)
    from . import metadata

    scan = fetch_path(
        spark, index_path, filters=_term_filter(affected)
    ).select("term").withColumn("__side", F.lit("live"))
    if metadata.read_sidecar(spark, sp) is not None:
        scan = scan.unionByName(
            fetch_path(spark, sp, filters=_term_filter(affected))
            .select("term")
            .withColumn("__side", F.lit("stopped"))
        )
    counts = {
        (r["term"], r["__side"]): int(r["__n"])
        for r in scan.groupBy("term", "__side")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }
    stopped_now = {t for (t, side) in counts if side == "stopped"}
    live_terms, stop_terms = set(), set()
    movers_up, movers_down = [], []
    for t in affected:
        if t in stopped_now:
            cur = counts[(t, "stopped")]
        else:
            cur = counts.get((t, "live"), 0)
        new_df = cur - dec.get(t, 0) + inc.get(t, 0)
        # rows of this term still resident on its CURRENT side after the
        # caller's id tombstones: only those can (and need to) move
        remaining = cur - dec.get(t, 0)
        if new_df <= max_df:
            live_terms.add(t)
            if t in stopped_now and remaining > 0:
                movers_down.append(t)
        else:
            stop_terms.add(t)
            if t not in stopped_now and remaining > 0:
                movers_up.append(t)
    return live_terms, stop_terms, movers_up, movers_down


def _route_batch(postings: DataFrame, live_terms, stop_terms) -> tuple:
    """Split batch postings by their terms' post-batch state — broadcast
    semi/anti joins against the (bounded, change-set-sized) term frames,
    never a giant IN literal in the plan."""
    s = postings.sparkSession
    if not stop_terms:
        return postings, None
    stop_df = local_rows_df(s, [(t,) for t in sorted(stop_terms)],
                            "term string")
    live_rows = postings.join(F.broadcast(stop_df), "term", "left_anti")
    stop_rows = postings.join(F.broadcast(stop_df), "term", "left_semi")
    return live_rows, stop_rows


def append_to_text_index(
    spark: SparkSession,
    new_docs: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    validate_new_ids: bool = False,
) -> None:
    """Incremental indexing: append NEW documents' postings into the
    existing layout — the bucket transform is the dataset's recorded
    derived partition, so the append re-derives it automatically and the
    new postings land exactly where searches look; doclens and the stats
    row are folded forward (O(new docs), never O(corpus)). The caller's
    contract: ``new_docs`` ids are NOT already indexed — an id indexed
    twice would double its postings and inflate df_t;
    ``reindex_documents`` is the changed-document path.
    ``validate_new_ids=True`` CHECKS it before writing anything — one
    id-bloom point fetch of the doclens side table (O(files holding the
    batch ids), never an index scan — the blooms exist exactly for
    this), refusing loudly on any already-indexed id; stated-not-checked
    remains the default because the check costs a read the contract
    usually makes redundant. On a ``max_df`` index (r11): batch terms are
    routed live/stopped by their exact post-append df, and a live term
    the append pushes over the cap has its whole posting list moved to
    the stopped sibling — search stays ≡ rebuild-with-max_df (module
    docstring; O(batch terms' postings) extra work). See the module
    docstring for the multi-commit window."""
    _check_names(id_col, text_col)
    meta = _require_index(spark, index_path)
    key = _index_id_col(meta, index_path)
    if key != id_col:
        raise ValueError(
            f"append_to_text_index: index at {index_path} is keyed by "
            f"{key!r}, not {id_col!r}"
        )
    # refuse a crash-damaged family before folding forward from its
    # (possibly stale) stats; adopt a pre-stamp family first (r15)
    _check_or_adopt_epoch(spark, index_path, meta, "append_to_text_index")
    n_docs, total_len, max_df = _read_stats(spark, index_path)
    capped = _capped(spark, index_path, max_df, "append_to_text_index")
    if validate_new_ids:
        if not _doclens_exists(spark, index_path):
            raise ValueError(
                "append_to_text_index: validate_new_ids needs the "
                "doclens side table (pre-doclens indexes can't check "
                "membership without an index scan); rebuild first"
            )
        ids = [r[0] for r in new_docs.select(id_col).distinct().collect()]
        hit = fetch_path(
            spark, _doclens_path(index_path),
            filters=[
                {"partition": id_col, "comparison": "==", "values": ids}
            ],
        ).select(id_col).limit(5).collect() if ids else []
        if hit:
            raise ValueError(
                "append_to_text_index: batch ids already indexed "
                f"(e.g. {[r[0] for r in hit]}) — appending would double "
                "their postings; use reindex_documents to replace"
            )
    postings, dl = _tokenize(new_docs, id_col, text_col)
    if capped:
        postings = postings.persist()
    dl = dl.persist()
    try:
        if capped:
            inc = _group_counts(postings, "term")
            live_terms, stop_terms, movers_up, _down = _classify_terms(
                spark, index_path, max_df, inc, {}
            )
            live_rows, stop_rows = _route_batch(
                postings, live_terms, stop_terms
            )
            _commit_capped_routing(
                spark, index_path, meta, id_col, live_rows, stop_rows,
                inc, live_terms, stop_terms, movers_up, [],
            )
            publish_path(
                spark, _fwd_path(index_path),
                postings.select(F.col(id_col), F.col("term")),
                [], mode="append",
                # inc nonempty proves the pair frame has rows; an empty
                # batch never reaches here (publish raised upstream)
                _write_hints=(
                    {"rows_per_file": _MAINT_ROWS_PER_FILE} if inc else None
                ),
            )
        else:
            publish_path(
                spark, index_path, postings, [], mode="append",
                sort_within_files=["term"],
            )
        # doclens exists for every index built/maintained r10+; a pre-r10
        # index has none — appending a PARTIAL doclens would poison
        # reindex's stats fold, so only maintain an existing one
        if _doclens_exists(spark, index_path):
            # reached only after a postings publish succeeded, which
            # proves the batch nonempty (an empty one raised above)
            publish_path(
                spark,
                _doclens_path(index_path),
                dl.select(F.col(id_col), F.col("dl")),
                [],
                mode="append",
                _write_hints={"rows_per_file": _MAINT_ROWS_PER_FILE},
            )
        delta = dl.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
        ).collect()[0]
        _write_stats(
            spark,
            index_path,
            n_docs + int(delta["n"]),
            total_len + int(delta["t"] or 0),
            max_df,
        )
    finally:
        dl.unpersist()
        if capped:
            postings.unpersist()


def _doclens_exists(spark: SparkSession, index_path: str) -> bool:
    from . import metadata

    return metadata.read_sidecar(spark, _doclens_path(index_path)) is not None


def reindex_documents(
    spark: SparkSession,
    changed_docs: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
) -> None:
    """Replace CHANGED (or add new) documents in the index in O(changed
    docs) — the eq-delete composition the r9 verdict asked for: ONE
    equality key-delete snapshot on the postings dataset removes every
    old posting row under the changed doc ids and appends the new
    posting lists (``eq_delete_append`` — the merge-on-read upsert
    machinery, multi-row-per-key); the doclens side table upserts the
    same way, and the stats row folds forward using the OLD lengths
    point-fetched from doclens (bloom-pruned id lookup — never a corpus
    scan). Ids not previously indexed are treated as new documents.

    After a reindex, ``search_text_index`` equals a full rebuild over the
    updated corpus exactly (gated). Read cost until the next
    ``compact_dataset`` is the documented merge-on-read trade (era
    anti-joins); commit cost is O(changed docs). Idempotent: re-running
    the same batch converges (key-deletes replace, never accumulate).
    Requires the doclens side table (indexes built before it existed
    must rebuild); changed ids must be unique in the batch and non-NULL.

    On a ``max_df`` index (r11): the changed docs' OLD vocabulary is
    point-fetched from the forward table (id blooms — never an index
    scan), df deltas are exact (decrements from the old pairs,
    increments from the batch), batch rows route live/stopped by the
    post-reindex df, and terms crossing the cap in EITHER direction
    have their posting lists moved — search stays ≡ rebuild-with-max_df
    over the updated corpus. The capped commit sequence is id-tombstone
    → one routed append per destination (each carrying its side's
    cap-crossing copies, r12) → mover-source tombstones → forward-table
    upsert (multi-commit honesty per the module docstring) instead of
    the uncapped single eq-delete snapshot."""
    _check_names(id_col, text_col)
    meta = _require_index(spark, index_path)
    key = _index_id_col(meta, index_path)
    if key != id_col:
        raise ValueError(
            f"reindex_documents: index at {index_path} is keyed by "
            f"{key!r}, not {id_col!r}"
        )
    _check_or_adopt_epoch(spark, index_path, meta, "reindex_documents")
    n_docs, total_len, max_df = _read_stats(spark, index_path)
    capped = _capped(spark, index_path, max_df, "reindex_documents")
    if not _doclens_exists(spark, index_path):
        raise ValueError(
            f"reindex_documents: no doclens side table at "
            f"{_doclens_path(index_path)} — this index predates "
            "incremental reindexing; rebuild with build_text_index"
        )
    from . import metadata

    # ONE pass over the batch yields the validation AND the changed-id
    # list (bounded driver state — reindex batches are change sets, not
    # corpora, the same boundedness as every filter-values list); the
    # tokenizer keeps every non-NULL text (empty text still yields one
    # empty-string token), so these ids are exactly dl's ids
    id_rows = (
        changed_docs.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.count(F.when(F.col(text_col).isNull(), 1)).alias("__nulltext"),
        )
        .collect()
    )
    dup = [
        r for r in id_rows
        if r["__n"] > 1 or r[id_col] is None or r["__nulltext"] > 0
    ]
    if dup:
        raise ValueError(
            "reindex_documents: changed_docs ids must be unique and "
            "non-NULL, and text must be non-NULL (a NULL text tokenizes "
            "to nothing, so the doc would vanish from the eq-delete batch "
            "and its OLD postings would silently survive — breaking the "
            f"search==rebuild contract; offender: {dup[0][0]!r})"
        )
    postings, dl = _tokenize(changed_docs, id_col, text_col)
    dl = dl.persist()
    try:
        # old lengths: bloom-pruned point fetch on the id fingerprints —
        # O(files holding the changed ids), never O(corpus)
        ids = [r[id_col] for r in id_rows]
        old = (
            fetch_path(
                spark,
                _doclens_path(index_path),
                filters=[
                    {"partition": id_col, "comparison": "==", "values": ids}
                ],
            ).collect()
            if ids
            else []
        )
        old_total = sum(int(r["dl"]) for r in old)
        n_found = len(old)
        # postings upsert: delete old posting lists under the id keys,
        # append the new ones — one snapshot, O(batch) commit
        vocab = meta.column_types.get(id_col)
        batch = postings.withColumn(
            id_col, F.col(id_col).cast(metadata.vocab_to_spark_type(vocab))
        ).select("term", id_col, "tf", "dl")
        if capped and ids:
            from .publish import delete_where

            batch = batch.persist()
            fwdp = _fwd_path(index_path)
            old_pairs = fetch_path(
                spark, fwdp,
                filters=[
                    {"partition": id_col, "comparison": "==", "values": ids}
                ],
            ) if ids else None
            dec = _group_counts(old_pairs, "term") if old_pairs is not None else {}
            inc = _group_counts(batch, "term")
            live_terms, stop_terms, movers_up, movers_down = (
                _classify_terms(spark, index_path, max_df, inc, dec)
            )
            id_pred = f"{id_col} IN ({_in_literals(ids, vocab)})"
            # changed ids' old postings leave both sides (zero-read
            # predicate tombstones; reads below already see them)
            delete_where(
                spark, index_path, id_pred, mode="merge-on-read",
                count_matches=False,
            )
            from . import metadata as _md

            sp = _stopped_path(index_path)
            if _md.read_sidecar(spark, sp) is not None:
                delete_where(
                    spark, sp, id_pred, mode="merge-on-read",
                    count_matches=False,
                )
            live_rows, stop_rows = _route_batch(
                batch, live_terms, stop_terms
            )
            _commit_capped_routing(
                spark, index_path, meta, id_col, live_rows, stop_rows,
                inc, live_terms, stop_terms, movers_up, movers_down,
            )
            # forward table upsert: ONE eq-delete snapshot replaces the
            # changed docs' pair lists (nonempty: ids were collected, and
            # every non-NULL text yields at least one posting)
            eq_delete_append(
                spark, fwdp,
                batch.select(F.col(id_col), F.col("term")), [id_col],
                _known_nonempty=True,
                _write_hints={"rows_per_file": _MAINT_ROWS_PER_FILE},
            )
            batch.unpersist()
        else:
            # same within-file clustering as build/append: reindexed
            # files keep tight term runs, so their bloom fingerprints
            # stay sparse and the bucket-internal skip keeps biting
            # until the next compaction
            eq_delete_append(
                spark, index_path, batch, [id_col],
                sort_within_files=["term"],
                _known_nonempty=bool(ids),
                _write_hints=(
                    {"rows_per_file": _MAINT_ROWS_PER_FILE} if ids else None
                ),
            )
        dl_meta = metadata.read_sidecar(spark, _doclens_path(index_path))
        dl_vocab = dl_meta.column_types.get(id_col) if dl_meta else vocab
        dl_batch = dl.select(F.col(id_col), F.col("dl")).withColumn(
            id_col, F.col(id_col).cast(metadata.vocab_to_spark_type(dl_vocab))
        )
        eq_delete_append(
            spark, _doclens_path(index_path), dl_batch, [id_col],
            # ids collected driver-side: the batch provably has one dl
            # row per changed id (empty batches keep the probe)
            _known_nonempty=bool(ids),
            _write_hints=(
                {"rows_per_file": _MAINT_ROWS_PER_FILE} if ids else None
            ),
        )
        delta = dl.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
        ).collect()[0]
        _write_stats(
            spark,
            index_path,
            n_docs + int(delta["n"]) - n_found,
            total_len + int(delta["t"] or 0) - old_total,
            max_df,
        )
    finally:
        dl.unpersist()


def remove_documents(
    spark: SparkSession,
    doc_ids: List,
    index_path: str,
    id_col: str,
) -> int:
    """Remove documents from the index in O(removed docs) — the DELETE
    corner of the index's CRUD: one merge-on-read predicate tombstone on
    the postings dataset (``delete_where(mode="merge-on-read")`` — zero
    data files touched), one on the doclens side table, and the stats
    row folds DOWN using the old lengths point-fetched from doclens
    (bloom-pruned id lookup). Ids not currently indexed are ignored
    (idempotent — re-running a removal converges). Search afterwards
    equals a full rebuild over the corpus minus the removed docs
    (pinned by test); ``compact_dataset`` materializes the tombstones on
    the usual MOR cadence. On a ``max_df`` index (r11): removal shifts
    df DOWN, so a stop term whose decrement brings it under the cap has
    its remaining posting list moved back into the live index — the
    re-admission the r10 refusal couldn't express (decrements come from
    the forward table's id-bloom point fetch; tombstones additionally
    cover the stopped and forward siblings). Returns the number of
    documents actually removed."""
    from .publish import _require_no_staged, delete_where

    meta = _require_index(spark, index_path)
    key = _index_id_col(meta, index_path)
    if key != id_col:
        raise ValueError(
            f"remove_documents: index at {index_path} is keyed by "
            f"{key!r}, not {id_col!r}"
        )
    # a staged snapshot's postings would promote ABOVE the removal's
    # tombstone and escape it — while the stats row already folded down:
    # the index would hold postings for docs its stats no longer count.
    # (delete_where itself deliberately allows staged+tombstone — SQL
    # deletes what was VISIBLE — but this module's stats-parity contract
    # cannot survive it.)
    _require_no_staged(meta, index_path, "remove_documents")
    _check_or_adopt_epoch(spark, index_path, meta, "remove_documents")
    n_docs, total_len, max_df = _read_stats(spark, index_path)
    capped = _capped(spark, index_path, max_df, "remove_documents")
    if not _doclens_exists(spark, index_path):
        raise ValueError(
            f"remove_documents: no doclens side table at "
            f"{_doclens_path(index_path)} — this index predates "
            "incremental maintenance; rebuild with build_text_index"
        )
    ids = sorted({i for i in doc_ids if i is not None})
    if not ids:
        return 0
    old = fetch_path(
        spark,
        _doclens_path(index_path),
        filters=[{"partition": id_col, "comparison": "==", "values": ids}],
    ).collect()
    if not old:
        return 0  # nothing indexed under these ids: idempotent no-op
    vocab = meta.column_types.get(id_col, "string")
    pred = f"{id_col} IN ({_in_literals(ids, vocab)})"
    movers_down: list = []
    if capped:
        # exact df decrements from the removed docs' old vocabulary
        # (forward-table point fetch), BEFORE the tombstones land
        old_pairs = fetch_path(
            spark, _fwd_path(index_path),
            filters=[
                {"partition": id_col, "comparison": "==", "values": ids}
            ],
        )
        dec = _group_counts(old_pairs, "term")
        _live, _stop, _up, movers_down = _classify_terms(
            spark, index_path, max_df, {}, dec
        )
    # matches were just proven via the bloom-pruned doclens fetch:
    # count_matches=False keeps each tombstone commit zero-data-read
    delete_where(
        spark, index_path, pred, mode="merge-on-read", count_matches=False
    )
    delete_where(
        spark, _doclens_path(index_path), pred, mode="merge-on-read",
        count_matches=False,
    )
    if capped:
        from . import metadata as _md

        sp = _stopped_path(index_path)
        if _md.read_sidecar(spark, sp) is not None:
            delete_where(
                spark, sp, pred, mode="merge-on-read",
                count_matches=False,
            )
        delete_where(
            spark, _fwd_path(index_path), pred, mode="merge-on-read",
            count_matches=False,
        )
        # re-admission: stop terms the removal dropped under the cap
        # (reads see the id tombstones, so the moved lists are already
        # minus the removed docs) — one live-side publish + one stopped
        # tombstone via the shared routing commit (no batch rows here)
        _commit_capped_routing(
            spark, index_path, meta, id_col, None, None,
            {}, set(), set(), [], movers_down,
        )
    _write_stats(
        spark,
        index_path,
        n_docs - len(old),
        total_len - sum(int(r["dl"]) for r in old),
        max_df,
    )
    return len(old)


def repair_index_stats(
    spark: SparkSession, index_path: str
) -> tuple:
    """Recompute the 1-row corpus stats from the doclens side table and
    rewrite the stats dataset — the recovery tool for a maintenance op
    that crashed between its tombstone/append commits and its stats
    write (module docstring: the fold-forward writes never self-heal).
    One scan of doclens (2-column rows, one per document — O(docs),
    never O(corpus)); ``max_df`` is preserved from the existing stats
    row. Returns the repaired ``(n_docs, total_len)``."""
    meta = _require_index(spark, index_path)
    _refuse_mid_rebuild(spark, index_path, "repair_index_stats")
    if not _doclens_exists(spark, index_path):
        raise ValueError(
            f"repair_index_stats: no doclens side table at "
            f"{_doclens_path(index_path)} — pre-doclens indexes carry no "
            "ground truth to repair from; rebuild with build_text_index"
        )
    _, _, max_df = _read_stats(spark, index_path)
    agg = fetch_path(spark, _doclens_path(index_path)).agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
    ).collect()[0]
    n_docs, total_len = int(agg["n"]), int(agg["t"] or 0)
    _write_stats(spark, index_path, n_docs, total_len, max_df)
    return n_docs, total_len


def search_text_index_batch(
    spark: SparkSession,
    index_path: str,
    queries: dict,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    require_all: bool = False,
) -> DataFrame:
    """Serve MANY queries in ONE pass over the index — the batch shape
    every serving path here has (``ivf_batch_topk``, ``lsh_batch_topk``):
    the UNION of all queries' terms issues a single pruned fetch (bucket
    pushdown + bloom skip, O(postings of the asked terms) total, not per
    query), a broadcast (query id, term) frame fans each posting row out
    to the queries that asked for its term, and one windowed top-k per
    query id ranks — per-query results are BIT-IDENTICAL to
    ``search_text_index`` run per query (pinned by test), including
    per-query df_t (a term shared by two queries is fetched once but
    scored under the same global df either way). ``queries`` maps a
    query id to its term list; returns (query_id, doc id, n_terms,
    score) ordered within each query id by score desc, id asc."""
    from pyspark.sql.window import Window

    if not queries:
        raise ValueError("search_text_index_batch needs at least one query")
    pairs = sorted(
        {(str(qid), t.lower()) for qid, terms in queries.items()
         for t in terms}
    )
    if not pairs:
        raise ValueError(
            "search_text_index_batch: every query needs at least one term"
        )
    all_terms = sorted({t for _, t in pairs})
    meta = _require_index(spark, index_path)
    sm = _check_family_epoch(
        spark, index_path, meta, "search_text_index_batch"
    )
    id_col = _index_id_col(meta, index_path)
    n_docs, total_len, _ = _read_stats(spark, index_path, _stats_meta=sm)
    postings = fetch_path(
        spark, index_path, filters=_term_filter(all_terms)
    )
    # global df per term — computed ONCE over the shared fetch, exactly
    # what each per-query search would compute for its own terms
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    qt = local_rows_df(spark, pairs, "query_id string, term string")
    avgdl = F.lit(float(total_len)) / F.lit(n_docs)
    idf = F.log(
        (F.lit(n_docs) - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfn = (F.col("tf") * F.lit(k1 + 1)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    )
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qt), "term")
        .select(
            "query_id", F.col(id_col),
            (idf * tfn).cast("decimal(28,12)").alias("__s"),
        )
        .groupBy("query_id", id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("__s").cast("double").alias("score"),
        )
    )
    if require_all:
        # conjunctive per query: each query's own distinct-term count is
        # the bar (search_text_index's require_all, batched)
        need = qt.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("__need")
        )
        scored = (
            scored.join(F.broadcast(need), "query_id")
            .filter(F.col("n_terms") == F.col("__need"))
            .drop("__need")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .orderBy("query_id", F.desc("score"), F.asc(id_col))
    )


def repair_capped_index(spark: SparkSession, index_path: str) -> dict:
    """Recover a max_df index from a crashed cap-crossing move: the move
    is copy-then-tombstone, so a crash between the two leaves a term's
    posting list resident on BOTH sides (rows duplicated — search would
    double-count it). Detection is bounded by NATURE, not by luck: only
    stopped-side terms can be double-resident, and stop-term cardinality
    is small — one distinct-terms scan of the stopped sibling, one
    term-pruned live lookup. Repair rebuilds each affected term exactly:
    the union of both sides' rows deduplicates per (term, id) (the two
    copies are identical rows by construction), df decides the correct
    side against the cap, tombstones clear BOTH sides, and the clean
    list re-appends — after which search ≡ rebuild again (pinned by
    test). Returns {term: side it now lives on}; empty = nothing to
    repair. Run it (with ``repair_index_stats``) after any crashed
    capped maintenance op."""
    from . import metadata

    meta = _require_index(spark, index_path)
    _refuse_mid_rebuild(spark, index_path, "repair_capped_index")
    _, _, max_df = _read_stats(spark, index_path)
    if max_df is None:
        return {}
    sp = _stopped_path(index_path)
    if metadata.read_sidecar(spark, sp) is None:
        return {}
    id_col = _index_id_col(meta, index_path)
    stopped_terms = [
        r["term"]
        for r in fetch_path(spark, sp).select("term").distinct().collect()
    ]
    if not stopped_terms:
        return {}
    dup_terms = [
        r["term"]
        for r in fetch_path(
            spark, index_path, filters=_term_filter(stopped_terms)
        ).select("term").distinct().collect()
    ]
    if not dup_terms:
        return {}
    from .publish import delete_where

    clean = (
        fetch_path(spark, index_path, filters=_term_filter(dup_terms))
        .select("term", id_col, "tf", "dl")
        .unionByName(
            fetch_path(spark, sp, filters=_term_filter(dup_terms))
            .select("term", id_col, "tf", "dl")
        )
        .dropDuplicates(["term", id_col])
        .persist()
    )
    try:
        dfs = _group_counts(clean, "term")
        pred = f"term IN ({_in_literals(sorted(dup_terms), 'string')})"
        for p in (index_path, sp):
            delete_where(
                spark, p, pred, mode="merge-on-read", count_matches=False
            )
        out = {}
        live_terms = {t for t, n in dfs.items() if n <= max_df}
        live_rows, stop_rows = _route_batch(
            clean, live_terms, set(dfs) - live_terms
        )
        if live_rows.limit(1).count() > 0:
            publish_path(
                spark, index_path, live_rows, [], mode="append",
                sort_within_files=["term"],
            )
        if stop_rows is not None and stop_rows.limit(1).count() > 0:
            _companion_append(
                spark, index_path, sp,
                stop_rows.select("term", F.col(id_col), "tf", "dl"),
                meta,
            )
        for t, n in dfs.items():
            out[t] = "live" if n <= max_df else "stopped"
        return out
    finally:
        clean.unpersist()


def text_index_info(
    spark: SparkSession,
    index_path: str,
    count_stopped_terms: bool = False,
) -> dict:
    """One ops-facing summary of the index family — corpus stats
    (n_docs, total_len, avgdl), the recorded cap and bucket layout, and
    each member dataset's merge-on-read debt (the compaction signal
    ``compact_text_index`` clears). Metadata-only by default;
    ``count_stopped_terms=True`` additionally scans the stopped
    sibling's distinct terms (stop-term cardinality is SMALL by nature,
    but it is a data read — opt-in, like vacuum's deletions)."""
    from . import metadata

    meta = _require_index(spark, index_path)
    n_docs, total_len, max_df = _read_stats(spark, index_path)
    # ops-facing: REPORT crash damage instead of refusing (the operator
    # needs this view to diagnose the very state searches refuse on)
    epoch_damage = None
    try:
        _check_family_epoch(spark, index_path, meta, "text_index_info")
    except TextIndexEpochError as exc:
        epoch_damage = str(exc)
    info = {
        "n_docs": n_docs,
        "total_len": total_len,
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "max_df": max_df,
        "n_buckets": _n_buckets_of(meta),
        "id_col": _index_id_col(meta, index_path),
        "epoch_damage": epoch_damage,
        "members": {},
    }
    for suffix, p in (
        ("postings", index_path),
        ("doclens", _doclens_path(index_path)),
        ("stopped", _stopped_path(index_path)),
        ("fwd", _fwd_path(index_path)),
    ):
        mm = meta if suffix == "postings" else metadata.read_sidecar(
            spark, p
        )
        if mm is None:
            continue
        info["members"][suffix] = {
            "n_files": len(mm.manifest_files() or []),
            "n_snapshots": len(mm.snapshots),
            "pending_mor_commits": len(mm.tombstones())
            + len(mm.eq_deletes()),
        }
    if count_stopped_terms and "stopped" in info["members"]:
        info["n_stopped_terms"] = (
            fetch_path(spark, _stopped_path(index_path))
            .select("term").distinct().count()
        )
    return info


def compact_text_index(
    spark: SparkSession,
    index_path: str,
    max_records_per_file: Optional[int] = None,
) -> dict:
    """Materialize the index family's accumulated merge-on-read debt in
    one call: every maintenance op leaves tombstones/eq-deletes on the
    postings AND the side tables (doclens, and for capped indexes the
    stopped sibling and forward table) — each taxes every read with a
    row filter or era anti-join. This compacts whichever family members
    exist and carry history, preserving each dataset's recorded layout
    (the bucket transform and blooms ride compact_dataset's sidecar
    carry-through). Search before == search after (pinned by test).
    Returns {dataset suffix: n files rewritten}; members with no debt
    still compact (small-file consolidation is the other half of the
    maintenance story)."""
    from . import metadata
    from .publish import compact_dataset

    meta = _require_index(spark, index_path)
    # refuse to compact a damaged family: the rewrite would bump heads
    # and the closing re-stamp would LAUNDER the damage as healthy
    _check_or_adopt_epoch(spark, index_path, meta, "compact_text_index")
    report = {}
    members = [
        ("", index_path),
        ("_doclens", _doclens_path(index_path)),
        ("_stopped", _stopped_path(index_path)),
        ("_fwd", _fwd_path(index_path)),
    ]
    present = [
        (suffix, p) for suffix, p in members
        if metadata.read_sidecar(spark, p) is not None
    ]
    # the members are DISTINCT datasets and each compaction is
    # content-preserving, so they run concurrently (guide §2.6 —
    # measured at sf1/50k docs: 11.0 s of serial member rewrites inside
    # a 11-12.5 s wall). Crash semantics are order-independent here:
    # any subset completing moves heads the stamps no longer match, the
    # family refuses, and the re-stamp below only runs after every
    # member has succeeded.
    from concurrent.futures import ThreadPoolExecutor

    def _compact_member(suffix, p):
        return suffix, compact_dataset(
            spark, p, max_records_per_file=max_records_per_file,
            sort_by=(["term"] if suffix in ("", "_stopped") else None),
        )

    with ThreadPoolExecutor(max_workers=max(1, len(present))) as pool:
        futs = [pool.submit(_compact_member, s, p) for s, p in present]
        for f in futs:
            suffix, files = f.result()
            report[suffix or "postings"] = len(files)
    # compaction reset the members' head versions: re-stamp the family
    # (values unchanged — the stats ROW needs no rewrite, only the
    # stamps; a crash mid-compaction above leaves stale stamps that
    # refuse, and repair_index_stats converges them)
    _stamp_family_epoch(spark, index_path)
    return report


def search_text_index(
    spark: SparkSession,
    index_path: str,
    query_terms: List[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    require_all: bool = False,
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` from the index alone —
    same contract and identical scores as ``bm25_scores(corpus, ...)``.
    One term filter: hidden-partition pushdown prunes to the query
    terms' buckets, the residual bloom-skips files inside them, and
    nothing outside the query terms' postings is read. The document id
    column is recovered from the index's own schema.

    ``require_all=True`` is conjunctive (AND) retrieval: only documents
    matching EVERY distinct query term rank (the standard boolean-AND +
    BM25-rank composition) — a post-aggregation n_terms filter, so the
    read cost is identical and scores of the surviving docs are exactly
    their disjunctive scores. On a ``max_df`` index a capped-out term
    has no postings to match, so an AND including it returns empty —
    the honest reading of 'the index does not serve this term'."""
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("search_text_index needs at least one query term")
    meta = _require_index(spark, index_path)
    # a crash-damaged family must REFUSE, not double-count a half-moved
    # posting list or score with stale stats (r15 — the ANN epoch-pin
    # discipline; one sidecar read + a string compare, no data I/O)
    sm = _check_family_epoch(spark, index_path, meta, "search_text_index")
    id_col = _index_id_col(meta, index_path)
    n_docs, total_len, _ = _read_stats(spark, index_path, _stats_meta=sm)
    postings = fetch_path(
        spark,
        index_path,
        filters=[
            {"partition": "term", "comparison": "==", "values": terms},
        ],
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    avgdl = F.lit(float(total_len)) / F.lit(n_docs)
    idf = F.log(
        (F.lit(n_docs) - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfn = (F.col("tf") * F.lit(k1 + 1)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    )
    agg = (
        postings.join(F.broadcast(dfreq), "term")
        .select(F.col(id_col), (idf * tfn).cast("decimal(28,12)").alias("__s"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("__s").cast("double").alias("score"),
        )
    )
    if require_all:
        agg = agg.filter(F.col("n_terms") == F.lit(len(terms)))
    return agg.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
