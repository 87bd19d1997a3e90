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
(maxRecordsPerFile), and ``max_df`` can drop terms above a document-
frequency cap at build time (searches then get no contribution from
them — standard stopword semantics, the one stated divergence from
corpus-side BM25). A ``max_df`` build records the cap in the stats row,
and ``append_to_text_index`` / ``reindex_documents`` REFUSE on such an
index: an incremental write would re-introduce dropped terms with
postings from the new docs only — a partial postings list with a wildly
inflated idf (df_t counting only the appended subset), silently wrong
scores. Enforcing the cap incrementally is impossible without the
dropped-term postings the build deliberately did not keep; rebuild.

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

Reference analog: none (extension per SURVEY §7.4).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fetch import fetch_path
from .publish import eq_delete_append, publish_path

__all__ = [
    "append_to_text_index",
    "build_text_index",
    "reindex_documents",
    "remove_documents",
    "repair_index_stats",
    "search_text_index",
]

#: the recorded hidden-partition transform (term -> bucket): the engine's
#: portable 60-bit md5 folded to the bucket count. Stored in the sidecar
#: at build; search never computes it — hidden-partition pushdown does.
_BUCKET_EXPR = (
    "cast(pmod(cast(conv(substring(md5(cast(term as binary)), 1, 15), "
    "16, 10) as bigint), {n}) as int)"
)

_POSTING_COLS = ("term", "tf", "dl", "bucket")


def _stats_path(index_path: str) -> str:
    return index_path.rstrip("/") + "_stats"


def _doclens_path(index_path: str) -> str:
    return index_path.rstrip("/") + "_doclens"


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
    ``trim(lower(text))``. dl derives from tf (postings cover ALL terms,
    so sum(tf) per doc IS the document length); the caller persists dl —
    the corpus is tokenized exactly once however many consumers follow."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    postings = tf.join(dl, id_col).select("term", id_col, "tf", "dl")
    return postings, dl


def _write_stats(
    spark: SparkSession,
    index_path: str,
    n_docs: int,
    total_len: int,
    max_df: Optional[int],
) -> None:
    stats = spark.createDataFrame(
        [(int(n_docs), int(total_len), max_df if max_df is None else int(max_df))],
        "n_docs long, total_len long, max_df long",
    )
    publish_path(spark, _stats_path(index_path), stats, [], mode="overwrite")


def _read_stats(spark: SparkSession, index_path: str):
    """The 1-row corpus stats → (n_docs, total_len, max_df). Pre-r10
    stats rows have no max_df column; they read as None — matching their
    era's append semantics (the cap was not recorded, appends proceeded)."""
    row = fetch_path(spark, _stats_path(index_path)).collect()[0]
    d = row.asDict()
    mdf = d.get("max_df")
    return int(d["n_docs"]), int(d["total_len"]), (
        None if mdf is None else int(mdf)
    )


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
    postings, dl = _tokenize(corpus, id_col, text_col)
    dl = dl.persist()
    try:
        if max_df is not None:
            from pyspark.sql.window import Window

            # document frequency inside the already-keyed postings: one
            # window over the term partitioning the rows are about to be
            # written in anyway
            w = Window.partitionBy("term")
            postings = (
                postings.withColumn("__df", F.count(F.lit(1)).over(w))
                .filter(F.col("__df") <= max_df)
                .drop("__df")
            )
        publish_path(
            spark,
            index_path,
            postings,
            [],
            mode="overwrite",
            derived_partitions={"bucket": _BUCKET_EXPR.format(n=n_buckets)},
            sort_within_files=["term"],
            max_records_per_file=max_records_per_file,
            file_bloom_columns=["term"],
        )
        # per-doc lengths, id-fingerprinted: reindex_documents' O(changed)
        # point lookups ride the same bloom plane searches use for terms
        publish_path(
            spark,
            _doclens_path(index_path),
            dl.select(F.col(id_col), F.col("dl")),
            [],
            mode="overwrite",
            file_bloom_columns=[id_col],
        )
        agg = dl.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
        ).collect()[0]
        _write_stats(
            spark, index_path, int(agg["n"]), int(agg["t"] or 0), max_df
        )
    finally:
        dl.unpersist()


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


def _refuse_max_df(max_df: Optional[int], op: str) -> None:
    if max_df is not None:
        raise ValueError(
            f"{op}: this index was built with max_df={max_df} — "
            "incremental writes would re-introduce dropped terms with "
            "postings from the new docs only (partial lists, inflated "
            "idf, silently wrong scores). Rebuild with build_text_index."
        )


def append_to_text_index(
    spark: SparkSession,
    new_docs: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
) -> None:
    """Incremental indexing: append NEW documents' postings into the
    existing layout — the bucket transform is the dataset's recorded
    derived partition, so the append re-derives it automatically and the
    new postings land exactly where searches look; doclens and the stats
    row are folded forward (O(new docs), never O(corpus)). The caller's
    contract, stated not checked (checking would scan the index):
    ``new_docs`` ids are NOT already indexed — an id indexed twice would
    double its postings and inflate df_t; ``reindex_documents`` is the
    changed-document path. Refuses on a ``max_df``-built index (module
    docstring). See the module docstring for the multi-commit window."""
    _check_names(id_col, text_col)
    meta = _require_index(spark, index_path)
    key = _index_id_col(meta, index_path)
    if key != id_col:
        raise ValueError(
            f"append_to_text_index: index at {index_path} is keyed by "
            f"{key!r}, not {id_col!r}"
        )
    n_docs, total_len, max_df = _read_stats(spark, index_path)
    _refuse_max_df(max_df, "append_to_text_index")
    postings, dl = _tokenize(new_docs, id_col, text_col)
    dl = dl.persist()
    try:
        publish_path(
            spark, index_path, postings, [], mode="append",
            sort_within_files=["term"],
        )
        # doclens exists for every index built/maintained r10+; a pre-r10
        # index has none — appending a PARTIAL doclens would poison
        # reindex's stats fold, so only maintain an existing one
        if _doclens_exists(spark, index_path):
            publish_path(
                spark,
                _doclens_path(index_path),
                dl.select(F.col(id_col), F.col("dl")),
                [],
                mode="append",
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
    must rebuild); refuses on a ``max_df``-built index (module
    docstring); changed ids must be unique in the batch and non-NULL."""
    _check_names(id_col, text_col)
    meta = _require_index(spark, index_path)
    key = _index_id_col(meta, index_path)
    if key != id_col:
        raise ValueError(
            f"reindex_documents: index at {index_path} is keyed by "
            f"{key!r}, not {id_col!r}"
        )
    n_docs, total_len, max_df = _read_stats(spark, index_path)
    _refuse_max_df(max_df, "reindex_documents")
    if not _doclens_exists(spark, index_path):
        raise ValueError(
            f"reindex_documents: no doclens side table at "
            f"{_doclens_path(index_path)} — this index predates "
            "incremental reindexing; rebuild with build_text_index"
        )
    from . import metadata

    dup = (
        changed_docs.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.count(F.when(F.col(text_col).isNull(), 1)).alias("__nulltext"),
        )
        .filter(f"__n > 1 or {id_col} is null or __nulltext > 0")
        .limit(1)
        .collect()
    )
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
        # O(files holding the changed ids), never O(corpus). Driver holds
        # the changed-id list: reindex batches are change sets, not
        # corpora (the same boundedness as every filter-values list).
        ids = [r[0] for r in dl.select(id_col).collect()]
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
        # same within-file clustering as build/append: reindexed files keep
        # tight term runs, so their bloom fingerprints stay sparse and the
        # bucket-internal skip keeps biting until the next compaction
        eq_delete_append(
            spark, index_path, batch, [id_col],
            sort_within_files=["term"],
        )
        dl_meta = metadata.read_sidecar(spark, _doclens_path(index_path))
        dl_vocab = dl_meta.column_types.get(id_col) if dl_meta else vocab
        dl_batch = dl.select(F.col(id_col), F.col("dl")).withColumn(
            id_col, F.col(id_col).cast(metadata.vocab_to_spark_type(dl_vocab))
        )
        eq_delete_append(
            spark, _doclens_path(index_path), dl_batch, [id_col]
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
    the usual MOR cadence. Refuses on a ``max_df``-built index: removal
    shifts document frequencies, and a rebuild might then KEEP a term
    whose postings the original build dropped — unreproducible from the
    index alone. Returns the number of documents actually removed."""
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
    n_docs, total_len, max_df = _read_stats(spark, index_path)
    _refuse_max_df(max_df, "remove_documents")
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
    if vocab == "integer":
        lits = ", ".join(str(int(i)) for i in ids)
    else:
        # Spark SQL string literals treat BOTH backslash and quote as
        # escapes: escape backslash first, then the quote — an id like
        # r"a\nb" must not become a newline inside the stored predicate
        lits = ", ".join(
            "'" + str(i).replace("\\", "\\\\").replace("'", "\\'") + "'"
            for i in ids
        )
    pred = f"{id_col} IN ({lits})"
    # matches were just proven via the bloom-pruned doclens fetch:
    # count_matches=False keeps each tombstone commit zero-data-read
    delete_where(
        spark, index_path, pred, mode="merge-on-read", count_matches=False
    )
    delete_where(
        spark, _doclens_path(index_path), pred, mode="merge-on-read",
        count_matches=False,
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


def search_text_index(
    spark: SparkSession,
    index_path: str,
    query_terms: List[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` from the index alone —
    same contract and identical scores as ``bm25_scores(corpus, ...)``.
    One term filter: hidden-partition pushdown prunes to the query
    terms' buckets, the residual bloom-skips files inside them, and
    nothing outside the query terms' postings is read. The document id
    column is recovered from the index's own schema."""
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("search_text_index needs at least one query term")
    meta = _require_index(spark, index_path)
    id_col = _index_id_col(meta, index_path)
    n_docs, total_len, _ = _read_stats(spark, index_path)
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
    return (
        postings.join(F.broadcast(dfreq), "term")
        .select(F.col(id_col), (idf * tfn).cast("decimal(28,12)").alias("__s"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("__s").cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
