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
  plane), plus a 1-row corpus-stats dataset (n_docs, total_len).
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

Scale notes: posting rows are (term, id, 2 ints) — a few percent of the
corpus bytes; a stop-term's posting list splits across files
(maxRecordsPerFile), and ``max_df`` can drop terms above a document-
frequency cap at build time (searches then get no contribution from
them — standard stopword semantics, the one stated divergence from
corpus-side BM25). A REBUILD writes two datasets (index, then stats)
non-atomically; rebuild into a fresh path and repoint readers — the
same recommendation every two-dataset pipeline in this engine follows —
or accept the small window where stats and index disagree on
n_docs/total_len (scores shift slightly; bucket routing cannot break:
the layout travels inside the index's own sidecar).

Reference analog: none (extension per SURVEY §7.4).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fetch import fetch_path
from .publish import publish_path

__all__ = ["append_to_text_index", "build_text_index", "search_text_index"]

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
    contract). Tokenization matches ``bm25_scores`` exactly: whitespace
    split of ``trim(lower(text))``."""
    toks = corpus.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # dl derives from tf (postings cover ALL terms, so sum(tf) per doc IS
    # the document length) and feeds the postings join AND the stats row:
    # persisted, so the corpus is tokenized exactly once — by the tf
    # aggregate — however many consumers follow
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl")).persist()
    try:
        postings = tf.join(dl, id_col).select("term", id_col, "tf", "dl")
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
        stats = dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_len"),
        )
        publish_path(
            spark, _stats_path(index_path), stats, [], mode="overwrite"
        )
    finally:
        dl.unpersist()


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
    new postings land exactly where searches look; the stats row is
    folded forward (O(new docs), never O(corpus)). The caller's contract,
    stated not checked (checking would scan the index): ``new_docs`` ids
    are NOT already indexed — an id indexed twice would double its
    postings and inflate df_t. Re-indexing changed documents needs a
    rebuild (or a future eq-delete of the old postings)."""
    from . import metadata

    meta = metadata.read_sidecar(spark, index_path)
    if meta is None or "bucket" not in (meta.derived_partitions or {}):
        raise ValueError(
            f"no text index at {index_path} (build_text_index first)"
        )
    toks = new_docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl")).persist()
    try:
        postings = tf.join(dl, id_col).select("term", id_col, "tf", "dl")
        publish_path(
            spark, index_path, postings, [], mode="append",
            sort_within_files=["term"],
        )
        delta = dl.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").alias("total_len"),
        ).collect()[0]
        prev = fetch_path(spark, _stats_path(index_path)).collect()[0]
        stats = spark.createDataFrame(
            [(
                int(prev["n_docs"]) + int(delta["n_docs"]),
                int(prev["total_len"]) + int(delta["total_len"]),
            )],
            "n_docs long, total_len long",
        )
        publish_path(
            spark, _stats_path(index_path), stats, [], mode="overwrite"
        )
    finally:
        dl.unpersist()


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
    from . import metadata

    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("search_text_index needs at least one query term")
    meta = metadata.read_sidecar(spark, index_path)
    if meta is None:
        raise ValueError(f"no text index at {index_path} (build_text_index)")
    id_cols = [c for c in meta.column_types if c not in _POSTING_COLS]
    if len(id_cols) != 1:
        raise ValueError(
            f"{index_path} does not look like a text index "
            f"(columns: {list(meta.column_types)})"
        )
    id_col = id_cols[0]
    stats = fetch_path(spark, _stats_path(index_path)).collect()[0]
    n_docs, total_len = int(stats["n_docs"]), int(stats["total_len"])
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
