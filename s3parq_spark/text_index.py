"""Text search index AT REST: BM25 retrieval without scanning the corpus.

``bm25_scores`` (operators/text.py) answers a query by tokenizing the
whole corpus per query — right for ad-hoc analysis, wrong for a serving
path: at 100 TB of documents every search would be a full scan. This
module materializes the classic inverted-index layout as a normal engine
dataset and answers the SAME BM25 ranking from the index alone:

- ``build_text_index`` tokenizes once and publishes posting rows
  ``(term, doc id, tf, dl)`` hive-partitioned by ``bucket =
  hash60(term) % n_buckets`` with a per-file BLOOM fingerprint on
  ``term`` (``file_bloom_columns`` — round 9's point-lookup plane), plus
  a 1-row corpus-stats dataset (n_docs, total_len). Per-term document
  frequency is NOT stored: all postings of a term are co-located, so
  ``df_t`` falls out of the fetched rows themselves — one less global to
  keep consistent under rebuilds.
- ``search_text_index`` hashes the query terms DRIVER-side (the same
  portable md5-60 the engine uses everywhere), fetches only the matching
  buckets — partition pruning — with the term equality probe skipping
  dead files inside each bucket via the bloom fingerprints, and scores
  the surviving postings with literally the same expression sequence as
  ``bm25_scores``. Query cost is O(postings of the query terms), never
  O(corpus); the result is bit-identical to running ``bm25_scores`` over
  the original corpus (pinned by test).

Scale notes: posting rows are (term, id, 2 ints) — a few percent of the
corpus bytes; the build is one tokenize + two key-partitioned aggregates
+ one partitioned write. A stop-term's posting list is large but
SPLITS across files (maxRecordsPerFile), and ``max_df`` can drop terms
above a document-frequency cap at build time (then searches simply get
no contribution from those terms — standard stopword semantics, and the
only deliberate divergence from corpus-side BM25).

Reference analog: none (extension per SURVEY §7.4).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fetch import fetch_path
from .publish import publish_path

__all__ = ["build_text_index", "search_text_index"]


def _bucket_of(term: str, n_buckets: int) -> int:
    """Driver-side twin of the JVM bucket expression (md5-60 mod n)."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16) % n_buckets


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
    (overwrite — a rebuild; the bucketing is stable, so an incremental
    variant could append new docs' postings into the same layout).
    Tokenization matches ``bm25_scores`` exactly: whitespace split of
    ``trim(lower(text))``."""
    from .operators.sampling import _hash60

    toks = corpus.select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    postings = tf.join(dl, id_col).select(
        "term", id_col, "tf", "dl",
        F.pmod(_hash60(F.col("term")), F.lit(n_buckets))
        .cast("int").alias("bucket"),
    )
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
        ["bucket"],
        mode="overwrite",
        sort_within_files=["term"],
        max_records_per_file=max_records_per_file,
        file_bloom_columns=["term"],
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    ).withColumn("n_buckets", F.lit(n_buckets))
    publish_path(spark, _stats_path(index_path), stats, [], mode="overwrite")


def search_text_index(
    spark: SparkSession,
    index_path: str,
    query_terms: List[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` from the index alone —
    same contract and identical scores as ``bm25_scores(corpus, ...)``.
    The fetch carries a partition filter on the query terms' buckets
    (file-index prune) and a term equality filter (bloom file skipping
    inside the buckets + pushed row predicate); nothing outside the
    query terms' postings is read."""
    from . import metadata

    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("search_text_index needs at least one query term")
    meta = metadata.read_sidecar(spark, index_path)
    if meta is None:
        raise ValueError(f"no text index at {index_path} (build_text_index)")
    # the bucket count is a LAYOUT property recorded in the stats row at
    # build time (counting distinct partition dirs would under-read it on
    # sparse small corpora)
    stats = fetch_path(spark, _stats_path(index_path)).collect()[0]
    n_docs, total_len = int(stats["n_docs"]), int(stats["total_len"])
    n_buckets = int(stats["n_buckets"])
    buckets = sorted({_bucket_of(t, n_buckets) for t in terms})
    postings = fetch_path(
        spark,
        index_path,
        filters=[
            {"partition": "bucket", "comparison": "==", "values": buckets},
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
