"""Round-2 extension queries: remaining TPC-H shapes expressible on the
driver's column subset, plus corpus-statistics / contamination / centroid
operators for the training-data pipeline surface.

Reference parity: the relational shapes mirror the query semantics of
TPC-H Q7/Q8/Q9/Q15/Q19 restricted to the columns the testdata carries
(no partsupp, no l_shipmode/commitdate); the pipeline operators extend
SURVEY.md §2's text/dedup/similarity families.

Every query here follows the repo's oracle-exactness rules (see
ARCHITECTURE.md): decimal-exact aggregation cast to double at the edge,
at most one float op per output value, identical column aliases on both
engines.

Registered into ``workload.QUERIES`` / ``workload.ORACLE_SQL`` by the
import at the bottom of ``workload.py``.
"""

from __future__ import annotations

import os
import posixpath
from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(posixpath.join(sf_dir, f"{name}.parquet"))


def _dec(col, scale=2):
    return F.col(col).cast(f"decimal(18,{scale})")


def _rev_expr():
    """Exact decimal revenue; cast to double only at the aggregate edge."""
    return F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))


_REV = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)


# ---------------------------------------------------------------------------
# TPC-H shapes
# ---------------------------------------------------------------------------


def q_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): revenue flow between two nations
    by ship year.  Scale plan: nation is filtered to the two names and
    broadcast into supplier and (via orders) customer, pruning both dim
    sides before the single big shuffle join lineitem ⋈ orders; the
    cross-pair predicate runs on the joined row, never as a cartesian."""
    n1 = _table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp = (
        _table(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        _table(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
        .select("c_custkey", "cust_nation")
    )
    orders = _table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_rev_expr().cast("double").alias("revenue"))
    )


def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): NATION_5's share of ASIA
    customer revenue per order year.  Numerator and denominator are both
    exact decimal sums; the share is ONE double division at the edge.
    Scale plan: region→nation→customer prune broadcast-joins the fact
    before its only shuffle (lineitem ⋈ orders)."""
    region = _table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation_c = _table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    cust = (
        _table(spark, sf_dir, "customer")
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cr_key") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    nation_s = _table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    supp = (
        _table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    orders = _table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("int").alias("o_year")
    )
    li = _table(spark, sf_dir, "lineitem")
    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("nation_volume"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .withColumn("mkt_share", F.col("nation_volume") / F.col("total_volume"))
    )


def q_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit, no partsupp in the testdata so
    profit = discounted revenue): ECONOMY parts, grouped by supplier
    nation × ship year.  part and supplier⋈nation broadcast into the fact;
    the only shuffle is the final two-key aggregation."""
    part = (
        _table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    nation = _table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), "n_name"
    )
    supp = (
        _table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "n_name")
    )
    li = _table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(_rev_expr().cast("double").alias("sum_profit"))
    )


def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): supplier(s) with max revenue over a
    ship-date quarter, ties kept.  The max is joined back against the
    per-supplier aggregate on EXACT decimal revenue (no float compare);
    both sides of the self-comparison are the same small post-aggregate
    relation, so the max is a broadcast join, not a global window sort."""
    li = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    by_supp = li.groupBy("l_suppkey").agg(_rev_expr().alias("rev_dec"))
    max_rev = by_supp.agg(F.max("rev_dec").alias("max_dec"))
    supp = _table(spark, sf_dir, "supplier")
    return (
        by_supp.join(F.broadcast(max_rev), F.col("rev_dec") == F.col("max_dec"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


def q_disjunctive_parts(spark, sf_dir):
    """TPC-H Q19 shape (disjunctive predicates): OR-of-ANDs over
    brand/size/quantity, single-row revenue + count.  The part side is
    pre-filtered to the union of brand×size windows BEFORE the broadcast
    join, so the fact scan keeps partial-pushdown on l_quantity and the
    OR runs on broadcast-joined rows only."""
    part = _table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    qty = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & qty.between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        _rev_expr().cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# corpus statistics / pipeline operators
# ---------------------------------------------------------------------------


def q_repetition_quality(spark, sf_dir):
    """Gopher-style repetition metrics per document: token count, distinct
    ratio, most-frequent-token mass.  One explode + two hash aggregates
    (both with map-side partial); ratios are single int/int double
    divisions, bit-identical across engines."""
    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    per_tok = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_tok.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            (F.col("n_distinct").cast("double") / F.col("n_tokens"))
            .alias("distinct_ratio"),
            (F.col("top_c").cast("double") / F.col("n_tokens")).alias("top_tok_frac"),
        )
    )


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary head: top-50 tokens by frequency (count desc, token
    asc — fully deterministic).  Explode → hash aggregate with map-side
    partials → TakeOrderedAndProject; never a global sort of the vocab."""
    docs = _table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(50)
    )


def q_embedding_centroids(spark, sf_dir):
    """Per-label centroid of the embedding column, emitted as (label, pos,
    centroid) rows.  posexplode → one (label,pos) hash aggregate; the sum
    is exact decimal (order-independent), the mean is ONE double division.
    At 100 TB this is the canonical layout: dim×labels output rows, no
    driver-side matrix, no array reassembly shuffle."""
    emb = _table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return (
        emb.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", F.col("pos").cast("int").alias("pos"))
        .agg(
            F.sum(F.col("x").cast("decimal(28,10)")).alias("s"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .select(
            "label",
            "pos",
            (F.col("s").cast("double") / F.col("n_vectors")).alias("centroid"),
            "n_vectors",
        )
    )


def q_knn_graph(spark, sf_dir):
    """k-nearest-neighbor graph (k=3) within label blocks: for every vector,
    its 3 most-cosine-similar same-label neighbors.  Ranking key is
    round(cosine,6) desc then neighbor id (deterministic across engines);
    the candidate set is the label-blocked equi-join — never all-pairs.
    At scale, swap the label block for an LSH bucket (operators/similarity
    hyperplane signatures) with identical downstream ranking."""
    from .operators.similarity import cosine_similarity

    emb = _table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a, b = emb.alias("a"), emb.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("nbr_id"),
            F.round(cosine_similarity(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("vec_id", "nbr_id", "cosine", F.col("rk").cast("int").alias("rk"))
    )


def q_ngram_contamination(spark, sf_dir):
    """Benchmark-contamination check: distinct (train_doc, bench_doc) pairs
    sharing any 5-token shingle, with the corpus split into train
    (source src0–src9) and benchmark (src10+) halves.  Both sides explode
    to DISTINCT shingles first (prefix dedup shrinks the join input), then
    one string equi-join — the scalable exact plan; at 100 TB the bench
    side's distinct shingle set is the broadcast candidate."""
    k = 5
    docs = _table(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("source", 4, 10).cast("int").alias("src_num"),
        F.split("text", " ").alias("toks"),
    )
    shingles = docs.filter(F.size("toks") >= k).select(
        "doc_id",
        "src_num",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - k),
                lambda i: F.concat_ws(" ", F.slice("toks", i + 1, k)),
            )
        ).alias("g"),
    ).distinct()
    train = shingles.filter(F.col("src_num") < 10).select(
        F.col("doc_id").alias("train_doc"), "g"
    )
    bench = shingles.filter(F.col("src_num") >= 10).select(
        F.col("doc_id").alias("bench_doc"), "g"
    )
    return (
        train.join(bench, "g")
        .select("train_doc", "bench_doc")
        .distinct()
    )


def _plain_fixture_ok(spark, path: str) -> bool:
    """Marker-independent dataset validation for this module's stateful
    gates (r14) — defers to ``workload._dataset_fixture_ok`` (local
    import: workload imports this module at its bottom)."""
    from .workload import _dataset_fixture_ok

    return _dataset_fixture_ok(spark, path)


def _jsonl_export_fixture_ok(path: str, n_shards: int) -> bool:
    """Marker-independent validation for the JSONL export fixture (not
    an s3parq dataset — shard=N/ directories): every shard directory
    must exist and be non-empty, else the export was interrupted."""
    import glob as _glob
    import os as _os

    return all(
        _glob.glob(_os.path.join(path, f"shard={i}", "*"))
        for i in range(n_shards)
    )


QUERIES_EXT: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "volume_shipping": q_volume_shipping,
    "market_share": q_market_share,
    "product_type_profit": q_product_type_profit,
    "top_supplier": q_top_supplier,
    "disjunctive_parts": q_disjunctive_parts,
    "repetition_quality": q_repetition_quality,
    "vocab_topk": q_vocab_topk,
    "embedding_centroids": q_embedding_centroids,
    "knn_graph": q_knn_graph,
    "ngram_contamination": q_ngram_contamination,
}

ORACLE_EXT: Dict[str, str] = {
    "volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {_REV} AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3
    """,
    "market_share": """
        WITH vol AS (
          SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                 CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (1 - CAST(l_discount AS DECIMAL(18,2))) AS v,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                             THEN v ELSE CAST(0 AS DECIMAL(18,2)) END)
                    AS DOUBLE) AS nation_volume,
               CAST(SUM(v) AS DOUBLE) AS total_volume,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                             THEN v ELSE CAST(0 AS DECIMAL(18,2)) END)
                    AS DOUBLE)
                 / CAST(SUM(v) AS DOUBLE) AS mkt_share
        FROM vol
        GROUP BY o_year
    """,
    "product_type_profit": f"""
        SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
               {_REV} AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_type = 'ECONOMY'
        GROUP BY 1, 2
    """,
    "top_supplier": """
        WITH by_supp AS (
          SELECT l_suppkey,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        FROM by_supp JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_dec = (SELECT MAX(rev_dec) FROM by_supp)
    """,
    "disjunctive_parts": f"""
        SELECT {_REV} AS revenue, COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "repetition_quality": """
        WITH per_tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ), counts AS (
          SELECT doc_id, tok, COUNT(*) AS c FROM per_tok GROUP BY doc_id, tok
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_distinct,
               CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                 AS distinct_ratio,
               CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                 AS top_tok_frac
        FROM counts
        GROUP BY doc_id
    """,
    "vocab_topk": """
        SELECT tok, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
        ORDER BY n DESC, tok ASC
        LIMIT 50
    """,
    "embedding_centroids": """
        WITH e AS (
          SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), pos AS (
          SELECT label,
                 unnest(generate_series(0, list_count(v) - 1)) AS pos,
                 unnest(v) AS x
          FROM e
        )
        SELECT label, CAST(pos AS INT) AS pos,
               CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)
                 AS centroid,
               COUNT(*) AS n_vectors
        FROM pos
        GROUP BY label, pos
    """,
    "knn_graph": """
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings
        ), pairs AS (
          SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
                 round(list_cosine_similarity(a.v, b.v), 6) AS cosine
          FROM e a JOIN e b
            ON a.label = b.label AND a.vec_id <> b.vec_id
          -- NaN guard (latent): a zero-magnitude vector would rank first
          -- in DuckDB (NaN > everything DESC) while the engine's
          -- try_divide NULL ranks last — keep the oracle aligned
          WHERE NOT isnan(list_cosine_similarity(a.v, b.v))
        ), ranked AS (
          SELECT vec_id, nbr_id, cosine,
                 CAST(row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY cosine DESC, nbr_id ASC) AS INT) AS rk
          FROM pairs
        )
        SELECT vec_id, nbr_id, cosine, rk FROM ranked WHERE rk <= 3
    """,
    "ngram_contamination": """
        WITH toks AS (
          SELECT doc_id, CAST(substr(source, 4) AS INT) AS src_num,
                 string_split(text, ' ') AS t
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id, src_num,
                 unnest(list_transform(
                   generate_series(1, len(t) - 4),
                   i -> array_to_string(t[i:i+4], ' '))) AS g
          FROM toks
        )
        SELECT DISTINCT a.doc_id AS train_doc, b.doc_id AS bench_doc
        FROM sh a JOIN sh b ON a.g = b.g
        WHERE a.src_num < 10 AND b.src_num >= 10
    """,
}


# ---------------------------------------------------------------------------
# training-data export: packing, mixing, selection, streaming enrichment
# ---------------------------------------------------------------------------


def q_pack_sequences(spark, sf_dir):
    """Sequence packing for training export (operators/text.py
    pack_sequences): docs → fixed-256-token training sequences, first-fit in
    id order within 16 portable-hash buckets.  Per-bucket window cumsum —
    parallel across buckets, never a single global sort."""
    from .operators import pack_sequences

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_sequences(docs, "doc_id", "text", budget_tokens=256, n_buckets=16)


def q_corpus_upsample(spark, sf_dir):
    """Epoch-weighted corpus mixing (operators/sampling.py corpus_upsample):
    src1 ×2.0, src2 ×0.5, src3 ×1.25, everything else ×1 — deterministic
    fractional replication by portable id hash, a pure 1→N explode."""
    from .operators import corpus_upsample

    docs = _table(spark, sf_dir, "documents").select("doc_id", "source")
    return corpus_upsample(
        docs,
        "doc_id",
        {"src1": 2.0, "src2": 0.5, "src3": 1.25},
        strata_col="source",
    )


def q_quality_select(spark, sf_dir):
    """Quality-based per-source selection: keep each source's 3 most
    lexically-diverse documents (distinct-token ratio desc, id asc).  The
    ranking key rounds to 6 digits so both engines rank identically; the
    per-source window is a per-key sort with WindowGroupLimit pushdown."""
    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("toks")
    )
    stats = (
        docs.select("doc_id", "source", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "source")
        .agg(F.sum("c").alias("n_tokens"), F.count(F.lit(1)).alias("n_distinct"))
        .withColumn(
            "distinct_ratio",
            F.round(F.col("n_distinct").cast("double") / F.col("n_tokens"), 6),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("distinct_ratio"), F.asc("doc_id")
    )
    return (
        stats.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "source", "doc_id", "distinct_ratio", F.col("rk").cast("int").alias("rk")
        )
    )


def q_events_stream_enrich(spark, sf_dir):
    """Stream-static enrichment (streaming/events.py
    run_streaming_enriched_counts): the event stream broadcast-joins the
    STATIC customer dim each micro-batch (no stream-side state for the
    join), then watermarked tumbling counts per market segment."""
    from .streaming import run_streaming_enriched_counts

    cust = _table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return run_streaming_enriched_counts(
        spark,
        posixpath.join(sf_dir, "events.parquet"),
        cust,
        join_key="c_custkey",
        group_col="c_mktsegment",
        window="1 hour",
    )


_HASH60_SQL = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"

QUERIES_EXT.update(
    {
        "pack_sequences": q_pack_sequences,
        "corpus_upsample": q_corpus_upsample,
        "quality_select": q_quality_select,
        "events_stream_enrich": q_events_stream_enrich,
    }
)

ORACLE_EXT.update(
    {
        "pack_sequences": f"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                       AS n_tokens,
                     CAST(({_HASH60_SQL} % 10000) % 16 AS INT) AS bucket
              FROM documents
            ), c AS (
              SELECT doc_id, bucket, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM t
            )
            SELECT doc_id, bucket, CAST(n_tokens AS INT) AS n_tokens,
                   CAST(floor((cum - n_tokens) / 256) AS INT) AS seq_id,
                   CAST(cum - n_tokens AS INT) AS seq_offset
            FROM c
        """,
        "corpus_upsample": f"""
            WITH t AS (
              SELECT doc_id, source, {_HASH60_SQL} % 10000 AS bucket
              FROM documents
            ), n AS (
              SELECT doc_id, source,
                     CASE source
                       WHEN 'src1' THEN 2
                       WHEN 'src2' THEN CASE WHEN bucket < 5000 THEN 1 ELSE 0 END
                       WHEN 'src3' THEN 1 + CASE WHEN bucket < 2500 THEN 1 ELSE 0 END
                       ELSE 1
                     END AS n_copies
              FROM t
            )
            SELECT doc_id, source, CAST(ci AS INT) AS copy_idx
            FROM (SELECT doc_id, source,
                         unnest(generate_series(1, n_copies)) AS ci
                  FROM n WHERE n_copies >= 1)
        """,
        "quality_select": """
            WITH per_tok AS (
              SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
              FROM documents
            ), counts AS (
              SELECT doc_id, source, tok, COUNT(*) AS c
              FROM per_tok GROUP BY doc_id, source, tok
            ), stats AS (
              SELECT doc_id, source,
                     round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
                       AS distinct_ratio
              FROM counts GROUP BY doc_id, source
            ), ranked AS (
              SELECT source, doc_id, distinct_ratio,
                     CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY distinct_ratio DESC, doc_id ASC) AS INT) AS rk
              FROM stats
            )
            SELECT source, doc_id, distinct_ratio, rk FROM ranked WHERE rk <= 3
        """,
        "events_stream_enrich": """
            SELECT date_trunc('hour', ts) AS window_start,
                   c_mktsegment, COUNT(*) AS n_events
            FROM events JOIN customer ON c_custkey = user_id
            GROUP BY 1, 2
        """,
    }
)


def q_events_stream_sliding(spark, sf_dir):
    """Sliding (hopping) windows as a STREAMING query (1 hour window,
    30 minute slide, availableNow + memory sink) — same bounded-state
    watermarked aggregation as the tumbling runner with k=2 windows per
    event; checked against the identical batch oracle."""
    from .streaming import run_streaming_tumbling_counts

    return run_streaming_tumbling_counts(
        spark,
        posixpath.join(sf_dir, "events.parquet"),
        window="1 hour",
        slide="30 minutes",
    )


QUERIES_EXT["events_stream_sliding"] = q_events_stream_sliding
# identical to the batch events_sliding oracle: each event falls in its
# half-hour-floor window and the one 30 minutes earlier
ORACLE_EXT["events_stream_sliding"] = """
    WITH typed AS (
      SELECT make_timestamp(epoch_us(ts)) AS ts, event_type, value FROM events
    ), windows AS (
      SELECT unnest([
               make_timestamp((epoch_us(ts) // 1800000000) * 1800000000),
               make_timestamp((epoch_us(ts) // 1800000000) * 1800000000)
                 - INTERVAL 30 MINUTE
             ]) AS window_start,
             event_type, value
      FROM typed
    )
    SELECT window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM windows
    GROUP BY 1, 2
"""


def q_corpus_shuffle(spark, sf_dir):
    """Deterministic training order (operators/sampling.py corpus_shuffle):
    every doc gets a reproducible (shard, position) from its portable id
    hash — the same corpus yields the same order at any cluster size."""
    from .operators.sampling import corpus_shuffle

    docs = _table(spark, sf_dir, "documents").select("doc_id")
    return corpus_shuffle(docs, "doc_id", n_shards=8)


def q_dedup_priority(spark, sf_dir):
    """Policy dedup (operators/dedup.py dedup_keep_best): one row per exact
    text, preferring the curated half of the corpus (src0–src9) and then
    the smallest id — ONE min(struct) hash aggregate, no window over the
    payload."""
    from .operators.dedup import dedup_keep_best

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "text",
        (F.substring("source", 4, 10).cast("int") >= 10).cast("int").alias("prio"),
    )
    return dedup_keep_best(
        docs, ["text"], [F.col("prio"), F.col("doc_id")], ["prio", "doc_id", "source"]
    ).select("doc_id", "source", "n_copies")


QUERIES_EXT.update(
    {"corpus_shuffle": q_corpus_shuffle, "dedup_priority": q_dedup_priority}
)

ORACLE_EXT.update(
    {
        "corpus_shuffle": f"""
            WITH h AS (
              SELECT doc_id, {_HASH60_SQL} AS hh FROM documents
            )
            SELECT doc_id, CAST(hh % 8 AS INT) AS shard,
                   CAST(row_number() OVER (
                     PARTITION BY hh % 8 ORDER BY hh, doc_id) AS BIGINT) - 1
                     AS position
            FROM h
        """,
        "dedup_priority": """
            WITH p AS (
              SELECT doc_id, source, text,
                     CASE WHEN CAST(substr(source, 4) AS INT) >= 10
                          THEN 1 ELSE 0 END AS prio
              FROM documents
            ), ranked AS (
              SELECT doc_id, source, text, prio,
                     row_number() OVER (PARTITION BY text
                                        ORDER BY prio, doc_id) AS rk,
                     COUNT(*) OVER (PARTITION BY text) AS n_copies
              FROM p
            )
            SELECT doc_id, source, n_copies FROM ranked WHERE rk = 1
        """,
    }
)


def q_events_props_map(spark, sf_dir):
    """Semi-structured → MapType path: JSON props parsed to
    ``map<string,bigint>`` (from_json), entries exploded JVM-side, grouped
    per key.  Complements events_json's single-path extraction with the
    generic variant-shaped access pattern — schema-free keys, one explode +
    hash agg, no Python."""
    from .workload import _events

    ev = _events(spark, sf_dir)
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select(F.explode(m).alias("key", "val"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_entries"),
            F.sum("val").alias("sum_val"),
        )
    )


QUERIES_EXT["events_props_map"] = q_events_props_map
ORACLE_EXT["events_props_map"] = """
    WITH kv AS (SELECT unnest(json_keys(props)) AS key, props FROM events)
    SELECT key, COUNT(*) AS n_entries,
           CAST(SUM(CAST(json_extract(props, '$.'||key) AS BIGINT)) AS BIGINT)
             AS sum_val
    FROM kv GROUP BY key
"""


# ---------------------------------------------------------------------------
# time-series / profiling / curation / partition-overwrite (round-2 session 3)
# ---------------------------------------------------------------------------


def q_rolling_user_window(spark, sf_dir):
    """Per-event rolling 1-hour features (operators/timeseries.py
    rolling_window_agg): each event's count and exact-decimal sum of the
    same user's events in the trailing hour — ONE shuffle on user_id, a
    RANGE frame on epoch seconds (ties are peers → order-independent)."""
    from .operators import rolling_window_agg
    from .workload import _events

    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    out = rolling_window_agg(
        ev, "user_id", "ts", "1 hour", sum_col="value", sum_scale=6
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("__n_window").alias("n_window"),
        F.col("__sum_window").alias("sum_window"),
    )


def q_latest_user_state(spark, sf_dir):
    """Changelog compaction (operators/timeseries.py latest_state): the
    upsert view of the event log — most recent event per user via ONE
    max(struct) hash aggregate (map-side partials; no window sort, no
    join-back)."""
    from .operators import latest_state
    from .workload import _events

    ev = _events(spark, sf_dir)
    return latest_state(ev, ["user_id"], "ts", "event_id", ["event_type", "value"])


def q_funnel_click_purchase(spark, sf_dir):
    """Funnel conversion (operators/timeseries.py funnel_next_within):
    for every click, did the same user purchase within 1 hour — a single
    window sweep (min of later purchase timestamps), never the quadratic
    self-join."""
    from .operators import funnel_next_within
    from .workload import _events

    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts", "event_type")
    out = funnel_next_within(
        ev, "user_id", "ts", "event_type", "click", "purchase", "1 hour", "event_id"
    )
    return out.select("event_id", "user_id", "ts", "next_purchase_ts", "converted")


def q_dataset_profile(spark, sf_dir):
    """Per-column quality profile (operators/profile.py profile_columns):
    null count / exact cardinality / bounds for four documents columns in
    ONE aggregate pass over the scan."""
    from .operators import profile_columns

    docs = _table(spark, sf_dir, "documents")
    return profile_columns(docs, ["doc_id", "lang", "source", "n_chars"])


def q_percentile_band(spark, sf_dir):
    """Percentile-band corpus trim (operators/sampling.py
    percentile_band_filter): keep documents whose length sits in the
    [5%, 95%] band of the empirical cume_dist — computed on the distinct
    lengths (tiny) and broadcast back; the corpus is never globally
    sorted."""
    from .operators import percentile_band_filter

    docs = _table(spark, sf_dir, "documents")
    return percentile_band_filter(docs, "n_chars", 0.05, 0.95)


def q_overwrite_partition_fetch(spark, sf_dir):
    """Dynamic partition overwrite end-to-end (publish.py
    overwrite_partitions): publish lineitem partitioned by l_returnflag,
    then re-publish ONLY the R partition with a corrected extract
    (l_quantity <= 25); untouched partitions keep their files. Fetched
    back through the sidecar-typed scan."""
    import os
    import re
    import shutil

    from .fetch import fetch_path
    from .publish import overwrite_partitions, publish_path
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "li_overwrite")
    marker = os.path.join(path, "_OVERWRITTEN")
    if not os.path.exists(marker) or not _plain_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        li = _table(spark, sf_dir, "lineitem")
        publish_path(spark, path, li, ["l_returnflag"], mode="overwrite")
        repl = li.filter(
            (F.col("l_returnflag") == "R") & (F.col("l_quantity") <= 25)
        )
        overwrite_partitions(spark, path, repl, ["l_returnflag"])
        with open(marker, "w") as fh:
            fh.write("ok")
    return fetch_path(spark, path)


QUERIES_EXT.update(
    {
        "rolling_user_window": q_rolling_user_window,
        "latest_user_state": q_latest_user_state,
        "funnel_click_purchase": q_funnel_click_purchase,
        "dataset_profile": q_dataset_profile,
        "percentile_band": q_percentile_band,
        "overwrite_partition_fetch": q_overwrite_partition_fetch,
    }
)

ORACLE_EXT.update(
    {
        # trailing [t-3599s, t] RANGE frame on epoch seconds; decimal-exact
        # sum cast to double at the edge (one float op per value)
        "rolling_user_window": """
            WITH typed AS (
              SELECT event_id, user_id, epoch_us(ts) // 1000000 AS es, value
              FROM events
            )
            SELECT event_id, user_id,
                   COUNT(*) OVER w AS n_window,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                     AS sum_window
            FROM typed
            WINDOW w AS (PARTITION BY user_id ORDER BY es
                         RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        """,
        "latest_user_state": """
            SELECT user_id, ts, event_id, event_type, value FROM (
              SELECT user_id, make_timestamp(epoch_us(ts)) AS ts, event_id,
                     event_type, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "funnel_click_purchase": """
            WITH typed AS (
              SELECT event_id, user_id, make_timestamp(epoch_us(ts)) AS ts,
                     event_type
              FROM events
            ), nxt AS (
              SELECT *,
                     MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                       AS next_purchase_ts
              FROM typed
            )
            SELECT event_id, user_id, ts, next_purchase_ts,
                   next_purchase_ts IS NOT NULL
                     AND next_purchase_ts <= ts + INTERVAL 1 HOUR AS converted
            FROM nxt WHERE event_type = 'click'
        """,
        "dataset_profile": """
            SELECT 'doc_id' AS column_name, COUNT(*) AS n_rows,
                   COUNT(*) - COUNT(doc_id) AS n_nulls,
                   COUNT(DISTINCT doc_id) AS n_distinct,
                   CAST(MIN(doc_id) AS VARCHAR) AS min_value,
                   CAST(MAX(doc_id) AS VARCHAR) AS max_value
            FROM documents
            UNION ALL
            SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
                   COUNT(DISTINCT lang),
                   CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
                   COUNT(DISTINCT source),
                   CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
            FROM documents
            UNION ALL
            SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
                   COUNT(DISTINCT n_chars),
                   CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
            FROM documents
        """,
        # cume_dist on distinct lengths; the single bigint/bigint division
        # is the only float op and is bit-identical across engines
        "percentile_band": """
            WITH counts AS (
              SELECT n_chars AS v, COUNT(*) AS c FROM documents GROUP BY 1
            ), dist AS (
              SELECT v,
                     SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW)
                       / SUM(c) OVER () AS cd
              FROM counts
            ), keep AS (
              SELECT v FROM dist WHERE cd >= 0.05 AND cd <= 0.95
            )
            SELECT d.* FROM documents d JOIN keep ON d.n_chars = keep.v
        """,
        "overwrite_partition_fetch": """
            SELECT * FROM lineitem WHERE l_returnflag <> 'R'
            UNION ALL
            SELECT * FROM lineitem
            WHERE l_returnflag = 'R' AND l_quantity <= 25
        """,
    }
)


# ---------------------------------------------------------------------------
# fuzzy matching / cohorts / histograms (round-2 session 4)
# ---------------------------------------------------------------------------


def q_fuzzy_titles(spark, sf_dir):
    """Edit-distance-1 pairs over document title prefixes
    (operators/fuzzy.py edit_distance_pairs): FastSS deletion-neighborhood
    blocking joined on a 64-bit variant hash, exact-levenshtein verified —
    never the O(n^2) cross join the oracle runs."""
    from .operators import edit_distance_pairs

    docs = _table(spark, sf_dir, "documents")
    titles = docs.select(F.substring("text", 1, 16).alias("title"))
    return edit_distance_pairs(titles, "title", 1)


def q_fuzzy_titles_d2(spark, sf_dir):
    """Edit-distance-2 pairs over document title prefixes: the radius-2
    deletion neighborhood (recursed single-deletion expansion, deduped)
    joined on the variant hash, exact-levenshtein verified. Same zero-
    false-negative FastSS blocking as distance 1, ~L^2/2 variants per
    string instead of L — still an equi-join, never the O(n^2) cross join
    the oracle runs."""
    from .operators import edit_distance_pairs

    docs = _table(spark, sf_dir, "documents")
    titles = docs.select(F.substring("text", 1, 16).alias("title"))
    return edit_distance_pairs(titles, "title", 2)


def q_weekly_cohorts(spark, sf_dir):
    """Weekly cohort retention matrix (operators/timeseries.py
    cohort_retention): cohort assignment + join-back + distinct-count, all
    hash-partitioned on user_id."""
    from .operators import cohort_retention
    from .workload import _events

    ev = _events(spark, sf_dir)
    return cohort_retention(ev, "user_id", "ts")


def q_length_histogram(spark, sf_dir):
    """20-bin equi-width histogram of document lengths
    (operators/profile.py numeric_histogram): integer-exact bucket
    arithmetic, bounds broadcast from a 1-row aggregate."""
    from .operators import numeric_histogram

    docs = _table(spark, sf_dir, "documents")
    return numeric_histogram(docs, "n_chars", 20)


QUERIES_EXT.update(
    {
        "fuzzy_titles": q_fuzzy_titles,
        "fuzzy_titles_d2": q_fuzzy_titles_d2,
        "weekly_cohorts": q_weekly_cohorts,
        "length_histogram": q_length_histogram,
    }
)

ORACLE_EXT.update(
    {
        # brute-force exact reference; the Spark side must produce the
        # identical pair set through FastSS blocking
        "fuzzy_titles": """
            WITH t AS (
              SELECT DISTINCT substr(text, 1, 16) AS title
              FROM documents WHERE text IS NOT NULL
            )
            SELECT a.title AS s1, b.title AS s2
            FROM t a JOIN t b
              ON a.title < b.title AND levenshtein(a.title, b.title) <= 1
        """,
        "fuzzy_titles_d2": """
            WITH t AS (
              SELECT DISTINCT substr(text, 1, 16) AS title
              FROM documents WHERE text IS NOT NULL
            )
            SELECT a.title AS s1, b.title AS s2
            FROM t a JOIN t b
              ON a.title < b.title AND levenshtein(a.title, b.title) <= 2
        """,
        "weekly_cohorts": """
            WITH typed AS (
              SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
              FROM events
            ), cohort AS (
              SELECT user_id, MIN(w) AS cohort_week FROM typed GROUP BY user_id
            )
            SELECT c.cohort_week,
                   datediff('day', c.cohort_week, t.w) // 7 AS week_offset,
                   COUNT(DISTINCT t.user_id) AS n_users
            FROM typed t JOIN cohort c ON t.user_id = c.user_id
            GROUP BY 1, 2
        """,
        "length_histogram": """
            WITH b AS (
              SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM documents
            )
            SELECT LEAST(19, ((n_chars - lo) * 20) // (hi - lo + 1)) AS bin_id,
                   COUNT(*) AS n_rows, MIN(n_chars) AS bin_min,
                   MAX(n_chars) AS bin_max
            FROM documents, b
            WHERE n_chars IS NOT NULL
            GROUP BY 1
        """,
    }
)


def q_user_skew(spark, sf_dir):
    """Heavy-hitter skew profile (operators/profile.py skew_profile): the
    20 busiest users — hash-agg counts, 1-row broadcast total,
    TakeOrderedAndProject top-k with key tie-break."""
    from .operators import skew_profile
    from .workload import _events

    ev = _events(spark, sf_dir)
    return skew_profile(ev, ["user_id"], 20)


def q_doc_correlations(spark, sf_dir):
    """Pairwise Pearson correlation over integer document stats
    (operators/profile.py correlation_matrix): decimal-exact moment sums in
    ONE aggregate, float ops only at the edge in a fixed IEEE sequence."""
    from .operators import correlation_matrix

    docs = _table(spark, sf_dir, "documents").select(
        "n_chars",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.size(F.array_distinct(F.split(F.trim("text"), r"\s+"))).alias(
            "n_uniq"
        ),
    )
    return correlation_matrix(docs, ["n_chars", "n_tokens", "n_uniq"])


def q_shingle_index(spark, sf_dir):
    """Inverted 3-shingle index (operators/text.py inverted_index):
    per-doc-distinct shingles, posting lists via collect_set+array_sort,
    document-frequency band [2, 40] caps posting length (stop-shingle
    cutoff) before anything large materializes.

    Posting lists surface posexploded to (term, n_docs, pos, doc_id)
    scalars — the driver's canonicalizer cannot sort raw array cells."""
    from .operators import inverted_index

    docs = _table(spark, sf_dir, "documents")
    idx = inverted_index(docs, "doc_id", "text", k=3, min_df=2, max_df=40)
    return idx.select(
        "term", "n_docs", F.posexplode("postings").alias("pos", "doc_id")
    ).select("term", "n_docs", F.col("pos").cast("int").alias("pos"), "doc_id")


QUERIES_EXT.update(
    {
        "user_skew": q_user_skew,
        "doc_correlations": q_doc_correlations,
        "shingle_index": q_shingle_index,
    }
)

ORACLE_EXT.update(
    {
        "user_skew": """
            WITH c AS (
              SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
            ), t AS (SELECT COUNT(*) AS total FROM events)
            SELECT user_id, n_rows,
                   CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE) AS share
            FROM c, t
            ORDER BY n_rows DESC, user_id LIMIT 20
        """,
        # identical moment sums in HUGEINT; identical final float sequence
        "doc_correlations": """
            WITH d AS (
              SELECT n_chars,
                     len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
                     len(list_distinct(string_split_regex(trim(text), '\\s+')))
                       AS n_uniq
              FROM documents
            ), m AS (
              SELECT
                COUNT(*) AS n,
                SUM(CAST(n_chars AS HUGEINT)) AS sx1,
                SUM(CAST(n_tokens AS HUGEINT)) AS sy1,
                SUM(CAST(n_chars AS HUGEINT) * n_chars) AS sxx1,
                SUM(CAST(n_tokens AS HUGEINT) * n_tokens) AS syy1,
                SUM(CAST(n_chars AS HUGEINT) * n_tokens) AS sxy1,
                SUM(CAST(n_uniq AS HUGEINT)) AS sy2,
                SUM(CAST(n_uniq AS HUGEINT) * n_uniq) AS syy2,
                SUM(CAST(n_chars AS HUGEINT) * n_uniq) AS sxy2,
                SUM(CAST(n_tokens AS HUGEINT) * n_uniq) AS sxy3
              FROM d
            )
            SELECT 'n_chars' AS col_x, 'n_tokens' AS col_y, n AS n_pairs,
                   CAST(n * sxy1 - sx1 * sy1 AS DOUBLE) /
                   (SQRT(CAST(n * sxx1 - sx1 * sx1 AS DOUBLE)) *
                    SQRT(CAST(n * syy1 - sy1 * sy1 AS DOUBLE))) AS corr
            FROM m
            UNION ALL
            SELECT 'n_chars', 'n_uniq', n,
                   CAST(n * sxy2 - sx1 * sy2 AS DOUBLE) /
                   (SQRT(CAST(n * sxx1 - sx1 * sx1 AS DOUBLE)) *
                    SQRT(CAST(n * syy2 - sy2 * sy2 AS DOUBLE)))
            FROM m
            UNION ALL
            SELECT 'n_tokens', 'n_uniq', n,
                   CAST(n * sxy3 - sy1 * sy2 AS DOUBLE) /
                   (SQRT(CAST(n * syy1 - sy1 * sy1 AS DOUBLE)) *
                    SQRT(CAST(n * syy2 - sy2 * sy2 AS DOUBLE)))
            FROM m
        """,
        "shingle_index": """
            WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents
            ), sh AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(
                       generate_series(1, len(t) - 2),
                       i -> array_to_string(t[i:i+2], ' '))) AS term
              FROM toks WHERE len(t) >= 3
            ), idx AS (
              SELECT term, COUNT(*) AS n_docs,
                     list(doc_id ORDER BY doc_id) AS postings
              FROM sh GROUP BY term
              HAVING COUNT(*) BETWEEN 2 AND 40
        ), px AS (
            SELECT term, n_docs,
                   unnest(generate_series(0, len(postings) - 1)) AS pos,
                   unnest(postings) AS doc_id
            FROM idx
        )
        SELECT term, n_docs, pos, doc_id FROM px
        """,
    }
)


def q_events_stream_latest(spark, sf_dir):
    """Streaming changelog compaction (streaming/events.py
    stream_latest_state): the same max(struct) aggregate-winner as the
    batch operator, folded incrementally through the state store — equal
    to the batch latest_user_state by associativity."""
    import posixpath as pp

    from .streaming import stream_latest_state

    return stream_latest_state(spark, pp.join(sf_dir, "events.parquet"))


QUERIES_EXT["events_stream_latest"] = q_events_stream_latest
# same oracle as the batch compaction: the stream must converge to it
ORACLE_EXT["events_stream_latest"] = """
    SELECT user_id, ts, event_id, event_type, value FROM (
      SELECT user_id, make_timestamp(epoch_us(ts)) AS ts, event_id,
             event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
"""


def q_jsonl_export_roundtrip(spark, sf_dir):
    """JSONL training export end-to-end (export.py): quality-filtered
    documents written as 8 deterministic hash shards (xxhash64(doc_id) mod
    8, partitionBy dirs), read back under an explicit schema — content and
    shard assignment must both survive the round trip."""
    import os
    import re
    import shutil

    from pyspark.sql import types as T

    from .export import export_jsonl, read_jsonl
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "docs_jsonl")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker) or not _jsonl_export_fixture_ok(path, 8):
        shutil.rmtree(path, ignore_errors=True)
        docs = _table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 100)
        export_jsonl(docs, path, "doc_id", n_shards=8)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    out = read_jsonl(spark, path, schema)
    return out.select("doc_id", "text", "lang", "source", "n_chars")


QUERIES_EXT["jsonl_export_roundtrip"] = q_jsonl_export_roundtrip
# content contract: every row survives the JSON round trip exactly.
# Shard determinism (xxhash64 mod n) is pinned by the pytest unit test —
# DuckDB has no xxhash64 to recompute it.
ORACLE_EXT["jsonl_export_roundtrip"] = """
    SELECT doc_id, text, lang, source, n_chars
    FROM documents WHERE n_chars >= 100
"""


def q_hourly_resample(spark, sf_dir):
    """Dense per-user hourly series with explicit zero gaps
    (operators/timeseries.py resample_counts): bucket hash-agg + per-key
    sequence explode + left join, everything partitioned on user_id."""
    from .operators import resample_counts
    from .workload import _events

    ev = _events(spark, sf_dir)
    return resample_counts(ev, "user_id", "ts", "hour")


QUERIES_EXT["hourly_resample"] = q_hourly_resample
ORACLE_EXT["hourly_resample"] = """
    WITH per AS (
      SELECT user_id, date_trunc('hour', ts) AS b, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, MIN(b) AS lo, MAX(b) AS hi FROM per GROUP BY user_id
    ), grid AS (
      SELECT user_id,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
      FROM bounds
    )
    SELECT g.user_id, CAST(g.b AS TIMESTAMP) AS bucket,
           COALESCE(p.n_events, 0) AS n_events
    FROM grid g LEFT JOIN per p
      ON g.user_id = p.user_id AND g.b = p.b
"""


def _li_versions_ds(spark, sf_dir) -> str:
    """Two-snapshot lineitem dataset (cached per sf): v1 = lines 1-3,
    v2 appends the rest — the shared fixture for time travel (fetch_at)
    and incremental CDC reads (fetch_changes)."""
    import os
    import re
    import shutil

    from .publish import publish_path
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "li_versions")
    marker = os.path.join(path, "_VERSIONED")
    if not os.path.exists(marker) or not _plain_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        li = _table(spark, sf_dir, "lineitem")
        publish_path(
            spark, path, li.filter(F.col("l_linenumber") <= 3), ["l_returnflag"]
        )
        publish_path(
            spark,
            path,
            li.filter(F.col("l_linenumber") > 3),
            ["l_returnflag"],
            mode="append",
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    return path


def q_time_travel_fetch(spark, sf_dir):
    """Time travel end-to-end (fetch.py fetch_at): publish lineitem rows
    with l_linenumber <= 3 as v1, append the rest as v2, then read the
    dataset AS OF v1 — the byte-identical training-set reproducibility
    contract. Partition pruning and the sidecar schema apply at the old
    version exactly as at head."""
    from .fetch import fetch_at

    return fetch_at(spark, _li_versions_ds(spark, sf_dir), 1)


QUERIES_EXT["time_travel_fetch"] = q_time_travel_fetch
ORACLE_EXT["time_travel_fetch"] = """
    SELECT * FROM lineitem WHERE l_linenumber <= 3
"""


def q_fetch_changes(spark, sf_dir):
    """Incremental CDC read (fetch.py fetch_changes): over the same
    two-snapshot dataset as time_travel_fetch, read EXACTLY the rows
    appended between v1 and v2 — the "new since my last run" delta, priced
    by the delta's files (the v2 manifest), never a diff against the full
    dataset. Partition pruning still applies: the l_returnflag filter
    prunes the delta's file index before any I/O."""
    from .fetch import fetch_changes

    return fetch_changes(
        spark,
        _li_versions_ds(spark, sf_dir),
        from_version=1,
        to_version=2,
        filters=[{"partition": "l_returnflag", "comparison": "==", "values": ["A"]}],
    )


QUERIES_EXT["fetch_changes"] = q_fetch_changes
ORACLE_EXT["fetch_changes"] = """
    SELECT * FROM lineitem WHERE l_linenumber > 3 AND l_returnflag = 'A'
"""


def q_bucketed_join(spark, sf_dir):
    """Shuffle-free co-located join end to end (publish.py
    publish_bucketed): orders and lineitem both published hash-clustered
    into 8 buckets on the order key via ``saveAsTable``, then sort-merge
    joined BY NAME through the catalog — the merge hint pins SMJ so the
    plan's join reads the bucketed scans directly, zero Exchange below the
    join (asserted in tests/test_bucketing.py; at 100 TB this turns every
    repeated fact-to-fact join into a local merge). Rebuilt each run: the
    driver's in-memory catalog does not persist bucket specs across
    sessions, and the bucketed WRITE is part of the operation under test."""
    import re as _re

    from .publish import publish_bucketed
    from .workload import _CACHE_ROOT, _ds_path

    key = _re.sub(r"[^A-Za-z0-9_.-]", "_", sf_dir.strip("/"))
    schema = "bkt_" + _re.sub(r"[^A-Za-z0-9_]", "_", key)  # catalog name, not a path
    orders = _table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = _table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    base = os.path.join(_CACHE_ROOT, key)
    publish_bucketed(
        spark, os.path.join(base, "b_orders"), orders, "o_orderkey", 8,
        "b_orders", schema,
    )
    publish_bucketed(
        spark, os.path.join(base, "b_lineitem"), li, "l_orderkey", 8,
        "b_lineitem", schema,
    )
    lt = spark.table(f"{schema}.b_lineitem")
    ot = spark.table(f"{schema}.b_orders").hint("merge")
    return (
        lt.join(ot, lt.l_orderkey == ot.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_shipping_priority_split(spark, sf_dir):
    """TPC-H Q12 shape restricted to the carried columns (no l_shipmode /
    commitdate): orders↔lineitem join over a one-year shipdate window, then
    two-way conditional counting — lines belonging to high-priority orders
    (1-URGENT/2-HIGH) vs the rest — per linestatus. The CASE-counting
    aggregate is the shape's point: one shuffle on the group key, the
    priority split costs nothing extra. Orders projects two columns and
    broadcasts under AQE at this scale; at 100 TB both sides shuffle on
    orderkey (or pre-bucket via publish_bucketed and skip the exchange)."""
    li = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    ).select("l_orderkey", "l_linestatus")
    o = _table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
    )


QUERIES_EXT["shipping_priority_split"] = q_shipping_priority_split
ORACLE_EXT["shipping_priority_split"] = """
    SELECT l_linestatus,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY l_linestatus
"""


def q_temperature_mix(spark, sf_dir):
    """Temperature-scaled source mixing (T=0.5): each source's replication
    factor is ``sqrt(N/n_s)`` — the standard inverse-frequency upweighting
    that flattens a skewed source distribution toward uniform (factor 1 for
    a source holding the whole corpus, growing as a source gets rarer).
    Factors come from one bounded counts aggregate (n_sources rows on the
    driver, the partition-combo-bounded pattern); replication is
    operators/sampling.py corpus_upsample — integer thresholds resolved
    from the factor BEFORE touching row data, then a pure 1→N explode.
    Exactness across engines: factor = round(sqrt of one double division,
    4), so the oracle derives bit-identical integer thresholds in SQL."""
    import math

    from .operators import corpus_upsample

    docs = _table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    total = sum(r["n"] for r in counts)
    weights = {
        r["source"]: round(math.sqrt(total / r["n"]), 4) for r in counts
    }
    out = corpus_upsample(docs, "doc_id", weights, "source")
    return out.select("doc_id", "source", "copy_idx")


QUERIES_EXT["temperature_mix"] = q_temperature_mix
ORACLE_EXT["temperature_mix"] = """
    WITH cnt AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt
    ), thr AS (
      SELECT source,
             CAST(floor(f) AS BIGINT) AS whole,
             CAST(round((f - floor(f)) * 10000, 0) AS BIGINT) AS fthr
      FROM (SELECT source,
                   round(sqrt(CAST(total AS DOUBLE) / n), 4) AS f
            FROM cnt CROSS JOIN tot)
    ), t AS (
      SELECT doc_id, d.source,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 10000 AS bucket,
             whole, fthr
      FROM documents d JOIN thr ON thr.source = d.source
    ), n AS (
      SELECT doc_id, source,
             whole + CASE WHEN bucket < fthr THEN 1 ELSE 0 END AS n_copies
      FROM t
    )
    SELECT doc_id, source, CAST(ci AS INT) AS copy_idx
    FROM (SELECT doc_id, source,
                 unnest(generate_series(1, n_copies)) AS ci
          FROM n WHERE n_copies >= 1)
"""


def q_pq_topk(spark, sf_dir):
    """Product-quantization ANN (operators/similarity.py pq_topk): 4
    subspaces × 8 codes over the 64-dim embeddings, deterministic 1-iter
    Lloyd codebooks, corpus encoded to 4 small ints per vector, then
    asymmetric-distance top-10 for query vec 0 — m array lookups + m
    16-dim dots against broadcast literal codebooks, zero shuffles in the
    scoring scan. The oracle replays per-subspace training, encoding, and
    ADC ranking, so the APPROXIMATE result is exactly checkable."""
    from .operators import pq_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    return pq_topk(
        emb, "vec_id", "embedding", q, k=10, m=4, codes=8, kmeans_iters=1
    )


def _pq_subspace_cte(
    j: int, lo: int, hi: int, k: int = 8,
    q_where: str = "vec_id = 0", with_qid: bool = False,
) -> str:
    """Oracle CTE: deterministic 1-iteration Lloyd's + final assignment for
    PQ subspace ``j`` over ``list_slice(v, lo, hi)`` (init = the ``k``
    lowest-id subvectors), plus the query subslice(s) ``q{j}`` selected by
    ``q_where`` (``with_qid=True`` keeps the query id for batch oracles) —
    the SQL replay of ``pq_encode``'s per-subspace quantizer."""
    qid_sel = "vec_id AS qid, " if with_qid else ""
    return f"""
    e{j} AS (
      SELECT vec_id, list_slice(v, {lo}, {hi}) AS v FROM e
    ), c{j}0 AS (
      SELECT vec_id AS cid, v AS cv FROM e{j} WHERE vec_id < {k}
    ), a{j}1 AS (
      SELECT e{j}.vec_id, e{j}.v,
             arg_max(c.cid, list_dot_product(e{j}.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM e{j} CROSS JOIN c{j}0 c GROUP BY e{j}.vec_id, e{j}.v
    ), m{j}1 AS (
      SELECT cell, pos,
             CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS m
      FROM (SELECT cell,
                   unnest(generate_series(0, list_count(v) - 1)) AS pos,
                   unnest(v) AS x
            FROM a{j}1)
      GROUP BY cell, pos
    ), c{j}1 AS (
      SELECT cell AS cid, list(m ORDER BY pos) AS cv FROM m{j}1 GROUP BY cell
      UNION ALL
      SELECT cid, cv FROM c{j}0 WHERE cid NOT IN (SELECT cell FROM m{j}1)
    ), af{j} AS (
      SELECT e{j}.vec_id,
             arg_max(c.cid, list_dot_product(e{j}.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM e{j} CROSS JOIN c{j}1 c GROUP BY e{j}.vec_id, e{j}.v
    ), q{j} AS (
      SELECT {qid_sel}list_slice(v, {lo}, {hi}) AS qv FROM e WHERE {q_where}
    )"""


QUERIES_EXT["pq_topk"] = q_pq_topk
ORACLE_EXT["pq_topk"] = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    {','.join(_pq_subspace_cte(j, j * 16 + 1, (j + 1) * 16) for j in range(4))},
    scored AS (
      SELECT af0.vec_id,
             list_dot_product(q0.qv, b0.cv)
           + list_dot_product(q1.qv, b1.cv)
           + list_dot_product(q2.qv, b2.cv)
           + list_dot_product(q3.qv, b3.cv) AS score
      FROM af0
      JOIN af1 USING (vec_id)
      JOIN af2 USING (vec_id)
      JOIN af3 USING (vec_id)
      JOIN c01 b0 ON b0.cid = af0.cell
      JOIN c11 b1 ON b1.cid = af1.cell
      JOIN c21 b2 ON b2.cid = af2.cell
      JOIN c31 b3 ON b3.cid = af3.cell
      CROSS JOIN q0 CROSS JOIN q1 CROSS JOIN q2 CROSS JOIN q3
      WHERE af0.vec_id <> 0
    )
    SELECT vec_id, round(score, 6) AS adc
    FROM scored ORDER BY score DESC, vec_id ASC LIMIT 10
"""


def q_pq_batch_topk(spark, sf_dir):
    """Batch ADC PQ ANN (operators/similarity.py pq_batch_topk): same
    deterministic 4×8 quantizer as pq_topk, but 4 query vectors answered in
    ONE plan — each query row carries its per-subspace ADC lookup tables
    (computed JVM-side once per query), pairwise scoring is m array lookups
    (zero dot products in the hot path), ranking is the per-query
    WindowGroupLimit. The oracle replays training, encoding, and the
    per-query ADC ranking for all 4 queries."""
    from .operators import pq_batch_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    return pq_batch_topk(
        emb, "vec_id", "embedding", q, k=10, m=4, codes=8, kmeans_iters=1
    )


QUERIES_EXT["pq_batch_topk"] = q_pq_batch_topk
ORACLE_EXT["pq_batch_topk"] = f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    {','.join(_pq_subspace_cte(j, j * 16 + 1, (j + 1) * 16,
                               q_where='vec_id < 4', with_qid=True)
              for j in range(4))},
    scored AS (
      SELECT q0.qid AS query_id, af0.vec_id,
             list_dot_product(q0.qv, b0.cv)
           + list_dot_product(q1.qv, b1.cv)
           + list_dot_product(q2.qv, b2.cv)
           + list_dot_product(q3.qv, b3.cv) AS score
      FROM af0
      JOIN af1 USING (vec_id)
      JOIN af2 USING (vec_id)
      JOIN af3 USING (vec_id)
      JOIN c01 b0 ON b0.cid = af0.cell
      JOIN c11 b1 ON b1.cid = af1.cell
      JOIN c21 b2 ON b2.cid = af2.cell
      JOIN c31 b3 ON b3.cid = af3.cell
      CROSS JOIN q0
      JOIN q1 ON q1.qid = q0.qid
      JOIN q2 ON q2.qid = q0.qid
      JOIN q3 ON q3.qid = q0.qid
      WHERE af0.vec_id <> q0.qid
    ), ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS rk
      FROM scored
    )
    SELECT query_id, vec_id, round(score, 6) AS adc
    FROM ranked WHERE rk <= 10
"""


def q_quality_classifier(spark, sf_dir):
    """Hashed-bag-of-words linear quality classifier (operators/text.py
    linear_quality_classifier): md5-bucketed tokens, Knuth-derived integer
    weights, exact integer logit, one float mean at the edge. The oracle
    replays the identical arithmetic, so the learned-filter PLUMBING (hash,
    bucket, weight, mean, threshold) is what the gate certifies."""
    from .operators import linear_quality_classifier

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    out = linear_quality_classifier(docs, "text", n_features=4096)
    return out.select(
        "doc_id", "n_tokens", F.round("score", 9).alias("score"), "keep"
    )


QUERIES_EXT["quality_classifier"] = q_quality_classifier
ORACLE_EXT["quality_classifier"] = """
    WITH t AS (
      SELECT doc_id,
             list_transform(
               string_split_regex(trim(text), '\\s+'),
               tok -> ((CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 4096)
                       * 2654435761) % 1048576 - 524288
             ) AS ws
      FROM documents
    )
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_tokens,
           round(CAST(list_aggregate(ws, 'sum') AS DOUBLE)
                 / (len(ws) * 1048576), 9) AS score,
           (CAST(list_aggregate(ws, 'sum') AS DOUBLE)
            / (len(ws) * 1048576)) > 0.0 AS keep
    FROM t
"""


QUERIES_EXT["bucketed_join"] = q_bucketed_join
ORACLE_EXT["bucketed_join"] = """
    SELECT o.o_orderpriority,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
"""


def q_merge_upsert_fetch(spark, sf_dir):
    """CDC MERGE INTO end-to-end (publish.py merge_upsert): publish orders
    partitioned by o_orderstatus, apply a batch of updates (totalprice
    bump for o_orderkey % 10 == 0) + inserts (shifted keys for
    o_orderkey % 1000 == 0); newest seq wins per key and only touched
    partitions rewrite. Fetch the merged dataset back."""
    import os
    import re
    import shutil

    from .fetch import fetch_path
    from .publish import merge_upsert, publish_path
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "orders_merge")
    marker = os.path.join(path, "_MERGED")
    if not os.path.exists(marker) or not _plain_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        orders = _table(spark, sf_dir, "orders").withColumn("seq", F.lit(0))
        publish_path(spark, path, orders, ["o_orderstatus"])
        updates = (
            orders.filter(F.col("o_orderkey") % 10 == 0)
            .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
            .withColumn("seq", F.lit(1))
        )
        inserts = (
            orders.filter(F.col("o_orderkey") % 1000 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(30000000))
            .withColumn("seq", F.lit(1))
        )
        merge_upsert(
            spark, path, updates.unionByName(inserts), ["o_orderkey"], "seq"
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    return fetch_path(spark, path)


def q_null_partition_merge(spark, sf_dir):
    """merge_upsert where one hive partition value is NULL (rows land in
    ``__HIVE_DEFAULT_PARTITION__``): the touched-partition predicate must
    compare null-safely (``eqNullSafe``) or the batch's NULL-partition rows
    are silently excluded from the read-merge-rewrite and those upserts are
    lost (r5 ADVICE item 3). Publishes nation with ``p = NULL`` for region
    0, merges even-key updates (+100 on v, seq wins) plus one insert INTO
    the NULL partition, and fetches the merged dataset back — the oracle
    replays the expected final table from raw nation."""
    import os
    import re
    import shutil

    from .fetch import fetch_path
    from .publish import merge_upsert, publish_path
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "nation_null_merge")
    marker = os.path.join(path, "_MERGED")
    if not os.path.exists(marker) or not _plain_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        base = _table(spark, sf_dir, "nation").select(
            "n_nationkey",
            F.when(F.col("n_regionkey") == 0, F.lit(None).cast("string"))
            .otherwise(F.col("n_regionkey").cast("string"))
            .alias("p"),
            F.col("n_regionkey").cast("double").alias("v"),
            F.lit(0).cast("int").alias("seq"),
        )
        publish_path(spark, path, base, ["p"])
        updates = (
            base.filter(F.col("n_nationkey") % 2 == 0)
            .withColumn("v", F.col("v") + F.lit(100.0))
            .withColumn("seq", F.lit(1).cast("int"))
        )
        inserts = spark.createDataFrame(
            [(1000, None, 999.0, 1)],
            "n_nationkey int, p string, v double, seq int",
        )
        merge_upsert(
            spark, path, updates.unionByName(inserts), ["n_nationkey"], "seq"
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    return fetch_path(spark, path).select("n_nationkey", "p", "v", "seq")


QUERIES_EXT["null_partition_merge"] = q_null_partition_merge
ORACLE_EXT["null_partition_merge"] = """
    WITH base AS (
      SELECT n_nationkey,
             CASE WHEN n_regionkey = 0 THEN NULL
                  ELSE CAST(n_regionkey AS VARCHAR) END AS p,
             CAST(n_regionkey AS DOUBLE) AS v
      FROM nation
    )
    SELECT n_nationkey, p,
           v + CASE WHEN n_nationkey % 2 = 0 THEN 100.0 ELSE 0.0 END AS v,
           CASE WHEN n_nationkey % 2 = 0 THEN 1 ELSE 0 END AS seq
    FROM base
    UNION ALL
    SELECT 1000, NULL, 999.0, 1
"""


def q_expectations_report(spark, sf_dir):
    """Data-quality expectations in one aggregate pass
    (operators/profile.py validate_expectations): null / unique / range /
    in_set / regex checks over orders."""
    from .operators import validate_expectations

    orders = _table(spark, sf_dir, "orders")
    return validate_expectations(
        orders,
        [
            {"rule": "orderkey_not_null", "type": "not_null", "col": "o_orderkey"},
            {"rule": "orderkey_unique", "type": "unique", "col": "o_orderkey"},
            {
                "rule": "price_in_range",
                "type": "range",
                "col": "o_totalprice",
                "min": 0.0,
                "max": 100000.0,
            },
            {
                "rule": "status_known",
                "type": "in_set",
                "col": "o_orderstatus",
                "values": ["O", "F"],
            },
            {
                "rule": "priority_format",
                "type": "regex",
                "col": "o_orderpriority",
                "pattern": "^[0-9]-[A-Z]+$",
            },
        ],
    )


QUERIES_EXT.update(
    {
        "merge_upsert_fetch": q_merge_upsert_fetch,
        "expectations_report": q_expectations_report,
    }
)

ORACLE_EXT.update(
    {
        "merge_upsert_fetch": """
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   o_totalprice + CASE WHEN o_orderkey % 10 = 0 THEN 1.0
                                       ELSE 0.0 END AS o_totalprice,
                   o_orderdate, o_orderpriority,
                   CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END AS seq
            FROM orders
            UNION ALL
            SELECT o_orderkey + 30000000, o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority, 1
            FROM orders WHERE o_orderkey % 1000 = 0
        """,
        "expectations_report": """
            SELECT 'orderkey_not_null' AS rule, COUNT(*) AS n_rows,
                   COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END)
                     AS n_violations
            FROM orders
            UNION ALL
            SELECT 'orderkey_unique', COUNT(*),
                   COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)
            FROM orders
            UNION ALL
            SELECT 'price_in_range', COUNT(*),
                   COUNT(CASE WHEN o_totalprice IS NOT NULL
                              AND (o_totalprice < 0.0 OR o_totalprice > 100000.0)
                              THEN 1 END)
            FROM orders
            UNION ALL
            SELECT 'status_known', COUNT(*),
                   COUNT(CASE WHEN o_orderstatus IS NOT NULL
                              AND o_orderstatus NOT IN ('O', 'F')
                              THEN 1 END)
            FROM orders
            UNION ALL
            SELECT 'priority_format', COUNT(*),
                   COUNT(CASE WHEN o_orderpriority IS NOT NULL
                              AND NOT regexp_matches(o_orderpriority,
                                                     '^[0-9]-[A-Z]+$')
                              THEN 1 END)
            FROM orders
        """,
    }
)
