"""Semantic invariants for the round-2 extension queries (workload_ext.py).

The driver's oracle gate proves value-equality against DuckDB; these tests
pin the *properties* that survive refactors: cardinalities, ranking
invariants, ratio bounds, and split correctness.
"""

import pytest
from pyspark.sql import functions as F

from s3parq_spark.workload_ext import QUERIES_EXT


def test_knn_graph_k_and_ordering(spark, sf_dir):
    rows = QUERIES_EXT["knn_graph"](spark, sf_dir).collect()
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r)
    for vec, nbrs in by_vec.items():
        assert 1 <= len(nbrs) <= 3
        nbrs.sort(key=lambda r: r.rk)
        assert [r.rk for r in nbrs] == list(range(1, len(nbrs) + 1))
        cosines = [r.cosine for r in nbrs]
        assert cosines == sorted(cosines, reverse=True)
        assert vec not in {r.nbr_id for r in nbrs}


def test_repetition_quality_bounds(spark, sf_dir):
    df = QUERIES_EXT["repetition_quality"](spark, sf_dir)
    bad = df.filter(
        (F.col("distinct_ratio") <= 0)
        | (F.col("distinct_ratio") > 1)
        | (F.col("top_tok_frac") <= 0)
        | (F.col("top_tok_frac") > 1)
        | (F.col("n_distinct") > F.col("n_tokens"))
    )
    assert bad.count() == 0
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert df.count() == n_docs


def test_top_supplier_is_argmax_with_ties(spark, sf_dir):
    rows = QUERIES_EXT["top_supplier"](spark, sf_dir).collect()
    assert len(rows) >= 1
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1  # all returned suppliers tie at the max


def test_ngram_contamination_split(spark, sf_dir):
    rows = QUERIES_EXT["ngram_contamination"](spark, sf_dir).collect()
    docs = {
        r.doc_id: int(r.source[3:])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    for r in rows:
        assert docs[r.train_doc] < 10
        assert docs[r.bench_doc] >= 10
    assert len(rows) == len({(r.train_doc, r.bench_doc) for r in rows})


def test_embedding_centroids_shape(spark, sf_dir):
    df = QUERIES_EXT["embedding_centroids"](spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_labels = emb.select("label").distinct().count()
    dim = len(emb.select("embedding").first()[0])
    assert df.count() == n_labels * dim
    # n_vectors per (label,pos) equals the label's row count
    counts = {r.label: r.n for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()}
    for r in df.select("label", "n_vectors").distinct().collect():
        assert counts[r.label] == r.n_vectors


def test_market_share_volume_consistency(spark, sf_dir):
    rows = QUERIES_EXT["market_share"](spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.nation_volume <= r.total_volume + 1e-6
        assert r.mkt_share == pytest.approx(r.nation_volume / r.total_volume)


def test_disjunctive_parts_single_row(spark, sf_dir):
    rows = QUERIES_EXT["disjunctive_parts"](spark, sf_dir).collect()
    assert len(rows) == 1
    assert rows[0].n_items >= 0


def test_pack_sequences_offsets_are_bucket_cumsum(spark, sf_dir):
    rows = QUERIES_EXT["pack_sequences"](spark, sf_dir).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, docs in by_bucket.items():
        docs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in docs:
            assert r.seq_offset == off
            assert r.seq_id == off // 256
            off += r.n_tokens


def test_corpus_upsample_copy_counts(spark, sf_dir):
    rows = QUERIES_EXT["corpus_upsample"](spark, sf_dir).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault((r.doc_id, r.source), []).append(r.copy_idx)
    for (doc, src), idxs in per_doc.items():
        assert sorted(idxs) == list(range(1, len(idxs) + 1))
        if src == "src1":
            assert len(idxs) == 2
        elif src == "src2":
            assert len(idxs) == 1  # survivors keep exactly one copy
        elif src == "src3":
            assert len(idxs) in (1, 2)
        else:
            assert len(idxs) == 1


def test_quality_select_three_per_source(spark, sf_dir):
    rows = QUERIES_EXT["quality_select"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, sel in by_src.items():
        assert len(sel) == 3
        sel.sort(key=lambda r: r.rk)
        ratios = [r.distinct_ratio for r in sel]
        assert ratios == sorted(ratios, reverse=True)


def test_stream_enrich_equals_batch(spark, sf_dir):
    import pyspark.sql.functions as SF

    stream = QUERIES_EXT["events_stream_enrich"](spark, sf_dir)
    from s3parq_spark.workload import _events, _table

    ev = _events(spark, sf_dir)
    cust = _table(spark, sf_dir, "customer")
    batch = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy(
            SF.date_trunc("hour", "ts").alias("window_start"), "c_mktsegment"
        )
        .agg(SF.count(SF.lit(1)).alias("n_events"))
    )
    assert sorted(map(tuple, stream.collect())) == sorted(map(tuple, batch.collect()))


def test_corpus_shuffle_deterministic_and_dense(spark, sf_dir):
    from s3parq_spark.operators.sampling import corpus_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    a = corpus_shuffle(docs, "doc_id", n_shards=8).collect()
    b = corpus_shuffle(docs.repartition(7), "doc_id", n_shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # layout-independent
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.position)
    for shard, pos in by_shard.items():
        assert sorted(pos) == list(range(len(pos)))  # dense 0..n-1


def test_dedup_keep_best_prefers_priority(spark):
    from pyspark.sql import functions as SF

    from s3parq_spark.operators.dedup import dedup_keep_best

    rows = [
        (1, "crawl", "same text", 1),
        (2, "curated", "same text", 0),
        (3, "crawl", "unique", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string, prio int")
    got = {
        r.text: (r.doc_id, r.source, r.n_copies)
        for r in dedup_keep_best(
            df, ["text"], [SF.col("prio"), SF.col("doc_id")],
            ["prio", "doc_id", "source"],
        ).collect()
    }
    assert got["same text"] == (2, "curated", 2)  # prio 0 beats prio 1
    assert got["unique"] == (3, "crawl", 1)


class TestUnigramEntropy:
    def test_entropy_values(self, spark):
        import math

        from s3parq_spark.operators.text import unigram_entropy

        rows = [
            ("U", "a b c d"),        # uniform over 4 -> H = ln 4, norm = 1
            ("S", "x x x x"),        # single token -> H = 0
            ("M", "y y z"),          # H = -(2/3 ln 2/3 + 1/3 ln 1/3)
        ]
        df = spark.createDataFrame(rows, ["source", "text"])
        out = {r["source"]: r for r in
               unigram_entropy(df, "source", "text").collect()}
        assert abs(out["U"]["entropy"] - math.log(4)) < 1e-9
        assert abs(out["U"]["norm_entropy"] - 1.0) < 1e-9
        assert out["S"]["entropy"] == 0.0 and out["S"]["norm_entropy"] == 0.0
        h = -(2/3) * math.log(2/3) - (1/3) * math.log(1/3)
        assert abs(out["M"]["entropy"] - h) < 1e-9
        assert out["M"]["n_tokens"] == 3 and out["M"]["n_distinct"] == 2

    def test_deterministic_under_repartition(self, spark):
        from s3parq_spark.operators.text import unigram_entropy

        df = spark.createDataFrame(
            [("A", f"w{i % 7} w{i % 3}") for i in range(50)],
            ["source", "text"],
        )
        a = unigram_entropy(df, "source", "text").collect()
        b = unigram_entropy(df.repartition(9), "source", "text").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
