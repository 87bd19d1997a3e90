"""Text search index at rest (text_index.py): exact BM25 parity with the
corpus-side operator, and the pruned-read contract."""

import importlib

import pytest
from pyspark.sql import functions as F

from s3parq_spark import metadata
from s3parq_spark.operators import bm25_scores
from s3parq_spark.text_index import (
    _bucket_of,
    build_text_index,
    search_text_index,
)

fetch_mod = importlib.import_module("s3parq_spark.fetch")


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


@pytest.fixture()
def index(spark, docs, tmp_dataset_dir):
    build_text_index(
        spark, docs, tmp_dataset_dir, "doc_id", "text",
        n_buckets=16, max_records_per_file=2000,
    )
    return tmp_dataset_dir


def _rows(df):
    return [
        (r["doc_id"], r["n_terms"], round(r["score"], 9)) for r in df.collect()
    ]


def test_search_equals_corpus_bm25(spark, docs, index):
    for terms in (["hash", "join", "vector"], ["the"], ["model", "data"]):
        got = _rows(search_text_index(spark, index, terms, k=10))
        exp = _rows(bm25_scores(docs, "doc_id", "text", terms, top_k=10))
        assert got == exp, terms
    # absent term contributes nothing; all-absent query returns empty
    got = _rows(search_text_index(spark, index, ["zzqqxx_notaterm"], k=10))
    assert got == []


def test_bucket_hash_parity_and_layout(spark, index):
    from s3parq_spark.operators.sampling import _hash60

    m = metadata.read_sidecar(spark, index)
    assert m.partitions == ["bucket"]
    assert m.file_bloom_columns() == ["term"]
    # driver bucket == JVM bucket for assorted terms
    terms = ["the", "hash", "Ünïcode", "", "a" * 100]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = df.select(
        "term", F.pmod(_hash60(F.col("term")), F.lit(16)).alias("b")
    ).collect()
    for r in got:
        assert r["b"] == _bucket_of(r["term"], 16)


def test_search_reads_only_query_buckets(spark, index):
    """The search fetch must prune to the query terms' buckets at the
    file index and bloom-skip within them — never a corpus/index scan."""
    terms = ["hash", "vector"]
    df = search_text_index(spark, index, terms, k=10)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(jmode)
    assert "bucket" in plan
    m = metadata.read_sidecar(spark, index)
    all_files = m.manifest_files()
    want_buckets = {f"bucket={_bucket_of(t, 16)}/" for t in terms}
    scanned = [
        f for f in df.inputFiles() if "_stats" not in f
    ]
    assert scanned, "search read no index files"
    assert len(scanned) < len(all_files)
    for f in scanned:
        assert any(b in f for b in want_buckets), f


def test_max_df_drops_stop_terms(spark, tmp_dataset_dir):
    rows = [(i, "stop stop unique%d" % i) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_text_index(
        spark, docs, tmp_dataset_dir, "doc_id", "text",
        n_buckets=4, max_df=5,
    )
    # 'stop' appears in 20 docs -> dropped; searches get no contribution
    assert _rows(search_text_index(spark, tmp_dataset_dir, ["stop"])) == []
    got = _rows(search_text_index(spark, tmp_dataset_dir, ["unique3", "stop"]))
    assert len(got) == 1 and got[0][0] == 3 and got[0][1] == 1
    with pytest.raises(ValueError, match="at least one query term"):
        search_text_index(spark, tmp_dataset_dir, [])
