"""Unit tests for the JSONL training-export sink: deterministic shard
assignment, layout, round-trip fidelity, and the streaming latest-state
compaction (stream == batch by associativity)."""

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from s3parq_spark.export import export_jsonl, read_jsonl


@pytest.fixture()
def docs_df(spark):
    rows = [(i, f"text-{i}", i % 3) for i in range(100)]
    return spark.createDataFrame(rows, ["doc_id", "text", "grp"])


SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("grp", T.LongType()),
    ]
)


class TestExportJsonl:
    def test_round_trip_and_layout(self, spark, tmp_path, docs_df):
        path = str(tmp_path / "out")
        export_jsonl(docs_df, path, "doc_id", n_shards=4)
        shard_dirs = sorted(
            os.path.basename(d) for d in glob.glob(os.path.join(path, "shard=*"))
        )
        assert all(d.startswith("shard=") for d in shard_dirs)
        assert 1 <= len(shard_dirs) <= 4
        back = read_jsonl(spark, path, SCHEMA)
        got = sorted(
            (r["doc_id"], r["text"], r["grp"])
            for r in back.select("doc_id", "text", "grp").collect()
        )
        assert got == sorted((i, f"text-{i}", i % 3) for i in range(100))

    def test_shard_assignment_is_content_addressed(self, spark, tmp_path, docs_df):
        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        export_jsonl(docs_df, p1, "doc_id", n_shards=4)
        # different partitioning of the same data -> identical shards
        export_jsonl(docs_df.repartition(13), p2, "doc_id", n_shards=4)

        def shard_map(path):
            back = read_jsonl(spark, path, SCHEMA)
            return {
                r["doc_id"]: r["shard"]
                for r in back.select("doc_id", "shard").collect()
            }

        m1, m2 = shard_map(p1), shard_map(p2)
        assert m1 == m2
        expected = {
            r["doc_id"]: r["s"]
            for r in docs_df.select(
                "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(4)).alias("s")
            ).collect()
        }
        assert m1 == expected

    def test_bad_shards_rejected(self, spark, docs_df, tmp_path):
        with pytest.raises(ValueError, match="n_shards"):
            export_jsonl(docs_df, str(tmp_path / "x"), "doc_id", n_shards=0)


class TestStreamLatestState:
    def test_stream_equals_batch(self, spark, sf_dir):
        import posixpath as pp

        from s3parq_spark.operators import latest_state
        from s3parq_spark.streaming import stream_latest_state
        from s3parq_spark.workload import _events

        got = stream_latest_state(spark, pp.join(sf_dir, "events.parquet"))
        want = latest_state(
            _events(spark, sf_dir), ["user_id"], "ts", "event_id",
            ["event_type", "value"],
        )
        g = sorted(map(tuple, got.collect()), key=lambda t: t[0])
        w = sorted(map(tuple, want.select(*got.columns).collect()), key=lambda t: t[0])
        assert g == w


def test_export_refuses_existing_shard_column(spark, tmp_path):
    import pytest

    from s3parq_spark.export import export_jsonl

    df = spark.createDataFrame([(1, 9)], ["id", "shard"])
    with pytest.raises(ValueError, match="shard"):
        export_jsonl(df, str(tmp_path / "out"), "id")
