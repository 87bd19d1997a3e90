"""Named snapshot refs (tags) and the link-graph PageRank operator."""

import collections

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from s3parq_spark.fetch import fetch_at_tag, fetch_path
from s3parq_spark.operators import pagerank
from s3parq_spark.publish import (
    delete_tag,
    expire_snapshots,
    list_tags,
    publish_path,
    restore_dataset,
    tag_snapshot,
)


@pytest.fixture()
def nation(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/nation.parquet")


class TestTags:
    def test_tag_fetch_roundtrip(self, spark, nation, tmp_dataset_dir):
        publish_path(
            spark, tmp_dataset_dir, nation.filter("n_nationkey < 10"),
            ["n_regionkey"],
        )
        v = tag_snapshot(spark, tmp_dataset_dir, "baseline")
        assert v == 1
        publish_path(
            spark, tmp_dataset_dir, nation.filter("n_nationkey >= 10"),
            ["n_regionkey"],
        )
        assert fetch_at_tag(spark, tmp_dataset_dir, "baseline").count() == 10
        assert fetch_path(spark, tmp_dataset_dir).count() == 25
        # tagged reads keep pruning semantics
        got = fetch_at_tag(
            spark, tmp_dataset_dir, "baseline",
            filters=[{"partition": "n_regionkey", "comparison": "==",
                      "values": [1]}],
        )
        assert got.count() == nation.filter(
            "n_nationkey < 10 and n_regionkey = 1"
        ).count()

    def test_unknown_and_invalid_names(self, spark, nation, tmp_dataset_dir):
        publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
        with pytest.raises(ValueError, match="no tag"):
            fetch_at_tag(spark, tmp_dataset_dir, "nope")
        with pytest.raises(ValueError, match="invalid tag name"):
            tag_snapshot(spark, tmp_dataset_dir, "has space")
        with pytest.raises(ValueError, match="not in history"):
            tag_snapshot(spark, tmp_dataset_dir, "v9", version=9)

    def test_replace_semantics(self, spark, nation, tmp_dataset_dir):
        publish_path(spark, tmp_dataset_dir, nation.limit(5), ["n_regionkey"])
        publish_path(spark, tmp_dataset_dir, nation.limit(3), ["n_regionkey"])
        tag_snapshot(spark, tmp_dataset_dir, "t", version=1)
        # idempotent re-tag of the same version is fine
        assert tag_snapshot(spark, tmp_dataset_dir, "t", version=1) == 1
        with pytest.raises(ValueError, match="already points"):
            tag_snapshot(spark, tmp_dataset_dir, "t", version=2)
        assert tag_snapshot(
            spark, tmp_dataset_dir, "t", version=2, replace=True
        ) == 2
        assert delete_tag(spark, tmp_dataset_dir, "t") == 2
        with pytest.raises(ValueError, match="no tag"):
            delete_tag(spark, tmp_dataset_dir, "t")

    def test_tag_pins_against_expire(self, spark, nation, tmp_dataset_dir):
        for i in range(6):
            publish_path(
                spark, tmp_dataset_dir, nation.limit(i + 1), ["n_regionkey"]
            )
        tag_snapshot(spark, tmp_dataset_dir, "pin", version=2)
        with pytest.raises(ValueError, match="pinned by tags"):
            expire_snapshots(spark, tmp_dataset_dir, keep_last=2)
        delete_tag(spark, tmp_dataset_dir, "pin")
        assert expire_snapshots(spark, tmp_dataset_dir, keep_last=2)

    def test_restore_drops_tags_above(self, spark, nation, tmp_dataset_dir):
        for i in range(3):
            publish_path(
                spark, tmp_dataset_dir, nation.limit(i + 1), ["n_regionkey"]
            )
        tag_snapshot(spark, tmp_dataset_dir, "early", version=1)
        tag_snapshot(spark, tmp_dataset_dir, "late", version=3)
        restore_dataset(spark, tmp_dataset_dir, version=2)
        assert list_tags(spark, tmp_dataset_dir) == {"early": 1}

    def test_overwrite_clears_tags(self, spark, nation, tmp_dataset_dir):
        publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
        tag_snapshot(spark, tmp_dataset_dir, "gone")
        publish_path(
            spark, tmp_dataset_dir, nation.limit(2), ["n_regionkey"],
            mode="overwrite",
        )
        assert list_tags(spark, tmp_dataset_dir) == {}


def _model_pagerank(edge_list, iterations=3, scale=10**9, num=85, den=100):
    edges = sorted(set(edge_list))
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    deg = collections.Counter(s for s, _ in edges)
    rank = {n: scale for n in nodes}
    base = scale * (den - num) // den
    for _ in range(iterations):
        inc = collections.defaultdict(int)
        for s, d in edges:
            inc[d] += rank[s] // deg[s]
        rank = {n: base + num * inc.get(n, 0) // den for n in nodes}
    return rank


class TestPageRank:
    def test_matches_model_with_dangling_and_parallel_edges(self, spark):
        raw = [(1, 2), (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 1)]
        got = {
            r["node"]: r["rank"]
            for r in pagerank(
                spark.createDataFrame(raw, ["src", "dst"])
            ).collect()
        }
        assert got == _model_pagerank(raw)

    def test_null_endpoints_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (None, 3), (2, None)], "src int, dst int"
        )
        got = {
            r["node"]: r["rank"] for r in pagerank(df).collect()
        }
        assert got == _model_pagerank([(1, 2)])

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 2)], ["src", "dst"])
        with pytest.raises(ValueError, match="iterations"):
            pagerank(df, iterations=0)
        with pytest.raises(ValueError, match="damping"):
            pagerank(df, damping_num=100)
        with pytest.raises(ValueError, match="not in edges"):
            pagerank(df, src="nope")

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=6),
                st.integers(min_value=0, max_value=6),
            ),
            min_size=1,
            max_size=20,
        ),
        st.integers(min_value=1, max_value=4),
    )
    def test_random_graphs_match_model(self, edges, iterations):
        spark = _SPARK[0]
        got = {
            r["node"]: r["rank"]
            for r in pagerank(
                spark.createDataFrame(edges, "src int, dst int"),
                iterations=iterations,
            ).collect()
        }
        assert got == _model_pagerank(edges, iterations=iterations)


_SPARK = [None]


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    # hypothesis-decorated methods can't take fixtures; stash the session
    _SPARK[0] = spark
    yield


class TestTagLifecycleReview:
    """r8 code-review regressions: history-destroying ops must not leave
    refs that later resolve against rebootstrapped version numbers, and
    pinned refs must degrade policy loops instead of crashing them."""

    def test_overwrite_partitions_clears_tags(self, spark, nation, tmp_dataset_dir):
        from s3parq_spark.publish import overwrite_partitions

        publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
        tag_snapshot(spark, tmp_dataset_dir, "baseline")
        overwrite_partitions(
            spark, tmp_dataset_dir, nation.filter("n_regionkey = 1"),
            ["n_regionkey"],
        )
        assert list_tags(spark, tmp_dataset_dir) == {}
        # and after the next append rebootstraps v1, the old name cannot
        # silently resolve to different data
        publish_path(spark, tmp_dataset_dir, nation.limit(1), ["n_regionkey"])
        with pytest.raises(ValueError, match="no tag"):
            fetch_at_tag(spark, tmp_dataset_dir, "baseline")

    def test_compact_refuses_pinned_tags(self, spark, nation, tmp_dataset_dir):
        from s3parq_spark.publish import TagPinnedError, compact_dataset

        publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
        tag_snapshot(spark, tmp_dataset_dir, "pin")
        with pytest.raises(TagPinnedError, match="pin"):
            compact_dataset(spark, tmp_dataset_dir)
        compact_dataset(spark, tmp_dataset_dir, drop_tags=True)
        assert list_tags(spark, tmp_dataset_dir) == {}
        assert fetch_path(spark, tmp_dataset_dir).count() == 25

    def test_maintain_skips_pinned_expiry_and_continues(
        self, spark, nation, tmp_dataset_dir
    ):
        from s3parq_spark.maintenance import maintain_dataset

        for i in range(5):
            publish_path(
                spark, tmp_dataset_dir, nation.limit(i + 1), ["n_regionkey"]
            )
        tag_snapshot(spark, tmp_dataset_dir, "keep", version=1)
        report = maintain_dataset(
            spark, tmp_dataset_dir, max_snapshots=2, keep_last=1,
            vacuum_retention_hours=0.0, dry_run=True,
        )
        actions = {a["action"]: a for a in report["actions"]}
        assert "skipped" in actions["expire_snapshots"]
        assert "vacuum_dataset" in actions  # the loop kept going
