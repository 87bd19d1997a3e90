"""Write-audit-publish (staged snapshots): invisibility to main reads,
audit reads, promote/discard lifecycle, and the guards that keep pending
audits from being silently lost."""

import os

import pytest

from s3parq_spark import metadata
from s3parq_spark.fetch import (
    fetch_at,
    fetch_changes,
    fetch_path,
    get_all_partition_values,
)
from s3parq_spark.maintenance import dataset_health, maintain_dataset
from s3parq_spark.publish import (
    PendingAuditError,
    compact_dataset,
    discard_snapshot,
    expire_snapshots,
    promote_snapshot,
    publish_path,
    restore_dataset,
    tag_snapshot,
    vacuum_dataset,
)


@pytest.fixture()
def nation(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/nation.parquet")


@pytest.fixture()
def staged(spark, nation, tmp_dataset_dir):
    """v1: regions 0-2; staged v2: regions 3-4."""
    publish_path(
        spark, tmp_dataset_dir, nation.filter("n_regionkey < 3"),
        ["n_regionkey"],
    )
    publish_path(
        spark, tmp_dataset_dir, nation.filter("n_regionkey >= 3"),
        ["n_regionkey"], staged=True,
    )
    return tmp_dataset_dir


def test_staged_invisible_to_main_reads(spark, nation, staged):
    n_main = nation.filter("n_regionkey < 3").count()
    assert fetch_path(spark, staged).count() == n_main
    # metadata plane excludes staged values
    assert sorted(
        get_all_partition_values(staged, "", "n_regionkey", spark=spark)
    ) == [0, 1, 2]
    # CDC never carries a pending audit
    with pytest.raises(ValueError, match="must precede"):
        fetch_changes(spark, staged, 1, 1)
    assert fetch_changes(spark, staged, 1, 2).count() == 0


def test_audit_read_and_promote(spark, nation, staged):
    # the audit read: fetch_at of the staged version sees main + staged
    assert fetch_at(spark, staged, 2).count() == 25
    # normal version reads still exclude it
    assert fetch_at(spark, staged, 1).count() == nation.filter(
        "n_regionkey < 3"
    ).count()
    new_v = promote_snapshot(spark, staged, 2)
    assert new_v == 2  # re-committed at the head
    assert fetch_path(spark, staged).count() == 25
    assert metadata.read_sidecar(spark, staged).staged_versions() == []
    # promoted data appears in the delta at its promote version
    assert fetch_changes(spark, staged, 1, new_v).count() == nation.filter(
        "n_regionkey >= 3"
    ).count()


def test_promote_lands_after_interleaved_commits(spark, nation, staged):
    # a normal append lands while the audit is pending
    publish_path(spark, staged, nation.limit(4), ["n_regionkey"])  # v3
    new_v = promote_snapshot(spark, staged, 2)
    assert new_v == 4  # cherry-picked to the head, not back-dated
    versions = [
        s["version"]
        for s in metadata.read_sidecar(spark, staged).snapshots
    ]
    assert versions == [1, 3, 4]
    assert fetch_path(spark, staged).count() == 25 + 4


def test_discard_removes_only_staged_files(spark, nation, staged):
    before = fetch_path(spark, staged).count()
    removed = discard_snapshot(spark, staged, 2, dry_run=True)
    assert removed  # reports without deleting
    assert all(
        os.path.exists(os.path.join(staged, r)) for r in removed
    )
    removed2 = discard_snapshot(spark, staged, 2)
    assert removed2 == removed
    assert not any(
        os.path.exists(os.path.join(staged, r)) for r in removed
    )
    assert fetch_path(spark, staged).count() == before
    with pytest.raises(ValueError, match="no STAGED snapshot"):
        discard_snapshot(spark, staged, 1)  # main-line version


def test_vacuum_and_health_acknowledge_staged(spark, nation, staged):
    assert vacuum_dataset(spark, staged, dry_run=True) == []
    h = dataset_health(spark, staged)
    meta = metadata.read_sidecar(spark, staged)
    assert h["n_files"] == len(meta.all_files())
    assert len(meta.all_files()) > len(meta.manifest_files())


def test_destructive_ops_refuse_pending_audits(spark, nation, staged):
    with pytest.raises(PendingAuditError):
        compact_dataset(spark, staged)
    from s3parq_spark.publish import delete_where, overwrite_partitions

    with pytest.raises(PendingAuditError):
        overwrite_partitions(spark, staged, nation.limit(1), ["n_regionkey"])
    with pytest.raises(PendingAuditError):
        delete_where(spark, staged, "n_nationkey = 1")
    # the maintenance loop records the compact skip instead of crashing
    report = maintain_dataset(
        spark, staged, compact_min_files=1, compact_below_fraction=1.0
    )
    compact_entries = [
        a for a in report["actions"] if a["action"] == "compact_dataset"
    ]
    assert compact_entries and "skipped" in compact_entries[0]


def test_tags_and_expiry_interplay(spark, nation, staged):
    with pytest.raises(ValueError, match="STAGED"):
        tag_snapshot(spark, staged, "x", version=2)
    # default tag targets the newest MAIN-LINE snapshot, not the staged head
    assert tag_snapshot(spark, staged, "main-head") == 1
    # expiry never squashes a staged snapshot away (boundary + singleton)
    for i in range(6):
        publish_path(spark, staged, nation.limit(i + 1), ["n_regionkey"])
    from s3parq_spark.publish import delete_tag

    delete_tag(spark, staged, "main-head")
    expire_snapshots(spark, staged, keep_last=2)
    meta = metadata.read_sidecar(spark, staged)
    assert meta.staged_versions() == [2]
    assert fetch_at(spark, staged, 2).count() == 25  # audit read intact


def test_restore_keeps_or_drops_staged_by_version(spark, nation, staged):
    publish_path(spark, staged, nation.limit(2), ["n_regionkey"])  # v3
    restore_dataset(spark, staged, version=2)
    # the staged v2 survives a restore AT its version...
    assert metadata.read_sidecar(spark, staged).staged_versions() == [2]
    restore_dataset(spark, staged, version=1)
    # ...and dies below it, files removed with it
    meta = metadata.read_sidecar(spark, staged)
    assert meta.staged_versions() == []
    assert fetch_path(spark, staged).count() == nation.filter(
        "n_regionkey < 3"
    ).count()


class TestWapReviewRegressions:
    """Second r8 review pass: staged snapshots vs the aggregate baseline,
    bootstrap staging, overwrite, and sidecar hygiene."""

    def test_staged_on_fresh_dataset_rejected(self, spark, nation, tmp_dataset_dir):
        with pytest.raises(ValueError, match="existing dataset"):
            publish_path(
                spark, tmp_dataset_dir, nation, ["n_regionkey"], staged=True
            )
        # nothing landed: no half-committed unaudited data
        assert not os.path.exists(os.path.join(tmp_dataset_dir))

    def test_full_overwrite_refuses_pending_audits(self, spark, nation, staged):
        with pytest.raises(PendingAuditError):
            publish_path(
                spark, staged, nation.limit(1), ["n_regionkey"],
                mode="overwrite",
            )
        discard_snapshot(
            spark, staged,
            metadata.read_sidecar(spark, staged).staged_versions()[0],
        )
        publish_path(
            spark, staged, nation.limit(1), ["n_regionkey"], mode="overwrite"
        )  # after the discard it proceeds
        assert fetch_path(spark, staged).count() == 1

    def test_discard_gcs_zone_entries(self, spark, nation, tmp_dataset_dir):
        publish_path(
            spark, tmp_dataset_dir, nation.limit(10), ["n_regionkey"],
            zone_map_columns=["n_nationkey"],
        )
        publish_path(
            spark, tmp_dataset_dir, nation.limit(5), ["n_regionkey"],
            staged=True,
        )
        meta = metadata.read_sidecar(spark, tmp_dataset_dir)
        n_before = len(meta.file_stats())
        discard_snapshot(spark, tmp_dataset_dir, 2)
        meta = metadata.read_sidecar(spark, tmp_dataset_dir)
        assert len(meta.file_stats()) < n_before
        assert set(meta.file_stats()) == set(meta.manifest_files())

    def test_aggregate_baseline_ignores_staged_head(self, spark, nation, tmp_path):
        from s3parq_spark.views import create_aggregate, refresh_aggregate

        src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
        publish_path(spark, src, nation.filter("n_regionkey < 3"),
                     ["n_regionkey"])
        publish_path(spark, src, nation.filter("n_regionkey >= 3"),
                     ["n_regionkey"], staged=True)
        d = create_aggregate(spark, src, dst, ["n_regionkey"],
                             {"n": "count(*)"})
        assert d["last_src_version"] == 1  # NOT the staged v2
        promote_snapshot(spark, src, 2)
        r = refresh_aggregate(spark, dst)
        assert r["mode"] == "incremental"  # the promoted rows fold in
        total = sum(x["n"] for x in fetch_path(spark, dst).collect())
        assert total == 25

    def test_nondecomposable_aggregates_rejected(self, spark, nation, tmp_path):
        from s3parq_spark.views import create_aggregate

        src = str(tmp_path / "src")
        publish_path(spark, src, nation, ["n_regionkey"])
        for bad in (
            "count(distinct n_nationkey)",
            "min(n_nationkey)+max(n_nationkey)",
            "count(*) - 5",
            "avg(n_nationkey)",
        ):
            with pytest.raises(ValueError, match="not decomposable"):
                create_aggregate(
                    spark, src, str(tmp_path / "agg"), ["n_regionkey"],
                    {"x": bad},
                )
        # nested parens inside ONE call stay legal
        create_aggregate(
            spark, src, str(tmp_path / "agg_ok"), ["n_regionkey"],
            {"x": "sum(cast(n_nationkey as decimal(18,2)))"},
        )


def test_dataset_refs_table(spark, nation, staged):
    """REFS metadata table: tags + staged + tombstones + aggregate
    definition in one metadata-only view."""
    from s3parq_spark.fetch import dataset_refs
    from s3parq_spark.publish import delete_where
    from s3parq_spark.views import create_aggregate

    tag_snapshot(spark, staged, "baseline", version=1)
    delete_where(spark, staged, "n_nationkey = 0", mode="merge-on-read")
    rows = {
        (r["ref_type"], r["name"], r["version"], r["detail"])
        for r in dataset_refs(spark, staged).collect()
    }
    assert ("tag", "baseline", 1, None) in rows
    assert ("staged", "v2", 2, None) in rows
    assert ("tombstone", "v3", 3, "n_nationkey = 0") in rows
    # an aggregate destination reports its definition ref
    agg = staged + "_agg"
    create_aggregate(spark, staged, agg, ["n_regionkey"], {"n": "count(*)"})
    arows = dataset_refs(spark, agg).collect()
    assert len(arows) == 1 and arows[0]["ref_type"] == "aggregate"
    assert arows[0]["detail"] == staged
