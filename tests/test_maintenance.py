"""Policy-driven maintenance loop (maintenance.py): health probe +
threshold-gated expire/compact/vacuum composition."""

import os

import pytest

from s3parq_spark import metadata
from s3parq_spark.fetch import fetch_path
from s3parq_spark.maintenance import dataset_health, maintain_dataset
from s3parq_spark.publish import publish_path


@pytest.fixture()
def nation(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/nation.parquet")


def _publish_n_versions(spark, path, nation, n):
    for i in range(n):
        publish_path(
            spark, path,
            nation.filter(f"n_nationkey % {n} = {i}"), ["n_regionkey"],
        )


def test_health_probe(spark, nation, tmp_dataset_dir):
    _publish_n_versions(spark, tmp_dataset_dir, nation, 3)
    h = dataset_health(spark, tmp_dataset_dir)
    assert h["n_snapshots"] == 3
    assert h["n_files"] >= 3
    assert h["avg_file_bytes"] > 0
    assert h["n_specs"] == 1
    with pytest.raises(ValueError, match="no sidecar"):
        dataset_health(spark, tmp_dataset_dir + "_missing")


def test_nothing_due_is_a_no_op(spark, nation, tmp_dataset_dir):
    _publish_n_versions(spark, tmp_dataset_dir, nation, 2)
    report = maintain_dataset(spark, tmp_dataset_dir)
    assert report["actions"] == []
    assert fetch_path(spark, tmp_dataset_dir).count() == nation.count()


def test_expire_triggers_on_snapshot_count(spark, nation, tmp_dataset_dir):
    _publish_n_versions(spark, tmp_dataset_dir, nation, 6)
    report = maintain_dataset(
        spark, tmp_dataset_dir, max_snapshots=4, keep_last=2
    )
    acts = {a["action"] for a in report["actions"]}
    assert acts == {"expire_snapshots"}
    m = metadata.read_sidecar(spark, tmp_dataset_dir)
    # base + the kept tail
    assert len(m.snapshots) == 3
    assert fetch_path(spark, tmp_dataset_dir).count() == nation.count()


def test_compact_requires_both_signals(spark, nation, tmp_dataset_dir):
    # many snapshots of tiny files: 10 publishes x ~3 files, each a few KB
    _publish_n_versions(spark, tmp_dataset_dir, nation, 10)
    h = dataset_health(spark, tmp_dataset_dir)
    # small files, but UNDER the file-count floor -> no compaction
    report = maintain_dataset(
        spark, tmp_dataset_dir,
        compact_min_files=int(h["n_files"]) + 1,
        max_snapshots=999,
    )
    assert report["actions"] == []
    # over the floor AND small -> compaction runs and the data survives
    report = maintain_dataset(
        spark, tmp_dataset_dir,
        compact_min_files=int(h["n_files"]),
        max_snapshots=999,
    )
    acts = [a["action"] for a in report["actions"]]
    assert acts == ["compact_dataset"]
    m = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert len(m.snapshots) == 1  # rewrite resets history
    assert fetch_path(spark, tmp_dataset_dir).count() == nation.count()
    assert dataset_health(spark, tmp_dataset_dir)["n_files"] < h["n_files"]


def test_dry_run_changes_nothing(spark, nation, tmp_dataset_dir):
    _publish_n_versions(spark, tmp_dataset_dir, nation, 6)
    before = metadata.read_sidecar(spark, tmp_dataset_dir).to_dict()
    h = dataset_health(spark, tmp_dataset_dir)
    report = maintain_dataset(
        spark, tmp_dataset_dir,
        max_snapshots=2, keep_last=1,
        compact_min_files=int(h["n_files"]),
        vacuum_retention_hours=0.0,
        dry_run=True,
    )
    acts = [a["action"] for a in report["actions"]]
    assert acts == ["expire_snapshots", "compact_dataset", "vacuum_dataset"]
    assert metadata.read_sidecar(spark, tmp_dataset_dir).to_dict() == before


def test_vacuum_is_opt_in_and_reports_orphans(spark, nation, tmp_dataset_dir):
    _publish_n_versions(spark, tmp_dataset_dir, nation, 2)
    # plant an orphan the manifest does not acknowledge
    orphan = os.path.join(tmp_dataset_dir, "orphan.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"not really parquet")
    # default policy never vacuums
    report = maintain_dataset(spark, tmp_dataset_dir)
    assert report["actions"] == []
    assert os.path.exists(orphan)
    report = maintain_dataset(
        spark, tmp_dataset_dir, vacuum_retention_hours=0.0
    )
    assert [a["action"] for a in report["actions"]] == ["vacuum_dataset"]
    assert report["actions"][0]["result"] == ["orphan.parquet"]
    assert not os.path.exists(orphan)


def test_compact_normalizes_evolved_dataset(spark, nation, tmp_dataset_dir):
    publish_path(spark, tmp_dataset_dir, nation.filter("n_nationkey < 10"), ["n_regionkey"])
    publish_path(
        spark, tmp_dataset_dir, nation.filter("n_nationkey >= 10"), ["n_name"],
        evolve_partitions=True,
    )
    assert dataset_health(spark, tmp_dataset_dir)["n_specs"] == 2
    h = dataset_health(spark, tmp_dataset_dir)
    report = maintain_dataset(
        spark, tmp_dataset_dir,
        compact_min_files=int(h["n_files"]), max_snapshots=999,
    )
    assert [a["action"] for a in report["actions"]] == ["compact_dataset"]
    assert dataset_health(spark, tmp_dataset_dir)["n_specs"] == 1
    assert fetch_path(spark, tmp_dataset_dir).count() == nation.count()

def test_jvm_missing_file_normalizes_to_oserror():
    """r7 ADVICE: fs.file_size/file_mtime on a Hadoop-backed filesystem
    raise Py4JJavaError(java FileNotFoundException) for a lost file;
    _jvm_file_status normalizes that to FileNotFoundError (an OSError) so
    dataset_health's manifest-vs-storage tolerance covers BOTH branches."""
    from s3parq_spark import fs as fsmod

    class _FakeJvmFs:
        def getFileStatus(self, jpath):
            raise RuntimeError(
                "An error occurred while calling o1.getFileStatus.\n"
                ": java.io.FileNotFoundException: File nope does not exist"
            )

    with pytest.raises(OSError):
        fsmod._jvm_file_status(_FakeJvmFs(), object(), "s3a://b/nope")

    class _FakeJvmFsOther:
        def getFileStatus(self, jpath):
            raise RuntimeError("some unrelated JVM failure")

    with pytest.raises(RuntimeError, match="unrelated"):
        fsmod._jvm_file_status(_FakeJvmFsOther(), object(), "s3a://b/x")


def test_health_probe_tolerates_lost_manifest_file(spark, nation, tmp_dataset_dir):
    """A manifest-acknowledged file deleted out from under the dataset must
    degrade the probe (counted in n_files, absent from bytes), not crash."""
    _publish_n_versions(spark, tmp_dataset_dir, nation, 3)
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    victim = meta.manifest_files()[0]
    os.remove(os.path.join(tmp_dataset_dir, victim))
    h = dataset_health(spark, tmp_dataset_dir)
    assert h["n_files"] >= 3
    assert h["total_bytes"] > 0


def test_health_reports_mor_debt_and_metadata_plane(spark, sf_dir, tmp_path):
    """r10: health carries the merge-on-read debt (pending tombstones +
    eq-deletes) and the metadata-plane shape; maintain_dataset compacts
    on the debt threshold — scheduled on evidence, not a timer."""
    from pyspark.sql import functions as F

    from s3parq_spark.maintenance import dataset_health, maintain_dataset
    from s3parq_spark.publish import delete_where, merge_upsert, publish_path

    path = str(tmp_path / "ds")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).limit(2000)
    publish_path(spark, path, orders, [])
    h0 = dataset_health(spark, path)
    assert h0["n_pending_tombstones"] == 0
    assert h0["n_pending_eq_deletes"] == 0
    assert h0["sidecar_bytes"] > 0
    delete_where(spark, path, "o_orderkey < 5", mode="merge-on-read")
    merge_upsert(
        spark, path,
        orders.limit(10).withColumn("seq", F.lit(1)),
        ["o_orderkey"], "seq", mode="merge-on-read",
    )
    h1 = dataset_health(spark, path)
    assert h1["n_pending_tombstones"] == 1
    assert h1["n_pending_eq_deletes"] == 1
    # debt threshold triggers compaction (dry_run: report only)
    rep = maintain_dataset(
        spark, path, max_pending_tombstones=2, dry_run=True
    )
    acts = {a["action"]: a for a in rep["actions"]}
    assert "compact_dataset" in acts
    assert "merge-on-read" in acts["compact_dataset"]["reason"]
    # below threshold: no compaction scheduled
    rep2 = maintain_dataset(
        spark, path, max_pending_tombstones=5, dry_run=True
    )
    assert "compact_dataset" not in {a["action"] for a in rep2["actions"]}
    # for real: compaction clears the debt
    maintain_dataset(spark, path, max_pending_tombstones=2)
    h2 = dataset_health(spark, path)
    assert h2["n_pending_tombstones"] == 0
    assert h2["n_pending_eq_deletes"] == 0


def test_compaction_dispatches_to_the_index_family_ops(
    spark, sf_dir, tmp_path
):
    """r12: when the maintained dataset IS an index, the compaction
    remedy must be the family op — compact_ivf_index for an ANN index
    (quantizer sidecar; covers the raw-vector companion too),
    compact_text_index for bucket-derived postings with a stats sibling
    — so one maintenance window clears the WHOLE family's MoR debt
    while preserving the index invariants."""
    from pyspark.sql import functions as F

    from s3parq_spark.ann_index import build_ivf_index, search_ivf_index
    from s3parq_spark.text_index import build_text_index, search_text_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).filter("vec_id < 80")
    ivf = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, ivf, "vec_id", "embedding",
                    k=4, iters=1, m=4, codes=4, store_vectors=True,
                    max_records_per_file=4)
    report = maintain_dataset(
        spark, ivf, compact_min_files=2, compact_below_fraction=1.0,
        max_snapshots=999,
    )
    acts = {a["action"]: a for a in report["actions"]}
    assert "compact_ivf_index" in acts, report["actions"]
    assert set(acts["compact_ivf_index"]["result"]) == {"index", "vectors"}
    row = emb.filter("vec_id = 3").select(
        F.col("embedding").cast("array<double>").alias("v")).first()
    assert search_ivf_index(
        spark, ivf, [float(x) for x in row["v"]], k=3, nprobe=2,
        refine_factor=4,
    ).count() == 3

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).filter("doc_id < 300")
    tix = str(tmp_path / "tix")
    build_text_index(spark, docs, tix, "doc_id", "text", n_buckets=4,
                     max_records_per_file=64)
    report = maintain_dataset(
        spark, tix, compact_min_files=2, compact_below_fraction=1.0,
        max_snapshots=999,
    )
    acts = {a["action"]: a for a in report["actions"]}
    assert "compact_text_index" in acts, report["actions"]
    assert "postings" in acts["compact_text_index"]["result"]
    assert search_text_index(spark, tix, ["hash"], k=3).count() > 0


def test_companion_debt_alone_schedules_family_compaction(
    spark, sf_dir, tmp_path
):
    """r12: the compaction trigger folds the FAMILY members' healths —
    merge-on-read debt hiding in the raw-vector companion (e.g. after a
    manual compact of the index dataset alone) must still schedule
    compact_ivf_index, or every refine search keeps paying the
    companion's tombstone filters forever."""
    from s3parq_spark.ann_index import build_ivf_index, remove_vectors
    from s3parq_spark.publish import compact_dataset

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).filter("vec_id < 60")
    ivf = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, ivf, "vec_id", "embedding",
                    k=4, iters=1, m=4, codes=4, store_vectors=True)
    remove_vectors(spark, [3, 7], ivf, "vec_id")
    # half-done manual maintenance: the index dataset is compacted clean,
    # the companion keeps its removal tombstone
    compact_dataset(spark, ivf)
    assert dataset_health(spark, ivf)["n_pending_tombstones"] == 0
    assert dataset_health(spark, ivf + "_vectors")[
        "n_pending_tombstones"] == 1

    report = maintain_dataset(
        spark, ivf, compact_min_files=9999, max_pending_tombstones=1,
        max_snapshots=999,
    )
    acts = {a["action"]: a for a in report["actions"]}
    assert "compact_ivf_index" in acts, report["actions"]
    assert "family" in acts["compact_ivf_index"]["reason"]
    assert dataset_health(spark, ivf + "_vectors")[
        "n_pending_tombstones"] == 0


def test_companion_history_expires_with_the_family(spark, sf_dir, tmp_path):
    """r12: snapshot-history bounds apply per family member — a
    streaming-fed companion accrues snapshots at the same per-batch rate
    as the primary, and expiring the primary alone would leave the
    companion's sidecar parse cost growing forever."""
    from pyspark.sql import functions as F

    from s3parq_spark.ann_index import append_to_ivf_index, build_ivf_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ivf = str(tmp_path / "ivf")
    build_ivf_index(spark, emb.filter("vec_id < 40"), ivf, "vec_id",
                    "embedding", k=4, iters=1, m=4, codes=4,
                    store_vectors=True)
    # append-only ingestion: plain append histories on BOTH sides —
    # the case expiry can actually squash (tombstone-laden histories
    # refuse to fold across the tombstone and are compaction's job)
    for lo in (40, 45, 50, 55, 60, 65):
        append_to_ivf_index(
            spark,
            emb.filter(f"vec_id >= {lo} and vec_id < {lo + 5}"),
            ivf, "vec_id", "embedding",
        )
    comp = ivf + "_vectors"
    n_before = dataset_health(spark, comp)["n_snapshots"]
    assert n_before > 3  # one append per wave
    report = maintain_dataset(
        spark, ivf, max_snapshots=3, keep_last=2,
        compact_min_files=9999, max_pending_tombstones=9999,
    )
    expired = [a for a in report["actions"]
               if a["action"] == "expire_snapshots"]
    assert {a["dataset"] for a in expired} == {ivf, comp}
    assert dataset_health(spark, comp)["n_snapshots"] <= 3
    # data untouched: every id exactly once on both sides
    from s3parq_spark.fetch import fetch_path
    assert fetch_path(spark, comp).count() == 70
    # opt-in vacuum fans out per member too (dry run: report-only)
    report2 = maintain_dataset(
        spark, ivf, compact_min_files=9999, max_pending_tombstones=9999,
        max_snapshots=999, vacuum_retention_hours=0.0, dry_run=True,
    )
    vac = [a for a in report2["actions"] if a["action"] == "vacuum_dataset"]
    assert {a["dataset"] for a in vac} == {ivf, comp}


def test_clustering_decay_schedules_a_resorting_compaction(
    spark, sf_dir, tmp_path
):
    """r12: the third compaction trigger — a declared sort whose lead
    column's clustering depth decayed past the threshold fires the
    rewrite, and (compaction being layout-preserving by default) the
    same action restores the zone-map locality."""
    from s3parq_spark.maintenance import clustering_depth
    from s3parq_spark.publish import compact_dataset

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    ds = str(tmp_path / "ds")
    publish_path(spark, ds, li, [], max_records_per_file=400,
                 zone_map_columns=["l_orderkey"])
    compact_dataset(spark, ds, sort_by=["l_orderkey"],
                    max_records_per_file=500)
    for _ in range(3):
        publish_path(spark, ds, li.limit(200), [])
    assert clustering_depth(spark, ds, "l_orderkey")["avg_depth"] > 2.0

    # depth under threshold / files under floor: nothing scheduled
    report = maintain_dataset(
        spark, ds, compact_min_files=9999, max_pending_tombstones=9999,
        max_snapshots=999, resort_depth_threshold=2.0,
    )
    assert report["actions"] == []
    report = maintain_dataset(
        spark, ds, compact_min_files=2, max_pending_tombstones=9999,
        max_snapshots=999, resort_depth_threshold=999.0,
        compact_below_fraction=0.0,
    )
    assert report["actions"] == []

    report = maintain_dataset(
        spark, ds, compact_min_files=2, max_pending_tombstones=9999,
        max_snapshots=999, resort_depth_threshold=2.0,
        compact_below_fraction=0.0,
    )
    acts = {a["action"]: a for a in report["actions"]}
    assert "compact_dataset" in acts, report["actions"]
    assert "clustering decay" in acts["compact_dataset"]["reason"]
    assert clustering_depth(spark, ds, "l_orderkey")["max_depth"] <= 2.0
    from s3parq_spark.metadata import read_sidecar
    assert read_sidecar(spark, ds).sort_columns == ["l_orderkey"]


def test_bucketed_lookalike_is_not_a_text_index(spark, nation, tmp_path):
    """r13 (advice): text-index family detection must require the
    POSTINGS schema, not just a bucket-derived partition plus a sibling
    named _stats — a bucket_by-published plain dataset with an
    unrelated _stats neighbor used to be dispatched to
    compact_text_index, which dies on the non-postings schema."""
    ds = str(tmp_path / "ds")
    # plain dataset published under a derived 'bucket' partition, exactly
    # the layout shape build_text_index uses — but not a postings table
    publish_path(
        spark, ds, nation, [],
        derived_partitions={"bucket": "pmod(hash(n_nationkey), 4)"},
        max_records_per_file=2,
    )
    # unrelated sibling that merely shares the _stats naming convention
    publish_path(spark, ds + "_stats", nation.limit(3), [])
    report = maintain_dataset(
        spark, ds, compact_min_files=2, compact_below_fraction=1.0,
        max_snapshots=999,
    )
    acts = {a["action"]: a for a in report["actions"]}
    assert "compact_text_index" not in acts, report["actions"]
    assert "compact_dataset" in acts, report["actions"]
    assert "failed" not in acts["compact_dataset"]
    assert fetch_path(spark, ds).count() == nation.count()


def test_compaction_fault_is_recorded_not_fatal(
    spark, nation, tmp_dataset_dir, monkeypatch
):
    """r13 (advice): an unexpected exception from the dispatched
    compaction op is recorded as a failed action instead of aborting
    the whole maintenance pass — the remaining remedies still run."""
    import s3parq_spark.maintenance as mx

    publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"],
                 max_records_per_file=2)

    def boom(spark_, path_):
        raise RuntimeError("synthetic compaction fault")

    monkeypatch.setattr(mx, "compact_dataset", boom)
    report = mx.maintain_dataset(
        spark, tmp_dataset_dir, compact_min_files=2,
        compact_below_fraction=1.0, max_snapshots=999,
        vacuum_retention_hours=0.0, dry_run=False,
    )
    acts = {a["action"]: a for a in report["actions"]}
    assert acts["compact_dataset"]["failed"].startswith("RuntimeError")
    # the pass kept going: the opt-in vacuum after the fault still ran
    assert "vacuum_dataset" in acts, report["actions"]
    assert fetch_path(spark, tmp_dataset_dir).count() == nation.count()


def test_small_file_reason_names_the_triggering_member(
    spark, sf_dir, tmp_path
):
    """r13 (advice): when a COMPANION crosses the small-file threshold,
    the reason must name that member and its numbers — not report the
    (possibly healthy) primary's."""
    from s3parq_spark.ann_index import build_ivf_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).filter("vec_id < 80")
    ivf = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, ivf, "vec_id", "embedding",
                    k=4, iters=1, m=4, codes=4, store_vectors=True,
                    max_records_per_file=4)
    primary_files = dataset_health(spark, ivf)["n_files"]
    companion_files = dataset_health(spark, ivf + "_vectors")["n_files"]
    # threshold between the two: only the larger-file-count member
    # qualifies, and the reason must carry ITS path and numbers
    lo, hi = sorted([(primary_files, ivf),
                     (companion_files, ivf + "_vectors")])
    if lo[0] == hi[0]:
        pytest.skip("members landed identical file counts")
    report = maintain_dataset(
        spark, ivf, compact_min_files=int(lo[0]) + 1,
        compact_below_fraction=1.0, max_snapshots=999, dry_run=True,
    )
    acts = {a["action"]: a for a in report["actions"]}
    reason = acts["compact_ivf_index"]["reason"]
    assert hi[1] in reason, reason
    assert f"{int(hi[0])} files" in reason, reason


def test_analyze_refresh_is_opt_in_and_incremental(
    spark, nation, tmp_dataset_dir, sf_dir
):
    """r13: maintain_dataset(analyze_stale_versions=N) refreshes an
    EXISTING ANALYZE record once it lags the head by N snapshots —
    incremental-first — and never starts analyzing an unanalyzed
    dataset."""
    from s3parq_spark.stats import collect_stats, read_stats

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    publish_path(spark, tmp_dataset_dir, li.filter("l_orderkey < 300"), [])
    # unanalyzed dataset: nothing scheduled even with the opt-in
    report = maintain_dataset(
        spark, tmp_dataset_dir, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, analyze_stale_versions=1,
    )
    assert not [a for a in report["actions"]
                if a["action"] == "collect_stats"]

    collect_stats(spark, tmp_dataset_dir)
    # fresh record: lag 0 < threshold
    report = maintain_dataset(
        spark, tmp_dataset_dir, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, analyze_stale_versions=2,
    )
    assert not [a for a in report["actions"]
                if a["action"] == "collect_stats"]

    for lo in (300, 500):
        publish_path(
            spark, tmp_dataset_dir,
            li.filter(f"l_orderkey >= {lo} and l_orderkey < {lo + 200}"),
            [], mode="append",
        )
    report = maintain_dataset(
        spark, tmp_dataset_dir, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, analyze_stale_versions=2,
    )
    acts = [a for a in report["actions"] if a["action"] == "collect_stats"]
    assert acts and acts[0]["result"]["mode"] == "incremental"
    s = read_stats(spark, tmp_dataset_dir)
    assert s["row_count"] == li.filter("l_orderkey < 700").count()
    assert s["as_of_version"] == 3  # stamped at the refreshed head

    # default (no opt-in): staleness alone schedules nothing
    publish_path(
        spark, tmp_dataset_dir,
        li.filter("l_orderkey >= 700 and l_orderkey < 800"), [],
        mode="append",
    )
    report = maintain_dataset(
        spark, tmp_dataset_dir, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999,
    )
    assert not [a for a in report["actions"]
                if a["action"] == "collect_stats"]


def test_rewrite_residue_swept_with_vacuum_opt_in(
    spark, nation, tmp_dataset_dir
):
    """r13: a crash between a rewrite's swap-in and its cleanup leaves
    the parked old copy next to the live dataset; the vacuum opt-in
    sweeps it (live sidecar valid => the swap completed). Dry run
    reports without deleting; no opt-in leaves it alone."""
    import shutil as _sh

    publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
    parked = tmp_dataset_dir.rstrip("/") + ".precompact"
    _sh.copytree(tmp_dataset_dir, parked)

    report = maintain_dataset(
        spark, tmp_dataset_dir, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999,
    )
    assert not [a for a in report["actions"]
                if a["action"] == "remove_rewrite_residue"]
    assert os.path.isdir(parked)

    report = maintain_dataset(
        spark, tmp_dataset_dir, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, vacuum_retention_hours=0.0,
        dry_run=True,
    )
    swept = [a for a in report["actions"]
             if a["action"] == "remove_rewrite_residue"]
    assert swept and swept[0]["result"] == parked
    assert os.path.isdir(parked)  # dry run: reported, not deleted

    report = maintain_dataset(
        spark, tmp_dataset_dir, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, vacuum_retention_hours=0.0,
    )
    swept = [a for a in report["actions"]
             if a["action"] == "remove_rewrite_residue"]
    assert swept and not os.path.exists(parked)
    assert fetch_path(spark, tmp_dataset_dir).count() == nation.count()


def test_residue_sweep_honors_retention_window(
    spark, nation, tmp_dataset_dir
):
    """r14 (ADVICE): a parked/temp sibling younger than
    ``vacuum_retention_hours`` may be another process's IN-FLIGHT
    compaction or rebuild — the sweep must skip it, exactly like
    vacuum skips young orphans. Aged past the window it is abandoned
    residue and goes."""
    import shutil as _sh

    publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
    parked = tmp_dataset_dir.rstrip("/") + ".compacting"
    _sh.copytree(tmp_dataset_dir, parked)

    # inside the window (freshly created, retention 1h): skipped
    report = maintain_dataset(
        spark, tmp_dataset_dir, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, vacuum_retention_hours=1.0,
    )
    assert not [a for a in report["actions"]
                if a["action"] == "remove_rewrite_residue"]
    assert os.path.isdir(parked)

    # aged past the window (retention 0): swept
    report = maintain_dataset(
        spark, tmp_dataset_dir, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, vacuum_retention_hours=0.0,
    )
    swept = [a for a in report["actions"]
             if a["action"] == "remove_rewrite_residue"]
    assert swept and not os.path.exists(parked)


def _age_tree(root, seconds_ago=10 * 24 * 3600.0):
    """Set every mtime in ``root`` into the past — the state a rename
    leaves: parked trees keep the mtimes of their ORIGINAL writes."""
    import time as _t

    old = _t.time() - seconds_ago
    os.utime(root, (old, old))
    for dirpath, dirnames, filenames in os.walk(root):
        for name in dirnames + filenames:
            os.utime(os.path.join(dirpath, name), (old, old))


def test_park_stamp_protects_freshly_parked_old_tree(
    spark, nation, tmp_dataset_dir
):
    """r15 (ADVICE r14): rename preserves mtimes, so a directory parked
    SECONDS ago by a concurrent swap reads as aged residue by its tree
    mtimes alone. The ``_PARKED_AT`` stamp the swap writes at park time
    is what the retention window must see — a stamped-but-old tree is
    protected; remove the stamp and the same tree sweeps."""
    import shutil as _sh

    publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
    parked = tmp_dataset_dir.rstrip("/") + ".precompact"
    _sh.copytree(tmp_dataset_dir, parked)
    _age_tree(parked)  # rename-preserved mtimes: tree reads 10 days old
    stamp = os.path.join(parked, "_PARKED_AT")
    with open(stamp, "w") as fh:
        fh.write("parked")  # fresh stamp = the park JUST happened

    report = maintain_dataset(
        spark, tmp_dataset_dir, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, vacuum_retention_hours=1.0,
    )
    assert not [a for a in report["actions"]
                if a["action"] == "remove_rewrite_residue"]
    assert os.path.isdir(parked)

    # stamp aged past the window too: genuinely abandoned — swept
    _age_tree(parked)
    report = maintain_dataset(
        spark, tmp_dataset_dir, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, vacuum_retention_hours=1.0,
    )
    swept = [a for a in report["actions"]
             if a["action"] == "remove_rewrite_residue"]
    assert swept and not os.path.exists(parked)


def test_compaction_swap_writes_the_park_stamp(
    spark, nation, tmp_dataset_dir, monkeypatch
):
    """The stamp is written by the swap itself, after the swap-in
    succeeded and before the cleanup delete — intercept the delete to
    observe the crash window's on-disk state."""
    from s3parq_spark import fs as _fs
    from s3parq_spark.publish import compact_dataset

    publish_path(spark, tmp_dataset_dir, nation, ["n_regionkey"])
    parked = tmp_dataset_dir.rstrip("/") + ".precompact"
    real_delete = _fs.delete

    def keep_parked(spark_, path, recursive=True):
        if path == parked and os.path.isdir(path):
            return True  # simulate a crash before the cleanup delete
        return real_delete(spark_, path, recursive)

    monkeypatch.setattr(_fs, "delete", keep_parked)
    compact_dataset(spark, tmp_dataset_dir)
    assert os.path.isfile(os.path.join(parked, "_PARKED_AT"))
    # the restored LIVE dataset carries no stray stamp
    assert not os.path.exists(
        os.path.join(tmp_dataset_dir, "_PARKED_AT")
    )


def test_missing_quantizer_file_surfaces_epoch_mismatch(
    spark, sf_dir, tmp_path
):
    """r15 (ADVICE r14 medium): a rebuild that crashed after parking the
    live quantizer JSON but before renaming the fresh one in leaves NO
    live quantizer file — the health probe must still read it as an
    epoch mismatch (the sidecar pins ann_epoch / a ``.prerebuild``
    quantizer copy exists), so the residue sweep suspends instead of
    deleting the only rollback copies."""
    import shutil as _sh

    from s3parq_spark.ann_index import build_ivf_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).filter("vec_id < 60")
    ivf = str(tmp_path / "ivf_crashq")
    build_ivf_index(spark, emb, ivf, "vec_id", "embedding", k=4, iters=1)
    qp = ivf + "_quantizers.json"
    # manufacture the sub-window: quantizers parked, fresh never renamed
    os.rename(qp, qp + ".prerebuild")
    _sh.copytree(ivf, ivf + ".prerebuild")
    _age_tree(ivf + ".prerebuild")
    _age_tree(qp + ".prerebuild")

    h = dataset_health(spark, ivf)
    assert h.get("ann_epoch_mismatch") == 1.0

    report = maintain_dataset(
        spark, ivf, compact_min_files=1, compact_below_fraction=1.0,
        max_snapshots=999, max_pending_tombstones=9999,
        vacuum_retention_hours=0.0,
    )
    kinds = [a["action"] for a in report["actions"]]
    assert "quantizer_epoch_mismatch" in kinds
    assert "remove_rewrite_residue" not in kinds
    assert os.path.exists(qp + ".prerebuild")  # rollback copy protected
    assert os.path.isdir(ivf + ".prerebuild")

    # the same window on a PRE-PIN index (no ann_epoch in the sidecar):
    # the parked quantizer copy alone proves the family
    meta = metadata.read_sidecar(spark, ivf)
    meta.ann_epoch = None
    metadata.write_sidecar(spark, ivf, meta)
    assert dataset_health(spark, ivf).get("ann_epoch_mismatch") == 1.0


def test_parked_quantizer_file_gated_on_live_sibling_age(
    spark, sf_dir, tmp_path
):
    """r15 (ADVICE r14): the parked quantizer JSON is a FILE — no stamp
    can be written inside it, and rename preserved its mtime — so the
    sweep gates it on the LIVE sibling's write time: a fresh live
    quantizer means the swap that parked the copy just completed."""
    import shutil as _sh
    import time as _t

    from s3parq_spark.ann_index import build_ivf_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).filter("vec_id < 60")
    ivf = str(tmp_path / "ivf_parkedq")
    build_ivf_index(spark, emb, ivf, "vec_id", "embedding", k=4, iters=1)
    qp = ivf + "_quantizers.json"
    _sh.copyfile(qp, qp + ".prerebuild")
    old = _t.time() - 10 * 24 * 3600.0
    os.utime(qp + ".prerebuild", (old, old))  # rename-preserved mtime

    # live quantizer written moments ago (the build) => park just
    # happened: protected inside the window
    report = maintain_dataset(
        spark, ivf, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, vacuum_retention_hours=1.0,
    )
    assert not [a for a in report["actions"]
                if a["action"] == "remove_rewrite_residue"]
    assert os.path.exists(qp + ".prerebuild")

    # live sibling aged past the window too: abandoned — swept
    os.utime(qp, (old, old))
    report = maintain_dataset(
        spark, ivf, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, vacuum_retention_hours=1.0,
    )
    swept = [a for a in report["actions"]
             if a["action"] == "remove_rewrite_residue"]
    assert [a["result"] for a in swept] == [qp + ".prerebuild"]
    assert not os.path.exists(qp + ".prerebuild")
