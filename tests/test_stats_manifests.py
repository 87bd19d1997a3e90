"""Per-version columnar stats manifests (r10): the sidecar stays
O(columns + versions) however many files carry zone/bloom stats — the
per-file state spills to immutable parquet manifests under _s3parq_stats/
and loads lazily (r9 verdict 'what's wrong' #2: ~2.4 KB/file inline was
GBs of driver JSON at 100 TB file counts)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from s3parq_spark import fs, metadata
from s3parq_spark.fetch import dataset_rowcount, fetch_path
from s3parq_spark.publish import publish_path, restore_dataset


@pytest.fixture()
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _sidecar_bytes(path):
    return os.path.getsize(os.path.join(path, fs.SIDECAR_NAME))


def test_sidecar_stays_flat_as_files_grow(spark, li, tmp_dataset_dir):
    """The headline contract: 10x the stats-carrying files, ~same sidecar.
    Per-file state lives in the manifests; the sidecar records pointers."""
    publish_path(
        spark, tmp_dataset_dir, li.limit(400), [],
        max_records_per_file=200,
        zone_map_columns=["l_orderkey"], file_bloom_columns=["l_partkey"],
    )
    small = _sidecar_bytes(tmp_dataset_dir)
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    n_small = len(meta.manifest_files())
    publish_path(
        spark, tmp_dataset_dir, li.limit(4000), [], mode="append",
        max_records_per_file=200,
    )
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    n_files = len(meta.manifest_files())
    assert n_files >= 10 * n_small
    big = _sidecar_bytes(tmp_dataset_dir)
    raw = json.loads(
        open(os.path.join(tmp_dataset_dir, fs.SIDECAR_NAME)).read()
    )
    # the data-skipping state in the sidecar is POINTER-sized: one
    # ~130-byte entry per publish, never per file (inline was measured
    # ~2.4 KB/file in r9 — GBs at 100 TB file counts); the snapshot
    # file lists spill to per-version manifests past the threshold too,
    # so the WHOLE sidecar is O(versions) — flat however many files land
    zm_bytes = len(json.dumps(raw["zone_maps"]))
    assert zm_bytes < 500, zm_bytes
    assert big < small + 500, (small, big)
    # the sidecar JSON itself carries no per-file stats...
    assert "files" not in raw.get("zone_maps", {})
    assert len(raw["zone_maps"]["stats_manifests"]) == 2
    # ...but every manifest file is covered through the lazy loader
    stats = meta.file_stats()
    assert set(stats) == set(meta.manifest_files())
    assert all("rows" in e for e in stats.values())
    assert all("bloom" in e for e in stats.values())
    # and the metadata-only rowcount still answers exactly
    assert dataset_rowcount(spark, tmp_dataset_dir) == 4400


def test_prunes_load_manifests_lazily(spark, li, tmp_dataset_dir):
    """A fetch whose filters cannot prune must never read a stats
    manifest (the 100 TB point: million-file stats are paid only by
    queries that can use them)."""
    publish_path(
        spark, tmp_dataset_dir, li.limit(500), [],
        max_records_per_file=100, zone_map_columns=["l_orderkey"],
    )
    calls = []
    orig = metadata._read_stats_manifest

    def spy(spark_, path_, rel):
        calls.append(rel)
        return orig(spark_, path_, rel)

    metadata._read_stats_manifest = spy
    try:
        fetch_path(spark, tmp_dataset_dir).count()  # no filters
        assert calls == []
        key = int(li.select(F.max("l_orderkey")).first()[0])
        got = fetch_path(spark, tmp_dataset_dir, filters=[
            {"partition": "l_orderkey", "comparison": "==", "values": [key]},
        ])
        assert got.count() == li.limit(500).filter(
            F.col("l_orderkey") == key
        ).count()
        assert len(calls) == 1  # the prune loaded the one manifest
    finally:
        metadata._read_stats_manifest = orig


def test_manifest_cache_is_per_manifest_and_immutable(spark, li, tmp_path):
    path = str(tmp_path / "ds")
    publish_path(
        spark, path, li.limit(300), [],
        max_records_per_file=100, zone_map_columns=["l_orderkey"],
    )
    m1 = metadata.read_sidecar(spark, path)
    s1 = m1.file_stats()
    # second read: same entries through the process cache, fresh meta
    m2 = metadata.read_sidecar(spark, path)
    assert m2.file_stats() == s1
    # memoized per instance
    assert m2.file_stats() is m2.file_stats()


def test_restore_drops_rolled_back_manifest_pointers(spark, li, tmp_path):
    path = str(tmp_path / "ds")
    publish_path(
        spark, path, li.limit(200), [],
        max_records_per_file=100, zone_map_columns=["l_orderkey"],
    )
    publish_path(
        spark, path, li.limit(100), [], mode="append",
        max_records_per_file=50,
    )
    meta = metadata.read_sidecar(spark, path)
    assert len(meta.stats_manifests()) == 2
    restore_dataset(spark, path, 1)
    meta = metadata.read_sidecar(spark, path)
    assert [m["version"] for m in meta.stats_manifests()] == [1]
    assert set(meta.file_stats()) == set(meta.manifest_files())
    assert dataset_rowcount(spark, path) == 200


def test_legacy_inline_sidecar_still_reads(spark, li, tmp_path):
    """Pre-r10 sidecars inline zone_maps['files']; file_stats() must keep
    serving them (and merge with any manifests a later append adds)."""
    path = str(tmp_path / "ds")
    publish_path(
        spark, path, li.limit(200), [],
        max_records_per_file=100, zone_map_columns=["l_orderkey"],
    )
    # rewrite the sidecar into the legacy inline shape
    meta = metadata.read_sidecar(spark, path)
    stats = meta.file_stats()
    raw = json.loads(open(os.path.join(path, fs.SIDECAR_NAME)).read())
    raw["zone_maps"].pop("stats_manifests")
    raw["zone_maps"]["files"] = stats
    open(os.path.join(path, fs.SIDECAR_NAME), "w").write(json.dumps(raw))
    meta = metadata.read_sidecar(spark, path)
    assert meta.file_stats() == stats
    key = int(li.select(F.max("l_orderkey")).first()[0])
    got = fetch_path(spark, path, filters=[
        {"partition": "l_orderkey", "comparison": "==", "values": [key]},
    ])
    assert got.count() == li.limit(200).filter(
        F.col("l_orderkey") == key
    ).count()
    # an append onto the legacy dataset spills NEW stats to a manifest
    # while keeping the inline legacy entries readable
    publish_path(
        spark, path, li.limit(100), [], mode="append",
        max_records_per_file=50,
    )
    meta = metadata.read_sidecar(spark, path)
    assert len(meta.stats_manifests()) == 1
    assert set(meta.file_stats()) == set(meta.manifest_files())
    assert dataset_rowcount(spark, path) == 300


def test_stats_dir_is_invisible_to_data_plane(spark, li, tmp_path):
    """Manifests live under _s3parq_stats/ with a .stats suffix: no
    .parquet listing (fetch fallback walk, publish diffs, vacuum
    candidates) can ever see them as data."""
    path = str(tmp_path / "ds")
    publish_path(
        spark, path, li.limit(200), [],
        max_records_per_file=100, zone_map_columns=["l_orderkey"],
    )
    assert os.path.isdir(os.path.join(path, metadata.STATS_DIR))
    listed = fs.list_files(spark, path)
    assert not any(f.startswith(metadata.STATS_DIR) for f in listed)
    # a destructive overwrite clears the dataset INCLUDING the stats dir
    publish_path(spark, path, li.limit(10), [], mode="overwrite")
    meta = metadata.read_sidecar(spark, path)
    assert meta.zone_maps is None
    assert fetch_path(spark, path).count() == 10


def test_large_snapshots_spill_file_lists(spark, li, tmp_path):
    """Snapshots past the spill threshold serialize as manifest POINTERS
    (the sidecar stays O(versions) at any file count); small commits stay
    inline (one sidecar GET answers everything). Hydration is invisible:
    manifest_files()/fetch see the same added lists either way."""
    path = str(tmp_path / "ds")
    publish_path(spark, path, li.limit(2000), [], max_records_per_file=50)
    publish_path(
        spark, path, li.limit(30), [], mode="append", max_records_per_file=10
    )
    raw = json.loads(open(os.path.join(path, fs.SIDECAR_NAME)).read())
    s1, s2 = raw["snapshots"]
    assert "added" not in s1 and s1["manifest"]["n"] >= 40
    assert s1["manifest"]["path"].startswith(metadata.MANIFESTS_DIR)
    assert "added" in s2 and "manifest" not in s2  # 3 files: inline
    meta = metadata.read_sidecar(spark, path)
    files = meta.manifest_files()
    assert len(files) == s1["manifest"]["n"] + len(s2["added"])
    assert fetch_path(spark, path).count() == 2030
    # a second write reuses the manifest (no rewrite of immutable lists)
    publish_path(
        spark, path, li.limit(5), [], mode="append", max_records_per_file=5
    )
    raw2 = json.loads(open(os.path.join(path, fs.SIDECAR_NAME)).read())
    assert raw2["snapshots"][0]["manifest"] == s1["manifest"]
    # restore back across the spilled boundary round-trips exactly
    restore_dataset(spark, path, 2)
    assert fetch_path(spark, path).count() == 2030
    assert metadata.read_sidecar(spark, path).manifest_files() == files


def test_missing_file_manifest_raises_loudly(spark, li, tmp_path):
    """The file list IS the acknowledgment record: a vanished manifest
    must fail the read, never silently read as empty (fetch would return
    nothing; vacuum would orphan every live file)."""
    import glob

    path = str(tmp_path / "ds")
    publish_path(spark, path, li.limit(1000), [], max_records_per_file=20)
    metadata._ADDED_MANIFEST_CACHE.clear()
    for m in glob.glob(os.path.join(path, metadata.MANIFESTS_DIR, "*")):
        os.remove(m)
    with pytest.raises(Exception):
        metadata.read_sidecar(spark, path)


def test_vacuum_collects_unreferenced_manifests(spark, li, tmp_path):
    """restore/discard drop manifest POINTERS; the immutable files linger
    until vacuum sweeps them (r10 metadata-plane GC). Referenced manifests
    survive; the dataset reads identically after the sweep."""
    import glob

    from s3parq_spark.publish import vacuum_dataset

    path = str(tmp_path / "ds")
    publish_path(
        spark, path, li.limit(1000), [], max_records_per_file=20,
        zone_map_columns=["l_orderkey"], file_bloom_columns=["l_partkey"],
    )
    publish_path(
        spark, path, li.limit(500), [], mode="append",
        max_records_per_file=20,
    )
    restore_dataset(spark, path, 1)
    n_stats = len(glob.glob(os.path.join(path, metadata.STATS_DIR, "*")))
    n_lists = len(glob.glob(os.path.join(path, metadata.MANIFESTS_DIR, "*")))
    assert n_stats == 2 and n_lists == 2  # v2's files linger after restore
    orphans = vacuum_dataset(spark, path, retention_hours=0)
    assert any(f.startswith(metadata.STATS_DIR) for f in orphans)
    assert any(f.startswith(metadata.MANIFESTS_DIR) for f in orphans)
    assert len(glob.glob(os.path.join(path, metadata.STATS_DIR, "*"))) == 1
    assert len(glob.glob(os.path.join(path, metadata.MANIFESTS_DIR, "*"))) == 1
    # the kept manifests still serve reads and prunes exactly
    metadata._ADDED_MANIFEST_CACHE.clear()
    metadata._STATS_MANIFEST_CACHE.clear()
    assert fetch_path(spark, path).count() == 1000
    assert dataset_rowcount(spark, path) == 1000
    # within the retention window nothing is touched (in-flight publish)
    publish_path(
        spark, path, li.limit(100), [], mode="append",
        max_records_per_file=20,
    )
    restore_dataset(spark, path, 1)
    assert vacuum_dataset(spark, path, retention_hours=24) == []


def test_expire_squash_respills_merged_lists(spark, li, tmp_path):
    """Micro-append histories consolidate through expire_snapshots: the
    squashed base's MERGED list crosses the spill threshold and lands in
    one manifest — the documented consolidation path for small commits."""
    from s3parq_spark.publish import expire_snapshots

    path = str(tmp_path / "ds")
    publish_path(spark, path, li.limit(50), [], max_records_per_file=10)
    for _ in range(4):
        publish_path(
            spark, path, li.limit(50), [], mode="append",
            max_records_per_file=10,
        )
    raw = json.loads(open(os.path.join(path, fs.SIDECAR_NAME)).read())
    assert all("added" in s for s in raw["snapshots"])  # small: inline
    expire_snapshots(spark, path, keep_last=1)
    raw = json.loads(open(os.path.join(path, fs.SIDECAR_NAME)).read())
    base = raw["snapshots"][0]
    assert "manifest" in base and "added" not in base
    assert base["manifest"]["n"] >= 20
    metadata._ADDED_MANIFEST_CACHE.clear()
    assert fetch_path(spark, path).count() == 250


def test_corrupt_stats_manifest_degrades_to_keep_all(spark, li, tmp_path):
    """r10 review: a truncated/bit-rotted stats manifest must cost only
    the skipping (conservative keep), never crash the fetch — pyarrow's
    ArrowInvalid is a ValueError, not an OSError."""
    import glob

    path = str(tmp_path / "ds")
    publish_path(
        spark, path, li.limit(500), [], max_records_per_file=100,
        zone_map_columns=["l_orderkey"], file_bloom_columns=["l_partkey"],
    )
    key = int(li.select(F.max("l_orderkey")).first()[0])
    flt = [{"partition": "l_orderkey", "comparison": "==", "values": [key]}]
    exp = li.limit(500).filter(F.col("l_orderkey") == key).count()
    assert fetch_path(spark, path, filters=flt).count() == exp
    mf = glob.glob(os.path.join(path, metadata.STATS_DIR, "*"))[0]
    data = open(mf, "rb").read()
    open(mf, "wb").write(data[: len(data) // 2])  # truncate mid-file
    metadata._STATS_MANIFEST_CACHE.clear()
    got = fetch_path(spark, path, filters=flt)
    assert got.count() == exp  # no skip, exact rows, no crash
    with pytest.raises(ValueError, match="no recorded row count"):
        dataset_rowcount(spark, path)  # honesty error, not a wrong count


def test_stats_pointer_gc_survives_history_reset(spark, li, tmp_path):
    """r10 review: version stamps restart after a destructive rewrite, so
    restore must GC stats pointers by FILE identity — a stamp comparison
    would drop manifests still describing live (bootstrap-era) files."""
    from s3parq_spark.publish import overwrite_partitions

    path = str(tmp_path / "ds")
    li200 = li.limit(200).withColumn(
        "flag", (F.col("l_orderkey") % 2 == 0).cast("string")
    )
    # several zone-declared commits push the pointer stamps up
    publish_path(
        spark, path, li200, ["flag"], max_records_per_file=50,
        zone_map_columns=["l_orderkey"],
    )
    for _ in range(3):
        publish_path(
            spark, path, li200.limit(40), ["flag"], mode="append",
            max_records_per_file=20,
        )
    # destructive partition rewrite clears history; zone_maps (and the
    # old-era pointers, stamped up to v4) carry forward
    overwrite_partitions(
        spark, path, li200.filter("flag = 'true'"), ["flag"],
    )
    # new era: v1 bootstraps from surviving files, v2 appends
    publish_path(
        spark, path, li200.limit(10), ["flag"], mode="append",
        max_records_per_file=5,
    )
    publish_path(
        spark, path, li200.limit(10), ["flag"], mode="append",
        max_records_per_file=5,
    )
    restore_dataset(spark, path, 2)  # roll off the new-era v3
    meta = metadata.read_sidecar(spark, path)
    # old-era pointers (stamps > 2) must SURVIVE: their files are live
    stats = meta.file_stats()
    untouched = [
        f for f in meta.manifest_files() if f.startswith("flag=false/")
    ]
    assert untouched and all(f in stats for f in untouched)
    assert fetch_path(spark, path).count() > 0


def test_partition_summary_skips_whole_manifests(spark, li, tmp_path):
    """r10 second wave: pointers record the hive dirs their publish
    touched (Iceberg manifest partition summaries); a partition-pruned
    point fetch loads ONLY the intersecting manifests — the second level
    of metadata pruning, O(touched publishes) not O(all publishes)."""
    path = str(tmp_path / "ds")
    li2 = li.limit(600).withColumn(
        "flag", (F.col("l_orderkey") % 3).cast("string")
    )
    # three publishes, each touching ONE partition -> three summarized
    # pointers with disjoint dirs
    publish_path(
        spark, path, li2.filter("flag = '0'"), ["flag"],
        max_records_per_file=50, zone_map_columns=["l_orderkey"],
        file_bloom_columns=["l_partkey"],
    )
    for v in ("1", "2"):
        publish_path(
            spark, path, li2.filter(f"flag = '{v}'"), ["flag"],
            mode="append", max_records_per_file=50,
        )
    meta = metadata.read_sidecar(spark, path)
    ptrs = meta.stats_manifests()
    assert [p["dirs"] for p in ptrs] == [
        ["flag=0"], ["flag=1"], ["flag=2"]
    ]
    key = int(
        li2.filter("flag = '2'").select(F.max("l_partkey")).first()[0]
    )
    calls = []
    orig = metadata._read_stats_manifest

    def spy(spark_, path_, rel, strict=False):
        calls.append(rel)
        return orig(spark_, path_, rel, strict)

    metadata._read_stats_manifest = spy
    try:
        got = fetch_path(spark, path, filters=[
            {"partition": "flag", "comparison": "==", "values": ["2"]},
            {"partition": "l_partkey", "comparison": "==", "values": [key]},
        ])
        exp = li2.filter(
            (F.col("flag") == "2") & (F.col("l_partkey") == key)
        ).count()
        assert got.count() == exp and exp > 0
        # only flag=2's manifest was read (twice: zone + bloom prune,
        # second hit served by the process cache — still one distinct)
        assert set(calls) == {ptrs[2]["path"]}
    finally:
        metadata._read_stats_manifest = orig
    # the FULL load (counts) still covers everything
    assert dataset_rowcount(spark, path) == 600


def test_transient_oserror_does_not_poison_negative_cache(
    spark, li, tmp_path, monkeypatch
):
    """r10 third review: only PERMANENT failures (corrupt bytes) are
    negatively cached; an OSError may be transient and must retry — a
    poisoned cache would silently disable pruning and make metadata
    counts raise for the whole process lifetime."""
    path = str(tmp_path / "ds")
    publish_path(
        spark, path, li.limit(300), [], max_records_per_file=100,
        zone_map_columns=["l_orderkey"],
    )
    meta = metadata.read_sidecar(spark, path)
    rel = meta.stats_manifests()[0]["path"]
    metadata._STATS_MANIFEST_CACHE.clear()
    metadata._STATS_MANIFEST_FAILED.clear()
    flaky = {"fail": True}
    orig = metadata._read_parquet_file

    def flaky_read(spark_, full):
        if flaky["fail"] and full.endswith(rel):
            raise OSError("transient blip")
        return orig(spark_, full)

    monkeypatch.setattr(metadata, "_read_parquet_file", flaky_read)
    m1 = metadata.read_sidecar(spark, path)
    assert m1.file_stats() == {}  # failed read: conservative empty
    assert not metadata._STATS_MANIFEST_FAILED  # OSError NOT poisoned
    flaky["fail"] = False
    m2 = metadata.read_sidecar(spark, path)
    stats = m2.file_stats()  # retried and succeeded
    assert set(stats) == set(m2.manifest_files())
    assert dataset_rowcount(spark, path) == 300
