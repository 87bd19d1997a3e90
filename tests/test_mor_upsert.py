"""merge_upsert(mode="merge-on-read"): equality key-deletes — one O(batch)
commit carrying new row images + a key tombstone over everything older."""

import pytest
from pyspark.sql import functions as F

from s3parq_spark import metadata
from s3parq_spark.fetch import (
    dataset_refs,
    dataset_rowcount,
    fetch_at,
    fetch_changes,
    fetch_path,
)
from s3parq_spark.publish import (
    compact_dataset,
    delete_where,
    expire_snapshots,
    merge_upsert,
    publish_path,
    rename_column,
    restore_dataset,
    vacuum_dataset,
)


def _base(spark, path, n=200, partitioned=True):
    rows = [(i, "AB"[i % 2], float(i)) for i in range(n)]
    df = spark.createDataFrame(rows, "k long, p string, v double")
    publish_path(spark, path, df, ["p"] if partitioned else [])
    return {i: (("AB"[i % 2]), float(i)) for i in range(n)}


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, p string, v double, seq int")


def _state(spark, path):
    return {
        r["k"]: (r["p"], r["v"]) for r in fetch_path(spark, path).collect()
    }


def test_upsert_semantics_and_intra_batch_seq(spark, tmp_path):
    path = str(tmp_path / "ds")
    model = _base(spark, path)
    # update k=3 twice in one batch (seq 2 wins), insert k=1000
    merge_upsert(
        spark, path,
        _batch(spark, [(3, "B", 100.0, 1), (3, "B", 200.0, 2),
                       (1000, "A", 1.0, 1)]),
        ["k"], "seq", mode="merge-on-read",
    )
    model[3] = ("B", 200.0)
    model[1000] = ("A", 1.0)
    assert _state(spark, path) == model
    # a second upsert replaces the first unconditionally (last commit
    # wins — seq compares only within a batch)
    merge_upsert(
        spark, path, _batch(spark, [(3, "A", 5.0, 1)]), ["k"], "seq",
        mode="merge-on-read",
    )
    model[3] = ("A", 5.0)
    assert _state(spark, path) == model
    # later plain appends are untouched by older key-deletes
    publish_path(
        spark, path,
        spark.createDataFrame([(3, "B", 7.0)], "k long, p string, v double"),
        ["p"], mode="append",
    )
    got = fetch_path(spark, path).filter("k = 3").collect()
    assert sorted((r["p"], r["v"]) for r in got) == [("A", 5.0), ("B", 7.0)]


def test_unpartitioned_and_key_moves_partition(spark, tmp_path):
    """MoR upsert has no touched-partition precondition: it works on
    unpartitioned datasets, and a key MAY move hive partitions (the old
    row dies by key, wherever it lives — the CoW restriction does not
    apply)."""
    path = str(tmp_path / "flat")
    model = _base(spark, path, partitioned=False)
    merge_upsert(
        spark, path, _batch(spark, [(2, "Z", 9.0, 1)]), ["k"], "seq",
        mode="merge-on-read",
    )
    model[2] = ("Z", 9.0)
    assert _state(spark, path) == model
    # partitioned: key 4 moves from p=A to p=B
    path2 = str(tmp_path / "part")
    model2 = _base(spark, path2)
    merge_upsert(
        spark, path2, _batch(spark, [(4, "B", 40.0, 1)]), ["k"], "seq",
        mode="merge-on-read",
    )
    model2[4] = ("B", 40.0)
    assert _state(spark, path2) == model2


def test_validation_rules(spark, tmp_path):
    path = str(tmp_path / "ds")
    _base(spark, path)
    with pytest.raises(ValueError, match="NULL merge keys"):
        merge_upsert(
            spark, path, _batch(spark, [(None, "A", 1.0, 1)]), ["k"],
            "seq", mode="merge-on-read",
        )
    with pytest.raises(ValueError, match="change_log requires copy-on-write"):
        merge_upsert(
            spark, path, _batch(spark, [(1, "A", 1.0, 1)]), ["k"], "seq",
            change_log=True, mode="merge-on-read",
        )
    with pytest.raises(ValueError, match="unknown merge_upsert mode"):
        merge_upsert(spark, path, _batch(spark, []), ["k"], "seq",
                     mode="nope")
    with pytest.raises(ValueError, match="not a dataset column"):
        merge_upsert(
            spark, path,
            spark.createDataFrame([(1, "A", 1.0, 1, 2)],
                                  "k long, p string, v double, seq int, x int"),
            ["x"], "seq", mode="merge-on-read",
        )
    # empty batch: no commit
    head = metadata.read_sidecar(spark, path).snapshots[-1]["version"]
    assert merge_upsert(spark, path, _batch(spark, []), ["k"], "seq",
                        mode="merge-on-read") == []
    assert metadata.read_sidecar(spark, path).snapshots[-1]["version"] == head


def test_pending_guards_and_materialization(spark, tmp_path):
    path = str(tmp_path / "ds")
    model = _base(spark, path)
    merge_upsert(
        spark, path, _batch(spark, [(7, "B", 70.0, 1)]), ["k"], "seq",
        mode="merge-on-read",
    )
    model[7] = ("B", 70.0)
    m = metadata.read_sidecar(spark, path)
    assert m.has_tombstones() and m.eq_deletes()
    refs = {(r["ref_type"], r["version"])
            for r in dataset_refs(spark, path).collect()}
    assert ("eq_delete", 2) in refs
    with pytest.raises(ValueError, match="merge-on-read"):
        dataset_rowcount(spark, path)
    with pytest.raises(ValueError, match="not append-only"):
        fetch_changes(spark, path, 1, 2)
    with pytest.raises(ValueError, match="merge-on-read"):
        rename_column(spark, path, "v", "v2")
    with pytest.raises(ValueError, match="merge-on-read"):
        merge_upsert(spark, path, _batch(spark, [(1, "A", 1.0, 1)]),
                     ["k"], "seq")  # copy-on-write refuses pending MoR
    # time travel: v1 predates the upsert
    assert {r["k"]: r["v"] for r in fetch_at(spark, path, 1).collect()}[7] == 7.0
    compact_dataset(spark, path)
    m2 = metadata.read_sidecar(spark, path)
    assert not m2.has_tombstones()
    assert _state(spark, path) == model


def test_composes_with_predicate_tombstones(spark, tmp_path):
    """A MoR DELETE and a MoR UPSERT can be pending together; era
    ordering applies each to exactly the files older than it."""
    path = str(tmp_path / "ds")
    model = _base(spark, path)
    delete_where(spark, path, "k < 10", mode="merge-on-read")
    model = {k: pv for k, pv in model.items() if k >= 10}
    merge_upsert(
        spark, path, _batch(spark, [(5, "A", 5.5, 1), (20, "B", 21.0, 1)]),
        ["k"], "seq", mode="merge-on-read",
    )
    # k=5 was deleted by the predicate; the upsert re-inserts it (its row
    # image is NEWER than the delete); k=20 is replaced
    model[5] = ("A", 5.5)
    model[20] = ("B", 21.0)
    assert _state(spark, path) == model
    compact_dataset(spark, path)
    assert _state(spark, path) == model


def test_expire_restore_vacuum_lifecycle(spark, tmp_path):
    path = str(tmp_path / "ds")
    model = _base(spark, path)
    merge_upsert(
        spark, path, _batch(spark, [(1, "B", 11.0, 1)]), ["k"], "seq",
        mode="merge-on-read",
    )
    for i in range(3):
        publish_path(
            spark, path,
            spark.createDataFrame([(2000 + i, "A", 1.0)],
                                  "k long, p string, v double"),
            ["p"], mode="append",
        )
    # expiry never squashes across the eq-delete commit
    expire_snapshots(spark, path, keep_last=1)
    m = metadata.read_sidecar(spark, path)
    assert m.eq_deletes(), "expiry must keep the eq-delete snapshot verbatim"
    model[1] = ("B", 11.0)
    model.update({2000 + i: ("A", 1.0) for i in range(3)})
    assert _state(spark, path) == model
    # vacuum acknowledges the key files (all_files covers eq_delete)
    orphans = vacuum_dataset(spark, path, dry_run=True, retention_hours=0)
    assert orphans == []
    # restore below the upsert rolls back row images AND key-delete whole
    restore_dataset(spark, path, version=1)
    got = _state(spark, path)
    assert got[1] == ("B", 1.0) and 2000 not in got  # original row is back


def test_new_files_get_zone_and_bloom_stats(spark, tmp_path):
    """The upsert's row images ride the normal append path: declared
    zone/bloom stats are collected for them."""
    path = str(tmp_path / "ds")
    rows = [(i, "AB"[i % 2], float(i)) for i in range(100)]
    publish_path(
        spark, path, spark.createDataFrame(rows, "k long, p string, v double"),
        ["p"], zone_map_columns=["v"], file_bloom_columns=["k"],
    )
    new = merge_upsert(
        spark, path, _batch(spark, [(1, "A", 500.0, 1)]), ["k"], "seq",
        mode="merge-on-read",
    )
    m = metadata.read_sidecar(spark, path)
    from s3parq_spark.publish import _rel_files

    for rel in _rel_files(path, new):
        entry = m.file_stats()[rel]
        assert "v" in entry["stats"] and "k" in entry["bloom"]


def test_review_fixes_schema_and_staged_guards(spark, tmp_path):
    """r9 review findings: (1) seq_col must not schema-evolve the dataset,
    (2) a partial batch missing payload columns raises instead of silently
    NULLing them, (3) a pending staged snapshot refuses the upsert (its
    promote would re-commit pre-upsert rows PAST the key-delete)."""
    path = str(tmp_path / "ds")
    _base(spark, path)
    merge_upsert(
        spark, path, _batch(spark, [(1, "B", 11.0, 1)]), ["k"], "seq",
        mode="merge-on-read",
    )
    m = metadata.read_sidecar(spark, path)
    assert "seq" not in m.column_types, "seq_col leaked into the schema"
    assert set(fetch_path(spark, path).columns) == {"k", "p", "v"}
    assert m.eq_deletes()[0][1]["bytes"] > 0  # sizes recorded at write
    with pytest.raises(ValueError, match="missing merge columns"):
        merge_upsert(
            spark, path,
            spark.createDataFrame([(2, "A", 1)], "k long, p string, seq int"),
            ["k"], "seq", mode="merge-on-read",
        )  # no v column: would silently NULL the payload
    compact_dataset(spark, path)
    publish_path(
        spark, path,
        spark.createDataFrame([(5000, "A", 1.0)], "k long, p string, v double"),
        ["p"], mode="append", staged=True,
    )
    with pytest.raises(ValueError, match="staged"):
        merge_upsert(
            spark, path, _batch(spark, [(5000, "B", 2.0, 1)]), ["k"],
            "seq", mode="merge-on-read",
        )


def test_eq_delete_keyfile_gc(spark, tmp_path):
    """r10 verdict #6: equality-delete key files must not accumulate
    forever. Three lifecycles: (a) compaction materializes the deletes
    and the directory swap removes `_eq_deletes/` wholesale; (b) restore
    below an upsert drops the snapshot's eq_delete entry but leaves its
    key files on disk — vacuum must sweep exactly those; (c) live key
    files are never reported. Reads unchanged throughout."""
    import os

    path = str(tmp_path / "ds")
    model = _base(spark, path, n=50)
    for i in range(4):
        merge_upsert(
            spark, path, _batch(spark, [(i, "B", 100.0 + i, 1)]),
            ["k"], "seq", mode="merge-on-read",
        )
        model[i] = ("B", 100.0 + i)
    assert _state(spark, path) == model
    kd = os.path.join(path, "_eq_deletes")
    n_live = sum(len(fs) for _, _, fs in os.walk(kd))
    assert n_live >= 4
    # (c) all key files are acknowledged while their snapshots live
    assert vacuum_dataset(spark, path, dry_run=True, retention_hours=0) == []
    # (b) restore below the last two upserts: their key files become
    # unreferenced orphans; vacuum sweeps exactly them
    m = metadata.read_sidecar(spark, path)
    dropped_keys = {
        f for v, info in m.eq_deletes() if v > m.snapshots[-3]["version"]
        for f in info["files"]
    }
    assert dropped_keys
    restore_dataset(spark, path, m.snapshots[-3]["version"])
    orphans = vacuum_dataset(spark, path, retention_hours=0)
    assert set(orphans) == dropped_keys, (orphans, dropped_keys)
    model[2] = ("AB"[2 % 2], 2.0)
    model[3] = ("AB"[3 % 2], 3.0)
    assert _state(spark, path) == model
    # nothing double-reported on a second pass
    assert vacuum_dataset(spark, path, dry_run=True, retention_hours=0) == []
    # (a) compaction: the rewrite materializes the remaining key deletes
    # and the two-rename swap leaves no _eq_deletes directory at all
    compact_dataset(spark, path)
    assert not os.path.exists(kd), os.listdir(kd)
    assert not metadata.read_sidecar(spark, path).eq_deletes()
    assert _state(spark, path) == model
