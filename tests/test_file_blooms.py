"""Per-file bloom fingerprints (publish file_bloom_columns + fetch
equality skipping): hash parity, declaration rules, lifecycle
carry-through, and the superset-safety property."""

import random

import pytest
from pyspark.sql import functions as F

from s3parq_spark import bloom, metadata
from s3parq_spark.fetch import _prune_bloom_files, fetch_path
from s3parq_spark.publish import (
    compact_dataset,
    drop_column,
    publish_path,
    rename_column,
    repartition_dataset,
)


@pytest.fixture()
def li(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return df.select(
        "l_orderkey", "l_partkey", "l_quantity", "l_linestatus",
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("line_key"),
    )


@pytest.fixture()
def bloomed(spark, li, tmp_dataset_dir):
    """Ingest-ordered (NOT sorted by key) lineitem in many small files with
    blooms on the scattered integer key and a string column."""
    publish_path(
        spark, tmp_dataset_dir, li, ["l_linestatus"],
        max_records_per_file=400,
        file_bloom_columns=["l_orderkey", "line_key"],
    )
    return tmp_dataset_dir


def test_jvm_and_driver_hashes_agree(spark):
    """The collection expressions and the probe hashing must stay
    bit-identical — the whole plane rests on this equality."""
    vals = [
        "", "abc", "Ünïcode ✓ ascii-astral 😀", " spaces ", "0", "-17",
        "a" * 500,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    for m in (64, 8192, 1 << 20):
        rows = df.select(
            "v",
            *[
                F.expr(e).alias(f"p{i}")
                for i, e in enumerate(bloom.spark_position_exprs("v", m))
            ],
        ).collect()
        for r in rows:
            assert [r[f"p{i}"] for i in range(bloom.K_HASHES)] == \
                bloom.positions(r["v"], m)
    dfi = spark.createDataFrame(
        [(x,) for x in (0, 1, -1, 123456789012, -987654321)], "k bigint"
    )
    rows = dfi.select(
        "k",
        *[
            F.expr(e).alias(f"p{i}")
            for i, e in enumerate(bloom.spark_position_exprs("k", 4096))
        ],
    ).collect()
    for r in rows:
        assert [r[f"p{i}"] for i in range(bloom.K_HASHES)] == \
            bloom.positions(str(r["k"]), 4096)


def test_declaration_rules(spark, li, tmp_dataset_dir):
    with pytest.raises(ValueError, match="partition columns"):
        publish_path(spark, tmp_dataset_dir, li, ["l_linestatus"],
                     file_bloom_columns=["l_linestatus"])
    with pytest.raises(ValueError, match="not in dataframe"):
        publish_path(spark, tmp_dataset_dir, li, [],
                     file_bloom_columns=["nope"])
    with pytest.raises(ValueError, match="string/integer"):
        publish_path(spark, tmp_dataset_dir, li, [],
                     file_bloom_columns=["l_quantity"])  # decimal/double
    with pytest.raises(ValueError, match="file_bloom_bits"):
        publish_path(spark, tmp_dataset_dir, li, [],
                     file_bloom_columns=["l_orderkey"], file_bloom_bits=7)


def test_skips_files_and_stays_exact(spark, bloomed, li):
    meta = metadata.read_sidecar(spark, bloomed)
    assert meta.file_bloom_columns() == ["l_orderkey", "line_key"]
    files = meta.manifest_files()
    assert len(files) >= 6
    keys = [r[0] for r in li.select("l_orderkey").distinct().limit(8).collect()]
    for k in keys:
        flt = [{"partition": "l_orderkey", "comparison": "==", "values": [int(k)]}]
        kept = _prune_bloom_files(files, meta, flt)
        assert len(kept) < len(files), "bloom skipped nothing on a point probe"
        got = fetch_path(spark, bloomed, filters=flt)
        exp = li.filter(F.col("l_orderkey") == int(k))
        assert got.count() == exp.count() > 0
    # absent key: provably-empty fetch with the dataset schema
    flt = [{"partition": "l_orderkey", "comparison": "==", "values": [10**9]}]
    assert _prune_bloom_files(files, meta, flt) == []
    empty = fetch_path(spark, bloomed, filters=flt)
    assert empty.count() == 0
    assert set(empty.columns) == set(li.columns)
    # string-column probe
    c = li.select("line_key").first()[0]
    flt = [{"partition": "line_key", "comparison": "==", "values": [c]}]
    assert len(_prune_bloom_files(files, meta, flt)) < len(files)
    assert fetch_path(spark, bloomed, filters=flt).count() == \
        li.filter(F.col("line_key") == c).count()


def test_superset_property_random_probes(spark, bloomed, li):
    """Pruned fetch == unpruned row filter for every probe shape: present
    keys, absent keys, None (matches nothing here; bloom must not prune),
    type-incompatible values, IN lists, and non-equality comparisons
    (bloom must not prune those at all)."""
    meta = metadata.read_sidecar(spark, bloomed)
    files = meta.manifest_files()
    rng = random.Random(9)
    present = [r[0] for r in li.select("l_orderkey").distinct().limit(50).collect()]
    probes = (
        [[int(rng.choice(present))] for _ in range(5)]
        + [[rng.randrange(10**9, 10**10)] for _ in range(3)]
        + [[int(rng.choice(present)), rng.randrange(10**9, 10**10)]]
        + [[None], [None, int(present[0])]]
    )
    for vals in probes:
        flt = [{"partition": "l_orderkey", "comparison": "==", "values": vals}]
        got = fetch_path(spark, bloomed, filters=flt).count()
        ok = [v for v in vals if isinstance(v, int)]
        cond = F.col("l_orderkey").isin(ok) if ok else F.lit(False)
        if None in vals:
            cond = cond | F.col("l_orderkey").isNull()
        assert got == li.filter(cond).count(), (vals, got)
    # an unparseable value raises at the predicate layer (same contract as
    # partition/zone filters), never a silent wrong prune
    with pytest.raises(ValueError):
        fetch_path(spark, bloomed, filters=[
            {"partition": "l_orderkey", "comparison": "==",
             "values": ["notanint"]},
        ]).count()
    for cmp_, v in ((">", 3000), ("<", 100), ("!=", int(present[0]))):
        flt = [{"partition": "l_orderkey", "comparison": cmp_, "values": [v]}]
        kept = _prune_bloom_files(files, meta, flt)
        assert kept == files  # membership fingerprints never prune ordering
        got = fetch_path(spark, bloomed, filters=flt).count()
        exp = li.filter(
            F.expr(f"l_orderkey {'<>' if cmp_ == '!=' else cmp_} {v}")
        ).count()
        assert got == exp


def test_numeric_tower_probes_never_wrong_skip(spark, li, tmp_dataset_dir):
    """7.0 and Decimal('7.0') DO equal bigint 7 row-level (Python's
    numeric tower, the reference's comparison semantics), but collection
    hashed Spark's cast-to-string '7' — probing '7.0' would prune every
    file holding the key. Integral numerics must canonicalize to the int
    form; non-integral/NaN numerics equal no integer and may prune
    everything."""
    import decimal

    publish_path(spark, tmp_dataset_dir, li, [], max_records_per_file=400,
                 file_bloom_columns=["l_orderkey"])
    key = int(li.select("l_orderkey").first()[0])
    exp = li.filter(F.col("l_orderkey") == key).count()
    assert exp > 0
    for probe in (float(key), decimal.Decimal(f"{key}.0"), True if key == 1
                  else key):
        flt = [{"partition": "l_orderkey", "comparison": "==",
                "values": [probe]}]
        got = fetch_path(spark, tmp_dataset_dir, filters=flt).count()
        assert got == exp, (probe, got, exp)
    # non-integral numerics match no integer row; NaN likewise
    for probe in (key + 0.5, float("nan")):
        flt = [{"partition": "l_orderkey", "comparison": "==",
                "values": [probe]}]
        assert fetch_path(spark, tmp_dataset_dir, filters=flt).count() == 0


def test_append_inherits_and_mismatch_rejected(spark, li, tmp_dataset_dir):
    publish_path(spark, tmp_dataset_dir, li.limit(300), [],
                 file_bloom_columns=["l_orderkey"], file_bloom_bits=4096)
    publish_path(spark, tmp_dataset_dir, li.limit(200), [])  # inherits
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert meta.file_bloom_columns() == ["l_orderkey"]
    assert meta.zone_maps["bloom_bits"] == 4096
    ent = list(meta.file_stats().values())
    assert all(e["bloom"]["l_orderkey"][0] == 4096 for e in ent)
    with pytest.raises(ValueError, match="file-bloom mismatch"):
        publish_path(spark, tmp_dataset_dir, li.limit(10), [],
                     file_bloom_columns=["line_key"])
    # pre-declaration files never skip: re-publish without blooms is a
    # different dataset story; here add an appended dataset that declared
    # blooms only later
    d2 = tmp_dataset_dir + "_late"
    publish_path(spark, d2, li.limit(300), [])
    publish_path(spark, d2, li.limit(200), [], file_bloom_columns=["l_orderkey"])
    m2 = metadata.read_sidecar(spark, d2)
    flt = [{"partition": "l_orderkey", "comparison": "==", "values": [10**9]}]
    kept = _prune_bloom_files(m2.manifest_files(), m2, flt)
    # the late-declared files prune; the early ones are kept conservatively
    assert kept and len(kept) < len(m2.manifest_files())
    assert fetch_path(spark, d2, filters=flt).count() == 0


def test_evolve_append_trims_promoted_bloom_column(spark, li, tmp_dataset_dir):
    publish_path(spark, tmp_dataset_dir, li.limit(200), ["l_linestatus"],
                 file_bloom_columns=["l_orderkey", "l_partkey"])
    publish_path(
        spark, tmp_dataset_dir, li.limit(100).filter("l_partkey is not null"),
        ["l_partkey"], mode="append", evolve_partitions=True,
    )
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert meta.file_bloom_columns() == ["l_orderkey"]
    key = li.select("l_orderkey").first()[0]
    flt = [{"partition": "l_orderkey", "comparison": "==", "values": [int(key)]}]
    got = fetch_path(spark, tmp_dataset_dir, filters=flt).count()
    exp = (
        li.limit(200).filter(F.col("l_orderkey") == int(key)).count()
        + li.limit(100).filter("l_partkey is not null")
            .filter(F.col("l_orderkey") == int(key)).count()
    )
    assert got == exp


def test_rename_drop_and_compact_carry_through(spark, li, tmp_dataset_dir):
    publish_path(spark, tmp_dataset_dir, li, [],
                 max_records_per_file=500,
                 file_bloom_columns=["l_orderkey", "line_key"])
    rename_column(spark, tmp_dataset_dir, "l_orderkey", "order_id")
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert meta.file_bloom_columns() == ["order_id", "line_key"]
    assert all(
        "order_id" in e["bloom"] and "l_orderkey" not in e["bloom"]
        for e in meta.file_stats().values()
    )
    key = int(li.select("l_orderkey").first()[0])
    flt = [{"partition": "order_id", "comparison": "==", "values": [key]}]
    assert fetch_path(spark, tmp_dataset_dir, filters=flt).count() == \
        li.filter(F.col("l_orderkey") == key).count()
    # compaction re-collects fingerprints for the rewritten files
    compact_dataset(spark, tmp_dataset_dir, max_records_per_file=2000)
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert meta.file_bloom_columns() == ["order_id", "line_key"]
    assert all("bloom" in e for e in meta.file_stats().values())
    assert fetch_path(spark, tmp_dataset_dir, filters=flt).count() == \
        li.filter(F.col("l_orderkey") == key).count()
    drop_column(spark, tmp_dataset_dir, "line_key")
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert meta.file_bloom_columns() == ["order_id"]
    # manifest entries may retain the dead key (manifests are immutable;
    # only DECLARED columns are ever consulted) — the tombstone blocks the
    # name from returning, so the stale key is unreachable forever
    assert meta.column_renames["__dropped_line_key"] == ["line_key"]
    assert "line_key" not in fetch_path(spark, tmp_dataset_dir).columns
    assert fetch_path(spark, tmp_dataset_dir, filters=flt).count() == \
        li.filter(F.col("l_orderkey") == key).count()


def test_repartition_trims_promoted_column(spark, li, tmp_dataset_dir):
    publish_path(spark, tmp_dataset_dir, li.limit(400), [],
                 file_bloom_columns=["l_orderkey", "l_partkey"])
    repartition_dataset(spark, tmp_dataset_dir, ["l_partkey"])
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    assert meta.file_bloom_columns() == ["l_orderkey"]
    assert fetch_path(spark, tmp_dataset_dir).count() == 400


def test_composes_with_zone_maps_on_same_column(spark, li, tmp_dataset_dir):
    """A column may carry BOTH min/max stats and a fingerprint: ranges
    prune via bounds, point probes via both (bounds first, bloom after)."""
    publish_path(
        spark, tmp_dataset_dir,
        li.repartitionByRange(4, "l_orderkey").sortWithinPartitions("l_orderkey"),
        [], max_records_per_file=400, rebalance=False,
        zone_map_columns=["l_orderkey"], file_bloom_columns=["l_orderkey"],
    )
    meta = metadata.read_sidecar(spark, tmp_dataset_dir)
    files = meta.manifest_files()
    key = int(li.select(F.max("l_orderkey")).first()[0])
    flt = [{"partition": "l_orderkey", "comparison": "==", "values": [key]}]
    from s3parq_spark.fetch import _prune_zone_files

    zoned = _prune_zone_files(files, meta, flt)
    both = _prune_bloom_files(zoned, meta, flt)
    assert len(zoned) < len(files)  # sorted layout: bounds bite
    assert len(both) <= len(zoned)
    assert fetch_path(spark, tmp_dataset_dir, filters=flt).count() == \
        li.filter(F.col("l_orderkey") == key).count()
    # range probe: bounds prune, bloom abstains, result exact
    flt = [{"partition": "l_orderkey", "comparison": "<", "values": [500]}]
    assert fetch_path(spark, tmp_dataset_dir, filters=flt).count() == \
        li.filter("l_orderkey < 500").count()


def test_bloom_lifecycle_random_sequences(spark, tmp_path):
    """Interaction property: random lifecycle sequences (append / compact /
    rename / restore) on a fingerprinted dataset keep every point-probe
    fetch equal to a driver-side model — the cross-feature failure mode
    example tests miss. Each op re-checks three probes: a key present from
    the start, a key added mid-sequence, and an absent key."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from s3parq_spark.fetch import fetch_path as _fp
    from s3parq_spark.publish import (
        compact_dataset, publish_path, rename_column, restore_dataset,
    )

    counter = [0]

    @settings(
        max_examples=5, deadline=None, derandomize=True,
        suppress_health_check=[HealthCheck.too_slow,
                               HealthCheck.function_scoped_fixture],
    )
    @given(ops=st.lists(
        st.sampled_from(["append", "compact", "rename", "restore"]),
        min_size=2, max_size=5,
    ))
    def run(ops):
        counter[0] += 1
        path = str(tmp_path / f"ds_{counter[0]}")
        key_col = "k"
        rows = [(i, i % 7) for i in range(40)]  # keys 0..6 present
        df = spark.createDataFrame(rows, "id long, k long")
        publish_path(spark, path, df, [], max_records_per_file=8,
                     file_bloom_columns=["k"], file_bloom_bits=512)
        model = {v for _, v in rows}
        versions = [dict(rows)]  # model per version: id -> k
        live = dict(rows)
        next_id = 40
        for op in ops:
            if op == "append":
                new = [(next_id + j, 100 + counter[0]) for j in range(5)]
                next_id += 5
                publish_path(
                    spark, path,
                    # appends carry the CURRENT logical schema (a renamed
                    # key appends under its new name; the old physical
                    # name is a tombstone)
                    spark.createDataFrame(new, f"id long, {key_col} long"),
                    [],
                    max_records_per_file=8,
                )
                live.update(dict(new))
                versions.append(dict(live))
            elif op == "compact":
                compact_dataset(spark, path, max_records_per_file=16)
                versions = [dict(live)]
            elif op == "rename":
                new_name = f"{key_col}x"
                rename_column(spark, path, key_col, new_name)
                key_col = new_name
            elif op == "restore":
                if len(versions) > 1:
                    restore_dataset(spark, path, version=1)
                    live = dict(versions[0])
                    versions = [dict(live)]
            for probe in (3, 100 + counter[0], 10**9):
                flt = [{"partition": key_col, "comparison": "==",
                        "values": [probe]}]
                got = sorted(
                    r["id"] for r in _fp(spark, path, filters=flt).collect()
                )
                exp = sorted(i for i, k in live.items() if k == probe)
                assert got == exp, (ops, op, probe, got, exp)

    run()
