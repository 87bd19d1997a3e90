"""Continuous aggregates (views.py): incremental refresh from the CDC
plane, exact folding, and the full-recompute fallbacks."""

import pytest
from pyspark.sql import functions as F

from s3parq_spark import metadata
from s3parq_spark.fetch import fetch_path
from s3parq_spark.publish import (
    delete_where,
    expire_snapshots,
    publish_path,
    restore_dataset,
)
from s3parq_spark.views import create_aggregate, refresh_aggregate


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


AGGS = {
    "n": "count(*)",
    "rev": "sum(cast(o_totalprice as decimal(18,2)))",
    "first_key": "min(o_orderkey)",
    "last_key": "max(o_orderkey)",
}


def _expected(orders_slice):
    return {
        r["o_orderstatus"]: (
            r["n"], str(r["rev"]), r["first_key"], r["last_key"]
        )
        for r in orders_slice.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        ).collect()
    }


def _got(spark, dst):
    return {
        r["o_orderstatus"]: (
            r["n"], str(r["rev"]), r["first_key"], r["last_key"]
        )
        for r in fetch_path(spark, dst).collect()
    }


def test_incremental_refresh_is_exact(spark, orders, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    publish_path(spark, src, orders.filter("o_orderkey % 4 = 0"),
                 ["o_orderstatus"])
    d = create_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
    assert d["last_src_version"] == 1
    assert _got(spark, dst) == _expected(orders.filter("o_orderkey % 4 = 0"))
    assert refresh_aggregate(spark, dst)["mode"] == "noop"
    # two more appends, one refresh spanning both versions
    publish_path(spark, src, orders.filter("o_orderkey % 4 = 1"),
                 ["o_orderstatus"])
    publish_path(spark, src, orders.filter("o_orderkey % 4 = 2"),
                 ["o_orderstatus"])
    r = refresh_aggregate(spark, dst)
    assert r == {"from_version": 1, "to_version": 3, "mode": "incremental"}
    assert _got(spark, dst) == _expected(orders.filter("o_orderkey % 4 < 3"))


def test_tombstone_in_range_falls_back_to_full(spark, orders, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    publish_path(spark, src, orders.limit(500), ["o_orderstatus"])
    create_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
    delete_where(spark, src, "o_totalprice > 100000", mode="merge-on-read")
    r = refresh_aggregate(spark, dst)
    assert r["mode"] == "full"
    assert _got(spark, dst) == _expected(fetch_path(spark, src))


def test_expired_baseline_falls_back_to_full(spark, orders, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    publish_path(spark, src, orders.limit(100), ["o_orderstatus"])
    create_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
    for i in range(4):
        publish_path(spark, src, orders.limit(50 + i), ["o_orderstatus"])
    expire_snapshots(spark, src, keep_last=2)  # v1 (the baseline) squashed
    r = refresh_aggregate(spark, dst)
    # v1 survives only as part of a squashed base -> full recompute
    assert r["mode"] == "full"
    assert _got(spark, dst) == _expected(fetch_path(spark, src))


def test_restore_below_baseline_falls_back(spark, orders, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    publish_path(spark, src, orders.limit(100), ["o_orderstatus"])
    publish_path(spark, src, orders.limit(60), ["o_orderstatus"])
    create_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)  # last=2
    restore_dataset(spark, src, version=1)
    r = refresh_aggregate(spark, dst)
    assert r["mode"] == "full"
    assert _got(spark, dst) == _expected(fetch_path(spark, src))


def test_validation_and_definition_hygiene(spark, orders, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    publish_path(spark, src, orders.limit(50), ["o_orderstatus"])
    with pytest.raises(ValueError, match="not decomposable"):
        create_aggregate(spark, src, dst, ["o_orderstatus"],
                         {"a": "avg(o_totalprice)"})
    with pytest.raises(ValueError, match="collides"):
        create_aggregate(spark, src, dst, ["o_orderstatus"],
                         {"o_orderstatus": "count(*)"})
    with pytest.raises(ValueError, match="at least one column"):
        create_aggregate(spark, src, dst, [], {"n": "count(*)"})
    with pytest.raises(ValueError, match="not a continuous aggregate"):
        refresh_aggregate(spark, src)
    create_aggregate(spark, src, dst, ["o_orderstatus"], {"n": "count(*)"})
    # a plain overwrite-publish onto dst invalidates the definition
    publish_path(spark, dst, orders.limit(3), [], mode="overwrite")
    assert metadata.read_sidecar(spark, dst).aggregate is None
    with pytest.raises(ValueError, match="not a continuous aggregate"):
        refresh_aggregate(spark, dst)


def test_streaming_ingest_composes_with_refresh(spark, sf_dir, tmp_path):
    """The refresh contract is version-based, so WHO wrote the versions is
    irrelevant: micro-batch streaming appends (stream_publish) advance the
    head, and refresh_aggregate folds exactly the unseen versions."""
    from s3parq_spark.streaming.events import stream_publish

    src = str(tmp_path / "stream_src")
    dst = str(tmp_path / "agg")
    stream_publish(spark, f"{sf_dir}/events.parquet", src, ["event_type"])
    create_aggregate(
        spark, src, dst, ["event_type"],
        {"n": "count(*)", "max_user": "max(user_id)"},
    )
    # second micro-batch wave: new source files picked up from the
    # checkpoint, appended as new versions
    ev = fetch_path(spark, src)
    n_before = ev.count()
    publish_path(spark, src, ev.limit(123), ["event_type"])
    r = refresh_aggregate(spark, dst)
    assert r["mode"] == "incremental"
    got = {r["event_type"]: r["n"] for r in fetch_path(spark, dst).collect()}
    exp = {
        r["event_type"]: r["n"]
        for r in fetch_path(spark, src).groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert got == exp
    assert sum(got.values()) == n_before + 123


def test_refresh_equivalence_over_random_sequences(spark, orders, tmp_path):
    """Property: any sequence of appends and refreshes leaves the
    aggregate equal to the one-shot GROUP BY over the source — whatever
    mix of noop/incremental refreshes the schedule produced. Deterministic
    pseudo-random schedule (seeded), 3 rounds."""
    import random

    rng = random.Random(8)
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    slices = [orders.filter(f"o_orderkey % 7 = {i}") for i in range(7)]
    publish_path(spark, src, slices[0], ["o_orderstatus"])
    create_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
    used = [0]
    modes = []
    for _ in range(3):
        for _ in range(rng.randint(1, 2)):
            i = rng.choice([j for j in range(7) if j not in used])
            used.append(i)
            publish_path(spark, src, slices[i], ["o_orderstatus"])
        modes.append(refresh_aggregate(spark, dst)["mode"])
        pred = " or ".join(f"o_orderkey % 7 = {j}" for j in used)
        assert _got(spark, dst) == _expected(orders.filter(pred)), modes
    assert "incremental" in modes  # the schedule exercised the real path


def test_restore_reappend_lookalike_baseline_forces_full(
    spark, orders, tmp_path
):
    """restore_dataset + subsequent appends REUSE version numbers, so the
    refresh baseline is pinned by (version, commit ts), not the version
    number alone. Before the r9 fix, restoring below the recorded baseline
    and appending back TO it hit the head==last noop, and appending PAST
    it passed the `last in src_versions` check — both silently kept
    rolled-back contributions."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    publish_path(spark, src, orders.limit(100), ["o_orderstatus"])
    publish_path(spark, src, orders.limit(60), ["o_orderstatus"])
    create_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)  # last=2
    # leg 1: restore below the baseline, append back to EXACTLY version 2
    # with different data -> lookalike head, must be full (not noop)
    restore_dataset(spark, src, version=1)
    publish_path(spark, src, orders.limit(40), ["o_orderstatus"])
    r = refresh_aggregate(spark, dst)
    assert r["mode"] == "full"
    assert _got(spark, dst) == _expected(fetch_path(spark, src))
    # leg 2 (baseline now re-stamped at the reused v2): restore below it
    # again and append PAST it -> head > last, version number present in
    # history, but the snapshot at last is a different commit -> full
    restore_dataset(spark, src, version=1)
    publish_path(spark, src, orders.limit(30), ["o_orderstatus"])
    publish_path(spark, src, orders.limit(20), ["o_orderstatus"])
    r = refresh_aggregate(spark, dst)
    assert r["mode"] == "full"
    assert _got(spark, dst) == _expected(fetch_path(spark, src))
    # an untouched head refreshes as a true noop afterwards
    assert refresh_aggregate(spark, dst)["mode"] == "noop"


def test_compaction_preserves_the_aggregate_definition(
    spark, orders, tmp_path
):
    """compact_dataset on a continuous aggregate must carry the recorded
    definition through its rewrite: refresh appends per-refresh deltas —
    exactly the small-file debt compaction clears — and the pre-fix
    rewrite dropped ``aggregate`` from the rebuilt sidecar, turning the
    next refresh_aggregate into a loud 'not a continuous aggregate'
    failure on its own dataset."""
    from s3parq_spark.publish import compact_dataset

    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    publish_path(spark, src, orders.filter("o_orderkey % 4 = 0"),
                 ["o_orderstatus"])
    create_aggregate(spark, src, dst, ["o_orderstatus"], AGGS)
    publish_path(spark, src, orders.filter("o_orderkey % 4 = 1"),
                 ["o_orderstatus"])
    assert refresh_aggregate(spark, dst)["mode"] == "incremental"

    compact_dataset(spark, dst)
    d = metadata.read_sidecar(spark, dst).aggregate
    assert d and d["src"] == src and d["last_src_version"] == 2
    assert _got(spark, dst) == _expected(orders.filter("o_orderkey % 4 < 2"))

    # the definition still drives refresh: noop at head, incremental past
    assert refresh_aggregate(spark, dst)["mode"] == "noop"
    publish_path(spark, src, orders.filter("o_orderkey % 4 = 2"),
                 ["o_orderstatus"])
    assert refresh_aggregate(spark, dst)["mode"] == "incremental"
    assert _got(spark, dst) == _expected(orders.filter("o_orderkey % 4 < 3"))
