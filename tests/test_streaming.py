"""Structured Streaming tests: the streaming tumbling aggregation must equal
its batch counterpart; session windows must respect the gap."""

import datetime

from pyspark.sql import functions as F

from s3parq_spark.streaming import (
    run_streaming_tumbling_counts,
    sessionize_events,
)
from s3parq_spark.workload import _events


def test_streaming_equals_batch(spark, sf_dir):
    streamed = run_streaming_tumbling_counts(spark, f"{sf_dir}/events.parquet")
    ev = _events(spark, sf_dir)
    batch = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) > 0


def test_sessionize_gap_semantics(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        # user 1: three events within 30min gaps -> one session
        (1, base, 1.0),
        (1, base + datetime.timedelta(minutes=20), 1.0),
        (1, base + datetime.timedelta(minutes=45), 1.0),
        # then a 2h gap -> new session
        (1, base + datetime.timedelta(hours=3), 1.0),
        # user 2: single event
        (2, base, 5.0),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = sessionize_events(ev).orderBy("user_id", "session_start").collect()
    assert [(r.user_id, r.n_events) for r in got] == [(1, 3), (1, 1), (2, 1)]
    # session_end = last event + gap
    assert got[0].session_end == base + datetime.timedelta(minutes=75)


def test_stateful_sessionize_matches_batch(spark, sf_dir):
    """applyInPandasWithState sessionization must equal the native batch
    session_window result restricted to emittable sessions: closed by a later
    event, or ended before the final watermark (max ts - 2 h)."""
    from s3parq_spark.streaming import stateful_sessionize

    out = stateful_sessionize(spark, f"{sf_dir}/events.parquet", gap="30 minutes")
    ev = _events(spark, sf_dir)
    batch = sessionize_events(ev, gap="30 minutes").select(
        "session_start", "session_end", "user_id", "n_events"
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    from pyspark.sql import Window as W

    last_end = F.max("session_end").over(W.partitionBy("user_id"))
    expected = batch.withColumn("__last_end", last_end).filter(
        (F.col("session_end") < F.col("__last_end"))
        | (F.col("session_end") < F.lit(max_ts - datetime.timedelta(hours=2)))
    ).drop("__last_end")
    s = {tuple(r) for r in out.collect()}
    b = {tuple(r) for r in expected.collect()}
    assert s == b and len(s) > 0


def test_watermark_drops_late_events(spark, tmp_path):
    """Real watermark semantics: with maxFilesPerTrigger=1 the two files
    become two micro-batches. Batch 1 advances the watermark to
    max(ts) - 10 minutes; the event in batch 2 that is older than that
    watermark must be DROPPED from the windowed aggregation, while the
    in-time event must land."""
    import os
    import uuid

    from s3parq_spark.streaming.events import EVENTS_SCHEMA
    from s3parq_spark.streaming import streaming_tumbling_counts

    d = str(tmp_path / "stream_src")
    os.makedirs(d)
    US = 1_000_000

    def write_file(name, rows):
        df = spark.createDataFrame(
            [(i, ts * 1000, 1, "click", 1.0, "{}") for i, ts in rows],
            schema=EVENTS_SCHEMA,  # ts column: nanos as long
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        import glob, shutil
        src = glob.glob(str(tmp_path / name / "*.parquet"))[0]
        shutil.copy(src, os.path.join(d, name + ".parquet"))

    hour = 3600 * US
    base = 100 * hour
    # batch 1: events at t=base and t=base+3h -> watermark after batch 1
    # is (base+3h) - 10min
    write_file("b1", [(1, base), (2, base + 3 * hour)])
    # batch 2: one event 2h before the watermark (dropped), one at the front
    write_file("b2", [(3, base + hour), (4, base + 3 * hour + 60 * US)])

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_tumbling_counts(stream, window="1 hour", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.window_start, r.n_events) for r in spark.table(name).collect()}
    starts = {r[0].hour for r in got}
    assert 101 not in starts, f"late event (base+1h) should be dropped: {got}"
    total = sum(n for _, n in got)
    assert total >= 1  # the closed base-hour window emitted in append mode


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """Inner stream-stream interval join (watermarked both sides) must equal
    the identical batch interval join on the finite input."""
    from s3parq_spark.streaming import stream_stream_click_purchase_join

    streamed = stream_stream_click_purchase_join(
        spark, f"{sf_dir}/events.parquet", within="30 minutes"
    )
    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"))
    batch = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 minutes")),
    ).select(F.col("p_user").alias("user_id"), "purchase_ts", "purchase_id",
             "click_ts", "click_id")
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) > 0


def test_stream_dedup_bounded_state(spark, sf_dir):
    """Duplicated stream (2 copies, one per micro-batch) must come out as
    exactly the distinct event set."""
    from s3parq_spark.streaming import stream_dedup

    out = stream_dedup(spark, f"{sf_dir}/events.parquet", copies=2)
    ev = _events(spark, sf_dir)
    assert out.count() == ev.count()
    assert out.select("event_id").distinct().count() == ev.count()

def test_ts_unit_probe_contract(spark, tmp_path, sf_dir):
    """ADVICE round-3 fixes: the unit probe must (a) raise on an empty
    landing dir instead of silently locking in micros, (b) recurse into
    partition subdirectories, (c) reject mixed units with a clear error,
    and (d) be overridable via read_event_stream(ts_nanos=...)."""
    import os
    import shutil

    import pytest as _pytest

    from s3parq_spark.streaming.events import _ts_is_nanos, read_event_stream

    empty = str(tmp_path / "empty_landing")
    os.makedirs(empty)
    with _pytest.raises(ValueError, match="no parquet files"):
        _ts_is_nanos(empty)
    # explicit unit unblocks the empty landing dir
    sdf = read_event_stream(spark, empty, ts_nanos=False)
    assert sdf.isStreaming and dict(sdf.dtypes)["ts"] == "timestamp"

    # unit probe sees files in partition subdirectories
    nested = str(tmp_path / "nested" / "day=2024-01-01")
    os.makedirs(nested)
    src = f"{sf_dir}/events.parquet"
    real_unit = _ts_is_nanos(src)
    shutil.copy(src, os.path.join(nested, "part-0.parquet"))
    assert _ts_is_nanos(str(tmp_path / "nested")) == real_unit

    # mixed units raise: fabricate the other unit alongside the real file
    import pyarrow as pa
    import pyarrow.parquet as pq

    mixed = str(tmp_path / "mixed")
    os.makedirs(mixed)
    shutil.copy(src, os.path.join(mixed, "a.parquet"))
    other = "us" if real_unit else "ns"
    tbl = pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts": pa.array([1], pa.timestamp(other)),
        "user_id": pa.array([1], pa.int64()),
        "event_type": pa.array(["click"], pa.string()),
        "value": pa.array([1.0], pa.float64()),
        "props": pa.array(["{}"], pa.string()),
    })
    pq.write_table(tbl, os.path.join(mixed, "b.parquet"))
    with _pytest.raises(ValueError, match="mixed ts timestamp units"):
        _ts_is_nanos(mixed)


def test_stream_user_profile_gated_or_equals_batch(spark, sf_dir):
    """Spark 4 transformWithStateInPandas path: runs (and must equal the
    batch aggregate) where protobuf is available; raises the documented
    dependency error where it is not."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from s3parq_spark.streaming.events import stream_user_profile
    from s3parq_spark.workload import _events

    try:
        from google.protobuf import descriptor  # noqa: F401
        have_protobuf = True
    except ImportError:
        have_protobuf = False

    src = f"{sf_dir}/events.parquet"
    if not have_protobuf:
        with _pytest.raises(RuntimeError, match="protobuf"):
            stream_user_profile(spark, src)
        return
    out = stream_user_profile(spark, src)
    batch = _events(spark, sf_dir).groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("event_type") == "click").cast("bigint")).alias("n_clicks"),
    )
    assert out.exceptAll(batch).count() == 0
    assert batch.exceptAll(out).count() == 0


def test_stream_publish_into_hidden_partitions(spark, sf_dir, tmp_path):
    """Streaming ingestion composes with hidden partitioning: micro-batches
    land under a derived event-hour layout, appends re-derive the transform
    from the sidecar, and a fetch filtering the derived column prunes at
    the file index."""
    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.streaming.events import stream_publish

    path = str(tmp_path / "stream_hidden")
    stream_publish(
        spark, f"{sf_dir}/events.parquet", path, [],
        derived_partitions={"event_hour": "date_format(ts, 'yyyy-MM-dd-HH')"},
    )
    got = fetch_path(spark, path)
    assert "event_hour" in got.columns
    one_hour = got.select("event_hour").first()["event_hour"]
    pruned = fetch_path(
        spark, path,
        filters=[{"partition": "event_hour", "comparison": "==",
                  "values": [one_hour]}],
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_hour" in plan.split(
        "PartitionFilters", 1
    )[1][:200]
    assert 0 < pruned.count() < got.count()


def test_streaming_window_topk_equals_batch(spark, sf_dir):
    """The streamed aggregate + sink-side rank must equal the batch
    daily top-k exactly (availableNow drains everything)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from s3parq_spark.streaming import run_streaming_window_topk
    from s3parq_spark.streaming.events import read_event_stream  # noqa: F401

    got = run_streaming_window_topk(
        spark, f"{sf_dir}/events.parquet", window="1 day", k=2
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("d").orderBy(F.desc("n"), F.asc("user_id"))
    batch = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("d"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
    )
    a = sorted((r["window_start"], r["user_id"], r["n_events"], r["rk"])
               for r in got.collect())
    b = sorted((r["d"], r["user_id"], r["n"], r["rk"])
               for r in batch.collect())
    assert a == b and len(a) > 0


def test_memory_sinks_are_dropped_after_runners(spark, sf_dir):
    """The one-shot runners must not leak their memory-sink temp view:
    repeated calls in a long-lived session would otherwise accumulate
    sink state in driver memory (worst for complete-mode sinks), and the
    returned DataFrame must survive the drop (r5 ADVICE)."""
    from s3parq_spark.streaming import (
        run_streaming_tumbling_counts, run_streaming_window_topk,
    )

    before = {t.name for t in spark.catalog.listTables()}
    topk = run_streaming_window_topk(
        spark, f"{sf_dir}/events.parquet", window="1 day", k=1
    )
    counts = run_streaming_tumbling_counts(spark, f"{sf_dir}/events.parquet")
    after = {t.name for t in spark.catalog.listTables()}
    leaked = {
        t for t in after - before
        if t.startswith(("ev_", "sess_", "dedup_", "ssj_", "enr_",
                         "latest_", "prof_"))
    }
    assert not leaked
    # results remain usable after the view drop (materialized, not lazy
    # over the dropped catalog entry)
    assert topk.count() > 0 and counts.count() > 0


def test_stream_publish_collects_zone_maps(spark, sf_dir, tmp_path):
    """Streaming ingestion composes with the zone-map plane: the first
    micro-batch declares zone_map_columns, later appends inherit it, every
    committed file gets stats, and the metadata COUNT(*) equals the scan."""
    from s3parq_spark import metadata
    from s3parq_spark.fetch import dataset_rowcount, fetch_path
    from s3parq_spark.streaming.events import stream_publish

    path = str(tmp_path / "stream_zm")
    stream_publish(
        spark, f"{sf_dir}/events.parquet", path, ["event_type"],
        zone_map_columns=["user_id"],
    )
    meta = metadata.read_sidecar(spark, path)
    assert meta.zone_map_columns() == ["user_id"]
    assert set(meta.file_stats()) == set(meta.manifest_files())
    assert dataset_rowcount(spark, path) == fetch_path(spark, path).count()
    # value-column filter skips at the driver and stays exact
    got = fetch_path(
        spark, path,
        filters=[{"partition": "user_id", "comparison": "<", "values": [50]}],
    )
    assert got.count() == fetch_path(spark, path).filter("user_id < 50").count()


def test_stream_publish_collects_file_blooms(spark, sf_dir, tmp_path):
    """Streaming ingestion composes with the bloom plane exactly like the
    zone plane: the first micro-batch declares file_bloom_columns, later
    appends inherit (declaration + width), every committed file gets a
    fingerprint, and an equality probe skips at the driver and stays
    exact."""
    from s3parq_spark import metadata
    from s3parq_spark.fetch import _prune_bloom_files, fetch_path
    from s3parq_spark.streaming.events import stream_publish

    path = str(tmp_path / "stream_bf")
    stream_publish(
        spark, f"{sf_dir}/events.parquet", path, ["event_type"],
        file_bloom_columns=["user_id"], file_bloom_bits=4096,
    )
    meta = metadata.read_sidecar(spark, path)
    assert meta.file_bloom_columns() == ["user_id"]
    assert meta.zone_maps["bloom_bits"] == 4096
    files = meta.manifest_files()
    assert all(
        "user_id" in (meta.file_stats()[f].get("bloom") or {})
        for f in files
    )
    uid = int(fetch_path(spark, path).select("user_id").first()[0])
    flt = [{"partition": "user_id", "comparison": "==", "values": [uid]}]
    got = fetch_path(spark, path, filters=flt)
    assert got.count() == \
        fetch_path(spark, path).filter(f"user_id = {uid}").count() > 0
    # an absent key prunes every fingerprinted file
    absent = [{"partition": "user_id", "comparison": "==",
               "values": [10**12]}]
    assert _prune_bloom_files(files, meta, absent) == []
    assert fetch_path(spark, path, filters=absent).count() == 0


def test_stream_upsert_converges_to_batch_latest(spark, sf_dir, tmp_path):
    """stream_upsert (r10): CDC stream -> merge-on-read eq-delete
    snapshots. Bootstrap from batch 1, resume the checkpoint to upsert a
    second wave, converge to the batch latest_state of everything seen."""
    from s3parq_spark import metadata
    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.operators import latest_state
    from s3parq_spark.streaming import stream_upsert
    from s3parq_spark.workload import _events

    import glob
    import os
    import shutil

    ev = _events(spark, sf_dir)
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    src = str(tmp_path / "landing")
    ds = str(tmp_path / "mirror")
    os.makedirs(src)

    def land(df, name):
        # the landing dir holds FLAT files (the file-source layout): write
        # to a scratch dir, move the parts in under unique names
        scratch = str(tmp_path / f"scratch_{name}")
        df.write.parquet(scratch)
        for i, p in enumerate(sorted(glob.glob(f"{scratch}/part-*.parquet"))):
            shutil.move(p, f"{src}/{name}-{i}.parquet")

    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        land(ev.filter(F.col("ts") < cutoff), "w1")
        # wave 1 bootstraps the dataset (deduped publish, no eq-deletes)
        stream_upsert(spark, src, ds, ["user_id"], "ts")
        meta = metadata.read_sidecar(spark, ds)
        assert meta is not None and not meta.eq_deletes()
        got1 = {
            (r["user_id"], r["event_id"])
            for r in fetch_path(spark, ds).collect()
        }
        exp1 = {
            (r["user_id"], r["event_id"])
            for r in latest_state(
                ev.filter(F.col("ts") < cutoff), ["user_id"], "ts",
                "event_id", ["event_type", "value", "props"],
            ).collect()
        }
        assert got1 == exp1
        # wave 2 lands as NEW source files; the derived checkpoint
        # resumes and only the new files are merged — as eq-delete commits
        land(ev.filter(F.col("ts") >= cutoff), "w2")
        stream_upsert(spark, src, ds, ["user_id"], "ts")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        else:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    meta = metadata.read_sidecar(spark, ds)
    assert meta.eq_deletes(), "wave 2 should land as an eq-delete snapshot"
    got = {
        (r["user_id"], r["event_id"])
        for r in fetch_path(spark, ds).collect()
    }
    exp = {
        (r["user_id"], r["event_id"])
        for r in latest_state(
            ev, ["user_id"], "ts", "event_id",
            ["event_type", "value", "props"],
        ).collect()
    }
    assert got == exp
    # one row per key after the merge — the mirror contract
    assert len({u for u, _ in got}) == len(got)


def test_stream_upsert_bootstrap_refuses_null_keys(spark, tmp_path):
    """r10 review: the bootstrap batch must honor the same non-NULL-key
    contract as every later merge — a NULL-key row landed at bootstrap
    could never be replaced by an equality delete."""
    import os

    import pytest

    from s3parq_spark.streaming import stream_upsert

    src = str(tmp_path / "landing")
    os.makedirs(src)
    rows = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", None, "click", 1.0, "{}"),
         (2, "2024-01-01 00:00:01", 5, "click", 2.0, "{}")],
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "cast(ts_s as timestamp) as ts", "user_id",
        "event_type", "value", "props",
    )
    rows.coalesce(1).write.parquet(str(tmp_path / "w"))
    import glob
    import shutil

    shutil.move(
        glob.glob(str(tmp_path / "w" / "part-*.parquet"))[0],
        f"{src}/w1.parquet",
    )
    with pytest.raises(Exception, match="NULL"):
        stream_upsert(
            spark, src, str(tmp_path / "mirror"), ["user_id"], "ts"
        )


def test_stream_upsert_exactly_once_across_crash(spark, sf_dir, tmp_path):
    """r10 verdict #1: a batch whose snapshot committed before the
    checkpoint advanced must NOT re-merge on restart. Simulated by
    deleting the checkpoint's commits/<N> marker after a successful run
    (exactly the on-disk state of a crash inside that window: offsets
    recorded, sink ran, completion not) — the restarted query re-delivers
    batch N under the same batch_id and the sink's txn-ledger check must
    skip it: ONE snapshot for the batch, duplicate-free history."""
    import glob
    import os
    import shutil

    from s3parq_spark import metadata
    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.operators import latest_state
    from s3parq_spark.streaming import stream_upsert
    from s3parq_spark.workload import _events

    ev = _events(spark, sf_dir)
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    src = str(tmp_path / "landing")
    ds = str(tmp_path / "mirror")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def land(df, name):
        scratch = str(tmp_path / f"scratch_{name}")
        df.write.parquet(scratch)
        for i, p in enumerate(sorted(glob.glob(f"{scratch}/part-*.parquet"))):
            shutil.move(p, f"{src}/{name}-{i}.parquet")

    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        land(ev.filter(F.col("ts") < cutoff), "w1")
        stream_upsert(spark, src, ds, ["user_id"], "ts",
                      checkpoint_location=ckpt)
        land(ev.filter(F.col("ts") >= cutoff), "w2")
        stream_upsert(spark, src, ds, ["user_id"], "ts",
                      checkpoint_location=ckpt)
        meta = metadata.read_sidecar(spark, ds)
        n_snaps = len(meta.snapshots)
        n_eq = len(meta.eq_deletes())
        assert n_eq >= 1
        # the ledger records the sink's high-water mark
        assert meta.txns and max(meta.txns.values()) >= 1, meta.txns
        # crash simulation: batch N's snapshot is committed, its
        # checkpoint completion marker is not
        cdir = os.path.join(ckpt, "commits")
        victim = os.path.join(
            cdir,
            sorted(n for n in os.listdir(cdir)
                   if not n.startswith(".") and not n.endswith(".crc"))[-1],
        )
        os.remove(victim)
        # a real crash leaves no checksum sidecar either (the local-FS
        # ChecksumFileSystem would refuse the re-write over an orphan CRC)
        crc = os.path.join(cdir, f".{os.path.basename(victim)}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        stream_upsert(spark, src, ds, ["user_id"], "ts",
                      checkpoint_location=ckpt)
        # Spark re-ran the batch through the sink (completion re-marked)...
        assert os.path.exists(victim), "batch was not re-delivered"
        meta2 = metadata.read_sidecar(spark, ds)
        # ...but the sink skipped it: no duplicate snapshot, no second
        # eq-delete for the same batch, ledger unchanged
        assert len(meta2.snapshots) == n_snaps, (n_snaps, len(meta2.snapshots))
        assert len(meta2.eq_deletes()) == n_eq
        assert meta2.txns == meta.txns
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        else:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    got = {
        (r["user_id"], r["event_id"])
        for r in fetch_path(spark, ds).collect()
    }
    exp = {
        (r["user_id"], r["event_id"])
        for r in latest_state(
            ev, ["user_id"], "ts", "event_id",
            ["event_type", "value", "props"],
        ).collect()
    }
    assert got == exp


def test_txn_ledger_restore_and_expiry(spark, tmp_path):
    """The idempotent-writer ledger's lifecycle contracts: it survives
    snapshot expiry (per-snapshot stamps fold into squash bases), and
    restore_dataset recomputes it conservatively from the kept prefix —
    an entry whose snapshot was rolled back is dropped, so the writer
    re-merges instead of silently skipping a destroyed batch."""
    from s3parq_spark import metadata
    from s3parq_spark.publish import (
        expire_snapshots,
        merge_upsert,
        publish_path,
        restore_dataset,
    )

    ds = str(tmp_path / "ds")
    rows = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 100)], "k long, v long, seq long"
    )
    publish_path(spark, ds, rows, [], _txn={"app": "w1", "version": 0})
    meta = metadata.read_sidecar(spark, ds)
    assert meta.txns == {"w1": 0}
    assert meta.snapshots[-1]["txn"] == {"app": "w1", "version": 0}
    # two more stamped appends, then an unstamped one
    publish_path(spark, ds, rows, [], _txn={"app": "w1", "version": 1})
    publish_path(spark, ds, rows, [], _txn={"app": "w2", "version": 7})
    publish_path(spark, ds, rows, [])
    meta = metadata.read_sidecar(spark, ds)
    assert meta.txns == {"w1": 1, "w2": 7}
    # a replayed LOWER version never moves the ledger backwards
    publish_path(spark, ds, rows, [], _txn={"app": "w1", "version": 0})
    meta = metadata.read_sidecar(spark, ds)
    assert meta.txns == {"w1": 1, "w2": 7}
    # expiry squashes v1..v4 into a base carrying the folded stamps
    expire_snapshots(spark, ds, keep_last=1)
    meta = metadata.read_sidecar(spark, ds)
    base = meta.snapshots[0]
    assert base.get("txns") == {"w1": 1, "w2": 7}, base
    assert meta.txns == {"w1": 1, "w2": 7}
    # a stamped merge-on-read upsert, then restore to before it: the
    # ledger must drop what the kept history can no longer prove
    up = spark.createDataFrame([(1, 11, 200)], "k long, v long, seq long")
    merge_upsert(spark, ds, up, ["k"], "seq", mode="merge-on-read",
                 txn={"app": "w3", "version": 3})
    meta = metadata.read_sidecar(spark, ds)
    assert meta.txns == {"w1": 1, "w2": 7, "w3": 3}
    head_before = meta.snapshots[0]["version"]
    restore_dataset(spark, ds, head_before)
    meta = metadata.read_sidecar(spark, ds)
    assert meta.txns == {"w1": 1, "w2": 7}, meta.txns


def test_checkpoint_reset_forks_writer_identity(spark, sf_dir, tmp_path):
    """ADVICE r11: deleting/resetting the checkpoint (the common
    operator 'reprocess' action) restarts Structured Streaming's batch
    ids at 0. Under a path-only writer identity the old ledger
    high-water mark silently swallowed every replayed batch — the
    mirror appeared to run but wrote nothing. The incarnation UUID
    persisted inside the checkpoint forks the identity, so the
    reprocess actually re-merges (and stays value-correct: replace
    semantics)."""
    import glob
    import os
    import shutil

    from s3parq_spark import metadata
    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.operators import latest_state
    from s3parq_spark.streaming import stream_upsert
    from s3parq_spark.workload import _events

    ev = _events(spark, sf_dir)
    src = str(tmp_path / "landing")
    ds = str(tmp_path / "mirror")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    try:
        scratch = str(tmp_path / "scratch")
        ev.write.parquet(scratch)
        for i, p in enumerate(sorted(glob.glob(f"{scratch}/part-*.parquet"))):
            shutil.move(p, f"{src}/w1-{i}.parquet")
        stream_upsert(spark, src, ds, ["user_id"], "ts",
                      checkpoint_location=ckpt)
        meta1 = metadata.read_sidecar(spark, ds)
        assert len(meta1.txns) == 1
        n1 = len(meta1.snapshots)
        # operator reprocess: checkpoint wiped, dataset survives
        shutil.rmtree(ckpt)
        stream_upsert(spark, src, ds, ["user_id"], "ts",
                      checkpoint_location=ckpt)
        meta2 = metadata.read_sidecar(spark, ds)
        # a SECOND writer identity re-merged the landing dir (batch 0
        # again, NOT skipped by the old identity's high-water mark)
        assert len(meta2.txns) == 2, meta2.txns
        assert len(meta2.snapshots) > n1
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        else:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    got = {
        (r["user_id"], r["event_id"])
        for r in fetch_path(spark, ds).collect()
    }
    exp = {
        (r["user_id"], r["event_id"])
        for r in latest_state(
            ev, ["user_id"], "ts", "event_id",
            ["event_type", "value", "props"],
        ).collect()
    }
    assert got == exp
