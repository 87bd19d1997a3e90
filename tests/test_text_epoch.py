"""Text-index family commit stamps (r15): the fail-loud crash windows.

The r14 ANN quantizer-epoch discipline applied to the text family: every
completed maintenance op stamps the postings/stopped head versions into
both the stats and postings sidecars; serve and maintenance paths
recompute the token from the live heads and REFUSE on disagreement —
the two documented silent-damage states (a half-moved posting list that
search double-counts, a stale stats fold that skews every BM25 score)
are now detectable, not just repairable."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from s3parq_spark import metadata
from s3parq_spark.text_index import (
    TextIndexEpochError,
    _read_stats,
    _stats_path,
    _stopped_path,
    build_text_index,
    compact_text_index,
    reindex_documents,
    repair_capped_index,
    repair_index_stats,
    search_text_index,
    search_text_index_batch,
    text_index_info,
)

MAXDF = 2


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )


def _rows(df):
    return [
        (r["doc_id"], r["n_terms"], round(r["score"], 9))
        for r in df.collect()
    ]


def _crash_reindex_at_mover_tombstone(spark, path, changed, monkeypatch):
    """Drive a capped reindex and kill it at the cap-crossing move's
    tombstone — the exact copy-then-tombstone crash window: the mover's
    posting list has landed on the destination side, its source rows
    have not been tombstoned."""
    import importlib

    # the package re-exports a `publish` FUNCTION: go through the import
    # system for the module object the text ops resolve delete_where from
    pub = importlib.import_module("s3parq_spark.publish")
    real = pub.delete_where
    calls = {"n": 0}

    def dying(spark_, p, pred, **kw):
        calls["n"] += 1
        if "term IN" in pred:
            raise RuntimeError("injected crash between copy and tombstone")
        return real(spark_, p, pred, **kw)

    monkeypatch.setattr(pub, "delete_where", dying)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            reindex_documents(spark, changed, path, "doc_id", "text")
    finally:
        monkeypatch.setattr(pub, "delete_where", real)
    assert calls["n"] >= 2  # id tombstone ran; the mover tombstone died


def test_crashed_cap_crossing_move_refuses_then_repairs(
    spark, tmp_path, monkeypatch
):
    """Window (a) of VERDICT r14 #1: a crash between the move's copy and
    its tombstone leaves a term double-resident — search used to
    double-count it silently; now every serve and maintenance path
    refuses, naming the repair pair, and repair + replay converge to the
    exact rebuild answer."""
    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.maintenance import maintain_dataset

    corpus = {
        1: "mover alpha", 2: "mover beta", 3: "gamma delta",
        4: "alpha beta", 5: "delta epsilon",
    }
    path = str(tmp_path / "idx")
    docs = _mk_docs(spark, corpus)
    build_text_index(spark, docs, path, "doc_id", "text",
                     n_buckets=4, max_df=MAXDF)

    # doc 3 gains 'mover': df 2 -> 3 crosses the cap (an UP move)
    updated = dict(corpus)
    updated[3] = "mover gamma delta"
    changed = _mk_docs(spark, {3: updated[3]})
    _crash_reindex_at_mover_tombstone(spark, path, changed, monkeypatch)

    # the manufactured state IS the documented window: 'mover' resident
    # on both sides (copy landed in stopped, live source not tombstoned)
    live_terms = {
        r["term"] for r in fetch_path(spark, path)
        .select("term").distinct().collect()
    }
    stop_terms = {
        r["term"] for r in fetch_path(spark, _stopped_path(path))
        .select("term").distinct().collect()
    }
    assert "mover" in live_terms and "mover" in stop_terms

    # every consumer refuses, naming the remedy
    with pytest.raises(TextIndexEpochError, match="repair_capped_index"):
        search_text_index(spark, path, ["alpha"], k=5)
    with pytest.raises(TextIndexEpochError):
        search_text_index_batch(spark, path, {"q": ["alpha"]}, k=5)
    with pytest.raises(TextIndexEpochError):
        reindex_documents(spark, changed, path, "doc_id", "text")
    with pytest.raises(TextIndexEpochError):
        compact_text_index(spark, path)
    # the ops view REPORTS instead of refusing
    info = text_index_info(spark, path)
    assert info["epoch_damage"] and "repair" in info["epoch_damage"]

    # the policy loop surfaces it and suspends compaction
    report = maintain_dataset(
        spark, path, compact_min_files=1, compact_below_fraction=1.0,
        max_snapshots=999, max_pending_tombstones=1,
    )
    kinds = [a["action"] for a in report["actions"]]
    assert "text_epoch_mismatch" in kinds
    assert "compact_text_index" not in kinds

    # remedy pair + replay (the streaming discipline): repair restores
    # the residency invariant and re-stamps from doclens ground truth,
    # the replayed reindex then lands the batch exactly once
    moved = repair_capped_index(spark, path)
    assert moved == {"mover": "stopped"}, moved
    repair_index_stats(spark, path)
    reindex_documents(spark, changed, path, "doc_id", "text")

    ref = str(tmp_path / "ref")
    build_text_index(spark, _mk_docs(spark, updated), ref, "doc_id",
                     "text", n_buckets=4, max_df=MAXDF)
    for q in (["alpha"], ["gamma", "delta"], ["mover", "epsilon"]):
        assert _rows(search_text_index(spark, path, q, k=10)) == \
            _rows(search_text_index(spark, ref, q, k=10)), q


def test_policy_loop_repairs_on_opt_in(spark, tmp_path, monkeypatch):
    """VERDICT r14 #6: with ``repair_text_on_epoch_mismatch=True`` the
    loop runs the remedy pair itself (dry_run reports would_run, the
    opt-in default stays advisory-only) and compaction resumes in the
    same pass once repaired."""
    from s3parq_spark.maintenance import maintain_dataset

    corpus = {1: "mover a", 2: "mover b", 3: "c d", 4: "a b", 5: "d e"}
    path = str(tmp_path / "idx")
    build_text_index(spark, _mk_docs(spark, corpus), path, "doc_id",
                     "text", n_buckets=4, max_df=MAXDF)
    changed = _mk_docs(spark, {3: "mover c d"})
    _crash_reindex_at_mover_tombstone(spark, path, changed, monkeypatch)

    report = maintain_dataset(
        spark, path, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999,
        repair_text_on_epoch_mismatch=True, dry_run=True,
    )
    acts = {a["action"]: a for a in report["actions"]}
    assert acts["text_epoch_mismatch"].get("would_run") is True
    with pytest.raises(TextIndexEpochError):
        search_text_index(spark, path, ["a"], k=3)  # dry run fixed nothing

    report = maintain_dataset(
        spark, path, compact_min_files=1, compact_below_fraction=1.0,
        max_snapshots=999, max_pending_tombstones=1,
        repair_text_on_epoch_mismatch=True,
    )
    acts = {a["action"]: a for a in report["actions"]}
    assert acts["text_epoch_mismatch"]["result"]["moved_terms"] == {
        "mover": "stopped"
    }
    assert "compact_text_index" in acts  # remedies resumed post-repair
    # repaired family serves (the un-replayed batch is the caller's
    # business — the stream replays it; stats agree with doclens)
    assert search_text_index(spark, path, ["a"], k=3).count() > 0


def test_upgrade_first_op_crash_still_refuses(spark, tmp_path):
    """The upgrade window (the r14 near-miss, closed symmetrically): a
    PRE-STAMP family serves for back-compat, but its FIRST r15
    maintenance op adopts it — stamping the current state before the
    op's first commit — so a crash mid-first-op refuses instead of
    failing open as 'never stamped'."""
    import s3parq_spark.text_index as ti

    corpus = {1: "alpha beta", 2: "gamma delta", 3: "alpha gamma"}
    path = str(tmp_path / "idx")
    build_text_index(spark, _mk_docs(spark, corpus), path, "doc_id",
                     "text", n_buckets=4)
    # manufacture the pre-r15 at-rest state: strip both stamps
    for p in (path, _stats_path(path)):
        m = metadata.read_sidecar(spark, p)
        m.text_epoch = None
        metadata.write_sidecar(spark, p, m)
    # back-compat: a fully unstamped family serves
    assert search_text_index(spark, path, ["alpha"], k=3).count() > 0

    # first maintenance op crashes before its stats write
    orig = ti._write_stats
    ti._write_stats = lambda *a, **k: None
    try:
        reindex_documents(
            spark, _mk_docs(spark, {2: "epsilon zeta"}), path,
            "doc_id", "text",
        )
    finally:
        ti._write_stats = orig
    # the adopt-at-op-start stamp makes the crash detectable: refuse
    with pytest.raises(TextIndexEpochError):
        search_text_index(spark, path, ["alpha"], k=3)
    repair_index_stats(spark, path)
    # reindex's commits are keyed state: after the stats repair the
    # family is exactly the updated corpus
    ref = str(tmp_path / "ref")
    build_text_index(
        spark,
        _mk_docs(spark, {1: "alpha beta", 2: "epsilon zeta",
                         3: "alpha gamma"}),
        ref, "doc_id", "text", n_buckets=4,
    )
    for q in (["alpha"], ["epsilon"], ["zeta", "gamma"]):
        assert _rows(search_text_index(spark, path, q, k=10)) == \
            _rows(search_text_index(spark, ref, q, k=10)), q


def test_rebuild_member_publish_crash_refuses_then_converges(
    spark, tmp_path, monkeypatch
):
    """r15 optimization round: build_text_index publishes its member
    datasets CONCURRENTLY (they are independent given the tokenize
    output), which is only sound because the stats write + family stamp
    remain the FINAL commit, issued after every member succeeds. Pin
    that: a rebuild over a healthy stamped family whose doclens publish
    dies must leave a REFUSING family (the stats stamp still describes
    the old heads), and a clean re-run of the build must converge."""
    import s3parq_spark.text_index as ti

    corpus = {1: "alpha beta", 2: "gamma delta", 3: "alpha gamma"}
    path = str(tmp_path / "idx")
    build_text_index(spark, _mk_docs(spark, corpus), path, "doc_id",
                     "text", n_buckets=4)
    assert search_text_index(spark, path, ["alpha"], k=3).count() > 0

    updated = {1: "alpha beta", 2: "epsilon zeta", 3: "alpha gamma"}
    real = ti.publish_path

    def dying(spark_, p, *a, **kw):
        if p.rstrip("/").endswith("_doclens"):
            raise RuntimeError("injected doclens publish crash")
        return real(spark_, p, *a, **kw)

    monkeypatch.setattr(ti, "publish_path", dying)
    try:
        with pytest.raises(RuntimeError, match="injected doclens"):
            build_text_index(spark, _mk_docs(spark, updated), path,
                             "doc_id", "text", n_buckets=4)
    finally:
        monkeypatch.setattr(ti, "publish_path", real)

    # the 'rebuilding' sentinel makes the crash detectable (an overwrite
    # resets every head to v1, so the version token alone cannot) and
    # the refusal names the only converging remedy: re-run the build
    with pytest.raises(TextIndexEpochError, match="build_text_index"):
        search_text_index(spark, path, ["alpha"], k=3)
    # the repair pair refuses rather than re-stamp a possibly
    # mixed-corpus family as healthy
    with pytest.raises(TextIndexEpochError, match="mix two corpora"):
        repair_index_stats(spark, path)
    with pytest.raises(TextIndexEpochError, match="mix two corpora"):
        repair_capped_index(spark, path)

    # a rebuild is idempotent-by-overwrite: re-running converges
    build_text_index(spark, _mk_docs(spark, updated), path, "doc_id",
                     "text", n_buckets=4)
    ref = str(tmp_path / "ref")
    build_text_index(spark, _mk_docs(spark, updated), ref, "doc_id",
                     "text", n_buckets=4)
    for q in (["alpha"], ["epsilon"], ["zeta", "gamma"]):
        assert _rows(search_text_index(spark, path, q, k=10)) == \
            _rows(search_text_index(spark, ref, q, k=10)), q


def test_raw_member_compaction_refuses_until_repaired(spark, tmp_path):
    """An out-of-band rewrite of a family member (raw compact_dataset on
    the postings instead of compact_text_index) moves the head the
    stamps bind — indistinguishable from a crashed op, so search
    refuses; repair_index_stats re-stamps and service resumes with
    identical answers. The family op restamps itself (no refusal)."""
    from s3parq_spark.publish import compact_dataset

    corpus = {i: f"alpha w{i}" for i in range(6)}
    path = str(tmp_path / "idx")
    build_text_index(spark, _mk_docs(spark, corpus), path, "doc_id",
                     "text", n_buckets=4)
    before = _rows(search_text_index(spark, path, ["alpha"], k=10))

    compact_text_index(spark, path)  # the family op: stamps carried
    assert _rows(search_text_index(spark, path, ["alpha"], k=10)) == before

    compact_dataset(spark, path)  # raw member rewrite: out-of-band
    with pytest.raises(TextIndexEpochError):
        search_text_index(spark, path, ["alpha"], k=10)
    repair_index_stats(spark, path)
    assert _rows(search_text_index(spark, path, ["alpha"], k=10)) == before


def test_routine_member_expiry_keeps_stamps_valid(spark, tmp_path):
    """maintain_dataset expires history PER MEMBER on an index family —
    expiry preserves the head version (it squashes the tail), so the
    stamps must stay valid and searches keep serving."""
    from s3parq_spark.maintenance import maintain_dataset
    from s3parq_spark.text_index import append_to_text_index

    corpus = {i: f"alpha w{i}" for i in range(4)}
    path = str(tmp_path / "idx")
    build_text_index(spark, _mk_docs(spark, corpus), path, "doc_id",
                     "text", n_buckets=4)
    for i in range(4, 10):
        append_to_text_index(
            spark, _mk_docs(spark, {i: f"alpha w{i}"}), path,
            "doc_id", "text",
        )
    report = maintain_dataset(
        spark, path, max_snapshots=3, keep_last=2,
        compact_min_files=9999, max_pending_tombstones=9999,
    )
    expired = [a for a in report["actions"]
               if a["action"] == "expire_snapshots"]
    assert expired, report["actions"]
    got = _rows(search_text_index(spark, path, ["alpha"], k=10))
    ref = str(tmp_path / "ref")
    build_text_index(
        spark, _mk_docs(spark, {i: f"alpha w{i}" for i in range(10)}),
        ref, "doc_id", "text", n_buckets=4,
    )
    assert got == _rows(search_text_index(spark, ref, ["alpha"], k=10))


def test_stats_sibling_history_stays_bounded(spark, tmp_path):
    """VERDICT r14 #8: the 1-row ``_stats`` dataset is rewritten by
    every maintenance op — mode='overwrite' resets its history each
    time, so the sibling's metadata plane stays O(1) at ANY op cadence
    (no expiry needed; pinned here so a future stats-write refactor
    cannot silently start accumulating snapshots)."""
    from s3parq_spark import fs
    from s3parq_spark.text_index import append_to_text_index

    corpus = {i: f"alpha w{i}" for i in range(3)}
    path = str(tmp_path / "idx")
    build_text_index(spark, _mk_docs(spark, corpus), path, "doc_id",
                     "text", n_buckets=4)
    for i in range(3, 9):
        append_to_text_index(
            spark, _mk_docs(spark, {i: f"alpha w{i}"}), path,
            "doc_id", "text",
        )
    sm = metadata.read_sidecar(spark, _stats_path(path))
    assert len(sm.snapshots) == 1
    assert len(fs.list_files(spark, _stats_path(path))) <= 2
    n_docs, _, _ = _read_stats(spark, path)
    assert n_docs == 9


def test_stats_mirror_serves_driver_side(spark, tmp_path, monkeypatch):
    """r15 serve-path shortcut: the corpus stats ride the stats
    sidecar (written atomically with the commit stamp), so _read_stats
    costs one driver-side JSON read and ZERO Spark jobs — pinned by
    poisoning the Spark fetch path and reading anyway. A pre-r15
    family (mirror stripped) falls back to collecting the row, with
    identical values."""
    import s3parq_spark.text_index as ti

    corpus = {i: f"alpha w{i}" for i in range(5)}
    path = str(tmp_path / "idx")
    build_text_index(spark, _mk_docs(spark, corpus), path, "doc_id",
                     "text", n_buckets=4, max_df=3)

    def no_spark(*a, **k):
        raise AssertionError("stats read must not run a Spark job")

    monkeypatch.setattr(ti, "fetch_path", no_spark)
    assert _read_stats(spark, path) == (5, 10, 3)
    monkeypatch.undo()

    # strip the mirror: the row remains the source of truth
    sm = metadata.read_sidecar(spark, _stats_path(path))
    sm.text_stats = None
    metadata.write_sidecar(spark, _stats_path(path), sm)
    assert _read_stats(spark, path) == (5, 10, 3)


def test_stream_reindex_self_heals_stale_stamps(spark, tmp_path):
    """r15: a batch re-delivered after a crash MID-reindex finds stale
    commit stamps — the streaming sink must repair (ground truth from
    doclens) and replay instead of wedging the stream. Manufactured by
    poisoning the stamp directly (the minimal stale-stamp state); the
    landed batch must then equal a rebuild over the final corpus."""
    import glob
    import os
    import shutil

    from s3parq_spark.streaming import stream_index_documents

    src = str(tmp_path / "landing")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def land(rows, name):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        scratch = str(tmp_path / f"scratch_{name}")
        df.coalesce(1).write.parquet(scratch)
        for i, p in enumerate(
            sorted(glob.glob(f"{scratch}/part-*.parquet"))
        ):
            shutil.move(p, f"{src}/{name}-{i}.parquet")

    w1 = [(i, f"alpha doc{i}") for i in range(6)]
    land(w1, "w1")
    stream_index_documents(spark, src, idx, "doc_id", "text",
                           checkpoint_location=ckpt, n_buckets=4)

    # the crashed-replay state: stamps no longer match the live heads
    sm = metadata.read_sidecar(spark, _stats_path(idx))
    sm.text_epoch = "v999:-"
    metadata.write_sidecar(spark, _stats_path(idx), sm)
    with pytest.raises(TextIndexEpochError):
        search_text_index(spark, idx, ["alpha"], k=3)

    # wave 2 arrives: the sink must repair + land, not wedge
    w2 = [(2, "beta changed"), (7, "beta doc7new")]
    land(w2, "w2")
    stream_index_documents(spark, src, idx, "doc_id", "text",
                           checkpoint_location=ckpt, n_buckets=4)

    final = dict(w1)
    final.update(dict(w2))
    ref = str(tmp_path / "ref")
    build_text_index(
        spark,
        spark.createDataFrame(sorted(final.items()),
                              "doc_id long, text string"),
        ref, "doc_id", "text", n_buckets=4,
    )
    for q in (["alpha"], ["beta"]):
        assert _rows(search_text_index(spark, idx, q, k=10)) == \
            _rows(search_text_index(spark, ref, q, k=10)), q
