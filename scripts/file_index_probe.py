"""File-count scaling probe for the manifest read path (r5 verdict #8).

Measures a filtered ``fetch_path`` against synthetic datasets of growing
FILE count (constant tiny rows), isolating the driver/file-index cost that
dominates metadata-heavy reads:

- manifest mode WITHOUT driver-side pruning: every fetch ships O(dataset
  files) path strings through py4j and builds a JVM file index of the whole
  dataset, then Catalyst prunes;
- manifest mode WITH ``_prune_manifest_files`` (the shipped path): the
  filter spec is evaluated on the driver against the manifest's hive
  values, so both costs scale with the files the query can MATCH.

Run: ``python scripts/file_index_probe.py [n_partitions ...]``
(default 100 1000 5000 partitions × 2 files each; the filter selects ONE
partition, so matching files stay constant while dataset files grow).

Recorded result (local[32], this container, 2026-08-14, r6):

    files   unpruned fetch   pruned fetch
      200       0.554 s        0.139 s
     2000       3.582 s        0.104 s
    10000      17.264 s        0.106 s

Unpruned grows linearly with dataset file count (py4j transfer + JVM
PartitioningAwareFileIndex listing); pruned is flat — the query's latency
is decided by what it reads, not by how big the dataset has grown. This is
the custom-FileIndex production note made real at the driver layer; a JVM
FileIndex implementation would additionally skip the per-path
``getFileStatus`` batch, the remaining fixed cost.

``stats`` mode (r10) probes the metadata plane itself: sidecar bytes,
cold lazy-load of the per-file zone/bloom stats, and a bloom point fetch,
as the stats-carrying file count grows. Recorded (local[32], this
container, 2026-08-15, r10 — per-file stats in columnar manifests AND
snapshot file lists spilled to per-version manifests):

    files   sidecar_B   stats_load   point_fetch   kept
      200        610       0.009s       0.245s       1
     2000        612       0.037s       0.165s       1
    10000        614       0.205s       0.212s       1

The sidecar is ~612 bytes FLAT at any file count (r9 inlined ~2.4 KB/file
of bloom state — ~24 MB at 10k files, GBs at 10^6 — plus ~80 B/file of
added-lists); the one-time per-process stats load is columnar+zstd and is
paid only by queries whose filters can prune; the point fetch stays flat
because exactly one file survives the skip however many files exist.

``matching`` mode (r12) probes the OTHER axis — the r11 #8 stretch: the
MATCHING file count grows 10x while the filter still keeps one whole
partition. ``files-path`` ships one py4j path string per matching file
(the pre-r12 plan, forced); ``dirs-path`` is the shipped
``fetch._dir_scan`` plan — whole hive dirs, verified against the
manifest via the executed InMemoryFileIndex. Recorded (local[32], this
container, 2026-08-16, r12; 4 partitions x N files, one kept):

    matching   files-path   dirs-path
        500       1.616s      0.568s
       2000       4.140s      1.419s
       5000       8.637s      3.500s

The remaining dirs-path slope is the scan itself (N one-row files =
N footer reads + tasks — irreducible work that rides executors, not the
driver); the ~1 ms/file driver-side fixed cost (py4j transfer + per-leaf
``getFileStatus``) is gone. On an object store the same change turns N
HEAD requests into one LIST per directory.

``serving`` mode (r13) answers the r12 verdict #8 stretch: should INDEX
SERVING reads (an ANN probe = nprobe cells x few files each — far below
the old 256-survivor threshold) ship dirs too? Recorded (local[32],
this container, 2026-08-16, r13; 64 cells, 3-cell probe):

    files/cell   survivors   files-path   dirs-path
         2            6        0.209s      0.195s
         8           24        0.226s      0.166s
        32           96        0.456s      0.187s

Dirs never lose (the coverage verification rides the InMemoryFileIndex
listing BOTH paths build anyway) and win 2.4x at 96 survivors — exactly
a production probe's shape between compactions. Consequence:
``_DIR_SCAN_MIN_FILES`` lowered 256 -> 24 (the compression-ratio >= 4
floor still keeps 1-file/dir layouts on the per-file path).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, n_parts: int, files_per_part: int = 2) -> str:
    from pyspark.sql import functions as F

    from s3parq_spark.publish import publish_path

    base = os.path.join(
        tempfile.gettempdir(), f"s3parq_fidx_probe_{n_parts}"
    )
    marker = os.path.join(base, "_PROBE_OK")
    if os.path.exists(marker):
        return base
    shutil.rmtree(base, ignore_errors=True)
    n = n_parts * files_per_part
    df = (
        spark.range(n)
        .select(
            F.col("id"),
            (F.col("id") % n_parts).cast("int").alias("p"),
        )
    )
    publish_path(spark, base, df, ["p"], max_records_per_file=1)
    with open(marker, "w") as fh:
        fh.write("ok")
    return base


def timed_fetch(spark, path: str, prune: bool) -> float:
    import importlib

    # the package exports a `fetch` FUNCTION that shadows the submodule on
    # plain attribute import
    fetch_mod = importlib.import_module("s3parq_spark.fetch")

    orig = fetch_mod._prune_manifest_files
    if not prune:
        fetch_mod._prune_manifest_files = lambda files, meta, filters: files
    try:
        flt = [{"partition": "p", "comparison": "==", "values": [3]}]
        best = None
        for _ in range(3):
            t0 = time.time()
            n = fetch_mod.fetch_path(spark, path, filters=flt).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        assert n >= 1
        return best
    finally:
        fetch_mod._prune_manifest_files = orig


def build_stats(spark, n_files: int) -> str:
    """Unpartitioned dataset with ``n_files`` one-row files, zone maps on
    the clustered id and a bloom fingerprint on a scattered key — the
    shape the r10 stats-manifest layout exists for."""
    from pyspark.sql import functions as F

    from s3parq_spark.publish import publish_path

    base = os.path.join(
        tempfile.gettempdir(), f"s3parq_zstats_probe_{n_files}"
    )
    marker = os.path.join(base, "_PROBE_OK")
    if os.path.exists(marker):
        return base
    shutil.rmtree(base, ignore_errors=True)
    df = spark.range(n_files).select(
        F.col("id"),
        (F.col("id") * F.lit(2654435761) % F.lit(2**31)).alias("key"),
    )
    publish_path(
        spark, base, df, [], max_records_per_file=1,
        zone_map_columns=["id"], file_bloom_columns=["key"],
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return base


def stats_probe(spark, sizes) -> None:
    """r10 probe (r9 verdict 'next round' #1 done-criterion): sidecar
    bytes, stats-manifest lazy-load time, and bloom point-fetch latency
    must all stay FLAT (sidecar) / proportional-to-stats (load) as the
    stats-carrying file count grows 10x — the per-file state lives in
    columnar manifests, not the sidecar JSON every read parses."""
    from s3parq_spark import fs, metadata

    print(
        f"{'files':>8} {'sidecar_B':>10} {'stats_load':>11} "
        f"{'point_fetch':>12} {'kept':>5}"
    )
    for n in sizes:
        path = build_stats(spark, n)
        sidecar_b = os.path.getsize(os.path.join(path, fs.SIDECAR_NAME))
        # cold manifest load (bypass the process cache)
        metadata._STATS_MANIFEST_CACHE.clear()
        meta = metadata.read_sidecar(spark, path)
        t0 = time.time()
        stats = meta.file_stats()
        t_load = time.time() - t0
        assert len(stats) == n
        import importlib

        fetch_mod = importlib.import_module("s3parq_spark.fetch")
        probe_key = (3 * 2654435761) % (2**31)
        flt = [{"partition": "key", "comparison": "==", "values": [probe_key]}]
        best = None
        kept = None
        for _ in range(3):
            t0 = time.time()
            got = fetch_mod.fetch_path(spark, path, filters=flt)
            kept = len(got.inputFiles())
            c = got.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        assert c == 1, c
        print(
            f"{n:>8} {sidecar_b:>10} {t_load:>10.3f}s {best:>11.3f}s "
            f"{kept:>5}"
        )


def build_matching(spark, files_per_part: int) -> str:
    """Few partitions, MANY files each: the filter keeps one whole
    partition, so the MATCHING file count grows with files_per_part —
    the r11 #8 shape (pruned reads were flat in dataset size but O(
    matching files) in py4j path transfer + per-leaf getFileStatus)."""
    from pyspark.sql import functions as F

    from s3parq_spark.publish import publish_path

    base = os.path.join(
        tempfile.gettempdir(), f"s3parq_match_probe_{files_per_part}"
    )
    marker = os.path.join(base, "_PROBE_OK")
    if os.path.exists(marker):
        return base
    shutil.rmtree(base, ignore_errors=True)
    n = 4 * files_per_part
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("p")
    )
    publish_path(
        spark, base, df.repartition(files_per_part), ["p"],
        max_records_per_file=1,
    )
    with open(marker, "w") as fh:
        fh.write("ok")
    return base


def matching_probe(spark, sizes) -> None:
    """r12 probe (r11 verdict #8 done-criterion): a pruned fetch whose
    MATCHING file count grows 10x. ``dirs`` mode ships whole hive
    directories (fetch._dir_scan — the survivor set covers them, the
    InMemoryFileIndex verification pins correctness); ``files`` mode
    forces the per-file path list (the pre-r12 plan) by disabling the
    dir coalescing. The per-matching-file fixed cost is the gap."""
    import importlib

    fetch_mod = importlib.import_module("s3parq_spark.fetch")
    flt = [{"partition": "p", "comparison": "==", "values": [3]}]
    print(f"{'matching':>9} {'files-path':>11} {'dirs-path':>10} {'dirs?':>6}")
    for fp in sizes:
        path = build_matching(spark, fp)
        times = {}
        used = None
        for mode in ("files", "dirs"):
            orig = fetch_mod._DIR_SCAN_MIN_FILES
            if mode == "files":
                fetch_mod._DIR_SCAN_MIN_FILES = 10**9
            best = None
            try:
                for _ in range(3):
                    t0 = time.time()
                    n = fetch_mod.fetch_path(spark, path, filters=flt).count()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                assert n == fp, (n, fp)
            finally:
                fetch_mod._DIR_SCAN_MIN_FILES = orig
            times[mode] = best
            if mode == "dirs":
                used = fetch_mod._LAST_SCAN_USED_DIRS
        print(
            f"{fp:>9} {times['files']:>10.3f}s {times['dirs']:>9.3f}s "
            f"{str(used):>6}"
        )


def build_serving(spark, n_cells: int, files_per_cell: int) -> str:
    from pyspark.sql import functions as F

    from s3parq_spark.publish import publish_path

    base = os.path.join(
        tempfile.gettempdir(),
        f"s3parq_serving_probe_{n_cells}x{files_per_cell}",
    )
    marker = os.path.join(base, "_PROBE_OK")
    if os.path.exists(marker):
        return base
    shutil.rmtree(base, ignore_errors=True)
    n = n_cells * files_per_cell
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % n_cells).cast("int").alias("cell"),
    )
    publish_path(spark, base, df, ["cell"], max_records_per_file=1)
    with open(marker, "w") as fh:
        fh.write("ok")
    return base


def serving_probe(spark, sizes) -> None:
    """r13 probe (r12 verdict #8 stretch): should INDEX SERVING reads
    ship dirs below the 256-survivor threshold? An ANN probe touches
    nprobe cells x few files each — far under ``_DIR_SCAN_MIN_FILES`` —
    so it always takes the per-file path today. ``files`` is that
    shipped plan; ``dirs`` forces dir shipping (threshold 1, ratio 1)
    for the same 3-cell probe read."""
    import importlib

    fetch_mod = importlib.import_module("s3parq_spark.fetch")
    flt = [{"partition": "cell", "comparison": "==", "values": [3, 17, 42]}]
    print(f"{'files/cell':>10} {'survivors':>9} {'files-path':>11} "
          f"{'dirs-path':>10} {'dirs?':>6}")
    for fpc in sizes:
        path = build_serving(spark, 64, fpc)
        times = {}
        used = None
        for mode in ("files", "dirs"):
            o_min = fetch_mod._DIR_SCAN_MIN_FILES
            o_rat = fetch_mod._DIR_SCAN_MIN_RATIO
            if mode == "dirs":
                fetch_mod._DIR_SCAN_MIN_FILES = 1
                fetch_mod._DIR_SCAN_MIN_RATIO = 1
            best = None
            try:
                for _ in range(5):
                    t0 = time.time()
                    n = fetch_mod.fetch_path(spark, path, filters=flt).count()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                assert n == 3 * fpc, (n, fpc)
            finally:
                fetch_mod._DIR_SCAN_MIN_FILES = o_min
                fetch_mod._DIR_SCAN_MIN_RATIO = o_rat
            times[mode] = best
            if mode == "dirs":
                used = fetch_mod._LAST_SCAN_USED_DIRS
        print(
            f"{fpc:>10} {3 * fpc:>9} {times['files']:>10.3f}s "
            f"{times['dirs']:>9.3f}s {str(used):>6}"
        )


def main() -> None:
    from s3parq_spark.session import get_spark

    spark = get_spark(app_name="file_index_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup
    if sys.argv[1:2] == ["stats"]:
        sizes = [int(a) for a in sys.argv[2:]] or [200, 2000, 10000]
        stats_probe(spark, sizes)
        return
    if sys.argv[1:2] == ["matching"]:
        sizes = [int(a) for a in sys.argv[2:]] or [500, 2000, 5000]
        matching_probe(spark, sizes)
        return
    if sys.argv[1:2] == ["serving"]:
        sizes = [int(a) for a in sys.argv[2:]] or [2, 8, 32]
        serving_probe(spark, sizes)
        return
    sizes = [int(a) for a in sys.argv[1:]] or [100, 1000, 5000]
    print(f"{'files':>8} {'unpruned':>10} {'pruned':>10}")
    for n_parts in sizes:
        path = build(spark, n_parts)
        cold = timed_fetch(spark, path, prune=True)  # warm file statuses
        del cold
        t_un = timed_fetch(spark, path, prune=False)
        t_pr = timed_fetch(spark, path, prune=True)
        print(f"{n_parts * 2:>8} {t_un:>9.3f}s {t_pr:>9.3f}s")


if __name__ == "__main__":
    main()
