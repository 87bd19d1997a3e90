"""Filesystem metadata plane.

The reference (``/root/reference/s3parq/fetch_parq.py:327-354``) answers its
listing queries with paginated S3 ``list_objects`` calls on the driver. Here
the same metadata plane is expressed through the Hadoop FileSystem API exposed
by the Spark JVM, so one code path covers ``file://``, ``hdfs://`` and
``s3a://`` URIs. Listing is driver-side by design: it is proportional to the
*number of files*, not the data volume, which is exactly the property that
makes the reference's partition-value queries metadata-only (no row I/O) —
see SURVEY.md §3.4.
"""

from __future__ import annotations

import json
import posixpath
from typing import Dict, List

from pyspark.sql import SparkSession

SIDECAR_NAME = "_s3parq_metadata.json"

#: engine-internal directories under a dataset root whose files are METADATA,
#: never data rows: equality-delete key frames (merge-on-read upsert) and the
#: columnar stats manifests. Anything computing "this dataset's data files"
#: from a listing must skip them (stats manifests don't end in .parquet, so
#: only the key files can actually collide — but one membership test covers
#: both and every future hidden plane).
HIDDEN_DATA_DIRS = ("_eq_deletes", "_s3parq_stats", "_s3parq_manifests")


def is_hidden_rel(rel: str) -> bool:
    """True when a dataset-relative path lives under an engine-internal
    (non-data) directory — see ``HIDDEN_DATA_DIRS``."""
    return rel.split("/", 1)[0] in HIDDEN_DATA_DIRS


def _jvm_fs(spark: SparkSession, path: str):
    """Resolve a Hadoop FileSystem + Path for a URI (local, hdfs or s3a)."""
    jvm = spark.sparkContext._jvm
    hadoop_conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hadoop_conf)
    return fs, jpath, jvm


def dataset_uri(bucket: str, key: str) -> str:
    """Reference-compatible ``(bucket, key)`` → URI.

    Mirrors ``s3_url`` (``/root/reference/s3parq/publish_parq.py:152-154``)
    but emits ``s3a://`` (the Hadoop S3 connector scheme) and passes local
    paths (used by the test-suite the way moto is used by the reference)
    straight through.
    """
    if bucket.startswith(("s3://", "s3:/")) and not bucket.startswith("s3a"):
        # reference s3:// URIs map to the Hadoop S3 connector scheme
        rest = bucket.split(":", 1)[1].lstrip("/")
        base = f"s3a://{rest}"
        return posixpath.join(base, key) if key else base
    if bucket.startswith("/") or ":" in bucket.split("/", 1)[0]:
        # absolute OS path, or any scheme'd URI (file:, s3a:, hdfs:,
        # viewfs:, ... — single- or double-slash forms both valid Hadoop
        # URIs) passes through untouched
        return posixpath.join(bucket, key) if key else bucket
    return f"s3a://{bucket}/{key}"


def exists(spark: SparkSession, path: str) -> bool:
    local = _local_root(path, spark)
    if local is not None:
        import os

        return os.path.exists(local)
    fs, jpath, _ = _jvm_fs(spark, path)
    return bool(fs.exists(jpath))


# fs.defaultFS scheme check, once per SparkContext (py4j round trip).
_DEFAULT_FS_LOCAL: dict = {}


def _default_fs_is_local(spark: SparkSession) -> bool:
    # keyed by applicationId + startTime, NOT id(): a stopped context's
    # id() can be reused by a successor with a different defaultFS, and a
    # stale True would split sidecar (driver disk) from data (defaultFS)
    sc = spark.sparkContext
    key = (sc.applicationId, sc.startTime)
    cached = _DEFAULT_FS_LOCAL.get(key)
    if cached is None:
        default = spark.sparkContext._jsc.hadoopConfiguration().get(
            "fs.defaultFS", "file:///"
        )
        cached = default.startswith("file:")
        _DEFAULT_FS_LOCAL[key] = cached
    return cached


def _local_root(path: str, spark: SparkSession | None = None) -> str | None:
    """OS path when ``path`` provably addresses the local filesystem —
    a ``file:`` URI (any slash count: ``file:/p``, ``file:///p``) with no
    foreign authority, or a bare absolute OS path *when the session's
    ``fs.defaultFS`` is itself ``file:`` (Spark resolves bare paths against
    defaultFS, so on an hdfs://-default cluster ``/p`` is NOT the driver's
    disk — doing OS I/O there would split data and sidecar across two
    filesystems). Anything else — remote schemes, scheme shorthands like
    ``hdfs:/nn/x``, or relative paths — returns None and goes through the
    Hadoop FileSystem, which resolves them against its own configuration
    instead of the Python process's cwd (a relative path here silently
    doing OS I/O was the r6 review's s3-shaped-path hazard)."""
    if path.startswith("/"):
        if spark is None or _default_fs_is_local(spark):
            return path
        return None
    if path.startswith("file:"):
        from urllib.parse import urlparse

        u = urlparse(path)
        if u.netloc in ("", "localhost"):
            return u.path or "/"
    return None


def list_files(spark: SparkSession, path: str, suffix: str = ".parquet") -> List[str]:
    """Recursively list data files under ``path`` (driver-side metadata op).

    Equivalent of the reference's ``get_all_files_list``
    (``fetch_parq.py:327-354``); returns paths relative to ``path`` so the
    hive ``k=v`` components can be parsed out of them.

    Local paths walk the OS directly: the Hadoop ``RemoteIterator`` costs
    ~3 py4j round-trips per file (~30 ms/file), which turns a metadata-only
    query into seconds at a few hundred files. Remote schemes keep the
    Hadoop API; at object-store scale the listing plane should be the
    scoped per-partition listing / manifest used by ``publish`` anyway.
    """
    local = _local_root(path, spark)
    if local is not None:
        import os

        if not os.path.exists(local):
            return []
        root = local.rstrip("/")
        out = []
        for dirpath, _dirnames, filenames in os.walk(root):
            for f in filenames:
                if suffix and not f.endswith(suffix):
                    continue
                full = os.path.join(dirpath, f)
                out.append(os.path.relpath(full, root))
        return sorted(out)
    fs, jpath, _ = _jvm_fs(spark, path)
    if not fs.exists(jpath):
        return []
    out: List[str] = []
    it = fs.listFiles(jpath, True)  # recursive RemoteIterator
    base = fs.makeQualified(jpath).toString().rstrip("/")
    while it.hasNext():
        p = it.next().getPath().toString()
        if suffix and not p.endswith(suffix):
            continue
        rel = p[len(base) + 1:] if p.startswith(base + "/") else p
        out.append(rel)
    return sorted(out)


def list_file_sizes(
    spark: SparkSession, path: str, suffix: str = ".parquet"
) -> Dict[str, int]:
    """ONE recursive listing returning ``{relpath: bytes}`` (r14): the
    maintenance health probe used to issue one ``stat``/``getFileStatus``
    per manifest file — O(files) driver round-trips, hours at 10^6 files
    on an object store. Sizes are free on the same listing the walk
    already does: locally ``os.stat`` per entry during the walk, remotely
    the recursive ``listFiles`` iterator's ``LocatedFileStatus`` carries
    ``getLen()`` — one paged LIST instead of a HEAD per file. Files that
    race away mid-walk are simply absent from the result."""
    local = _local_root(path, spark)
    if local is not None:
        import os

        if not os.path.exists(local):
            return {}
        root = local.rstrip("/")
        out: Dict[str, int] = {}
        for dirpath, _dirnames, filenames in os.walk(root):
            for f in filenames:
                if suffix and not f.endswith(suffix):
                    continue
                full = os.path.join(dirpath, f)
                try:
                    out[os.path.relpath(full, root)] = os.stat(full).st_size
                except OSError:
                    continue
        return out
    fs, jpath, _ = _jvm_fs(spark, path)
    if not fs.exists(jpath):
        return {}
    out = {}
    it = fs.listFiles(jpath, True)  # recursive RemoteIterator
    base = fs.makeQualified(jpath).toString().rstrip("/")
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        if suffix and not p.endswith(suffix):
            continue
        rel = p[len(base) + 1:] if p.startswith(base + "/") else p
        out[rel] = int(st.getLen())
    return out


def _jvm_file_status(fs, jpath, path: str):
    """``getFileStatus`` with the missing-file failure normalized: a
    Hadoop-backed filesystem raises Py4JJavaError wrapping a java
    FileNotFoundException, which is re-raised as Python
    ``FileNotFoundError`` so both the local (``os.stat``) and remote
    branches share ONE missing-file contract (``except OSError``) —
    callers like the maintenance health probe degrade gracefully on any
    filesystem instead of crashing on the JVM wrapper type."""
    try:
        return fs.getFileStatus(jpath)
    except Exception as exc:
        if "FileNotFoundException" in str(exc):
            raise FileNotFoundError(path) from exc
        raise


def file_size(spark: SparkSession, path: str) -> int:
    """Size of a file in bytes (driver-side metadata op; one ``stat`` /
    ``getFileStatus`` per call). Used by the maintenance health probe.
    A missing file raises ``FileNotFoundError`` (an ``OSError``) on BOTH
    the local and Hadoop branches."""
    local = _local_root(path, spark)
    if local is not None:
        import os

        return os.stat(local).st_size
    fs, jpath, _ = _jvm_fs(spark, path)
    return int(_jvm_file_status(fs, jpath, path).getLen())


def file_mtime(spark: SparkSession, path: str) -> float:
    """Modification time of a file as epoch seconds (driver-side metadata
    op; one ``stat``/``getFileStatus`` per call). Used by the vacuum
    retention window. A missing file raises ``FileNotFoundError`` (an
    ``OSError``) on BOTH the local and Hadoop branches."""
    local = _local_root(path, spark)
    if local is not None:
        import os

        return os.stat(local).st_mtime
    fs, jpath, _ = _jvm_fs(spark, path)
    return _jvm_file_status(fs, jpath, path).getModificationTime() / 1000.0


def newest_mtime(spark: SparkSession, path: str) -> float:
    """Newest modification time (epoch seconds) of ``path`` or anything
    under it, from ONE recursive listing. A top-level directory's own
    mtime reflects only direct-child creation — an in-flight rewrite
    writing leaf files deep in a partition tree never bumps it (and some
    object stores report 0 for synthetic directories) — so age checks on
    parked/temp rewrite state must look at the TREE's newest write, not
    the root's. Raises ``FileNotFoundError`` when the path is missing."""
    local = _local_root(path, spark)
    if local is not None:
        import os

        newest = os.stat(local).st_mtime  # raises if missing
        for dirpath, _dirnames, filenames in os.walk(local):
            for f in filenames:
                try:
                    newest = max(
                        newest, os.stat(os.path.join(dirpath, f)).st_mtime
                    )
                except OSError:
                    continue  # raced away mid-walk
        return newest
    fs, jpath, _ = _jvm_fs(spark, path)
    # ONE getFileStatus, reused for both mtime and the directory check:
    # a second unnormalized call here could race a concurrent delete and
    # leak a raw Py4JJavaError past callers' ``except OSError`` (ADVICE
    # r14) — and it is a redundant RPC on remote filesystems anyway.
    status = _jvm_file_status(fs, jpath, path)
    newest = status.getModificationTime() / 1000.0
    if status.isDirectory():
        it = fs.listFiles(jpath, True)
        while it.hasNext():
            newest = max(
                newest, it.next().getModificationTime() / 1000.0
            )
    return newest


def rename(spark: SparkSession, src: str, dst: str) -> bool:
    """Directory/file rename through the Hadoop FileSystem (atomic on
    local/HDFS; copy-based on object stores)."""
    fs, jsrc, jvm = _jvm_fs(spark, src)
    return bool(fs.rename(jsrc, jvm.org.apache.hadoop.fs.Path(dst)))


#: park-time stamp written into a just-parked rewrite directory: rename
#: preserves every mtime in the tree, so without it a directory parked
#: SECONDS ago reads as aged residue and the maintenance sweep's vacuum
#: retention window cannot protect another process's in-flight swap
#: (ADVICE r14). The stamp's own mtime IS the park time — newest_mtime
#: picks it up with no sweep-side changes.
PARK_STAMP = "_PARKED_AT"


def stamp_parked(spark: SparkSession, parked_dir: str) -> None:
    """Record the park time of a just-renamed ``.pre*`` directory by
    writing ``_PARKED_AT`` inside it. Written AFTER the swap-in
    completes (never on a rollback path, so a restored live dataset
    carries no stray stamp); a crash before the stamp leaves either an
    incomplete swap (health probe raises — sweep never runs) or a
    microsecond unstamped window, both strictly better than the
    unprotected state. Failures are swallowed: the stamp is a sweep
    hint, not a commit."""
    try:
        write_text(spark, parked_dir.rstrip("/") + "/" + PARK_STAMP, "parked")
    except OSError:
        pass


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, jpath, _ = _jvm_fs(spark, path)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, recursive))


def read_text(spark: SparkSession, path: str) -> str:
    """Local paths read directly from the OS: the JVM stream open +
    commons-io drain costs ~6 py4j round trips (~20 ms) PER READ, which the
    r5→r6 drift profile showed was the single biggest fixed cost on every
    fetch (the sidecar read). Remote schemes keep the Hadoop API."""
    local = _local_root(path, spark)
    if local is not None:
        with open(local, encoding="utf-8") as fh:
            return fh.read()
    fs, jpath, jvm = _jvm_fs(spark, path)
    stream = fs.open(jpath)
    try:
        # py4j cannot fill a Python-side buffer from Java; let commons-io
        # (on Spark's classpath) drain the stream JVM-side.
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text(spark: SparkSession, path: str, content: str) -> None:
    local = _local_root(path, spark)
    if local is not None:
        import os

        # same semantics as Hadoop create(overwrite=True): parents made,
        # existing file replaced — but ATOMICALLY (temp + rename): the
        # callers are metadata sidecars (dataset sidecar, quantizer
        # JSON), where a crash mid-write must leave the PREVIOUS
        # version readable, never a truncated file. Remote schemes keep
        # the direct create: S3 PUTs are whole-object atomic already,
        # and an object-store "rename" is a slower copy.
        os.makedirs(os.path.dirname(local) or "/", exist_ok=True)
        tmp = f"{local}.tmp.{os.getpid()}"
        try:
            with open(tmp, "w", encoding="utf-8") as fh:
                fh.write(content)
            os.replace(tmp, local)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        return
    fs, jpath, _ = _jvm_fs(spark, path)
    stream = fs.create(jpath, True)  # overwrite
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()


def read_bytes(spark: SparkSession, path: str) -> bytes:
    """Whole-file binary read (driver-side metadata op) — the stats-manifest
    loader's primitive. Local paths read from the OS; remote schemes drain
    the Hadoop stream JVM-side (commons-io), same split as ``read_text``."""
    local = _local_root(path, spark)
    if local is not None:
        with open(local, "rb") as fh:
            return fh.read()
    fs, jpath, jvm = _jvm_fs(spark, path)
    stream = fs.open(jpath)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def write_bytes(spark: SparkSession, path: str, data: bytes) -> None:
    """Whole-file binary write (create/overwrite, parents made) — the
    stats-manifest writer's primitive. Same local/Hadoop split as
    ``write_text``."""
    local = _local_root(path, spark)
    if local is not None:
        import os

        os.makedirs(os.path.dirname(local) or "/", exist_ok=True)
        with open(local, "wb") as fh:
            fh.write(data)
        return
    fs, jpath, _ = _jvm_fs(spark, path)
    stream = fs.create(jpath, True)  # overwrite
    try:
        stream.write(bytearray(data))
    finally:
        stream.close()


def read_json(spark: SparkSession, path: str) -> dict:
    return json.loads(read_text(spark, path))


def write_json(spark: SparkSession, path: str, obj: dict) -> None:
    # no sort_keys: column_types insertion order IS the dataset's column order
    write_text(spark, path, json.dumps(obj, indent=2))
