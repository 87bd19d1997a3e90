"""The driver-facing workload: every SURVEY §2 operator (and the large-scale
pipeline extensions) as a ``(spark, sf_dir) -> DataFrame`` callable with a
DuckDB oracle SQL string.

Design notes for exact oracle parity:

- **Sums are computed in DECIMAL, surfaced as DOUBLE.** Double summation is
  order-dependent, and Spark's task order differs from DuckDB's scan order;
  decimal arithmetic is exact and associative, so both engines produce the
  identical value, and casting the same exact decimal to double is
  deterministic. Pattern: ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``.
- **Single-op float math is safe.** One IEEE754 division/multiplication of
  identical inputs is bit-identical across engines; only multi-term float
  reductions are not.
- **Every computed column is aliased identically on both sides** (the driver
  hash-compares by sorted column name).

The reference-parity queries exercise the REAL engine path: they publish the
input table through ``s3parq_spark.publish`` into a cached local dataset and
answer from ``fetch`` / the metadata-only partition-value API, so the
correctness gate covers the round-trip, not just a parquet scan.
"""

from __future__ import annotations

import os
import posixpath
import re
import shutil
import tempfile
from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .local_frames import local_rows_df
from .publish import publish_path
from .fetch import (
    fetch_diff_path,
    fetch_path,
    get_all_partition_values,
    get_diff_partition_values,
    get_max_partition_value,
)

# ---------------------------------------------------------------------------
# dataset cache: publish-through-the-engine once per (sf_dir, dataset)
# ---------------------------------------------------------------------------

#: bump when ANY logic feeding the cached datasets changes (publish write
#: path, quantizer arithmetic, build projections). The version composes
#: into the cache ROOT, so every cache site — _cached_dataset AND the
#: hand-rolled lifecycle fixtures in workload_ext/_ext2 with their own
#: markers — invalidates together in one bump, instead of silently serving
#: data written by old code against oracles replaying new code.
_CACHE_LOGIC_VERSION = "r8"

_CACHE_ROOT = os.path.join(
    tempfile.gettempdir(), f"s3parq_spark_cache_{_CACHE_LOGIC_VERSION}"
)


def _ds_path(sf_dir: str, leaf: str) -> str:
    """Cache directory for a fixture dataset of ``sf_dir`` — the ONE copy
    of the key-sanitization rule shared by all three workload modules."""
    key = re.sub(r"[^A-Za-z0-9_.-]", "_", sf_dir.strip("/"))
    return os.path.join(_CACHE_ROOT, key, leaf)


#: per-process memo of INFERRED SOURCE SCHEMAS (StructType per parquet
#: path) — metadata, never results: every query still scans the parquet.
#: Without it each `_table` reference pays a footer-read schema-inference
#: job at plan time (nation_revenue touches 6 tables → 6 serial driver
#: jobs before any work; measured ~0.9 s of the 2.4 s wall in a fresh
#: session). The engine's own fetch path already reads its schema from
#: the sidecar (S4); this is the same discipline for the direct scans.
#: Source dirs are immutable within a bench/oracle run; tests that
#: rewrite a path must not reuse a previously inferred schema, so the key
#: includes the newest data-file mtime under the path.
_SOURCE_SCHEMA_CACHE: Dict[tuple, "object"] = {}


def _source_schema(spark: SparkSession, path: str):
    try:
        mtime = os.path.getmtime(path)
        if os.path.isdir(path):
            mtime = max(
                [mtime]
                + [
                    os.path.getmtime(e.path)
                    for e in os.scandir(path)
                    if e.name.endswith(".parquet")
                ]
            )
    except OSError:
        return None
    key = (path, mtime)
    if key not in _SOURCE_SCHEMA_CACHE:
        _SOURCE_SCHEMA_CACHE[key] = spark.read.parquet(path).schema
    return _SOURCE_SCHEMA_CACHE[key]


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = posixpath.join(sf_dir, f"{name}.parquet")
    schema = _source_schema(spark, path)
    if schema is None:
        return spark.read.parquet(path)
    return spark.read.schema(schema).parquet(path)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table stores TIMESTAMP(NANOS) which Spark's parquet reader
    rejects; read the nanos as int64 (legacy conf) and rebuild a microsecond
    TimestampType column — a pure-JVM projection, no driver materialization.

    The nanosAsLong conf is DELIBERATELY left set on the session: the
    returned DataFrame is lazy, and the conf must still hold when the scan
    executes (restoring it here would break every downstream job over this
    frame). The visible side effect: other TIMESTAMP(NANOS) reads in the
    session also load as int64 instead of erroring."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = posixpath.join(sf_dir, "events.parquet")
    schema = _source_schema(spark, path)
    df = (
        spark.read.schema(schema).parquet(path)
        if schema is not None
        else spark.read.parquet(path)
    )
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # integer div: float division would round and shift some values by 1µs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) data reads as NTZ; the
        # session timezone is pinned UTC (session.py) so this cast is
        # value-preserving, and downstream epoch math (unix_micros) needs LTZ
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: per-process memo of validated fixture paths: the check exists to catch
#: CROSS-process damage (interrupted builds, external clobbering) — within
#: one process a fixture validated once stays valid (this process only
#: appends through the engine), so repeat queries skip the walk + sidecar
#: parse. Never caches a negative: a failed check triggers a rebuild,
#: after which the gate re-validates.
_FIXTURE_OK_CACHE: set = set()


def _dataset_fixture_ok(spark: SparkSession, path: str, meta=None) -> bool:
    """Marker-independent fixture validation shared by every stateful
    gate (r14, verdict #6 — the ANN `_ivf_fixture_ok` pattern
    generalized): a gate must trust the STATE, not the marker file. An
    interrupted or externally-clobbered build can leave a marker next
    to a half-valid dataset; this checks what every consumer of the
    fixture actually depends on — the sidecar parses AND every
    manifest-acknowledged data file exists on disk (spilled file-list
    manifests are hydrated by ``read_sidecar``, so the check covers
    them too). Family helpers in ``workload_ext2`` layer
    postings-geometry / ledger / quantizer-epoch checks on top.
    ``meta``: a caller's already-parsed sidecar (family helpers parse it
    once for their own schema checks — no second parse here)."""
    from . import metadata as _md

    if path in _FIXTURE_OK_CACHE:
        return True
    try:
        m = meta if meta is not None else _md.read_sidecar(spark, path)
        if m is None:
            return False
        files = m.all_files() or []
    except Exception:  # noqa: BLE001 — any unreadable state: rebuild
        return False
    ok = all(
        os.path.exists(os.path.join(path, rel)) for rel in files
    )
    if ok:
        _FIXTURE_OK_CACHE.add(path)
    return ok


def _cached_dataset(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[SparkSession, str], DataFrame],
    partitions: list,
    **publish_kwargs,
) -> str:
    """Publish ``build(...)`` through the engine into a cached dataset dir;
    reuse across queries in the same driver run. The marker carries
    ``_CACHE_LOGIC_VERSION`` so logic changes invalidate stale caches
    instead of silently serving their output."""
    path = _ds_path(sf_dir, name)
    marker = os.path.join(path, "_PUBLISHED")
    stamp = None
    if os.path.exists(marker):
        with open(marker) as fh:
            stamp = fh.read().strip()
    if stamp != _CACHE_LOGIC_VERSION or not _dataset_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        publish_path(
            spark, path, build(spark, sf_dir), partitions, mode="overwrite",
            **publish_kwargs,
        )
        with open(marker, "w") as fh:
            fh.write(_CACHE_LOGIC_VERSION)
    return path


def _li_flag_ds(spark, sf_dir):
    return _cached_dataset(
        spark, sf_dir, "li_flag",
        lambda s, d: _table(s, d, "lineitem"),
        ["l_returnflag", "l_linestatus"],
    )


def _li_linenumber_ds(spark, sf_dir):
    return _cached_dataset(
        spark, sf_dir, "li_linenumber",
        lambda s, d: _table(s, d, "lineitem"),
        ["l_linenumber"],
    )


def _li_discount_ds(spark, sf_dir):
    return _cached_dataset(
        spark, sf_dir, "li_discount",
        lambda s, d: _table(s, d, "lineitem"),
        ["l_discount"],
    )


def _li_month_ds(spark, sf_dir):
    return _cached_dataset(
        spark, sf_dir, "li_month",
        lambda s, d: _table(s, d, "lineitem").withColumn(
            "ship_month", F.date_trunc("month", F.col("l_shipdate"))
        ),
        ["ship_month"],
    )


def _li_highvalue_ds(spark, sf_dir):
    return _cached_dataset(
        spark, sf_dir, "li_highvalue",
        lambda s, d: _table(s, d, "lineitem").withColumn(
            "high_value", F.col("l_quantity") > 25
        ),
        ["high_value"],
    )


def _orders_prio_ds(spark, sf_dir):
    return _cached_dataset(
        spark, sf_dir, "orders_prio",
        lambda s, d: _table(s, d, "orders"),
        ["o_orderpriority"],
    )


def _orders_prio_subset_ds(spark, sf_dir):
    return _cached_dataset(
        spark, sf_dir, "orders_prio_subset",
        lambda s, d: _table(s, d, "orders").filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        ),
        ["o_orderpriority"],
    )


# ---------------------------------------------------------------------------
# reference-parity queries (SURVEY §2.1-2.3) — through publish→fetch
# ---------------------------------------------------------------------------

def q_fetch_all(spark, sf_dir):
    """S5/S6 round-trip: publish partitioned, fetch everything back."""
    return fetch_path(spark, _li_flag_ds(spark, sf_dir))


def q_fetch_filter_eq(spark, sf_dir):
    """F5 pruning, `==` single value (cite fetch_parq.py:450-498)."""
    return fetch_path(
        spark,
        _li_flag_ds(spark, sf_dir),
        filters=[{"partition": "l_returnflag", "comparison": "==", "values": ["R"]}],
    )


def q_fetch_filter_in(spark, sf_dir):
    """F5 pruning, `==` OR-across-values."""
    return fetch_path(
        spark,
        _li_flag_ds(spark, sf_dir),
        filters=[
            {"partition": "l_returnflag", "comparison": "==", "values": ["R", "A"]},
            {"partition": "l_linestatus", "comparison": "==", "values": ["F"]},
        ],
    )


def q_fetch_filter_neq(spark, sf_dir):
    return fetch_path(
        spark,
        _li_flag_ds(spark, sf_dir),
        filters=[{"partition": "l_returnflag", "comparison": "!=", "values": ["N"]}],
    )


def q_fetch_filter_gt(spark, sf_dir):
    """F5 pruning with an orderable integer partition."""
    return fetch_path(
        spark,
        _li_linenumber_ds(spark, sf_dir),
        filters=[{"partition": "l_linenumber", "comparison": ">", "values": [4]}],
    )


def q_fetch_filter_float_eq(spark, sf_dir):
    """Float partition values round-trip through path strings (T1)."""
    return fetch_path(
        spark,
        _li_discount_ds(spark, sf_dir),
        filters=[{"partition": "l_discount", "comparison": "==", "values": [0.05]}],
    )


def q_fetch_filter_datetime(spark, sf_dir):
    """Datetime partition: '%Y-%m-%d %H:%M:%S' path values stay timestamps."""
    return fetch_path(
        spark,
        _li_month_ds(spark, sf_dir),
        filters=[
            {"partition": "ship_month", "comparison": ">=",
             "values": ["1998-01-01 00:00:00"]}
        ],
    )


def q_fetch_filter_bool(spark, sf_dir):
    """Boolean partition: strtobool path-value semantics."""
    return fetch_path(
        spark,
        _li_highvalue_ds(spark, sf_dir),
        filters=[{"partition": "high_value", "comparison": "==", "values": [True]}],
    )


def q_partition_values(spark, sf_dir):
    """A1 metadata-only distinct (fetch_parq.py:49-70): answered from the
    file listing, zero row I/O."""
    vals = get_all_partition_values(_li_flag_ds(spark, sf_dir), "", "l_returnflag", spark=spark)
    return local_rows_df(spark, [(v,) for v in vals], "l_returnflag string")


def q_partition_max(spark, sf_dir):
    """A2 metadata-only max (fetch_parq.py:121-149)."""
    m = get_max_partition_value(_li_linenumber_ds(spark, sf_dir), "", "l_linenumber", spark=spark)
    return local_rows_df(spark, [(int(m),)], "max_linenumber bigint")


def q_partition_diff_values(spark, sf_dir):
    """A3 set-difference over partition values (fetch_parq.py:73-118)."""
    vals = get_diff_partition_values(
        _li_flag_ds(spark, sf_dir), "", "l_returnflag", ["A", "N"], spark=spark
    )
    return local_rows_df(spark, [(v,) for v in vals], "l_returnflag string")


def q_fetch_diff(spark, sf_dir):
    """A4 dataset anti-join by partition (fetch_parq.py:233-280) as one
    broadcast left-anti plan."""
    return fetch_diff_path(
        spark,
        _orders_prio_ds(spark, sf_dir),
        _orders_prio_subset_ds(spark, sf_dir),
        "o_orderpriority",
    )


def q_fetch_diff_reverse(spark, sf_dir):
    """A4 reversed (fetch_parq.py:277-280): rows of the COMPARISON dataset
    whose partition values are absent from the input dataset."""
    return fetch_diff_path(
        spark,
        _orders_prio_subset_ds(spark, sf_dir),
        _orders_prio_ds(spark, sf_dir),
        "o_orderpriority",
        reverse=True,
    )


def _li_decimal_ds(spark, sf_dir):
    """custom_publish (S9): explicit DECIMAL(18,2) overlay on the price
    columns, published through the engine (publish_parq.py:576-677)."""
    def build(s, d):
        return _table(s, d, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_returnflag",
            "l_extendedprice", "l_discount",
        )

    return _cached_dataset(
        spark, sf_dir, "li_decimal", build, ["l_returnflag"],
        custom_types={
            "l_extendedprice": "decimal(18,2)",
            "l_discount": "decimal(18,2)",
        },
    )


def q_fetch_decimal(spark, sf_dir):
    """Decimal round-trip through custom_publish → fetch: values come back
    as exact DECIMAL(18,2), surfaced as double for the comparator."""
    df = fetch_path(
        spark,
        _li_decimal_ds(spark, sf_dir),
        filters=[{"partition": "l_returnflag", "comparison": "==", "values": ["A"]}],
    )
    return df.select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_discount").cast("double").alias("discount"),
    )


# ---------------------------------------------------------------------------
# analytics (capabilities Spark adds for free — SURVEY §2.6)
# ---------------------------------------------------------------------------

def _dec(col, scale=2):
    return F.col(col).cast(f"decimal(18,{scale})")


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: grouped aggregation with exact decimal sums."""
    li = _table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
        )
    )


#: broadcast the BUILDING-orders probe side when the UNFILTERED orders
#: source is at most this many compressed bytes (the ~1/5 surviving
#: slice then sits well inside broadcast limits); larger sources leave
#: the strategy to the planner/AQE (guide §3.1 — scale-conditional, not
#: local-tuned)
_Q3_BROADCAST_SOURCE_BYTES = 64 * 1024 * 1024


def _source_total_bytes(df) -> Optional[int]:
    """Total compressed bytes of a frame's LOCAL source files, zero Spark
    jobs; None for remote schemes or unlistable plans (callers must treat
    None as 'big')."""
    import os as _os
    from urllib.parse import urlparse

    try:
        total = 0
        files = df.inputFiles()
        if not files:
            return None
        for f in files:
            u = urlparse(f)
            if u.scheme not in ("file", ""):
                return None
            total += _os.path.getsize(u.path)
        return total
    except Exception:
        return None


def q_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join, grouped revenue, deterministic top-k.

    r16 (guide §3.1/§3.2): the selective side joins FIRST — orders ⋈
    broadcast(BUILDING customers) drops ~4/5 of orders before lineitem
    is probed, so the big fact table joins against the reduced side
    (inner joins commute; results identical, pinned by the oracle and
    A/B'd equal). When the orders source is footer-priced small enough,
    the reduced side is explicitly broadcast (estimates after a join are
    unreliable, guide §3.1) — lineitem is then never shuffled at all;
    at larger scales the hint is withheld and the planner/AQE (plus the
    runtime bloom-filter injection) picks the strategy. Interleaved A/B:
    sf0.1 0.69-0.71 -> 0.61-0.66 s, sf1 1.33-1.58 -> 0.78-0.94 s."""
    cust = _table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    ob = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    src = _source_total_bytes(orders)
    probe = (
        F.broadcast(ob)
        if src is not None and src <= _Q3_BROADCAST_SOURCE_BYTES
        else ob
    )
    rev = (
        li.join(probe, li.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )
    return rev.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10)


def q_nation_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 5-way join with broadcast dims, grouped by nation.

    Join order puts the SELECTIVE side first: region(ASIA) restricts
    nation, nation restricts supplier, and lineitem ⋈ supplier then drops
    ~4/5 of lineitem before the orders/customer joins probe it — every
    later join (and at real scale, every later shuffle) sees 5x fewer
    rows. Inner joins commute, so the result is unchanged (A/B'd equal;
    0.40 → 0.32 s interleaved at sf0.1)."""
    region = _table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _table(spark, sf_dir, "nation")
    cust = _table(spark, sf_dir, "customer")
    supp = _table(spark, sf_dir, "supplier")
    orders = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    nat_asia = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    supp_asia = supp.join(
        F.broadcast(nat_asia.select("n_nationkey", "n_name")),
        supp.s_nationkey == F.col("n_nationkey"),
    )
    return (
        li.join(supp_asia, li.l_suppkey == supp_asia.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


def q_topk_orders(spark, sf_dir):
    """Top-k with deterministic tie-break."""
    return (
        _table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_window_top_orders(spark, sf_dir):
    """Window function: latest 3 orders per customer."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
    return (
        _table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_orderdate", "rn")
    )


def q_rollup_pricing(spark, sf_dir):
    """ROLLUP grouping sets."""
    return (
        _table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q_events_tumbling(spark, sf_dir):
    """Tumbling 1-hour windowed aggregation over the event stream table."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


def q_events_json(spark, sf_dir):
    """Semi-structured extraction: JSON props → typed column → aggregate."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("k", F.get_json_object(F.col("props"), "$.k").cast("bigint"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("k").alias("sum_k"))
    )


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # reference parity (publish→fetch round trips)
    "fetch_all": q_fetch_all,
    "fetch_filter_eq": q_fetch_filter_eq,
    "fetch_filter_in": q_fetch_filter_in,
    "fetch_filter_neq": q_fetch_filter_neq,
    "fetch_filter_gt": q_fetch_filter_gt,
    "fetch_filter_float_eq": q_fetch_filter_float_eq,
    "fetch_filter_datetime": q_fetch_filter_datetime,
    "fetch_filter_bool": q_fetch_filter_bool,
    "partition_values": q_partition_values,
    "partition_max": q_partition_max,
    "partition_diff_values": q_partition_diff_values,
    "fetch_diff": q_fetch_diff,
    # analytics
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "nation_revenue": q_nation_revenue,
    "topk_orders": q_topk_orders,
    "window_top_orders": q_window_top_orders,
    "rollup_pricing": q_rollup_pricing,
    "events_tumbling": q_events_tumbling,
    "events_json": q_events_json,
}

QUERIES.update(
    {
        "fetch_diff_reverse": q_fetch_diff_reverse,
        "fetch_decimal": q_fetch_decimal,
    }
)

_REV = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)

ORACLE_SQL: Dict[str, str] = {
    "fetch_all": "SELECT * FROM lineitem",
    "fetch_filter_eq": "SELECT * FROM lineitem WHERE l_returnflag = 'R'",
    "fetch_filter_in": (
        "SELECT * FROM lineitem WHERE l_returnflag IN ('R','A') "
        "AND l_linestatus = 'F'"
    ),
    "fetch_filter_neq": "SELECT * FROM lineitem WHERE l_returnflag <> 'N'",
    "fetch_filter_gt": "SELECT * FROM lineitem WHERE l_linenumber > 4",
    "fetch_filter_float_eq": "SELECT * FROM lineitem WHERE l_discount = 0.05",
    "fetch_filter_datetime": (
        "SELECT *, CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month "
        "FROM lineitem "
        "WHERE date_trunc('month', l_shipdate) >= TIMESTAMP '1998-01-01'"
    ),
    "fetch_filter_bool": (
        "SELECT *, l_quantity > 25 AS high_value FROM lineitem WHERE l_quantity > 25"
    ),
    "partition_values": "SELECT DISTINCT l_returnflag FROM lineitem",
    "partition_max": (
        "SELECT CAST(max(l_linenumber) AS BIGINT) AS max_linenumber FROM lineitem"
    ),
    "partition_diff_values": (
        "SELECT DISTINCT l_returnflag FROM lineitem "
        "WHERE l_returnflag NOT IN ('A','N')"
    ),
    "fetch_diff": (
        "SELECT * FROM orders WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')"
    ),
    "fetch_diff_reverse": (
        "SELECT * FROM orders WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')"
    ),
    "fetch_decimal": """
        SELECT l_orderkey, l_linenumber, l_returnflag,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
               CAST(CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS discount
        FROM lineitem WHERE l_returnflag = 'A'
    """,
    "pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               {_REV} AS sum_disc_price,
               COUNT(*) AS count_order,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_revenue_orders": f"""
        SELECT o_orderkey, o_orderdate, {_REV} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "nation_revenue": f"""
        SELECT n_name, {_REV} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
        GROUP BY n_name
    """,
    "topk_orders": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"
    ),
    "window_top_orders": """
        SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate DESC, o_orderkey ASC) AS INT) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    "rollup_pricing": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "events_tumbling": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "events_json": """
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(k) AS BIGINT) AS sum_k FROM (
            SELECT event_type,
                   CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k
            FROM events
        ) WHERE k > 50
        GROUP BY event_type
    """,
}


# ---------------------------------------------------------------------------
# large-scale pipeline operators (dedup / similarity / text / multimodal /
# streaming) — SURVEY §7.4 north-star extensions
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    """Exact dedup with deterministic winner over a corpus with real
    duplicates (the table union'd with itself)."""
    from .operators import exact_dedup

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionAll(docs)
    return exact_dedup(doubled, ["text"], id_col="doc_id").select(
        "doc_id", "text", "n_copies"
    )


def q_doc_fingerprint(spark, sf_dir):
    from .operators import document_fingerprint

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return document_fingerprint(docs, "text").select("doc_id", "fingerprint")


def q_token_stats(spark, sf_dir):
    from .operators import token_stats

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return token_stats(docs, "text").select("doc_id", "n_tokens_ws", "n_tokens_re")


def q_text_quality(spark, sf_dir):
    from .operators import quality_scores

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_scores(docs, "text").select(
        "doc_id", "n_chars", "n_words", "n_punct", "n_stopwords",
        "mean_word_len", "punct_ratio", "stopword_ratio",
    )


def q_lang_id(spark, sf_dir):
    from .operators import language_id

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return language_id(docs, "text").select(
        "doc_id", "score_en", "score_de", "score_es", "score_fr", "predicted_lang"
    )


def q_neardup_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs at threshold 0.8 (planted
    near-dups in the documents table sit at ~0.99)."""
    from .operators import ngram_jaccard_pairs

    docs = _table(spark, sf_dir, "documents")
    # broadcast_verify: the documents corpus's shingle arrays are dim-sized
    # here; at real scale leave it to the shuffle-join path
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8, broadcast_verify=True
    )


def q_minhash_pairs(spark, sf_dir):
    """MinHash-LSH candidates + exact Jaccard verify (operators/dedup.py
    minhash_neardup_pairs): candidate generation is the banded LSH equi-join,
    the verify stage makes the emitted set the exact-Jaccard pair set — so
    the exact all-pairs SQL is the oracle."""
    from .operators import minhash_neardup_pairs

    docs = _table(spark, sf_dir, "documents")
    return minhash_neardup_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.8,
        broadcast_verify=True,
    )


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs with TRUE simhash semantics (banded candidate
    equi-join + exact Hamming verify). Oracle-checkable the same way as
    ivf_topk: the token hash is portable (first 60 bits of md5, identical in
    any engine), so the DuckDB oracle replicates the whole pipeline —
    fingerprint, banding, Hamming filter — in SQL."""
    from .operators import simhash_candidate_pairs

    docs = _table(spark, sf_dir, "documents")
    out = simhash_candidate_pairs(
        docs, "doc_id", "text", bits=60, bands=4, max_hamming=6,
        portable_hash=True,
    )
    return out.select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-10 against the vec_id=0 embedding."""
    from .operators import brute_force_cosine_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    top = brute_force_cosine_topk(emb, "vec_id", "embedding", q, k=10)
    return top.select("vec_id", F.round("cosine", 6).alias("cosine"))


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: text→binary payload, Arrow-batched mapInPandas
    feature extraction (decode step stubbed; see operators/multimodal.py)."""
    from .operators import attach_binary_payload, extract_binary_features

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = attach_binary_payload(docs, "text")
    feats = extract_binary_features(payloads, "doc_id")
    return feats.select("doc_id", "byte_len", "first_byte")


def q_frame_sample(spark, sf_dir):
    """Multimodal 1→N frame sampling over mapInPandas (operators/
    multimodal.py sample_video_frames): the deterministic fake demux emits
    ≤4 16-byte slices per payload, so even the stub path is oracle-checkable
    (frame lengths + timestamps, not the opaque bytes)."""
    from .operators import attach_binary_payload, sample_video_frames

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = attach_binary_payload(docs, "text")
    frames = sample_video_frames(payloads, "doc_id", every_ms=1000)
    return frames.select(
        "doc_id",
        "frame_ts_ms",
        F.length("frame").cast("int").alias("frame_len"),
    )


def q_audio_features(spark, sf_dir):
    """Audio-modality plumbing (operators/multimodal.py
    audio_window_features): payload → per-window integer-exact energy/peak
    via Arrow-batched 1→N mapInPandas. The u8-PCM interpretation is real
    for raw PCM and deterministic for the text payloads used here; the
    oracle recomputes the same windows from character codes."""
    from .operators import attach_binary_payload, audio_window_features

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = attach_binary_payload(docs, "text")
    return audio_window_features(payloads, "doc_id", window_samples=32)


def q_events_sessionize(spark, sf_dir):
    """Session windows (30 min gap) per user over events."""
    from .streaming import sessionize_events

    ev = _events(spark, sf_dir)
    return sessionize_events(ev, gap="30 minutes")


def q_events_stream_tumbling(spark, sf_dir):
    """The SAME tumbling aggregation as events_tumbling but executed as a
    Structured Streaming query (availableNow trigger, memory sink) — checked
    against the identical batch oracle."""
    import posixpath as pp

    from .streaming import run_streaming_tumbling_counts

    return run_streaming_tumbling_counts(
        spark, pp.join(sf_dir, "events.parquet"), window="1 hour"
    )


QUERIES.update(
    {
        "dedup_exact": q_dedup_exact,
        "doc_fingerprint": q_doc_fingerprint,
        "token_stats": q_token_stats,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "neardup_jaccard": q_neardup_jaccard,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "ann_topk": q_ann_topk,
        "media_features": q_media_features,
        "frame_sample": q_frame_sample,
        "audio_features": q_audio_features,
        "events_sessionize": q_events_sessionize,
        "events_stream_tumbling": q_events_stream_tumbling,
    }
)

_SUBWORD_RE = r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"
_STOP_EN = r"\b(the|and|of|to|a|in|is|that)\b"

ORACLE_SQL.update(
    {
        "dedup_exact": """
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text,
                   COUNT(*) AS n_copies
            FROM (SELECT doc_id, text FROM documents
                  UNION ALL SELECT doc_id, text FROM documents)
            GROUP BY text
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "token_stats": f"""
            SELECT doc_id,
                   CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens_ws,
                   CAST(len(regexp_extract_all(text, '{_SUBWORD_RE}', 1)) AS BIGINT) AS n_tokens_re
            FROM documents
        """,
        "text_quality": f"""
            SELECT doc_id, n_chars, n_words, n_punct, n_stopwords,
                   (n_chars - (n_words - 1)) / n_words AS mean_word_len,
                   CASE WHEN n_chars > 0 THEN n_punct / n_chars
                        ELSE 0.0 END AS punct_ratio,
                   n_stopwords / n_words AS stopword_ratio
            FROM (
                SELECT doc_id,
                       CAST(length(text) AS BIGINT) AS n_chars,
                       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
                       CAST(len(regexp_extract_all(text, '([.,;:!?])', 1)) AS BIGINT) AS n_punct,
                       CAST(len(regexp_extract_all(lower(text), '{_STOP_EN}', 1)) AS BIGINT) AS n_stopwords
                FROM documents
            )
        """,
        "lang_id": """
            SELECT doc_id, score_en, score_de, score_es, score_fr,
                   CASE
                     WHEN score_en >= score_de AND score_en >= score_es
                          AND score_en >= score_fr AND score_en > 0 THEN 'en'
                     WHEN score_de >= score_es AND score_de >= score_fr
                          AND score_de > 0 THEN 'de'
                     WHEN score_es >= score_fr AND score_es > 0 THEN 'es'
                     WHEN score_fr > 0 THEN 'fr'
                     ELSE 'und'
                   END AS predicted_lang
            FROM (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a|in|is|that)\\b', 1)) AS INT) AS score_en,
                       CAST(len(regexp_extract_all(lower(text), '\\b(der|die|das|und|ist|nicht|ein)\\b', 1)) AS INT) AS score_de,
                       CAST(len(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|los|una)\\b', 1)) AS INT) AS score_es,
                       CAST(len(regexp_extract_all(lower(text), '\\b(le|la|les|et|des|un|une)\\b', 1)) AS INT) AS score_fr
                FROM documents
            )
        """,
        "neardup_jaccard": """
            -- shared by neardup_jaccard / minhash_pairs / simhash_pairs:
            -- all three emit the exact 3-gram Jaccard pair set at t=0.8,
            -- differing only in how candidates are generated
            WITH words AS (
              SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
              FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
                    FROM documents)
            ), sh AS (
              SELECT DISTINCT doc_id,
                     w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS shingle
              FROM words
              WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
              QUALIFY lead(w, 2) OVER win IS NOT NULL
            ), sizes AS (
              SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   n_common / (sa.n + sb.n - n_common) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE n_common / (sa.n + sb.n - n_common) >= 0.8
        """,
        "minhash_pairs": None,  # filled below: same exact-Jaccard SQL
        "simhash_pairs": None,
        "ann_topk": """
            SELECT vec_id,
                   round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv), 6) AS cosine
            FROM embeddings,
                 (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0) q
            WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv) DESC, vec_id ASC
            LIMIT 10
        """,
        "media_features": """
            SELECT doc_id,
                   CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
                   CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte
            FROM documents
        """,
        "frame_sample": """
            WITH d AS (
              SELECT doc_id, octet_length(CAST(text AS BLOB)) AS len
              FROM documents
            )
            SELECT doc_id,
                   CAST(i * 1000 AS BIGINT) AS frame_ts_ms,
                   CAST(least(16, len - i * 16) AS INT) AS frame_len
            FROM d, (VALUES (0), (1), (2), (3)) AS t(i)
            WHERE i < greatest(1, least(4, len // 16))
        """,
        "audio_features": """
            WITH w AS (
              SELECT doc_id, text,
                     unnest(generate_series(0,
                       CAST(floor((length(text) - 1) / 32.0) AS INT)))
                       AS window_id
              FROM documents
            ), s AS (
              SELECT doc_id, window_id, text,
                     unnest(generate_series(1, 32)) AS off
              FROM w
            ), b AS (
              SELECT doc_id, window_id,
                     ascii(substr(text, window_id * 32 + off, 1)) AS v
              FROM s WHERE window_id * 32 + off <= length(text)
            )
            SELECT doc_id,
                   CAST(window_id AS INT) AS window_id,
                   CAST(COUNT(*) AS INT) AS n_samples,
                   CAST(SUM(v * v) AS BIGINT) AS energy,
                   CAST(MAX(v) AS INT) AS peak
            FROM b GROUP BY doc_id, window_id
        """,
        "events_sessionize": """
            WITH typed AS (
              SELECT user_id, make_timestamp(epoch_us(ts)) AS ts, value FROM events
            ), flagged AS (
              SELECT user_id, ts, value,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
              FROM typed
            ), numbered AS (
              SELECT user_id, ts, value,
                     SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS session_no
              FROM flagged
            )
            SELECT min(ts) AS session_start,
                   max(ts) + INTERVAL 30 MINUTE AS session_end,
                   user_id,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM numbered
            GROUP BY user_id, session_no
        """,
        "events_stream_tumbling": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
    }
)

# minhash_pairs emits the exact verified pair set (LSH only accelerates
# candidate generation), so the exact all-pairs Jaccard SQL is its oracle
ORACLE_SQL["minhash_pairs"] = ORACLE_SQL["neardup_jaccard"]

# simhash_pairs keeps true simhash semantics; the oracle replicates the
# deterministic pipeline (portable md5-60-bit token hash → ±1 bit sums →
# fingerprint → 4×15-bit banding → Hamming ≤ 6) entirely in SQL
ORACLE_SQL["simhash_pairs"] = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ), h AS (
      SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
      FROM toks
    ), bitsums AS (
      SELECT doc_id, b.b,
             SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT unnest(range(60)) AS b) b
      GROUP BY doc_id, b.b
    ), fp AS (
      SELECT doc_id,
             SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
               AS simhash
      FROM bitsums GROUP BY doc_id
    ), banded AS (
      SELECT doc_id, simhash, b.b AS band_id,
             (simhash >> (b.b * 15)) & 32767 AS chunk
      FROM fp CROSS JOIN (SELECT unnest(range(4)) AS b) b
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sa, b.simhash AS sb
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 6
"""


# ---------------------------------------------------------------------------
# set operations / grouping sets / pivot / scalar functions (SURVEY §2.6:
# capabilities the reference lacks, surfaced as first-class queries)
# ---------------------------------------------------------------------------

def q_union_distinct(spark, sf_dir):
    li = _table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .union(li.filter(F.col("l_linestatus") == "O"))
        .distinct()
    )


def q_intersect_nations(spark, sf_dir):
    cust = _table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = _table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp)


def q_except_nations(spark, sf_dir):
    cust = _table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = _table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.subtract(supp)  # EXCEPT DISTINCT (exceptAll = multiset minus)


def q_cube_pricing(spark, sf_dir):
    return (
        _table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q_pivot_status(spark, sf_dir):
    """Pivot l_linestatus into columns (explicit value list → deterministic
    schema, required at scale to avoid a driver-side distinct)."""
    return (
        _table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(_dec("l_quantity")).cast("double"))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    )


def q_scalar_functions(spark, sf_dir):
    """String/date/math/conditional scalar coverage, all single-op
    deterministic."""
    o = _table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.upper("o_orderpriority").alias("pri_up"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("lab"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        F.length("o_orderstatus").cast("int").alias("status_len"),
    )


def q_emb_neardup(spark, sf_dir):
    """Embedding near-dup pairs: label-blocked (equi-join on label, never a
    full cross join) cosine >= 0.4."""
    from .operators.similarity import cosine_similarity

    emb = _table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label"), F.col("embedding").cast("array<double>").alias("v")
    )
    a, b = emb.alias("a"), emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    return (
        pairs.withColumn("cosine", cosine_similarity(F.col("a.v"), F.col("b.v")))
        .filter(F.col("cosine") >= 0.4)
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


QUERIES.update(
    {
        "union_distinct": q_union_distinct,
        "intersect_nations": q_intersect_nations,
        "except_nations": q_except_nations,
        "cube_pricing": q_cube_pricing,
        "pivot_status": q_pivot_status,
        "scalar_functions": q_scalar_functions,
        "emb_neardup": q_emb_neardup,
    }
)

ORACLE_SQL.update(
    {
        "union_distinct": """
            SELECT DISTINCT * FROM (
                SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
                FROM lineitem WHERE l_returnflag = 'R'
                UNION ALL
                SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
                FROM lineitem WHERE l_linestatus = 'O'
            )
        """,
        "intersect_nations": """
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT
            SELECT s_nationkey AS nationkey FROM supplier
        """,
        "except_nations": """
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT
            SELECT s_nationkey AS nationkey FROM supplier
        """,
        "cube_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   COUNT(*) AS n_rows
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "pivot_status": """
            SELECT l_returnflag,
                   CAST(SUM(CASE WHEN l_linestatus = 'F'
                        THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
                   CAST(SUM(CASE WHEN l_linestatus = 'O'
                        THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
            FROM lineitem
            GROUP BY l_returnflag
        """,
        "scalar_functions": """
            SELECT o_orderkey,
                   CAST(year(o_orderdate) AS INT) AS y,
                   CAST(month(o_orderdate) AS INT) AS m,
                   upper(o_orderpriority) AS pri_up,
                   substr(o_orderpriority, 1, 1) AS pri_code,
                   concat_ws('-', o_orderstatus, o_orderpriority) AS lab,
                   CASE WHEN o_totalprice > 200000 THEN 'big'
                        WHEN o_totalprice > 100000 THEN 'mid'
                        ELSE 'small' END AS size_class,
                   CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
                   sqrt(o_totalprice) AS price_sqrt,
                   CAST(length(o_orderstatus) AS INT) AS status_len
            FROM orders
        """,
        "emb_neardup": """
            WITH e AS (
              SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            )
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.4
        """,
    }
)


def q_quantiles(spark, sf_dir):
    """Exact percentiles (percentile_cont semantics) per group."""
    return (
        _table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("median_qty"),
            F.percentile("l_quantity", 0.9).alias("p90_qty"),
            F.percentile("l_extendedprice", 0.5).alias("median_price"),
        )
    )


QUERIES["quantiles"] = q_quantiles
ORACLE_SQL["quantiles"] = """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_cont(l_extendedprice, 0.5) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
"""


def q_asof_clicks(spark, sf_dir):
    """As-of join: for every purchase event, the user's latest click at or
    before it (operators/joins.py asof_join — one shuffle-sort, no range
    explosion)."""
    from .operators.joins import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    return asof_join(
        purchases, clicks, on=["user_id"], left_ts="purchase_ts", right_ts="click_ts"
    )


def q_distinct_counts(spark, sf_dir):
    """Exact distinct aggregates (expand-based distinct count)."""
    return (
        _table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q_events_sliding(spark, sf_dir):
    """Sliding windows (1 hour window, 30 minute slide) — each event lands in
    two windows."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


QUERIES.update(
    {
        "asof_clicks": q_asof_clicks,
        "distinct_counts": q_distinct_counts,
        "events_sliding": q_events_sliding,
    }
)

ORACLE_SQL.update(
    {
        "asof_clicks": """
            WITH typed AS (
              SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id, event_type
              FROM events
            ), p AS (
              SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
              FROM typed WHERE event_type = 'purchase'
            ), c AS (
              SELECT user_id, ts AS click_ts, event_id AS click_id
              FROM typed WHERE event_type = 'click'
            )
            SELECT p.user_id, p.purchase_ts, p.purchase_id, c.click_ts, c.click_id
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND c.click_ts <= p.purchase_ts
        """,
        "distinct_counts": """
            SELECT l_returnflag,
                   COUNT(DISTINCT l_partkey) AS n_parts,
                   COUNT(DISTINCT l_suppkey) AS n_supps,
                   COUNT(*) AS n_rows
            FROM lineitem
            GROUP BY l_returnflag
        """,
        "events_sliding": """
            WITH typed AS (
              SELECT make_timestamp(epoch_us(ts)) AS ts, event_type, value FROM events
            ), windows AS (
              SELECT unnest([
                       make_timestamp((epoch_us(ts) // 1800000000) * 1800000000),
                       make_timestamp((epoch_us(ts) // 1800000000) * 1800000000)
                         - INTERVAL 30 MINUTE
                     ]) AS window_start,
                     event_type, value
              FROM typed
            )
            SELECT window_start, event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM windows
            GROUP BY 1, 2
        """,
    }
)


def q_order_item_arrays(spark, sf_dir):
    """Nested types (reference has none — SURVEY §1.3/§1.5): per-order array
    of quantities via collect_list → sort_array → element_at. Only
    order-independent scalars are surfaced (size, first/last of the sorted
    array), so the result is deterministic under Spark's task ordering."""
    li = _table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_quantity")).alias("qtys"))
        .select(
            "l_orderkey",
            F.size("qtys").cast("int").alias("n_items"),
            F.element_at("qtys", 1).alias("min_qty"),
            F.element_at("qtys", -1).alias("max_qty"),
        )
    )


QUERIES["order_item_arrays"] = q_order_item_arrays
ORACLE_SQL["order_item_arrays"] = """
    SELECT l_orderkey,
           CAST(len(qtys) AS INT) AS n_items,
           qtys[1] AS min_qty,
           qtys[-1] AS max_qty
    FROM (SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
          FROM lineitem GROUP BY l_orderkey)
"""


def q_semi_join(spark, sf_dir):
    """Left-semi join (EXISTS): orders having a high-quantity lineitem."""
    orders = _table(spark, sf_dir, "orders")
    big = _table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return orders.join(
        big, orders.o_orderkey == big.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


def q_anti_join(spark, sf_dir):
    """Left-anti join (NOT EXISTS): customers with no finished ('F') orders.

    The filter is applied to the right side *before* the anti-join so Catalyst
    can push it into the scan; the build side stays small enough to broadcast.
    """
    cust = _table(spark, sf_dir, "customer")
    f_orders = _table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        f_orders, cust.c_custkey == f_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS with grouping_id disambiguation."""
    li = _table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


QUERIES.update(
    {
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "grouping_sets": q_grouping_sets,
    }
)


def q_order_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS (semi-join with a non-equi term —
    lineitems shipped >60 days after the order date) then grouped counts.
    Catalyst plans the compound condition as a semi hash-join with the date
    predicate as a post-join filter; no decorrelation machinery needed."""
    orders = _table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = _table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: scalar aggregate subquery — lineitems below 20% of
    their part's average quantity, restricted to one brand. The per-part
    average is a grouped agg joined back (what Catalyst's decorrelation
    produces); the brand dim filter is broadcast and applied BEFORE the
    avg-join so only ~1/25 of parts flow into the shuffle."""
    li = _table(spark, sf_dir, "lineitem")
    brand = _table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    li_b = li.join(F.broadcast(brand), li.l_partkey == F.col("p_partkey")).drop(
        "p_partkey"
    )
    pa = li_b.groupBy("l_partkey").agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li_b.join(pa, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


def q_window_running(spark, sf_dir):
    """Window-function suite: rank, lag, and a running (prefix) sum per
    customer — the running sum in exact decimal so every prefix is
    order-independent-reproducible, surfaced as double."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("int").alias("rnk"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.sum(_dec("o_totalprice"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_spend"),
    )


def q_band_join(spark, sf_dir):
    """Range (band) join: orders against a small interval dimension via a
    broadcast theta-join — the scalable plan for value-range classification
    (a shuffle range-join would be wrong for a 3-row dim)."""
    bands = local_rows_df(
        spark,
        [
            ("low", 0.0, 100_000.0),
            ("mid", 100_000.0, 200_000.0),
            ("high", 200_000.0, 10_000_000.0),
        ],
        "band string, lo double, hi double",
    )
    o = _table(spark, sf_dir, "orders")
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= F.col("lo")) & (o.o_totalprice < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        )
    )


def q_salted_revenue(spark, sf_dir):
    """Skew-mitigated equi-join (operators/joins.py salted_join): lineitem
    salted into 8 sub-keys, the part dim exploded 8× — semantically identical
    to the plain join, so the plain-join SQL is the oracle."""
    from .operators.joins import salted_join

    li = _table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"), "l_extendedprice", "l_discount"
    )
    pt = _table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey"), "p_brand"
    )
    return (
        salted_join(li, pt, on=["partkey"], salt_buckets=8)
        .groupBy("p_brand")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_ivf_topk(spark, sf_dir):
    """IVF ANN top-10 (operators/similarity.py ivf_topk): 16-cell kmeans
    coarse quantizer (deterministic Lloyd's — init = 16 lowest-id vectors,
    2 assign+mean rounds with exact-decimal means), 4 probed cells. Every
    step is deterministic, so even the APPROXIMATE result is
    oracle-checkable — the DuckDB oracle replays the two Lloyd iterations
    (same decimal(30,12) sums), the probe selection, and the in-cell exact
    search."""
    from .operators import ivf_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    top = ivf_topk(
        emb, "vec_id", "embedding", q, k=10, n_cells=16, n_probe=4,
        quantizer="kmeans", kmeans_iters=2,
    )
    return top.select("vec_id", F.round("cosine", 6).alias("cosine"))


def q_ivf_batch_topk(spark, sf_dir):
    """Batch IVF ANN (operators/similarity.py ivf_batch_topk): top-5 for
    each of 4 query vectors against the 16-cell kmeans index in ONE plan —
    probe-cell selection is a JVM array-sort per query row (no driver
    collect of query vectors), candidates come from the probe-cell
    equi-join, ranking is per-query WindowGroupLimit. The oracle replays
    the two Lloyd iterations, per-query probe selection, and in-cell
    search."""
    from .operators import ivf_batch_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    top = ivf_batch_topk(
        emb, "vec_id", "embedding", q, k=5, n_cells=16, n_probe=4,
        quantizer="kmeans", kmeans_iters=2,
    )
    return top.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine")
    )


def _ivf_kmeans_cte(
    source: str = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
) -> str:
    """Shared oracle CTE: deterministic 2-iteration Lloyd's over ``source``
    (init = 16 lowest-id vectors) ending in centroids ``c2`` and final cell
    assignment ``af`` — replayed by the IVF and semantic-dedup oracles.
    ``source`` must yield ``(vec_id, v DOUBLE[])``."""
    return _IVF_KMEANS_CTE_TEMPLATE.replace("__SOURCE__", source)


_IVF_KMEANS_CTE_TEMPLATE = """
    e AS (
      __SOURCE__
    ), c0 AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16
    ), a1 AS (
      SELECT e.vec_id, e.v,
             arg_max(c.cid, list_dot_product(e.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM e CROSS JOIN c0 c GROUP BY e.vec_id, e.v
    ), m1 AS (
      SELECT cell, pos,
             CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS m
      FROM (SELECT cell,
                   unnest(generate_series(0, list_count(v) - 1)) AS pos,
                   unnest(v) AS x
            FROM a1)
      GROUP BY cell, pos
    ), c1 AS (
      SELECT cell AS cid, list(m ORDER BY pos) AS cv FROM m1 GROUP BY cell
      UNION ALL
      SELECT cid, cv FROM c0 WHERE cid NOT IN (SELECT cell FROM m1)
    ), a2 AS (
      SELECT e.vec_id, e.v,
             arg_max(c.cid, list_dot_product(e.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM e CROSS JOIN c1 c GROUP BY e.vec_id, e.v
    ), m2 AS (
      SELECT cell, pos,
             CAST(SUM(CAST(x AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS m
      FROM (SELECT cell,
                   unnest(generate_series(0, list_count(v) - 1)) AS pos,
                   unnest(v) AS x
            FROM a2)
      GROUP BY cell, pos
    ), c2 AS (
      SELECT cell AS cid, list(m ORDER BY pos) AS cv FROM m2 GROUP BY cell
      UNION ALL
      SELECT cid, cv FROM c1 WHERE cid NOT IN (SELECT cell FROM m2)
    ), af AS (
      SELECT e.vec_id, e.v,
             arg_max(c.cid, list_dot_product(e.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM e CROSS JOIN c2 c GROUP BY e.vec_id, e.v
    )
"""

QUERIES["ivf_batch_topk"] = q_ivf_batch_topk
ORACLE_SQL["ivf_batch_topk"] = f"""
    WITH {_ivf_kmeans_cte()},
    q AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 4
    ), qc AS (
      SELECT query_id, cid,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY list_dot_product(qv, cv) /
                        greatest(1e-12, sqrt(list_dot_product(cv, cv)))
                        DESC, cid ASC) AS rk
      FROM q CROSS JOIN c2
    ), ranked AS (
      SELECT q.query_id, a.vec_id,
             list_cosine_similarity(a.v, q.qv) AS c,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_cosine_similarity(a.v, q.qv) DESC,
                        a.vec_id ASC) AS rk
      FROM q
      JOIN qc ON qc.query_id = q.query_id AND qc.rk <= 4
      JOIN af a ON a.cell = qc.cid
      WHERE a.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, round(c, 6) AS cosine
    FROM ranked WHERE rk <= 5
"""


def q_events_stream_sessions(spark, sf_dir):
    """Custom stateful streaming sessionization via applyInPandasWithState
    (streaming/events.py stateful_sessionize). On the finite availableNow
    run a session is emitted when closed by a later event OR flushed by the
    event-time timeout once the final watermark (max ts - 2 h) passes its
    end; only each user's still-open trailing session is retained in state.
    The oracle states exactly that."""
    import posixpath as pp

    from .streaming import stateful_sessionize

    return stateful_sessionize(
        spark, pp.join(sf_dir, "events.parquet"), gap="30 minutes"
    )


def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure filter + single exact-decimal aggregate. Every
    predicate reaches the parquet scan as a pushed filter (no partition
    columns involved — this is row-group/page-level pushdown)."""
    li = _table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation over a broadcast dim join —
    promo revenue share. Both sums are exact decimals; the final percentage
    is two single float ops (divide, times 100), bit-identical cross-engine."""
    li = _table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    pt = _table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    joined = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0)))
            .cast("double")
            / F.sum(disc).cast("double")
        ).alias("promo_pct")
    )


def q_brand_size_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive range predicates across
    both join sides. Catalyst splits the OR into a common join key plus a
    residual filter; per-side conjuncts (p_brand IN ..., l_quantity <= 30)
    get inferred and pushed below the join."""
    li = _table(spark, sf_dir, "lineitem")
    pt = _table(spark, sf_dir, "part")
    j = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_approx_distinct_counts(spark, sf_dir):
    """Sketch aggregates: HyperLogLog++ distinct counts + approximate
    percentile per group. This is the 100 TB path for the exact
    `distinct_counts` query — one pass, O(1) state per group, no expand.

    Sketch values aren't portable across engines, so the oracle checks
    error bounds instead: the query emits the exact counts (hash-compared
    against DuckDB) alongside booleans asserting each sketch lands within
    5% of the exact answer (the oracle emits literal TRUE). Both exact and
    approx aggregates run in the same single pass."""
    g = (
        _table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts_exact"),
            F.countDistinct("l_suppkey").alias("n_supps_exact"),
            F.approx_count_distinct("l_partkey", 0.02).alias("_parts_approx"),
            F.approx_count_distinct("l_suppkey", 0.02).alias("_supps_approx"),
            F.expr("percentile(l_extendedprice, 0.5D)").alias("_median_exact"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias(
                "_median_approx"
            ),
        )
    )

    def _ok(approx: str, exact: str):
        return (
            F.abs(F.col(approx).cast("double") - F.col(exact).cast("double"))
            / F.col(exact).cast("double")
        ) < F.lit(0.05)

    return g.select(
        "l_returnflag",
        "n_parts_exact",
        "n_supps_exact",
        _ok("_parts_approx", "n_parts_exact").alias("parts_ok"),
        _ok("_supps_approx", "n_supps_exact").alias("supps_ok"),
        _ok("_median_approx", "_median_exact").alias("median_ok"),
    )


QUERIES.update(
    {
        "forecast_revenue": q_forecast_revenue,
        "promo_revenue": q_promo_revenue,
        "brand_size_revenue": q_brand_size_revenue,
        "approx_distinct_counts": q_approx_distinct_counts,
    }
)

ORACLE_SQL.update(
    {
        "forecast_revenue": """
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                            CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                     AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "promo_revenue": f"""
            SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                            (1 - CAST(l_discount AS DECIMAL(18,2)))
                       ELSE 0 END) AS DOUBLE)
                   / {_REV}
                     AS promo_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
        """,
        "brand_size_revenue": f"""
            SELECT {_REV} AS revenue, COUNT(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "approx_distinct_counts": """
            SELECT l_returnflag,
                   COUNT(DISTINCT l_partkey) AS n_parts_exact,
                   COUNT(DISTINCT l_suppkey) AS n_supps_exact,
                   TRUE AS parts_ok,
                   TRUE AS supps_ok,
                   TRUE AS median_ok
            FROM lineitem
            GROUP BY l_returnflag
        """,
    }
)


def q_events_stream_join(spark, sf_dir):
    """Stream-stream interval join (streaming/events.py): purchases ⋈ same
    user's clicks within the preceding 30 minutes, run as a Structured
    Streaming query with watermarked state on both sides; inner matches are
    exact, so the batch interval join is the oracle."""
    import posixpath as pp

    from .streaming import stream_stream_click_purchase_join

    return stream_stream_click_purchase_join(
        spark, pp.join(sf_dir, "events.parquet"), within="30 minutes"
    )


def q_interval_join(spark, sf_dir):
    """Big-big batch range join (operators/joins.py interval_join): clicks
    within [-30 min, +15 min] of each purchase per user, as a bucketized
    equi-join (one hash shuffle + residual) — never a per-key cartesian."""
    from .operators.joins import interval_join

    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    return interval_join(
        p, c, on=["user_id"], left_ts="purchase_ts", right_ts="click_ts",
        lower="30 minutes", upper="15 minutes",
    )


QUERIES["interval_join"] = q_interval_join
ORACLE_SQL["interval_join"] = """
    WITH typed AS (
      SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id, event_type
      FROM events
    ), p AS (
      SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
      FROM typed WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts AS click_ts, event_id AS click_id
      FROM typed WHERE event_type = 'click'
    )
    SELECT p.user_id, p.purchase_ts, p.purchase_id, c.click_ts, c.click_id
    FROM p JOIN c ON p.user_id = c.user_id
     AND c.click_ts >= p.purchase_ts - INTERVAL 30 MINUTE
     AND c.click_ts <= p.purchase_ts + INTERVAL 15 MINUTE
"""


def q_events_stream_dedup(spark, sf_dir):
    """Streaming exact dedup with bounded state (streaming/events.py
    stream_dedup): two copies of the events file as two micro-batches;
    dropDuplicatesWithinWatermark + the watermark remove every duplicate, so
    the output is the distinct event set."""
    import posixpath as pp

    from .streaming import stream_dedup

    return stream_dedup(spark, pp.join(sf_dir, "events.parquet"), copies=2)


QUERIES["events_stream_dedup"] = q_events_stream_dedup
ORACLE_SQL["events_stream_dedup"] = """
    SELECT event_id, user_id, event_type,
           make_timestamp(epoch_us(ts)) AS ts, value
    FROM events
"""


QUERIES["events_stream_join"] = q_events_stream_join
ORACLE_SQL["events_stream_join"] = """
    WITH typed AS (
      SELECT event_id, make_timestamp(epoch_us(ts)) AS ts, user_id, event_type
      FROM events
    ), p AS (
      SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
      FROM typed WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts AS click_ts, event_id AS click_id
      FROM typed WHERE event_type = 'click'
    )
    SELECT p.user_id, p.purchase_ts, p.purchase_id, c.click_ts, c.click_id
    FROM p JOIN c ON p.user_id = c.user_id
     AND c.click_ts <= p.purchase_ts
     AND c.click_ts >= p.purchase_ts - INTERVAL 30 MINUTE
"""


QUERIES.update(
    {
        "order_priority_exists": q_order_priority_exists,
        "small_qty_revenue": q_small_qty_revenue,
        "window_running": q_window_running,
        "band_join": q_band_join,
        "salted_revenue": q_salted_revenue,
        "ivf_topk": q_ivf_topk,
        "events_stream_sessions": q_events_stream_sessions,
    }
)

ORACLE_SQL.update(
    {
        "order_priority_exists": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
            GROUP BY o_orderpriority
        """,
        "small_qty_revenue": """
            WITH li_b AS (
              SELECT l_partkey, l_quantity, l_extendedprice
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_brand = 'Brand#23'
            ), pa AS (
              SELECT l_partkey,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*) AS avg_qty
              FROM li_b GROUP BY l_partkey
            )
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     / 7.0 AS avg_yearly
            FROM li_b JOIN pa USING (l_partkey)
            WHERE l_quantity < 0.2 * avg_qty
        """,
        "window_running": """
            SELECT o_custkey, o_orderkey,
                   CAST(RANK() OVER w AS INT) AS rnk,
                   LAG(o_totalprice) OVER w AS prev_price,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        OVER (w ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                     AS running_spend
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        "band_join": """
            SELECT band, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_price
            FROM orders
            JOIN (VALUES ('low', 0.0, 100000.0),
                         ('mid', 100000.0, 200000.0),
                         ('high', 200000.0, 10000000.0)) AS b(band, lo, hi)
              ON o_totalprice >= lo AND o_totalprice < hi
            GROUP BY band
        """,
        "salted_revenue": """
            SELECT p_brand,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                            (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                     AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "ivf_topk": f"""
            WITH {_ivf_kmeans_cte()},
            q AS (
              SELECT v AS qv FROM e WHERE vec_id = 0
            ), qc AS (             -- probe the 4 nearest cells
              SELECT c.cid FROM c2 c, q
              ORDER BY list_dot_product(q.qv, c.cv) /
                       greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))
                       DESC, c.cid ASC
              LIMIT 4
            )
            SELECT a.vec_id,
                   round(list_cosine_similarity(a.v, q.qv), 6) AS cosine
            FROM af a, q
            WHERE a.cell IN (SELECT cid FROM qc) AND a.vec_id <> 0
            ORDER BY list_cosine_similarity(a.v, q.qv) DESC, a.vec_id ASC
            LIMIT 10
        """,
        "events_stream_sessions": """
            WITH typed AS (
              SELECT user_id, make_timestamp(epoch_us(ts)) AS ts FROM events
            ), flagged AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
              FROM typed
            ), numbered AS (
              SELECT user_id, ts,
                     SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS session_no
              FROM flagged
            ), sess AS (
              SELECT user_id, session_no,
                     min(ts) AS session_start,
                     max(ts) + INTERVAL 30 MINUTE AS session_end,
                     COUNT(*) AS n_events,
                     max(session_no) OVER (PARTITION BY user_id) AS max_no
              FROM numbered GROUP BY user_id, session_no
            )
            SELECT session_start, session_end, user_id, n_events
            FROM sess, (SELECT max(ts) AS max_ts FROM typed)
            WHERE session_no < max_no          -- closed by a later event
               OR session_end < max_ts - INTERVAL 2 HOUR  -- event-time timeout
        """,
    }
)

def q_tf_idf(spark, sf_dir):
    """Per-doc top-5 TF-IDF terms (operators/text.py tf_idf): two
    key-partitioned aggregations + join + per-doc top-k window; ln/multiply
    are single float ops over exact integers so scores hash-match."""
    from .operators import tf_idf

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return tf_idf(docs, "doc_id", "text", top_k=5)


def q_pii_scrub(spark, sf_dir):
    """PII scrubbing (operators/text.py scrub_pii) over deterministically
    planted PII: each doc's text is suffixed with a synthetic email, phone
    and SSN, then masked. The oracle plants the identical suffix and runs
    the identical RE2-safe regexes."""
    from .operators import scrub_pii

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or (555) 123-4567 ssn 123-45-6789"),
        ).alias("raw"),
    )
    return scrub_pii(docs, "raw", "clean").select("doc_id", "clean")


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling (operators/sampling.py): 50% of
    'en' docs, 20% of 'de', by portable 60-bit hash of the doc id — the
    reproducible-downsampling primitive; the oracle selects the identical
    subset with the same hash arithmetic in SQL."""
    from .operators import deterministic_sample

    docs = _table(spark, sf_dir, "documents")
    return deterministic_sample(
        docs, "doc_id", {"en": 0.5, "de": 0.2}, strata_col="lang"
    ).select("doc_id", "lang", "source")


def q_dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup (operators/dedup.py dedup_against_corpus):
    the incoming batch (all docs) anti-joined on content fingerprint against
    an existing corpus (docs 0-249) — survivors are the genuinely new
    texts."""
    from .operators import dedup_against_corpus

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 250)
    return dedup_against_corpus(docs, corpus, "text", broadcast=True).select(
        "doc_id"
    )


def q_chunk_documents(spark, sf_dir):
    """Token-bounded sliding-window chunking (operators/text.py
    chunk_documents): 64-token chunks, 8-token overlap — a JVM-side 1→N
    flatMap (sequence → slice → posexplode), no shuffle, no Python."""
    from .operators.text import chunk_documents

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs, "doc_id", "text", chunk_tokens=64, overlap=8)


QUERIES.update(
    {
        "tf_idf_top_terms": q_tf_idf,
        "pii_scrub": q_pii_scrub,
        "stratified_sample": q_stratified_sample,
        "dedup_incremental": q_dedup_incremental,
        "chunk_documents": q_chunk_documents,
    }
)

ORACLE_SQL.update(
    {
        "tf_idf_top_terms": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
            ), dfreq AS (
              SELECT term, COUNT(*) AS df_t FROM tf GROUP BY term
            ), n AS (
              SELECT COUNT(DISTINCT doc_id) AS n FROM documents
            ), scored AS (
              SELECT doc_id, term, tf,
                     ln(CAST(n.n AS DOUBLE) / df_t) AS idf,
                     tf * ln(CAST(n.n AS DOUBLE) / df_t) AS tfidf
              FROM tf JOIN dfreq USING (term) CROSS JOIN n
            )
            SELECT doc_id, term, tf, tfidf, rk FROM (
              SELECT doc_id, term, tf, tfidf,
                     CAST(row_number() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, term
                     ) AS INT) AS rk
              FROM scored
            ) WHERE rk <= 5
        """,
        "pii_scrub": """
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         substr(text, 1, 40) || ' contact user' ||
                           CAST(doc_id AS VARCHAR) ||
                           '@example.com or (555) 123-4567 ssn 123-45-6789',
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
                     '(\\+?\\d{1,2}[ -])?(\\(\\d{3}\\)|\\d{3})[ -]\\d{3}[ -]?\\d{4}\\b',
                     '<PHONE>', 'g') AS clean
            FROM documents
        """,
        "stratified_sample": """
            SELECT doc_id, lang, source FROM (
              SELECT doc_id, lang, source,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                          AS BIGINT) % 10000 AS bucket
              FROM documents
            )
            WHERE (lang = 'en' AND bucket < 5000)
               OR (lang = 'de' AND bucket < 2000)
        """,
        "dedup_incremental": """
            WITH norm AS (
              SELECT doc_id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt
              FROM documents
            )
            SELECT doc_id FROM norm
            WHERE nt NOT IN (SELECT nt FROM norm WHERE doc_id < 250)
        """,
        "chunk_documents": """
            WITH d AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id, toks,
                     unnest(generate_series(1, greatest(len(toks) - 8, 1), 56))
                       AS start
              FROM d
            )
            SELECT doc_id,
                   CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start)
                        - 1 AS INT) AS chunk_id,
                   array_to_string(toks[start:start+63], ' ') AS chunk_text,
                   CAST(len(toks[start:start+63]) AS INT) AS n_chunk_tokens
            FROM s
        """,
    }
)


def q_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: LEFT OUTER join with a join-side-only predicate
    (the order filter applied BEFORE the join, so customers with zero
    qualifying orders survive with count 0 — an inner join silently loses
    them), then a second aggregation into a histogram of counts."""
    c = _table(spark, sf_dir, "customer").select("c_custkey")
    o = _table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_waiting_customers(spark, sf_dir):
    """TPC-H Q22 shape: scalar aggregate subquery + anti-join. The
    above-average-balance test is expressed multiplicatively
    (``bal·n > sum``) over exact decimals/integers — a decimal DIVISION
    would round at engine-specific scales and flip boundary customers;
    the product form is exact in both engines."""
    c = _table(spark, sf_dir, "customer")
    o = _table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    stats = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    rich = c.crossJoin(F.broadcast(stats)).filter(
        _dec("c_acctbal") * F.col("n") > F.col("s")
    )
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


def q_returned_item_ranking(spark, sf_dir):
    """TPC-H Q10 shape: returned-lineitem revenue per customer over a date
    window, customer/nation dims broadcast, top-20 via
    TakeOrderedAndProject (per-partition top-k + k-row merge — never a
    global sort)."""
    li = _table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    c = _table(spark, sf_dir, "customer")
    n = _table(spark, sf_dir, "nation")
    rev = F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: HAVING on a grouped aggregate (orders whose total
    quantity exceeds 250) joined back to the order/customer dims — the
    grouped filter runs FIRST so only qualifying keys reach the join."""
    li = _table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__sq"))
        .filter(F.col("__sq") > 250)
        .select("l_orderkey", F.col("__sq").cast("double").alias("sum_qty"))
    )
    o = _table(spark, sf_dir, "orders")
    c = _table(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


QUERIES.update(
    {
        "returned_item_ranking": q_returned_item_ranking,
        "large_volume_customers": q_large_volume_customers,
    }
)

_Q10_REV = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)

ORACLE_SQL.update(
    {
        "returned_item_ranking": f"""
            SELECT c_custkey, c_name, c_acctbal, n_name, {_Q10_REV} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-07-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "large_volume_customers": """
            WITH big AS (
              SELECT l_orderkey,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
            )
            SELECT c_custkey, c_name, o_orderkey, o_orderdate,
                   o_totalprice, sum_qty
            FROM big
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
        """,
    }
)


def q_neardup_clusters(spark, sf_dir):
    """Full near-dup dedup pipeline (operators/dedup.py neardup_clusters):
    MinHash-LSH candidates → exact-Jaccard pairs → distributed connected
    components (min-label propagation, one shuffle per round, localCheckpoint
    against lineage growth). Emits (doc_id, cluster=min id in component);
    the oracle computes the identical clusters with a recursive CTE over the
    exact pair set."""
    from .operators import neardup_clusters

    docs = _table(spark, sf_dir, "documents")
    return neardup_clusters(docs, "doc_id", "text", broadcast_verify=True)


QUERIES["neardup_clusters"] = q_neardup_clusters
ORACLE_SQL["neardup_clusters"] = """
    WITH RECURSIVE words AS (
      SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
            FROM documents)
    ), sh AS (
      SELECT DISTINCT doc_id,
             w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS shingle
      FROM words
      WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(w, 2) OVER win IS NOT NULL
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE n_common / (sa.n + sb.n - n_common) >= 0.8
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ), reach AS (
      SELECT a AS node, a AS r FROM edges
      UNION
      SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a
    )
    SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster
    FROM reach GROUP BY node
"""


def q_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH bucketed ANN (operators/similarity.py
    lsh_bucketed_topk): corpus and query bucketed by 4 deterministic ±1
    hyperplanes (md5-parity coefficients), exact cosine inside the query's
    bucket only. Oracle-checkable the ivf_topk way: the coefficient matrix
    is deterministic and inlined into the SQL, so DuckDB replicates
    bucketing + in-bucket search exactly."""
    from .operators import lsh_bucketed_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    top = lsh_bucketed_topk(emb, "vec_id", "embedding", q, dim=64, k=10, planes=4)
    return top.select("vec_id", F.round("cosine", 6).alias("cosine"))


def _lsh_topk_oracle() -> str:
    from .operators.similarity import _hyperplane_rows

    planes = ", ".join(
        f"({p}, [{', '.join(str(x) for x in row)}]::DOUBLE[])"
        for p, row in enumerate(_hyperplane_rows(64, 4))
    )
    return f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), planes(pid, c) AS (
          VALUES {planes}
        ), buck AS (
          SELECT e.vec_id, e.v,
                 SUM(CASE WHEN list_dot_product(e.v, p.c) > 0
                          THEN (CAST(1 AS BIGINT) << p.pid) ELSE 0 END)
                   AS bucket
          FROM e CROSS JOIN planes p GROUP BY e.vec_id, e.v
        ), q AS (
          SELECT v AS qv, bucket AS qb FROM buck WHERE vec_id = 0
        )
        SELECT b.vec_id, round(list_cosine_similarity(b.v, q.qv), 6) AS cosine
        FROM buck b, q
        WHERE b.bucket = q.qb AND b.vec_id <> 0
        ORDER BY list_cosine_similarity(b.v, q.qv) DESC, b.vec_id ASC
        LIMIT 10
    """


QUERIES["lsh_topk"] = q_lsh_topk
ORACLE_SQL["lsh_topk"] = _lsh_topk_oracle()


def q_ann_batch_topk(spark, sf_dir):
    """Batch exact ANN (operators/similarity.py batch_cosine_topk): top-3
    cosine neighbors for EACH of 8 query vectors in ONE plan — one corpus
    scan, one broadcast of the query batch, per-query WindowGroupLimit
    ranking. No driver loop (round-3 verdict: the single-query operator
    would have looped N times)."""
    from .operators import batch_cosine_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    top = batch_cosine_topk(emb, "vec_id", "embedding", q, k=3)
    return top.select(
        "query_id", "vec_id", F.round("cosine", 6).alias("cosine")
    )


QUERIES["ann_batch_topk"] = q_ann_batch_topk
ORACLE_SQL["ann_batch_topk"] = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             list_cosine_similarity(e.v, q.qv) AS c
      FROM e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, vec_id, c,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY c DESC, vec_id ASC) AS rk
      FROM scored
    )
    SELECT query_id, vec_id, round(c, 6) AS cosine
    FROM ranked WHERE rk <= 3
"""


def q_embedding_quantize(spark, sf_dir):
    """int8-range vector quantization (operators/similarity.py
    quantize_vectors): per-vector min/max scaling with floor-based
    arithmetic (round() tie behavior differs across engines; floor does
    not) — the 4× storage/shuffle shrink for billion-vector corpora.

    Output is posexploded to (vec_id, pos, q) scalars: the driver's
    canonicalizer pandas-sorts every column and cannot sort raw array
    cells (round-4 red row), so array outputs surface element-wise —
    the same shape q_embedding_centroids uses."""
    from .operators import quantize_vectors

    emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return (
        quantize_vectors(emb, "embedding", "qvec")
        .select(
            "vec_id",
            "qvec_min",
            "qvec_scale",
            F.posexplode("qvec").alias("pos", "q"),
        )
        .select(
            "vec_id",
            "qvec_min",
            "qvec_scale",
            F.col("pos").cast("int").alias("pos"),
            "q",
        )
    )


QUERIES.update(
    {
        "customer_distribution": q_customer_distribution,
        "waiting_customers": q_waiting_customers,
        "embedding_quantize": q_embedding_quantize,
    }
)

ORACLE_SQL.update(
    {
        "customer_distribution": """
            SELECT c_count, COUNT(*) AS custdist FROM (
              SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey
            ) GROUP BY c_count
        """,
        "waiting_customers": """
            WITH stats AS (
              SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
                     COUNT(*) AS n
              FROM customer WHERE c_acctbal > 0
            )
            SELECT c_mktsegment, COUNT(*) AS numcust,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     AS totacctbal
            FROM customer, stats
            WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderpriority = '1-URGENT')
            GROUP BY c_mktsegment
        """,
        "embedding_quantize": """
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ), m AS (
              SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM e
            ), q AS (
              SELECT vec_id,
                     lo AS qvec_min,
                     (hi - lo) / 255.0 AS qvec_scale,
                     CASE WHEN hi - lo = 0
                          THEN list_transform(v, x -> 0)
                          ELSE list_transform(v, x -> least(255,
                                 CAST(floor((x - lo) * 255.0 / (hi - lo))
                                      AS INT)))
                     END AS qvec
              FROM m
            )
            SELECT vec_id, qvec_min, qvec_scale,
                   unnest(generate_series(0, list_count(qvec) - 1)) AS pos,
                   unnest(qvec) AS q
            FROM q
        """,
    }
)


def q_events_stream_publish(spark, sf_dir):
    """Streaming ingestion INTO the engine's dataset format, end-to-end
    under the gate (streaming/events.py stream_publish): events readStream →
    foreachBatch(publish_path append) into a hive dataset partitioned by
    event_date → fetched back through the sidecar-typed scan. The oracle is
    the plain events table plus the derived partition column."""
    import hashlib

    src = posixpath.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src)
        freshness = f"{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        # remote-scheme sf_dir: no OS stat; the logic version still
        # invalidates across code changes
        freshness = "remote"
    tag = hashlib.sha1(
        f"{src}|{freshness}|{_CACHE_LOGIC_VERSION}".encode()
    ).hexdigest()[:10]
    path = os.path.join(_CACHE_ROOT, f"stream_pub_{tag}")
    if not os.path.exists(os.path.join(path, "_s3parq_metadata.json")):
        shutil.rmtree(path, ignore_errors=True)
        from .streaming import stream_publish

        stream_publish(spark, src, path, ["event_date"])
    return fetch_path(spark, path).select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        "value",
        F.col("event_date").cast("date").alias("event_date"),
    )


QUERIES["events_stream_publish"] = q_events_stream_publish
# ts floors to milliseconds: publish writes TIMESTAMP_MILLIS on disk
# (reference coerce_timestamps='ms' parity)
ORACLE_SQL["events_stream_publish"] = """
    SELECT event_id, user_id, event_type,
           make_timestamp((epoch_us(ts) // 1000) * 1000) AS ts, value,
           CAST(make_timestamp(epoch_us(ts)) AS DATE) AS event_date
    FROM events
"""


def q_sql_front_door(spark, sf_dir):
    """SQL-string front door end-to-end (VERDICT r1 stretch): the published
    hive dataset is attached as a view (fetch.attach → sidecar-typed scan)
    and answered with plain ``spark.sql``; the partition predicate in the
    SQL text prunes at the file index exactly like the programmatic filter
    API (PLANS.md §fetch_filter_eq shows the same PartitionFilters)."""
    from .fetch import attach

    attach(spark, _li_flag_ds(spark, sf_dir), "li_front_door")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM li_front_door
        WHERE l_returnflag = 'R'
        GROUP BY l_returnflag, l_linestatus
        """
    )


QUERIES["sql_front_door"] = q_sql_front_door
ORACLE_SQL["sql_front_door"] = """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_returnflag = 'R'
    GROUP BY l_returnflag, l_linestatus
"""


ORACLE_SQL.update(
    {
        "semi_join": """
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        """,
        "anti_join": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        """,
        "grouping_sets": """
            SELECT l_returnflag, l_linestatus,
                   CAST(grouping(l_returnflag) AS INT) AS g_flag,
                   CAST(grouping(l_linestatus) AS INT) AS g_status,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
    }
)


def q_catalog_join(spark, sf_dir):
    """Multi-dataset catalog sweep: two engine-published datasets
    (partitioned lineitem + partitioned orders) registered as REAL catalog
    tables via ``redshift.register_spark_table`` (CREATE TABLE ... USING
    PARQUET PARTITIONED BY + MSCK REPAIR — the Spark-native Spectrum
    registration, ``redshift.py:221``), then joined by NAME in plain
    ``spark.sql``. Proves the catalog path end to end: partition discovery
    via the metastore, partition pruning from the WHERE clause
    (l_linestatus = 'F' prunes at the catalog partition level), and a
    by-name join across two registered datasets."""
    from . import redshift
    from .fetch import fetch_path

    li_path = _li_flag_ds(spark, sf_dir)
    ord_path = _orders_prio_ds(spark, sf_dir)
    schema = "cat_" + re.sub(r"[^A-Za-z0-9_]", "_", sf_dir.strip("/"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {schema}")
    for tbl, path, parts in (
        ("li_flag", li_path, ["l_returnflag", "l_linestatus"]),
        ("orders_prio", ord_path, ["o_orderpriority"]),
    ):
        # re-register fresh each run: a stale entry could point at a
        # cleared tmp cache dir from an earlier session
        spark.sql(f"DROP TABLE IF EXISTS {schema}.{tbl}")
        df = fetch_path(spark, path)
        redshift.register_spark_table(
            spark, tbl, schema,
            {f.name: f.dataType for f in df.schema.fields}, parts, path,
        )
    return spark.sql(
        f"""
        SELECT o.o_orderpriority, l.l_returnflag,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_items
        FROM {schema}.li_flag l
        JOIN {schema}.orders_prio o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_linestatus = 'F'
        GROUP BY o.o_orderpriority, l.l_returnflag
        """
    )


def q_embedding_normalize(spark, sf_dir):
    """L2 normalization (operators/similarity.py normalize_vectors) made
    oracle-checkable: emitted as (vec_id, pos, x_norm) rows rounded to 6
    decimals — the same sequential-fold norm arithmetic the ANN oracles
    already prove portable (Spark aggregate vs DuckDB list_dot_product).
    Zero vectors pass through unchanged in both engines."""
    from .operators import normalize_vectors

    emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    normed = normalize_vectors(emb, "embedding", "nvec")
    return normed.select(
        "vec_id", F.posexplode("nvec").alias("pos", "x")
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.round("x", 6).alias("x_norm"),
    )


QUERIES["embedding_normalize"] = q_embedding_normalize
ORACLE_SQL["embedding_normalize"] = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), n AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
    )
    SELECT vec_id,
           CAST(pos - 1 AS INT) AS pos,
           round(CASE WHEN nrm = 0 THEN x ELSE x / nrm END, 6) AS x_norm
    FROM (SELECT vec_id, nrm,
                 unnest(generate_series(1, list_count(v))) AS pos,
                 unnest(v) AS x
          FROM n)
"""


def q_ngram_lm_quality(spark, sf_dir):
    """Bigram LM quality scoring (operators/text.py ngram_lm_scores,
    CCNet-style): model counted from the even-doc_id half of the corpus,
    every document scored by average add-one-smoothed bigram log-prob.
    Exact integer counts + one ln per bigram + decimal-exact mean, so the
    oracle replays it bit-for-bit; rounded to 6 decimals at the edge."""
    from .operators import ngram_lm_scores

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    out = ngram_lm_scores(docs, train, "doc_id", "text")
    return out.select(
        "doc_id", "n_bigrams", F.round("avg_logp", 6).alias("avg_logp")
    )


def q_bm25_search(spark, sf_dir):
    """BM25 ranked retrieval (operators/text.py bm25_scores): top-10 docs
    for the query {hash, join, vector} with k1=1.2, b=0.75. Exact integer
    counts, a fixed left-associative float expression sequence, and a
    decimal-exact per-doc term sum — the oracle inlines the identical
    constants and expression structure, so even the ranking cut is
    hash-stable."""
    from .operators import bm25_scores

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    out = bm25_scores(docs, "doc_id", "text", ["hash", "join", "vector"])
    return out.select("doc_id", "n_terms", F.round("score", 6).alias("score"))


def _li_evolved_ds(spark, sf_dir):
    """Two-publish dataset exercising append schema evolution: v1 holds 4
    columns (l_linenumber <= 3), the v2 append adds l_extendedprice
    (l_linenumber > 3). The merged sidecar appends the new column; v1 files
    read it as NULL (parquet missing-column semantics)."""
    path = _ds_path(sf_dir, "li_evolved")
    marker = os.path.join(path, "_PUBLISHED")
    if not os.path.exists(marker) or not _dataset_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        li = _table(spark, sf_dir, "lineitem")
        v1 = li.filter(F.col("l_linenumber") <= 3).select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
        )
        publish_path(spark, path, v1, ["l_returnflag"], mode="overwrite")
        v2 = li.filter(F.col("l_linenumber") > 3).select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
            "l_extendedprice",
        )
        publish_path(spark, path, v2, ["l_returnflag"], mode="append")
        with open(marker, "w") as fh:
            fh.write("ok")
    return path


def q_schema_evolution_fetch(spark, sf_dir):
    """Append schema evolution under the gate: publish 4 columns, append a
    5th, fetch everything back through the merged sidecar schema — rows
    from before the evolution must read the new column as NULL, typed
    correctly, with partition pruning machinery untouched."""
    return fetch_path(spark, _li_evolved_ds(spark, sf_dir))


QUERIES["schema_evolution_fetch"] = q_schema_evolution_fetch
ORACLE_SQL["schema_evolution_fetch"] = """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
           CASE WHEN l_linenumber > 3 THEN l_extendedprice END
             AS l_extendedprice
    FROM lineitem
"""


def q_stratified_fixed_n(spark, sf_dir):
    """Exact-count stratified sampling (operators/sampling.py
    stratified_fixed_n): exactly 20 docs per source, chosen by the portable
    md5-hash ranking — the 'N per bucket' contract fraction-based sampling
    cannot give (eval sets, per-source quotas). Per-stratum
    WindowGroupLimit, no global sort; identical membership on any cluster
    and in the oracle."""
    from .operators import stratified_fixed_n

    docs = _table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return stratified_fixed_n(docs, "doc_id", "source", 20)


QUERIES["stratified_fixed_n"] = q_stratified_fixed_n
ORACLE_SQL["stratified_fixed_n"] = """
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 15) AS BIGINT) ASC,
                        doc_id ASC) AS rk
      FROM documents
    ) WHERE rk <= 20
"""


def q_doc_dup_ngrams(spark, sf_dir):
    """Per-document duplicated-5-gram ratio (operators/dedup.py
    duplicated_ngram_ratio, the RefinedWeb boilerplate signal): fraction of
    each doc's distinct 5-grams appearing in at least one other doc. One
    shingle explode, one document-frequency aggregate, one join-back —
    every exchange on the n-gram key."""
    from .operators import duplicated_ngram_ratio

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return duplicated_ngram_ratio(docs, "doc_id", "text", n=5)


QUERIES["doc_dup_ngrams"] = q_doc_dup_ngrams
ORACLE_SQL["doc_dup_ngrams"] = """
    WITH toks AS (
      -- regex split + trim matches word_shingles' split(trim(text), '\\s+');
      -- a plain ' ' split diverges on any doubled/leading whitespace
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(1, len(t) - 4),
               i -> array_to_string(t[i:i+4], ' '))) AS g
      FROM toks
    ), dfg AS (
      SELECT g, COUNT(*) AS df_g FROM sh GROUP BY g
    )
    SELECT doc_id,
           COUNT(*) AS n_ngrams,
           CAST(SUM(CASE WHEN df_g >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup,
           CAST(SUM(CASE WHEN df_g >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS dup_ratio
    FROM sh JOIN dfg USING (g)
    GROUP BY doc_id
"""


QUERIES["bm25_search"] = q_bm25_search
ORACLE_SQL["bm25_search"] = """
    WITH toks AS (
      SELECT doc_id AS doc,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ), dl AS (
      SELECT doc, COUNT(*) AS dl FROM toks GROUP BY doc
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl
    ), tf AS (
      SELECT doc, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('hash', 'join', 'vector') GROUP BY doc, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS df_t FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc,
             CAST(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0) *
               ((tf * 2.2) /
                (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl /
                             (CAST(total_len AS DOUBLE) / n_docs))))
               AS DECIMAL(28,12)) AS s
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl USING (doc)
      CROSS JOIN stats
    ), agg AS (
      SELECT doc, COUNT(*) AS n_terms, CAST(SUM(s) AS DOUBLE) AS score
      FROM scored GROUP BY doc
    )
    SELECT doc AS doc_id, n_terms, round(score, 6) AS score
    FROM agg
    ORDER BY score DESC, doc ASC
    LIMIT 10
"""


QUERIES["ngram_lm_quality"] = q_ngram_lm_quality
ORACLE_SQL["ngram_lm_quality"] = """
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), big AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2)
    ), tr_tok AS (
      SELECT unnest(t) AS w FROM toks WHERE doc_id % 2 = 0
    ), c1 AS (
      SELECT w AS w1, COUNT(*) AS c1 FROM tr_tok GROUP BY w
    ), c2 AS (
      SELECT w1, w2, COUNT(*) AS c2 FROM big
      WHERE doc_id % 2 = 0 GROUP BY w1, w2
    ), v AS (
      SELECT COUNT(DISTINCT w) AS v FROM tr_tok
    ), scored AS (
      SELECT b.doc_id,
             ln(CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE) /
                CAST(COALESCE(c1.c1, 0) + v.v AS DOUBLE)) AS logp
      FROM big b
      LEFT JOIN c2 ON b.w1 = c2.w1 AND b.w2 = c2.w2
      LEFT JOIN c1 ON b.w1 = c1.w1
      CROSS JOIN v
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           round(CAST(SUM(CAST(logp AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*), 6) AS avg_logp
    FROM scored GROUP BY doc_id
"""


QUERIES["catalog_join"] = q_catalog_join
ORACLE_SQL["catalog_join"] = """
    SELECT o_orderpriority, l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_linestatus = 'F'
    GROUP BY o_orderpriority, l_returnflag
"""


def q_vacuum_roundtrip(spark, sf_dir):
    """Full orphan-file lifecycle under the gate (publish.py vacuum_dataset):
    publish nation through the engine, plant an orphan parquet copy in a
    partition dir, then assert the three contracts in sequence — (1) a raw
    directory scan sees the orphan's rows but fetch (manifest file list)
    does not; (2) the retention window refuses to touch the fresh file;
    (3) retention_hours=0 vacuum removes exactly the orphan, after which
    the raw scan agrees with fetch again. Oracle = the clean nation table.
    Rebuilt from scratch every run — the lifecycle IS the query."""
    from .publish import vacuum_dataset
    from . import fs

    path = _ds_path(sf_dir, "vacuum_rt")
    shutil.rmtree(path, ignore_errors=True)
    nation = _table(spark, sf_dir, "nation")
    publish_path(spark, path, nation, ["n_regionkey"])
    files = sorted(fs.list_files(spark, path))
    rel = files[0]
    orphan = rel.rsplit("/", 1)[0] + "/part-orphan.parquet"
    shutil.copy(os.path.join(path, rel), os.path.join(path, orphan))

    n_clean = nation.count()
    assert spark.read.parquet(path).count() > n_clean, "orphan not visible to raw scan"
    assert fetch_path(spark, path).count() == n_clean, "fetch leaked an orphan"
    assert vacuum_dataset(spark, path, dry_run=True) == [], "retention window ignored"
    removed = vacuum_dataset(spark, path, retention_hours=0)
    assert removed == [orphan], f"vacuum removed {removed}, expected [{orphan}]"
    assert spark.read.parquet(path).count() == n_clean, "raw scan still polluted"
    return fetch_path(spark, path).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


QUERIES["vacuum_roundtrip"] = q_vacuum_roundtrip
ORACLE_SQL["vacuum_roundtrip"] = """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
"""


def q_bpe_roundtrip(spark, sf_dir):
    """Distributed BPE train + apply (operators/bpe.py), gated on the
    lossless-roundtrip property: merges only ever concatenate adjacent
    symbols, so rejoining every document's tokens must reproduce its text
    with whitespace squashed out. Training is deterministic (count-desc,
    pair-lexicographic tiebreak) on a fixed 60-doc slice; the hash compare
    runs over the full reconstructed text of every document, so a single
    lost/reordered/duplicated token anywhere in the corpus is a red row."""
    from .operators.bpe import bpe_apply, bpe_learn

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = bpe_learn(docs.filter(F.col("doc_id") < 60), "text", n_merges=12)
    assert merges, "bpe_learn produced no merges"
    toks = bpe_apply(docs, "text", merges, "toks")
    return toks.select("doc_id", F.concat_ws("", "toks").alias("reconstructed"))


QUERIES["bpe_roundtrip"] = q_bpe_roundtrip
ORACLE_SQL["bpe_roundtrip"] = """
    SELECT doc_id,
           array_to_string(string_split_regex(trim(text), '\\s+'), '')
             AS reconstructed
    FROM documents
"""


def q_ivf_pruned_topk(spark, sf_dir):
    """IVF at rest, end to end: the corpus is published through the engine
    ``partitionBy(cell)`` (the layout ivf_topk's docstring promises for
    100 TB), and probes are served through the PARTITION-PRUNED fetch path —
    the scan's file index keeps only the probed cells' files, so a query
    touches n_probe/n_cells of the corpus via the engine's own pruning
    machinery, not a post-scan filter.

    Same deterministic quantizer and parameters as ivf_batch_topk (16-cell
    kmeans, 2 Lloyd iterations, 4 queries × 4 probes, top-5), so it shares
    that oracle verbatim. Probe-cell selection here is driver-side on the
    collected query vectors — bounded at n_queries × dim — because partition
    filters must exist at plan time; that is the serving-path trade, while
    ivf_batch_topk remains the all-JVM batch path."""
    from .operators.similarity import (
        _assign_whole_vec,
        cosine_similarity,
        kmeans_centroids,
    )

    emb = _table(spark, sf_dir, "embeddings")
    cvecs = kmeans_centroids(emb, "vec_id", "embedding", k=16, iters=2)
    cnorms = [max(1e-12, sum(x * x for x in v) ** 0.5) for v in cvecs]

    def build(s, d):
        corpus = _table(s, d, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        return _assign_whole_vec(corpus, "embedding", "cell", cvecs, cnorms)

    path = _cached_dataset(spark, sf_dir, "ivf_cells", build, ["cell"])

    qrows = (
        emb.filter(F.col("vec_id") < 4)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    pairs = []
    for r in qrows:
        qv = [float(x) for x in r["v"]]
        order = sorted(
            range(len(cvecs)),
            key=lambda j: (
                -sum(a * b for a, b in zip(qv, cvecs[j])) / cnorms[j],
                j,
            ),
        )
        pairs.extend((r["vec_id"], c, qv) for c in order[:4])
    cells = sorted({c for _, c, _ in pairs})

    fetched = fetch_path(
        spark,
        path,
        filters=[{"partition": "cell", "comparison": "==", "values": cells}],
        columns=["vec_id", "embedding", "cell"],
    )
    probe = local_rows_df(
        spark, pairs, "query_id bigint, cell bigint, qvec array<double>"
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        fetched.join(F.broadcast(probe), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", cosine_similarity(F.col("embedding"), F.col("qvec")))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= 5)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


QUERIES["ivf_pruned_topk"] = q_ivf_pruned_topk
# byte-identical pipeline to ivf_batch_topk (same quantizer, queries, k,
# n_probe) — the at-rest layout must not change the answer
ORACLE_SQL["ivf_pruned_topk"] = ORACLE_SQL["ivf_batch_topk"]


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (operators/similarity.py
    semantic_dedup, Abbas et al. 2023): cluster embeddings with the
    deterministic Lloyd quantizer, drop rows with a lower-id same-cell
    neighbor at cosine >= 0.9.

    The raw embeddings are near-orthogonal (max pairwise cosine ~0.51), so
    the query plants duplicates: exact copies of vec_id < 20 re-keyed to
    +10000. A copy lands in its original's cell (identical argmax) and has
    cosine 1.0 with it, so the kept set must be exactly the original
    corpus with its cell assignment — the oracle replays Lloyd over the
    SAME union corpus and the same EXISTS drop rule."""
    from .operators import semantic_dedup

    emb = _table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    copies = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "v"
    )
    corpus = emb.unionByName(copies)
    return semantic_dedup(
        corpus, "vec_id", "v", n_cells=16, threshold=0.9, kmeans_iters=2
    )


QUERIES["semantic_dedup"] = q_semantic_dedup


def q_sorted_publish_fetch(spark, sf_dir):
    """Data-skipping publish (publish.py sort_within_files): lineitem is
    published partitioned by l_linestatus and CLUSTERED by l_shipdate
    within files — each file a contiguous sorted range with tight,
    pairwise-disjoint parquet min/max stats on the sort column (asserted
    in tests/test_publish_fetch.py), the clustering declared in the
    sidecar. The query is the 100 TB read shape this layout exists for:
    partition filter (partition pruning) + date-range predicate on the
    SORT column, which the scan pushes down and answers from row-group
    stats instead of data pages. Oracle = the same filter in SQL."""
    path = _cached_dataset(
        spark, sf_dir, "li_sorted",
        lambda s, d: _table(s, d, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice",
            "l_discount", "l_linestatus",
        ),
        ["l_linestatus"],
        sort_within_files=["l_shipdate"],
    )
    df = fetch_path(
        spark, path,
        filters=[{"partition": "l_linestatus", "comparison": "==",
                  "values": ["F"]}],
    )
    return (
        df.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
    )


QUERIES["sorted_publish_fetch"] = q_sorted_publish_fetch


def q_zorder_publish_fetch(spark, sf_dir):
    """Z-ordered publish (publish.py zorder_by): lineitem clustered by the
    interleaved-bit Morton key over (l_orderkey, l_partkey) — per-file
    min/max stats tight on BOTH columns (asserted in tests), so the scan's
    pushed range predicates on either dimension skip files. The query
    filters on both dimensions at once — the selective-point-lookup shape
    z-ordering exists for. Oracle = the same two-range filter in SQL."""
    path = _cached_dataset(
        spark, sf_dir, "li_zorder",
        lambda s, d: _table(s, d, "lineitem").select(
            "l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
            "l_extendedprice",
        ),
        [],
        zorder_by=["l_orderkey", "l_partkey"],
    )
    df = fetch_path(spark, path)
    return (
        df.filter(
            (F.col("l_orderkey") < 5000) & (F.col("l_partkey") < 800)
        )
        .select(
            "l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
            F.col("l_extendedprice").alias("price"),
        )
    )


QUERIES["zorder_publish_fetch"] = q_zorder_publish_fetch
ORACLE_SQL["zorder_publish_fetch"] = """
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
           l_extendedprice AS price
    FROM lineitem
    WHERE l_orderkey < 5000 AND l_partkey < 800
"""
ORACLE_SQL["sorted_publish_fetch"] = """
    SELECT l_orderkey, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_linestatus = 'F'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_orderkey
"""
_SEMDEDUP_SOURCE = """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
      UNION ALL
      SELECT vec_id + 10000, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 20"""
ORACLE_SQL["semantic_dedup"] = f"""
    WITH {_ivf_kmeans_cte(_SEMDEDUP_SOURCE)},
    dups AS (
      SELECT DISTINCT a.vec_id
      FROM af a JOIN af b
        ON a.cell = b.cell AND b.vec_id < a.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.9
    )
    SELECT a.vec_id, a.cell FROM af a
    WHERE a.vec_id NOT IN (SELECT vec_id FROM dups)
"""


# round-2 extension queries (TPC-H Q7/Q8/Q9/Q15/Q19 shapes + corpus stats)
from .workload_ext import ORACLE_EXT, QUERIES_EXT  # noqa: E402
from .workload_ext2 import ORACLE_EXT2, QUERIES_EXT2  # noqa: E402

QUERIES.update(QUERIES_EXT)
ORACLE_SQL.update(ORACLE_EXT)
QUERIES.update(QUERIES_EXT2)
ORACLE_SQL.update(ORACLE_EXT2)

# IVF-PQ: the oracle composes the shared coarse-kmeans CTE (above) with the
# per-subspace PQ quantizer CTEs (workload_ext) — both quantizer levels are
# replayed in SQL, then probe-cell pruning and ADC-LUT ranking on top.
from .workload_ext import _pq_subspace_cte  # noqa: E402
from .workload_ext2 import q_ivf_pq_topk  # noqa: E402

QUERIES["ivf_pq_topk"] = q_ivf_pq_topk
# byte-identical pipeline at rest (codes-only storage, pruned fetch): the
# layout must not change the answer, so it shares the oracle verbatim
ORACLE_SQL["ivf_pq_at_rest"] = None  # placeholder, assigned right below
ORACLE_SQL["ivf_pq_topk"] = f"""
    WITH {_ivf_kmeans_cte()},
    {','.join(_pq_subspace_cte(j, j * 16 + 1, (j + 1) * 16) for j in range(4))},
    qc AS (
      SELECT cid,
             row_number() OVER (
               ORDER BY list_dot_product(qv.v, c.cv) /
                        greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))
                        DESC, cid ASC) AS rk
      FROM (SELECT v FROM e WHERE vec_id = 0) qv CROSS JOIN c2 c
    ), scored AS (
      SELECT af.vec_id,
             list_dot_product(q0.qv, b0.cv)
           + list_dot_product(q1.qv, b1.cv)
           + list_dot_product(q2.qv, b2.cv)
           + list_dot_product(q3.qv, b3.cv) AS score
      FROM af
      JOIN af0 ON af0.vec_id = af.vec_id
      JOIN af1 ON af1.vec_id = af.vec_id
      JOIN af2 ON af2.vec_id = af.vec_id
      JOIN af3 ON af3.vec_id = af.vec_id
      JOIN c01 b0 ON b0.cid = af0.cell
      JOIN c11 b1 ON b1.cid = af1.cell
      JOIN c21 b2 ON b2.cid = af2.cell
      JOIN c31 b3 ON b3.cid = af3.cell
      CROSS JOIN q0 CROSS JOIN q1 CROSS JOIN q2 CROSS JOIN q3
      WHERE af.cell IN (SELECT cid FROM qc WHERE rk <= 4)
        AND af.vec_id <> 0
    )
    SELECT vec_id, round(score, 6) AS adc
    FROM scored ORDER BY score DESC, vec_id ASC LIMIT 10
"""
ORACLE_SQL["ivf_pq_at_rest"] = ORACLE_SQL["ivf_pq_topk"]


def q_ivf_pq_batch_topk(spark, sf_dir):
    """Batched IVF-PQ ANN (operators/similarity.py ivf_pq_batch_topk — the
    full production serving shape): 4 query vectors in ONE plan. Each query
    row selects its 4 probe cells JVM-side (scores the broadcast 16-cell
    centroid matrix) and carries its 4 per-subspace ADC lookup tables;
    candidates come from the probe-cell equi-join, scoring is 4 array
    lookups + 3 adds per candidate, ranking is the per-query
    WindowGroupLimit. The oracle replays both quantizer levels, each
    query's probe selection, and the per-query ADC ranking.

    The quantizers are trained ONCE per sf_dir and persisted (the FAISS
    train/search split, via the operator's ``trained=``): the gate then
    prices encoding + serving, not re-training — and because the Lloyd
    training is deterministic, the cached quantizers reproduce a retrain
    bit-for-bit (the oracle still replays training from scratch, so a
    stale or corrupted cache would fail the hash gate, loudly)."""
    import json as _json

    from .operators import ivf_pq_batch_topk
    from .operators.similarity import kmeans_centroids, pq_encode

    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    cache = os.path.join(_ds_path(sf_dir, "ivfpq_books"), "books.json")
    trained = None
    if os.path.exists(cache):
        try:
            with open(cache) as fh:
                d = _json.load(fh)
            trained = (d["cvecs"], d["books"])
        except (ValueError, KeyError):
            trained = None  # unreadable cache: retrain below
    if trained is None:
        cvecs = kmeans_centroids(emb, "vec_id", "embedding", k=16, iters=2)
        _, books = pq_encode(emb, "vec_id", "embedding", 4, 8, 1)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        with open(cache, "w") as fh:
            _json.dump({"cvecs": cvecs, "books": books}, fh)
        trained = (cvecs, books)
    return ivf_pq_batch_topk(
        emb, "vec_id", "embedding", q, k=10, n_cells=16, n_probe=4,
        m=4, codes=8, coarse_iters=2, pq_iters=1, trained=trained,
    )


QUERIES["ivf_pq_batch_topk"] = q_ivf_pq_batch_topk
ORACLE_SQL["ivf_pq_batch_topk"] = f"""
    WITH {_ivf_kmeans_cte()},
    {','.join(_pq_subspace_cte(j, j * 16 + 1, (j + 1) * 16,
                               q_where='vec_id < 4', with_qid=True)
              for j in range(4))},
    qc AS (
      SELECT q.vec_id AS qid, c.cid,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.v, c.cv) /
                        greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))
                        DESC, c.cid ASC) AS rk
      FROM (SELECT vec_id, v FROM e WHERE vec_id < 4) q CROSS JOIN c2 c
    ), scored AS (
      SELECT q0.qid AS query_id, af.vec_id,
             list_dot_product(q0.qv, b0.cv)
           + list_dot_product(q1.qv, b1.cv)
           + list_dot_product(q2.qv, b2.cv)
           + list_dot_product(q3.qv, b3.cv) AS score
      FROM af
      JOIN af0 ON af0.vec_id = af.vec_id
      JOIN af1 ON af1.vec_id = af.vec_id
      JOIN af2 ON af2.vec_id = af.vec_id
      JOIN af3 ON af3.vec_id = af.vec_id
      JOIN c01 b0 ON b0.cid = af0.cell
      JOIN c11 b1 ON b1.cid = af1.cell
      JOIN c21 b2 ON b2.cid = af2.cell
      JOIN c31 b3 ON b3.cid = af3.cell
      CROSS JOIN q0
      JOIN q1 ON q1.qid = q0.qid
      JOIN q2 ON q2.qid = q0.qid
      JOIN q3 ON q3.qid = q0.qid
      WHERE af.cell IN (SELECT cid FROM qc
                        WHERE qc.qid = q0.qid AND rk <= 4)
        AND af.vec_id <> q0.qid
    ), ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS rk
      FROM scored
    )
    SELECT query_id, vec_id, round(score, 6) AS adc
    FROM ranked WHERE rk <= 10
"""
