"""Property: driver-side manifest pruning ≡ Catalyst-only pruning.

``_prune_manifest_files`` (fetch.py) is superset-safe by careful
construction — it may only shrink the file list Spark sees, never change
the result, because Catalyst re-applies the identical predicate to the
remainder. This test makes that safety a PROPERTY instead of a code-review
argument: hypothesis generates filter specs (typed, mistyped, NULL-laden,
range and multi-value) against a dataset whose partition paths include
NULL (``__HIVE_DEFAULT_PARTITION__``) values and boolean dirs, and asserts
that a fetch with the driver prune active returns exactly the rows of a
fetch with the prune disabled (Catalyst alone) — including raising the
identical validation errors. A separate case covers an UNPARSEABLE
partition directory: Spark 4 hard-errors on it (INVALID_PARTITION_VALUE),
and the conservative-keep rule means both modes surface that same error
instead of the prune silently hiding the corrupt layout."""

import importlib
import json
import os
import shutil

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.errors.exceptions.captured import SparkRuntimeException

# the package re-exports fetch() the FUNCTION under the same name as the
# module; import the module explicitly
fetch_mod = importlib.import_module("s3parq_spark.fetch")

from s3parq_spark.filters import OPS
from s3parq_spark.publish import publish_path


@pytest.fixture(scope="module")
def weird_dataset(spark, tmp_path_factory):
    """Partitions: p_i integer (−1, 0, 2, NULL) × p_b boolean (true/false,
    NULL), two rows per combination."""
    path = str(tmp_path_factory.mktemp("prune_eq") / "ds")
    rows = []
    rid = 0
    for p_i in (-1, 0, 2, None):
        for p_b in (True, False, None):
            for _ in range(2):
                rows.append((rid, p_i, p_b))
                rid += 1
    df = spark.createDataFrame(rows, "id long, p_i long, p_b boolean")
    publish_path(spark, path, df, ["p_i", "p_b"])
    return path


def _plant_garbage_dir(path: str) -> None:
    """Copy one data file under an unparseable p_i directory value and
    acknowledge it in the sidecar manifest."""
    src_dir = next(d for d in os.listdir(path) if d.startswith("p_i=2"))
    src_sub = os.listdir(os.path.join(path, src_dir))[0]
    src_file = next(
        f
        for f in os.listdir(os.path.join(path, src_dir, src_sub))
        if f.endswith(".parquet")
    )
    bad_rel = f"p_i=notanint/{src_sub}/{src_file}"
    os.makedirs(os.path.dirname(os.path.join(path, bad_rel)))
    shutil.copy(
        os.path.join(path, src_dir, src_sub, src_file),
        os.path.join(path, bad_rel),
    )
    sidecar = os.path.join(path, "_s3parq_metadata.json")
    with open(sidecar) as fh:
        meta = json.load(fh)
    meta["snapshots"][-1]["added"].append(bad_rel)
    with open(sidecar, "w") as fh:
        json.dump(meta, fh)


value_st = st.one_of(
    st.none(),
    st.integers(min_value=-2, max_value=3),
    st.booleans(),
    st.sampled_from(["1", "true", "false", "abc", "0.5", ""]),
)

filter_st = st.fixed_dictionaries(
    {
        "partition": st.sampled_from(["p_i", "p_b"]),
        "comparison": st.sampled_from(sorted(OPS)),
        "values": st.lists(value_st, min_size=1, max_size=3),
    }
)


def _rows(df):
    return sorted(tuple(str(c) for c in r) for r in df.collect())


def _run(spark, path, filters, prune_active: bool):
    real_prune = fetch_mod._prune_manifest_files
    if not prune_active:
        fetch_mod._prune_manifest_files = lambda files, meta, fltrs: files
    try:
        return ("ok", _rows(fetch_mod.fetch_path(spark, path, list(filters))))
    except (ValueError, TypeError, NotImplementedError) as e:
        return ("err", type(e).__name__)
    finally:
        fetch_mod._prune_manifest_files = real_prune


@given(filters=st.lists(filter_st, min_size=0, max_size=3))
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pruned_fetch_equals_unpruned_fetch(spark, weird_dataset, filters):
    assert _run(spark, weird_dataset, filters, True) == _run(
        spark, weird_dataset, filters, False
    )


def test_null_partition_arm_is_prune_exact(spark, weird_dataset):
    """The '== None' arm addresses the NULL partition through BOTH layers
    (eq filters on other values must prune those dirs away identically)."""
    for filters, expected in (
        ([{"partition": "p_i", "comparison": "==", "values": [None]}], 6),
        ([{"partition": "p_i", "comparison": "==", "values": [2, None]}], 12),
        (
            [
                {"partition": "p_i", "comparison": ">", "values": [0]},
                {"partition": "p_b", "comparison": "==", "values": [True]},
            ],
            2,
        ),
    ):
        pruned = _run(spark, weird_dataset, filters, True)
        assert pruned == _run(spark, weird_dataset, filters, False)
        assert pruned[0] == "ok" and len(pruned[1]) == expected


def test_unparseable_dir_fails_identically_in_both_modes(
    spark, tmp_path
):
    """Spark 4 refuses an unparseable partition directory value
    (INVALID_PARTITION_VALUE). The driver prune conservative-KEEPS any
    path value it cannot type, so the corrupt layout surfaces the same
    loud Spark error whether or not the prune ran — pruning never hides
    (or decides) what Catalyst would reject."""
    path = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [(0, 2, True), (1, 2, False)], "id long, p_i long, p_b boolean"
    )
    publish_path(spark, path, df, ["p_i", "p_b"])
    _plant_garbage_dir(path)
    filters = [{"partition": "p_i", "comparison": "==", "values": [2]}]
    for prune_active in (True, False):
        real_prune = fetch_mod._prune_manifest_files
        if not prune_active:
            fetch_mod._prune_manifest_files = lambda files, meta, fltrs: files
        try:
            with pytest.raises(SparkRuntimeException, match="INVALID_PARTITION_VALUE"):
                fetch_mod.fetch_path(spark, path, filters).collect()
        finally:
            fetch_mod._prune_manifest_files = real_prune


@pytest.fixture(scope="module")
def temporal_dataset(spark, tmp_path_factory):
    """Partitions: p_ts datetime (values whose path rendering needs URL
    escaping — colons — plus NULL) and p_s string (values with spaces,
    URL-escapable chars, and NULL)."""
    import datetime as dt

    path = str(tmp_path_factory.mktemp("prune_eq_t") / "ds")
    stamps = [
        dt.datetime(2021, 3, 1, 0, 0, 0),
        dt.datetime(2021, 3, 2, 13, 45, 10),
        dt.datetime(2022, 1, 1, 23, 59, 59),
        None,
    ]
    names = ["plain", "has space", "a:b=c", None]
    rows = []
    rid = 0
    for ts in stamps:
        for s in names:
            rows.append((rid, ts, s))
            rid += 1
    df = spark.createDataFrame(rows, "id long, p_ts timestamp, p_s string")
    publish_path(spark, path, df, ["p_ts", "p_s"])
    return path


t_value_st = st.one_of(
    st.none(),
    st.sampled_from(
        [
            "2021-03-01 00:00:00",
            "2021-03-02 13:45:10",
            "2022-01-01 23:59:59",
            "2020-01-01 00:00:00",
        ]
    ),
)
s_value_st = st.one_of(
    st.none(),
    st.sampled_from(["plain", "has space", "a:b=c", "missing", ""]),
    st.integers(min_value=0, max_value=2),
)

t_filter_st = st.one_of(
    st.fixed_dictionaries(
        {
            "partition": st.just("p_ts"),
            "comparison": st.sampled_from(sorted(OPS)),
            "values": st.lists(t_value_st, min_size=1, max_size=2),
        }
    ),
    st.fixed_dictionaries(
        {
            "partition": st.just("p_s"),
            "comparison": st.sampled_from(sorted(OPS)),
            "values": st.lists(s_value_st, min_size=1, max_size=2),
        }
    ),
)


@given(filters=st.lists(t_filter_st, min_size=0, max_size=2))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pruned_equals_unpruned_on_temporal_and_string(
    spark, temporal_dataset, filters
):
    """Datetime partitions render with URL-escaped colons in hive paths and
    string partitions can carry spaces/'='/':' — the driver prune parses
    and types exactly what Catalyst does, or conservatively keeps."""
    assert _run(spark, temporal_dataset, filters, True) == _run(
        spark, temporal_dataset, filters, False
    )


# ---------------------------------------------------------------------------
# zone-map skipping ≡ no skipping (r8)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def zoned_weird(spark, tmp_path_factory):
    """Value column ``x`` (float, zone-mapped) with NULLs, NaN, duplicated
    values and negative/fractional bounds across several small sorted
    files — the adversarial surface for per-file [min,max,nulls] skipping."""
    path = str(tmp_path_factory.mktemp("zone_eq") / "ds")
    vals = [-3.5, -3.5, -1.0, 0.0, 0.25, 1.0, 1.0, 2.5, 7.0, 9.5,
            None, None, float("nan"), 4.0, 4.0, 6.0]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = (
        spark.createDataFrame(rows, "id long, x double")
        .repartitionByRange(3, "x")
        .sortWithinPartitions("x")
    )
    publish_path(
        spark, path, df, [], max_records_per_file=3, rebalance=False,
        zone_map_columns=["x"],
    )
    return path


_zone_values = st.lists(
    st.one_of(
        st.sampled_from([-3.5, -1.0, 0.0, 0.25, 1.0, 2.5, 7.0, 9.5, 4.0]),
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        st.just(float("nan")),
        st.just(None),
        st.integers(-5, 10),
        st.booleans(),
        st.sampled_from(["0.25", "junk"]),
    ),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(cmp=st.sampled_from(list(OPS)), values=st.data())
def test_zone_skip_equivalence(spark, zoned_weird, cmp, values):
    from s3parq_spark.filters import SINGLE_VALUE_COMPARISONS

    vals = values.draw(
        _zone_values.map(lambda v: v[:1])
        if cmp in SINGLE_VALUE_COMPARISONS
        else _zone_values,
        label="values",
    )
    flt = [{"partition": "x", "comparison": cmp, "values": vals}]

    def run(skip_enabled):
        orig = fetch_mod._prune_zone_files
        if not skip_enabled:
            fetch_mod._prune_zone_files = lambda files, meta, zf, *a: files
        try:
            return (
                "rows",
                sorted(
                    r["id"]
                    for r in fetch_mod.fetch_path(
                        spark, zoned_weird, filters=flt
                    ).collect()
                ),
            )
        except (ValueError, TypeError) as exc:
            return ("err", type(exc).__name__, str(exc))
        finally:
            fetch_mod._prune_zone_files = orig

    with_skip = run(True)
    without = run(False)
    assert with_skip == without, (flt, with_skip, without)


# ---------------------------------------------------------------------------
# bloom-fingerprint skipping ≡ no skipping (r9)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bloomed_weird(spark, tmp_path_factory):
    """Integer key with NULLs, negatives, duplicates and collision-prone
    density across small ingest-ordered files, plus a string column with
    empty/unicode values — the adversarial surface for per-file
    fingerprint membership."""
    path = str(tmp_path_factory.mktemp("bloom_eq") / "ds")
    ks = [0, 1, -1, 7, 7, 42, 999, None, 12345, -12345, 3, None, 8, 64, 2, 5]
    ss = ["", "a", "Ü ✓", "dup", "dup", None, "x", "y", "z", "0", "-1",
          "long " * 20, None, "b", "c", "d"]
    rows = [(i, k, s) for i, (k, s) in enumerate(zip(ks, ss))]
    df = spark.createDataFrame(rows, "id long, k long, s string")
    publish_path(
        spark, path, df, [], max_records_per_file=3, rebalance=False,
        file_bloom_columns=["k", "s"], file_bloom_bits=256,
    )
    return path


_bloom_values = st.lists(
    st.one_of(
        st.sampled_from([0, 1, -1, 7, 42, 999, 12345, -12345, 3, 8, 64]),
        st.integers(-10**6, 10**6),
        st.just(None),
        st.booleans(),
        st.sampled_from(["7", "junk", ""]),
        # the numeric tower: integral floats/Decimals equal the int
        # row-level but hash differently — the r9 wrong-skip regression
        st.sampled_from([7.0, 42.0, 7.5, float("nan")]),
    ),
    min_size=1,
    max_size=3,
)


@settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(col=st.sampled_from(["k", "s"]), cmp=st.sampled_from(["==", "!="]),
       values=st.data())
def test_bloom_skip_equivalence(spark, bloomed_weird, col, cmp, values):
    vals = values.draw(_bloom_values, label="values")
    if col == "s":
        vals = [None if v is None else str(v) for v in vals]
    flt = [{"partition": col, "comparison": cmp, "values": vals}]

    def run(skip_enabled):
        orig = fetch_mod._prune_bloom_files
        if not skip_enabled:
            fetch_mod._prune_bloom_files = lambda files, meta, zf, *a: files
        try:
            return (
                "rows",
                sorted(
                    r["id"]
                    for r in fetch_mod.fetch_path(
                        spark, bloomed_weird, filters=flt
                    ).collect()
                ),
            )
        except (ValueError, TypeError) as exc:
            return ("err", type(exc).__name__, str(exc))
        finally:
            fetch_mod._prune_bloom_files = orig

    with_skip = run(True)
    without = run(False)
    assert with_skip == without, (flt, with_skip, without)
