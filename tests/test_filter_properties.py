"""Property-based check: the Catalyst predicate built by filters_to_predicate
must agree with a brute-force Python evaluation of the reference's truth
table (OR across values, AND across partitions, first filter per partition)
on arbitrary integer partition data."""

from hypothesis import given, settings, strategies as st

from s3parq_spark.filters import (
    OPS,
    apply_filters_to_values,
    first_filter_per_partition,
)

values_st = st.sets(st.integers(min_value=-5, max_value=5), min_size=1, max_size=8)
filter_st = st.fixed_dictionaries(
    {
        "partition": st.just("p"),
        "comparison": st.sampled_from(sorted(OPS)),
        "values": st.lists(
            st.integers(min_value=-5, max_value=5), min_size=1, max_size=3
        ),
    }
)


@given(values=values_st, filters=st.lists(filter_st, min_size=0, max_size=3))
@settings(max_examples=200, deadline=None)
def test_value_filter_matches_brute_force(values, filters):
    got = apply_filters_to_values(values, filters, "p")
    fil = next((f for f in filters if f["partition"] == "p"), None)
    if fil is None:
        expected = set(values)
    else:
        op = OPS[fil["comparison"]]
        expected = {x for x in values if any(op(x, v) for v in fil["values"])}
    assert got == expected


@given(filters=st.lists(filter_st, min_size=0, max_size=5))
@settings(max_examples=100, deadline=None)
def test_first_filter_stable(filters):
    kept = first_filter_per_partition(filters)
    # at most one per partition, and it is the FIRST occurrence
    parts = [f["partition"] for f in kept]
    assert len(parts) == len(set(parts))
    for f in kept:
        first = next(x for x in filters if x["partition"] == f["partition"])
        assert f is first


def test_spark_predicate_matches_brute_force_sample(spark):
    """Spot-check the Catalyst predicate against the same brute force on a
    real DataFrame for a grid of comparisons."""
    from pyspark.sql import functions as F

    from s3parq_spark.filters import filters_to_predicate

    data = [(i,) for i in range(-3, 4)]
    df = spark.createDataFrame(data, ["p"])
    for cmp in OPS:
        vals = [0] if cmp in (">", "<", ">=", "<=") else [-1, 2]
        filters = [{"partition": "p", "comparison": cmp, "values": vals}]
        pred = filters_to_predicate(filters, {"p": "integer"})
        got = {r.p for r in df.filter(pred).collect()}
        expected = {
            i for i in range(-3, 4) if any(OPS[cmp](i, v) for v in vals)
        }
        assert got == expected, cmp


@given(filters=st.lists(filter_st, min_size=0, max_size=3))
@settings(max_examples=150, deadline=None)
def test_manifest_prune_agrees_with_truth_table(filters):
    """Driver-side manifest pruning must keep EXACTLY the files the
    reference truth table admits (OR across values, AND across partitions,
    first filter per partition) on hive int-partition paths — the same
    semantics Catalyst applies to the pruned remainder, so the two-layer
    prune can never change results."""
    from types import SimpleNamespace

    from s3parq_spark.fetch import _prune_manifest_files

    # single-value inequality rule mirrors validate_filter_rules
    filters = [
        f for f in filters
        if f["comparison"] == "==" or len(f["values"]) == 1
    ]
    meta = SimpleNamespace(partition_data_types={"p": "integer"})
    files = [f"p={i}/part.parquet" for i in range(-5, 6)]
    got = _prune_manifest_files(files, meta, filters)
    fil = next((f for f in filters if f["partition"] == "p"), None)
    if fil is None:
        expected = files
    else:
        op = OPS[fil["comparison"]]
        expected = [
            f"p={i}/part.parquet" for i in range(-5, 6)
            if any(op(i, v) for v in fil["values"])
        ]
    assert got == expected


@given(
    values=st.sets(
        st.one_of(st.none(), st.integers(min_value=-5, max_value=5)),
        min_size=1, max_size=8,
    ),
    filters=st.lists(
        st.fixed_dictionaries(
            {
                "partition": st.just("p"),
                "comparison": st.sampled_from(sorted(OPS)),
                "values": st.lists(
                    st.one_of(
                        st.none(), st.integers(min_value=-5, max_value=5)
                    ),
                    min_size=1, max_size=3,
                ),
            }
        ),
        min_size=0, max_size=2,
    ),
)
@settings(max_examples=200, deadline=None)
def test_null_truth_table_is_total_and_sql_shaped(values, filters):
    """With NULLs on either side, the driver-side truth table must be
    TOTAL (no TypeError) and follow the documented contract: None matches
    only '==' with None among the values; None filter values match no
    non-null partition value under ordering comparisons."""
    got = apply_filters_to_values(values, filters, "p")
    fil = next((f for f in filters if f["partition"] == "p"), None)
    if fil is None:
        assert got == set(values)
        return
    op = OPS[fil["comparison"]]
    expected = set()
    for x in values:
        if x is None:
            if fil["comparison"] == "==" and None in fil["values"]:
                expected.add(x)
            continue
        if any(v is not None and op(x, v) for v in fil["values"]):
            expected.add(x)
    assert got == expected
