"""Reference filter semantics → Catalyst predicates.

The reference's query language is a list of filter dicts
``{"partition": str, "comparison": str, "values": [...]}``
(``/root/reference/s3parq/fetch_parq.py:23-36``) evaluated against partition
*path values* before any file I/O. Semantics replicated here exactly
(SURVEY.md §2.2 F1/F2/F5):

- comparisons: ``== != > < >= <=``;
- ``> < >= <=`` take exactly ONE value (``fetch_parq.py:599-614``);
- ``> < >= <=`` are rejected on non-numeric partition types
  (string/category/bool — datetime IS orderable, ``fetch_parq.py:629-645``);
- within one filter: OR across ``values``; across partitions: AND;
- only the FIRST filter naming a given partition applies
  (``fetch_parq.py:469`` — ``next(f for f in filters ...)``).

NULL partition values (``__HIVE_DEFAULT_PARTITION__`` — a case the
reference's string-only path values never produce, so its truth table is
silent on it) follow SQL three-valued logic: no comparison against a
non-NULL value matches a NULL partition, so ``!=`` does NOT return the
NULL partition's rows. The one extension: ``== [None]`` (or None among
the ``==`` values) selects the NULL partition explicitly (``IS NULL``
semantics) — otherwise those rows would be unreachable through filters.

Instead of cross-producting surviving path prefixes on the driver
(``fetch_parq.py:480-498``), the predicate is handed to Catalyst as a
``Column`` on partition columns, where ``PruneFileSourcePartitions`` prunes
the file index before any data is scanned — the same "filter before I/O"
guarantee, but planned by Spark and valid at any number of partitions.
"""

from __future__ import annotations

import operator
from functools import reduce
from typing import Dict, List

from pyspark.sql import Column
from pyspark.sql import functions as F

from .metadata import DATETIME_FORMAT, convert_type

OPS = {
    "==": operator.eq,
    "!=": operator.ne,
    ">=": operator.ge,
    "<=": operator.le,
    ">": operator.gt,
    "<": operator.lt,
}

SINGLE_VALUE_COMPARISONS = (">", "<", "<=", ">=")

NON_NUM_TYPES = ("string", "category", "bool", "boolean")


def validate_filter_rules(filters: List[dict]) -> None:
    """Shape validation — reference ``_validate_filter_rules``
    (``fetch_parq.py:588-614``)."""
    for f in filters:
        if not all(k in f for k in ("partition", "comparison", "values")):
            raise ValueError("Filters require partition, comparison, and values.")
        if f["comparison"] not in OPS:
            raise ValueError(f"Comparison {f['comparison']} is not supported.")
        if f["comparison"] in SINGLE_VALUE_COMPARISONS and len(f["values"]) != 1:
            raise ValueError(
                f"Comparison {f['comparison']} can only be used with one filter value."
            )


def validate_matching_filter_data_type(
    part_types: Dict[str, str], filters: List[dict]
) -> None:
    """Type validation — reference ``_validate_matching_filter_data_type``
    (``fetch_parq.py:617-645``). Spark itself would happily order strings; the
    reference forbids it, so we reject at the API layer."""
    for f in filters:
        if f["partition"] not in part_types:
            raise ValueError("Filter does not have a matching partition.")
        part_type = part_types[f["partition"]]
        if f["comparison"] in SINGLE_VALUE_COMPARISONS and part_type in NON_NUM_TYPES:
            raise ValueError(
                f"Comparison {f['comparison']} cannot be used on partition "
                f"types of {part_type}"
            )


def _typed_value(value, dtype: str):
    """Coerce a filter value to the partition's metadata type the same way the
    reference types path values (``convert_type``, ``fetch_parq.py:283-305``),
    so e.g. a ``'2025-01-01 00:00:00'`` string filters a datetime partition.
    Python's ``bool ⊂ int`` extends the same courtesy to boolean literals
    against numeric partitions (``True == 1`` in the reference's Python
    comparisons) — coerced HERE so the Catalyst literal is numeric too
    (Spark 4 has no boolean↔bigint implicit cast and would fail analysis)."""
    if value is None:
        return None
    if isinstance(value, str) and dtype not in ("string", "category"):
        return convert_type(value, dtype)
    if isinstance(value, bool) and dtype == "integer":
        return int(value)
    if isinstance(value, bool) and dtype == "float":
        return float(value)
    if dtype in ("bool", "boolean") and not isinstance(value, bool):
        import decimal as _decimal

        # Python's numeric tower: 1 == 1.0 == Decimal(1) == True — any
        # numeric equal to 0/1 compares as that boolean in the reference
        if isinstance(value, (int, float, _decimal.Decimal)) and value in (0, 1):
            return bool(value)
    return value


def _value_class(v) -> str:
    import datetime as _dt
    import decimal as _decimal

    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, float, _decimal.Decimal)):
        return "num"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return "dt"
    if isinstance(v, str):
        return "str"
    return "other"


_DTYPE_CLASS = {
    "integer": "num",
    "float": "num",
    "datetime": "dt",
    "date": "dt",
    "bool": "bool",
    "boolean": "bool",
    "string": "str",
    "category": "str",
}


def _compatible(dtype: str, v) -> bool:
    """Whether a (typed) filter value can meaningfully compare against the
    partition dtype, mirroring the Python truth table the reference's
    driver comparisons produce (``'x' == 5`` is False, never an error).
    Non-string values against STRING partitions are incompatible too: the
    old let-Catalyst-cast behavior became a runtime crash under Spark 4's
    ANSI casts (``CAST_INVALID_INPUT`` the moment any partition value is
    non-numeric), and the reference's semantics were always no-match."""
    dcls = _DTYPE_CLASS.get(dtype, "num")  # decimal(p,s) and friends: num
    vcls = _value_class(v)
    if dcls == vcls:
        return True
    if dcls == "num" and vcls == "bool":
        return True  # _typed_value already coerced; defensive
    return False


def first_filter_per_partition(filters: List[dict]) -> List[dict]:
    """Reference keeps only the first filter naming each partition
    (``fetch_parq.py:469``)."""
    seen = set()
    out = []
    for f in filters:
        if f["partition"] in seen:
            continue
        seen.add(f["partition"])
        out.append(f)
    return out


def filters_to_predicate(
    filters: List[dict], part_types: Dict[str, str]
) -> Column:
    """Build the Catalyst predicate: OR across a filter's values, AND across
    partitions. ``==`` over many values lowers to ``isin`` (one In-filter that
    pushes into partition pruning); everything else is an explicit OR-reduce
    of binary comparisons — identical truth table to the reference's
    ``_get_filtered_key_list`` loop (``fetch_parq.py:467-476``)."""
    preds: List[Column] = []
    for f in first_filter_per_partition(filters):
        dtype = part_types[f["partition"]]
        col = F.col(f["partition"])
        values = [_typed_value(v, dtype) for v in f["values"]]
        cmp = f["comparison"]
        # type-incompatible values (a datetime against an integer
        # partition, 2 against a boolean, ...) follow the reference's
        # Python truth table instead of failing Catalyst analysis:
        # '==' never matches, '!=' matches every non-NULL row, ordering
        # raises (exactly what `5 > datetime` does in Python)
        incompat = [v for v in values if v is not None and not _compatible(dtype, v)]
        if incompat and cmp not in ("==", "!="):
            raise ValueError(
                f"Comparison {cmp} cannot compare partition type {dtype} "
                f"with values {incompat!r}"
            )
        values = [v for v in values if v is None or _compatible(dtype, v)]
        if cmp == "==":
            non_null = [v for v in values if v is not None]
            pred = col.isin(non_null) if non_null else F.lit(False)
            if len(non_null) < len(values):
                # None among the values: isin never matches NULL, so the
                # NULL partition needs an explicit IS NULL arm
                pred = pred | col.isNull()
            preds.append(pred)
        elif cmp == "!=" and incompat:
            # at least one no-match value: x != v is TRUE for every
            # non-NULL x (OR-semantics across the filter's values)
            preds.append(col.isNotNull())
        else:
            op = OPS[cmp]
            terms = [op(col, F.lit(v)) for v in values]
            preds.append(
                reduce(operator.or_, terms) if terms else F.lit(False)
            )
    if not preds:
        return F.lit(True)
    return reduce(operator.and_, preds)


def apply_filters_to_values(values: set, filters: List[dict], partition: str):
    """Driver-side replica of the truth table over an in-memory set of
    typed partition values — kept as the property-test oracle for the
    Catalyst predicate (the product's metadata-value queries apply their
    own typed pruning in ``fetch``). NULL values follow the module
    contract: no comparison matches None except ``==`` with None among
    its values."""
    fil = next((f for f in filters if f["partition"] == partition), None)
    if fil is None:
        return set(values)
    op = OPS[fil["comparison"]]
    eq = fil["comparison"] == "=="
    out = set()
    for x in values:
        if x is None:
            if eq and any(v is None for v in fil["values"]):
                out.add(x)
            continue
        if any(v is not None and op(x, v) for v in fil["values"]):
            out.add(x)
    return out


def in_literals(values, vocab: str) -> str:
    """Comma-joined SQL literals for an ``IN`` predicate, typed per the
    dataset vocabulary — the shared helper behind every id/term
    tombstone predicate (text and ANN index maintenance both build
    ``key IN (...)`` strings for ``delete_where``). Spark SQL string
    literals treat BOTH backslash and quote as escapes: escape
    backslash first, then the quote."""
    if vocab == "integer":
        return ", ".join(str(int(v)) for v in values)
    return ", ".join(
        "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"
        for v in values
    )
