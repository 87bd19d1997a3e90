"""Equality oracles mirroring the reference's ``testing_helper.py`` contract
(SURVEY §5): row order and index are NOT part of the contract; values,
column sets, and dtypes are."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def _to_pandas(df) -> pd.DataFrame:
    return df.toPandas() if isinstance(df, DataFrame) else df


def _canon(v):
    """Canonical hashable form of one cell: numpy arrays/scalars reduce to
    plain Python containers/values so (a) long embedding arrays compare
    element-by-element instead of through numpy's ELIDED '...' repr (which
    made 1000+-element arrays that differ only in the hidden middle compare
    EQUAL), and (b) numpy scalar wrappers ('np.int64(1)') compare equal to
    the same Python value."""
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    tolist = getattr(v, "tolist", None)
    if tolist is not None and not isinstance(v, (str, bytes)):
        out = tolist()
        return tuple(_canon(x) for x in out) if isinstance(out, list) else out
    return v


def df_equal_by_set(df1, df2) -> bool:
    """Order-free comparison (reference ``testing_helper.py:38-57``): same
    columns, same multiset of rows."""
    p1, p2 = _to_pandas(df1), _to_pandas(df2)
    if sorted(p1.columns) != sorted(p2.columns):
        return False
    cols = sorted(p1.columns)
    rows1 = sorted(
        map(repr, (tuple(_canon(v) for v in row)
                   for row in p1[cols].itertuples(index=False, name=None)))
    )
    rows2 = sorted(
        map(repr, (tuple(_canon(v) for v in row)
                   for row in p2[cols].itertuples(index=False, name=None)))
    )
    return rows1 == rows2


def assert_sorted_dfs_equal(df1, df2, check_dtype: bool = False) -> None:
    """Reference ``sorted_dfs_equal_by_pandas_testing`` (``testing_helper.py:
    60-78``): reorder columns, sort by all columns, reset index,
    ``assert_frame_equal``."""
    p1, p2 = _to_pandas(df1), _to_pandas(df2)
    cols = sorted(p1.columns)
    s1 = p1[cols].sort_values(cols).reset_index(drop=True)
    s2 = p2[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(s1, s2, check_dtype=check_dtype)
