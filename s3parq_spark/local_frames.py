"""Driver-side small-frame construction for the metadata serve plane.

``spark.createDataFrame(list_of_tuples, schema)`` builds a PICKLED PYTHON
RDD (``applySchemaToPythonRDD``): every downstream action deserializes it
through a Python worker task — ~0.2 s of pure boundary overhead per query
for a 3-row partition-values answer (guide §4: the JVM↔Python boundary is
the cost, not the rows). The Arrow path (``createDataFrame(pandas_df,
schema)``) lands the same rows as a JVM ``LocalTableScan``: zero Python
workers on every subsequent action, zero RDD machinery, and the
metadata-only plan contract ("LocalTableScan, no parquet scan") becomes
literal instead of approximated by an ExistingRDD scan.

``local_rows_df`` is the one shared constructor: tuple rows + a schema
(DDL string or StructType) → LocalTableScan-backed DataFrame, falling back
to the classic list path for any value the Arrow converter rejects, so
behavior is identical by construction (types that convert differently
raise in Arrow rather than coerce silently — the fallback path is the old
path).
"""

from __future__ import annotations

from typing import Iterable, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_rows_df(
    spark: SparkSession,
    rows: Iterable[tuple],
    schema: Union[str, T.StructType],
) -> DataFrame:
    """Small driver-side ``rows`` (tuples) → DataFrame via the Arrow /
    ``LocalTableScan`` path; falls back to the classic pickled-RDD path on
    any conversion error. Values and schema are identical either way (the
    fallback IS the old path)."""
    rows = list(rows)
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    try:
        import pandas as pd

        pdf = pd.DataFrame.from_records(rows, columns=schema.fieldNames())
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        return spark.createDataFrame(rows, schema)
