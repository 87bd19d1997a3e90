"""Bit parity of the vectorized argmax-cell assignment (r16, guide §4.2)
with the Catalyst expression form it replaced:

    s = transform(centroids, c -> aggregate(zip_with(v, c, *), 0.0, +)) / norms
    cell = (array_position(s, array_max(s)) - 1).cast("int")

The centroids ARE the stored quantizer artifact and the DuckDB oracle
replays the exact arithmetic, so the assignment must be bit-identical —
sequential-left-fold dots (numpy cumsum), first-max ties, NaN-greatest,
NULL/ragged rows NULL. Every case here runs BOTH forms over the same
frame and requires exact equality.
"""

import math

import pytest
from pyspark.sql import functions as F

from s3parq_spark.operators.similarity import (
    _assign_whole_vec,
    _cell_scores,
    assign_codes_arrow,
)


def _expr_assign(df, vec_col, out_col, cents, cnorms):
    s = _cell_scores(F.col(vec_col), cents, cnorms)
    return df.withColumn(
        out_col, (F.array_position(s, F.array_max(s)) - 1).cast("int")
    )


def _expr_codes(df, vec_col, specs):
    out = df
    for out_col, off, sub, cents, cnorms, _strict in specs:
        s = _cell_scores(F.slice(F.col(vec_col), off + 1, sub), cents, cnorms)
        out = out.withColumn(
            out_col, (F.array_position(s, F.array_max(s)) - 1).cast("int")
        )
    return out


def _norms(cents):
    return [max(1e-12, sum(x * x for x in v) ** 0.5) for v in cents]


def _cmp(spark, rows, dim_cents, whole=True, specs=None):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)], "id long, v array<double>"
    )
    if whole:
        cn = _norms(dim_cents)
        a = _assign_whole_vec(df, "v", "c", dim_cents, cn)
        b = _expr_assign(df, "v", "c", dim_cents, cn)
        cols = ["c"]
    else:
        a = assign_codes_arrow(df, "v", specs)
        b = _expr_codes(df, "v", specs)
        cols = [s[0] for s in specs]
    ra = {r["id"]: tuple(r[c] for c in cols) for r in a.collect()}
    rb = {r["id"]: tuple(r[c] for c in cols) for r in b.collect()}
    assert ra == rb, (ra, rb)
    return ra


def test_parity_real_embeddings(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = [list(r["v"]) for r in emb.orderBy("vec_id").limit(16).collect()]
    cn = _norms(cents)
    a = _assign_whole_vec(emb, "v", "c", cents, cn)
    b = _expr_assign(emb, "v", "c", cents, cn)
    ra = {r["vec_id"]: r["c"] for r in a.collect()}
    rb = {r["vec_id"]: r["c"] for r in b.collect()}
    assert ra == rb and len(ra) > 100


def test_parity_randomized_shapes(spark):
    import random

    rng = random.Random(42)
    for k, dim in ((3, 5), (16, 8), (33, 17)):
        cents = [
            [rng.uniform(-2, 2) for _ in range(dim)] for _ in range(k)
        ]
        rows = [
            [rng.uniform(-2, 2) for _ in range(dim)] for _ in range(500)
        ]
        # force ties: duplicate a centroid so two cells score equal
        cents[min(1, k - 1)] = list(cents[0])
        _cmp(spark, rows, cents)


def test_parity_edge_rows(spark):
    dim = 4
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.5, 0.5, 0.5, 0.5]]
    rows = [
        [1.0, 2.0, 3.0, 4.0],                 # plain
        None,                                  # NULL vector
        [1.0, 2.0],                            # too short
        [1.0, 2.0, 3.0, 4.0, 5.0],             # too long
        [1.0, None, 3.0, 4.0],                 # NULL element
        [float("nan"), 1.0, 1.0, 1.0],         # NaN -> NaN scores
        [float("inf"), 1.0, 1.0, 1.0],         # +Inf scores
        [-float("inf"), 1.0, 1.0, 1.0],        # -Inf scores
        [0.0, -0.0, 0.0, -0.0],                # signed zeros / zero dots
        [],                                    # empty vector
    ]
    got = _cmp(spark, rows, cents)
    # the semantics themselves, pinned (not just parity): NULL/ragged rows
    # are NULL; a NaN score wins at the first NaN cell
    assert got[1] == (None,) and got[2] == (None,) and got[3] == (None,)
    assert got[4] == (None,) and got[9] == (None,)


def test_parity_nan_in_centroid(spark):
    # a NaN centroid poisons ONE score lane for every row: Spark picks
    # the NaN cell (NaN greatest); the fast path must do the same
    cents = [[1.0, 0.0], [float("nan"), 1.0], [0.0, 1.0]]
    rows = [[1.0, 2.0], [3.0, -1.0], [0.0, 0.0]]
    got = _cmp(spark, rows, cents)
    assert all(v == (1,) for v in got.values())


def test_parity_pq_slices(spark):
    import random

    rng = random.Random(7)
    dim, m = 8, 2
    sub = dim // m
    books = [
        [[rng.uniform(-1, 1) for _ in range(sub)] for _ in range(4)]
        for _ in range(m)
    ]
    specs = [
        (f"code_{j}", j * sub, sub, books[j], _norms(books[j]), False)
        for j in range(m)
    ]
    rows = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(300)]
    # slice semantics differ from whole-vector: longer rows still encode
    rows += [
        [1.0] * (dim + 2),                     # longer: codes still valid
        [1.0] * (dim - 1),                     # short: second slice NULL
        None,
        [1.0, None] + [1.0] * (dim - 2),       # NULL element in slice 0
    ]
    got = _cmp(spark, rows, None, whole=False, specs=specs)
    long_row = got[len(rows) - 4]
    assert all(v is not None for v in long_row)
    short_row = got[len(rows) - 3]
    assert short_row[1] is None and short_row[0] is not None


def test_parity_empty_centroids_still_refuses(spark):
    # the expression form could never resolve an empty centroid array
    # (F.array() of nothing is VOID-typed) — the fallback preserves that
    # loud refusal rather than inventing a NULL behavior
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, v array<double>")
    with pytest.raises(Exception):
        _assign_whole_vec(df, "v", "c", [], []).collect()


def test_kmeans_centroids_unchanged_vs_r15(spark, sf_dir):
    """The training artifact itself: centroids over the real fixture must
    be bit-identical to the r15 expression-form implementation (inlined
    here as the reference)."""
    from s3parq_spark.operators.similarity import kmeans_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = kmeans_centroids(emb, "vec_id", "embedding", k=8, iters=2)

    # reference: the pre-r16 formulation, expression assignment + the
    # same explode/decimal mean
    corpus = emb.select(
        F.col("vec_id").alias("__id"),
        F.col("embedding").cast("array<double>").alias("__vec"),
    ).filter(F.col("__vec").isNotNull())
    cents = [
        list(r["__vec"]) for r in corpus.orderBy("__id").limit(8).collect()
    ]
    k = len(cents)
    for _ in range(2):
        cnorms = _norms(cents)
        s = _cell_scores(F.col("__vec"), cents, cnorms)
        assigned = corpus.withColumn(
            "__cell", (F.array_position(s, F.array_max(s)) - 1).cast("int")
        )
        means = (
            assigned.select(
                "__cell", F.posexplode("__vec").alias("__pos", "__x")
            )
            .groupBy("__cell", "__pos")
            .agg(
                (
                    F.sum(F.col("__x").cast("decimal(30,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("__m")
            )
            .collect()
        )
        new = {}
        for r in means:
            new.setdefault(r["__cell"], {})[r["__pos"]] = r["__m"]
        cents = [
            [new[c][p] for p in range(len(cents[0]))] if c in new else cents[c]
            for c in range(k)
        ]
    import struct

    pack = lambda m: [[struct.pack("<d", x) for x in v] for v in m]
    assert pack(got) == pack(cents)


def _expr_qerr_frame(df, vec_col, cents, cnorms):
    s = _cell_scores(F.col(vec_col), cents, cnorms)
    vnorm = F.greatest(
        F.lit(1e-12),
        F.sqrt(
            F.aggregate(
                F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x
            )
        ),
    )
    return df.select((F.lit(1.0) - F.array_max(s) / vnorm).alias("__qerr"))


def test_qerr_parity_real_and_edges(spark, sf_dir):
    import struct

    from s3parq_spark.operators.similarity import qerr_arrow

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    cents = [list(r["v"]) for r in emb.limit(16).collect()]
    cn = _norms(cents)

    def vals(df):
        return sorted(
            (
                b""
                if r["__qerr"] is None
                else struct.pack("<d", r["__qerr"])
            )
            for r in df.collect()
        )

    a = vals(qerr_arrow(emb, "v", cents, cn))
    b = vals(_expr_qerr_frame(emb, "v", cents, cn))
    assert a == b and len(a) > 100

    # edges: ragged / NULL element / NaN / Inf / zero vector
    dim = len(cents[0])
    rows = [
        [1.0] * dim,
        [1.0] * (dim - 1),
        [1.0] * (dim + 1),
        [None] + [1.0] * (dim - 1),
        [float("nan")] + [1.0] * (dim - 1),
        [float("inf")] + [1.0] * (dim - 1),
        [0.0] * dim,
    ]
    df = spark.createDataFrame([(v,) for v in rows], "v array<double>")
    assert vals(qerr_arrow(df, "v", cents, cn)) == vals(
        _expr_qerr_frame(df, "v", cents, cn)
    )


def test_batch_qerr_aggregate_unchanged(spark, sf_dir):
    """The stored drift numbers: _batch_qerr's (n, sum) on the real
    fixture must equal the r15 expression-form aggregate exactly."""
    import importlib

    ann = importlib.import_module("s3parq_spark.ann_index")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = [
        list(r["e"])
        for r in emb.select(
            F.col("embedding").cast("array<double>").alias("e")
        ).limit(8).collect()
    ]
    n, s = ann._batch_qerr(emb, "embedding", cents)

    cn = _norms(cents)
    sc = _cell_scores(F.col("embedding").cast("array<double>"), cents, cn)
    vnorm = F.greatest(
        F.lit(1e-12),
        F.sqrt(
            F.aggregate(
                F.col("embedding").cast("array<double>"),
                F.lit(0.0),
                lambda a, x: a + x * x,
            )
        ),
    )
    err = F.lit(1.0) - F.array_max(sc) / vnorm
    row = (
        emb.filter(F.col("embedding").isNotNull())
        .select(
            F.count(F.lit(1)).alias("n"),
            F.sum(err.cast("decimal(30,12)")).cast("double").alias("s"),
        )
        .collect()[0]
    )
    import struct

    assert n == int(row["n"])
    assert struct.pack("<d", s) == struct.pack("<d", float(row["s"]))
