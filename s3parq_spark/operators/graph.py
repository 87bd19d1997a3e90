"""Link-graph analysis over DataFrame joins — PageRank for web-corpus
curation.

Hyperlink centrality is a standard quality/spam signal when curating a
crawl-scale pretraining corpus (pages many reputable hosts link to are
kept; link-farm islands are down-weighted). The classic formulation is
iterative sparse matrix-vector multiplication; in Spark it is K rounds of
``join rank with edges on src → groupBy dst → sum`` — every exchange keyed
by a node id, never a collect, so the iteration scales with the edge list.

Reference analog: none (the reference has no graph surface); extension per
SURVEY §7.4.

Determinism contract (the repo-wide oracle rule): ranks are INTEGER
micro-units (scale 1e9) under floor division, so every iteration is exact
integer arithmetic — no float summation order to drift between Spark,
DuckDB, and cluster sizes. With rank mass bounded by ``n_nodes * scale``,
the 64-bit headroom holds to ~10^8 nodes at the default scale; beyond
that, lower ``scale`` (the tests pin exactness, not precision).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]

#: default integer rank scale: 1 "rank" = 1e9 micro-units
PAGERANK_SCALE = 10**9


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list; returns
    ``(node, rank)`` with ``rank`` in integer micro-units of ``scale``.

    Semantics (the standard simplified formulation): nodes are the
    distinct endpoints of ``edges`` (parallel edges collapse — link
    multiplicity is not endorsement multiplicity); every node starts at
    ``scale``; each round
    ``rank'(v) = scale*(1-d) + d * Σ_{u→v} rank(u) div out_degree(u)``
    with d = ``damping_num/damping_den`` applied in integer arithmetic
    (``div`` = floor division — all quantities non-negative). Dangling
    nodes (no out-links) keep receiving the base term but distribute
    nothing; their mass leaks, as in the classic simplified variant.

    Plan shape: out-degrees are ONE hash aggregate joined back on ``src``
    (both sides hash-partitioned on the node key); each iteration is one
    ``src``-keyed join + one ``dst``-keyed aggregate + one left join onto
    the node spine for the no-inlink base case. ``iterations`` is a small
    constant (3-10 in curation practice), so the lineage stays shallow
    enough to plan without checkpointing; the working set is
    O(nodes + edges) rows of two numeric columns regardless of corpus
    payload size.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not (0 < damping_num < damping_den):
        raise ValueError("damping must satisfy 0 < num < den")
    if src not in edges.columns or dst not in edges.columns:
        raise ValueError(f"columns {src!r}/{dst!r} not in edges")

    e = (
        edges.select(F.col(src).alias("__pr_src"), F.col(dst).alias("__pr_dst"))
        .filter(F.col("__pr_src").isNotNull() & F.col("__pr_dst").isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("__pr_src").alias("node"))
        .unionByName(e.select(F.col("__pr_dst").alias("node")))
        .distinct()
    )
    degree = e.groupBy("__pr_src").agg(F.count(F.lit(1)).alias("__pr_deg"))
    # out-degree rides WITH the edge list so the per-iteration join is
    # rank⋈edges only (degree is joined once, not once per round)
    e_deg = e.join(degree, "__pr_src")

    base = F.lit(int(scale * (damping_den - damping_num) // damping_den))

    def step(rank_df: DataFrame) -> DataFrame:
        contrib = (
            e_deg.join(
                rank_df.withColumnRenamed("node", "__pr_src"), "__pr_src"
            )
            .select(
                F.col("__pr_dst").alias("node"),
                F.expr("rank div __pr_deg").alias("__pr_c"),
            )
            .groupBy("node")
            .agg(F.sum("__pr_c").alias("__pr_in"))
        )
        return nodes.join(contrib, "node", "left").select(
            "node",
            (
                base
                + F.expr(
                    f"({damping_num} * coalesce(__pr_in, 0)) div {damping_den}"
                )
            ).alias("rank"),
        )

    rank = nodes.select("node", F.lit(int(scale)).cast("long").alias("rank"))
    for _ in range(iterations):
        rank = step(rank)
    return rank
