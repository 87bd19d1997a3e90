"""Round-5 second-wave queries: corpus curation end-to-end — deterministic
split assignment, per-source token budgeting, cross-document line dedup,
benchmark decontamination, full fuzzy-dedup (corpus out, not pairs out),
and dataset rollback (restore) under the oracle gate.

Every query follows the repo's oracle-exactness rules (ARCHITECTURE.md):
integer counts stay integer on both engines (DuckDB SUM/window-SUM cast to
BIGINT), at most one float op per output value, identical aliases on both
sides, no raw array/list output columns.

Registered into ``workload.QUERIES`` / ``workload.ORACLE_SQL`` by the
import at the bottom of ``workload.py``.
"""

from __future__ import annotations

import os
import posixpath
import re
import shutil
from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .local_frames import local_rows_df


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(posixpath.join(sf_dir, f"{name}.parquet"))


_HASH60_SQL = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# deterministic split assignment
# ---------------------------------------------------------------------------


def q_split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment (operators/sampling.py
    assign_splits): split membership is a pure function of the doc id
    (portable md5-60-bit hash mod 10000 against cumulative fraction
    bounds), so a document lands in the same split on every run and every
    cluster size, and never migrates when the corpus grows. A projection —
    no shuffle, composes with partition pruning."""
    from .operators.sampling import assign_splits

    docs = _table(spark, sf_dir, "documents")
    return assign_splits(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "source", "split")


# ---------------------------------------------------------------------------
# per-source token-budget selection
# ---------------------------------------------------------------------------


def q_token_budget_select(spark, sf_dir):
    """Quality-ranked token budgeting (operators/sampling.py
    token_budget_select): per source, rank documents by distinct-token
    ratio (best first, id tiebreak) and keep the prefix whose running
    token count stays within a 600-token budget — the step that turns
    quality scores into an actual per-source training mix. One window per
    source (per-key sort, parallel across sources, no global sort)."""
    from .operators.sampling import token_budget_select

    docs = _table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("bigint").alias("n_tokens"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("quality"),
    )
    return token_budget_select(
        scored,
        id_col="doc_id",
        group_col="source",
        order_col="quality",
        tokens_col="n_tokens",
        budget=600,
    ).select("doc_id", "source", "n_tokens", "cum_tokens")


# ---------------------------------------------------------------------------
# cross-document line-level dedup (boilerplate removal)
# ---------------------------------------------------------------------------

_BP_HEADER = "subscribe to our newsletter for updates"
_BP_FOOTER = "copyright footer all rights reserved"


def _lined_documents(spark, sf_dir):
    """Documents re-rendered as newline-separated 8-token lines, with
    boilerplate planted deterministically: every even doc gets a shared
    header line, every doc_id % 3 == 0 a shared footer — the fixture both
    engines build identically (testdata text has no newlines)."""
    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    )
    lines = F.transform(
        F.sequence(
            F.lit(0), F.floor((F.size("w") - F.lit(1)) / F.lit(8)).cast("int")
        ),
        lambda i: F.concat_ws(" ", F.slice("w", i * 8 + 1, 8)),
    )
    with_header = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.array(F.lit(_BP_HEADER)), lines),
    ).otherwise(lines)
    with_footer = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(with_header, F.array(F.lit(_BP_FOOTER))),
    ).otherwise(with_header)
    return docs.select(
        "doc_id", F.concat_ws("\n", with_footer).alias("text_lined")
    )


def q_line_dedup(spark, sf_dir):
    """Cross-document line dedup (operators/text.py
    remove_duplicated_lines — the RefinedWeb/CCNet boilerplate filter):
    lines appearing in >= 2 documents are dropped corpus-wide, each
    document's surviving lines reassembled in original order. The planted
    header/footer lines vanish from every document; the hash compare runs
    over every reconstructed document, so one mis-ordered or leaked line
    anywhere is a red row. Plan: explode -> distinct -> line-df hash agg ->
    join-back on the line key -> per-doc ordered reassembly."""
    from .operators.text import remove_duplicated_lines

    return remove_duplicated_lines(
        _lined_documents(spark, sf_dir),
        "doc_id",
        "text_lined",
        sep="\n",
        min_doc_freq=2,
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (corpus out)
# ---------------------------------------------------------------------------


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/dedup.py decontaminate — the
    GPT-3/PaLM n-gram rule, n scaled to the testdata): training docs
    (source src0-src9) sharing any 5-token shingle with the benchmark half
    (src10+) are dropped; the CLEAN corpus is returned, which is what the
    pipeline actually consumes (ngram_contamination reports the pairs;
    this enforces them). The benchmark's distinct shingle set is the
    broadcast side; the training corpus is never reshuffled."""
    from .operators.dedup import decontaminate

    docs = _table(spark, sf_dir, "documents").withColumn(
        "__src_num", F.substring("source", 4, 10).cast("int")
    )
    train = docs.filter(F.col("__src_num") < 10)
    bench = docs.filter(F.col("__src_num") >= 10)
    return decontaminate(train, bench, "doc_id", "text", n=5).select(
        "doc_id", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# full fuzzy dedup: corpus out
# ---------------------------------------------------------------------------


def q_minhash_dedup_corpus(spark, sf_dir):
    """End-to-end fuzzy dedup (operators/dedup.py fuzzy_dedup_corpus —
    the SlimPajama/BigCode pipeline as one operator): MinHash-LSH
    candidates -> exact-Jaccard verify -> connected components -> keep the
    min-id doc per cluster plus all unclustered docs, returning the KEPT
    corpus. The oracle recomputes the same clusters from the exact
    all-pairs Jaccard set with a recursive CTE and keeps the complement of
    the losers — so LSH banding, verification, component labels, and the
    removal join must all agree exactly."""
    from .operators.dedup import fuzzy_dedup_corpus

    docs = _table(spark, sf_dir, "documents")
    return fuzzy_dedup_corpus(
        docs, "doc_id", "text", broadcast_verify=True
    ).select("doc_id", "source")


# ---------------------------------------------------------------------------
# dataset rollback (restore) under the gate
# ---------------------------------------------------------------------------


def q_restore_fetch(spark, sf_dir):
    """Dataset rollback end-to-end (publish.py restore_dataset): publish
    nation keys < 10 as v1, append the rest as v2, append a garbage
    duplicate batch as v3 — then restore to v2. Asserts the lifecycle:
    fetch sees the garbage before the restore; dry_run reports v3's files
    without touching them; the restore removes exactly those files and
    truncates history to [1, 2]; time travel to v1 still works. Oracle =
    the clean nation table (v1 + v2). Restore is O(files removed) driver
    work + unlinks — a metadata operation, never a table rewrite."""
    from .fetch import fetch_path, fetch_at, list_versions
    from .publish import publish_path, restore_dataset
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "restore_rt")
    shutil.rmtree(path, ignore_errors=True)
    nation = _table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    publish_path(
        spark, path, nation.filter(F.col("n_nationkey") < 10), ["n_regionkey"]
    )
    publish_path(
        spark,
        path,
        nation.filter(F.col("n_nationkey") >= 10),
        ["n_regionkey"],
        mode="append",
    )
    garbage = nation.withColumn(
        "n_nationkey", F.col("n_nationkey") + F.lit(1000)
    )
    v3_files = publish_path(spark, path, garbage, ["n_regionkey"], mode="append")

    n_clean = nation.count()
    assert fetch_path(spark, path).count() == 2 * n_clean, "v3 not visible"
    rel_v3 = sorted(v3_files)  # publish_path returns dataset-relative paths
    planned = restore_dataset(spark, path, 2, dry_run=True)
    assert planned == rel_v3, f"dry_run planned {planned}, expected {rel_v3}"
    assert fetch_path(spark, path).count() == 2 * n_clean, "dry_run mutated"
    removed = restore_dataset(spark, path, 2)
    assert removed == rel_v3, f"restore removed {removed}"
    assert [v["version"] for v in list_versions(spark, path)] == [1, 2]
    assert fetch_at(spark, path, 1).count() == nation.filter(
        F.col("n_nationkey") < 10
    ).count(), "time travel to v1 broken after restore"
    return fetch_path(spark, path)


# ---------------------------------------------------------------------------
# partition evolution under the gate
# ---------------------------------------------------------------------------


def q_repartition_fetch(spark, sf_dir):
    """Partition evolution (publish.py repartition_dataset): documents are
    published ``partitionBy(source)`` (the ingest layout), then rewritten
    ``partitionBy(lang)`` because the hot filter is on language — and the
    post-migration fetch with a lang filter must prune at the FILE INDEX
    (asserted on the plan: ``PartitionFilters`` carries the lang
    predicate, and only lang=en directories are read). The rewrite is the
    compaction machinery: fetch → one shuffle into the new key →
    temp-dir + two-rename swap; history resets to v1 (a rewrite is
    destructive and the history says so)."""
    from .fetch import fetch_path, list_versions
    from .publish import publish_path, repartition_dataset
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "repartition_rt")
    shutil.rmtree(path, ignore_errors=True)
    docs = _table(spark, sf_dir, "documents")
    publish_path(spark, path, docs, ["source"])
    repartition_dataset(spark, path, ["lang"])
    assert [v["version"] for v in list_versions(spark, path)] == [1]
    out = fetch_path(
        spark,
        path,
        filters=[{"partition": "lang", "comparison": "==", "values": ["en"]}],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split(
        "PartitionFilters", 1
    )[1][:200], "lang filter did not reach the file index"
    return out.select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# hidden partitioning (Iceberg-style partition transforms)
# ---------------------------------------------------------------------------


def q_hidden_partition_fetch(spark, sf_dir):
    """Hidden partitioning (publish.py derived_partitions): lineitem is
    published with ``ship_month = date_format(l_shipdate, 'yyyy-MM')``
    derived AT WRITE — the caller never materializes the column upstream;
    the transform is recorded in the sidecar and appends re-derive it.
    A fetch filtering on the derived column prunes at the file index
    (asserted: ``PartitionFilters`` carries ship_month), which is the
    whole point — time-bucketed layout from a timestamp column with
    Iceberg's ergonomics on top of plain hive dirs."""
    from .fetch import fetch_path
    from .publish import publish_path
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "hidden_part")
    marker = os.path.join(path, "_HIDDEN_OK")
    if not os.path.exists(marker) or not _plain_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        li = _table(spark, sf_dir, "lineitem")
        publish_path(
            spark, path, li.filter(F.col("l_linenumber") <= 3), [],
            derived_partitions={
                "ship_month": "date_format(l_shipdate, 'yyyy-MM')"
            },
        )
        # append WITHOUT restating the transform: re-derived from sidecar
        publish_path(
            spark, path, li.filter(F.col("l_linenumber") > 3), [],
            mode="append",
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    out = fetch_path(
        spark,
        path,
        filters=[
            {"partition": "ship_month", "comparison": "==", "values": ["1996-03"]}
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ship_month" in plan.split(
        "PartitionFilters", 1
    )[1][:200], "ship_month filter did not reach the file index"
    return out


# ---------------------------------------------------------------------------
# row-level DELETE (partition-scoped copy-on-write)
# ---------------------------------------------------------------------------


def q_delete_where_fetch(spark, sf_dir):
    """Row-level DELETE (publish.py delete_where): on a lineitem dataset
    partitioned by l_returnflag, delete every R row plus small-quantity
    rows everywhere — the R partition's directory must disappear entirely
    (dynamic overwrite alone cannot say "now empty"), A/N rewrite with
    surviving rows only, and the pre-delete dry_run must count exactly
    the rows the oracle says will go. Copy-on-write at partition scope:
    cost is O(touched partitions), untouched data never moves."""
    from .fetch import fetch_path
    from .publish import delete_where
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "delete_rt")
    shutil.rmtree(path, ignore_errors=True)
    li = _table(spark, sf_dir, "lineitem")
    from .publish import publish_path

    publish_path(spark, path, li, ["l_returnflag"])
    pred = "l_returnflag = 'R' OR l_quantity < 5"
    expected = li.filter(F.expr(pred)).count()
    assert delete_where(spark, path, pred, dry_run=True) == expected
    assert fetch_path(spark, path).count() == li.count(), "dry_run mutated"
    n = delete_where(spark, path, pred)
    assert n == expected, f"deleted {n}, expected {expected}"
    assert not os.path.isdir(
        os.path.join(path, "l_returnflag=R")
    ), "emptied partition directory survived"
    return fetch_path(spark, path)


# ---------------------------------------------------------------------------
# row-level UPDATE (partition-scoped copy-on-write)
# ---------------------------------------------------------------------------


def q_update_where_fetch(spark, sf_dir):
    """Row-level UPDATE (publish.py update_where): on a lineitem dataset
    partitioned by l_returnflag, small-quantity rows get a quantity bump
    and their tax zeroed — both set-expressions evaluated against the
    PRE-update row (simultaneous-assignment SQL UPDATE semantics, which
    the oracle's ``SELECT * REPLACE`` reproduces). Copy-on-write at
    partition scope, same machinery as DELETE; completes the DML family
    (append=INSERT, merge_upsert=MERGE, delete_where=DELETE, this=UPDATE)."""
    from .fetch import fetch_path
    from .publish import publish_path, update_where
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "update_rt")
    shutil.rmtree(path, ignore_errors=True)
    li = _table(spark, sf_dir, "lineitem")
    publish_path(spark, path, li, ["l_returnflag"])
    expected = li.filter("l_quantity < 5").count()
    assert update_where(
        spark, path,
        {"l_quantity": "l_quantity + 100", "l_tax": "0.0"},
        "l_quantity < 5",
        dry_run=True,
    ) == expected
    n = update_where(
        spark, path,
        {"l_quantity": "l_quantity + 100", "l_tax": "0.0"},
        "l_quantity < 5",
    )
    assert n == expected, f"updated {n}, expected {expected}"
    return fetch_path(spark, path)


# ---------------------------------------------------------------------------
# IVF-PQ at rest: codes-only storage served through partition pruning
# ---------------------------------------------------------------------------


def q_ivf_pq_at_rest(spark, sf_dir):
    """IVF-PQ served from storage, end to end: the corpus is published
    through the engine as CODES ONLY — (vec_id, 4 PQ code ints),
    ``partitionBy(cell)`` — so the index at rest is m small ints per
    vector instead of the dim-double embedding (the memory/IO lever that
    fits billion-vector indexes), and probes are served through the
    PARTITION-PRUNED fetch path: the scan's file index keeps only the
    probed cells' files, then each candidate row costs 4 ADC lookup-table
    reads + 3 adds. Same deterministic quantizers and parameters as
    ivf_pq_topk, so the at-rest layout must reproduce its answer exactly
    (shared oracle)."""
    from .fetch import fetch_path
    from .operators.similarity import (
        _assign_whole_vec, kmeans_centroids, pq_encode,
    )
    from .workload import _cached_dataset

    emb = _table(spark, sf_dir, "embeddings")
    cvecs = kmeans_centroids(emb, "vec_id", "embedding", k=16, iters=2)
    cnorms = [max(1e-12, sum(x * x for x in v) ** 0.5) for v in cvecs]
    enc, books = pq_encode(emb, "vec_id", "embedding", m=4, codes=8,
                           kmeans_iters=1)
    sub = len(books[0][0])

    def build(s, d):
        return _assign_whole_vec(
            enc.withColumn(
                "__at_rest_vec_d", F.col("embedding").cast("array<double>")
            ),
            "__at_rest_vec_d", "cell", cvecs, cnorms,
        ).select(
            "vec_id",
            "cell",
            *[F.col(f"__code_{j}").alias(f"code_{j}") for j in range(4)],
        )

    path = _cached_dataset(spark, sf_dir, "ivfpq_cells", build, ["cell"])

    qrow = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("v")
    ).first()
    qv = [float(x) for x in qrow["v"]]
    order = sorted(
        range(len(cvecs)),
        key=lambda j: (-sum(a * b for a, b in zip(qv, cvecs[j])) / cnorms[j], j),
    )
    cells = sorted(order[:4])

    fetched = fetch_path(
        spark,
        path,
        filters=[{"partition": "cell", "comparison": "==", "values": cells}],
    )
    plan = fetched._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters", 1
    )[1][:200], "cell probe did not prune at the file index"
    score = None
    for j, book in enumerate(books):
        qj = qv[j * sub : (j + 1) * sub]
        lut = [float(sum(a * b for a, b in zip(qj, c))) for c in book]
        # codes round-trip as "integer" vocabulary (bigint) through the
        # sidecar; element_at needs an INT index
        term = F.element_at(
            F.lit(lut), (F.col(f"code_{j}") + 1).cast("int")
        )
        score = term if score is None else score + term
    return (
        fetched.filter(F.col("vec_id") != 0)
        .select(F.col("vec_id"), score.alias("__score"))
        .orderBy(F.desc("__score"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", F.round("__score", 6).alias("adc"))
    )


# ---------------------------------------------------------------------------
# write-time expectations + quarantine under the gate
# ---------------------------------------------------------------------------


def q_expectations_publish(spark, sf_dir):
    """Write-time data-quality gate (publish.py publish_with_expectations):
    orders publish behind two CHECK rules; clean rows land in the main
    dataset, violating rows in the quarantine dataset tagged with the
    failed rule names (NULL passes — SQL CHECK semantics). The query
    fetches BOTH datasets back through the engine and returns every row
    with its quarantine verdict, so the split, the tagging, and both
    round-trips are all under the hash. Also asserts the all-or-nothing
    mode: without a quarantine path, a dirty batch writes NOTHING."""
    from .fetch import fetch_path
    from .publish import publish_with_expectations
    from .workload import _CACHE_ROOT, _ds_path

    base = _ds_path(sf_dir, "expect_rt")
    shutil.rmtree(base, ignore_errors=True)
    orders = _table(spark, sf_dir, "orders")
    rules = [
        {"name": "price_cap", "constraint": "o_totalprice <= 400000"},
        {"name": "status_known", "constraint": "o_orderstatus IN ('O', 'F')"},
    ]
    main, quar = os.path.join(base, "main"), os.path.join(base, "quarantine")
    try:
        publish_with_expectations(
            spark, main, orders, ["o_orderstatus"], rules
        )
        raise AssertionError("dirty batch must fail without quarantine_path")
    except ValueError:
        pass
    from . import fs as _fs

    assert not os.path.exists(os.path.join(main, _fs.SIDECAR_NAME)), (
        "all-or-nothing violated: main dataset written on failure"
    )
    counts = publish_with_expectations(
        spark, main, orders, ["o_orderstatus"], rules, quarantine_path=quar
    )
    assert counts["published"] + counts["quarantined"] == orders.count()
    assert counts["quarantined"] > 0, "fixture has no violations to route"
    good = fetch_path(spark, main).select("o_orderkey").withColumn(
        "violated", F.lit("")
    )
    bad = fetch_path(spark, quar).select("o_orderkey", "violated")
    return good.unionByName(bad)


# ---------------------------------------------------------------------------
# incremental fuzzy dedup against an at-rest index
# ---------------------------------------------------------------------------


def q_fuzzy_dedup_at_rest(spark, sf_dir):
    """Incremental fuzzy dedup against a PUBLISHED index (operators/dedup.py
    build_minhash_index + fuzzy_dedup_incremental): the corpus half
    (doc_id < 250) is indexed once — signatures + shingle-hash sets — and
    published through the engine; a new batch (doc_id >= 250, plus five
    planted near-copies of corpus docs) then dedups against the FETCHED
    index: banded-LSH candidates from one equi-join, exact Jaccard over the
    stored hash sets, broadcast anti-join of the dirty ids. The corpus text
    is never re-read — the production continuous-ingestion shape. The
    oracle brute-forces exact shingle Jaccard between the same two sides;
    the planted copies (J ~ 0.97) must all be dropped."""
    from .fetch import fetch_path
    from .operators.dedup import fuzzy_dedup_incremental
    from .workload import _cached_dataset

    docs = _table(spark, sf_dir, "documents")

    def build(s, d):
        from .operators.dedup import build_minhash_index

        corpus = (
            _table(s, d, "documents")
            .filter(F.col("doc_id") < 250)
            .select("doc_id", "text")
        )
        return build_minhash_index(corpus, "doc_id", "text")

    path = _cached_dataset(spark, sf_dir, "minhash_index", build, [])
    index = fetch_path(spark, path)

    planted = docs.filter(F.col("doc_id").isin([0, 10, 20, 30, 40])).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xcopy")).alias("text"),
    )
    new = (
        docs.filter(F.col("doc_id") >= 250)
        .select("doc_id", "text")
        .unionByName(planted)
    )
    kept = fuzzy_dedup_incremental(new, index, "doc_id", "text")
    return kept.select("doc_id")


# ---------------------------------------------------------------------------
# contrastive hard negatives + tokenizer OOV health
# ---------------------------------------------------------------------------


def q_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining (operators/similarity.py
    hard_negative_mining): per vector, the 3 most-similar OTHER-label
    vectors, candidates blocked by the deterministic hyperplane-LSH bucket
    (one equi-join — never the all-pairs cross-label product). The oracle
    inlines the same plane matrix and replicates bucketing, the label
    mismatch, exact cosine, and the per-anchor ranking."""
    from .operators.similarity import hard_negative_mining

    emb = _table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 400)
    out = hard_negative_mining(
        emb, "vec_id", "embedding", "label", k=3, dim=64, planes=4
    )
    return out.select(
        "vec_id", "neg_id", "neg_label", F.round("cosine", 6).alias("cosine"),
        "rk",
    )


def q_oov_rate(spark, sf_dir):
    """Tokenizer OOV health (operators/text.py oov_rate): per-document
    out-of-vocabulary rate against the corpus's own top-50 token vocab
    (deterministic count-desc/token-asc head). Two keyed aggregates and a
    broadcast vocabulary join — the fact side never reshuffles."""
    from .operators.text import oov_rate

    docs = _table(spark, sf_dir, "documents")
    return oov_rate(docs, "doc_id", "text", vocab_size=50)


# ---------------------------------------------------------------------------
# ANALYZE: stats plane under the gate
# ---------------------------------------------------------------------------


def q_dataset_stats(spark, sf_dir):
    """Table statistics plane (stats.py): orders is published through the
    engine, ANALYZEd once (ONE aggregate job computing every column's
    exact min/max/null-count/cardinality together), and this query answers
    from ``read_stats`` — a sidecar JSON read, ZERO data scan (asserted:
    no fetch, no parquet read happens on the answer path). The oracle
    recomputes the same stats from the raw table; matching hashes prove
    the metadata plane tells the truth about the data plane."""
    from .publish import publish_path
    from .stats import collect_stats, read_stats
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "stats_ds")
    marker = os.path.join(path, "_STATS_OK")
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    if not os.path.exists(marker) or not _plain_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        orders = _table(spark, sf_dir, "orders")
        publish_path(spark, path, orders, ["o_orderstatus"])
        collect_stats(spark, path, columns=cols)
        with open(marker, "w") as fh:
            fh.write("ok")
    stats = read_stats(spark, path)  # metadata-only: one JSON read
    rows = [
        (
            c,
            stats["columns"][c]["min"],
            stats["columns"][c]["max"],
            int(stats["columns"][c]["n_nulls"]),
            int(stats["columns"][c]["n_distinct"]),
            int(stats["row_count"]),
        )
        for c in cols
    ]
    return local_rows_df(
        spark, rows,
        "col_name string, min_val string, max_val string, "
        "n_nulls bigint, n_distinct bigint, row_count bigint",
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape (exists + not-exists self-joins on the fact table)
# ---------------------------------------------------------------------------


def q_multi_supplier_waiting(spark, sf_dir):
    """TPC-H Q21 plan shape on the driver's column subset (no
    l_receiptdate/commitdate — "late" is l_shipdate > o_orderdate + 60
    days): suppliers who were the ONLY late supplier on a multi-supplier
    order. EXISTS (another supplier on the order) is a left-semi
    self-join, NOT EXISTS (another LATE supplier) a left-anti self-join —
    both on the orderkey with a suppkey inequality residual, all
    hash-partitioned on the fact key; ranking is TakeOrdered. The classic
    "blame the one slow supplier" correlated-subquery pattern."""
    li = _table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = _table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    multi = late.alias("a").join(
        pairs.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        "left_semi",
    )
    sole = multi.alias("a").join(
        late.alias("c"),
        (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
        & (F.col("a.l_suppkey") != F.col("c.l_suppkey")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(sup), sole.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# IVF-PQ ANN (registered with its composed oracle at the bottom of
# workload.py — the oracle reuses the shared coarse-kmeans and PQ-subspace
# CTE builders already defined there / in workload_ext)
# ---------------------------------------------------------------------------


def q_ivf_pq_topk(spark, sf_dir):
    """IVF-PQ ANN (operators/similarity.py ivf_pq_topk — the FAISS
    IndexIVFPQ shape with raw-vector codes): 16-cell deterministic kmeans
    coarse quantizer prunes to 4 probed cells; inside them, scoring runs
    over 4x8-code PQ codes via driver-computed ADC lookup tables embedded
    as literals — per candidate row, 4 array lookups + 3 adds, no dot
    products, no shuffle. The oracle replays both quantizer levels (2
    coarse Lloyd iterations, 1 per subspace), the probe selection, and the
    ADC ranking, so the doubly-approximate result is exactly checkable."""
    from .operators import ivf_pq_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    return ivf_pq_topk(
        emb, "vec_id", "embedding", q, k=10, n_cells=16, n_probe=4,
        m=4, codes=8, coarse_iters=2, pq_iters=1,
    )


QUERIES_EXT2: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "split_assign": q_split_assign,
    "token_budget_select": q_token_budget_select,
    "line_dedup": q_line_dedup,
    "decontaminate": q_decontaminate,
    "minhash_dedup_corpus": q_minhash_dedup_corpus,
    "restore_fetch": q_restore_fetch,
    "repartition_fetch": q_repartition_fetch,
    "multi_supplier_waiting": q_multi_supplier_waiting,
    "hidden_partition_fetch": q_hidden_partition_fetch,
    "delete_where_fetch": q_delete_where_fetch,
    "dataset_stats": q_dataset_stats,
    "ivf_pq_at_rest": q_ivf_pq_at_rest,
    "update_where_fetch": q_update_where_fetch,
    "expectations_publish": q_expectations_publish,
    "hard_negatives": q_hard_negatives,
    "oov_rate": q_oov_rate,
    "fuzzy_dedup_at_rest": q_fuzzy_dedup_at_rest,
}


def _hard_negatives_oracle() -> str:
    from .operators.similarity import _hyperplane_rows

    planes = ", ".join(
        f"({p}, [{', '.join(str(x) for x in row)}]::DOUBLE[])"
        for p, row in enumerate(_hyperplane_rows(64, 4))
    )
    return f"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id < 400
        ), planes(pid, c) AS (
          VALUES {planes}
        ), buck AS (
          SELECT e.vec_id, e.label, e.v,
                 SUM(CASE WHEN list_dot_product(e.v, p.c) > 0
                          THEN (CAST(1 AS BIGINT) << p.pid) ELSE 0 END)
                   AS bucket
          FROM e CROSS JOIN planes p GROUP BY e.vec_id, e.label, e.v
        ), pairs AS (
          SELECT a.vec_id, b.vec_id AS neg_id, b.label AS neg_label,
                 list_cosine_similarity(a.v, b.v) AS cos_raw
          FROM buck a JOIN buck b
            ON a.bucket = b.bucket AND a.label <> b.label
          WHERE NOT isnan(list_cosine_similarity(a.v, b.v))
        ), ranked AS (
          SELECT vec_id, neg_id, neg_label, cos_raw,
                 CAST(row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY cos_raw DESC, neg_id ASC) AS INT) AS rk
          FROM pairs
        )
        SELECT vec_id, neg_id, neg_label, round(cos_raw, 6) AS cosine, rk
        FROM ranked WHERE rk <= 3
    """

# DuckDB list slicing l[a:b] is 1-based inclusive; generate_series is
# inclusive of both bounds — matching Spark's slice(arr, start, length)
# and sequence(lo, hi) forms used above.
_LINED_SQL = f"""
    w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ), built AS (
      SELECT doc_id,
             list_transform(
               generate_series(0, CAST(floor((len(t) - 1) / 8) AS INT)),
               i -> array_to_string(t[i*8+1 : i*8+8], ' ')) AS ls
      FROM w
    ), planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN
               list_append(
                 CASE WHEN doc_id % 2 = 0
                      THEN list_prepend('{_BP_HEADER}', ls) ELSE ls END,
                 '{_BP_FOOTER}')
             ELSE
               CASE WHEN doc_id % 2 = 0
                    THEN list_prepend('{_BP_HEADER}', ls) ELSE ls END
             END AS ls
      FROM built
    )
"""

ORACLE_EXT2: Dict[str, str] = {
    "split_assign": f"""
        SELECT doc_id, source,
               CASE WHEN {_HASH60_SQL} % 10000 < 8000 THEN 'train'
                    WHEN {_HASH60_SQL} % 10000 < 9000 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "token_budget_select": """
        WITH s AS (
          SELECT doc_id, source,
                 string_split_regex(trim(text), '\\s+') AS t
          FROM documents
        ), d AS (
          SELECT doc_id, source, len(t) AS n_tokens,
                 CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS q
          FROM s
        ), w AS (
          SELECT doc_id, source, n_tokens,
                 SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY q DESC, doc_id
                 ) AS cum_tokens
          FROM d
        )
        SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(cum_tokens AS BIGINT) AS cum_tokens
        FROM w WHERE cum_tokens <= 600
    """,
    "line_dedup": f"""
        WITH {_LINED_SQL},
        lines AS (
          SELECT doc_id, generate_subscripts(ls, 1) AS pos,
                 unnest(ls) AS line
          FROM planted
        ), norm AS (
          SELECT doc_id, pos, line, trim(line) AS nrm
          FROM lines WHERE length(trim(line)) > 0
        ), dfq AS (
          SELECT nrm, COUNT(DISTINCT doc_id) AS line_df
          FROM norm GROUP BY nrm
        ), kept AS (
          SELECT n.doc_id, n.pos, n.line
          FROM norm n JOIN dfq ON n.nrm = dfq.nrm
          WHERE dfq.line_df < 2
        ), reb AS (
          SELECT doc_id,
                 string_agg(line, chr(10) ORDER BY pos) AS text_clean,
                 COUNT(*) AS n_kept
          FROM kept GROUP BY doc_id
        ), tot AS (
          SELECT doc_id, COUNT(*) AS n_lines FROM norm GROUP BY doc_id
        )
        SELECT p.doc_id, COALESCE(r.text_clean, '') AS text_clean,
               CAST(COALESCE(t.n_lines, 0) AS BIGINT) AS n_lines,
               CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept
        FROM (SELECT DISTINCT doc_id FROM planted) p
        LEFT JOIN tot t USING (doc_id)
        LEFT JOIN reb r USING (doc_id)
    """,
    "decontaminate": """
        WITH toks AS (
          SELECT doc_id, CAST(substr(source, 4) AS INT) AS src_num,
                 string_split_regex(trim(text), '\\s+') AS t
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id, src_num,
                 unnest(list_transform(
                   generate_series(1, len(t) - 4),
                   i -> array_to_string(t[i:i+4], ' '))) AS g
          FROM toks
        ), dirty AS (
          SELECT DISTINCT a.doc_id
          FROM sh a JOIN sh b ON a.g = b.g
          WHERE a.src_num < 10 AND b.src_num >= 10
        )
        SELECT d.doc_id, d.source, d.n_chars
        FROM documents d
        WHERE CAST(substr(d.source, 4) AS INT) < 10
          AND d.doc_id NOT IN (SELECT doc_id FROM dirty)
    """,
    "minhash_dedup_corpus": """
        WITH RECURSIVE words AS (
          SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
                FROM documents)
        ), sh AS (
          SELECT DISTINCT doc_id,
                 w || ' ' || lead(w, 1) OVER win || ' ' ||
                 lead(w, 2) OVER win AS shingle
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
        ), losers AS (
          SELECT node FROM reach GROUP BY node HAVING MIN(r) <> node
        )
        SELECT doc_id, source FROM documents
        WHERE doc_id NOT IN (SELECT node FROM losers)
    """,
    "restore_fetch": """
        SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
    "repartition_fetch": """
        SELECT doc_id, lang, source, n_chars FROM documents WHERE lang = 'en'
    """,
    "hidden_partition_fetch": """
        SELECT *, strftime(l_shipdate, '%Y-%m') AS ship_month
        FROM lineitem
        WHERE strftime(l_shipdate, '%Y-%m') = '1996-03'
    """,
    "delete_where_fetch": """
        SELECT * FROM lineitem
        WHERE NOT (l_returnflag = 'R' OR l_quantity < 5)
    """,
    "fuzzy_dedup_at_rest": """
        WITH cw AS (
          SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
                FROM documents WHERE doc_id < 250)
        ), csh AS (
          SELECT DISTINCT doc_id,
                 w || ' ' || lead(w, 1) OVER win || ' ' ||
                 lead(w, 2) OVER win AS shingle
          FROM cw
          WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
          QUALIFY lead(w, 2) OVER win IS NOT NULL
        ), newb AS (
          SELECT doc_id, text FROM documents WHERE doc_id >= 250
          UNION ALL
          SELECT doc_id + 10000, text || ' xcopy'
          FROM documents WHERE doc_id IN (0, 10, 20, 30, 40)
        ), nw AS (
          SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
                FROM newb)
        ), nsh AS (
          SELECT DISTINCT doc_id,
                 w || ' ' || lead(w, 1) OVER win || ' ' ||
                 lead(w, 2) OVER win AS shingle
          FROM nw
          WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
          QUALIFY lead(w, 2) OVER win IS NOT NULL
        ), nsz AS (
          SELECT doc_id, COUNT(*) AS n FROM nsh GROUP BY doc_id
        ), csz AS (
          SELECT doc_id, COUNT(*) AS n FROM csh GROUP BY doc_id
        ), inter AS (
          SELECT n.doc_id AS nid, c.doc_id AS cid, COUNT(*) AS k
          FROM nsh n JOIN csh c ON n.shingle = c.shingle
          GROUP BY 1, 2
        ), dirty AS (
          SELECT DISTINCT nid
          FROM inter
          JOIN nsz ON nsz.doc_id = nid
          JOIN csz ON csz.doc_id = cid
          WHERE k / (nsz.n + csz.n - k) >= 0.8
        )
        SELECT doc_id FROM newb
        WHERE doc_id NOT IN (SELECT nid FROM dirty)
    """,
    "oov_rate": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(text), '\\s+')) AS tok
          FROM documents
        ), vocab AS (
          SELECT tok FROM (
            SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
            ORDER BY n DESC, tok ASC LIMIT 50
          )
        )
        SELECT t.doc_id,
               COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov,
               CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / COUNT(*) AS oov_rate
        FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        GROUP BY t.doc_id
    """,
    "expectations_publish": """
        SELECT o_orderkey,
               CASE WHEN (o_totalprice <= 400000 OR o_totalprice IS NULL)
                     AND (o_orderstatus IN ('O', 'F')
                          OR o_orderstatus IS NULL)
                    THEN ''
                    ELSE concat_ws(',',
                      CASE WHEN NOT COALESCE(o_totalprice <= 400000, TRUE)
                           THEN 'price_cap' END,
                      CASE WHEN NOT COALESCE(
                               o_orderstatus IN ('O', 'F'), TRUE)
                           THEN 'status_known' END)
               END AS violated
        FROM orders
    """,
    "update_where_fetch": """
        SELECT * REPLACE (
            CASE WHEN l_quantity < 5 THEN l_quantity + 100
                 ELSE l_quantity END AS l_quantity,
            CASE WHEN l_quantity < 5 THEN 0.0 ELSE l_tax END AS l_tax
        )
        FROM lineitem
    """,
    "dataset_stats": """
        SELECT 'o_orderkey' AS col_name,
               CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
               CAST(MAX(o_orderkey) AS VARCHAR) AS max_val,
               COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_nulls,
               COUNT(DISTINCT o_orderkey) AS n_distinct,
               COUNT(*) AS row_count
        FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(MIN(o_custkey) AS VARCHAR),
               CAST(MAX(o_custkey) AS VARCHAR),
               COUNT(CASE WHEN o_custkey IS NULL THEN 1 END),
               COUNT(DISTINCT o_custkey), COUNT(*)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', CAST(MIN(o_totalprice) AS VARCHAR),
               CAST(MAX(o_totalprice) AS VARCHAR),
               COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END),
               COUNT(DISTINCT o_totalprice), COUNT(*)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', CAST(MIN(o_orderdate) AS VARCHAR),
               CAST(MAX(o_orderdate) AS VARCHAR),
               COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END),
               COUNT(DISTINCT o_orderdate), COUNT(*)
        FROM orders
    """,
    "multi_supplier_waiting": """
        WITH late AS (
          SELECT DISTINCT l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        ), pairs AS (
          SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        ), sole AS (
          SELECT a.l_orderkey, a.l_suppkey
          FROM late a
          WHERE EXISTS (
                  SELECT 1 FROM pairs b
                  WHERE b.l_orderkey = a.l_orderkey
                    AND b.l_suppkey <> a.l_suppkey)
            AND NOT EXISTS (
                  SELECT 1 FROM late c
                  WHERE c.l_orderkey = a.l_orderkey
                    AND c.l_suppkey <> a.l_suppkey)
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM sole JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 10
    """,
}

ORACLE_EXT2["hard_negatives"] = _hard_negatives_oracle()


# ---------------------------------------------------------------------------
# DSIR importance resampling (data selection)
# ---------------------------------------------------------------------------


def q_dsir_select(spark, sf_dir):
    """DSIR data selection (operators/sampling.py dsir_importance_weights):
    hashed unigram+bigram bag models of the en-doc target distribution vs
    the non-en raw pool, add-one smoothing, per-doc log-likelihood-ratio
    importance weight as an order-independent decimal sum; top-100
    most-target-like raw docs, ties by doc_id. The oracle replays the
    identical hashing and arithmetic in SQL."""
    from .operators import dsir_importance_weights

    docs = (
        _table(spark, sf_dir, "documents")
        .select("doc_id", "text", (F.col("lang") == "en").alias("is_en"))
    )
    w = dsir_importance_weights(docs, "doc_id", "text", "is_en")
    return (
        w.orderBy(F.desc("logw"), F.asc("doc_id"))
        .limit(100)
        .select("doc_id", "n_ngrams", F.round("logw", 9).alias("logw"))
    )


QUERIES_EXT2["dsir_select"] = q_dsir_select
ORACLE_EXT2["dsir_select"] = """
    WITH toks AS (
      SELECT doc_id, (lang = 'en') AS t,
             string_split_regex(trim(lower(text)), '\\s+') AS u
      FROM documents
    ),
    pos AS (
      SELECT doc_id, t, u, unnest(generate_series(1, len(u))) AS i
      FROM toks
    ),
    grams AS (
      SELECT doc_id, t, u[i] AS g FROM pos
      UNION ALL
      SELECT doc_id, t, u[i] || ' ' || u[i + 1] AS g FROM pos
      WHERE i < len(u)
    ),
    bkt AS (
      SELECT doc_id, t,
             CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % 4096 AS b
      FROM grams
    ),
    tbl AS (
      SELECT b,
             SUM(CASE WHEN t THEN 1 ELSE 0 END) AS tc,
             SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS rc
      FROM bkt GROUP BY b
    ),
    tot AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM tbl),
    lam AS (
      SELECT b,
             CAST(ln((tc + 1.0) / (tt + 4096))
                  - ln((rc + 1.0) / (rt + 4096)) AS DECIMAL(28,12)) AS lam
      FROM tbl, tot
    ),
    w AS (
      SELECT doc_id, COUNT(*) AS n_ngrams, CAST(SUM(lam) AS DOUBLE) AS logw
      FROM bkt JOIN lam USING (b)
      WHERE NOT t
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_ngrams AS BIGINT) AS n_ngrams,
           round(logw, 9) AS logw
    FROM w
    ORDER BY logw DESC, doc_id ASC
    LIMIT 100
"""


# ---------------------------------------------------------------------------
# two-stage quantized-prefilter / exact-rescore ANN
# ---------------------------------------------------------------------------


def q_quantized_rescore(spark, sf_dir):
    """Two-stage ANN serving (operators/similarity.py
    quantized_rescore_topk): integer int8-code dot prefilter to 20
    candidates per query, exact-cosine rescore to top-3 — the FAISS/ScaNN
    quantized-index pattern with a deterministic (exact-integer) candidate
    stage. The oracle replays both stages."""
    from .operators import quantized_rescore_topk

    emb = _table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    out = quantized_rescore_topk(
        emb, "vec_id", "embedding", q, k=3, rescore=20
    )
    return out.select(
        "query_id", "vec_id", "qscore", F.round("cosine", 6).alias("cosine")
    )


QUERIES_EXT2["quantized_rescore"] = q_quantized_rescore
ORACLE_EXT2["quantized_rescore"] = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    m AS (
      SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM e
    ),
    c AS (
      SELECT vec_id, v,
             CASE WHEN hi - lo = 0
                  THEN list_transform(v, x -> 0)
                  ELSE list_transform(v, x -> least(255,
                         CAST(floor((x - lo) * 255.0 / (hi - lo)) AS INT)))
             END AS code
      FROM m
    ),
    q AS (
      SELECT vec_id AS query_id, v AS qv, code AS qcode
      FROM c WHERE vec_id < 8
    ),
    s1 AS (
      SELECT q.query_id, c.vec_id, c.v,
             CAST(list_dot_product(
               list_transform(c.code, x -> CAST(x AS DOUBLE)),
               list_transform(q.qcode, x -> CAST(x AS DOUBLE))
             ) AS BIGINT) AS qscore
      FROM c CROSS JOIN q
      WHERE c.vec_id <> q.query_id
    ),
    cand AS (
      SELECT query_id, vec_id, v, qscore,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY qscore DESC, vec_id ASC) AS rk
      FROM s1
    ),
    s2 AS (
      SELECT cand.query_id, cand.vec_id, cand.qscore,
             list_cosine_similarity(cand.v, q.qv) AS cosine,
             row_number() OVER (PARTITION BY cand.query_id
                                ORDER BY list_cosine_similarity(cand.v, q.qv)
                                         DESC, cand.vec_id ASC) AS rk2
      FROM cand JOIN q USING (query_id)
      WHERE cand.rk <= 20
        AND NOT isnan(list_cosine_similarity(cand.v, q.qv))
    )
    SELECT query_id, vec_id, qscore, round(cosine, 6) AS cosine
    FROM s2 WHERE rk2 <= 3
"""


# ---------------------------------------------------------------------------
# snapshot expiry (history squash)
# ---------------------------------------------------------------------------


def q_expire_fetch(spark, sf_dir):
    """Snapshot expiry end-to-end (publish.py expire_snapshots): publish
    nation as four appends (keys <7, <14, <21, rest), squash history to
    the last 2 snapshots, fetch. Asserts the lifecycle: the squash is
    metadata-only (manifest file list identical before/after), history
    becomes [2, 3, 4] (v2 = the squashed base), the base version still
    reads exactly, expired versions raise. Oracle = the plain
    nation table — the read plane must be byte-identical through a
    squashed sidecar. This is the op that bounds sidecar growth for
    per-minute streaming commits at 100 TB."""
    from .fetch import fetch_path, fetch_at, get_all_files_list, list_versions
    from .publish import expire_snapshots, publish_path
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "expire_rt")
    shutil.rmtree(path, ignore_errors=True)
    nation = _table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    bounds = [(None, 7), (7, 14), (14, 21), (21, None)]
    for i, (lo, hi) in enumerate(bounds):
        part = nation
        if lo is not None:
            part = part.filter(F.col("n_nationkey") >= lo)
        if hi is not None:
            part = part.filter(F.col("n_nationkey") < hi)
        publish_path(
            spark, path, part, ["n_regionkey"],
            mode="append" if i else "error",
        )

    files_before = sorted(get_all_files_list(path, spark=spark))
    n_v2 = fetch_at(spark, path, 2).count()
    expired = expire_snapshots(spark, path, keep_last=2)
    # v2 survives as the squashed base entry; only v1 loses addressability
    assert expired == [1], f"expired {expired}"
    assert sorted(get_all_files_list(path, spark=spark)) == files_before, (
        "squash touched the data plane"
    )
    assert [v["version"] for v in list_versions(spark, path)] == [2, 3, 4]
    assert fetch_at(spark, path, 2).count() == n_v2, "base version drifted"
    try:
        fetch_at(spark, path, 1)
        raise AssertionError("expired version still addressable")
    except ValueError:
        pass
    return fetch_path(spark, path).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


QUERIES_EXT2["expire_fetch"] = q_expire_fetch
ORACLE_EXT2["expire_fetch"] = """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
"""


# ---------------------------------------------------------------------------
# exact substring (duplicated k-gram span) dedup
# ---------------------------------------------------------------------------


def q_span_dedup(spark, sf_dir):
    """Exact substring dedup (operators/text.py remove_duplicated_spans,
    the Lee et al. ExactSubstr rule at token granularity, k=5): any 5-gram
    occurring >1 time corpus-wide marks its tokens for removal; documents
    reassemble from surviving tokens in order. At sf0.01 this trims ~70
    documents — the oracle replays the gram fingerprinting, coverage
    explode, and ordered reassembly in SQL."""
    from .operators import remove_duplicated_spans

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_duplicated_spans(docs, "doc_id", "text", k=5)


QUERIES_EXT2["span_dedup"] = q_span_dedup
ORACLE_EXT2["span_dedup"] = """
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS u
      FROM documents
    ),
    pos AS (
      SELECT doc_id, u, unnest(generate_series(1, len(u))) AS pos FROM t
    ),
    tok AS (SELECT doc_id, pos, u[pos] AS tok FROM pos),
    gr AS (
      SELECT doc_id, pos AS gpos,
             CAST('0x' || substr(md5(array_to_string(u[pos:pos+4], ' ')),
                                 1, 15) AS BIGINT) AS h
      FROM pos WHERE pos + 4 <= len(u)
    ),
    dup AS (SELECT h FROM gr GROUP BY h HAVING COUNT(*) > 1),
    cov AS (
      SELECT DISTINCT doc_id, cpos AS pos FROM (
        SELECT gr.doc_id, unnest(generate_series(gpos, gpos + 4)) AS cpos
        FROM gr JOIN dup USING (h)
      )
    )
    SELECT tok.doc_id,
           COALESCE(string_agg(tok.tok, ' ' ORDER BY tok.pos)
                      FILTER (WHERE cov.pos IS NULL), '') AS text_clean,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN cov.pos IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed
    FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
    GROUP BY tok.doc_id
"""


# ---------------------------------------------------------------------------
# timestamp time travel / SQL AS OF / optimistic concurrency under the gate
# ---------------------------------------------------------------------------


def _two_version_nation(spark, sf_dir, leaf):
    """Publish nation as v1 (keys < 10) + v2 (the rest); returns path."""
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, leaf)
    shutil.rmtree(path, ignore_errors=True)
    from .publish import publish_path

    nation = _table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    publish_path(
        spark, path, nation.filter(F.col("n_nationkey") < 10), ["n_regionkey"]
    )
    publish_path(
        spark, path, nation.filter(F.col("n_nationkey") >= 10),
        ["n_regionkey"], mode="append",
    )
    return path


def q_time_travel_ts(spark, sf_dir):
    """Timestamp time travel end-to-end (fetch.py fetch_at_timestamp):
    publish nation in two commits, read list_versions' stamped commit
    times, fetch AS OF v1's wall-clock timestamp. The timestamps are
    runtime values, but the CONTENT they resolve to is deterministic —
    oracle = nation keys < 10. Also asserts the boundary semantics: a ts
    before the first commit raises; a ts after the head reads everything."""
    from .fetch import fetch_at_timestamp, fetch_path, list_versions

    path = _two_version_nation(spark, sf_dir, "ts_travel")
    vs = list_versions(spark, path)
    assert [v["version"] for v in vs] == [1, 2] and all(
        v["ts"] is not None for v in vs
    ), f"versions not stamped: {vs}"
    try:
        fetch_at_timestamp(spark, path, vs[0]["ts"] - 1000.0)
        raise AssertionError("pre-history ts did not raise")
    except ValueError:
        pass
    n_all = fetch_path(spark, path).count()
    assert fetch_at_timestamp(spark, path, vs[1]["ts"] + 1000.0).count() == n_all
    return fetch_at_timestamp(spark, path, vs[0]["ts"]).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


QUERIES_EXT2["time_travel_ts"] = q_time_travel_ts
ORACLE_EXT2["time_travel_ts"] = """
    SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey < 10
"""


def q_attach_at_sql(spark, sf_dir):
    """SQL VERSION AS OF front door (fetch.py attach_at): register v1 of a
    two-commit dataset as a temp view and run a plain spark.sql aggregate
    over it — the versioned read must compose with SQL exactly like a
    table. Oracle replays the aggregate over the v1 subset."""
    from .fetch import attach_at

    path = _two_version_nation(spark, sf_dir, "attach_at_rt")
    attach_at(spark, path, "nation_v1", version=1)
    return spark.sql(
        """
        SELECT n_regionkey, COUNT(*) AS n_nations,
               MIN(n_name) AS first_name
        FROM nation_v1
        GROUP BY n_regionkey
        """
    )


QUERIES_EXT2["attach_at_sql"] = q_attach_at_sql
ORACLE_EXT2["attach_at_sql"] = """
    SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS first_name
    FROM nation WHERE n_nationkey < 10
    GROUP BY n_regionkey
"""


def q_cas_publish(spark, sf_dir):
    """Optimistic concurrency end-to-end (publish.py expected_version):
    append with the correct expected head succeeds; a stale expected
    head is caught at the PRE-WRITE check, so in this scenario nothing
    touches storage at all (asserted on the real filesystem listing, not
    the manifest — a conflict inside the write window would instead
    leave unacknowledged orphans, vacuum's domain); the dataset then
    reads back complete. Oracle = the full nation table."""
    from . import fs as fs_mod
    from .fetch import fetch_path, list_versions
    from .publish import ConcurrentWriteError, publish_path
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "cas_rt")
    shutil.rmtree(path, ignore_errors=True)
    nation = _table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    publish_path(
        spark, path, nation.filter(F.col("n_nationkey") < 10), ["n_regionkey"]
    )
    # correct CAS: head is 1
    publish_path(
        spark, path, nation.filter(F.col("n_nationkey") >= 10),
        ["n_regionkey"], mode="append", expected_version=1,
    )
    files = sorted(fs_mod.list_files(spark, path))
    try:
        publish_path(
            spark, path, nation.limit(1), ["n_regionkey"],
            mode="append", expected_version=1,  # stale: head is now 2
        )
        raise AssertionError("stale expected_version did not raise")
    except ConcurrentWriteError:
        pass
    assert sorted(fs_mod.list_files(spark, path)) == files, (
        "pre-write CAS conflict left files on storage"
    )
    assert [v["version"] for v in list_versions(spark, path)] == [1, 2]
    return fetch_path(spark, path).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


QUERIES_EXT2["cas_publish"] = q_cas_publish
ORACLE_EXT2["cas_publish"] = """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
"""


# ---------------------------------------------------------------------------
# small-file compaction + streaming into hidden partitions under the gate
# ---------------------------------------------------------------------------


def q_compact_fetch(spark, sf_dir):
    """Small-file compaction end-to-end (publish.py compact_dataset): four
    micro-appends of nation leave one file per partition per append;
    compaction rewrites back to the ~60 MB target geometry (here: one file
    per partition), the file count drops, and the fetch result is
    byte-identical. Oracle = the plain nation table. This is the
    maintenance op that keeps the S7 file-size contract true under
    continuous ingestion."""
    from .fetch import fetch_path, get_all_files_list
    from .publish import compact_dataset, publish_path
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "compact_rt")
    shutil.rmtree(path, ignore_errors=True)
    nation = _table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    for i in range(4):
        publish_path(
            spark, path, nation.filter(F.col("n_nationkey") % 4 == i),
            ["n_regionkey"], mode="append" if i else "error",
        )
    n_before = len(get_all_files_list(path, spark=spark))
    compact_dataset(spark, path)
    n_after = len(get_all_files_list(path, spark=spark))
    assert n_after < n_before, f"compaction grew files: {n_before}->{n_after}"
    return fetch_path(spark, path).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


QUERIES_EXT2["compact_fetch"] = q_compact_fetch
ORACLE_EXT2["compact_fetch"] = """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
"""


def q_stream_hidden_fetch(spark, sf_dir):
    """Streaming ingestion into hidden partitions end-to-end
    (streaming/events.py stream_publish + publish derived_partitions):
    micro-batches land under a write-time event-day layout derived from
    ts (a transform the writer computes — the column does not exist in the
    source); the fetch filters on the derived column and must prune at the
    file index (asserted on the plan). Returns per-day counts; the oracle
    re-derives the day from the raw events table."""
    from .fetch import fetch_path
    from .streaming import stream_publish
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "stream_hidden_rt")
    # no completion marker exists for a stream (the sidecar lands on the
    # FIRST micro-batch, so its presence cannot mean "fully ingested");
    # rebuild unconditionally rather than trust a partial cache
    shutil.rmtree(path, ignore_errors=True)
    stream_publish(
        spark, posixpath.join(sf_dir, "events.parquet"), path, [],
        derived_partitions={
            "event_day": "date_format(ts, 'yyyy-MM-dd')"
        },
    )
    got = fetch_path(spark, path)
    one_day = got.select("event_day").orderBy("event_day").first()[
        "event_day"
    ]
    pruned = fetch_path(
        spark, path,
        filters=[{"partition": "event_day", "comparison": "==",
                  "values": [one_day]}],
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the filter must appear INSIDE the PartitionFilters bracket — the key
    # itself prints on every scan, so checking for it alone is vacuous
    assert "PartitionFilters" in plan, "no PartitionFilters section in plan"
    assert "event_day" in plan.split("PartitionFilters", 1)[1][:200], (
        "derived-column filter did not prune at the file index"
    )
    return got.groupBy("event_day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


QUERIES_EXT2["stream_hidden_fetch"] = q_stream_hidden_fetch
ORACLE_EXT2["stream_hidden_fetch"] = """
    SELECT strftime(ts, '%Y-%m-%d') AS event_day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
"""


# ---------------------------------------------------------------------------
# corpus-level overlap matrix (mixture-design diagnostic)
# ---------------------------------------------------------------------------


def q_corpus_overlap(spark, sf_dir):
    """Pairwise corpus overlap (operators/dedup.py corpus_overlap): exact
    shingle-set Jaccard AND its 32-hash MinHash estimate for every source
    pair — the "how much of B is already in A" mixture diagnostic, with
    the estimate's hashing md5-portable so the oracle replays BOTH
    numbers. Top-40 most-overlapping pairs for a bounded driver row."""
    from .operators import corpus_overlap

    docs = _table(spark, sf_dir, "documents").select("source", "text")
    out = corpus_overlap(docs, "source", "text", shingle_n=3, num_hashes=32)
    return (
        out.orderBy(F.desc("exact_jaccard"), F.asc("src_a"), F.asc("src_b"))
        .limit(40)
        .select(
            "src_a", "src_b", "n_a", "n_b", "n_common",
            F.round("exact_jaccard", 9).alias("exact_jaccard"),
            F.round("est_jaccard", 9).alias("est_jaccard"),
        )
    )


QUERIES_EXT2["corpus_overlap"] = q_corpus_overlap
ORACLE_EXT2["corpus_overlap"] = """
    WITH t AS (
      SELECT source AS g, string_split_regex(trim(text), '\\s+') AS u
      FROM documents
    ),
    pos AS (
      SELECT g, u, unnest(generate_series(1, len(u))) AS i FROM t
    ),
    sh AS (
      SELECT DISTINCT g, array_to_string(u[i:i+2], ' ') AS s
      FROM pos WHERE i + 2 <= len(u)
    ),
    sizes AS (SELECT g, COUNT(*) AS n_sh FROM sh GROUP BY g),
    inter AS (
      SELECT a.g AS src_a, b.g AS src_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.s = b.s AND a.g < b.g
      GROUP BY 1, 2
    ),
    mh AS (
      SELECT g, i,
             MIN(CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || s),
                                     1, 15) AS BIGINT)) AS h
      FROM sh CROSS JOIN generate_series(0, 31) t2(i)
      GROUP BY g, i
    ),
    est AS (
      SELECT a.g AS src_a, b.g AS src_b,
             SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) / 32.0
               AS est_jaccard
      FROM mh a JOIN mh b ON a.i = b.i AND a.g < b.g
      GROUP BY 1, 2
    ),
    rep AS (
      SELECT est.src_a, est.src_b,
             sa.n_sh AS n_a, sb.n_sh AS n_b,
             COALESCE(inter.n_common, 0) AS n_common,
             CAST(COALESCE(inter.n_common, 0) AS DOUBLE)
               / (sa.n_sh + sb.n_sh - COALESCE(inter.n_common, 0))
               AS exact_jaccard,
             est.est_jaccard
      FROM est
      LEFT JOIN inter ON est.src_a = inter.src_a AND est.src_b = inter.src_b
      JOIN sizes sa ON est.src_a = sa.g
      JOIN sizes sb ON est.src_b = sb.g
    )
    SELECT src_a, src_b, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(n_common AS BIGINT) AS n_common,
           round(exact_jaccard, 9) AS exact_jaccard,
           round(est_jaccard, 9) AS est_jaccard
    FROM rep
    ORDER BY exact_jaccard DESC, src_a ASC, src_b ASC
    LIMIT 40
"""


# ---------------------------------------------------------------------------
# asymmetric containment near-dup (sub-document duplicates)
# ---------------------------------------------------------------------------


def q_containment_dedup(spark, sf_dir):
    """Containment near-dup (operators/dedup.py containment_pairs): pairs
    where the smaller doc's 3-gram set is >= 90% contained in the larger's
    — the sub-document duplicate case symmetric Jaccard misses. Prefix
    filter on the small side, full index on the big side, exact
    array_intersect verify. The oracle replays exact all-pairs
    containment over string shingle sets."""
    from .operators import containment_pairs

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    out = containment_pairs(docs, "doc_id", "text", n=3, threshold=0.9)
    return out.select(
        "doc_small",
        "doc_big",
        F.col("n_small").cast("bigint").alias("n_small"),
        F.col("n_big").cast("bigint").alias("n_big"),
        F.col("n_common").cast("bigint").alias("n_common"),
        F.round("containment", 9).alias("containment"),
    )


QUERIES_EXT2["containment_dedup"] = q_containment_dedup
ORACLE_EXT2["containment_dedup"] = """
    WITH words AS (
      SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
            FROM documents)
    ), sh AS (
      SELECT DISTINCT doc_id,
             w || ' ' || lead(w, 1) OVER win || ' ' ||
             lead(w, 2) OVER win AS shingle
      FROM words
      WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(w, 2) OVER win IS NOT NULL
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), rep AS (
      SELECT CASE WHEN sa.n < sb.n THEN doc_a
                  WHEN sb.n < sa.n THEN doc_b ELSE doc_a END AS doc_small,
             CASE WHEN sa.n < sb.n THEN doc_b
                  WHEN sb.n < sa.n THEN doc_a ELSE doc_b END AS doc_big,
             CASE WHEN sa.n <= sb.n THEN sa.n ELSE sb.n END AS n_small,
             CASE WHEN sa.n <= sb.n THEN sb.n ELSE sa.n END AS n_big,
             n_common
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    )
    SELECT doc_small, doc_big,
           CAST(n_small AS BIGINT) AS n_small,
           CAST(n_big AS BIGINT) AS n_big,
           CAST(n_common AS BIGINT) AS n_common,
           round(CAST(n_common AS DOUBLE) / n_small, 9) AS containment
    FROM rep
    WHERE CAST(n_common AS DOUBLE) / n_small >= 0.9
"""


# ---------------------------------------------------------------------------
# dataset card report
# ---------------------------------------------------------------------------


def q_dataset_card(spark, sf_dir):
    """Per-source dataset card (operators/profile.py dataset_card): doc and
    token counts, length extremes/mean, language spread, dominant
    language, corpus share — the datasheet table generated before a
    corpus ships. One keyed aggregate per granularity; the oracle replays
    every number."""
    from .operators import dataset_card

    docs = _table(spark, sf_dir, "documents")
    out = dataset_card(docs, "source", "text", lang_col="lang")
    return out.select(
        "source", "n_docs", "n_tokens", "min_tokens", "max_tokens",
        F.round("mean_tokens", 9).alias("mean_tokens"),
        "n_langs", "top_lang",
        F.col("top_lang_docs").cast("bigint").alias("top_lang_docs"),
        F.round("docs_share", 9).alias("docs_share"),
    )


QUERIES_EXT2["dataset_card"] = q_dataset_card
ORACLE_EXT2["dataset_card"] = """
    WITH base AS (
      SELECT source AS g, lang,
             CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt
      FROM documents
    ),
    per AS (
      SELECT g, COUNT(*) AS n_docs,
             CAST(SUM(nt) AS BIGINT) AS n_tokens,
             CAST(MIN(nt) AS BIGINT) AS min_tokens,
             CAST(MAX(nt) AS BIGINT) AS max_tokens
      FROM base GROUP BY g
    ),
    lc AS (
      SELECT g, lang, COUNT(*) AS c,
             row_number() OVER (PARTITION BY g
                                ORDER BY COUNT(*) DESC, lang ASC) AS rk
      FROM base GROUP BY g, lang
    ),
    langs AS (
      SELECT g, COUNT(*) AS n_langs,
             MAX(CASE WHEN rk = 1 THEN lang END) AS top_lang,
             MAX(CASE WHEN rk = 1 THEN c END) AS top_lang_docs
      FROM lc GROUP BY g
    ),
    tot AS (SELECT SUM(n_docs) AS total FROM per)
    SELECT per.g AS source, per.n_docs, per.n_tokens,
           per.min_tokens, per.max_tokens,
           round(CAST(per.n_tokens AS DOUBLE) / per.n_docs, 9) AS mean_tokens,
           langs.n_langs, langs.top_lang,
           CAST(langs.top_lang_docs AS BIGINT) AS top_lang_docs,
           round(CAST(per.n_docs AS DOUBLE) / tot.total, 9) AS docs_share
    FROM per JOIN langs ON per.g IS NOT DISTINCT FROM langs.g, tot
"""


# ---------------------------------------------------------------------------
# FILES metadata table
# ---------------------------------------------------------------------------


def q_files_table(spark, sf_dir):
    """FILES metadata table (fetch.py dataset_files — Iceberg's
    ``table.files``, from the sidecar manifests, zero FS listings):
    publish nation in two commits, then report which (version, partition)
    combinations hold files. File names and counts depend on write
    parallelism, so the gated shape is the DISTINCT (version, partition
    value) spine — deterministic, and exactly what a vacuum/compaction
    audit reads. The oracle derives the same spine from the raw table."""
    from .fetch import dataset_files

    path = _two_version_nation(spark, sf_dir, "files_tbl")
    ft = dataset_files(spark, path)
    assert ft.filter(F.col("version").isNull()).count() == 0
    assert ft.filter(F.col("file").endswith(".parquet")).count() == ft.count()
    return (
        ft.select("version", "n_regionkey")
        .distinct()
        .select("version", F.col("n_regionkey").cast("bigint").alias("n_regionkey"))
    )


QUERIES_EXT2["files_table"] = q_files_table
ORACLE_EXT2["files_table"] = """
    SELECT 1 AS version, n_regionkey FROM nation WHERE n_nationkey < 10
    GROUP BY n_regionkey
    UNION ALL
    SELECT 2 AS version, n_regionkey FROM nation WHERE n_nationkey >= 10
    GROUP BY n_regionkey
"""


# ---------------------------------------------------------------------------
# column rename evolution under the gate
# ---------------------------------------------------------------------------


def q_rename_evolution_fetch(spark, sf_dir):
    """Metadata-only column rename (publish.py rename_column — name-mapped
    schema evolution, no file rewrite): publish nation with n_name, rename
    it to nation_name, append more rows under the NEW name, fetch. The
    scan reads both physical names and coalesces; appends under the old
    name are rejected (asserted); time travel to the pre-rename snapshot
    serves the mapped name. Oracle = the full nation table with the
    renamed column."""
    from .fetch import fetch_at, fetch_path
    from .publish import publish_path, rename_column
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "rename_rt")
    shutil.rmtree(path, ignore_errors=True)
    nation = _table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    publish_path(
        spark, path, nation.filter(F.col("n_nationkey") < 10), ["n_regionkey"]
    )
    rename_column(spark, path, "n_name", "nation_name")
    publish_path(
        spark, path,
        nation.filter(F.col("n_nationkey") >= 10)
        .withColumnRenamed("n_name", "nation_name"),
        ["n_regionkey"], mode="append",
    )
    try:
        publish_path(
            spark, path,
            nation.limit(1), ["n_regionkey"], mode="append",
        )
        raise AssertionError("old-name append was accepted")
    except ValueError:
        pass
    assert fetch_at(spark, path, 1).columns == [
        "n_nationkey", "nation_name", "n_regionkey"
    ]
    return fetch_path(spark, path).select(
        "n_nationkey", "nation_name", "n_regionkey"
    )


QUERIES_EXT2["rename_evolution_fetch"] = q_rename_evolution_fetch
ORACLE_EXT2["rename_evolution_fetch"] = """
    SELECT n_nationkey, n_name AS nation_name, n_regionkey FROM nation
"""


# ---------------------------------------------------------------------------
# row-level change data feed for DML
# ---------------------------------------------------------------------------


def q_dml_change_feed(spark, sf_dir):
    """Row-level CDF for DML (publish.py change_log): publish nation,
    UPDATE (bump region of nations 0-4) and DELETE (nations 20+) with
    change logging; the feed dataset then carries the pre/post images and
    deleted rows — what a downstream sync consumes to mirror the DML
    without diffing snapshots. Feed ordering is the feed's own version
    history (asserted: one append per DML). Oracle replays the expected
    change rows from the raw table."""
    from .fetch import fetch_path, list_versions
    from .publish import (
        changes_path, delete_where, publish_path, update_where,
    )
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "cdf_rt")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(changes_path(path), ignore_errors=True)
    nation = _table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    publish_path(spark, path, nation, ["n_regionkey"])
    update_where(
        spark, path, {"n_name": "concat(n_name, '_X')"},
        "n_nationkey < 5", change_log=True,
    )
    delete_where(spark, path, "n_nationkey >= 20", change_log=True)
    assert [v["version"] for v in list_versions(spark, changes_path(path))] \
        == [1, 2], "feed history must order the two DML commits"
    return fetch_path(spark, changes_path(path)).select(
        "n_nationkey", "n_name", "n_regionkey", "_change_type"
    )


QUERIES_EXT2["dml_change_feed"] = q_dml_change_feed
ORACLE_EXT2["dml_change_feed"] = """
    SELECT n_nationkey, n_name, n_regionkey,
           'update_preimage' AS _change_type
    FROM nation WHERE n_nationkey < 5
    UNION ALL
    SELECT n_nationkey, n_name || '_X', n_regionkey, 'update_postimage'
    FROM nation WHERE n_nationkey < 5
    UNION ALL
    SELECT n_nationkey, n_name, n_regionkey, 'delete'
    FROM nation WHERE n_nationkey >= 20
"""


def q_merge_change_feed(spark, sf_dir):
    """MERGE change feed (publish.py merge_upsert change_log): publish
    nation with a seq column, merge a batch that updates nations 0-2
    (winning seq), re-sends nation 3 with a LOSING seq (no change rows),
    and inserts shifted keys 100-102; the feed carries exactly the insert
    rows and the update pre/post pairs. Oracle derives the same change
    set from the raw table."""
    from .fetch import fetch_path
    from .publish import changes_path, merge_upsert, publish_path
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "merge_cdf_rt")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(changes_path(path), ignore_errors=True)
    nation = _table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ).withColumn("seq", F.lit(0))
    publish_path(spark, path, nation, ["n_regionkey"])
    batch = (
        nation.filter(F.col("n_nationkey") < 3)
        .withColumn("n_name", F.concat(F.col("n_name"), F.lit("_M")))
        .withColumn("seq", F.lit(1))
    ).unionByName(
        nation.filter(F.col("n_nationkey") == 3).withColumn("seq", F.lit(-1))
    ).unionByName(
        nation.filter(F.col("n_nationkey") < 3)
        .withColumn("n_nationkey", F.col("n_nationkey") + 100)
        .withColumn("seq", F.lit(1))
    )
    merge_upsert(spark, path, batch, ["n_nationkey"], "seq", change_log=True)
    return fetch_path(spark, changes_path(path)).select(
        "n_nationkey", "n_name", "n_regionkey", "_change_type"
    )


QUERIES_EXT2["merge_change_feed"] = q_merge_change_feed
ORACLE_EXT2["merge_change_feed"] = """
    SELECT n_nationkey + 100 AS n_nationkey, n_name,
           n_regionkey, 'insert' AS _change_type
    FROM nation WHERE n_nationkey < 3
    UNION ALL
    SELECT n_nationkey, n_name, n_regionkey, 'update_preimage'
    FROM nation WHERE n_nationkey < 3
    UNION ALL
    SELECT n_nationkey, n_name || '_M', n_regionkey, 'update_postimage'
    FROM nation WHERE n_nationkey < 3
"""


def q_cdc_mirror_fetch(spark, sf_dir):
    """CDC round trip, source to mirror (publish.py apply_change_feed):
    source and mirror both start as nation; the source runs UPDATE (name
    suffix for keys < 5) and DELETE (keys >= 20) with change logging; the
    mirror replays the feed and is fetched. Asserts mirror == source
    exactly before returning. Oracle = the expected final table derived
    from raw nation — the mirror must reconstruct it from change rows
    alone, never reading the source."""
    from .fetch import fetch_path
    from .publish import (
        apply_change_feed, changes_path, delete_where, publish_path,
        update_where,
    )
    from .workload import _CACHE_ROOT, _ds_path

    root = _ds_path(sf_dir, "")
    src = os.path.join(root, "cdc_src")
    mir = os.path.join(root, "cdc_mir")
    for p in (src, mir, changes_path(src)):
        shutil.rmtree(p, ignore_errors=True)
    nation = _table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    publish_path(spark, src, nation, ["n_regionkey"])
    publish_path(spark, mir, nation, ["n_regionkey"])
    update_where(
        spark, src, {"n_name": "concat(n_name, '_C')"},
        "n_nationkey < 5", change_log=True,
    )
    delete_where(spark, src, "n_nationkey >= 20", change_log=True)
    n = apply_change_feed(spark, mir, changes_path(src), ["n_nationkey"])
    assert n == 10, f"expected 10 applied change rows, got {n}"
    a = sorted(map(tuple, fetch_path(spark, src).collect()))
    b = sorted(map(tuple, fetch_path(spark, mir).collect()))
    assert a == b, "mirror diverged from source after replay"
    return fetch_path(spark, mir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


QUERIES_EXT2["cdc_mirror_fetch"] = q_cdc_mirror_fetch
ORACLE_EXT2["cdc_mirror_fetch"] = """
    SELECT n_nationkey,
           CASE WHEN n_nationkey < 5 THEN n_name || '_C' ELSE n_name END
             AS n_name,
           n_regionkey
    FROM nation
    WHERE n_nationkey < 20
"""


def q_hidden_pushdown_fetch(spark, sf_dir):
    """Transform-predicate pushdown (fetch.py _derived_pushdown — the
    "hidden" half of hidden partitioning): events land under a derived
    event-day layout; the fetch filters on the SOURCE column ts — never
    naming event_day — and the filter must still prune at the file index
    (asserted: event_day inside PartitionFilters) while the row-level
    residual keeps semantics exact. Returns per-type aggregates of the
    back half of the month; the oracle applies the raw ts predicate."""
    from .fetch import fetch_path
    from .streaming import stream_publish
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "hidden_push_rt")
    shutil.rmtree(path, ignore_errors=True)
    stream_publish(
        spark, posixpath.join(sf_dir, "events.parquet"), path, [],
        derived_partitions={"event_day": "date_format(ts, 'yyyy-MM-dd')"},
    )
    out = fetch_path(spark, path, filters=[
        {"partition": "ts", "comparison": ">=",
         "values": ["2024-01-15 00:00:00"]},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, "no PartitionFilters section in plan"
    assert "event_day" in plan.split("PartitionFilters", 1)[1][:250], (
        "source-column filter did not prune via the derived partition"
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


QUERIES_EXT2["hidden_pushdown_fetch"] = q_hidden_pushdown_fetch
ORACLE_EXT2["hidden_pushdown_fetch"] = """
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
    GROUP BY event_type
"""


def q_source_entropy(spark, sf_dir):
    """Per-source unigram entropy (operators/text.py unigram_entropy): the
    corpus-health metric flagging degenerate sources — exact counts, one
    decimal-rounded float term per word, order-independent decimal sum.
    The oracle replays the identical arithmetic."""
    from .operators import unigram_entropy

    docs = _table(spark, sf_dir, "documents").select("source", "text")
    out = unigram_entropy(docs, "source", "text")
    return out.select(
        "source", "n_tokens", "n_distinct",
        F.round("entropy", 9).alias("entropy"),
        F.round("norm_entropy", 9).alias("norm_entropy"),
    )


QUERIES_EXT2["source_entropy"] = q_source_entropy
ORACLE_EXT2["source_entropy"] = """
    WITH toks AS (
      SELECT source AS g,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents
    ),
    wc AS (SELECT g, w, COUNT(*) AS c FROM toks GROUP BY g, w),
    totals AS (
      SELECT g, CAST(SUM(c) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_distinct
      FROM wc GROUP BY g
    ),
    terms AS (
      SELECT wc.g, totals.n_tokens, totals.n_distinct,
             CAST(-(CAST(c AS DOUBLE) / n_tokens)
                  * ln(CAST(c AS DOUBLE) / n_tokens)
                  AS DECIMAL(28,12)) AS t
      FROM wc JOIN totals ON wc.g = totals.g
    ),
    ent AS (
      SELECT g, n_tokens, n_distinct,
             CAST(SUM(t) AS DOUBLE) AS entropy
      FROM terms GROUP BY g, n_tokens, n_distinct
    )
    SELECT g AS source, n_tokens, CAST(n_distinct AS BIGINT) AS n_distinct,
           round(entropy, 9) AS entropy,
           round(CASE WHEN n_distinct > 1
                      THEN entropy / ln(CAST(n_distinct AS DOUBLE))
                      ELSE 0.0 END, 9) AS norm_entropy
    FROM ent
"""


def q_gumbel_sample(spark, sf_dir):
    """Deterministic Gumbel top-k resampling (operators/sampling.py
    gumbel_topk_sample — DSIR's selection step with derandomized noise):
    top-100 documents drawn proportional to exp(n_chars/1000), the
    Gumbel key derived from each doc's md5 hash so any engine draws the
    identical subset. The oracle replays hash, uniform, Gumbel, and
    ranking bit-for-bit."""
    from .operators import gumbel_topk_sample

    docs = _table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars").cast("double") / 1000.0).alias("score")
    )
    out = gumbel_topk_sample(docs, "doc_id", "score", n=100)
    return out.select(
        "doc_id",
        F.round("score", 9).alias("score"),
        F.round("gumbel_key", 9).alias("gumbel_key"),
    )


QUERIES_EXT2["gumbel_sample"] = q_gumbel_sample
ORACLE_EXT2["gumbel_sample"] = """
    WITH s AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) / 1000.0 AS score,
             (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                   AS BIGINT)
              + 0.5) / 1152921504606846976.0 AS u
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, score, score / 1.0 + (-ln(-ln(u))) AS gumbel_key
      FROM s
    )
    SELECT doc_id, round(score, 9) AS score,
           round(gumbel_key, 9) AS gumbel_key
    FROM keyed
    ORDER BY gumbel_key DESC, doc_id ASC
    LIMIT 100
"""


def q_events_stream_topk(spark, sf_dir):
    """Streaming per-window heavy hitters (streaming/events.py
    run_streaming_window_topk): daily top-3 users by event count, the
    count aggregate on the watermarked stream and the rank on the
    materialized sink (ranking cannot retract in append mode — the
    standard aggregate-then-rank split). availableNow makes it equal the
    batch query, which is the oracle."""
    from .streaming import run_streaming_window_topk

    return run_streaming_window_topk(
        spark, posixpath.join(sf_dir, "events.parquet"), window="1 day", k=3
    )


QUERIES_EXT2["events_stream_topk"] = q_events_stream_topk
ORACLE_EXT2["events_stream_topk"] = """
    WITH counts AS (
      SELECT date_trunc('day', ts) AS window_start, user_id,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT window_start, user_id, n_events,
             row_number() OVER (PARTITION BY window_start
                                ORDER BY n_events DESC, user_id ASC) AS rk
      FROM counts
    )
    SELECT window_start, user_id, n_events, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
"""


def q_winsorized_pricing(spark, sf_dir):
    """Percentile winsorization (operators/profile.py clip_outliers):
    lineitem prices clamped to their exact [p05, p95] band, then the Q1
    aggregate over the cleaned values — the robust-statistics variant of
    pricing_summary. The oracle replays quantile_cont bounds and the
    clamp."""
    from .operators import clip_outliers

    li = _table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    cleaned = clip_outliers(li, ["l_extendedprice"], 0.05, 0.95)
    return cleaned.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


QUERIES_EXT2["winsorized_pricing"] = q_winsorized_pricing
ORACLE_EXT2["winsorized_pricing"] = """
    WITH b AS (
      SELECT quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
      FROM lineitem
    ),
    c AS (
      SELECT l_returnflag,
             greatest(b.lo, least(b.hi, l_extendedprice)) AS p
      FROM lineitem, b
    )
    SELECT l_returnflag, COUNT(*) AS n_rows,
           CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           MIN(p) AS min_price, MAX(p) AS max_price
    FROM c GROUP BY l_returnflag
"""


def q_zscore_by_flag(spark, sf_dir):
    """Group-wise z-score normalization (operators/profile.py
    normalize_by_group): lineitem prices normalized within each return
    flag, validated through per-flag aggregates of the normalized column
    (mean ~ 0, sample std ~ 1 by construction — the oracle replays the
    arithmetic, not just the shape)."""
    from .operators import normalize_by_group

    li = _table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    z = normalize_by_group(li, "l_returnflag", ["l_extendedprice"])
    return z.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.round(F.sum(F.col("l_extendedprice_z").cast("decimal(28,12)"))
                 .cast("double"), 6) + F.lit(0.0)).alias("sum_z"),
        F.round(F.max("l_extendedprice_z"), 9).alias("max_z"),
        F.round(F.min("l_extendedprice_z"), 9).alias("min_z"),
    )


QUERIES_EXT2["zscore_by_flag"] = q_zscore_by_flag
ORACLE_EXT2["zscore_by_flag"] = """
    WITH stats AS (
      SELECT l_returnflag, AVG(l_extendedprice) AS mu,
             stddev_samp(l_extendedprice) AS sd
      FROM lineitem GROUP BY l_returnflag
    ),
    z AS (
      SELECT l.l_returnflag,
             CASE WHEN sd IS NULL OR sd = 0 THEN 0.0
                  ELSE (l_extendedprice - mu) / sd END AS zv
      FROM lineitem l JOIN stats USING (l_returnflag)
    )
    SELECT l_returnflag, COUNT(*) AS n_rows,
           round(CAST(SUM(CAST(zv AS DECIMAL(28,12))) AS DOUBLE), 6) + 0.0
             AS sum_z,
           round(MAX(zv), 9) AS max_z,
           round(MIN(zv), 9) AS min_z
    FROM z GROUP BY l_returnflag
"""


def q_split_leakage(spark, sf_dir):
    """Cross-split leakage report (operators/dedup.py
    split_leakage_report): assign deterministic train/val/test splits,
    then list near-dup pairs (3-gram Jaccard >= 0.8) straddling a split
    boundary — benchmark contamination created by the split itself. The
    oracle replays both the hash-range split assignment and the exact
    near-dup join."""
    from .operators import split_leakage_report
    from .operators.sampling import assign_splits

    docs = assign_splits(
        _table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    out = split_leakage_report(docs, "doc_id", "text", "split")
    return out.select(
        "doc_a", "doc_b", "split_a", "split_b",
        F.round("jaccard", 9).alias("jaccard"),
    )


QUERIES_EXT2["split_leakage"] = q_split_leakage
ORACLE_EXT2["split_leakage"] = """
    WITH sp AS (
      SELECT doc_id, text,
             CASE
               WHEN """ + _HASH60_SQL + """ % 10000 < 8000 THEN 'train'
               WHEN """ + _HASH60_SQL + """ % 10000 < 9000 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents
    ),
    words AS (
      SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
            FROM sp)
    ), sh AS (
      SELECT DISTINCT doc_id,
             w || ' ' || lead(w, 1) OVER win || ' ' ||
             lead(w, 2) OVER win AS shingle
      FROM words
      WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      QUALIFY lead(w, 2) OVER win IS NOT NULL
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT doc_a, doc_b,
             CAST(n_common AS DOUBLE)
               / (sa.nsh + sb.nsh - n_common) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_common AS DOUBLE) / (sa.nsh + sb.nsh - n_common) >= 0.8
    )
    SELECT p.doc_a, p.doc_b, la.split AS split_a, lb.split AS split_b,
           round(p.jaccard, 9) AS jaccard
    FROM pairs p
    JOIN sp la ON la.doc_id = p.doc_a
    JOIN sp lb ON lb.doc_id = p.doc_b
    WHERE la.split <> lb.split
"""


def q_partition_stats(spark, sf_dir):
    """Partition-granularity ANALYZE (stats.py collect_partition_stats):
    publish nation by region, collect per-partition row counts into the
    sidecar, then answer "how many rows per partition" from METADATA
    ONLY (read_partition_stats — zero data scan; the second read is
    asserted to come from the stored record, not a recount). Oracle =
    count(*) per region from the raw table."""
    from .publish import publish_path
    from .stats import collect_partition_stats, read_partition_stats
    from .workload import _CACHE_ROOT, _ds_path

    path = _ds_path(sf_dir, "pstats_rt")
    shutil.rmtree(path, ignore_errors=True)
    nation = _table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    publish_path(spark, path, nation, ["n_regionkey"])
    assert read_partition_stats(spark, path) is None, "stats before ANALYZE"
    collect_partition_stats(spark, path)
    recs = read_partition_stats(spark, path)
    assert recs is not None and all("n_rows" in r for r in recs)
    return local_rows_df(
        spark,
        [(int(r["values"]["n_regionkey"]), r["n_rows"]) for r in recs],
        "n_regionkey BIGINT, n_rows BIGINT",
    )


QUERIES_EXT2["partition_stats"] = q_partition_stats
ORACLE_EXT2["partition_stats"] = """
    SELECT n_regionkey, COUNT(*) AS n_rows
    FROM nation GROUP BY n_regionkey
"""


def q_cluster_exemplars(spark, sf_dir):
    """Near-dup cluster exemplars (operators/dedup.py cluster_exemplars):
    per cluster, the member with maximum summed edge Jaccard (the
    best-connected canonical version), ties by id — the quality-aware
    alternative to keep-min-id. The oracle replays pairs, transitive
    closure, decimal centrality sums, and the argmax."""
    from .operators import cluster_exemplars

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    out = cluster_exemplars(docs, "doc_id", "text", threshold=0.8)
    return out.select(
        "cluster", "exemplar", "n_members",
        F.round("centrality", 9).alias("centrality"),
    )


QUERIES_EXT2["cluster_exemplars"] = q_cluster_exemplars
ORACLE_EXT2["cluster_exemplars"] = """
    WITH RECURSIVE words AS (
      SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
            FROM documents)
    ), sh AS (
      SELECT DISTINCT doc_id,
             w || ' ' || lead(w, 1) OVER win || ' ' ||
             lead(w, 2) OVER win AS shingle
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
      SELECT doc_a, doc_b,
             CAST(CAST(n_common AS DOUBLE)
                  / (sa.n + sb.n - n_common) AS DECIMAL(28,12)) AS j
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.8
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ), reach AS (
      SELECT a AS node, a AS r FROM edges
      UNION
      SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a
    ), comp AS (
      SELECT node, MIN(r) AS cluster FROM reach GROUP BY node
    ), cent AS (
      SELECT node, SUM(j) AS c FROM (
        SELECT doc_a AS node, j FROM pairs
        UNION ALL
        SELECT doc_b AS node, j FROM pairs
      ) GROUP BY node
    ), ranked AS (
      SELECT comp.cluster, comp.node, cent.c,
             COUNT(*) OVER (PARTITION BY comp.cluster) AS n_members,
             row_number() OVER (PARTITION BY comp.cluster
                                ORDER BY cent.c DESC, comp.node ASC) AS rk
      FROM comp JOIN cent ON comp.node = cent.node
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(node AS BIGINT) AS exemplar,
           n_members,
           round(CAST(c AS DOUBLE), 9) AS centrality
    FROM ranked WHERE rk = 1
"""


def q_embedding_outliers(spark, sf_dir):
    """Embedding-space outlier sweep (operators/similarity.py
    embedding_outliers): vectors farther than mean + 2 sigma from their
    label centroid — the mislabeled/corrupted-vector filter. Returns the
    flagged rows; the oracle replays centroids, distances, and the
    threshold arithmetic."""
    from .operators import embedding_outliers

    emb = _table(spark, sf_dir, "embeddings")
    out = embedding_outliers(emb, "vec_id", "embedding", "label")
    return (
        out.filter(F.col("is_outlier"))
        .select(
            "vec_id", "label",
            F.round("dist", 9).alias("dist"),
            F.round("threshold", 9).alias("threshold"),
        )
    )


QUERIES_EXT2["embedding_outliers"] = q_embedding_outliers
ORACLE_EXT2["embedding_outliers"] = """
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    ex AS (
      SELECT vec_id, label,
             unnest(generate_series(1, len(v))) AS pos, v
      FROM e
    ),
    ex2 AS (SELECT vec_id, label, pos, v[pos] AS x FROM ex),
    cent AS (
      SELECT label, pos, AVG(x) AS c FROM ex2 GROUP BY label, pos
    ),
    dist AS (
      SELECT ex2.vec_id, ex2.label,
             sqrt(SUM((x - c) * (x - c))) AS dist
      FROM ex2 JOIN cent ON ex2.label = cent.label AND ex2.pos = cent.pos
      GROUP BY ex2.vec_id, ex2.label
    ),
    stats AS (
      SELECT label, AVG(dist) AS mu,
             COALESCE(stddev_samp(dist), 0.0) AS sd
      FROM dist GROUP BY label
    )
    SELECT d.vec_id, d.label,
           round(d.dist, 9) AS dist,
           round(s.mu + 2.0 * s.sd, 9) AS threshold
    FROM dist d JOIN stats s ON d.label = s.label
    WHERE d.dist > s.mu + 2.0 * s.sd
"""


def q_semantic_decontaminate(spark, sf_dir):
    """Semantic benchmark decontamination (operators/similarity.py
    decontaminate_semantic — the embedding-space complement of the n-gram
    rule, catching paraphrased eval leakage): drop corpus vectors
    cosine-similar (>= 0.25, tuned to this synthetic distribution) to any
    of the 20 benchmark vectors; benchmark broadcast, corpus one scan.
    Returns kept ids + labels; the oracle replays the cosine filter and
    anti-join."""
    from .operators import decontaminate_semantic

    emb = _table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") < 20)
    corpus = emb.filter(F.col("vec_id") >= 20)
    kept = decontaminate_semantic(
        corpus, "vec_id", "embedding", bench, threshold=0.25
    )
    return kept.select("vec_id", "label")


QUERIES_EXT2["semantic_decontaminate"] = q_semantic_decontaminate
ORACLE_EXT2["semantic_decontaminate"] = """
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    bench AS (SELECT v AS bv FROM e WHERE vec_id < 20),
    corpus AS (SELECT vec_id, label, v FROM e WHERE vec_id >= 20),
    dirty AS (
      SELECT DISTINCT c.vec_id
      FROM corpus c CROSS JOIN bench b
      -- NaN guard: a zero-magnitude vector's cosine is NaN in DuckDB
      -- (compares greater than everything) but NULL in Spark (filter
      -- false); exclude it so both engines keep such rows
      WHERE NOT isnan(list_cosine_similarity(c.v, b.bv))
        AND list_cosine_similarity(c.v, b.bv) >= 0.25
    )
    SELECT c.vec_id, c.label
    FROM corpus c
    WHERE c.vec_id NOT IN (SELECT vec_id FROM dirty)
"""


def q_winnow_matches(spark, sf_dir):
    """Winnowing-based document matching (operators/text.py
    winnow_fingerprints — Schleimer/Wilkerson/Aiken SIGMOD'03, the MOSS
    plagiarism-detection fingerprint): positional 5-gram hashes, sliding
    window-4 minima, distinct fingerprints per doc; documents sharing >= 3
    fingerprints pair up via ONE equi-join on the fingerprint key (never
    doc x doc). The portable md5-60-bit hash makes the whole pipeline —
    tokenization, positional k-grams, window minima, the match join —
    exactly replayable in SQL, so the approximate matcher is value-checked,
    not just shape-checked."""
    from .operators.text import winnow_fingerprints
    from .workload import _table

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = winnow_fingerprints(
        docs, "doc_id", "text", k=5, window=4, portable_hash=True
    )
    a = fp.select(
        F.col("doc_id").alias("doc_a"), F.col("fingerprint")
    )
    b = fp.select(
        F.col("doc_id").alias("doc_b"), F.col("fingerprint")
    )
    return (
        a.join(b, "fingerprint")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )


QUERIES_EXT2["winnow_matches"] = q_winnow_matches
ORACLE_EXT2["winnow_matches"] = """
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(coalesce(text, '')), '\\s+') AS u
      FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(u) < 5 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(
                    generate_series(1, len(u) - 4),
                    i -> array_to_string(u[i:i+4], ' ')) END AS kg
      FROM t
    ), h AS (
      SELECT doc_id,
             list_transform(
               kg,
               s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)) AS hs
      FROM g
    ), mins AS (
      SELECT doc_id,
             CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
                  WHEN len(hs) <= 4 THEN [list_min(hs)]
                  ELSE list_transform(
                    generate_series(0, len(hs) - 4),
                    i -> list_min(hs[i+1:i+4])) END AS m
      FROM h
    ), fp AS (
      SELECT DISTINCT doc_id, unnest(m) AS fingerprint FROM mins
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint
     AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 3
"""


def q_history_table(spark, sf_dir):
    """HISTORY metadata table (fetch.py dataset_history — Iceberg's
    ``table.history``/``snapshots`` from the sidecar, zero FS access):
    over the shared two-commit nation dataset, report each snapshot's
    version and how many distinct hive partitions its commit touched.
    File counts depend on write parallelism, so the gated shape is the
    deterministic (version, partitions_touched) spine — exactly what a
    retention/compaction audit reads; the oracle derives the same spine
    from the raw table's split."""
    from .fetch import dataset_history

    path = _two_version_nation(spark, sf_dir, "files_tbl")
    h = dataset_history(spark, path)
    assert h.filter(F.col("committed_at").isNull()).count() == 0
    assert h.filter(F.col("n_files_added") < 1).count() == 0
    return h.select(
        "version", F.col("partitions_touched").cast("bigint").alias(
            "partitions_touched"
        )
    )


QUERIES_EXT2["history_table"] = q_history_table
ORACLE_EXT2["history_table"] = """
    SELECT 1 AS version,
           CAST(COUNT(DISTINCT n_regionkey) AS BIGINT) AS partitions_touched
    FROM nation WHERE n_nationkey < 10
    UNION ALL
    SELECT 2,
           CAST(COUNT(DISTINCT n_regionkey) AS BIGINT)
    FROM nation WHERE n_nationkey >= 10
"""


def q_csv_ingest_roundtrip(spark, sf_dir):
    """CSV → engine dataset round trip (sources.read_csv → publish →
    fetch): nation is exported to a headered CSV once (cached build), read
    back under an EXPLICIT schema with FAILFAST parsing (corrupt extracts
    abort at ingest, never silently NULL), published partitioned by
    region, and fetched through the sidecar-typed pruned scan. Oracle =
    the raw nation table — the whole ingestion path must be lossless."""
    from pyspark.sql import types as T

    from .fetch import fetch_path
    from .publish import publish_path
    from .sources import read_csv
    from .workload import _ds_path

    root = _ds_path(sf_dir, "csv_ingest")
    csv_dir = os.path.join(root, "landing")
    ds = os.path.join(root, "ds")
    marker = os.path.join(ds, "_INGESTED")
    if not os.path.exists(marker) or not _plain_fixture_ok(spark, ds):
        shutil.rmtree(root, ignore_errors=True)
        # the landing extract is staged by the engine's own distributed
        # writer, not a driver-side csv.writer loop
        (
            _table(spark, sf_dir, "nation")
            .select("n_nationkey", "n_name", "n_regionkey")
            .coalesce(1)
            .write.option("header", "true")
            .csv(csv_dir)
        )
        schema = T.StructType(
            [
                T.StructField("n_nationkey", T.IntegerType()),
                T.StructField("n_name", T.StringType()),
                T.StructField("n_regionkey", T.IntegerType()),
            ]
        )
        df = read_csv(spark, csv_dir, schema)
        publish_path(spark, ds, df, ["n_regionkey"])
        with open(marker, "w") as fh:
            fh.write("ok")
    return fetch_path(spark, ds).select(
        "n_nationkey", "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )


QUERIES_EXT2["csv_ingest_roundtrip"] = q_csv_ingest_roundtrip
ORACLE_EXT2["csv_ingest_roundtrip"] = """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
"""


# ---------------------------------------------------------------------------
# partition-spec evolution (round 7)
# ---------------------------------------------------------------------------


def q_partition_evolution_fetch(spark, sf_dir):
    """Partition-SPEC evolution (publish.py evolve_partitions — Iceberg's
    metadata-only partition evolution, vs ``repartition_dataset``'s full
    rewrite): orders lands in two eras — v1 partitioned by
    ``o_orderpriority`` (the ingest layout), v2 appended under a NEW spec
    partitioned by ``o_orderstatus`` after the hot filter changed. ZERO
    data movement: old files stay under the old hive dirs; the sidecar
    records both specs with each snapshot stamped to its spec, and fetch
    plans a per-spec UNION — the priority filter prunes v1's slice at the
    file index (asserted on the plan) and applies row-level on v2's slice
    where priority is a data column. Oracle = the filter over raw orders:
    evolution must be invisible to results."""
    from . import metadata
    from .fetch import fetch_path
    from .publish import publish_path
    from .workload import _ds_path

    path = _ds_path(sf_dir, "part_evo")
    marker = os.path.join(path, "_EVOLVED")
    if not os.path.exists(marker) or not _plain_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        orders = _table(spark, sf_dir, "orders")
        publish_path(
            spark, path,
            orders.filter(F.col("o_orderkey") % 2 == 0),
            ["o_orderpriority"],
        )
        publish_path(
            spark, path,
            orders.filter(F.col("o_orderkey") % 2 == 1),
            ["o_orderstatus"],
            evolve_partitions=True,
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    m = metadata.read_sidecar(spark, path)
    assert [sp["spec_id"] for sp in m.partition_specs] == [1, 2]
    assert [s.get("spec") for s in m.snapshots] == [1, 2]
    out = fetch_path(
        spark,
        path,
        filters=[
            {"partition": "o_orderpriority", "comparison": "==",
             "values": ["1-URGENT"]}
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderpriority" in plan.split(
        "PartitionFilters", 1
    )[1][:300], "old-spec slice lost its file-index prune"
    return out.select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )


QUERIES_EXT2["partition_evolution_fetch"] = q_partition_evolution_fetch
ORACLE_EXT2["partition_evolution_fetch"] = """
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders WHERE o_orderpriority = '1-URGENT'
"""


# ---------------------------------------------------------------------------
# web-corpus domain curation (round 7)
# ---------------------------------------------------------------------------


def q_domain_cap_select(spark, sf_dir):
    """Per-domain document cap + blocklist (operators/domains.py — the
    RefinedWeb §3 curation axis: registrable-domain extraction as one JVM
    expression, blocklisted domains dropped, then at most N docs kept per
    domain, hash-deterministically). URLs are synthesized deterministically
    from doc_id across seven host shapes — subdomains, a multi-part public
    suffix (co.uk / com.au), a www host, an IPv4 — so the oracle replays
    the full extraction: host parse, suffix-list grouping, IP passthrough,
    blocklist, and the md5-rank cap. Plan: the cap's window runs on a
    narrow (key, domain) projection; the text payload only moves in the
    key-partitioned semi-join."""
    from .operators import domain_cap, domain_filter, registrable_domain

    docs = _table(spark, sf_dir, "documents")
    sel = (F.col("doc_id") % 7).cast("int")
    url = (
        F.when(sel == 0, F.concat(F.lit("https://news.example.co.uk/a/"), F.col("doc_id")))
        .when(sel == 1, F.concat(F.lit("http://blog.sample.com/p?id="), F.col("doc_id")))
        .when(sel == 2, F.concat(F.lit("https://www.archive.org/d/"), F.col("doc_id")))
        .when(sel == 3, F.concat(F.lit("https://mirror.data.example.com/x/"), F.col("doc_id")))
        .when(sel == 4, F.concat(F.lit("http://sub.deep.site.com.au/p/"), F.col("doc_id")))
        .when(sel == 5, F.concat(F.lit("https://192.168.10.1/raw/"), F.col("doc_id")))
        .otherwise(F.concat(F.lit("https://wiki.sample.com/w/"), F.col("doc_id")))
    )
    tagged = docs.withColumn("url", url)
    kept = domain_filter(tagged, "url", ["192.168.10.1"])
    capped = domain_cap(kept, "url", 10, "doc_id", portable_hash=True)
    return capped.select(
        "doc_id",
        registrable_domain(F.col("url")).alias("domain"),
        "source",
    )


def _domain_cap_oracle() -> str:
    from .operators.domains import MULTI_PART_SUFFIXES

    suffixes = ", ".join(f"'{s}'" for s in MULTI_PART_SUFFIXES)
    return f"""
        WITH u AS (
          SELECT doc_id, source,
                 CASE doc_id % 7
                   WHEN 0 THEN 'https://news.example.co.uk/a/' || doc_id
                   WHEN 1 THEN 'http://blog.sample.com/p?id=' || doc_id
                   WHEN 2 THEN 'https://www.archive.org/d/' || doc_id
                   WHEN 3 THEN 'https://mirror.data.example.com/x/' || doc_id
                   WHEN 4 THEN 'http://sub.deep.site.com.au/p/' || doc_id
                   WHEN 5 THEN 'https://192.168.10.1/raw/' || doc_id
                   ELSE 'https://wiki.sample.com/w/' || doc_id
                 END AS url
          FROM documents
        ), h AS (
          SELECT doc_id, source,
                 regexp_replace(
                   lower(regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1)),
                   '\\.$', '') AS host
          FROM u
        ), l AS (
          SELECT doc_id, source, host, string_split(host, '.') AS ls FROM h
        ), d AS (
          SELECT doc_id, source,
                 CASE
                   WHEN regexp_matches(host, '^\\d{{1,3}}(\\.\\d{{1,3}}){{3}}$')
                     THEN host
                   WHEN len(ls) >= 3
                        AND (ls[-2] || '.' || ls[-1]) IN ({suffixes})
                     THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
                   WHEN len(ls) >= 2 THEN ls[-2] || '.' || ls[-1]
                   ELSE host
                 END AS domain
          FROM l
        ), f AS (
          SELECT * FROM d WHERE domain <> '192.168.10.1'
        ), r AS (
          SELECT doc_id, source, domain,
                 row_number() OVER (
                   PARTITION BY domain
                   ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                                 AS BIGINT),
                            doc_id
                 ) AS rn
          FROM f
        )
        SELECT doc_id, domain, source FROM r WHERE rn <= 10
    """


QUERIES_EXT2["domain_cap_select"] = q_domain_cap_select
ORACLE_EXT2["domain_cap_select"] = _domain_cap_oracle()


# ---------------------------------------------------------------------------
# CSV dead-letter ingestion (round 7)
# ---------------------------------------------------------------------------


def q_csv_deadletter_publish(spark, sf_dir):
    """Permissive CSV ingest with dead-letter routing end-to-end
    (sources.read_csv(permissive_col=...) → corrupt-row split →
    publish_with_expectations quarantine → pruned fetch of the clean
    slice): a landing area holds the nation extract PLUS two type-corrupt
    lines and one parseable-but-invalid row (n_regionkey=99). Corrupt
    lines land whole in the rescue column (never silent NULLs); the
    invalid row fails the range expectation and quarantines with the
    violated rule named; exactly the 25 clean rows publish. The good
    rows' staging file is written by the engine itself (df.write.csv) —
    only the hand-crafted corruption is driver-written. Oracle = the raw
    nation table: the whole ingest gauntlet must be lossless for clean
    data."""
    from pyspark.sql import types as T

    from .fetch import fetch_path
    from .publish import publish_with_expectations
    from .sources import read_csv
    from .workload import _ds_path

    root = _ds_path(sf_dir, "csv_deadletter")
    landing = os.path.join(root, "landing")
    ds = os.path.join(root, "ds")
    quarantine = os.path.join(root, "quarantine")
    marker = os.path.join(root, "_DONE")
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    if not os.path.exists(marker) or not _plain_fixture_ok(spark, ds):
        shutil.rmtree(root, ignore_errors=True)
        (
            _table(spark, sf_dir, "nation")
            .select("n_nationkey", "n_name", "n_regionkey")
            .coalesce(1)
            .write.option("header", "true")
            .csv(landing)
        )
        with open(os.path.join(landing, "batch2.csv"), "w") as fh:
            fh.write(
                "n_nationkey,n_name,n_regionkey\n"
                "xx,BADLAND,1\n"          # type-corrupt key
                "7,OOPS,zz\n"             # type-corrupt region
                "900,ATLANTIS,99\n"       # parses, violates the range rule
            )
        # Spark disallows filtering on the internal corrupt-record column
        # of a raw CSV scan (SPARK-21610): the parsed batch must be
        # materialized first — cheap here, and at scale the landing batch
        # is a bounded micro-batch, never the corpus
        raw = read_csv(
            spark, landing, schema, permissive_col="_corrupt"
        ).cache()
        bad_n = raw.filter(F.col("_corrupt").isNotNull()).count()
        assert bad_n == 2, f"expected 2 dead-letter rows, got {bad_n}"
        good = raw.filter(F.col("_corrupt").isNull()).drop("_corrupt")
        counts = publish_with_expectations(
            spark,
            ds,
            good,
            ["n_regionkey"],
            rules=[
                {"name": "key_present", "constraint": "n_nationkey IS NOT NULL"},
                {"name": "region_range",
                 "constraint": "n_regionkey BETWEEN 0 AND 4"},
            ],
            quarantine_path=quarantine,
        )
        assert counts == {"published": 25, "quarantined": 1}, counts
        q = fetch_path(spark, quarantine)
        assert [r["violated"] for r in q.collect()] == ["region_range"]
        with open(marker, "w") as fh:
            fh.write("ok")
    return fetch_path(spark, ds).select(
        "n_nationkey", "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )


QUERIES_EXT2["csv_deadletter_publish"] = q_csv_deadletter_publish
ORACLE_EXT2["csv_deadletter_publish"] = """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
"""


# ---------------------------------------------------------------------------
# round 8: zone maps / metadata counts / tags / pagerank
# ---------------------------------------------------------------------------


def _zonemap_fixture(spark, sf_dir) -> str:
    """lineitem partitioned by l_linestatus, sorted by l_orderkey within
    files, chunked small enough that the zone-map plane has several files
    per partition to skip, with per-file stats on l_orderkey."""
    from .workload import _cached_dataset

    return _cached_dataset(
        spark, sf_dir, "li_zonemap",
        lambda s, d: _table(s, d, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_linestatus",
        ),
        ["l_linestatus"],
        sort_within_files=["l_orderkey"],
        max_records_per_file=400,
        zone_map_columns=["l_orderkey"],
    )


def q_zonemap_fetch(spark, sf_dir):
    """File-level zone maps (publish zone_map_columns + fetch value-column
    filters — the Delta/Iceberg data-skipping plane restated for the
    sidecar): publish records per-file min/max/rows for l_orderkey via one
    column-pruned aggregate; fetch takes a RANGE filter on that VALUE
    column, skips dead files at the DRIVER from the recorded bounds
    (asserted below — no footer reads, no file-index entries for skipped
    files), and re-applies the exact predicate row-level (and to parquet
    row-group stats). Composes with partition pruning on l_linestatus in
    the same fetch. Oracle = the same two predicates in SQL."""
    from . import metadata
    from .fetch import _prune_zone_files, fetch_path

    path = _zonemap_fixture(spark, sf_dir)
    flt = [
        {"partition": "l_linestatus", "comparison": "==", "values": ["O"]},
        {"partition": "l_orderkey", "comparison": "<", "values": [1000]},
    ]
    meta = metadata.read_sidecar(spark, path)
    files = meta.manifest_files()
    kept = _prune_zone_files(
        files, meta,
        [f for f in flt if f["partition"] == "l_orderkey"],
    )
    if len(files) >= 6:
        assert len(kept) < len(files), (
            "zone maps skipped nothing on a range predicate over sorted files"
        )
    return fetch_path(spark, path, filters=flt).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


QUERIES_EXT2["zonemap_fetch"] = q_zonemap_fetch
ORACLE_EXT2["zonemap_fetch"] = """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_linestatus = 'O' AND l_orderkey < 1000
"""


def q_metadata_count(spark, sf_dir):
    """Aggregate pushdown to METADATA (Iceberg snapshot-summary / Delta
    numRecords): per-partition row counts and the dataset COUNT(*) are
    answered entirely from the sidecar's per-file row counts — one JSON
    read, zero data or footer I/O (asserted: the answer is computed on
    the driver, no Spark job over the data). The honesty rule is tested
    elsewhere: any manifest file without a recorded count makes the
    metadata answer raise instead of under-counting. Oracle = the same
    GROUP BY COUNT over raw lineitem."""
    from .fetch import dataset_rowcount, partition_rowcounts

    path = _zonemap_fixture(spark, sf_dir)
    per = partition_rowcounts(spark, path, "l_linestatus")
    total = dataset_rowcount(spark, path)
    assert total == sum(per.values())  # two metadata answers must agree
    return local_rows_df(
        spark, sorted(per.items()), "l_linestatus string, n_rows long"
    )


QUERIES_EXT2["metadata_count"] = q_metadata_count
ORACLE_EXT2["metadata_count"] = """
    SELECT l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_linestatus
"""


def q_tagged_fetch(spark, sf_dir):
    """Named snapshot refs (Iceberg tags): v1 of the dataset is tagged
    ``baseline`` before a second append lands; ``fetch_at_tag`` then
    reproduces EXACTLY the tagged file set by name — the human-addressable
    reproducibility handle a training run records instead of a raw
    version number. The tag also pins v1 against expire_snapshots
    (lifecycle tests). Oracle = the v1 slice predicate over raw orders:
    the later append must be invisible through the tag."""
    from .fetch import fetch_at_tag
    from .publish import list_tags, publish_path, tag_snapshot
    from .workload import _ds_path

    path = _ds_path(sf_dir, "orders_tagged")
    marker = os.path.join(path, "_TAGGED")
    if not os.path.exists(marker) or not _plain_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        orders = _table(spark, sf_dir, "orders")
        publish_path(
            spark, path,
            orders.filter(F.col("o_orderkey") % 3 == 0),
            ["o_orderstatus"],
        )
        tag_snapshot(spark, path, "baseline")
        publish_path(
            spark, path,
            orders.filter(F.col("o_orderkey") % 3 != 0),
            ["o_orderstatus"],
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    assert list_tags(spark, path) == {"baseline": 1}
    return fetch_at_tag(spark, path, "baseline").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


QUERIES_EXT2["tagged_fetch"] = q_tagged_fetch
ORACLE_EXT2["tagged_fetch"] = """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 3 = 0
"""


def q_pagerank_graph(spark, sf_dir):
    """Fixed-iteration PageRank (operators/graph.py) over the
    supplier→customer shipment graph (distinct (l_suppkey, o_custkey)
    pairs through orders) — the link-centrality quality signal of
    web-corpus curation, on the one graph the TPC-H tables contain.
    Integer micro-unit ranks under floor division make every iteration
    exact and order-independent, so the oracle replays all three
    iterations in chained SQL CTEs and the top-20 ranking hash-matches.
    Plan: degree joined once onto the edge list, then per iteration one
    src-keyed join + one dst-keyed aggregate — no collect, no cartesian,
    payload never wider than two numeric columns."""
    from .operators import pagerank

    li = _table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select(
        F.col("l_suppkey").alias("src"),
        (F.col("o_custkey") + F.lit(1000000)).alias("dst"),
    )
    r = pagerank(edges, iterations=3)
    return (
        r.select("node", F.col("rank").alias("pr"))
        .orderBy(F.desc("pr"), F.asc("node"))
        .limit(20)
    )


def _pagerank_oracle() -> str:
    scale, num, den = 10**9, 85, 100
    base = scale * (den - num) // den
    sql = f"""
    WITH e AS (
      SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM n)"""
    prev = "r0"
    for i in (1, 2, 3):
        sql += f""",
    c{i} AS (
      SELECT e.dst AS node, SUM({prev}.rank // deg.d) AS s
      FROM e JOIN deg ON e.src = deg.src
             JOIN {prev} ON {prev}.node = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT n.node,
             CAST({base} + ({num} * COALESCE(c{i}.s, 0)) // {den} AS BIGINT)
               AS rank
      FROM n LEFT JOIN c{i} ON n.node = c{i}.node
    )"""
        prev = f"r{i}"
    sql += """
    SELECT node, rank AS pr FROM r3 ORDER BY pr DESC, node LIMIT 20
    """
    return sql


QUERIES_EXT2["pagerank_graph"] = q_pagerank_graph
ORACLE_EXT2["pagerank_graph"] = _pagerank_oracle()


def q_mor_delete_fetch(spark, sf_dir):
    """Merge-on-read DELETE (publish.delete_where mode="merge-on-read" —
    Iceberg-v2 MoR restated as predicate tombstones): v1 publishes the
    even-key half of orders, a tombstone then deletes its expensive rows
    WITHOUT touching a single data file (O(1) metadata commit), and v2
    appends the odd-key half — which SURVIVES the earlier tombstone even
    where it matches the predicate, because a tombstone applies only to
    files committed before it (SQL DELETE semantics via version
    ordering). Fetch plans a per-era union: v1's slice carries
    NOT coalesce(pred, false); v2's slice scans clean. Oracle = the same
    era logic inlined over raw orders."""
    from . import metadata
    from .fetch import fetch_path
    from .publish import delete_where, publish_path
    from .workload import _ds_path

    path = _ds_path(sf_dir, "orders_mor")
    marker = os.path.join(path, "_MOR")
    if not os.path.exists(marker) or not _mor_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        orders = _table(spark, sf_dir, "orders")
        publish_path(
            spark, path,
            orders.filter(F.col("o_orderkey") % 2 == 0),
            ["o_orderstatus"],
        )
        delete_where(
            spark, path, "o_totalprice > 150000.0", mode="merge-on-read"
        )
        publish_path(
            spark, path,
            orders.filter(F.col("o_orderkey") % 2 == 1),
            ["o_orderstatus"],
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    meta = metadata.read_sidecar(spark, path)
    assert meta.tombstones() == [(2, "o_totalprice > 150000.0")]
    return fetch_path(spark, path).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


QUERIES_EXT2["mor_delete_fetch"] = q_mor_delete_fetch
ORACLE_EXT2["mor_delete_fetch"] = """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderkey % 2 = 0
           AND NOT COALESCE(o_totalprice > 150000.0, FALSE))
       OR o_orderkey % 2 = 1
"""


def q_continuous_aggregate(spark, sf_dir):
    """Continuous aggregate (views.py — Timescale continuous aggregates /
    Iceberg incremental refresh, restated for the sidecar): the rollup is
    materialized once over v1 of the source, then REFRESHED from the CDC
    plane after a v2 append — the refresh reads only the delta versions
    (fetch_changes, O(delta)) and folds the partials into the stored rows
    by each aggregate's merge function (count→sum, sum→sum, min/max),
    exact because the sum runs over DECIMAL. Oracle = the same GROUP BY
    over the full source: an incremental fold that disagrees with the
    one-shot aggregate is wrong, whatever the refresh path. Asserted
    in-query: the second refresh really took the incremental path."""
    from .fetch import fetch_path
    from .publish import publish_path
    from .views import create_aggregate, refresh_aggregate
    from .workload import _ds_path

    src = _ds_path(sf_dir, "orders_ca_src")
    dst = _ds_path(sf_dir, "orders_ca_agg")
    marker = os.path.join(dst, "_REFRESHED")
    if not os.path.exists(marker) or not (
        _plain_fixture_ok(spark, dst) and _plain_fixture_ok(spark, src)
    ):
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)
        orders = _table(spark, sf_dir, "orders")
        publish_path(
            spark, src, orders.filter(F.col("o_orderkey") % 2 == 0),
            ["o_orderstatus"],
        )
        create_aggregate(
            spark, src, dst, ["o_orderstatus", "o_orderpriority"],
            {
                "n_orders": "count(*)",
                "revenue": "sum(cast(o_totalprice as decimal(18,2)))",
                "max_key": "max(o_orderkey)",
            },
        )
        publish_path(
            spark, src, orders.filter(F.col("o_orderkey") % 2 == 1),
            ["o_orderstatus"],
        )
        report = refresh_aggregate(spark, dst)
        assert report["mode"] == "incremental", report
        with open(marker, "w") as fh:
            fh.write("ok")
    return fetch_path(spark, dst).select(
        "o_orderstatus", "o_orderpriority", "n_orders",
        F.col("revenue").cast("double").alias("revenue"), "max_key",
    )


QUERIES_EXT2["continuous_aggregate"] = q_continuous_aggregate
ORACLE_EXT2["continuous_aggregate"] = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           MAX(o_orderkey) AS max_key
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
"""


def q_wap_publish_fetch(spark, sf_dir):
    """Write-audit-publish (publish staged=True + promote/discard —
    Iceberg's WAP, restated for the sidecar): v1 lands the even-key half
    of orders; the odd-key half is STAGED (invisible to main reads until
    audited — asserted below), audited via the fetch_at(version) audit
    read, and PROMOTED (cherry-picked to the head, zero file I/O); a
    deliberately corrupted third batch is staged and DISCARDED (its files
    unlinked, the audit said no). Oracle = all of orders: a correct WAP
    cycle is invisible in the result, and the discarded batch must leave
    no trace."""
    from . import metadata
    from .fetch import fetch_at, fetch_path
    from .publish import discard_snapshot, promote_snapshot, publish_path
    from .workload import _ds_path

    path = _ds_path(sf_dir, "orders_wap")
    marker = os.path.join(path, "_WAP")
    if not os.path.exists(marker) or not _plain_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        orders = _table(spark, sf_dir, "orders")
        publish_path(
            spark, path, orders.filter(F.col("o_orderkey") % 2 == 0),
            ["o_orderstatus"],
        )
        n_main = fetch_path(spark, path).count()
        publish_path(
            spark, path, orders.filter(F.col("o_orderkey") % 2 == 1),
            ["o_orderstatus"], staged=True,
        )
        assert fetch_path(spark, path).count() == n_main, (
            "staged snapshot leaked into the main read"
        )
        assert fetch_at(spark, path, 2).count() == orders.count()  # audit
        promote_snapshot(spark, path, 2)
        # a bad batch: duplicate rows that would corrupt the dataset
        publish_path(
            spark, path, orders.limit(100), ["o_orderstatus"], staged=True,
        )
        bad_v = metadata.read_sidecar(spark, path).staged_versions()[0]
        discard_snapshot(spark, path, bad_v)
        with open(marker, "w") as fh:
            fh.write("ok")
    meta = metadata.read_sidecar(spark, path)
    assert meta.staged_versions() == []
    return fetch_path(spark, path).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


QUERIES_EXT2["wap_publish_fetch"] = q_wap_publish_fetch
ORACLE_EXT2["wap_publish_fetch"] = """
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
"""


def q_image_neardup(spark, sf_dir):
    """Perceptual-hash media dedup (operators/multimodal.py
    perceptual_hash + phash_neardup_pairs): documents wrapped as opaque
    binary payloads (the multimodal ingestion shape), fingerprinted with
    a 60-bit AVERAGE HASH (64 evenly-sampled pixels thresholded at the
    mean — here over the deterministic fake decode, deployment injects a
    real grayscale decoder), banded 4x15 for LSH candidates, verified by
    exact Hamming <= 3. The corpus plants byte-identical duplicates so
    the pair set is non-trivial. Oracle replays pixel sampling, the
    integer mean threshold, bit packing, banding and the Hamming verify
    entirely in SQL."""
    from .operators import attach_binary_payload, phash_neardup_pairs

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    media = attach_binary_payload(corpus, "text")
    return phash_neardup_pairs(media, "doc_id", max_hamming=3)


QUERIES_EXT2["image_neardup"] = q_image_neardup
ORACLE_EXT2["image_neardup"] = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50
    ), norm AS (
      -- astral chars normalize to '?' exactly as the engine does (Spark's
      -- ascii() is charAt(0); the replacement keeps all three
      -- implementations byte-identical)
      SELECT doc_id,
             regexp_replace(text, '[\\x{10000}-\\x{10FFFF}]', '?', 'g') AS text
      FROM corpus
    ), pix AS (
      SELECT doc_id, i.i AS i,
             ascii(substr(text, 1 + (i.i * length(text)) // 64, 1)) AS p
      FROM norm CROSS JOIN (SELECT unnest(range(64)) AS i) i
      WHERE length(text) > 0
    ), tot AS (
      SELECT doc_id, SUM(p) AS total FROM pix GROUP BY doc_id
    ), fp AS (
      SELECT p.doc_id,
             SUM(CASE WHEN p.i < 60 AND p.p * 64 >= t.total
                      THEN (CAST(1 AS BIGINT) << p.i) ELSE 0 END) AS ahash
      FROM pix p JOIN tot t ON p.doc_id = t.doc_id
      GROUP BY p.doc_id
    ), banded AS (
      SELECT doc_id, ahash, b.b AS band_id,
             (ahash >> (b.b * 15)) & 32767 AS chunk
      FROM fp CROSS JOIN (SELECT unnest(range(4)) AS b) b
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.ahash AS ha, b.ahash AS hb
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.chunk = b.chunk
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 3
"""


# ---------------------------------------------------------------------------
# round 9: per-file bloom fingerprints
# ---------------------------------------------------------------------------


def q_bloom_point_fetch(spark, sf_dir):
    """Per-file bloom fingerprints (publish ``file_bloom_columns`` + fetch
    equality probes — see ``bloom.py``): the point-lookup half of the
    data-skipping plane. The fixture is INGEST-ORDERED lineitem (not
    sorted by key), so min/max zone maps could never prune a key probe;
    the fingerprints skip dead files at the DRIVER (asserted below — no
    footer reads, no file-index entries), and the exact IN-predicate
    re-applies row-level on the survivors. The probe list mixes two
    present keys with an absent one (the absent key must prune everywhere
    and add nothing). Oracle = the same IN predicate in SQL."""
    from . import metadata
    from .fetch import _prune_bloom_files, fetch_path
    from .workload import _cached_dataset

    path = _cached_dataset(
        spark, sf_dir, "li_bloom",
        lambda s, d: _table(s, d, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_linestatus",
        ),
        ["l_linestatus"],
        max_records_per_file=400,
        file_bloom_columns=["l_orderkey"],
    )
    flt = [
        {"partition": "l_orderkey", "comparison": "==",
         "values": [1, 7, 999983]},
    ]
    meta = metadata.read_sidecar(spark, path)
    files = meta.manifest_files()
    kept = _prune_bloom_files(files, meta, flt)
    if len(files) >= 6:
        assert len(kept) < len(files), (
            "bloom fingerprints skipped nothing on a point probe over "
            "ingest-ordered files"
        )
    return fetch_path(spark, path, filters=flt).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


QUERIES_EXT2["bloom_point_fetch"] = q_bloom_point_fetch
ORACLE_EXT2["bloom_point_fetch"] = """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_orderkey IN (1, 7, 999983)
"""


def q_funnel_events(spark, sf_dir):
    """Multi-stage ordered funnel (operators/timeseries.py funnel_stages):
    users who viewed, then clicked STRICTLY after their first qualifying
    view, then purchased strictly after that. One shuffle on user_id +
    one sort, then chained running-min window phases over the same spec —
    no self-joins (the classic funnel-as-join is quadratic per user).
    Strict ``<`` on timestamps makes the counts independent of tie order,
    so the oracle mirrors the window chain verbatim."""
    from .operators import funnel_stages
    from .workload import _events

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type")
    return funnel_stages(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


QUERIES_EXT2["funnel_events"] = q_funnel_events
ORACLE_EXT2["funnel_events"] = """
    WITH s0 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m0
      FROM events
    ), s1 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND m0 < ts
                         THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m1
      FROM s0
    ), s2 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND m1 < ts
                         THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m2
      FROM s1
    ), u AS (
      SELECT user_id,
             max(m0 IS NOT NULL) AS r0,
             max(m1 IS NOT NULL) AS r1,
             max(m2 IS NOT NULL) AS r2
      FROM s2 GROUP BY user_id
    )
    SELECT 1 AS stage_idx, 'view' AS stage,
           CAST(SUM(CASE WHEN r0 THEN 1 ELSE 0 END) AS BIGINT) AS users
    FROM u
    UNION ALL
    SELECT 2, 'click',
           CAST(SUM(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) FROM u
    UNION ALL
    SELECT 3, 'purchase',
           CAST(SUM(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT) FROM u
"""


def q_hybrid_search_rrf(spark, sf_dir):
    """Hybrid retrieval (operators/similarity.py rrf_fuse): a lexical
    BM25 top-20 for {hash, join, vector} over documents.text fused with a
    vector cosine top-20 around the vec_id=0 embedding (doc_id and vec_id
    share the id space), by reciprocal-rank fusion 1/(60+rank). Only RANKS
    enter the fused score, so the two rankers need no score calibration —
    the standard production shape for lexical+semantic search. The
    corpus-scale work happens inside each ranker (BM25: key-partitioned
    aggregates + TakeOrderedAndProject; cosine: one broadcast scan); the
    fusion itself runs over two 20-row lists. Decimal-cast contributions
    make the per-doc sum order-independent and hash-stable."""
    from .operators import bm25_scores, brute_force_cosine_topk, rrf_fuse

    docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = _table(spark, sf_dir, "embeddings")
    bm = bm25_scores(docs, "doc_id", "text", ["hash", "join", "vector"],
                     top_k=20)
    cos = brute_force_cosine_topk(
        emb, "vec_id", "embedding", emb.filter(F.col("vec_id") == 0), k=20
    ).withColumnRenamed("vec_id", "doc_id")
    fused = rrf_fuse([(bm, "score"), (cos, "cosine")], "doc_id",
                     k=60, top_k=10)
    return fused.select(
        "doc_id", "n_lists", F.round("rrf_score", 6).alias("rrf_score")
    )


QUERIES_EXT2["hybrid_search_rrf"] = q_hybrid_search_rrf
ORACLE_EXT2["hybrid_search_rrf"] = """
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
    ), bm AS (
      SELECT doc AS doc_id, CAST(SUM(s) AS DOUBLE) AS score
      FROM scored GROUP BY doc
      ORDER BY score DESC, doc ASC
      LIMIT 20
    ), cos AS (
      SELECT vec_id AS doc_id,
             list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv)
               AS cosine
      FROM embeddings,
           (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
            WHERE vec_id = 0) q
      WHERE vec_id <> 0
      ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv)
               DESC, vec_id ASC
      LIMIT 20
    ), contrib AS (
      SELECT doc_id,
             CAST(1.0 / (60 + row_number() OVER (
               ORDER BY score DESC, doc_id ASC)) AS DECIMAL(28,12)) AS c
      FROM bm
      UNION ALL
      SELECT doc_id,
             CAST(1.0 / (60 + row_number() OVER (
               ORDER BY cosine DESC, doc_id ASC)) AS DECIMAL(28,12)) AS c
      FROM cos
    )
    SELECT doc_id, COUNT(*) AS n_lists,
           round(CAST(SUM(c) AS DOUBLE), 6) AS rrf_score
    FROM contrib
    GROUP BY doc_id
    ORDER BY CAST(SUM(c) AS DOUBLE) DESC, doc_id ASC
    LIMIT 10
"""


def q_rollup_revenue(spark, sf_dir):
    """Multidimensional ROLLUP aggregate: revenue and row counts by
    (l_returnflag, l_linestatus), per-flag subtotals, and the grand total
    in ONE pass — Spark's ROLLUP lowers to a single Expand + hash
    aggregate (map-side combined), never N scans. grouping_id
    disambiguates real NULL keys from subtotal rows; revenue folds in
    exact DECIMAL."""
    li = _table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .alias("revenue"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n_rows", "revenue")
    )


QUERIES_EXT2["rollup_revenue"] = q_rollup_revenue
ORACLE_EXT2["rollup_revenue"] = """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                AS INT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_mor_upsert_fetch(spark, sf_dir):
    """Merge-on-read UPSERT (publish.merge_upsert mode="merge-on-read" —
    Iceberg-v2 EQUALITY DELETES / Hudi MOR, restated for the sidecar):
    v1 publishes orders, then one O(batch) commit both appends new row
    images for a CDC batch (re-priced low-key orders + brand-new keys)
    and stamps the batch's distinct keys as an equality delete over
    everything older — zero data files rewritten, however many partitions
    the keys touch. Fetch anti-joins the OLD era against the stored key
    files (broadcast: the sidecar knows they are small) and unions the
    new images; a later plain append SURVIVES the earlier key-delete per
    version ordering. Oracle = the same upsert replayed in SQL."""
    from . import metadata
    from .fetch import fetch_path
    from .publish import merge_upsert, publish_path
    from .workload import _ds_path

    path = _ds_path(sf_dir, "orders_mor_upsert")
    marker = os.path.join(path, "_MOR_UPSERT")
    if not os.path.exists(marker) or not _mor_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        orders = _table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        publish_path(spark, path, orders, ["o_orderstatus"])
        batch = (
            orders.filter(F.col("o_orderkey") < 200)
            .withColumn("o_orderstatus", F.lit("U"))
            .withColumn(
                "o_totalprice",
                F.col("o_totalprice").cast("double") + F.lit(0.5),
            )
            .withColumn("seq", F.lit(1))
        )
        extra = spark.createDataFrame(
            [(9_000_001, "U", 11.25, 1), (9_000_002, "U", 12.5, 1)],
            "o_orderkey long, o_orderstatus string, o_totalprice double, "
            "seq int",
        )
        merge_upsert(
            spark, path, batch.unionByName(extra), ["o_orderkey"], "seq",
            mode="merge-on-read",
        )
        publish_path(
            spark, path,
            spark.createDataFrame(
                [(150, "L", 1.25)],
                "o_orderkey long, o_orderstatus string, o_totalprice double",
            ),
            ["o_orderstatus"], mode="append",
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    meta = metadata.read_sidecar(spark, path)
    assert [v for v, _ in meta.eq_deletes()] == [2]
    return fetch_path(spark, path).select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )


QUERIES_EXT2["mor_upsert_fetch"] = q_mor_upsert_fetch
ORACLE_EXT2["mor_upsert_fetch"] = """
    -- era 1: the original rows whose key was NOT upserted over
    SELECT o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders WHERE o_orderkey >= 200
    UNION ALL
    -- era 2: the upsert batch's row images (re-priced + inserts)
    SELECT o_orderkey, 'U' AS o_orderstatus,
           CAST(o_totalprice AS DOUBLE) + 0.5 AS o_totalprice
    FROM orders WHERE o_orderkey < 200
    UNION ALL
    SELECT * FROM (VALUES
        (CAST(9000001 AS BIGINT), 'U', CAST(11.25 AS DOUBLE)),
        (CAST(9000002 AS BIGINT), 'U', CAST(12.5 AS DOUBLE)),
    -- era 3: the later plain append survives the earlier key-delete
        (CAST(150 AS BIGINT), 'L', CAST(1.25 AS DOUBLE))
    ) AS t(o_orderkey, o_orderstatus, o_totalprice)
"""


def q_text_index_search(spark, sf_dir):
    """Text search index AT REST (text_index.py): posting rows published
    hive-partitioned by hash60(term) % 16 with per-file BLOOM fingerprints
    on term; the search hashes the query terms driver-side, fetches ONLY
    their buckets (partition prune) with term-equality bloom skipping
    inside them, and scores with bm25_scores' exact expression sequence —
    identical ranking to a full-corpus BM25 without ever scanning the
    corpus (df_t falls out of the co-located postings; n_docs/avgdl from
    the 1-row stats dataset). Oracle = the SAME full-corpus BM25 SQL as
    bm25_search: the index must reproduce it exactly."""
    from .text_index import build_text_index, search_text_index
    from .workload import _ds_path

    path = _ds_path(sf_dir, "text_index")
    marker = os.path.join(path, "_INDEXED")
    if not os.path.exists(marker) or not _text_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path.rstrip("/") + "_stats", ignore_errors=True)
        docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
        build_text_index(
            spark, docs, path, "doc_id", "text",
            n_buckets=16, max_records_per_file=2000,
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    out = search_text_index(
        spark, path, ["hash", "join", "vector"], k=10
    )
    return out.select("doc_id", "n_terms", F.round("score", 6).alias("score"))


QUERIES_EXT2["text_index_search"] = q_text_index_search
# the index must reproduce the full-corpus BM25 EXACTLY: same oracle,
# one copy (a tweak to bm25_search's oracle applies to both gates)
from .workload import ORACLE_SQL as _ORACLE_MAIN  # noqa: E402

ORACLE_EXT2["text_index_search"] = _ORACLE_MAIN["bm25_search"]



def q_text_index_reindex(spark, sf_dir):
    """Incremental index maintenance for CHANGED documents
    (text_index.reindex_documents — r9 verdict 'what's missing' #2): the
    engine's merge-on-read equality key-deletes (publish.eq_delete_append)
    replace each changed doc's whole posting LIST under its doc-id key in
    ONE O(changed-docs) snapshot — no rebuild, no corpus scan; the doclens
    side table (id-bloom-fingerprinted) point-fetches the old lengths so
    the stats row folds forward exactly. Search over the maintained index
    must equal full-corpus BM25 over the UPDATED corpus bit-for-bit —
    the oracle recomputes that corpus in SQL."""
    from .text_index import (
        build_text_index,
        reindex_documents,
        search_text_index,
    )
    from .workload import _ds_path

    path = _ds_path(sf_dir, "text_index_rx")
    marker = os.path.join(path, "_REINDEXED")
    if not os.path.exists(marker) or not _text_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path.rstrip("/") + "_stats", ignore_errors=True)
        shutil.rmtree(path.rstrip("/") + "_doclens", ignore_errors=True)
        docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
        build_text_index(
            spark, docs, path, "doc_id", "text",
            n_buckets=16, max_records_per_file=2000,
        )
        changed = docs.filter("doc_id % 7 = 3").withColumn(
            "text", F.concat(F.lit("vector vector hash "), F.col("text"))
        )
        reindex_documents(spark, changed, path, "doc_id", "text")
        with open(marker, "w") as fh:
            fh.write("ok")
    out = search_text_index(spark, path, ["hash", "join", "vector"], k=10)
    return out.select("doc_id", "n_terms", F.round("score", 6).alias("score"))


QUERIES_EXT2["text_index_reindex"] = q_text_index_reindex
# bm25_search's oracle over the UPDATED corpus: the maintained index must
# reproduce a full rebuild exactly
ORACLE_EXT2["text_index_reindex"] = _ORACLE_MAIN["bm25_search"].replace(
    "FROM documents",
    """FROM (SELECT doc_id,
                    CASE WHEN doc_id % 7 = 3
                         THEN 'vector vector hash ' || text
                         ELSE text END AS text
             FROM documents)""",
)


def q_events_stream_upsert(spark, sf_dir):
    """Streaming UPSERT sink (streaming/events.py stream_upsert — r9
    verdict 'what's missing' #3): a user-state mirror is bootstrapped from
    the pre-cutoff events (one max-struct winner per user), then the
    post-cutoff event stream lands through foreachBatch →
    merge_upsert(mode="merge-on-read") — each micro-batch is O(batch):
    eq-delete key files + new row images + one commit, zero rewrites.
    The replayed stream must equal the batch latest_user_state oracle
    (post-cutoff events all outrank pre-cutoff ones per user, so the
    mirror converges to the global latest whatever the batch split).
    Output ts is the dataset's ms-coerced storage value (the engine's
    reference-parity write contract), mirrored in the oracle."""
    from .fetch import fetch_path
    from .operators import latest_state
    from .publish import publish_path
    from .streaming import stream_upsert
    from .workload import _ds_path, _events

    path = _ds_path(sf_dir, "ev_stream_upsert")
    stage = _ds_path(sf_dir, "ev_stream_upsert_src")
    marker = os.path.join(path, "_UPSERTED")
    if not os.path.exists(marker) or not _stream_ckpt_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)
        ev = _events(spark, sf_dir)
        cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
        initial = latest_state(
            ev.filter(F.col("ts") < cutoff),
            ["user_id"], "ts", "event_id", ["event_type", "value", "props"],
        ).select(*ev.columns)
        publish_path(spark, path, initial, [])
        # stage the post-cutoff slice as the stream's landing directory,
        # micro-precision preserved (the in-batch winner rule must see the
        # same ordering the oracle computes from the raw micros);
        # scoped_conf serializes against any concurrent MILLIS publish
        from .confscope import scoped_conf as _scoped_conf

        with _scoped_conf(
            spark, "spark.sql.parquet.outputTimestampType",
            "TIMESTAMP_MICROS",
        ):
            ev.filter(F.col("ts") >= cutoff).write.mode("overwrite").parquet(
                stage
            )
        stream_upsert(spark, stage, path, ["user_id"], "ts")
        with open(marker, "w") as fh:
            fh.write("ok")
    from . import metadata as _md

    meta = _md.read_sidecar(spark, path)
    assert meta.eq_deletes(), "stream upsert landed no eq-delete snapshot"
    return fetch_path(spark, path).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )


QUERIES_EXT2["events_stream_upsert"] = q_events_stream_upsert
# the batch changelog-compaction oracle, with ts coerced to the dataset's
# ms storage precision (publish writes TIMESTAMP_MILLIS, reference parity)
ORACLE_EXT2["events_stream_upsert"] = """
    SELECT user_id, ts, event_id, event_type, value FROM (
      SELECT user_id,
             make_timestamp(epoch_us(ts) // 1000 * 1000) AS ts, event_id,
             event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
"""


def q_text_index_remove(spark, sf_dir):
    """Document DELETION from the index at rest (text_index.
    remove_documents — r10 second wave): merge-on-read predicate
    tombstones on postings + doclens (zero data files touched,
    count-free commits: matches were proven by the bloom-pruned doclens
    point fetch), stats row folds DOWN from the fetched old lengths.
    Search afterwards must equal full-corpus BM25 over the corpus MINUS
    the removed docs — the oracle recomputes that corpus in SQL. The
    fixture also replays a second (idempotent) removal: re-running the
    same batch must find nothing and leave stats untouched."""
    from .text_index import build_text_index, remove_documents, search_text_index
    from .workload import _ds_path

    path = _ds_path(sf_dir, "text_index_rm")
    marker = os.path.join(path, "_REMOVED")
    if not os.path.exists(marker) or not _text_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path.rstrip("/") + "_stats", ignore_errors=True)
        shutil.rmtree(path.rstrip("/") + "_doclens", ignore_errors=True)
        docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
        build_text_index(
            spark, docs, path, "doc_id", "text",
            n_buckets=16, max_records_per_file=2000,
        )
        ids = [r[0] for r in docs.filter("doc_id % 11 = 4")
               .select("doc_id").collect()]
        n = remove_documents(spark, ids, path, "doc_id")
        assert n == len(ids), (n, len(ids))
        assert remove_documents(spark, ids, path, "doc_id") == 0  # idempotent
        with open(marker, "w") as fh:
            fh.write("ok")
    out = search_text_index(spark, path, ["hash", "join", "vector"], k=10)
    return out.select("doc_id", "n_terms", F.round("score", 6).alias("score"))


QUERIES_EXT2["text_index_remove"] = q_text_index_remove
# bm25_search's oracle over the corpus MINUS the removed documents
ORACLE_EXT2["text_index_remove"] = _ORACLE_MAIN["bm25_search"].replace(
    "FROM documents",
    "FROM (SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 4)",
)


def q_stream_upsert_exactly_once(spark, sf_dir):
    """Exactly-once streaming upsert (r10 verdict #1): the sink stamps
    every snapshot with (writer identity, foreachBatch batch_id) and the
    sidecar keeps a monotone per-writer ledger, so a batch replayed after
    a crash between snapshot commit and checkpoint advance is SKIPPED —
    one snapshot per batch, duplicate-free history. The fixture replays
    that exact crash: it deletes the checkpoint's newest commits/<N>
    marker after a successful run and restarts the stream; Structured
    Streaming re-delivers batch N under the same batch_id. The output
    carries ``dup_snapshots`` = snapshots added by the replay (must hash
    as 0) alongside the converged per-user latest state."""
    import json

    from .fetch import fetch_path
    from .operators import latest_state
    from .publish import publish_path
    from .streaming import stream_upsert
    from .workload import _ds_path, _events
    from . import metadata as _md

    path = _ds_path(sf_dir, "ev_stream_eo")
    stage = _ds_path(sf_dir, "ev_stream_eo_src")
    ckpt = path.rstrip("/") + "_ckpt"
    marker = os.path.join(path, "_REPLAYED")
    if not os.path.exists(marker) or not _stream_ckpt_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        ev = _events(spark, sf_dir)
        cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
        initial = latest_state(
            ev.filter(F.col("ts") < cutoff),
            ["user_id"], "ts", "event_id", ["event_type", "value", "props"],
        ).select(*ev.columns)
        publish_path(spark, path, initial, [])
        from .confscope import scoped_conf as _scoped_conf

        with _scoped_conf(
            spark, "spark.sql.parquet.outputTimestampType",
            "TIMESTAMP_MICROS",
        ):
            ev.filter(F.col("ts") >= cutoff).write.mode("overwrite").parquet(
                stage
            )
        stream_upsert(spark, stage, path, ["user_id"], "ts",
                      checkpoint_location=ckpt)
        meta = _md.read_sidecar(spark, path)
        n_before, eq_before = len(meta.snapshots), len(meta.eq_deletes())
        assert eq_before >= 1 and meta.txns, "stream landed nothing"
        # crash simulation: snapshot committed, checkpoint completion not
        cdir = os.path.join(ckpt, "commits")
        victim = os.path.join(
            cdir,
            sorted(n for n in os.listdir(cdir)
                   if not n.startswith(".") and not n.endswith(".crc"))[-1],
        )
        os.remove(victim)
        crc = os.path.join(cdir, f".{os.path.basename(victim)}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        stream_upsert(spark, stage, path, ["user_id"], "ts",
                      checkpoint_location=ckpt)
        assert os.path.exists(victim), "batch was not re-delivered"
        meta2 = _md.read_sidecar(spark, path)
        assert len(meta2.eq_deletes()) == eq_before
        with open(marker, "w") as fh:
            json.dump({"dup": len(meta2.snapshots) - n_before}, fh)
    with open(marker) as fh:
        dup = int(json.load(fh)["dup"])
    return fetch_path(spark, path).select(
        "user_id", "ts", "event_id", "event_type", "value",
        F.lit(dup).cast("long").alias("dup_snapshots"),
    )


QUERIES_EXT2["stream_upsert_exactly_once"] = q_stream_upsert_exactly_once
# the same converged-mirror oracle as events_stream_upsert, plus the
# replay's snapshot delta — exactly-once means the replay added zero
ORACLE_EXT2["stream_upsert_exactly_once"] = """
    SELECT user_id, ts, event_id, event_type, value,
           CAST(0 AS BIGINT) AS dup_snapshots
    FROM (
      SELECT user_id,
             make_timestamp(epoch_us(ts) // 1000 * 1000) AS ts, event_id,
             event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
"""


def q_text_index_maxdf_maintain(spark, sf_dir):
    """max_df-capped text index under FULL maintenance (r10 verdict #2):
    an r11 capped build keeps over-cap terms' postings in a stopped
    sibling plus an id-bloomed forward table, so append/reindex/remove
    re-derive df exactly for the batch's terms and MOVE posting lists
    across the cap. The fixture forces both crossings with a synthetic
    marker term: a reindex wave introduces it under the cap (live), an
    append wave pushes it over (its list moves to stopped — searches
    stop seeing it), and a removal wave drops it back under
    (re-admission — searches see it again). The final search must equal
    SQL BM25 with the same df cap over the updated corpus."""
    from .text_index import (
        _stopped_path,
        append_to_text_index,
        build_text_index,
        remove_documents,
        reindex_documents,
        search_text_index,
    )
    from .workload import _ds_path

    MAXDF = 90
    path = _ds_path(sf_dir, "text_index_maxdf")
    marker = os.path.join(path, "_MAINTAINED")
    if not os.path.exists(marker) or not _text_fixture_ok(spark, path):
        for suffix in ("", "_stats", "_doclens", "_stopped", "_fwd"):
            shutil.rmtree(path.rstrip("/") + suffix, ignore_errors=True)
        docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
        base = docs.filter("doc_id % 9 <> 2")
        build_text_index(
            spark, base, path, "doc_id", "text",
            n_buckets=16, max_df=MAXDF, max_records_per_file=2000,
        )
        # wave 1 — reindex: %9=5 docs gain the marker term (df stays
        # under the cap at the gate's sf: the term enters LIVE)
        w1 = base.filter("doc_id % 9 = 5").select(
            "doc_id",
            F.concat("text", F.lit(" qqmarker qqmarker qqmarker")).alias(
                "text"
            ),
        )
        n1 = w1.count()
        reindex_documents(spark, w1, path, "doc_id", "text")
        # wave 2 — append: the held-out %9=2 docs arrive with one marker
        # each; past the cap the marker's whole list crosses to stopped
        w2 = docs.filter("doc_id % 9 = 2").select(
            "doc_id", F.concat("text", F.lit(" qqmarker")).alias("text")
        )
        n2 = w2.count()
        append_to_text_index(spark, w2, path, "doc_id", "text")
        if n1 + n2 > MAXDF >= n1:
            assert (
                _rows_empty(search_text_index(spark, path, ["qqmarker"]))
            ), "marker must be capped out after the append"
            assert os.path.exists(_stopped_path(path)), (
                "append crossing must create the stopped sibling"
            )
        # wave 3 — remove: the odd reindexed docs go; the marker drops
        # back under the cap and its postings re-admit to live
        gone = [
            r[0]
            for r in docs.filter("doc_id % 9 = 5 AND doc_id % 2 = 1")
            .select("doc_id")
            .collect()
        ]
        assert remove_documents(spark, gone, path, "doc_id") == len(gone)
        if n1 + n2 - len(gone) <= MAXDF < n1 + n2:
            assert not _rows_empty(
                search_text_index(spark, path, ["qqmarker"])
            ), "marker must be re-admitted after the removal"
        with open(marker, "w") as fh:
            fh.write("ok")
    out = search_text_index(spark, path, ["hash", "join", "qqmarker"], k=10)
    return out.select(
        "doc_id", "n_terms", F.round("score", 6).alias("score")
    )


def _rows_empty(df) -> bool:
    return df.limit(1).count() == 0


QUERIES_EXT2["text_index_maxdf_maintain"] = q_text_index_maxdf_maintain
# capped BM25 over the maintained corpus: reindexed texts modified,
# appended docs present, removed docs absent, terms with df > 90 dropped
ORACLE_EXT2["text_index_maxdf_maintain"] = """
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 9 = 5
                    THEN text || ' qqmarker qqmarker qqmarker'
                  WHEN doc_id % 9 = 2 THEN text || ' qqmarker'
                  ELSE text END AS text
      FROM documents
      WHERE NOT (doc_id % 9 = 5 AND doc_id % 2 = 1)
    ), toks AS (
      SELECT doc_id AS doc,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM corpus
    ), dl AS (
      SELECT doc, COUNT(*) AS dl FROM toks GROUP BY doc
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl
    ), tf AS (
      SELECT doc, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('hash', 'join', 'qqmarker') GROUP BY doc, term
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
      WHERE df_t <= 90
    ), agg AS (
      SELECT doc, COUNT(*) AS n_terms, CAST(SUM(s) AS DOUBLE) AS score
      FROM scored GROUP BY doc
    )
    SELECT doc AS doc_id, n_terms, round(score, 6) AS score
    FROM agg
    ORDER BY score DESC, doc ASC
    LIMIT 10
"""


def q_ivf_index_append(spark, sf_dir):
    """ANN at-rest index MAINTENANCE (ann_index.py — r10 verdict #3):
    the index is built over a training prefix (deterministic Lloyd
    centroids, persisted in the quantizer sidecar), the remaining
    vectors arrive through ``append_to_ivf_index`` — cell assignment
    against the FROZEN centroids, one projection, O(new), landing in
    the cell partitions — and a removal wave lands as one zero-read
    tombstone. The search probes the top cells through the
    partition-pruned fetch (PartitionFilters asserted) and must equal
    the oracle, which replays the same deterministic training in SQL
    over the training prefix and assigns the FINAL corpus (appended
    included, removed excluded) with those centroids."""
    from .ann_index import (
        append_to_ivf_index,
        build_ivf_index,
        index_drift,
        remove_vectors,
        search_ivf_index,
    )
    from .workload import _ds_path

    path = _ds_path(sf_dir, "ivf_maintained")
    marker = os.path.join(path, "_MAINTAINED")
    emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if not os.path.exists(marker) or not _ivf_fixture_ok(
        path, m=None, companion=False
    ):
        shutil.rmtree(path, ignore_errors=True)
        qp = path.rstrip("/") + "_quantizers.json"
        if os.path.exists(qp):
            os.remove(qp)
        build_ivf_index(
            spark, emb.filter("vec_id < 350"), path, "vec_id", "embedding",
            k=8, iters=1,
        )
        append_to_ivf_index(
            spark, emb.filter("vec_id >= 350"), path, "vec_id", "embedding"
        )
        gone = [r[0] for r in emb.filter("vec_id % 50 = 7")
                .select("vec_id").collect()]
        n = remove_vectors(spark, gone, path, "vec_id")
        assert n == len(gone), (n, len(gone))
        assert remove_vectors(spark, gone, path, "vec_id") == 0
        d = index_drift(spark, path)
        assert d["appended_n"] > 0 and d["drift_ratio"] is not None
        with open(marker, "w") as fh:
            fh.write("ok")
    qrow = emb.filter("vec_id = 0").select(
        F.col("embedding").cast("array<double>").alias("v")
    ).first()
    # k=11: rank 1 is the query vector itself (self-cosine 1.0, lowest
    # id on ties) — dropped below, leaving exactly the top-10 neighbors
    out = search_ivf_index(
        spark, path, [float(x) for x in qrow["v"]], k=11, nprobe=3
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    i = plan.find("PartitionFilters")
    assert i >= 0 and "cell" in plan[i:i + 200], (
        "cell probe did not prune at the file index"
    )
    return out.filter("vec_id <> 0").select(
        "vec_id", F.round("score", 6).alias("cos")
    ).limit(10)


QUERIES_EXT2["ivf_index_append"] = q_ivf_index_append
# deterministic-training replay: one Lloyd refinement over the training
# prefix, FINAL corpus assigned with those frozen centroids, top-3 cells
# probed, exact cosine inside them
ORACLE_EXT2["ivf_index_append"] = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), t AS (
      SELECT vec_id, v FROM e WHERE vec_id < 350
    ), c0 AS (
      SELECT vec_id AS cid, v AS cv FROM t WHERE vec_id < 8
    ), a1 AS (
      SELECT t.vec_id, t.v,
             arg_max(c.cid, list_dot_product(t.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM t CROSS JOIN c0 c GROUP BY t.vec_id, t.v
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
    ), q AS (
      SELECT v AS qv FROM e WHERE vec_id = 0
    ), cells AS (
      SELECT cid FROM c1 CROSS JOIN q
      ORDER BY list_dot_product(qv, cv) /
                 greatest(1e-12, sqrt(list_dot_product(cv, cv))) DESC, cid
      LIMIT 3
    ), corpus AS (
      SELECT vec_id, v FROM e WHERE vec_id % 50 <> 7
    ), asg AS (
      SELECT corpus.vec_id, corpus.v,
             arg_max(c.cid, list_dot_product(corpus.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM corpus CROSS JOIN c1 c GROUP BY corpus.vec_id, corpus.v
    )
    SELECT vec_id, round(score, 6) AS cos FROM (
      SELECT a.vec_id,
             list_dot_product(a.v, q.qv) /
               (greatest(1e-12, sqrt(list_dot_product(a.v, a.v))) *
                greatest(1e-12, sqrt(list_dot_product(q.qv, q.qv)))) AS score
      FROM asg a CROSS JOIN q
      WHERE a.cell IN (SELECT cid FROM cells) AND a.vec_id <> 0
    )
    ORDER BY score DESC, vec_id ASC
    LIMIT 10
"""


def q_text_batch_search(spark, sf_dir):
    """Batch BM25 serving (text_index.search_text_index_batch — r11):
    three queries answered in ONE bucket-pruned, bloom-skipped pass over
    the union of their terms; a broadcast (query_id, term) frame fans
    posting rows out to the queries that asked, one windowed top-k per
    query ranks. Must equal per-query BM25 recomputed from the corpus in
    SQL — including the shared term ('hash' rides both q1 and q3 from
    one fetch) and per-query df."""
    from .text_index import build_text_index, search_text_index_batch
    from .workload import _ds_path

    path = _ds_path(sf_dir, "text_index_batchq")
    marker = os.path.join(path, "_BUILT")
    if not os.path.exists(marker) or not _text_fixture_ok(spark, path):
        for suffix in ("", "_stats", "_doclens"):
            shutil.rmtree(path.rstrip("/") + suffix, ignore_errors=True)
        docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
        build_text_index(
            spark, docs, path, "doc_id", "text",
            n_buckets=16, max_records_per_file=2000,
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    out = search_text_index_batch(
        spark, path,
        {
            "q1": ["hash", "join", "vector"],
            "q2": ["the"],
            "q3": ["model", "data", "hash"],
        },
        k=10,
    )
    return out.select(
        "query_id", "doc_id", "n_terms",
        F.round("score", 6).alias("score"),
    )


QUERIES_EXT2["text_batch_search"] = q_text_batch_search
ORACLE_EXT2["text_batch_search"] = """
    WITH toks AS (
      SELECT doc_id AS doc,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents
    ), dl AS (
      SELECT doc, COUNT(*) AS dl FROM toks GROUP BY doc
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl
    ), qt AS (
      SELECT * FROM (VALUES
        ('q1', 'hash'), ('q1', 'join'), ('q1', 'vector'),
        ('q2', 'the'),
        ('q3', 'model'), ('q3', 'data'), ('q3', 'hash')
      ) t(query_id, term)
    ), tf AS (
      SELECT doc, term, COUNT(*) AS tf FROM toks
      WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY doc, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS df_t FROM tf GROUP BY term
    ), scored AS (
      SELECT qt.query_id, tf.doc,
             CAST(
               ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0) *
               ((tf * 2.2) /
                (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl /
                             (CAST(total_len AS DOUBLE) / n_docs))))
               AS DECIMAL(28,12)) AS s
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl USING (doc)
      JOIN qt USING (term)
      CROSS JOIN stats
    ), agg AS (
      SELECT query_id, doc, COUNT(*) AS n_terms,
             CAST(SUM(s) AS DOUBLE) AS score
      FROM scored GROUP BY query_id, doc
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc ASC) AS rn
      FROM agg
    )
    SELECT query_id, doc AS doc_id, n_terms, round(score, 6) AS score
    FROM ranked WHERE rn <= 10
    ORDER BY query_id, score DESC, doc_id ASC
"""


def q_ann_batch_search_rest(spark, sf_dir):
    """Batch ANN serving over the MAINTAINED at-rest index (r11): two
    query vectors answered in one partition-pruned pass over the union
    of their probed cells (per-query candidate restriction via the
    broadcast query frame), against the same maintained fixture as
    ivf_index_append — so the oracle replays training, assigns the
    final corpus (appends in, removals out) with the frozen centroids,
    ranks each query's top-3 cells, and scores exact cosine inside
    them."""
    from .ann_index import search_ivf_index_batch
    from .workload import _ds_path

    # reuse (and if needed build) the maintained-index fixture
    q_ivf_index_append(spark, sf_dir)
    path = _ds_path(sf_dir, "ivf_maintained")
    emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = {}
    for vid in (0, 7):
        row = emb.filter(f"vec_id = {vid}").select(
            F.col("embedding").cast("array<double>").alias("v")
        ).first()
        qs[str(vid)] = [float(x) for x in row["v"]]
    out = search_ivf_index_batch(spark, path, qs, k=10, nprobe=3)
    return out.select(
        "query_id", "vec_id", F.round("score", 6).alias("cos")
    )


QUERIES_EXT2["ann_batch_search_rest"] = q_ann_batch_search_rest
ORACLE_EXT2["ann_batch_search_rest"] = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), t AS (
      SELECT vec_id, v FROM e WHERE vec_id < 350
    ), c0 AS (
      SELECT vec_id AS cid, v AS cv FROM t WHERE vec_id < 8
    ), a1 AS (
      SELECT t.vec_id, t.v,
             arg_max(c.cid, list_dot_product(t.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM t CROSS JOIN c0 c GROUP BY t.vec_id, t.v
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
    ), q AS (
      SELECT CAST(vec_id AS VARCHAR) AS query_id, v AS qv
      FROM e WHERE vec_id IN (0, 7)
    ), ranked_cells AS (
      SELECT q.query_id, c1.cid,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY list_dot_product(qv, cv) /
                 greatest(1e-12, sqrt(list_dot_product(cv, cv))) DESC,
                 cid ASC) AS crn
      FROM c1 CROSS JOIN q
    ), cells AS (
      SELECT query_id, cid FROM ranked_cells WHERE crn <= 3
    ), corpus AS (
      SELECT vec_id, v FROM e WHERE vec_id % 50 <> 7
    ), asg AS (
      SELECT corpus.vec_id, corpus.v,
             arg_max(c.cid, list_dot_product(corpus.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM corpus CROSS JOIN c1 c GROUP BY corpus.vec_id, corpus.v
    ), scored AS (
      SELECT cells.query_id, a.vec_id,
             list_dot_product(a.v, q.qv) /
               (greatest(1e-12, sqrt(list_dot_product(a.v, a.v))) *
                greatest(1e-12, sqrt(list_dot_product(q.qv, q.qv)))) AS score
      FROM asg a
      JOIN cells ON a.cell = cells.cid
      JOIN q ON q.query_id = cells.query_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, vec_id ASC) AS rn
      FROM scored
    )
    SELECT query_id, vec_id, round(score, 6) AS cos
    FROM ranked WHERE rn <= 10
    ORDER BY query_id, cos DESC, vec_id ASC
"""


def q_stream_index_docs(spark, sf_dir):
    """Streaming document ingestion into the text index (r11 verdict
    #1a — streaming/documents.py steady state): wave 1 lands the full
    documents table in a landing directory and bootstraps the index
    through the stream (readStream → foreachBatch(build)); wave 2 lands
    a CDC batch — every doc_id % 10 = 3 document gains the token
    'streamupdate' twice, plus two brand-new documents — and drains
    through foreachBatch(reindex): O(batch) eq-delete maintenance, no
    rebuild. The final search must equal full-corpus BM25 over the
    post-CDC corpus, which the oracle recomputes in SQL (updated texts
    via CASE, inserts via VALUES)."""
    import glob

    from .streaming import stream_index_documents
    from .text_index import search_text_index
    from .workload import _ds_path

    path = _ds_path(sf_dir, "stream_docs_idx")
    landing = path.rstrip("/") + "_landing"
    ckpt = path.rstrip("/") + "_ckpt"
    marker = os.path.join(path, "_STREAMED")
    if not os.path.exists(marker) or not (
        _text_fixture_ok(spark, path)
        and _stream_ckpt_fixture_ok(spark, path)
    ):
        for suffix in ("", "_stats", "_doclens", "_stopped", "_fwd",
                       "_landing", "_ckpt"):
            shutil.rmtree(path.rstrip("/") + suffix, ignore_errors=True)
        os.makedirs(landing)

        def land(df, name):
            scratch = path.rstrip("/") + f"_scratch_{name}"
            df.coalesce(1).write.mode("overwrite").parquet(scratch)
            for i, p in enumerate(
                sorted(glob.glob(f"{scratch}/part-*.parquet"))
            ):
                shutil.move(p, f"{landing}/{name}-{i}.parquet")
            shutil.rmtree(scratch, ignore_errors=True)

        docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
        land(docs, "w1")
        stream_index_documents(spark, landing, path, "doc_id", "text",
                               checkpoint_location=ckpt, n_buckets=16)
        cdc = docs.filter("doc_id % 10 = 3").withColumn(
            "text", F.concat(F.col("text"),
                             F.lit(" streamupdate streamupdate"))
        ).unionByName(spark.createDataFrame(
            [(1000, "streamnew alpha quality"),
             (1001, "streamnew vector quality hash")],
            "doc_id long, text string",
        ))
        land(cdc, "w2")
        stream_index_documents(spark, landing, path, "doc_id", "text",
                               checkpoint_location=ckpt, n_buckets=16)
        with open(marker, "w") as fh:
            fh.write("ok")
    out = search_text_index(
        spark, path, ["streamupdate", "quality", "hash"], k=10
    )
    return out.select("doc_id", "n_terms", F.round("score", 6).alias("score"))


QUERIES_EXT2["stream_index_docs"] = q_stream_index_docs
# full-corpus BM25 over the post-CDC corpus: updates via CASE, the two
# streamed inserts via VALUES — same constants/expression sequence as
# bm25_search's oracle
ORACLE_EXT2["stream_index_docs"] = """
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 3
                  THEN text || ' streamupdate streamupdate'
                  ELSE text END AS text
      FROM documents
      UNION ALL
      SELECT * FROM (VALUES
        (1000, 'streamnew alpha quality'),
        (1001, 'streamnew vector quality hash')) v(doc_id, text)
    ), toks AS (
      SELECT doc_id AS doc,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM corpus
    ), dl AS (
      SELECT doc, COUNT(*) AS dl FROM toks GROUP BY doc
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl
    ), tf AS (
      SELECT doc, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('streamupdate', 'quality', 'hash')
      GROUP BY doc, term
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


def q_pq_refine_search(spark, sf_dir):
    """PQ refine at rest (r11 verdict #1b — ann_index.py's
    IndexRefineFlat shape): the index stores 4 PQ codes per vector
    (codes=8 ⇒ coarse quantization that MISRANKS — asserted below
    against the ADC-only answer), plus the raw-vector companion
    (store_vectors=True, id-bloomed). Search ranks cells with the
    frozen centroids, ADC-scores the probed cells, point-fetches the
    top k*f candidates' TRUE vectors through the id blooms, and exact
    cosine re-ranks — with the refine pool covering the probed cells,
    the answer is the exact cosine top-k inside them, which the oracle
    replays: deterministic coarse training over the <350 prefix in SQL,
    final corpus (appends included) assigned with those centroids,
    exact cosine in the query's top-3 cells."""
    from .ann_index import (
        append_to_ivf_index,
        build_ivf_index,
        search_ivf_index,
    )
    from .workload import _ds_path

    path = _ds_path(sf_dir, "ivfpq_refine")
    marker = os.path.join(path, "_BUILT")
    emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if not os.path.exists(marker) or not _ivf_fixture_ok(path, m=4):
        for suffix in ("", "_vectors"):
            shutil.rmtree(path.rstrip("/") + suffix, ignore_errors=True)
        qp = path.rstrip("/") + "_quantizers.json"
        if os.path.exists(qp):
            os.remove(qp)
        build_ivf_index(
            spark, emb.filter("vec_id < 350"), path, "vec_id", "embedding",
            k=8, iters=1, m=4, codes=8, store_vectors=True,
        )
        append_to_ivf_index(
            spark, emb.filter("vec_id >= 350"), path, "vec_id", "embedding"
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    qrow = emb.filter("vec_id = 42").select(
        F.col("embedding").cast("array<double>").alias("v")
    ).first()
    qv = [float(x) for x in qrow["v"]]
    # k=11: rank 1 is the query vector itself — dropped below. The
    # refine pool (11*50) covers every probed row, so the refined
    # answer IS the exact cosine top-k inside the probed cells.
    refined = search_ivf_index(spark, path, qv, k=11, nprobe=3,
                               refine_factor=50)
    adc = search_ivf_index(spark, path, qv, k=11, nprobe=3)
    assert [r["vec_id"] for r in adc.collect()] != \
        [r["vec_id"] for r in refined.collect()], (
        "ADC-only ranking already exact — the refine gate is vacuous"
    )
    return refined.filter("vec_id <> 42").select(
        "vec_id", F.round("score", 6).alias("cos")
    ).limit(10)


QUERIES_EXT2["pq_refine_search"] = q_pq_refine_search
# deterministic coarse-training replay (one Lloyd refinement over the
# <350 prefix, init = first 8 vectors), full corpus assigned with those
# frozen centroids, exact cosine in the query's top-3 cells
ORACLE_EXT2["pq_refine_search"] = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), t AS (
      SELECT vec_id, v FROM e WHERE vec_id < 350
    ), c0 AS (
      SELECT vec_id AS cid, v AS cv FROM t WHERE vec_id < 8
    ), a1 AS (
      SELECT t.vec_id, t.v,
             arg_max(c.cid, list_dot_product(t.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM t CROSS JOIN c0 c GROUP BY t.vec_id, t.v
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
    ), q AS (
      SELECT v AS qv FROM e WHERE vec_id = 42
    ), cells AS (
      SELECT cid FROM c1 CROSS JOIN q
      ORDER BY list_dot_product(qv, cv) /
                 greatest(1e-12, sqrt(list_dot_product(cv, cv))) DESC, cid
      LIMIT 3
    ), asg AS (
      SELECT e.vec_id, e.v,
             arg_max(c.cid, list_dot_product(e.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM e CROSS JOIN c1 c GROUP BY e.vec_id, e.v
    )
    SELECT vec_id, round(score, 6) AS cos FROM (
      SELECT a.vec_id,
             list_dot_product(a.v, q.qv) /
               (greatest(1e-12, sqrt(list_dot_product(a.v, a.v))) *
                greatest(1e-12, sqrt(list_dot_product(q.qv, q.qv)))) AS score
      FROM asg a CROSS JOIN q
      WHERE a.cell IN (SELECT cid FROM cells) AND a.vec_id <> 42
    )
    ORDER BY score DESC, vec_id ASC
    LIMIT 10
"""


def q_ann_stream_upsert(spark, sf_dir):
    """Streaming ANN ingestion (r11 verdict #4 —
    streaming/vectors.py): the PQ + companion index is built over the
    <350 prefix, then the stream drains two landing waves through
    foreachBatch(upsert_vectors) with the txn ledger — wave 1 inserts
    [350,430), wave 2 is CDC (every vec_id % 25 = 3 of the prefix
    re-arrives NEGATED — re-assigned to its new cell by the frozen
    centroids — plus inserts [430,500)). The final refine search must
    equal exact cosine inside the query's top-3 cells over the
    POST-CDC corpus, which the oracle replays: coarse training over
    the original prefix, final corpus (negations applied) assigned
    with the frozen centroids."""
    import glob

    from .ann_index import build_ivf_index, search_ivf_index
    from .streaming import stream_upsert_vectors
    from .workload import _ds_path

    path = _ds_path(sf_dir, "ivf_streamed")
    landing = path.rstrip("/") + "_landing"
    ckpt = path.rstrip("/") + "_ckpt"
    marker = os.path.join(path, "_STREAMED")
    emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if not os.path.exists(marker) or not (
        _ivf_fixture_ok(path, m=4)
        and _stream_ckpt_fixture_ok(spark, path)
    ):
        for suffix in ("", "_vectors", "_landing", "_ckpt"):
            shutil.rmtree(path.rstrip("/") + suffix, ignore_errors=True)
        qp = path.rstrip("/") + "_quantizers.json"
        if os.path.exists(qp):
            os.remove(qp)
        os.makedirs(landing)

        def land(df, name):
            scratch = path.rstrip("/") + f"_scratch_{name}"
            df.coalesce(1).write.mode("overwrite").parquet(scratch)
            for i, p in enumerate(
                sorted(glob.glob(f"{scratch}/part-*.parquet"))
            ):
                shutil.move(p, f"{landing}/{name}-{i}.parquet")
            shutil.rmtree(scratch, ignore_errors=True)

        build_ivf_index(
            spark, emb.filter("vec_id < 350"), path, "vec_id", "embedding",
            k=8, iters=1, m=4, codes=8, store_vectors=True,
        )
        land(emb.filter("vec_id >= 350 and vec_id < 430"), "w1")
        stream_upsert_vectors(spark, landing, path, "vec_id", "embedding",
                              checkpoint_location=ckpt)
        cdc = emb.filter("vec_id % 25 = 3 and vec_id < 350").select(
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
        ).unionByName(emb.filter("vec_id >= 430"))
        land(cdc, "w2")
        stream_upsert_vectors(spark, landing, path, "vec_id", "embedding",
                              checkpoint_location=ckpt)
        with open(marker, "w") as fh:
            fh.write("ok")
    qrow = emb.filter("vec_id = 5").select(
        F.col("embedding").cast("array<double>").alias("v")
    ).first()
    qv = [float(x) for x in qrow["v"]]
    out = search_ivf_index(spark, path, qv, k=11, nprobe=3,
                           refine_factor=50)
    return out.filter("vec_id <> 5").select(
        "vec_id", F.round("score", 6).alias("cos")
    ).limit(10)


def q_ann_compact_search(spark, sf_dir):
    """The at-rest ANN lifecycle INCLUDING compaction (r12 —
    ann_index.compact_ivf_index): build PQ + companion over the <350
    prefix, append [350,430), REMOVE every vec_id % 50 = 7, upsert CDC
    (vec_id % 25 = 3 of the prefix re-arrives NEGATED, plus inserts
    [430,500)), then compact_ivf_index materializes the accumulated
    merge-on-read debt across index and companion (single-snapshot
    history asserted; search parity across the rewrite asserted). The
    final refine search equals exact cosine inside the query's top-3
    cells over the post-CDC corpus minus the removed ids — which the
    oracle replays from the coarse-training definition."""
    from .ann_index import (
        append_to_ivf_index,
        build_ivf_index,
        compact_ivf_index,
        remove_vectors,
        search_ivf_index,
        upsert_vectors,
    )
    from .workload import _ds_path
    from . import metadata as _md

    path = _ds_path(sf_dir, "ivf_compacted")
    marker = os.path.join(path, "_COMPACTED")
    emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qrow = emb.filter("vec_id = 5").select(
        F.col("embedding").cast("array<double>").alias("v")
    ).first()
    qv = [float(x) for x in qrow["v"]]
    if not os.path.exists(marker) or not _ivf_fixture_ok(path, m=4):
        for suffix in ("", "_vectors"):
            shutil.rmtree(path.rstrip("/") + suffix, ignore_errors=True)
        qp = path.rstrip("/") + "_quantizers.json"
        if os.path.exists(qp):
            os.remove(qp)
        build_ivf_index(
            spark, emb.filter("vec_id < 350"), path, "vec_id", "embedding",
            k=8, iters=1, m=4, codes=8, store_vectors=True,
        )
        append_to_ivf_index(
            spark, emb.filter("vec_id >= 350 and vec_id < 430"),
            path, "vec_id", "embedding",
        )
        removed = [r[0] for r in emb.filter("vec_id % 50 = 7")
                   .select("vec_id").collect()]
        remove_vectors(spark, removed, path, "vec_id")
        cdc = emb.filter("vec_id % 25 = 3 and vec_id < 350").select(
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
        ).unionByName(emb.filter("vec_id >= 430"))
        upsert_vectors(spark, cdc, path, "vec_id", "embedding")
        pre = [(r[0], round(r[1], 9)) for r in search_ivf_index(
            spark, path, qv, k=11, nprobe=3, refine_factor=50).collect()]
        compact_ivf_index(spark, path)
        post = [(r[0], round(r[1], 9)) for r in search_ivf_index(
            spark, path, qv, k=11, nprobe=3, refine_factor=50).collect()]
        # the op under test: the rewrite changed file geometry only
        assert pre == post, "compaction changed a search answer"
        for p in (path, path.rstrip("/") + "_vectors"):
            m = _md.read_sidecar(spark, p)
            assert m is not None and len(m.snapshots) == 1, p
        with open(marker, "w") as fh:
            fh.write("ok")
    out = search_ivf_index(spark, path, qv, k=11, nprobe=3,
                           refine_factor=50)
    return out.filter("vec_id <> 5").select(
        "vec_id", F.round("score", 6).alias("cos")
    ).limit(10)


QUERIES_EXT2["ann_compact_search"] = q_ann_compact_search
# same coarse replay as ann_stream_upsert (train over the ORIGINAL <350
# prefix, frozen-centroid assignment of the post-CDC corpus), minus the
# REMOVED ids (vec_id % 50 = 7) — compaction must not change a single
# score, so the oracle is the lifecycle\'s value-level definition
ORACLE_EXT2["ann_compact_search"] = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), t AS (
      SELECT vec_id, v FROM e WHERE vec_id < 350
    ), c0 AS (
      SELECT vec_id AS cid, v AS cv FROM t WHERE vec_id < 8
    ), a1 AS (
      SELECT t.vec_id, t.v,
             arg_max(c.cid, list_dot_product(t.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM t CROSS JOIN c0 c GROUP BY t.vec_id, t.v
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
    ), corpus AS (
      SELECT vec_id,
             CASE WHEN vec_id % 25 = 3 AND vec_id < 350
                  THEN list_transform(v, x -> -x)
                  ELSE v END AS v
      FROM e WHERE vec_id % 50 <> 7
    ), q AS (
      SELECT v AS qv FROM e WHERE vec_id = 5
    ), cells AS (
      SELECT cid FROM c1 CROSS JOIN q
      ORDER BY list_dot_product(qv, cv) /
                 greatest(1e-12, sqrt(list_dot_product(cv, cv))) DESC, cid
      LIMIT 3
    ), asg AS (
      SELECT corpus.vec_id, corpus.v,
             arg_max(c.cid, list_dot_product(corpus.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM corpus CROSS JOIN c1 c GROUP BY corpus.vec_id, corpus.v
    )
    SELECT vec_id, round(score, 6) AS cos FROM (
      SELECT a.vec_id,
             list_dot_product(a.v, q.qv) /
               (greatest(1e-12, sqrt(list_dot_product(a.v, a.v))) *
                greatest(1e-12, sqrt(list_dot_product(q.qv, q.qv)))) AS score
      FROM asg a CROSS JOIN q
      WHERE a.cell IN (SELECT cid FROM cells) AND a.vec_id <> 5
    )
    ORDER BY score DESC, vec_id ASC
    LIMIT 10
"""


QUERIES_EXT2["ann_stream_upsert"] = q_ann_stream_upsert
# coarse replay over the ORIGINAL <350 prefix; the post-CDC corpus
# (negations applied to vec_id % 25 = 3 of the prefix) assigned with
# the frozen centroids; exact cosine in the query's top-3 cells
ORACLE_EXT2["ann_stream_upsert"] = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), t AS (
      SELECT vec_id, v FROM e WHERE vec_id < 350
    ), c0 AS (
      SELECT vec_id AS cid, v AS cv FROM t WHERE vec_id < 8
    ), a1 AS (
      SELECT t.vec_id, t.v,
             arg_max(c.cid, list_dot_product(t.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM t CROSS JOIN c0 c GROUP BY t.vec_id, t.v
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
    ), corpus AS (
      SELECT vec_id,
             CASE WHEN vec_id % 25 = 3 AND vec_id < 350
                  THEN list_transform(v, x -> -x)
                  ELSE v END AS v
      FROM e
    ), q AS (
      SELECT v AS qv FROM e WHERE vec_id = 5
    ), cells AS (
      SELECT cid FROM c1 CROSS JOIN q
      ORDER BY list_dot_product(qv, cv) /
                 greatest(1e-12, sqrt(list_dot_product(cv, cv))) DESC, cid
      LIMIT 3
    ), asg AS (
      SELECT corpus.vec_id, corpus.v,
             arg_max(c.cid, list_dot_product(corpus.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM corpus CROSS JOIN c1 c GROUP BY corpus.vec_id, corpus.v
    )
    SELECT vec_id, round(score, 6) AS cos FROM (
      SELECT a.vec_id,
             list_dot_product(a.v, q.qv) /
               (greatest(1e-12, sqrt(list_dot_product(a.v, a.v))) *
                greatest(1e-12, sqrt(list_dot_product(q.qv, q.qv)))) AS score
      FROM asg a CROSS JOIN q
      WHERE a.cell IN (SELECT cid FROM cells) AND a.vec_id <> 5
    )
    ORDER BY score DESC, vec_id ASC
    LIMIT 10
"""


# ---------------------------------------------------------------------------
# r13: incremental ANALYZE — the stats plane folds forward over appends
# ---------------------------------------------------------------------------


def q_incremental_analyze(spark, sf_dir):
    """Incremental ANALYZE end-to-end (r12 stats.py fold, gated r13):
    publish a partitioned base, ANALYZE it (table-level +
    per-partition), append a delta, then fold BOTH records forward
    scanning only the delta — ``collect_stats(incremental=True)`` adds
    row_count/n_nulls, compares min/max typed, folds NDV through the
    stored HLL sketch; ``collect_partition_stats(incremental=True)``
    adds per-partition counts with untouched partitions carried
    verbatim. The gate asserts the folds actually ran
    (``last_*analyze_mode == 'incremental'``) and returns the STORED
    record's exact fields (min/max/n_nulls/row_count per column +
    per-partition counts), which the oracle recomputes with full-scan
    SQL over the final corpus — so a fold that lost any of the delta
    (the r12 restamp bug) hash-mismatches. NDV is excluded: after a
    fold it is the sketch estimate by design (``ndv_mode: hll``)."""
    from .publish import publish_path
    from .stats import collect_partition_stats, collect_stats, read_stats
    from .workload import _ds_path

    path = _ds_path(sf_dir, "stats_folded")
    marker = os.path.join(path, "_ANALYZED")
    orders = _table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    if not os.path.exists(marker) or not _plain_fixture_ok(spark, path):
        shutil.rmtree(path, ignore_errors=True)
        publish_path(
            spark, path, orders.filter("o_orderkey % 5 <> 0"),
            ["o_orderpriority"],
        )
        full = collect_stats(spark, path)
        assert full["last_analyze_mode"] == "full"
        assert full["columns"]["o_orderkey"]["ndv_mode"] == "exact"
        collect_partition_stats(spark, path)
        publish_path(
            spark, path, orders.filter("o_orderkey % 5 = 0"),
            ["o_orderpriority"], mode="append",
        )
        collect_stats(spark, path, incremental=True)
        collect_partition_stats(spark, path, incremental=True)
        with open(marker, "w") as fh:
            fh.write("ok")
    s = read_stats(spark, path)
    # the op under test: the folds ran, not full rescans
    assert s["last_analyze_mode"] == "incremental", s["last_analyze_mode"]
    assert s["last_partitions_analyze_mode"] == "incremental"
    assert s["columns"]["o_orderkey"]["ndv_mode"] == "hll"
    rows = []
    for c in ("o_orderkey", "o_custkey", "o_orderstatus"):
        rec = s["columns"][c]
        rows.append((
            f"col:{c}", rec["min"], rec["max"], int(rec["n_nulls"]),
            int(s["row_count"]),
        ))
    for p in s["partitions"]:
        rows.append((
            f"part:{p['values']['o_orderpriority']}", None, None, None,
            int(p["n_rows"]),
        ))
    return local_rows_df(
        spark, rows,
        "stat string, min_s string, max_s string, n_nulls bigint, "
        "n_rows bigint",
    ).orderBy("stat")


QUERIES_EXT2["incremental_analyze"] = q_incremental_analyze
# full-scan recompute of the folded record over the final corpus (base
# %5<>0 plus appended %5=0 == the whole table): exact min/max/n_nulls/
# row_count per analyzed column, exact per-partition counts
ORACLE_EXT2["incremental_analyze"] = """
    WITH corpus AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
      FROM orders
    ), cols AS (
      SELECT 'col:o_orderkey' AS stat,
             CAST(min(o_orderkey) AS VARCHAR) AS min_s,
             CAST(max(o_orderkey) AS VARCHAR) AS max_s,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_nulls,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM corpus
      UNION ALL
      SELECT 'col:o_custkey',
             CAST(min(o_custkey) AS VARCHAR),
             CAST(max(o_custkey) AS VARCHAR),
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(COUNT(*) AS BIGINT)
      FROM corpus
      UNION ALL
      SELECT 'col:o_orderstatus',
             CAST(min(o_orderstatus) AS VARCHAR),
             CAST(max(o_orderstatus) AS VARCHAR),
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(COUNT(*) AS BIGINT)
      FROM corpus
      UNION ALL
      SELECT 'part:' || o_orderpriority, NULL, NULL, NULL,
             CAST(COUNT(*) AS BIGINT)
      FROM corpus GROUP BY o_orderpriority
    )
    SELECT stat, min_s, max_s, n_nulls, n_rows FROM cols ORDER BY stat
"""


# ---------------------------------------------------------------------------
# r13: ANN drift rebuild — retrain-and-swap over the current corpus
# ---------------------------------------------------------------------------



def _plain_fixture_ok(spark, path: str) -> bool:
    """Marker-independent dataset validation for this module's plain
    stateful gates (r14) — defers to ``workload._dataset_fixture_ok``
    (local import: workload imports this module at its bottom)."""
    from .workload import _dataset_fixture_ok

    return _dataset_fixture_ok(spark, path)


def _ivf_fixture_ok(path: str, m, companion: bool = True) -> bool:
    """Marker-independent fixture validation for the ANN gates: a gate
    must never trust a marker over the state itself (an interrupted or
    concurrent run can leave a half-built family behind) — check the
    quantizer geometry, the refine companion (PQ gates), and (r14) the
    epoch pin: the quantizer JSON and the index sidecar must agree
    about which quantizers the rows were encoded against, else the
    fixture is the rebuild swap's crash window and must be rebuilt."""
    import json as _json

    qp = path.rstrip("/") + "_quantizers.json"
    try:
        with open(qp) as fh:
            q = _json.load(fh)
        with open(os.path.join(path, "_s3parq_metadata.json")) as fh:
            side = _json.load(fh)
    except (OSError, ValueError):
        return False
    if (q.get("epoch") or side.get("ann_epoch")) and (
        side.get("ann_epoch") != q.get("epoch")
    ):
        return False
    return q.get("m") == m and (
        not companion or os.path.isdir(path.rstrip("/") + "_vectors")
    )


def _text_fixture_ok(spark, path: str) -> bool:
    """Marker-independent validation for text-index fixtures (r14): the
    postings dataset must be a valid dataset (sidecar + files) with the
    bucket-derived partition layout and the postings schema, the 1-row
    ``_stats`` sibling must exist (search reads n_docs/avgdl there),
    and every OTHER existing family member (doclens/stopped/fwd) must
    itself validate — an interrupted multi-member build is detected by
    the missing/invalid member, not by marker absence."""
    from . import metadata as _md
    from .workload import _dataset_fixture_ok

    try:
        m = _md.read_sidecar(spark, path)
    except Exception:  # noqa: BLE001
        return False
    if m is None or "bucket" not in (m.derived_partitions or {}):
        return False
    if not all(c in m.column_types for c in ("term", "tf", "dl")):
        return False
    if not _dataset_fixture_ok(spark, path, meta=m):
        return False
    if not _dataset_fixture_ok(spark, path.rstrip("/") + "_stats"):
        return False
    for s in ("_doclens", "_stopped", "_fwd"):
        p = path.rstrip("/") + s
        if os.path.isdir(p) and not _dataset_fixture_ok(spark, p):
            return False
    return True


def _stream_ckpt_fixture_ok(spark, path: str) -> bool:
    """Marker-independent validation for streaming-sink fixtures (r14):
    the exactly-once incarnation ledger must be present in the sink's
    sidecar — a build interrupted between the checkpoint advance and
    the marker write leaves a sink whose txns record is the proof the
    stream actually committed; no ledger, no fixture."""
    from . import metadata as _md
    from .workload import _dataset_fixture_ok

    try:
        m = _md.read_sidecar(spark, path)
    except Exception:  # noqa: BLE001
        return False
    if m is None or not m.txns:
        return False
    return _dataset_fixture_ok(spark, path, meta=m)


def _mor_fixture_ok(spark, path: str) -> bool:
    """Marker-independent validation for merge-on-read fixtures (r14):
    the gates' whole point is PENDING delete/upsert commits taxing the
    read path, so the ledger shape — at least one pending tombstone or
    equality-delete — must still be present; a fixture that something
    compacted (materializing the debt) no longer exercises the gate
    and rebuilds."""
    from . import metadata as _md
    from .workload import _dataset_fixture_ok

    try:
        m = _md.read_sidecar(spark, path)
    except Exception:  # noqa: BLE001
        return False
    if m is None or not (m.tombstones() or m.eq_deletes()):
        return False
    return _dataset_fixture_ok(spark, path, meta=m)


def q_ann_rebuild_search(spark, sf_dir):
    """The drift remedy end-to-end (r13 — ann_index.rebuild_ivf_index):
    build PQ + companion over the <300 prefix, append the rest (drift
    counters accumulate against the FROZEN quantizers), then
    rebuild_ivf_index retrains over the CURRENT corpus — recovered from
    the raw-vector companion — and swaps the family in (drift counters
    reset asserted; ledger-carrying swap pinned by unit test). The
    final refine search therefore equals exact cosine inside the top-3
    cells of quantizers trained over the FULL corpus — which the oracle
    replays from scratch (c0 = first 8 ids of the whole table, one
    deterministic Lloyd step), unlike every frozen-quantizer oracle
    that trains on the build prefix only."""
    import glob

    from .ann_index import (
        append_to_ivf_index,
        build_ivf_index,
        index_drift,
        rebuild_ivf_index,
        search_ivf_index,
    )
    from .workload import _ds_path

    path = _ds_path(sf_dir, "ivf_rebuilt")
    marker = os.path.join(path, "_REBUILT")
    emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qrow = emb.filter("vec_id = 5").select(
        F.col("embedding").cast("array<double>").alias("v")
    ).first()
    qv = [float(x) for x in qrow["v"]]
    if not os.path.exists(marker) or not _ivf_fixture_ok(path, m=4):
        for suffix in ("", "_vectors"):
            shutil.rmtree(path.rstrip("/") + suffix, ignore_errors=True)
        qp = path.rstrip("/") + "_quantizers.json"
        if os.path.exists(qp):
            os.remove(qp)
        build_ivf_index(
            spark, emb.filter("vec_id < 300"), path, "vec_id", "embedding",
            k=8, iters=1, m=4, codes=8, store_vectors=True,
        )
        append_to_ivf_index(
            spark, emb.filter("vec_id >= 300"), path, "vec_id", "embedding",
        )
        assert index_drift(spark, path)["appended_n"] > 0
        rep = rebuild_ivf_index(spark, path, iters=1)
        assert rep["n_vectors"] == emb.count(), rep
        assert index_drift(spark, path)["appended_n"] == 0
        # swap hygiene: no temp/parked state left behind
        assert not glob.glob(path.rstrip("/") + "*rebuilding*")
        assert not glob.glob(path.rstrip("/") + "*prerebuild*")
        with open(marker, "w") as fh:
            fh.write("ok")
    out = search_ivf_index(spark, path, qv, k=11, nprobe=3,
                           refine_factor=50)
    return out.filter("vec_id <> 5").select(
        "vec_id", F.round("score", 6).alias("cos")
    ).limit(10)


QUERIES_EXT2["ann_rebuild_search"] = q_ann_rebuild_search
# retrained replay: quantizers trained over the WHOLE table (c0 = the 8
# lowest vec_ids, one Lloyd step), every vector assigned to its new
# cell, exact cosine inside the query's top-3 cells
ORACLE_EXT2["ann_rebuild_search"] = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), c0 AS (
      SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8
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
    ), q AS (
      SELECT v AS qv FROM e WHERE vec_id = 5
    ), cells AS (
      SELECT cid FROM c1 CROSS JOIN q
      ORDER BY list_dot_product(qv, cv) /
                 greatest(1e-12, sqrt(list_dot_product(cv, cv))) DESC, cid
      LIMIT 3
    ), asg AS (
      SELECT e.vec_id, e.v,
             arg_max(c.cid, list_dot_product(e.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM e CROSS JOIN c1 c GROUP BY e.vec_id, e.v
    )
    SELECT vec_id, round(score, 6) AS cos FROM (
      SELECT a.vec_id,
             list_dot_product(a.v, q.qv) /
               (greatest(1e-12, sqrt(list_dot_product(a.v, a.v))) *
                greatest(1e-12, sqrt(list_dot_product(q.qv, q.qv)))) AS score
      FROM asg a CROSS JOIN q
      WHERE a.cell IN (SELECT cid FROM cells) AND a.vec_id <> 5
    )
    ORDER BY score DESC, vec_id ASC
    LIMIT 10
"""


# ---------------------------------------------------------------------------
# r13: maintain_dataset end-to-end — the policy loop clears family debt
# ---------------------------------------------------------------------------


def q_maintain_ann_family(spark, sf_dir):
    """The r12 family trigger/dispatch machinery end-to-end (gated r13
    per the verdict — it was tests-only): an ANN family accumulates
    small files and merge-on-read debt across index AND companion
    (append, remove, CDC upsert), then ONE ``maintain_dataset`` call —
    the thing an operator actually schedules — detects the family,
    triggers on the debt, dispatches ``compact_ivf_index``, and the
    rewrite changes no answer. The gate asserts the loop ran the family
    op (result recorded, nothing failed), the debt is cleared on BOTH
    members, and search parity holds across the pass; the oracle
    replays the lifecycle's value-level definition (frozen-quantizer
    assignment of the post-CDC corpus minus removed ids)."""
    from .ann_index import (
        append_to_ivf_index,
        build_ivf_index,
        remove_vectors,
        search_ivf_index,
        upsert_vectors,
    )
    from .maintenance import dataset_health, maintain_dataset
    from .workload import _ds_path

    path = _ds_path(sf_dir, "ivf_policy_loop")
    marker = os.path.join(path, "_POLICY_MAINTAINED")
    emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qrow = emb.filter("vec_id = 5").select(
        F.col("embedding").cast("array<double>").alias("v")
    ).first()
    qv = [float(x) for x in qrow["v"]]
    if not os.path.exists(marker) or not _ivf_fixture_ok(path, m=4):
        for suffix in ("", "_vectors"):
            shutil.rmtree(path.rstrip("/") + suffix, ignore_errors=True)
        qp = path.rstrip("/") + "_quantizers.json"
        if os.path.exists(qp):
            os.remove(qp)
        build_ivf_index(
            spark, emb.filter("vec_id < 320"), path, "vec_id", "embedding",
            k=8, iters=1, m=4, codes=8, store_vectors=True,
            max_records_per_file=16,
        )
        append_to_ivf_index(
            spark, emb.filter("vec_id >= 320 and vec_id < 400"),
            path, "vec_id", "embedding",
        )
        removed = [r[0] for r in emb.filter(
            "vec_id % 40 = 9 and vec_id < 400"
        ).select("vec_id").collect()]
        remove_vectors(spark, removed, path, "vec_id")
        cdc = emb.filter("vec_id % 20 = 6 and vec_id < 320").select(
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
        ).unionByName(emb.filter("vec_id >= 400"))
        upsert_vectors(spark, cdc, path, "vec_id", "embedding")
        assert dataset_health(spark, path)["n_pending_tombstones"] > 0
        pre = [(r[0], round(r[1], 9)) for r in search_ivf_index(
            spark, path, qv, k=11, nprobe=3, refine_factor=50).collect()]
        report = maintain_dataset(
            spark, path, compact_min_files=2, compact_below_fraction=1.0,
            max_pending_tombstones=1, max_snapshots=999,
        )
        acts = {a["action"]: a for a in report["actions"]}
        # the op under test: the POLICY LOOP ran the family compaction
        assert "compact_ivf_index" in acts, report["actions"]
        assert "result" in acts["compact_ivf_index"], report["actions"]
        assert set(acts["compact_ivf_index"]["result"]) == {
            "index", "vectors"
        }
        assert not any("failed" in a for a in report["actions"])
        for p in (path, path.rstrip("/") + "_vectors"):
            h = dataset_health(spark, p)
            assert h["n_pending_tombstones"] == 0, p
            assert h["n_pending_eq_deletes"] == 0, p
        post = [(r[0], round(r[1], 9)) for r in search_ivf_index(
            spark, path, qv, k=11, nprobe=3, refine_factor=50).collect()]
        assert pre == post, "maintenance pass changed a search answer"
        with open(marker, "w") as fh:
            fh.write("ok")
    out = search_ivf_index(spark, path, qv, k=11, nprobe=3,
                           refine_factor=50)
    return out.filter("vec_id <> 5").select(
        "vec_id", F.round("score", 6).alias("cos")
    ).limit(10)


QUERIES_EXT2["maintain_ann_family"] = q_maintain_ann_family
# frozen-quantizer replay (train over the <320 prefix), post-CDC corpus
# (negations for vec_id % 20 = 6 of the prefix, inserts >= 400) minus
# the removed ids (vec_id % 40 = 9 below 400); the maintenance pass
# must not change a single score, so the oracle is the lifecycle's
# value-level definition
ORACLE_EXT2["maintain_ann_family"] = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), t AS (
      SELECT vec_id, v FROM e WHERE vec_id < 320
    ), c0 AS (
      SELECT vec_id AS cid, v AS cv FROM t WHERE vec_id < 8
    ), a1 AS (
      SELECT t.vec_id, t.v,
             arg_max(c.cid, list_dot_product(t.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM t CROSS JOIN c0 c GROUP BY t.vec_id, t.v
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
    ), corpus AS (
      SELECT vec_id,
             CASE WHEN vec_id % 20 = 6 AND vec_id < 320
                  THEN list_transform(v, x -> -x)
                  ELSE v END AS v
      FROM e WHERE NOT (vec_id % 40 = 9 AND vec_id < 400)
    ), q AS (
      SELECT v AS qv FROM e WHERE vec_id = 5
    ), cells AS (
      SELECT cid FROM c1 CROSS JOIN q
      ORDER BY list_dot_product(qv, cv) /
                 greatest(1e-12, sqrt(list_dot_product(cv, cv))) DESC, cid
      LIMIT 3
    ), asg AS (
      SELECT corpus.vec_id, corpus.v,
             arg_max(c.cid, list_dot_product(corpus.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM corpus CROSS JOIN c1 c GROUP BY corpus.vec_id, corpus.v
    )
    SELECT vec_id, round(score, 6) AS cos FROM (
      SELECT a.vec_id,
             list_dot_product(a.v, q.qv) /
               (greatest(1e-12, sqrt(list_dot_product(a.v, a.v))) *
                greatest(1e-12, sqrt(list_dot_product(q.qv, q.qv)))) AS score
      FROM asg a CROSS JOIN q
      WHERE a.cell IN (SELECT cid FROM cells) AND a.vec_id <> 5
    )
    ORDER BY score DESC, vec_id ASC
    LIMIT 10
"""


# ---------------------------------------------------------------------------
# r14: plain-dataset maintenance — the nightly pass an operator schedules
# ---------------------------------------------------------------------------


def _plain_maint_fixture_ok(spark, path: str) -> bool:
    """Marker-independent fixture validation (r14, the `_ivf_fixture_ok`
    pattern extended beyond ANN per verdict #6): trust the STATE, not
    the marker. The maintained fixture must hold a stats record whose
    table and partition folds both completed incrementally AND were
    restamped to the rewritten v1 head by the compaction carry — an
    interrupted run (refresh done, rewrite not) fails the version check
    and rebuilds — AND pass the generic dataset check (every
    manifest-acknowledged file on disk): the gate's fetch half reads
    the data plane, so a clobbered file set must rebuild, not crash."""
    from . import metadata as _md
    from .workload import _dataset_fixture_ok

    try:
        m = _md.read_sidecar(spark, path)
    except Exception:  # noqa: BLE001
        return False
    if m is None:
        return False
    rec = m.stats or {}
    if not (
        rec.get("last_analyze_mode") == "incremental"
        and rec.get("last_partitions_analyze_mode") == "incremental"
        and rec.get("as_of_version") == 1
        and rec.get("partitions_as_of_version") == 1
    ):
        return False
    return _dataset_fixture_ok(spark, path, meta=m)


def q_maintain_plain_dataset(spark, sf_dir):
    """The nightly maintenance pass on a PLAIN partitioned dataset (r14
    — the r13 scheduled-ANALYZE/compaction machinery was tests-only):
    publish a partitioned base, ANALYZE it at both granularities, let
    two micro-batch appends accumulate small files AND two snapshots of
    stats staleness, then ONE ``maintain_dataset(compact_min_files=...,
    analyze_stale_versions=...)`` call — the thing an operator actually
    schedules — runs the incremental ANALYZE refresh (a delta scan, not
    a full rescan: ``mode == 'incremental'`` asserted for BOTH
    granularities) and then the small-file compaction, whose carry
    restamps the now-current record to the rewritten v1 head (asserted:
    the NEXT pass folds instead of rescanning). The gate returns the
    STORED record's fields (min/max/n_nulls/row_count per column +
    per-partition counts) AND per-partition counts from an actual fetch
    of the compacted dataset, all recomputed by the oracle with
    full-scan SQL over the final corpus — a refresh that lost any
    appended delta, or a rewrite that lost rows, hash-mismatches."""
    from .fetch import fetch_path
    from .maintenance import maintain_dataset
    from .publish import publish_path
    from .stats import collect_partition_stats, collect_stats, read_stats
    from .workload import _ds_path

    path = _ds_path(sf_dir, "plain_maintained")
    marker = os.path.join(path, "_PLAIN_MAINTAINED")
    orders = _table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    if not os.path.exists(marker) or not _plain_maint_fixture_ok(
        spark, path
    ):
        shutil.rmtree(path, ignore_errors=True)
        publish_path(
            spark, path, orders.filter("o_orderkey % 4 <> 0"),
            ["o_orderstatus"],
        )
        full = collect_stats(spark, path)
        assert full["last_analyze_mode"] == "full"
        collect_partition_stats(spark, path)
        # two micro-batch appends: small files for the compaction
        # trigger, two snapshots of staleness for the refresh trigger
        for residue in ("o_orderkey % 8 = 0", "o_orderkey % 8 = 4"):
            publish_path(
                spark, path, orders.filter(residue), ["o_orderstatus"],
                mode="append", max_records_per_file=200,
            )
        report = maintain_dataset(
            spark, path, compact_min_files=4, compact_below_fraction=1.0,
            max_snapshots=999, max_pending_tombstones=9999,
            analyze_stale_versions=2,
        )
        acts = {a["action"]: a for a in report["actions"]}
        # the op under test: ONE policy pass ran the delta-fold refresh
        # AND the compaction, refresh first (fold while history intact)
        assert "collect_stats" in acts, report["actions"]
        assert "compact_dataset" in acts, report["actions"]
        assert acts["collect_stats"]["result"]["mode"] == "incremental"
        assert (
            acts["collect_stats"]["result"]["partitions_mode"]
            == "incremental"
        )
        assert "result" in acts["compact_dataset"], report["actions"]
        assert not any("failed" in a for a in report["actions"])
        # refresh-before-rewrite means the record was provably current
        # at the rewrite: the carry restamped it to the rewritten head,
        # so the NEXT pass folds from v1 instead of full-rescanning
        s2 = read_stats(spark, path)
        assert s2["as_of_version"] == 1, s2["as_of_version"]
        assert s2["partitions_as_of_version"] == 1
        with open(marker, "w") as fh:
            fh.write("ok")
    s = read_stats(spark, path)
    assert s["last_analyze_mode"] == "incremental"
    assert s["last_partitions_analyze_mode"] == "incremental"
    rows = []
    for c in ("o_orderkey", "o_custkey"):
        rec = s["columns"][c]
        rows.append((
            f"col:{c}", rec["min"], rec["max"], int(rec["n_nulls"]),
            int(s["row_count"]),
        ))
    for p in s["partitions"]:
        rows.append((
            f"part:{p['values']['o_orderstatus']}", None, None, None,
            int(p["n_rows"]),
        ))
    # the data plane agrees with the stats plane THROUGH the rewrite:
    # per-partition counts from an actual fetch of the compacted dataset
    for r in fetch_path(spark, path).groupBy("o_orderstatus").count().collect():
        rows.append((
            f"fetch:{r['o_orderstatus']}", None, None, None,
            int(r["count"]),
        ))
    return local_rows_df(
        spark, rows,
        "stat string, min_s string, max_s string, n_nulls bigint, "
        "n_rows bigint",
    ).orderBy("stat")


QUERIES_EXT2["maintain_plain_dataset"] = q_maintain_plain_dataset
# full-scan recompute over the final corpus (base %4<>0 plus the two
# appended %8 residues == the whole orders table): exact
# min/max/n_nulls/row_count per analyzed column, exact per-partition
# counts from the stored record AND from the post-compaction fetch
ORACLE_EXT2["maintain_plain_dataset"] = """
    WITH corpus AS (
      SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
    ), cols AS (
      SELECT 'col:o_orderkey' AS stat,
             CAST(min(o_orderkey) AS VARCHAR) AS min_s,
             CAST(max(o_orderkey) AS VARCHAR) AS max_s,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_nulls,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM corpus
      UNION ALL
      SELECT 'col:o_custkey',
             CAST(min(o_custkey) AS VARCHAR),
             CAST(max(o_custkey) AS VARCHAR),
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(COUNT(*) AS BIGINT)
      FROM corpus
      UNION ALL
      SELECT 'part:' || o_orderstatus, NULL, NULL, NULL,
             CAST(COUNT(*) AS BIGINT)
      FROM corpus GROUP BY o_orderstatus
      UNION ALL
      SELECT 'fetch:' || o_orderstatus, NULL, NULL, NULL,
             CAST(COUNT(*) AS BIGINT)
      FROM corpus GROUP BY o_orderstatus
    )
    SELECT stat, min_s, max_s, n_nulls, n_rows FROM cols ORDER BY stat
"""


# ---------------------------------------------------------------------------
# r14: policy-loop drift rebuild — maintain_dataset(rebuild_on_drift=True)
# ---------------------------------------------------------------------------


def q_maintain_drift_rebuild(spark, sf_dir):
    """The drift-triggered retrain from the POLICY LOOP (r14 stretch —
    the manual rebuild is gated as ``ann_rebuild_search``; this gates
    the trigger path an operator actually schedules): a flat IVF index
    trained on the <300 prefix receives an out-of-distribution append
    (every component shifted +2.0 — appended vectors quantize
    measurably worse against the frozen centroids, driving
    ``drift_ratio`` past the operator's threshold), then ONE
    ``maintain_dataset(rebuild_on_drift=True)``
    call detects the drift and runs ``rebuild_ivf_index`` — retraining
    over the CURRENT corpus recovered from the at-rest index rows, with
    the loop's default geometry carry (k=8) and training depth
    (iters=2). The gate asserts the loop ran the rebuild (result
    recorded, drift counters reset) and returns the post-rebuild
    search, which the oracle replays from scratch: quantizers trained
    on the FULL post-append corpus (c0 = the 8 lowest vec_ids, TWO
    deterministic Lloyd steps — the loop's iters default), exact cosine
    inside the query's top-3 cells."""
    import glob

    from .ann_index import (
        append_to_ivf_index,
        build_ivf_index,
        index_drift,
        search_ivf_index,
    )
    from .maintenance import maintain_dataset
    from .workload import _ds_path

    path = _ds_path(sf_dir, "ivf_drift_loop")
    marker = os.path.join(path, "_DRIFT_REBUILT")
    emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qrow = emb.filter("vec_id = 5").select(
        F.col("embedding").cast("array<double>").alias("v")
    ).first()
    qv = [float(x) for x in qrow["v"]]
    if not os.path.exists(marker) or not _ivf_fixture_ok(
        path, m=None, companion=False
    ):
        shutil.rmtree(path, ignore_errors=True)
        qp = path.rstrip("/") + "_quantizers.json"
        if os.path.exists(qp):
            os.remove(qp)
        build_ivf_index(
            spark, emb.filter("vec_id < 300"), path, "vec_id", "embedding",
            k=8, iters=2,
        )
        shifted = emb.filter("vec_id >= 300").select(
            "vec_id",
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x + F.lit(2.0),
            ).alias("embedding"),
        )
        append_to_ivf_index(spark, shifted, path, "vec_id", "embedding")
        # the +2.0 shift lifts appended qerr (1 - cos to the assigned
        # frozen centroid) from ~0.72 to ~0.82 — a measured ~1.13 ratio,
        # stable across sf (same <300 training prefix, same appended
        # distribution); the trigger threshold is the operator's policy
        # knob, set under the measured drift
        assert index_drift(spark, path)["drift_ratio"] >= 1.05
        report = maintain_dataset(
            spark, path, compact_min_files=9999, max_snapshots=999,
            max_pending_tombstones=9999, ann_drift_threshold=1.05,
            rebuild_on_drift=True,
        )
        acts = {a["action"]: a for a in report["actions"]}
        # the op under test: the POLICY LOOP ran the retrain-and-swap
        assert "rebuild_ivf_index" in acts, report["actions"]
        assert "result" in acts["rebuild_ivf_index"], report["actions"]
        assert acts["rebuild_ivf_index"]["result"]["n_vectors"] == (
            emb.count()
        )
        assert not any("failed" in a for a in report["actions"])
        d = index_drift(spark, path)
        assert d["appended_n"] == 0 and d["appended_qerr"] is None
        # swap hygiene: no temp/parked state left behind
        assert not glob.glob(path.rstrip("/") + "*rebuilding*")
        assert not glob.glob(path.rstrip("/") + "*prerebuild*")
        with open(marker, "w") as fh:
            fh.write("ok")
    out = search_ivf_index(spark, path, qv, k=11, nprobe=3)
    return out.filter("vec_id <> 5").select(
        "vec_id", F.round("score", 6).alias("cos")
    ).limit(10)


QUERIES_EXT2["maintain_drift_rebuild"] = q_maintain_drift_rebuild
# retrained replay over the post-append corpus (base <300 verbatim,
# >=300 shifted +2.0 per component): c0 = the 8 lowest vec_ids, TWO
# Lloyd steps (the policy loop's rebuild default iters=2), every vector
# assigned to its final cell, exact cosine inside the query's top-3
# cells
ORACLE_EXT2["maintain_drift_rebuild"] = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), corpus AS (
      SELECT vec_id,
             CASE WHEN vec_id >= 300
                  THEN list_transform(v, x -> x + 2.0)
                  ELSE v END AS v
      FROM e
    ), c0 AS (
      SELECT vec_id AS cid, v AS cv FROM corpus WHERE vec_id < 8
    ), a1 AS (
      SELECT corpus.vec_id, corpus.v,
             arg_max(c.cid, list_dot_product(corpus.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM corpus CROSS JOIN c0 c GROUP BY corpus.vec_id, corpus.v
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
      SELECT corpus.vec_id, corpus.v,
             arg_max(c.cid, list_dot_product(corpus.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM corpus CROSS JOIN c1 c GROUP BY corpus.vec_id, corpus.v
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
    ), q AS (
      SELECT v AS qv FROM e WHERE vec_id = 5
    ), cells AS (
      SELECT cid FROM c2 CROSS JOIN q
      ORDER BY list_dot_product(qv, cv) /
                 greatest(1e-12, sqrt(list_dot_product(cv, cv))) DESC, cid
      LIMIT 3
    ), asg AS (
      SELECT corpus.vec_id, corpus.v,
             arg_max(c.cid, list_dot_product(corpus.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM corpus CROSS JOIN c2 c GROUP BY corpus.vec_id, corpus.v
    )
    SELECT vec_id, round(score, 6) AS cos FROM (
      SELECT a.vec_id,
             list_dot_product(a.v, q.qv) /
               (greatest(1e-12, sqrt(list_dot_product(a.v, a.v))) *
                greatest(1e-12, sqrt(list_dot_product(q.qv, q.qv)))) AS score
      FROM asg a CROSS JOIN q
      WHERE a.cell IN (SELECT cid FROM cells) AND a.vec_id <> 5
    )
    ORDER BY score DESC, vec_id ASC
    LIMIT 10
"""


# ---------------------------------------------------------------------------
# r14 (late): the crash window end-to-end — refusal, then rollback
# ---------------------------------------------------------------------------


def q_ann_rollback_search(spark, sf_dir):
    """The rebuild crash window CLOSED end-to-end (r14 — the epoch pin's
    whole story, oracle-gated): a flat index built on the <320 prefix
    takes a frozen-quantizer append, then the fixture manufactures the
    exact state a crash between the rebuild swap's two renames leaves —
    a fully-built NEW family is swapped in at the index directory
    (pure file ops: park old at ``.prerebuild``, rename the
    ``.rebuilding`` build in) while the OLD quantizer JSON stays live.
    The gate asserts the refusal plane end-to-end: search raises
    ``QuantizerEpochError``, ``maintain_dataset`` surfaces
    ``quantizer_epoch_mismatch`` and neither compacts nor sweeps the
    parked rollback state — then ``rollback_rebuild`` restores the
    parked family and the search answers are BIT-IDENTICAL to the
    pre-crash results, which the oracle replays as the standard
    frozen-quantizer SQL (train on the <320 prefix, assign the full
    corpus, exact cosine in the top-3 cells)."""
    from .ann_index import (
        QuantizerEpochError,
        append_to_ivf_index,
        build_ivf_index,
        index_drift,
        rollback_rebuild,
        search_ivf_index,
    )
    from .maintenance import maintain_dataset
    from .workload import _ds_path

    path = _ds_path(sf_dir, "ivf_rollback")
    marker = os.path.join(path, "_ROLLED_BACK")
    emb = _table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qrow = emb.filter("vec_id = 7").select(
        F.col("embedding").cast("array<double>").alias("v")
    ).first()
    qv = [float(x) for x in qrow["v"]]
    if not os.path.exists(marker) or not _ivf_fixture_ok(
        path, m=None, companion=False
    ):
        for suffix in ("", ".prerebuild", ".rebuilding"):
            shutil.rmtree(path.rstrip("/") + suffix, ignore_errors=True)
        for qsuf in ("_quantizers.json", ".rebuilding_quantizers.json",
                     "_quantizers.json.prerebuild"):
            qp = path.rstrip("/") + qsuf
            if os.path.exists(qp):
                os.remove(qp)
        build_ivf_index(
            spark, emb.filter("vec_id < 320"), path, "vec_id", "embedding",
            k=8, iters=1,
        )
        append_to_ivf_index(
            spark, emb.filter("vec_id >= 320"), path, "vec_id", "embedding"
        )
        pre = [(r[0], round(r[1], 9)) for r in search_ivf_index(
            spark, path, qv, k=11, nprobe=3).collect()]

        # manufacture the crash window with PURE FILE OPS: a complete
        # new family built in the rebuild's own temp layout, index dir
        # swapped in, quantizer JSON rename never happening
        tmp = path.rstrip("/") + ".rebuilding"
        build_ivf_index(
            spark, emb, tmp, "vec_id", "embedding", k=8, iters=2,
        )
        os.rename(path, path.rstrip("/") + ".prerebuild")
        os.rename(tmp, path)

        # refusal plane: every consumer refuses; the policy loop
        # reports and protects the rollback state
        try:
            search_ivf_index(spark, path, qv, k=5, nprobe=2)
            raise AssertionError("crash window served instead of refusing")
        except QuantizerEpochError:
            pass
        report = maintain_dataset(
            spark, path, compact_min_files=1, compact_below_fraction=1.0,
            max_snapshots=999, max_pending_tombstones=9999,
            vacuum_retention_hours=0.0,
        )
        kinds = [a["action"] for a in report["actions"]]
        assert "quantizer_epoch_mismatch" in kinds, report["actions"]
        assert "compact_ivf_index" not in kinds
        assert "remove_rewrite_residue" not in kinds
        assert os.path.isdir(path.rstrip("/") + ".prerebuild")

        rep = rollback_rebuild(spark, path)
        assert path in rep["restored"], rep
        post = [(r[0], round(r[1], 9)) for r in search_ivf_index(
            spark, path, qv, k=11, nprobe=3).collect()]
        assert post == pre, "rollback changed a search answer"
        assert index_drift(spark, path)["appended_n"] > 0  # counters back
        import glob as _glob

        assert not _glob.glob(path.rstrip("/") + "*rebuilding*")
        assert not _glob.glob(path.rstrip("/") + "*prerebuild*")
        with open(marker, "w") as fh:
            fh.write("ok")
    out = search_ivf_index(spark, path, qv, k=11, nprobe=3)
    return out.filter("vec_id <> 7").select(
        "vec_id", F.round("score", 6).alias("cos")
    ).limit(10)


QUERIES_EXT2["ann_rollback_search"] = q_ann_rollback_search
# the RESTORED family is the pre-crash frozen-quantizer state: train on
# the <320 prefix (first-8-id init, one Lloyd step), assign the FULL
# corpus with those centroids, exact cosine in the query's top-3 cells
ORACLE_EXT2["ann_rollback_search"] = """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), t AS (
      SELECT vec_id, v FROM e WHERE vec_id < 320
    ), c0 AS (
      SELECT vec_id AS cid, v AS cv FROM t WHERE vec_id < 8
    ), a1 AS (
      SELECT t.vec_id, t.v,
             arg_max(c.cid, list_dot_product(t.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM t CROSS JOIN c0 c GROUP BY t.vec_id, t.v
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
    ), q AS (
      SELECT v AS qv FROM e WHERE vec_id = 7
    ), cells AS (
      SELECT cid FROM c1 CROSS JOIN q
      ORDER BY list_dot_product(qv, cv) /
                 greatest(1e-12, sqrt(list_dot_product(cv, cv))) DESC, cid
      LIMIT 3
    ), asg AS (
      SELECT e.vec_id, e.v,
             arg_max(c.cid, list_dot_product(e.v, c.cv) /
               greatest(1e-12, sqrt(list_dot_product(c.cv, c.cv)))) AS cell
      FROM e CROSS JOIN c1 c GROUP BY e.vec_id, e.v
    )
    SELECT vec_id, round(score, 6) AS cos FROM (
      SELECT a.vec_id,
             list_dot_product(a.v, q.qv) /
               (greatest(1e-12, sqrt(list_dot_product(a.v, a.v))) *
                greatest(1e-12, sqrt(list_dot_product(q.qv, q.qv)))) AS score
      FROM asg a CROSS JOIN q
      WHERE a.cell IN (SELECT cid FROM cells) AND a.vec_id <> 7
    )
    ORDER BY score DESC, vec_id ASC
    LIMIT 10
"""


# ---------------------------------------------------------------------------
# r15: the text-index crash window end-to-end — refuse, repair, serve
# ---------------------------------------------------------------------------


def q_text_crash_repair_search(spark, sf_dir):
    """The text family's cap-crossing crash window CLOSED end-to-end
    (r15 — VERDICT r14 #1, the ``ann_rollback_search`` shape): a capped
    build (cap = n_docs // 5, corpus-relative so the gate means the
    same thing at every sf) puts the high-df marker ``qqcrash``
    (df = n/3) in the stopped sibling while ``qqrare`` (df = n/11)
    serves live; the fixture then manufactures the exact state a crash
    between the move's copy and its tombstone leaves — the stopped
    list lands on the live side while the source rows survive (a raw
    append of the stopped postings into the live index: the same
    bytes, the same moved head, the same stale stamps). The gate
    asserts the refusal plane end-to-end: search raises
    ``TextIndexEpochError`` naming the repair pair, ``maintain_dataset``
    surfaces ``text_epoch_mismatch`` and suspends family compaction —
    then the POLICY LOOP ITSELF repairs on opt-in
    (``repair_text_on_epoch_mismatch=True`` runs repair_capped_index +
    repair_index_stats, VERDICT r14 #6), and the served search is
    hash-matched against full-corpus SQL BM25 with the same df cap."""
    from .maintenance import maintain_dataset
    from .fetch import fetch_path
    from .publish import publish_path
    from .text_index import (
        TextIndexEpochError,
        _stopped_path,
        build_text_index,
        search_text_index,
        text_index_info,
    )
    from .workload import _ds_path

    path = _ds_path(sf_dir, "text_index_crash2")
    marker = os.path.join(path, "_CRASH_REPAIRED")
    if not os.path.exists(marker) or not _text_fixture_ok(spark, path):
        for suffix in ("", "_stats", "_doclens", "_stopped", "_fwd"):
            shutil.rmtree(path.rstrip("/") + suffix, ignore_errors=True)
        docs = _table(spark, sf_dir, "documents").select("doc_id", "text")
        maxdf = docs.count() // 5
        corpus = docs.select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.when(F.col("doc_id") % 3 == 0, F.lit(" qqcrash"))
                .otherwise(F.lit("")),
                F.when(F.col("doc_id") % 11 == 0, F.lit(" qqrare qqrare"))
                .otherwise(F.lit("")),
            ).alias("text"),
        )
        build_text_index(
            spark, corpus, path, "doc_id", "text",
            n_buckets=16, max_df=maxdf, max_records_per_file=2000,
        )
        # qqcrash (df = n/3 > cap) is stopped; qqrare (n/11 < cap) lives
        assert search_text_index(
            spark, path, ["qqcrash"], k=1
        ).limit(1).count() == 0
        assert search_text_index(
            spark, path, ["qqrare"], k=1
        ).limit(1).count() == 1

        # manufacture the copy-then-tombstone window: the stopped list
        # lands in live (copy committed), the source never tombstones
        stray = fetch_path(
            spark, _stopped_path(path),
            filters=[{"partition": "term", "comparison": "==",
                      "values": ["qqcrash"]}],
        ).select("term", "doc_id", "tf", "dl")
        publish_path(spark, path, stray, [], mode="append")

        # refusal plane: serve refuses naming the remedy; the ops view
        # reports; the policy loop surfaces and suspends compaction
        try:
            search_text_index(spark, path, ["qqrare"], k=3).collect()
            raise AssertionError("crash window served instead of refusing")
        except TextIndexEpochError:
            pass
        assert text_index_info(spark, path)["epoch_damage"] is not None
        report = maintain_dataset(
            spark, path, compact_min_files=1, compact_below_fraction=1.0,
            max_snapshots=999, max_pending_tombstones=1,
        )
        kinds = [a["action"] for a in report["actions"]]
        assert "text_epoch_mismatch" in kinds, report["actions"]
        assert "compact_text_index" not in kinds

        # the policy loop IS the remedy on opt-in: residency repair
        # (bounded by stop-term cardinality) + stats recompute/re-stamp
        report = maintain_dataset(
            spark, path, compact_min_files=9999, max_snapshots=999,
            max_pending_tombstones=9999,
            repair_text_on_epoch_mismatch=True,
        )
        acts = {a["action"]: a for a in report["actions"]}
        fixed = acts["text_epoch_mismatch"]["result"]["moved_terms"]
        assert fixed == {"qqcrash": "stopped"}, fixed
        assert text_index_info(spark, path)["epoch_damage"] is None
        with open(marker, "w") as fh:
            fh.write("ok")
    out = search_text_index(spark, path, ["qqrare", "qqcrash"], k=10)
    return out.select(
        "doc_id", "n_terms", F.round("score", 6).alias("score")
    )


QUERIES_EXT2["text_crash_repair_search"] = q_text_crash_repair_search
# the REPAIRED family must serve exactly capped BM25 over the marked
# corpus — the repair converged to the same state a fresh capped build
# over the corpus reaches (qqcrash's df > 90 keeps it capped out)
ORACLE_EXT2["text_crash_repair_search"] = """
    WITH corpus AS (
      SELECT doc_id,
             text ||
             CASE WHEN doc_id % 3 = 0 THEN ' qqcrash' ELSE '' END ||
             CASE WHEN doc_id % 11 = 0 THEN ' qqrare qqrare' ELSE '' END
               AS text
      FROM documents
    ), toks AS (
      SELECT doc_id AS doc,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM corpus
    ), dl AS (
      SELECT doc, COUNT(*) AS dl FROM toks GROUP BY doc
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl
    ), tf AS (
      SELECT doc, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('qqrare', 'qqcrash') GROUP BY doc, term
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
      WHERE df_t <= CAST(floor(n_docs / 5.0) AS BIGINT)
    ), agg AS (
      SELECT doc, COUNT(*) AS n_terms, CAST(SUM(s) AS DOUBLE) AS score
      FROM scored GROUP BY doc
    )
    SELECT doc AS doc_id, n_terms, round(score, 6) AS score
    FROM agg
    ORDER BY score DESC, doc ASC
    LIMIT 10
"""


# ---------------------------------------------------------------------------
# r15: the SPILLED partition-stats path end-to-end (VERDICT r14 #3)
# ---------------------------------------------------------------------------


def _pstats_spill_fixture_ok(spark, path: str) -> bool:
    """Marker-independent validation: the record must hold a SPILLED
    partitions section (manifest pointer, no inline list) whose folds
    completed incrementally and were restamped to the rewritten v1 head
    by the compaction carry, and the generic dataset check must pass."""
    from . import metadata as _md
    from .workload import _dataset_fixture_ok

    try:
        m = _md.read_sidecar(spark, path)
    except Exception:  # noqa: BLE001
        return False
    if m is None:
        return False
    rec = m.stats or {}
    if not (
        rec.get("partitions_manifest")
        and rec.get("partitions") is None
        and rec.get("last_partitions_analyze_mode") == "incremental"
        and rec.get("partitions_as_of_version") == 1
    ):
        return False
    return _dataset_fixture_ok(spark, path, meta=m)


def q_partition_stats_spilled(spark, sf_dir):
    """The spilled partition-stats path end-to-end (r15 — VERDICT r14
    #3: the r14 spill was unit-pinned but never oracle-gated): a
    two-level layout (o_orderstatus × o_orderpriority, 15 combos) is
    ANALYZEd with ``spill_threshold=4``, so the per-partition record
    lives as a COLUMNAR MANIFEST POINTER, not inline JSON — the sidecar
    stays O(1) however many combos exist (the 100 TB date×domain
    shape). The fixture then replays the whole lifecycle through the
    pointer: an append + ``incremental=True`` re-collect folds the
    delta O(delta) with the record still spilled, and a compaction
    re-materializes the manifest into the rewritten tree (the carry's
    re-home) with the stamp restamped to the v1 head. The gate returns
    the read-back records (through the pointer) AND per-partition
    counts from an actual fetch — both hash-matched against full-scan
    SQL over the final corpus."""
    from .fetch import fetch_path
    from .publish import compact_dataset, publish_path
    from .stats import collect_partition_stats, read_stats, _load_partition_recs
    from .workload import _ds_path

    path = _ds_path(sf_dir, "pstats_spilled")
    marker = os.path.join(path, "_SPILLED_STATS")
    orders = _table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    if not os.path.exists(marker) or not _pstats_spill_fixture_ok(
        spark, path
    ):
        shutil.rmtree(path, ignore_errors=True)
        publish_path(
            spark, path, orders.filter("o_orderkey % 4 <> 0"),
            ["o_orderstatus", "o_orderpriority"],
        )
        collect_partition_stats(spark, path, spill_threshold=4)
        rec = read_stats(spark, path)
        assert rec.get("partitions") is None, "record did not spill"
        assert rec["partitions_manifest"]["n"] >= 4
        # the pointer's file really exists inside the dataset tree
        assert os.path.exists(
            os.path.join(path, rec["partitions_manifest"]["path"])
        )
        # append a delta; the incremental fold goes THROUGH the pointer
        publish_path(
            spark, path, orders.filter("o_orderkey % 4 = 0"),
            ["o_orderstatus", "o_orderpriority"], mode="append",
        )
        collect_partition_stats(
            spark, path, incremental=True, spill_threshold=4
        )
        rec = read_stats(spark, path)
        assert rec["last_partitions_analyze_mode"] == "incremental"
        assert rec.get("partitions") is None  # still spilled after fold
        # compaction: the carry re-homes the manifest into the rewritten
        # tree and restamps the (current) record to the v1 head
        compact_dataset(spark, path)
        rec = read_stats(spark, path)
        assert rec.get("partitions") is None
        assert rec["partitions_as_of_version"] == 1
        assert os.path.exists(
            os.path.join(path, rec["partitions_manifest"]["path"])
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    rec = read_stats(spark, path)
    rows = []
    for p in _load_partition_recs(spark, path, rec):
        rows.append((
            "stats:%s|%s" % (
                p["values"]["o_orderstatus"],
                p["values"]["o_orderpriority"],
            ),
            int(p["n_rows"]),
        ))
    for r in fetch_path(spark, path).groupBy(
        "o_orderstatus", "o_orderpriority"
    ).count().collect():
        rows.append((
            "fetch:%s|%s" % (r["o_orderstatus"], r["o_orderpriority"]),
            int(r["count"]),
        ))
    return local_rows_df(
        spark, rows, "stat string, n_rows bigint"
    ).orderBy("stat")


QUERIES_EXT2["partition_stats_spilled"] = q_partition_stats_spilled
# full-scan recompute over the final corpus (base %4<>0 + appended %4=0
# == the whole orders table): the stored (spilled) record and the
# post-compaction fetch must BOTH equal exact per-combo counts
ORACLE_EXT2["partition_stats_spilled"] = """
    WITH combos AS (
      SELECT o_orderstatus AS s, o_orderpriority AS p, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT 'stats:' || s || '|' || p AS stat, CAST(n AS BIGINT) AS n_rows
    FROM combos
    UNION ALL
    SELECT 'fetch:' || s || '|' || p AS stat, CAST(n AS BIGINT) AS n_rows
    FROM combos
    ORDER BY stat
"""
