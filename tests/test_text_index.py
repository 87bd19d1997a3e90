"""Text search index at rest (text_index.py): exact BM25 parity with the
corpus-side operator, the hidden-bucket layout, and the pruned-read
contract (derived-partition pushdown composing with bloom skipping)."""

import hashlib
import importlib

import pytest
from pyspark.sql import functions as F

from s3parq_spark import metadata
from s3parq_spark.operators import bm25_scores
from s3parq_spark.text_index import build_text_index, search_text_index

fetch_mod = importlib.import_module("s3parq_spark.fetch")


def _bucket(term: str, n: int) -> int:
    # test-side twin of the recorded transform, for plan assertions only
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:15], 16) % n


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


@pytest.fixture()
def index(spark, docs, tmp_dataset_dir):
    build_text_index(
        spark, docs, tmp_dataset_dir, "doc_id", "text",
        n_buckets=16, max_records_per_file=2000,
    )
    return tmp_dataset_dir


def _rows(df):
    return [
        (r["doc_id"], r["n_terms"], round(r["score"], 9)) for r in df.collect()
    ]


def test_search_equals_corpus_bm25(spark, docs, index):
    for terms in (["hash", "join", "vector"], ["the"], ["model", "data"]):
        got = _rows(search_text_index(spark, index, terms, k=10))
        exp = _rows(bm25_scores(docs, "doc_id", "text", terms, top_k=10))
        assert got == exp, terms
    # absent term contributes nothing; all-absent query returns empty
    got = _rows(search_text_index(spark, index, ["zzqqxx_notaterm"], k=10))
    assert got == []


def test_layout_is_the_datasets_own_contract(spark, index):
    """The bucket transform lives in the sidecar (hidden partitioning),
    term carries bloom fingerprints, and the id column is recovered from
    the schema — no caller-side bookkeeping anywhere."""
    m = metadata.read_sidecar(spark, index)
    assert m.partitions == ["bucket"]
    assert "bucket" in (m.derived_partitions or {})
    assert "md5" in m.derived_partitions["bucket"]
    assert m.file_bloom_columns() == ["term"]
    # searching a non-index dataset fails loudly
    with pytest.raises(ValueError, match="at least one query term"):
        search_text_index(spark, index, [])


def test_search_reads_only_query_buckets(spark, index):
    """One term filter must prune to the query terms' buckets at the file
    index (hidden-partition pushdown) AND bloom-skip files within them
    (the residual/data-skipping composition) — never an index scan."""
    terms = ["hash", "vector"]
    df = search_text_index(spark, index, terms, k=10)
    m = metadata.read_sidecar(spark, index)
    all_files = m.manifest_files()
    want = {f"bucket={_bucket(t, 16)}/" for t in terms}
    scanned = [f for f in df.inputFiles() if "_stats" not in f]
    assert scanned, "search read no index files"
    assert len(scanned) < len(all_files)
    for f in scanned:
        assert any(b in f for b in want), f
    # the bloom prune bites within the kept buckets when a bucket holds
    # several files: kept files <= files of the wanted buckets
    bucket_files = [
        f for f in all_files if any(b in f for b in want)
    ]
    assert len(scanned) <= len(bucket_files)


def test_residual_prune_composition_generic(spark, tmp_path):
    """The engine-level piece on a plain dataset: a filter on the SOURCE
    column of a derived partition drives partition pruning AND the bloom
    file prune, with exact results."""
    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.publish import publish_path

    path = str(tmp_path / "ds")
    # users in contiguous 50-row blocks: a bucket's files then hold
    # DIFFERENT user subsets, so the fingerprints have something to skip
    rows = [(i, f"u{i // 50}", float(i)) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, user string, v double")
    publish_path(
        spark, path, df, [],
        derived_partitions={
            "ub": "cast(pmod(cast(conv(substring(md5(cast(user as binary)),"
                  " 1, 15), 16, 10) as bigint), 8) as int)"
        },
        max_records_per_file=100,
        file_bloom_columns=["user"],
    )
    m = metadata.read_sidecar(spark, path)
    files = m.manifest_files()
    flt = [{"partition": "user", "comparison": "==", "values": ["u13"]}]
    got = fetch_path(spark, path, filters=flt)
    assert got.count() == sum(1 for _, u, _v in rows if u == "u13")
    scanned = got.inputFiles()
    assert 0 < len(scanned) < len(files)
    b = _bucket("u13", 8)
    assert all(f"ub={b}/" in f for f in scanned)
    # within the bucket, the bloom fingerprint skips files lacking u13
    in_bucket = [f for f in files if f.startswith(f"ub={b}/")]
    if len(in_bucket) >= 4:
        assert len(scanned) < len(in_bucket), (
            "bloom did not skip inside the derived bucket"
        )


def test_max_df_drops_stop_terms(spark, tmp_dataset_dir):
    rows = [(i, "stop stop unique%d" % i) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_text_index(
        spark, docs, tmp_dataset_dir, "doc_id", "text",
        n_buckets=4, max_df=5,
    )
    # 'stop' appears in 20 docs -> dropped; searches get no contribution
    assert _rows(search_text_index(spark, tmp_dataset_dir, ["stop"])) == []
    got = _rows(search_text_index(spark, tmp_dataset_dir, ["unique3", "stop"]))
    assert len(got) == 1 and got[0][0] == 3 and got[0][1] == 1


def test_residual_prune_respects_catalyst_cast_semantics(spark, tmp_path):
    """r9 review repro: the residual ROW predicate is a raw Catalyst
    comparison (implicit casts: user = 7 matches the string '7'), so a
    type-mismatched probe must NOT let the truth-table prunes drop the
    files — the filter is excluded from pruning and the residual decides."""
    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.publish import publish_path

    path = str(tmp_path / "ds")
    rows = [(i, str(i // 50), float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, user string, v double")
    publish_path(
        spark, path, df, [],
        derived_partitions={
            "ub": "cast(pmod(cast(conv(substring(md5(cast(user as binary)),"
                  " 1, 15), 16, 10) as bigint), 4) as int)"
        },
        max_records_per_file=100,
        file_bloom_columns=["user"],
    )
    # int probe against the string column: Catalyst casts and matches
    got = fetch_path(spark, path, filters=[
        {"partition": "user", "comparison": "==", "values": [7]},
    ])
    assert got.count() == 50
    # string probe still prunes AND matches exactly
    got = fetch_path(spark, path, filters=[
        {"partition": "user", "comparison": "==", "values": ["7"]},
    ])
    assert got.count() == 50


def test_non_index_dataset_fails_loudly(spark, tmp_path, index):
    from s3parq_spark.text_index import _stats_path

    # the stats side table has no bucket transform: caught by the same
    # guard as a missing dataset (r10 — the transform check now runs
    # before schema-shape detection)
    with pytest.raises(ValueError, match="no text index"):
        search_text_index(spark, _stats_path(index), ["hash"])
    with pytest.raises(ValueError, match="no text index"):
        search_text_index(spark, str(tmp_path / "nothing"), ["hash"])


def test_incremental_append_equals_full_rebuild(spark, docs, tmp_path):
    """Index half the corpus, append the other half: searches must equal
    full-corpus BM25 exactly (bucket routing is the dataset's recorded
    transform, so appended postings land where searches look; stats fold
    forward O(new docs))."""
    from s3parq_spark.text_index import append_to_text_index

    path = str(tmp_path / "idx")
    build_text_index(
        spark, docs.filter("doc_id < 250"), path, "doc_id", "text",
        n_buckets=16,
    )
    append_to_text_index(
        spark, docs.filter("doc_id >= 250"), path, "doc_id", "text"
    )
    for terms in (["hash", "join", "vector"], ["model", "data"]):
        got = _rows(search_text_index(spark, path, terms, k=10))
        exp = _rows(bm25_scores(docs, "doc_id", "text", terms, top_k=10))
        assert got == exp, terms
    with pytest.raises(ValueError, match="no text index"):
        append_to_text_index(
            spark, docs.limit(1), str(tmp_path / "nope"), "doc_id", "text"
        )

def test_reindex_changed_docs_equals_full_rebuild(spark, docs, tmp_path):
    """Change K documents' text, reindex_documents: searches must equal a
    rebuild over the UPDATED corpus exactly (eq-delete replaces the old
    posting lists; doclens + stats fold forward O(changed docs))."""
    from s3parq_spark.text_index import reindex_documents

    path = str(tmp_path / "idx")
    build_text_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    changed = docs.filter("doc_id < 20").withColumn(
        "text", F.concat(F.lit("vector vector hash "), F.col("text"))
    )
    reindex_documents(spark, changed, path, "doc_id", "text")
    updated = docs.filter("doc_id >= 20").unionByName(changed)
    for terms in (["hash", "vector"], ["model", "join", "data"]):
        got = _rows(search_text_index(spark, path, terms, k=10))
        exp = _rows(bm25_scores(updated, "doc_id", "text", terms, top_k=10))
        assert got == exp, terms
    # idempotent: replaying the same batch converges (keys replace)
    reindex_documents(spark, changed, path, "doc_id", "text")
    got = _rows(search_text_index(spark, path, ["hash", "vector"], k=10))
    exp = _rows(
        bm25_scores(updated, "doc_id", "text", ["hash", "vector"], top_k=10)
    )
    assert got == exp
    # ids never indexed before are new documents (stats grow)
    new = spark.createDataFrame(
        [(9001, "hash join vector"), (9002, "data model")],
        "doc_id long, text string",
    )
    reindex_documents(spark, new, path, "doc_id", "text")
    updated2 = updated.unionByName(new)
    got = _rows(search_text_index(spark, path, ["hash", "vector"], k=10))
    exp = _rows(
        bm25_scores(updated2, "doc_id", "text", ["hash", "vector"], top_k=10)
    )
    assert got == exp
    # compaction through the FAMILY op materializes the eq-deletes and
    # re-stamps the commit epoch; search unchanged after (r15: a RAW
    # compact_dataset on a member is an out-of-band mutation the stamp
    # flags — see test_raw_member_compaction_refuses_until_repaired)
    from s3parq_spark.text_index import compact_text_index

    compact_text_index(spark, path)
    got2 = _rows(search_text_index(spark, path, ["hash", "vector"], k=10))
    assert got2 == got


def test_legacy_max_df_index_refuses_incremental_writes(
    spark, docs, tmp_path
):
    """A PRE-r11 max_df build dropped stop terms' postings outright (no
    stopped sibling, no forward table) — incremental writes on such an
    index would re-introduce them with partial lists and inflated idf,
    so they refuse loudly (the r9/r10 contract, now scoped to legacy
    capped indexes). Simulated by deleting the forward table an r11
    build writes."""
    import shutil as _sh

    from s3parq_spark.text_index import (
        _fwd_path,
        append_to_text_index,
        reindex_documents,
        remove_documents,
    )

    path = str(tmp_path / "idx")
    build_text_index(
        spark, docs, path, "doc_id", "text", n_buckets=8, max_df=100
    )
    _sh.rmtree(_fwd_path(path))
    for op in (
        lambda: append_to_text_index(
            spark,
            spark.createDataFrame([(9001, "hash")],
                                  "doc_id long, text string"),
            path, "doc_id", "text",
        ),
        lambda: reindex_documents(spark, docs.limit(1), path,
                                  "doc_id", "text"),
        lambda: remove_documents(spark, [1], path, "doc_id"),
    ):
        with pytest.raises(ValueError, match="max_df"):
            op()
    # the cap is recorded in the stats row, not inferred
    from s3parq_spark.text_index import _read_stats

    assert _read_stats(spark, path)[2] == 100


def test_reserved_posting_column_names_rejected(spark, docs, tmp_path):
    """An id column named term/tf/dl/bucket would be ambiguous at build
    and mis-detected by search's id recovery (ADVICE r9) — reject."""
    path = str(tmp_path / "idx")
    for bad in ("term", "tf", "dl", "bucket"):
        with pytest.raises(ValueError, match="reserved posting"):
            build_text_index(
                spark, docs.withColumnRenamed("doc_id", bad), path, bad, "text"
            )
    with pytest.raises(ValueError, match="must be different"):
        build_text_index(spark, docs, path, "text", "text")


def test_reindex_rejects_duplicate_and_null_ids(spark, docs, tmp_path):
    from s3parq_spark.text_index import reindex_documents

    path = str(tmp_path / "idx")
    build_text_index(
        spark, docs.filter("doc_id < 50"), path, "doc_id", "text", n_buckets=8
    )
    dup = docs.filter("doc_id < 2").unionByName(docs.filter("doc_id < 1"))
    with pytest.raises(ValueError, match="unique"):
        reindex_documents(spark, dup, path, "doc_id", "text")
    nulled = docs.limit(1).withColumn("doc_id", F.lit(None).cast("long"))
    with pytest.raises(ValueError, match="unique"):
        reindex_documents(spark, nulled, path, "doc_id", "text")


def test_reindex_refuses_null_text_and_staged_index(spark, docs, tmp_path):
    """r10 review: (1) a NULL text tokenizes to nothing, so the doc would
    vanish from the eq-delete batch and its OLD postings would silently
    survive — refuse; (2) eq-delete commits refuse on a WAP-staged
    dataset (promote would re-version the staged rows ABOVE the
    key-delete and resurrect them)."""
    from s3parq_spark.publish import PendingAuditError, publish_path
    from s3parq_spark.text_index import reindex_documents

    path = str(tmp_path / "idx")
    build_text_index(
        spark, docs.filter("doc_id < 50"), path, "doc_id", "text",
        n_buckets=8,
    )
    nulled = docs.filter("doc_id < 2").withColumn(
        "text", F.lit(None).cast("string")
    )
    with pytest.raises(ValueError, match="non-NULL"):
        reindex_documents(spark, nulled, path, "doc_id", "text")
    # stage an (arbitrary) snapshot on the index dataset, then reindex
    idx_rows = spark.createDataFrame(
        [("zzstaged", 7777, 1, 1)], "term string, doc_id long, tf long, dl long"
    )
    publish_path(spark, path, idx_rows, [], mode="append", staged=True)
    with pytest.raises(PendingAuditError):
        reindex_documents(
            spark, docs.filter("doc_id < 2"), path, "doc_id", "text"
        )


def test_remove_documents_equals_rebuild_minus_removed(spark, docs, tmp_path):
    """remove_documents (r10): predicate tombstones on postings + doclens,
    stats fold down — search equals a rebuild over corpus minus the
    removed docs; idempotent; composes with reindex and compaction."""
    from s3parq_spark.text_index import reindex_documents, remove_documents

    path = str(tmp_path / "idx")
    build_text_index(spark, docs, path, "doc_id", "text", n_buckets=16)
    removed = [3, 7, 11, 9999]  # 9999 was never indexed: ignored
    n = remove_documents(spark, removed, path, "doc_id")
    assert n == 3
    remaining = docs.filter(~F.col("doc_id").isin(removed))
    for terms in (["hash", "vector"], ["model", "data", "join"]):
        got = _rows(search_text_index(spark, path, terms, k=10))
        exp = _rows(bm25_scores(remaining, "doc_id", "text", terms, top_k=10))
        assert got == exp, terms
    # idempotent: removing again converges (0 found)
    assert remove_documents(spark, [3, 7], path, "doc_id") == 0
    # removal composes with a later reindex of OTHER docs...
    changed = remaining.filter("doc_id < 5").withColumn(
        "text", F.concat(F.lit("vector hash "), F.col("text"))
    )
    reindex_documents(spark, changed, path, "doc_id", "text")
    updated = remaining.filter("doc_id >= 5").unionByName(changed)
    got = _rows(search_text_index(spark, path, ["hash", "vector"], k=10))
    exp = _rows(
        bm25_scores(updated, "doc_id", "text", ["hash", "vector"], top_k=10)
    )
    assert got == exp
    # ...and with the FAMILY compaction materializing the tombstones
    # across postings + doclens in one call (r15: raw member
    # compaction is an out-of-band mutation the commit stamp flags)
    from s3parq_spark.text_index import compact_text_index

    report = compact_text_index(spark, path)
    assert {"postings", "_doclens"} <= set(report)
    assert _rows(search_text_index(spark, path, ["hash", "vector"], k=10)) == got


def test_remove_documents_refuses_missing_doclens(spark, docs, tmp_path):
    from s3parq_spark.text_index import _doclens_path, remove_documents

    import shutil as _sh

    path2 = str(tmp_path / "idx2")
    build_text_index(spark, docs, path2, "doc_id", "text", n_buckets=8)
    _sh.rmtree(_doclens_path(path2))
    with pytest.raises(ValueError, match="doclens"):
        remove_documents(spark, [1], path2, "doc_id")


def test_remove_documents_escapes_string_ids(spark, tmp_path):
    """r10 review #2: Spark SQL string literals treat backslash AND quote
    as escapes — ids like r'a\\nb' (or ending in a bare backslash, or
    carrying quotes) must survive the stored tombstone predicate exactly,
    and re-running must be a true no-op (idempotent stats)."""
    from s3parq_spark.text_index import _read_stats, remove_documents

    rows = [
        ("a\\nb", "hash join"),          # literal backslash-n
        ("it's", "vector hash"),          # single quote
        ("tail\\", "join vector data"),  # trailing backslash
        ("plain", "hash vector model"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    path = str(tmp_path / "idx")
    build_text_index(spark, docs, path, "doc_id", "text", n_buckets=4)
    n = remove_documents(
        spark, ["a\\nb", "it's", "tail\\"], path, "doc_id"
    )
    assert n == 3
    remaining = docs.filter(F.col("doc_id") == "plain")
    got = _rows_str(search_text_index(spark, path, ["hash"], k=5))
    exp = _rows_str(bm25_scores(remaining, "doc_id", "text", ["hash"], top_k=5))
    assert got == exp
    # idempotent: the tombstone really matched — nothing left to find
    assert remove_documents(spark, ["a\\nb", "tail\\"], path, "doc_id") == 0
    assert _read_stats(spark, path)[0] == 1  # n_docs did not drift


def _rows_str(df):
    return [
        (r[0], r[1], round(r[2], 9)) for r in df.collect()
    ]


def test_remove_documents_refuses_staged_index(spark, docs, tmp_path):
    """r10 review #2: a staged snapshot's postings would promote ABOVE
    the removal tombstone and escape it while stats already folded down."""
    from s3parq_spark.publish import PendingAuditError, publish_path
    from s3parq_spark.text_index import remove_documents

    path = str(tmp_path / "idx")
    build_text_index(
        spark, docs.filter("doc_id < 30"), path, "doc_id", "text",
        n_buckets=4,
    )
    publish_path(
        spark, path,
        spark.createDataFrame(
            [("zz", 9001, 1, 1)], "term string, doc_id long, tf long, dl long"
        ),
        [], mode="append", staged=True,
    )
    with pytest.raises(PendingAuditError):
        remove_documents(spark, [1], path, "doc_id")


def test_repair_index_stats_recovers_crashed_fold(spark, docs, tmp_path):
    """r10 third review: a crash between a removal's tombstone commits
    and its stats write leaves the fold permanently stale (re-runs find
    nothing to fold) — repair_index_stats recomputes from doclens."""
    from s3parq_spark.text_index import (
        _read_stats,
        remove_documents,
        repair_index_stats,
    )

    path = str(tmp_path / "idx")
    build_text_index(spark, docs, path, "doc_id", "text", n_buckets=8)
    n0, t0, _ = _read_stats(spark, path)
    # simulate the crash window: tombstones land, stats write doesn't
    import s3parq_spark.text_index as ti

    orig = ti._write_stats
    ti._write_stats = lambda *a, **k: None
    try:
        assert remove_documents(spark, [1, 2, 3], path, "doc_id") == 3
    finally:
        ti._write_stats = orig
    stale = _read_stats(spark, path)
    assert stale[0] == n0  # the fold never landed
    # r15 fail-loud: the crashed fold is DETECTED — serve and
    # maintenance paths refuse (the stamps bind the pre-crash heads),
    # instead of silently scoring with stale constants or folding
    # forward from them
    from s3parq_spark.text_index import TextIndexEpochError

    with pytest.raises(TextIndexEpochError, match="repair_index_stats"):
        search_text_index(spark, path, ["hash"], k=3)
    with pytest.raises(TextIndexEpochError):
        remove_documents(spark, [1, 2, 3], path, "doc_id")
    # ...repair recomputes from ground truth (and re-stamps)
    n, t = repair_index_stats(spark, path)
    assert n == n0 - 3 and t < t0
    # the repaired family serves again, and the idempotent re-run now
    # converges (doclens rows already tombstoned: nothing to fold)
    assert remove_documents(spark, [1, 2, 3], path, "doc_id") == 0
    got = _rows(search_text_index(spark, path, ["hash", "vector"], k=10))
    exp = _rows(bm25_scores(
        docs.filter("doc_id not in (1,2,3)"), "doc_id", "text",
        ["hash", "vector"], top_k=10,
    ))
    assert got == exp


def test_max_df_maintenance_equals_rebuild(spark, tmp_path):
    """r10 verdict #2: a capped index is fully maintainable. Every
    lifecycle op below forces a cap crossing — append pushes a live term
    over (its list moves to the stopped sibling), reindex pulls a term
    back under (re-admission), removal drops a stop term under the cap —
    and after EVERY op, search over several query shapes (live terms,
    stop terms, mixed, new terms) must equal a fresh
    build_text_index(max_df=...) over the updated corpus, bit for bit.
    Stats rows must agree too."""
    import itertools

    from s3parq_spark.text_index import (
        _read_stats,
        append_to_text_index,
        reindex_documents,
        remove_documents,
    )

    MAXDF = 3
    path = str(tmp_path / "idx")
    ref_counter = itertools.count()

    corpus = {
        1: "alpha common fillerone",
        2: "alpha common fillertwo",
        3: "alpha common fillerthree",
        4: "stopper fillerfour",
        5: "stopper fillerfive",
        6: "stopper fillersix",
        7: "stopper fillerseven",
        8: "stopper fillereight",
    }

    def df_of(d):
        return spark.createDataFrame(
            sorted(d.items()), "doc_id long, text string"
        )

    QUERIES = (
        ["common"], ["stopper"], ["alpha", "common", "stopper"],
        ["newword"], ["burst", "fillerfive"], ["plainword", "alpha"],
    )

    def assert_equals_rebuild(tag):
        ref = str(tmp_path / f"ref{next(ref_counter)}")
        build_text_index(
            spark, df_of(corpus), ref, "doc_id", "text",
            n_buckets=4, max_df=MAXDF,
        )
        for q in QUERIES:
            got = _rows(search_text_index(spark, path, q, k=20))
            exp = _rows(search_text_index(spark, ref, q, k=20))
            assert got == exp, (tag, q, got, exp)
        assert _read_stats(spark, path) == _read_stats(spark, ref), tag

    build_text_index(
        spark, df_of(corpus), path, "doc_id", "text",
        n_buckets=4, max_df=MAXDF,
    )
    assert_equals_rebuild("build")
    # 'stopper' (df 5 > 3) contributes nothing; 'common' (df 3) does
    assert _rows(search_text_index(spark, path, ["stopper"], k=5)) == []
    assert len(_rows(search_text_index(spark, path, ["common"], k=5))) == 3

    # APPEND: 'common' crosses UP (3 -> 4); 'burst' lands over-cap in
    # one batch (df 4 > 3, straight to stopped); 'newword' stays live
    wave = {
        9: "common newword",
        10: "burst", 11: "burst", 12: "burst", 13: "burst",
    }
    append_to_text_index(spark, df_of(wave), path, "doc_id", "text")
    corpus.update(wave)
    assert_equals_rebuild("append")
    assert _rows(search_text_index(spark, path, ["common"], k=5)) == []

    # REINDEX: doc 9 loses 'common' (4 -> 3: re-admission DOWN), doc 4
    # swaps 'stopper' for 'plainword' (5 -> 4: stays stopped)
    changed = {9: "newword plainword", 4: "plainword fillerfour"}
    reindex_documents(spark, df_of(changed), path, "doc_id", "text")
    corpus.update(changed)
    assert_equals_rebuild("reindex")
    assert len(_rows(search_text_index(spark, path, ["common"], k=5))) == 3

    # re-running the same reindex converges (key-deletes replace)
    reindex_documents(spark, df_of(changed), path, "doc_id", "text")
    assert_equals_rebuild("reindex-idempotent")

    # REMOVE: docs 5,6 drop 'stopper' (4 -> 2: re-admission via DELETE);
    # 'burst' drops to 3 (re-admission too)
    assert remove_documents(spark, [5, 6, 10], path, "doc_id") == 3
    for k in (5, 6, 10):
        corpus.pop(k)
    assert_equals_rebuild("remove")
    assert len(_rows(search_text_index(spark, path, ["stopper"], k=5))) == 2
    assert remove_documents(spark, [5, 6, 10], path, "doc_id") == 0


def test_max_df_lifecycle_statemachine(spark, tmp_path):
    """Randomized composition pinning: a deterministic pseudo-random
    schedule of append/reindex/remove batches over a small vocabulary
    engineered so terms cross the cap repeatedly IN BOTH DIRECTIONS
    (including a term re-crossing back), checked after every step
    against the model — build_text_index(max_df) over the tracked
    corpus. Catches composition bugs the single-pass equivalence test
    can't (a move that leaves a stale row breaks some LATER step's df
    accounting, not its own)."""
    import random

    from s3parq_spark.text_index import (
        _read_stats,
        append_to_text_index,
        reindex_documents,
        remove_documents,
    )

    rng = random.Random(11)
    MAXDF = 4
    VOCAB = ["hot", "warm", "cold", "rare"]
    path = str(tmp_path / "idx")
    corpus = {}
    next_id = 0

    def text_for(i):
        # each doc draws 2 vocabulary terms + a unique term: vocabulary
        # dfs swing around the cap as docs come and go
        a = VOCAB[i % 4]
        b = VOCAB[(i // 2) % 4]
        return f"{a} {b} unique{i}"

    def df_of(d):
        return spark.createDataFrame(
            sorted(d.items()), "doc_id long, text string"
        )

    def check(tag):
        ref = str(tmp_path / f"ref_{tag}")
        build_text_index(
            spark, df_of(corpus), ref, "doc_id", "text",
            n_buckets=4, max_df=MAXDF,
        )
        for q in (["hot"], ["warm", "cold"], ["rare", "hot"]):
            got = _rows(search_text_index(spark, path, q, k=30))
            exp = _rows(search_text_index(spark, ref, q, k=30))
            assert got == exp, (tag, q, got, exp)
        assert _read_stats(spark, path) == _read_stats(spark, ref), tag

    # seed corpus: everything under the cap
    for _ in range(6):
        corpus[next_id] = text_for(next_id)
        next_id += 1
    build_text_index(
        spark, df_of(corpus), path, "doc_id", "text",
        n_buckets=4, max_df=MAXDF,
    )
    check("seed")

    for step in range(6):
        op = rng.choice(["append", "append", "reindex", "remove"])
        if step == 3:
            # mid-schedule family compaction (r12): the maintenance
            # rewrite must be INVISIBLE to every later step's df
            # accounting and cap-crossing moves — materialized MoR debt,
            # fresh histories, same search and stats
            from s3parq_spark.text_index import compact_text_index

            compact_text_index(spark, path)
            check("midcompact")
        if op == "append":
            wave = {}
            for _ in range(rng.randint(2, 4)):
                wave[next_id] = text_for(next_id)
                next_id += 1
            append_to_text_index(spark, df_of(wave), path, "doc_id", "text")
            corpus.update(wave)
        elif op == "reindex" and corpus:
            ids = rng.sample(sorted(corpus), min(3, len(corpus)))
            wave = {
                i: text_for(i + rng.randint(1, 7) * 4) + f" unique{i}"
                for i in ids
            }
            reindex_documents(spark, df_of(wave), path, "doc_id", "text")
            corpus.update(wave)
        elif op == "remove" and len(corpus) > 3:
            ids = rng.sample(sorted(corpus), rng.randint(1, 3))
            n = remove_documents(spark, ids, path, "doc_id")
            assert n == len(ids)
            for i in ids:
                corpus.pop(i)
        check(f"step{step}:{op}")


def test_compact_text_index_clears_debt_search_unchanged(spark, tmp_path):
    """compact_text_index: one call materializes the whole family's
    merge-on-read debt (postings + doclens + the capped siblings),
    preserving each dataset's recorded layout — search and stats
    bit-identical before/after, pending tombstones/eq-deletes zero."""
    from s3parq_spark.text_index import (
        _doclens_path,
        _fwd_path,
        _read_stats,
        _stopped_path,
        compact_text_index,
        reindex_documents,
        remove_documents,
    )

    MAXDF = 3
    path = str(tmp_path / "idx")
    corpus = {i: f"{'hot' if i % 2 else 'cold'} word{i}" for i in range(10)}

    def df_of(d):
        return spark.createDataFrame(
            sorted(d.items()), "doc_id long, text string"
        )

    build_text_index(spark, df_of(corpus), path, "doc_id", "text",
                     n_buckets=4, max_df=MAXDF)
    # accumulate debt on every member: reindex (eq-deletes on postings /
    # fwd, tombstones via the capped path) + removal (tombstones)
    changed = {1: "hot moved", 3: "cold moved"}
    reindex_documents(spark, df_of(changed), path, "doc_id", "text")
    corpus.update(changed)
    remove_documents(spark, [4, 6], path, "doc_id")
    corpus.pop(4), corpus.pop(6)

    queries = (["hot"], ["cold", "word1"], ["moved"])
    before = [
        _rows(search_text_index(spark, path, q, k=20)) for q in queries
    ]
    stats_before = _read_stats(spark, path)
    report = compact_text_index(spark, path)
    assert set(report) >= {"postings", "_doclens", "_fwd"}, report
    for q, exp in zip(queries, before):
        assert _rows(search_text_index(spark, path, q, k=20)) == exp, q
    assert _read_stats(spark, path) == stats_before
    for p in (path, _doclens_path(path), _fwd_path(path)):
        m = metadata.read_sidecar(spark, p)
        assert m is not None and not m.has_tombstones(), p
    sm = metadata.read_sidecar(spark, _stopped_path(path))
    assert sm is None or not sm.has_tombstones()
    # layout preserved: search on a LIVE term still prunes at the bucket
    # partition ('hot' is over-cap here — its search is an empty frame
    # by design, which has no scan to assert on)
    plan = search_text_index(spark, path, ["word2"], k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_stream_index_documents_ingests_and_replays_safely(
    spark, tmp_path
):
    """Streaming ingestion into the index: wave 1 bootstraps, wave 2
    updates + inserts through reindex; search equals a rebuild over the
    final corpus. Crash replay (deleted commits marker, the
    stream_upsert test's simulation) re-delivers the batch — reindex's
    key-deletes make it converge: identical search, identical stats."""
    import glob
    import os
    import shutil

    from s3parq_spark.streaming import stream_index_documents
    from s3parq_spark.text_index import _read_stats

    src = str(tmp_path / "landing")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def land(rows, name):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        scratch = str(tmp_path / f"scratch_{name}")
        df.coalesce(1).write.parquet(scratch)
        for i, p in enumerate(
            sorted(glob.glob(f"{scratch}/part-*.parquet"))
        ):
            shutil.move(p, f"{src}/{name}-{i}.parquet")

    w1 = [(i, f"alpha doc{i}") for i in range(8)]
    land(w1, "w1")
    stream_index_documents(spark, src, idx, "doc_id", "text",
                           checkpoint_location=ckpt, n_buckets=4)
    # wave 2: docs 2,5 change, 8..9 are new
    w2 = [(2, "beta changed"), (5, "beta changed"),
          (8, "alpha doc8new"), (9, "beta doc9new")]
    land(w2, "w2")
    stream_index_documents(spark, src, idx, "doc_id", "text",
                           checkpoint_location=ckpt, n_buckets=4)

    final = dict(w1)
    final.update(dict(w2))
    ref = str(tmp_path / "ref")
    build_text_index(
        spark,
        spark.createDataFrame(sorted(final.items()),
                              "doc_id long, text string"),
        ref, "doc_id", "text", n_buckets=4,
    )
    queries = (["alpha"], ["beta"], ["doc8new", "alpha"])
    for q in queries:
        assert _rows(search_text_index(spark, idx, q, k=20)) == \
            _rows(search_text_index(spark, ref, q, k=20)), q
    assert _read_stats(spark, idx) == _read_stats(spark, ref)
    # crash replay: drop the newest checkpoint completion marker and
    # re-run — the batch re-delivers, the reindex replays, results and
    # stats converge (histories may carry the duplicate commit)
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
    stream_index_documents(spark, src, idx, "doc_id", "text",
                           checkpoint_location=ckpt, n_buckets=4)
    assert os.path.exists(victim), "batch was not re-delivered"
    for q in queries:
        assert _rows(search_text_index(spark, idx, q, k=20)) == \
            _rows(search_text_index(spark, ref, q, k=20)), q
    assert _read_stats(spark, idx) == _read_stats(spark, ref)


def test_batch_search_equals_per_query_search(spark, docs, index):
    """search_text_index_batch: ONE pruned pass over the union of all
    queries' terms must reproduce each per-query search bit-for-bit —
    including shared terms (fetched once, same global df either way),
    absent terms, and per-query k cuts. The batch fetch must still
    prune: scanned files ⊂ the union terms' buckets."""
    from s3parq_spark.text_index import search_text_index_batch

    queries = {
        "q1": ["hash", "join", "vector"],
        "q2": ["the"],
        "q3": ["model", "data", "hash"],       # shares 'hash' with q1
        "q4": ["zzqqxx_notaterm"],             # absent: no rows at all
    }
    got = search_text_index_batch(spark, index, queries, k=10)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["n_terms"], round(r["score"], 9))
        )
    for qid, terms in queries.items():
        exp = _rows(search_text_index(spark, index, terms, k=10))
        assert by_q.get(qid, []) == exp, qid
    # pruning: the one scan reads only the union terms' buckets
    all_terms = sorted({t for ts in queries.values() for t in ts})
    m = metadata.read_sidecar(spark, index)
    want = {f"bucket={_bucket(t, 16)}/" for t in all_terms}
    scanned = [f for f in got.inputFiles() if "_stats" not in f]
    assert scanned and len(scanned) < len(m.manifest_files())
    for f in scanned:
        assert any(b in f for b in want), f


def test_require_all_and_info(spark, docs, index):
    """Conjunctive retrieval: require_all keeps exactly the docs whose
    n_terms equals the distinct query-term count, with their disjunctive
    scores untouched; the batch variant applies each query's own bar.
    text_index_info reports corpus stats, layout, and per-member MoR
    debt without reading data."""
    from s3parq_spark.text_index import (
        search_text_index_batch,
        text_index_info,
    )

    terms = ["hash", "join"]
    dis = _rows(search_text_index(spark, index, terms, k=500))
    con = _rows(search_text_index(spark, index, terms, k=500,
                                  require_all=True))
    exp = [r for r in dis if r[1] == 2]
    assert con == exp and 0 < len(con) < len(dis)
    # batch: per-query bars — q_and needs both, q_one needs its single
    got = search_text_index_batch(
        spark, index, {"q_and": terms, "q_one": ["hash"]},
        k=500, require_all=True,
    )
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["n_terms"], round(r["score"], 9))
        )
    assert by_q["q_and"] == exp
    assert by_q["q_one"] == _rows(
        search_text_index(spark, index, ["hash"], k=500)
    )
    info = text_index_info(spark, index)
    assert info["n_docs"] > 0 and info["avgdl"] > 0
    assert info["max_df"] is None and info["n_buckets"] == 16
    assert info["id_col"] == "doc_id"
    assert info["members"]["postings"]["n_files"] > 0
    assert info["members"]["doclens"]["pending_mor_commits"] == 0
    assert "stopped" not in info["members"]


def test_info_capped_counts_and_debt(spark, tmp_path):
    from s3parq_spark.text_index import (
        remove_documents,
        text_index_info,
    )

    path = str(tmp_path / "idx")
    rows = [(i, "stop stop unique%d" % i) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    build_text_index(spark, docs, path, "doc_id", "text",
                     n_buckets=4, max_df=5)
    remove_documents(spark, [3], path, "doc_id")
    info = text_index_info(spark, path, count_stopped_terms=True)
    assert info["max_df"] == 5 and info["n_buckets"] == 4
    assert info["n_stopped_terms"] == 1  # 'stop'
    assert info["members"]["postings"]["pending_mor_commits"] >= 1
    assert set(info["members"]) == {"postings", "doclens",
                                    "stopped", "fwd"}


def test_repair_capped_index_fixes_double_residency(spark, tmp_path):
    """A crashed cap-crossing move leaves a term's posting list on BOTH
    sides (copy landed, tombstone didn't) — search then double-counts or
    partially serves it. repair_capped_index must detect exactly the
    double-resident terms (bounded by stop-term cardinality), rebuild
    each from the deduplicated union, route by true df, and restore
    search ≡ rebuild. Idempotent: a clean index repairs to {}."""
    from s3parq_spark.publish import publish_path
    from s3parq_spark.text_index import repair_capped_index

    MAXDF = 3
    path = str(tmp_path / "idx")
    corpus = {i: f"{'stopper' if i < 5 else 'live'} word{i}"
              for i in range(8)}
    docs = spark.createDataFrame(
        sorted(corpus.items()), "doc_id long, text string"
    )
    build_text_index(spark, docs, path, "doc_id", "text",
                     n_buckets=4, max_df=MAXDF)
    assert repair_capped_index(spark, path) == {}  # clean: no-op
    # simulate the crash: copy 'stopper' rows into live WITHOUT removing
    # them from stopped (a crashed DOWN-move's on-disk state)
    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.text_index import _stopped_path

    stray = fetch_path(
        spark, _stopped_path(path),
        filters=[{"partition": "term", "comparison": "==",
                  "values": ["stopper"]}],
    ).select("term", "doc_id", "tf", "dl")
    publish_path(spark, path, stray, [], mode="append")
    # r15 fail-loud: the out-of-band append moved the postings head,
    # so search REFUSES (it would otherwise wrongly serve 'stopper')
    from s3parq_spark.text_index import TextIndexEpochError

    with pytest.raises(TextIndexEpochError, match="repair_capped_index"):
        search_text_index(spark, path, ["stopper"], k=10)
    fixed = repair_capped_index(spark, path)
    assert fixed == {"stopper": "stopped"}, fixed
    # residency repaired; the stats repair re-stamps the family
    from s3parq_spark.text_index import repair_index_stats

    repair_index_stats(spark, path)
    # search ≡ rebuild again, live terms untouched
    ref = str(tmp_path / "ref")
    build_text_index(spark, docs, ref, "doc_id", "text",
                     n_buckets=4, max_df=MAXDF)
    for q in (["stopper"], ["live"], ["word2", "stopper"]):
        assert _rows(search_text_index(spark, path, q, k=10)) == \
            _rows(search_text_index(spark, ref, q, k=10)), q
    assert repair_capped_index(spark, path) == {}
    # and maintenance still composes after the repair (the invariant is
    # restored, not just the visible results)
    from s3parq_spark.text_index import remove_documents

    assert remove_documents(spark, [0, 1], path, "doc_id") == 2
    for k_ in (0, 1):
        corpus.pop(k_)
    ref2 = str(tmp_path / "ref2")
    build_text_index(
        spark,
        spark.createDataFrame(sorted(corpus.items()),
                              "doc_id long, text string"),
        ref2, "doc_id", "text", n_buckets=4, max_df=MAXDF,
    )
    for q in (["stopper"], ["live"]):
        assert _rows(search_text_index(spark, path, q, k=10)) == \
            _rows(search_text_index(spark, ref2, q, k=10)), q


def test_stream_index_documents_recovers_partial_bootstrap(spark, tmp_path):
    """ADVICE r11: build_text_index commits postings → doclens → stats;
    a crash mid-bootstrap leaves the postings sidecar present with
    doclens/stats missing. The replayed first batch used to route to
    reindex_documents (which needs both) and wedge the stream — the
    sink now detects the partial state and re-runs the overwrite build,
    converging."""
    import glob
    import os
    import shutil

    from s3parq_spark.streaming import stream_index_documents
    from s3parq_spark.text_index import _read_stats

    src = str(tmp_path / "landing")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    rows = [(i, f"alpha doc{i}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scratch = str(tmp_path / "scratch")
    df.coalesce(1).write.parquet(scratch)
    for i, p in enumerate(sorted(glob.glob(f"{scratch}/part-*.parquet"))):
        shutil.move(p, f"{src}/w1-{i}.parquet")
    stream_index_documents(spark, src, idx, "doc_id", "text",
                           checkpoint_location=ckpt, n_buckets=4)
    # crash simulation: postings committed, doclens/stats never did, and
    # the checkpoint completion marker never landed
    shutil.rmtree(idx + "_doclens")
    shutil.rmtree(idx + "_stats")
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
    # the replay must NOT wedge (the old behavior: reindex_documents
    # IndexError on the missing stats row) — it re-runs the build
    stream_index_documents(spark, src, idx, "doc_id", "text",
                           checkpoint_location=ckpt, n_buckets=4)
    ref = str(tmp_path / "ref")
    build_text_index(spark, df, ref, "doc_id", "text", n_buckets=4)
    assert _rows(search_text_index(spark, idx, ["alpha"], k=20)) == \
        _rows(search_text_index(spark, ref, ["alpha"], k=20))
    assert _read_stats(spark, idx) == _read_stats(spark, ref)


def test_bucket_transform_jvm_driver_parity(spark):
    """The maintenance plane hands publish the exact hive dirs a batch
    touches, computed DRIVER-side from the same md5 fold the recorded
    bucket transform runs on the JVM (_bucket_of) — wrong parity would
    scope the commit's new-file listing to the wrong dirs and silently
    drop files from the snapshot, so it is pinned here over ASCII,
    unicode, punctuation, and the empty token."""
    from s3parq_spark.text_index import _BUCKET_EXPR, _bucket_of

    terms = [
        "hash", "the", "", "a" * 100, "naïve", "日本語", "emoji🙂",
        "tab\tchar", "percent%sign", "eq=sign", "slash/term",
    ]
    for n in (4, 16, 64, 1000):
        df = spark.createDataFrame([(t,) for t in terms], "term string")
        got = {
            r["term"]: r["b"]
            for r in df.withColumn(
                "b", F.expr(_BUCKET_EXPR.format(n=n))
            ).collect()
        }
        for t in terms:
            assert got[t] == _bucket_of(t, n), (t, n)


def test_write_hints_commit_parity(spark, tmp_path):
    """A publish carrying _write_hints (caller-known touched dirs +
    sizing) must commit exactly the same snapshot shape as the unhinted
    publish: same added-file dirs, same readable rows."""
    from s3parq_spark.publish import publish_path
    from s3parq_spark.fetch import fetch_path

    rows = [(i, i % 4, f"v{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, k int, v string")
    plain = str(tmp_path / "plain")
    hinted = str(tmp_path / "hinted")
    for p in (plain, hinted):
        publish_path(spark, p, df, ["k"])
    batch = spark.createDataFrame(
        [(100, 1, "new"), (101, 3, "new")], "id long, k int, v string"
    )
    new_plain = publish_path(spark, plain, batch, ["k"], mode="append")
    new_hinted = publish_path(
        spark, hinted, batch, ["k"], mode="append",
        _write_hints={"rows_per_file": 1000,
                      "touched_dirs": ["k=1", "k=3"]},
    )
    assert sorted({f.rsplit("/", 1)[0].split("/")[-1] for f in new_plain}) \
        == sorted({f.rsplit("/", 1)[0].split("/")[-1] for f in new_hinted}) \
        == ["k=1", "k=3"]
    a = sorted(fetch_path(spark, plain).collect())
    b = sorted(fetch_path(spark, hinted).collect())
    assert a == b and len(a) == 42
    # an OVER-inclusive dir hint is harmless (extra dirs list empty)
    publish_path(
        spark, hinted,
        spark.createDataFrame([(102, 2, "x")], "id long, k int, v string"),
        ["k"], mode="append",
        _write_hints={"rows_per_file": 1000,
                      "touched_dirs": ["k=0", "k=2"]},
    )
    assert fetch_path(spark, hinted).count() == 43


def test_tokenize_single_exchange_and_reference_equivalence(spark, docs):
    """r15 optimization: _tokenize computes dl (the doc's token count)
    BEFORE the explode and carries it through the tf grouping, so the
    postings pipeline runs in ONE exchange — the dl-aggregate exchange
    and the tf⨝dl join of the reference formulation are gone. Pins (a)
    exact output equivalence against the reference 2-agg+join shape
    (real corpus + whitespace/empty-text/NULL-text edges) and (b) the
    single-Exchange plan."""
    from s3parq_spark.text_index import _tokenize

    def reference(d, id_col, text_col):
        toks = d.select(
            F.col(id_col),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("term"),
        )
        tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
        dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
        return tf.join(dl, id_col).select("term", id_col, "tf", "dl"), dl

    edge = spark.createDataFrame(
        [(1, ""), (2, "  a  b\tb\nc "), (3, "x"), (4, "A A a"),
         (5, None)],
        "doc_id long, text string",
    )
    for frame in (docs, edge):
        po, dlo = reference(frame, "doc_id", "text")
        pn, dln = _tokenize(frame, "doc_id", "text")
        assert po.schema == pn.schema and dlo.schema == dln.schema
        assert po.exceptAll(pn).count() == 0
        assert pn.exceptAll(po).count() == 0
        assert dlo.exceptAll(dln).count() == 0
        assert dln.exceptAll(dlo).count() == 0

    pn, _ = _tokenize(docs, "doc_id", "text")
    plan = pn._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_capped_driver_routing_equals_window_fallback(
    spark, docs, tmp_path, monkeypatch
):
    """r16 (guide §2.4): the capped build routes postings live/stopped
    by a driver-held over-cap term set instead of re-shuffling every
    posting through a term-window tag. Both routings must produce
    byte-identical live and stopped datasets and identical search
    results; the degenerate-cap fallback (over-cap set too large to
    collect) is the r15 window path, forced here via the threshold."""
    import s3parq_spark.text_index as ti
    from s3parq_spark.text_index import _stopped_path
    from s3parq_spark.fetch import fetch_path

    n_docs = docs.count()
    cap = n_docs // 2

    p_driver = str(tmp_path / "idx_driver")
    build_text_index(spark, docs, p_driver, "doc_id", "text",
                     n_buckets=16, max_df=cap)

    p_window = str(tmp_path / "idx_window")
    monkeypatch.setattr(ti, "_STOP_TERMS_DRIVER_MAX", 0)
    build_text_index(spark, docs, p_window, "doc_id", "text",
                     n_buckets=16, max_df=cap)
    monkeypatch.undo()

    def rows(path):
        return sorted(
            (r["term"], r["doc_id"], r["tf"], r["dl"])
            for r in fetch_path(spark, path).collect()
        )

    live_d, live_w = rows(p_driver), rows(p_window)
    assert live_d == live_w and live_d
    stop_d, stop_w = rows(_stopped_path(p_driver)), rows(_stopped_path(p_window))
    assert stop_d == stop_w and stop_d  # the corpus has over-cap terms

    for terms in (["hash", "join", "vector"], ["the"], ["model", "data"]):
        got_d = _rows(search_text_index(spark, p_driver, terms, k=10))
        got_w = _rows(search_text_index(spark, p_window, terms, k=10))
        assert got_d == got_w, terms


def test_capped_build_no_undercap_terms_raises_and_unpersists(
    spark, tmp_path
):
    """The no-under-cap refusal survives the r16 routing change, and the
    persisted tokenize frames are released even on the error path
    (ADVICE r15: the old shape leaked the cached tagged frame)."""
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb"), (3, "aa bb")], "doc_id long, text string"
    )
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    with pytest.raises(ValueError, match="no under-cap"):
        build_text_index(spark, docs, str(tmp_path / "idx"),
                         "doc_id", "text", n_buckets=4, max_df=1)
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after <= before
