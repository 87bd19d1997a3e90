"""Web-corpus domain curation operators (operators/domains.py — extends
the dedup family with the RefinedWeb/C4 per-domain axis; no reference
analog, the reference has no URL surface)."""

import pytest
from pyspark.sql import functions as F

from s3parq_spark.operators import (
    domain_cap,
    domain_filter,
    registrable_domain,
)


@pytest.fixture()
def urls(spark):
    rows = [
        (0, "https://news.example.co.uk/article/1"),
        (1, "http://blog.sample.com/post?id=1"),
        (2, "https://www.Sample.COM/about"),
        (3, "https://sub.deep.site.com.au/p/9"),
        (4, "http://192.168.10.1/raw/4"),
        (5, "https://archive.org/item/5"),
        (6, "https://host.example.co.uk./dot-final"),
        (7, "not a url"),
        (8, None),
        (9, "https://localhost:8080/dev"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "url"])


def test_registrable_domain_extraction(spark, urls):
    got = {
        r["doc_id"]: r["d"]
        for r in urls.select(
            "doc_id", registrable_domain(F.col("url")).alias("d")
        ).collect()
    }
    assert got[0] == "example.co.uk"          # multi-part public suffix
    assert got[1] == "sample.com"             # subdomain stripped
    assert got[2] == "sample.com"             # case-folded, www stripped
    assert got[3] == "site.com.au"            # deep subdomain, com.au
    assert got[4] == "192.168.10.1"           # IPv4 passes whole
    assert got[5] == "archive.org"            # bare registrable
    assert got[6] == "example.co.uk"          # trailing dot stripped
    assert got[7] is None                     # unparseable -> NULL
    assert got[8] is None
    assert got[9] == "localhost"              # single label passes whole


def test_extra_suffixes_extend_the_shortlist(spark, urls):
    one = urls.filter("doc_id = 5").select(
        registrable_domain(
            F.col("url"), extra_suffixes=["archive.org"]
        ).alias("d")
    )
    # with archive.org declared a public suffix, a bare archive.org host
    # has no registrable label below it -> last-2 fallback keeps the host
    assert one.collect()[0]["d"] == "archive.org"
    deep = spark.createDataFrame(
        [("https://user.archive.org/x",)], ["url"]
    ).select(
        registrable_domain(F.col("url"), extra_suffixes=["archive.org"]).alias("d")
    )
    assert deep.collect()[0]["d"] == "user.archive.org"


def test_domain_cap_is_deterministic_and_bounded(spark):
    rows = [(i, f"https://h{i % 3}.example.com/x/{i}") for i in range(60)]
    rows += [(100 + i, f"https://solo{i}.org/y") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    capped = domain_cap(df, "url", 4, "doc_id")
    # example.com is ONE registrable domain across the h0/h1/h2 hosts
    assert capped.count() == 4 + 5
    again = domain_cap(df, "url", 4, "doc_id")
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # schema passes through untouched
    assert capped.columns == df.columns


def test_domain_cap_narrow_window_plan(spark, tmp_path):
    """The window exchange must carry the narrow (key, domain) projection,
    not the payload: the payload returns via the key-partitioned semi-join.
    Asserted on the winner side's parquet ReadSchema — column pruning must
    drop the text column there."""
    rows = [(i, f"https://d{i % 4}.net/{i}", "PAYLOAD" * 10) for i in range(40)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, ["doc_id", "url", "text"]).write.parquet(src)
    df = spark.read.parquet(src)
    plan = (
        domain_cap(df, "url", 2, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    # payload side reads text once; winner branches (window + NULL
    # passthrough) stay narrow
    assert sum("text" in s for s in schemas) == 1, (
        "payload column leaked into the winner side of the cap"
    )
    assert "Window" in plan and ("LeftSemi" in plan or "left_semi" in plan)


def test_domain_filter_list_and_frame(spark, urls):
    kept = domain_filter(urls, "url", ["sample.com", "192.168.10.1"])
    ids = sorted(r["doc_id"] for r in kept.collect())
    # 1, 2 (sample.com) and 4 (the IP) dropped; NULL-domain rows KEPT
    # (a blocklist drops known-bad domains, not unparseable rows)
    assert ids == [0, 3, 5, 6, 7, 8, 9]
    allow = domain_filter(urls, "url", ["example.co.uk"], keep=True)
    assert sorted(r["doc_id"] for r in allow.collect()) == [0, 6]
    bl = spark.createDataFrame([("SAMPLE.com",)], ["domain"])
    kept2 = domain_filter(urls, "url", bl)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [0, 3, 4, 5, 6, 7, 8, 9]


def test_domain_filter_frame_broadcasts(spark, urls):
    bl = spark.createDataFrame([("sample.com",)], ["domain"])
    plan = (
        domain_filter(urls, "url", bl)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "LeftAnti" in plan


def test_canonicalize_url(spark):
    from s3parq_spark.operators import canonicalize_url

    rows = [
        # case, default port, trailing slash, fragment, tracking params,
        # param order -> all collapse to one canonical form
        (0, "HTTPS://Example.COM:443/a/b/?utm_source=x&z=1&a=2#frag"),
        (1, "https://example.com/a/b?a=2&z=1"),
        (2, "https://example.com./a/b/?z=1&a=2&gclid=abc"),
        # different resource stays different
        (3, "https://example.com/a/b?z=2&a=2"),
        # non-default port survives
        (4, "https://example.com:8443/a/b"),
        # empty path normalizes to /
        (5, "http://example.com:80"),
        (6, "http://example.com/"),
        # garbage -> NULL, never a shared dedup key
        (7, "not a url"),
    ]
    got = {
        r["doc_id"]: r["c"]
        for r in spark.createDataFrame(rows, ["doc_id", "url"])
        .select("doc_id", canonicalize_url(F.col("url")).alias("c"))
        .collect()
    }
    assert got[0] == got[1] == got[2] == "https://example.com/a/b?a=2&z=1"
    assert got[3] == "https://example.com/a/b?a=2&z=2"
    assert got[4] == "https://example.com:8443/a/b"
    assert got[5] == got[6] == "http://example.com/"
    assert got[7] is None


def test_domain_cap_null_domains_pass_through(spark):
    from s3parq_spark.operators import domain_cap

    rows = [(i, f"https://hot.example.com/{i}") for i in range(20)]
    rows += [(100 + i, "not a url") for i in range(15)]
    rows += [(200, None)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    capped = domain_cap(df, "url", 5, "doc_id")
    # 5 example.com winners; ALL 16 NULL-domain rows kept (garbage URLs
    # are not a domain and never compete for a quota)
    assert capped.count() == 5 + 16
    assert capped.filter("doc_id >= 100").count() == 16


def test_domain_stats(spark):
    from s3parq_spark.operators import domain_stats

    rows = [(i, "https://big.example.com/x", 100) for i in range(6)]
    rows += [(10 + i, "https://small.org/y", 50) for i in range(3)]
    rows += [(20, "garbage", 10)]
    df = spark.createDataFrame(rows, ["doc_id", "url", "n_chars"])
    got = {
        r["domain"]: r
        for r in domain_stats(df, "url", size_col="n_chars").collect()
    }
    assert got["example.com"]["n_docs"] == 6
    assert abs(got["example.com"]["doc_share"] - 0.6) < 1e-9
    assert got["example.com"]["total_size"] == 600.0
    assert got["small.org"]["n_docs"] == 3
    # garbage URLs surface as a visible NULL-domain row
    assert got[None]["n_docs"] == 1
    assert abs(sum(r["doc_share"] for r in got.values()) - 1.0) < 1e-9
    assert abs(sum(r["size_share"] for r in got.values()) - 1.0) < 1e-9
    # without size_col, no size columns
    slim = domain_stats(df, "url")
    assert set(slim.columns) == {"domain", "n_docs", "doc_share"}


def test_domain_stats_plan_is_agg_plus_broadcast(spark):
    from s3parq_spark.operators import domain_stats

    df = spark.createDataFrame(
        [(i, f"https://d{i % 3}.net/{i}") for i in range(30)],
        ["doc_id", "url"],
    )
    plan = (
        domain_stats(df, "url")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan and "Window" not in plan

def test_domain_cap_rejects_null_keys(spark):
    """r7 ADVICE: a NULL key_col row used to vanish silently at the
    winners semi-join (NULL == NULL never matches); now the plan raises."""
    from s3parq_spark.operators import domain_cap

    rows = [(1, "https://a.example.com/1"), (None, "https://a.example.com/2")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    with pytest.raises(Exception, match="must be non-null"):
        domain_cap(df, "url", 5, "doc_id").count()


def test_domain_cap_rejects_duplicate_keys(spark):
    """r7 ADVICE: a duplicated key let every copy of one winner through the
    cap; validate_keys (default) raises, and validate_keys=False documents
    the caller-asserted-unique fast path."""
    from s3parq_spark.operators import domain_cap

    rows = [(7, f"https://hot.example.com/{i}") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    with pytest.raises(Exception, match="must be\\s+unique|must be unique"):
        domain_cap(df, "url", 2, "doc_id").count()
    # caller-asserted-unique path keeps the old (unchecked) plan shape
    uniq = spark.createDataFrame(
        [(i, f"https://hot.example.com/{i}") for i in range(6)],
        ["doc_id", "url"],
    )
    assert domain_cap(uniq, "url", 2, "doc_id", validate_keys=False).count() == 2
