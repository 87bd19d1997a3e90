"""Web-corpus domain curation: registrable-domain extraction, per-domain
document caps, and domain blocklists.

At web-corpus scale the DOMAIN is a first-class dedup/quality axis:
RefinedWeb (Penedo et al., 2023, §3) and C4 both cap or drop whole
registrable domains because a handful of hosts (mirrors, SEO farms, link
aggregators) contribute a grossly disproportionate share of low-quality
mass — a per-domain cap removes more of it than any document-level
classifier. The reference engine has no URL surface at all; this extends
the dedup family (``operators/dedup.py``) with the domain axis.

Everything here is JVM expressions (``parse_url``, ``split``, ``slice``,
one window over a NARROW projection) — no Python in the hot path:

- **Extraction** is pure whole-stage-codegen: host from ``parse_url``,
  registrable domain from the trailing labels with a public-suffix
  shortlist (the common multi-part suffixes of the Public Suffix List —
  ``co.uk``, ``com.au``, ... — a deliberate shortlist, not the full PSL:
  the tail of the PSL is private-registry entries that alter grouping for
  a negligible fraction of web text; swap in the full list as an
  ``extra_suffixes`` argument when that fraction matters).
- **Capping** never shuffles the payload by domain: domains are Zipfian
  (one hot domain would pin a whole text corpus partition to one task),
  so the winners are chosen on a (key, domain) projection — the skewed
  exchange carries ~16 bytes/row — and the payload joins back by its
  uniform key. At 100 TB the payload moves once, hash-partitioned on the
  key, never on the skewed domain.
"""

from __future__ import annotations

from typing import List, Optional, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Multi-part public suffixes (Public Suffix List, the high-traffic
#: subset): when a host's last TWO labels match one of these, the
#: registrable domain is the last THREE labels. Kept sorted for stable
#: oracle generation.
MULTI_PART_SUFFIXES: tuple = tuple(sorted({
    "ac.jp", "ac.th", "ac.uk", "co.il", "co.in", "co.jp", "co.kr",
    "co.nz", "co.th", "co.uk", "co.za", "com.ar", "com.au", "com.br",
    "com.cn", "com.co", "com.eg", "com.hk", "com.mx", "com.my", "com.pe",
    "com.ph", "com.pk", "com.sa", "com.sg", "com.tr", "com.tw", "com.ua",
    "com.ve", "com.vn", "edu.au", "edu.cn", "go.jp", "go.th", "gov.au",
    "gov.br", "gov.cn", "gov.uk", "gov.ua", "me.uk", "ne.jp", "net.au",
    "net.br", "net.cn", "net.in", "net.nz", "net.uk", "or.jp", "or.kr",
    "org.au", "org.br", "org.cn", "org.il", "org.in", "org.nz", "org.uk",
    "org.za",
}))


def registrable_domain(
    url: Column, extra_suffixes: Optional[List[str]] = None
) -> Column:
    """Registrable domain ("example.co.uk", "sample.com") of a URL column —
    one JVM expression, no UDF.

    host = ``parse_url(url, 'HOST')`` lowercased, trailing dot stripped;
    IPv4 hosts pass through whole (an IP has no registrable suffix);
    otherwise the last two labels, or the last three when the last two
    form a known multi-part public suffix. NULL/unparseable URLs yield
    NULL (``parse_url`` semantics), single-label hosts (``localhost``)
    pass through whole.
    """
    suffixes = list(MULTI_PART_SUFFIXES) + list(extra_suffixes or [])
    # try_parse_url: a malformed URL yields NULL instead of failing the
    # task (Spark 4 parse_url raises INVALID_URL) — web corpora always
    # contain garbage URLs and one must never kill a 100 TB scan
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    host = F.regexp_replace(host, r"\.$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # negative slice starts index from the end; a start beyond the array
    # length yields an empty array, which the n-guards below never select
    last2 = F.concat_ws(".", F.slice(labels, -2, 2))
    last3 = F.concat_ws(".", F.slice(labels, -3, 3))
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(is_ip, host)
        .when((n >= 3) & last2.isin(suffixes), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def _rank_hash(key: str, portable: bool) -> Column:
    """Deterministic pseudo-random rank for keep-first-N selection.
    ``xxhash64`` is the production default (one JVM call); the portable
    form is the repo's shared 60-bit md5 hash (``sampling._hash60``),
    byte-identical in DuckDB — used when a result must replay under the
    oracle gate."""
    if portable:
        from .sampling import _hash60

        return _hash60(F.col(key))
    return F.xxhash64(F.col(key))


def domain_cap(
    df: DataFrame,
    url_col: str,
    max_per_domain: int,
    key_col: str,
    portable_hash: bool = False,
    extra_suffixes: Optional[List[str]] = None,
    validate_keys: bool = True,
) -> DataFrame:
    """Keep at most ``max_per_domain`` rows per registrable domain,
    chosen DETERMINISTICALLY (hash-ordered by ``key_col``, ties broken by
    the key) — the RefinedWeb-style per-domain cap, reproducible across
    runs and cluster sizes.

    ``key_col`` MUST be a non-null unique row id — the winners-then-
    semi-join plan identifies rows by key, so a NULL key would silently
    vanish at the equality join and a duplicated key would let every
    copy of a single winner through the cap. Rather than silently
    producing either wrong result, the plan RAISES at execution time on
    a NULL key always, and on a duplicated key when ``validate_keys``
    is True (the default; callers whose key is a verified primary key
    can pass ``validate_keys=False`` to skip the validation's extra
    narrow-projection shuffle).

    Rows with a NULL registrable domain (unparseable/garbage URLs) pass
    through UNCAPPED: they share no domain, so pooling them under one
    quota would discard documents for having a bad URL rather than for
    belonging to a hot host — the same keep-the-unparseable policy as
    ``domain_filter`` blocklists and ``canonicalize_url``.

    Plan shape (the 100 TB contract): winners are decided on a
    ``(key, domain)`` projection — the window's exchange, partitioned by
    the Zipf-skewed domain, carries two narrow columns, never the text
    payload — and the full rows return via a key-partitioned semi-join.
    The payload is shuffled exactly once, on the uniform key, so a
    mega-domain skews a few-byte sort, not a text partition. Key
    validation rides the same narrow projection (a count window over the
    uniform key), never the payload.
    """
    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")
    if key_col not in df.columns or url_col not in df.columns:
        raise ValueError(f"columns {key_col!r}/{url_col!r} not in dataframe")
    key_checked = F.when(
        F.col(key_col).isNotNull(), F.col(key_col)
    ).otherwise(
        F.raise_error(
            F.lit(
                f"domain_cap: key_col {key_col!r} must be non-null — a NULL "
                "key would silently drop the row at the winners semi-join"
            )
        )
    )
    keyed = df.select(
        key_checked.alias("__dc_key"),
        registrable_domain(F.col(url_col), extra_suffixes).alias("__dc_dom"),
    )
    if validate_keys:
        dup_w = Window.partitionBy("__dc_key")
        keyed = (
            keyed.withColumn("__dc_n", F.count(F.lit(1)).over(dup_w))
            .withColumn(
                "__dc_key",
                F.when(F.col("__dc_n") == 1, F.col("__dc_key")).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"domain_cap: key_col {key_col!r} must be "
                                "unique — duplicated key "
                            ),
                            F.col("__dc_key").cast("string"),
                            F.lit(
                                " would let every copy of one winner "
                                "through the cap"
                            ),
                        )
                    )
                ),
            )
            .drop("__dc_n")
        )
    w = Window.partitionBy("__dc_dom").orderBy(
        _rank_hash("__dc_key", portable_hash), F.col("__dc_key")
    )
    winners = (
        keyed.filter(F.col("__dc_dom").isNotNull())
        .withColumn("__dc_r", F.row_number().over(w))
        .filter(F.col("__dc_r") <= max_per_domain)
        .select("__dc_key")
    )
    winners = winners.unionByName(
        keyed.filter(F.col("__dc_dom").isNull()).select("__dc_key")
    )
    return df.join(
        winners, F.col(key_col) == F.col("__dc_key"), "left_semi"
    )


#: query parameters that identify a CLICK, not a RESOURCE — the standard
#: strip set for URL canonicalization (Google/Facebook/Microsoft click ids,
#: utm_* campaign tags, mailchimp ids, instagram share ids)
_TRACKING_PARAM_RE = (
    r"^(utm_[^=]*|gclid|fbclid|msclkid|dclid|igshid|mc_cid|mc_eid|"
    r"ref|ref_src|spm|cmpid)="
)


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL for exact URL-level dedup — one JVM
    expression chain, no UDF: two pages that differ only in scheme/host
    case, default port, trailing slash, fragment, tracking parameters, or
    query-parameter order canonicalize to the same string.

    Rules (the common WARC/crawl-dedup set): scheme and host lowercase,
    host's trailing dot stripped, default ports (``:80`` http / ``:443``
    https) dropped, fragment dropped, path's trailing slashes trimmed
    (empty path → ``/``), tracking parameters removed
    (``utm_*``/``gclid``/``fbclid``/...), remaining query parameters
    SORTED. Unparseable URLs yield NULL — dedup then ignores them rather
    than colliding every garbage row onto one key.

    This is a dedup KEY, not a fetchable address: parameter order can
    matter to a rare endpoint, which is exactly why the canonical form
    lives in a derived column instead of rewriting the stored URL.
    """
    proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.regexp_replace(
        F.lower(F.try_parse_url(url, F.lit("HOST"))), r"\.$", ""
    )
    authority = F.lower(F.try_parse_url(url, F.lit("AUTHORITY")))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((proto == "http") & (port == "80"))
        & ~((proto == "https") & (port == "443"))
    )
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.when(
        proto.isNull() | host.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            proto,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        )
    )


def domain_stats(
    df: DataFrame,
    url_col: str,
    size_col: Optional[str] = None,
    extra_suffixes: Optional[List[str]] = None,
) -> DataFrame:
    """Per-registrable-domain corpus profile — the input to choosing cap
    values and blocklists (RefinedWeb-style curation decides per-domain,
    so the first question about any web corpus is "which domains carry
    the mass"): one row per domain with ``n_docs``, the corpus share
    ``doc_share``, and — when ``size_col`` names a numeric column (chars,
    tokens, bytes) — ``total_size``/``size_share``. NULL domains
    (unparseable URLs) aggregate under a NULL row so garbage volume is
    visible rather than silently excluded.

    One hash aggregate on the domain key with map-side partials plus a
    1-row broadcast of the corpus totals — no sort, no window; the output
    is O(domains), tiny relative to any corpus worth profiling. Sort by
    ``doc_share`` downstream to see the Zipf head this module's cap
    exists to tame.
    """
    dom = registrable_domain(F.col(url_col), extra_suffixes)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if size_col is not None:
        if size_col not in df.columns:
            raise ValueError(f"size column {size_col!r} not in dataframe")
        aggs.append(
            F.sum(F.col(size_col).cast("double")).alias("total_size")
        )
    per_dom = df.select(dom.alias("domain"), *(
        [F.col(size_col)] if size_col else []
    )).groupBy("domain").agg(*aggs)
    total_aggs = [F.sum("n_docs").alias("__t_docs")]
    if size_col is not None:
        total_aggs.append(F.sum("total_size").alias("__t_size"))
    totals = per_dom.agg(*total_aggs)
    out = per_dom.join(F.broadcast(totals))
    out = out.withColumn(
        "doc_share", (F.col("n_docs") / F.col("__t_docs")).cast("double")
    ).drop("__t_docs")
    if size_col is not None:
        out = out.withColumn(
            "size_share",
            (F.col("total_size") / F.col("__t_size")).cast("double"),
        ).drop("__t_size")
    return out


def domain_filter(
    df: DataFrame,
    url_col: str,
    blocked: Union[List[str], DataFrame],
    keep: bool = False,
    extra_suffixes: Optional[List[str]] = None,
) -> DataFrame:
    """Drop (or with ``keep=True``, retain only) rows whose registrable
    domain is in ``blocked`` — the blocklist/allowlist half of domain
    curation. A Python list lowers to one ``isin`` literal predicate
    (codegen, pushes to the scan); a DataFrame blocklist (first column =
    domain) runs as a broadcast anti/semi join — blocklists are small
    relative to any corpus worth filtering, so the corpus never shuffles.
    """
    dom = registrable_domain(F.col(url_col), extra_suffixes)
    if isinstance(blocked, DataFrame):
        bl = blocked.select(
            F.lower(F.col(blocked.columns[0])).alias("__df_dom")
        ).distinct()
        tagged = df.withColumn("__df_dom", dom)
        how = "left_semi" if keep else "left_anti"
        return tagged.join(
            F.broadcast(bl), on="__df_dom", how=how
        ).drop("__df_dom")
    blocked_l = [b.lower() for b in blocked]
    pred = dom.isin(blocked_l)
    return df.filter(pred if keep else (~F.coalesce(pred, F.lit(False))))
