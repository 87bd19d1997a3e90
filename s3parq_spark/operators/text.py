"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All built-in-function compositions (regexp/split/
md5) — zero Python in the hot path, so they whole-stage-codegen and scale
linearly with the corpus."""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword inventories for the n-gram/stopword heuristic
#: language identifier (public-knowledge stopword lists).
LANG_STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "los", "una"],
    "fr": ["le", "la", "les", "et", "des", "un", "une"],
}


def _stopword_hits(col: Column, words: List[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pat), 1))


def language_id(
    df: DataFrame,
    text_col: str,
    out_col: str = "predicted_lang",
    stopwords: Optional[Dict[str, List[str]]] = None,
) -> DataFrame:
    """Stopword-profile language ID: count stopword hits per language, pick
    the argmax (deterministic tie-break: language order; all-zero → 'und')."""
    sw = stopwords or LANG_STOPWORDS
    langs = list(sw)
    scored = df
    for lang in langs:
        scored = scored.withColumn(f"score_{lang}", _stopword_hits(F.col(text_col), sw[lang]))
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(langs):  # earlier languages win ties
        cond = F.col(f"score_{lang}") > 0
        better = (F.col(f"score_{lang}") >= best_score) & cond
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, F.col(f"score_{lang}")).otherwise(best_score)
    return scored.withColumn(out_col, best)


def token_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (runs of word chars /
    digits / single punctuation — the classic GPT-2-style pre-tokenizer
    regex, simplified to what both Spark's and RE2-class engines support)."""
    ws = F.split(F.trim(F.col(text_col)), r"\s+")
    subwords = F.regexp_extract_all(
        F.col(text_col), F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1
    )
    return (
        df.withColumn("n_tokens_ws", F.size(ws).cast("bigint"))
        .withColumn("n_tokens_re", F.size(subwords).cast("bigint"))
    )


def quality_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic quality features: char/word counts, mean word length,
    punctuation ratio, stopword ratio — the standard pre-training corpus
    filters (cf. C4/Gopher rules), as exact integer counts plus single-op
    float ratios."""
    txt = F.col(text_col)
    words = F.split(F.trim(txt), r"\s+")
    n_chars = F.length(txt).cast("bigint")
    n_words = F.size(words).cast("bigint")
    n_punct = F.size(F.regexp_extract_all(txt, F.lit(r"([.,;:!?])"), 1)).cast("bigint")
    # the shared English inventory, not a re-spelled literal: editing
    # LANG_STOPWORDS must move language_id and this ratio together
    n_stop = _stopword_hits(txt, LANG_STOPWORDS["en"]).cast("bigint")
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("n_punct", n_punct)
        .withColumn("n_stopwords", n_stop)
        .withColumn("mean_word_len", (n_chars - (n_words - 1)) / n_words)
        # empty text: 0/0 raises DIVIDE_BY_ZERO under ANSI; an empty doc
        # has punct ratio 0 by any reading (n_words is never 0 — split('')
        # yields [''] — so the other two ratios cannot hit /0)
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn("stopword_ratio", n_stop / n_words)
    )


def linear_quality_classifier(
    df: DataFrame,
    text_col: str,
    n_features: int = 4096,
    threshold: float = 0.0,
) -> DataFrame:
    """fastText-style linear classifier over hashed bag-of-words — the
    standard learned quality filter (cf. CCNet / GPT-3's quality model),
    with the hashing trick replacing a vocabulary: token → md5-derived
    feature bucket → weight; document logit = mean of token weights.

    The weight table is not shipped as data: weight(b) is DERIVED from the
    bucket id by a Knuth multiplicative hash, so the whole model is three
    integer ops per token — pure codegen'd JVM expressions, no UDF, no
    broadcast, no vocabulary join, and the identical arithmetic runs in any
    engine (the oracle replays it). Swapping in real trained weights means
    replacing the derivation with a broadcast ``n_features``-entry lookup
    array; the plan shape (one projection, zero shuffles) is unchanged,
    which is the property that matters at 100 TB.

    Exactness: token weights are exact integers in [-2^19, 2^19); the logit
    sum stays integer (order-independent), and the ONE float op is the
    final mean division. ``keep`` compares that mean against ``threshold``.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    scale = 1 << 20
    weights = F.transform(
        toks,
        lambda t: (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
            % F.lit(n_features)
        )
        * F.lit(2654435761)
        % F.lit(scale)
        - F.lit(scale // 2),
    )
    logit = F.aggregate(
        weights, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    n = F.size(toks).cast("bigint")
    score = logit.cast("double") / (n * F.lit(scale))
    return (
        df.withColumn("n_tokens", n)
        .withColumn("score", score)
        .withColumn("keep", score > F.lit(threshold))
    )


def document_fingerprint(
    df: DataFrame, text_col: str, out_col: str = "fingerprint"
) -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercased text —
    the exact-dedup key for 'same text modulo whitespace/case'. The
    normalization IS ``dedup.normalized_text`` (one definition, one key
    space: a drift between the two would silently split exact-dedup keys
    between this fingerprint and the dedup module's)."""
    from .dedup import normalized_text

    return df.withColumn(out_col, F.md5(normalized_text(F.col(text_col))))


#: RE2-safe PII patterns (no lookarounds/backrefs) so the identical regex
#: runs in Spark (java.util.regex) and any RE2-class engine.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"(\+?\d{1,2}[ -])?(\(\d{3}\)|\d{3})[ -]\d{3}[ -]?\d{4}\b", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame, text_col: str, out_col: Optional[str] = None
) -> DataFrame:
    """Mask common PII shapes (emails, US phone numbers, SSNs) with typed
    placeholder tokens — the standard pre-training scrub pass. A chain of
    ``regexp_replace`` built-ins: codegen'd, linear, no Python in the path.
    Order matters: SSN before phone (an SSN is also a phone-shaped digit
    run)."""
    c = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return df.withColumn(out_col or text_col, c)


def tf_idf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 5,
) -> DataFrame:
    """Per-document top-``top_k`` TF-IDF terms.

    Scale shape: two hash-aggregations (shuffle on (doc, term), then on
    term) + one equi-join + a per-doc top-k window — every stage is
    key-partitioned; the only driver scalar is the corpus document count.
    ``idf = ln(N / df_t)`` and ``score = tf · idf`` are single-op float
    steps over exact integers, so scores are bit-identical cross-engine
    (ties broken by term text).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    )
    tf = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(id_col).distinct().count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    scored = (
        tf.join(dfreq, "term")
        .withColumn("idf", F.log(F.lit(float(n_docs)) / F.col("df_t")))
        .withColumn("tfidf", F.col("tf") * F.col("idf"))
    )
    w = Window.partitionBy("doc").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= top_k)
        .select(F.col("doc").alias(id_col), "term", "tf", "tfidf", "rk")
    )


def _word_bigrams(text_col: str):
    """``array<struct<w1,w2>>`` of adjacent word pairs from the shared
    whitespace tokenization; empty for docs with fewer than two tokens
    (``sequence(1, 0)`` DESCENDS, so short docs must bypass it)."""
    t = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.struct(
            F.element_at(t, i).alias("w1"),
            F.element_at(t, i + 1).alias("w2"),
        ),
    )
    return F.when(F.size(t) >= 2, pairs).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )


def ngram_lm_scores(
    df: DataFrame,
    train_df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """CCNet/KenLM-style n-gram language-model quality score: each document's
    average add-one-smoothed word-bigram log-probability under a model
    counted from ``train_df`` —

        avg over bigrams (w1,w2) of  ln((C(w1,w2) + 1) / (C(w1) + V))

    with V = train vocabulary size. Low scores mark text unlike the
    reference corpus — the perplexity-bucket filter of the CCNet pipeline
    (Wenzek et al. 2020), with the LM as exact distributed counts instead
    of an external KenLM binary.

    Determinism: every count is an exact integer, ``ln`` over their ratio
    is one float op, and the per-doc mean sums ``decimal(28,12)``-cast
    terms (order-independent) with ONE double division at the edge — so
    scores hash-match a SQL oracle.

    Scale shape: two key-partitioned hash aggregates build the model
    (bigram and unigram counts); scoring is two equi-joins (on the bigram,
    then on w1) plus a per-doc aggregate; V is a 1-row broadcast. No
    collect, no cartesian, no Python. Docs with < 2 tokens have no bigrams
    and drop out (score is undefined for them).

    Output: ``(id_col, n_bigrams, avg_logp)``.
    """
    bigrams = _word_bigrams(text_col)
    tr_tokens = train_df.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w1")
    )
    c1 = tr_tokens.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c2 = (
        train_df.select(F.explode(bigrams).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    vdf = tr_tokens.agg(F.countDistinct("w1").alias("v"))

    doc_bigrams = df.select(
        F.col(id_col).alias("__doc"), F.explode(bigrams).alias("bg")
    ).select("__doc", "bg.w1", "bg.w2")
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
    )
    return (
        doc_bigrams.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vdf))
        .select("__doc", logp.alias("__logp"))
        .groupBy("__doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.sum(F.col("__logp").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_logp"),
        )
        .select(F.col("__doc").alias(id_col), "n_bigrams", "avg_logp")
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: List[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Sparck-Jones, the Lucene
    formulation): top-``top_k`` documents for a bag of query terms,

        score(d) = Σ_t  idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
        idf(t)   = ln((N − df_t + 0.5) / (df_t + 0.5) + 1)

    Companion to ``tf_idf``: TF-IDF profiles a corpus, BM25 answers a
    query against it. All counts are exact integers; the float steps are a
    fixed left-associative expression sequence (portable cross-engine) and
    the per-doc term sum is decimal(28,12)-cast (order-independent), so
    the result hash-matches a SQL oracle.

    Scale shape: one token explode feeding two key-partitioned aggregates
    (per-doc length over all terms; tf over the query terms only — the
    ``isin`` prunes before the shuffle), document frequency from the tf
    side, corpus N/avgdl as a 1-row broadcast, final ranking
    TakeOrderedAndProject (per-partition top-k, no global sort). The query
    side is a literal list — at 100 TB the corpus side is the only scan.
    """
    terms = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    )
    dl = toks.groupBy("__doc").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("__doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))

    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfn = (F.col("tf") * F.lit(k1 + 1)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    )
    return (
        tf.join(dfreq, "term")
        .join(dl, "__doc")
        .crossJoin(F.broadcast(stats))
        .select("__doc", (idf * tfn).cast("decimal(28,12)").alias("__s"))
        .groupBy("__doc")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("__s").cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("__doc"))
        .limit(top_k)
        .select(F.col("__doc").alias(id_col), "n_terms", "score")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into token-bounded chunks with overlap — the standard
    pre-embedding/pre-training segmentation. One row in, ``ceil((n-overlap) /
    stride)`` rows out, entirely JVM-side: tokenize once, generate chunk
    start offsets with ``sequence``, slice+rejoin per offset, ``posexplode``.
    A 1→N flatMap shape with no Python and no shuffle — chunking composes
    with the scan and scales linearly.

    Output: (id, chunk_id int, chunk_text, n_chunk_tokens int). The last
    chunk may be shorter; a document shorter than ``chunk_tokens`` yields
    itself as chunk 0.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.expr(
        f"sequence(1, greatest(size(__toks) - {overlap}, 1), {stride})"
    )
    chunks = F.transform(
        starts,
        lambda s: F.array_join(F.slice(F.col("__toks"), s, chunk_tokens), " "),
    )
    return (
        df.withColumn("__toks", toks)
        .withColumn("__chunks", chunks)
        .select(
            F.col(id_col),
            F.posexplode("__chunks").alias("chunk_id", "chunk_text"),
        )
        .withColumn("chunk_id", F.col("chunk_id").cast("int"))
        .withColumn(
            "n_chunk_tokens",
            F.size(F.split(F.col("chunk_text"), r"\s+")).cast("int"),
        )
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    window: int = 4,
    portable_hash: bool = False,
) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every k-gram of
    words, keep the minimum hash of each sliding window of ``window`` hashes
    → a sparse, position-robust fingerprint set per document. Returns
    (id, fingerprint) rows. Pure DataFrame: positional shingle → hash →
    sliding-window min via transform over index sequence → explode distinct.

    The k-gram sequence is POSITIONAL (repeats kept): winnowing's guarantee
    — any shared run of ``k + window - 1`` tokens shares a fingerprint —
    only holds over the in-order sequence, so the dedup module's distinct
    shingle SET cannot be used here. Documents with between 1 and
    ``window`` k-grams yield one fingerprint (the min over all of them,
    the single degenerate window); documents shorter than ``k`` words
    have no k-grams and emit no rows.

    ``portable_hash=True`` hashes each k-gram as the first 60 bits of its
    md5 instead of ``xxhash64`` — bit-identical in any engine with md5
    (the correctness-oracle hash family, same trade as simhash's
    ``portable_hash``); the default stays xxhash64 (faster, 64 bits)."""
    u = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    kgrams = F.when(
        F.size(u) < k, F.expr("CAST(array() AS ARRAY<STRING>)")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(u) - k + 1, F.lit(1))),
            lambda i: F.array_join(F.slice(u, i, k), " "),
        )
    )
    if portable_hash:
        def _h(s):
            return F.conv(
                F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10
            ).cast("bigint")
    else:
        def _h(s):
            return F.xxhash64(s)

    hashed = df.withColumn("__kgrams", kgrams).select(
        F.col(id_col),
        F.transform(F.col("__kgrams"), _h).alias("hashes"),
    )
    mins = F.expr(
        f"CASE WHEN size(hashes) = 0 THEN CAST(array() AS ARRAY<BIGINT>) "
        f"WHEN size(hashes) <= {window} THEN array(array_min(hashes)) "
        f"ELSE transform(sequence(0, size(hashes) - {window}), "
        f"i -> array_min(slice(hashes, i + 1, {window}))) END"
    )
    return (
        hashed.select(F.col(id_col), F.explode(F.array_distinct(mins)).alias("fingerprint"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget_tokens: int = 256,
    n_buckets: int = 32,
) -> DataFrame:
    """Greedy sequence packing for training-data export: assign documents to
    fixed-token-budget training sequences. Documents are ordered by id
    within ``n_buckets`` portable-hash buckets; each doc's sequence is the
    one its running token offset starts in (first-fit in id order).

    A global ordered cumsum would serialize on one partition at 100 TB; the
    bucket partitioning makes the window a per-bucket sort, embarrassingly
    parallel — raise ``n_buckets`` with corpus size (sequences are then
    ``(bucket, seq_id)``-scoped, which is what a sharded export wants).

    Output: (id, bucket int, n_tokens int, seq_id int, seq_offset int) where
    ``seq_offset`` is the doc's starting token offset within its bucket's
    packing stream.
    """
    from pyspark.sql import Window

    from .sampling import RESOLUTION, _hash60

    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("bigint")
    bucket = F.pmod(
        F.pmod(_hash60(F.col(id_col)), F.lit(RESOLUTION)), F.lit(n_buckets)
    ).cast("int")
    w = Window.partitionBy("bucket").orderBy(id_col)
    cum = F.sum("n_tokens").over(w)
    return (
        df.select(F.col(id_col), toks.alias("n_tokens"))
        .withColumn("bucket", bucket)
        .withColumn("__cum", cum)
        .select(
            id_col,
            "bucket",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.floor((F.col("__cum") - F.col("n_tokens")) / budget_tokens)
            .cast("int")
            .alias("seq_id"),
            (F.col("__cum") - F.col("n_tokens")).cast("int").alias("seq_offset"),
        )
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_df: int = 2,
    max_df: Optional[int] = None,
) -> DataFrame:
    """Inverted index over ``k``-token shingles: ``term, n_docs, postings``
    with postings the sorted array of containing document ids — the lookup
    structure behind exact-phrase contamination checks and corpus search.

    Plan: per-document DISTINCT shingles (dedup before the shuffle, so a
    term repeated 1000× in one doc ships once), one hash aggregate builds
    each posting list with ``collect_set`` + ``array_sort`` (deterministic,
    order-insensitive to shuffle arrival). The document-frequency band
    [``min_df``, ``max_df``] is the scale contract: ``max_df`` caps the
    posting list length, so stop-shingles (appearing in every document —
    useless for lookup, unbounded state to carry) are dropped INSIDE the
    aggregate's output filter before anything large materializes.
    """
    toks = df.select(
        F.col(id_col).alias("__id"), F.split(F.trim(F.col(text_col)), r"\s+").alias("__t")
    )
    shingles = (
        toks.filter(F.size("__t") >= k)
        .select(
            "__id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.size("__t") - k),
                        lambda i: F.concat_ws(" ", F.slice("__t", i + 1, k)),
                    )
                )
            ).alias("term"),
        )
    )
    out = shingles.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_sort(F.collect_set("__id")).alias("postings"),
    )
    out = out.filter(F.col("n_docs") >= min_df)
    if max_df is not None:
        out = out.filter(F.col("n_docs") <= max_df)
    return out

def remove_duplicated_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_doc_freq: int = 2,
    lowercase: bool = False,
) -> DataFrame:
    """Cross-document line-level dedup (the RefinedWeb/CCNet boilerplate
    filter): split every document into lines, count each distinct
    (normalized) line's document frequency across the corpus, drop lines
    appearing in ``min_doc_freq`` or more documents (navigation chrome,
    cookie banners, footers), and reassemble each document's surviving
    lines in their original order.

    Output: ``(id, text_clean, n_lines, n_kept)`` — one row per input
    document, ``text_clean = ''`` when everything was boilerplate. Empty /
    whitespace-only lines are dropped unconditionally (they'd otherwise
    count as a shared "line" in every document). Documents whose text is
    NULL, empty, or all-blank lines produce no line rows at all and are
    re-attached by a left join on the input ids (``text_clean=''``,
    ``n_lines=0``) — without it they'd silently vanish from the output,
    breaking the one-row-per-document contract.

    Scale shape: one explode → one distinct → one hash aggregate on the
    line string (document frequency) → join back on the line key → per-doc
    aggregate that sorts each doc's surviving lines by position AFTER
    collecting them (collect_list order is nondeterministic; array_sort on
    the (pos, line) struct restores it). Every exchange is keyed; the df
    table is Zipf-shaped so the hot keys are exactly the boilerplate lines
    being removed — AQE's skew handling splits them.
    """
    import re as _re

    lines = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
                "pos", "line"
            ),
        )
        .withColumn(
            "__norm",
            F.trim(F.lower(F.col("line")) if lowercase else F.col("line")),
        )
        .filter(F.length("__norm") > 0)
    )
    dfreq = (
        lines.select(F.col(id_col), "__norm")
        .distinct()
        .groupBy("__norm")
        .agg(F.count(F.lit(1)).alias("__line_df"))
    )
    keep = F.col("__line_df") < min_doc_freq
    # ONE aggregate covers totals AND the surviving-line reassembly:
    # collect_list drops the NULLs that when() assigns to boilerplate
    # lines, so the kept list, the kept count, and the total line count
    # all ride the same doc_id exchange (a totals-vs-kept join would cost
    # a second shuffle for nothing)
    agg = (
        lines.join(dfreq, "__norm")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct(F.col("pos"), F.col("line")))
                        )
                    ),
                    lambda x: x["line"],
                ),
            ).alias("text_clean"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(keep.cast("bigint")).alias("n_kept"),
        )
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )

def oov_rate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 1000,
) -> DataFrame:
    """Tokenizer-health report: per-document out-of-vocabulary rate against
    the corpus's own top-``vocab_size`` token vocabulary (count desc, token
    asc tiebreak — deterministic). The pre-training sanity check for "does
    a vocab of size V cover this corpus", and the per-source signal for
    spotting domains a fixed tokenizer will shred into rare tokens.

    Plan shape: one token hash-aggregate → TakeOrdered top-V (the vocab is
    V rows — broadcast side) → explode again → broadcast left-semi-style
    membership via join + per-doc aggregate. The corpus is touched by two
    scans and exchanges only on keys; the vocabulary never shuffles the
    fact side. Output ``(id, n_tokens, n_oov, oov_rate)``.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__tok"),
    )
    vocab = (
        toks.groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.desc("__n"), F.asc("__tok"))
        .limit(vocab_size)
        .select("__tok", F.lit(True).alias("__in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "__tok", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.col("__in_vocab").isNull().cast("bigint")
            ).alias("n_oov"),
        )
        .withColumn(
            "oov_rate", F.col("n_oov").cast("double") / F.col("n_tokens")
        )
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """Exact substring dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", ACL 2022 — the ExactSubstr variant,
    token-granular): any ``k``-token gram occurring more than once in the
    corpus (across OR within documents) is a duplicated span; every token
    covered by such a span is removed, and each document's surviving
    tokens are reassembled in order.

    Output: ``(id, text_clean, n_tokens, n_removed)`` — one row per input
    document, ``text_clean = ''`` when the whole document was duplicated
    material. Documents shorter than ``k`` tokens have no grams and pass
    through intact. NULL text is treated as the empty string (coalesced
    before tokenizing) so the one-row-per-document contract holds — a
    bare ``split(NULL)`` would emit no token rows and silently drop the
    document from the output.

    The paper builds a corpus-wide suffix array; the equivalent
    declarative plan is a k-gram fingerprint join — the suffix array's
    one niche (matches LONGER than k detected as such) costs a
    sequential build, while every duplicated span >= k tokens is still
    fully removed here because each of its k-windows is itself
    duplicated. Scale shape: gram generation is array-side JVM
    ``transform`` (no window, no per-doc sort); the duplicate set is one
    hash aggregate on the gram fingerprint; coverage is a bounded
    k-explode of duplicated starts; the final per-doc aggregate sorts
    each doc's survivors after collecting (the ``remove_duplicated_lines``
    reassembly). Every exchange is keyed — gram fingerprint or
    (doc, pos) — nothing is broadcast-unbounded, no cartesian.
    """
    u = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n = F.size(u)
    # all full k-grams, array-side: candidate starts 1..n, keep i+k-1 <= n
    cand = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.struct(
            i.cast("int").alias("gpos"),
            F.array_join(F.slice(u, i, k), " ").alias("g"),
            (i + F.lit(k) - 1 <= n).alias("full"),
        ),
    )
    gr = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(F.filter(cand, lambda x: x["full"])).alias("s"),
        )
        .select(
            "__id",
            F.col("s.gpos").alias("gpos"),
            F.conv(F.substring(F.md5(F.col("s.g")), 1, 15), 16, 10)
            .cast("bigint")
            .alias("__h"),
        )
    )
    dup = gr.groupBy("__h").agg(F.count(F.lit(1)).alias("__c")).filter(
        F.col("__c") > 1
    )
    covered = (
        gr.join(dup.select("__h"), "__h")
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("gpos"), F.col("gpos") + F.lit(k - 1))
            ).alias("pos"),
        )
        .distinct()
        .withColumn("__cov", F.lit(True))
    )
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(u).alias("pos0", "tok"),
    ).select("__id", (F.col("pos0") + 1).cast("int").alias("pos"), "tok")
    keep = F.col("__cov").isNull()
    return (
        toks.join(covered, ["__id", "pos"], "left")
        .groupBy("__id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct(F.col("pos"), F.col("tok")))
                        )
                    ),
                    lambda x: x["tok"],
                ),
            ).alias("text_clean"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((~keep).cast("bigint")).alias("n_removed"),
        )
        .select(F.col("__id").alias(id_col), "text_clean", "n_tokens", "n_removed")
    )


def unigram_entropy(
    df: DataFrame,
    group_col: str,
    text_col: str,
) -> DataFrame:
    """Per-group unigram Shannon entropy (nats) — the corpus-health signal
    that catches degenerate sources (boilerplate farms, template spam have
    low entropy; OCR noise and mixed-language dumps run high):

        H(g) = − Σ_w  p_w · ln p_w,   p_w = count_w / total_tokens(g)

    Output: ``(group, n_tokens, n_distinct, entropy, norm_entropy)`` with
    ``norm_entropy = H / ln(n_distinct)`` in [0, 1] (1 = uniform usage;
    single-token groups report 0). Exactness: counts are exact integers;
    each word's −p·ln p term is one fixed float expression rounded to
    ``decimal(28,12)`` and the per-group sum is a decimal sum
    (order-independent — the ``bm25_scores`` recipe), so the result
    hash-matches a SQL oracle.

    Scale shape: one token explode into a (group, word) keyed aggregate,
    its result re-aggregated per group with the totals joined back by
    group key — two keyed exchanges, output bounded by |groups|.
    """
    toks = df.select(
        F.col(group_col).alias("__g"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("__w"),
    )
    wc = toks.groupBy("__g", "__w").agg(F.count(F.lit(1)).alias("c"))
    totals = wc.groupBy("__g").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    p = F.col("c").cast("double") / F.col("n_tokens")
    term = (-(p) * F.log(p)).cast("decimal(28,12)")
    return (
        wc.join(totals, "__g")
        .select("__g", "n_tokens", "n_distinct", term.alias("__t"))
        .groupBy("__g", "n_tokens", "n_distinct")
        .agg(F.sum("__t").cast("double").alias("entropy"))
        .select(
            F.col("__g").alias(group_col),
            "n_tokens",
            "n_distinct",
            "entropy",
            F.when(F.col("n_distinct") > 1,
                   F.col("entropy") / F.log(F.col("n_distinct").cast("double")))
            .otherwise(F.lit(0.0))
            .alias("norm_entropy"),
        )
    )
