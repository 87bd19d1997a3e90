"""Property-based checks for the late-round-5 operators: each Spark result
must agree with a brute-force pure-Python reference implementation on
arbitrary tiny corpora. Few examples (Spark jobs per example), tiny data —
the point is the invariant, not throughput."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

VOCAB = ["a", "b", "c", "d"]

doc_st = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=8).map(" ".join)
corpus_st = st.lists(doc_st, min_size=1, max_size=5)


def _grams(tokens, k):
    return [tuple(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]


@given(texts=corpus_st, k=st.integers(min_value=2, max_value=3))
@settings(max_examples=8, deadline=None)
def test_span_dedup_matches_reference(spark, texts, k):
    from s3parq_spark.operators.text import remove_duplicated_spans

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           remove_duplicated_spans(df, "doc_id", "text", k=k).collect()}

    # reference: corpus-wide k-gram counts -> covered positions -> rebuild
    toks = [t.split() for t in texts]
    from collections import Counter
    counts = Counter(g for t in toks for g in _grams(t, k))
    for i, t in enumerate(toks):
        covered = set()
        for p, g in enumerate(_grams(t, k)):
            if counts[g] > 1:
                covered.update(range(p, p + k))
        keep = [w for j, w in enumerate(t) if j not in covered]
        assert got[i]["text_clean"] == " ".join(keep), (texts, k, i)
        assert got[i]["n_tokens"] == len(t)
        assert got[i]["n_removed"] == len(covered)


@given(texts=st.lists(doc_st, min_size=2, max_size=5))
@settings(max_examples=8, deadline=None)
def test_containment_matches_brute_force(spark, texts):
    from s3parq_spark.operators.dedup import containment_pairs

    n, t = 2, 0.8
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {(r["doc_small"], r["doc_big"]): r["n_common"] for r in
           containment_pairs(df, "doc_id", "text", n=n, threshold=t).collect()}

    sets = [set(_grams(x.split(), n)) for x in texts]
    expected = {}
    for i in range(len(texts)):
        for j in range(len(texts)):
            if i == j or not sets[i] or not sets[j]:
                continue
            small, big = (i, j) if (
                len(sets[i]), i) < (len(sets[j]), j) else (j, i)
            if (small, big) in expected:
                continue
            inter = len(sets[small] & sets[big])
            if inter >= t * len(sets[small]):
                expected[(small, big)] = inter
    assert got == expected, (texts, got, expected)


@given(texts=st.lists(doc_st, min_size=1, max_size=4),
       groups=st.lists(st.sampled_from(["g1", "g2"]), min_size=1, max_size=4))
@settings(max_examples=6, deadline=None)
def test_corpus_overlap_exact_matches_brute_force(spark, texts, groups):
    from s3parq_spark.operators.dedup import corpus_overlap

    rows = [(groups[i % len(groups)], t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["source", "text"])
    got = {(r["src_a"], r["src_b"]): (r["n_a"], r["n_b"], r["n_common"])
           for r in corpus_overlap(df, "source", "text", shingle_n=2).collect()}

    shingles = {}
    for g, t in rows:
        shingles.setdefault(g, set()).update(_grams(t.split(), 2))
    gs = sorted(shingles)
    expected = {}
    for i in range(len(gs)):
        for j in range(i + 1, len(gs)):
            a, b = gs[i], gs[j]
            expected[(a, b)] = (
                len(shingles[a]), len(shingles[b]),
                len(shingles[a] & shingles[b]),
            )
    assert got == expected, (rows, got, expected)


@given(
    cmp=st.sampled_from([">=", ">", "<", "<=", "=="]),
    day=st.integers(min_value=1, max_value=6),
    hour=st.sampled_from([0, 6, 12]),
)
@settings(max_examples=6, deadline=None)
def test_transform_pushdown_equivalence(spark, cmp, day, hour):
    import datetime
    import shutil
    import tempfile

    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.publish import publish_path

    from s3parq_spark.filters import OPS

    rows = [
        (i, datetime.datetime(2024, 1, 1 + i % 5, 6 * (i % 3), 0, 0))
        for i in range(30)
    ]
    base = tempfile.mkdtemp(prefix="s3parq_prop_")
    try:
        p = base + "/ds"
        df = spark.createDataFrame(rows, ["k", "ts"])
        publish_path(
            spark, p, df, [],
            derived_partitions={"d": "date_format(ts, 'yyyy-MM-dd')"},
        )
        bound = datetime.datetime(2024, 1, day, hour, 0, 0)
        out = fetch_path(spark, p, filters=[
            {"partition": "ts", "comparison": cmp,
             "values": [bound.strftime("%Y-%m-%d %H:%M:%S")]},
        ])
        got = sorted(r["k"] for r in out.collect())
        expected = sorted(k for k, ts in rows if OPS[cmp](ts, bound))
        assert got == expected, (cmp, bound, got, expected)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    dim=st.integers(min_value=2, max_value=6),
    n=st.integers(min_value=5, max_value=15),
)
@settings(max_examples=6, deadline=None)
def test_full_rescore_equals_exact_topk(spark, seed, dim, n):
    from s3parq_spark.operators.similarity import (
        batch_cosine_topk, quantized_rescore_topk,
    )

    rows = [
        (i, [float(((seed + i * 31 + j * 17) % 23) - 11) for j in range(dim)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(df.vec_id < 2)
    two = quantized_rescore_topk(
        df, "vec_id", "embedding", q, k=3, rescore=n + 5
    ).select("query_id", "vec_id")
    exact = batch_cosine_topk(df, "vec_id", "embedding", q, k=3).select(
        "query_id", "vec_id"
    )
    assert sorted(map(tuple, two.collect())) == sorted(
        map(tuple, exact.collect())
    )


@given(texts=st.lists(doc_st, min_size=2, max_size=4))
@settings(max_examples=6, deadline=None)
def test_dsir_prefers_exact_target_copy(spark, texts):
    """A raw doc that IS a copy of the target corpus must outscore a raw
    doc whose n-grams are disjoint from it."""
    from s3parq_spark.operators.sampling import dsir_importance_weights

    rows = [(i, t, True) for i, t in enumerate(texts)]
    rows.append((100, texts[0], False))                  # exact target copy
    rows.append((101, "zz1 zz2 zz3 zz4 zz5", False))     # disjoint vocab
    df = spark.createDataFrame(rows, ["doc_id", "text", "t"])
    got = {r["doc_id"]: r["logw"] for r in
           dsir_importance_weights(df, "doc_id", "text", "t").collect()}
    assert got[100] > got[101], (texts, got)
