"""Pipeline-operator tests: dedup family consistency (LSH candidates must
recover the exact-jaccard truth set), similarity, text analysis, multimodal
plumbing."""

import math

import pytest
from pyspark.sql import functions as F

from s3parq_spark.operators import (
    attach_binary_payload,
    brute_force_cosine_topk,
    document_fingerprint,
    exact_dedup,
    extract_binary_features,
    language_id,
    lsh_bucketed_topk,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    quality_scores,
    simhash_candidate_pairs,
    stub_decode_image,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def true_neardups(docs):
    """Ground truth: exact 3-gram jaccard >= 0.8."""
    return {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.8).collect()
    }


def test_exact_dedup_deterministic_winner(spark):
    df = spark.createDataFrame(
        [(5, "a"), (3, "a"), (9, "b"), (1, "a")], ["id", "text"]
    )
    got = {(r.id, r.text, r.n_copies) for r in exact_dedup(df, ["text"], "id").collect()}
    assert got == {(1, "a", 3), (9, "b", 1)}


def test_exact_dedup_returns_full_winner_rows(spark):
    # payload columns survive dedup; the payload kept is the winner row's
    df = spark.createDataFrame(
        [(5, "a", "p5"), (3, "a", "p3"), (9, "b", "p9")],
        ["id", "text", "payload"],
    )
    out = exact_dedup(df, ["text"], "id")
    assert set(out.columns) == {"id", "text", "payload", "n_copies"}
    got = {(r.id, r.text, r.payload, r.n_copies) for r in out.collect()}
    assert got == {(3, "a", "p3", 2), (9, "b", "p9", 1)}


def test_ngram_jaccard_finds_planted_neardups(true_neardups):
    assert len(true_neardups) >= 10  # planted near-dup pairs exist
    assert all(a < b for a, b in true_neardups)


def test_minhash_recovers_exact_neardups(docs, true_neardups):
    """MinHash-LSH candidates at a permissive threshold must contain every
    true >=0.8 pair (probabilistic, but deterministic hashes + 0.99 planted
    similarity make misses essentially impossible)."""
    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(
            docs, "doc_id", "text", num_hashes=64, bands=16, min_est_jaccard=0.5
        ).collect()
    }
    assert true_neardups <= got
    # and estimates are high for true pairs: no flood of false positives
    assert len(got) <= len(true_neardups) * 3 + 10


def test_minhash_estimate_accuracy(docs):
    pairs = minhash_candidate_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, min_est_jaccard=0.5
    )
    exact = ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.0).select(
        "doc_a", "doc_b", "jaccard"
    )
    joined = pairs.join(exact, ["doc_a", "doc_b"]).collect()
    assert joined
    for r in joined:
        assert abs(r.est_jaccard - r.jaccard) < 0.25  # 64-hash estimator noise


def test_simhash_recovers_exact_neardups(docs, true_neardups):
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_candidate_pairs(docs, "doc_id", "text", max_hamming=6).collect()
    }
    missing = true_neardups - got
    # simhash on ~0.99-jaccard docs should land within hamming 6
    assert len(missing) <= max(1, len(true_neardups) // 10)


def test_minhash_neardup_equals_exact(docs, true_neardups):
    """The verified LSH pipeline emits EXACTLY the exact-Jaccard pair set —
    this is the oracle-checkability contract of the minhash_pairs query."""
    from s3parq_spark.operators import minhash_neardup_pairs

    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_neardup_pairs(
            docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.8
        ).collect()
    }
    assert got == true_neardups


def test_simhash_portable_hash_matches_xxhash_shape(docs, true_neardups):
    """Portable (md5-60-bit) simhash behaves like the xxhash64 one: most
    planted near-dups land within hamming 6, and output is deterministic."""
    a = simhash_candidate_pairs(
        docs, "doc_id", "text", bits=60, bands=4, max_hamming=6, portable_hash=True
    )
    got1 = {(r.doc_a, r.doc_b) for r in a.collect()}
    got2 = {(r.doc_a, r.doc_b) for r in a.collect()}
    assert got1 == got2
    missing = true_neardups - got1
    assert len(missing) <= max(1, len(true_neardups) // 3)


def test_dedup_operators_unpersist_on_release(spark, docs):
    """Cached intermediates are unpersisted when the result DataFrame is
    released — no storage accumulates across operator calls (ADVICE/VERDICT
    round 1)."""
    import gc

    from s3parq_spark.operators import minhash_neardup_pairs

    # other fixtures/tests may hold their own localCheckpoint blocks; this
    # test owns only the DELTA the dedup operators create
    gc.collect()
    base = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toString())
    for op in (
        lambda: ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.8),
        lambda: minhash_neardup_pairs(docs, "doc_id", "text"),
        lambda: minhash_candidate_pairs(docs, "doc_id", "text"),
    ):
        result = op()
        result.collect()
        del result
        gc.collect()
        now = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toString())
        assert now <= base


def test_brute_force_cosine_topk(spark, emb):
    q = emb.filter(F.col("vec_id") == 0)
    top = brute_force_cosine_topk(emb, "vec_id", "embedding", q, k=5).collect()
    assert len(top) == 5
    assert all(top[i].cosine >= top[i + 1].cosine for i in range(4))
    assert all(r.vec_id != 0 for r in top)
    # verify the top-1 against a python computation
    rows = {r.vec_id: r.embedding for r in emb.collect()}
    qv = rows[0]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    best = max((v for v in rows if v != 0), key=lambda v: (cos(rows[v], qv), -v))
    assert top[0].vec_id == best


def test_lsh_topk_subset_of_bucket(spark, emb):
    q = emb.filter(F.col("vec_id") == 0)
    approx = lsh_bucketed_topk(emb, "vec_id", "embedding", q, dim=64, k=5, planes=4)
    rows = approx.collect()
    assert 0 < len(rows) <= 5
    assert all(r.vec_id != 0 for r in rows)


def test_similarity_high_dim_no_literal_blowup(spark):
    """dim-512 embeddings (round-1 verdict fix): hyperplane/centroid
    matrices enter the plan as O(planes)/O(cells) array-literal nodes, so
    signature + IVF + brute force all run at realistic dims; full-probe IVF
    stays exactly equal to brute force."""
    import random

    from s3parq_spark.operators import ivf_topk, kmeans_centroids

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-1.0, 1.0) for _ in range(512)]) for i in range(48)
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0)
    exact = [r.vec_id for r in
             brute_force_cosine_topk(emb, "vec_id", "embedding", q, k=5).collect()]
    full_probe = [r.vec_id for r in
                  ivf_topk(emb, "vec_id", "embedding", q, k=5,
                           n_cells=8, n_probe=8).collect()]
    assert exact == full_probe
    got = lsh_bucketed_topk(
        emb, "vec_id", "embedding", q, dim=512, k=3, planes=8
    ).collect()
    assert all(r.vec_id != 0 for r in got)
    cents = kmeans_centroids(emb, "vec_id", "embedding", k=4, iters=1)
    assert len(cents) == 4 and len(cents[0]) == 512


def test_ivf_kmeans_recall_beats_first_n_on_skewed_ids(spark):
    """The round-3 verdict's quantizer fix: when the lowest-id vectors all
    come from one cluster, the first-N quantizer is degenerate (all cells
    sit in that cluster, cross-cluster points scatter arbitrarily) while the
    kmeans default pulls centroids toward the real clusters. Deterministic
    fixture, deterministic Lloyd's — recall must be at least as good and
    strictly better here."""
    import random

    from s3parq_spark.operators import ivf_topk

    rnd = random.Random(11)
    dim, per = 16, 24
    rows = []
    for cluster in range(3):
        for j in range(per):
            v = [rnd.uniform(-0.5, 0.5) for _ in range(dim)]
            v[cluster] += 10.0
            rows.append((cluster * per + j, v))
    # ids 0..per-1 are ALL cluster 0 -> first-N init is degenerate
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 71)  # a cluster-2 vector

    exact = {r.vec_id for r in
             brute_force_cosine_topk(emb, "vec_id", "embedding", q, k=5).collect()}

    def recall(quantizer):
        got = {r.vec_id for r in
               ivf_topk(emb, "vec_id", "embedding", q, k=5, n_cells=3,
                        n_probe=1, quantizer=quantizer).collect()}
        return len(got & exact) / len(exact)

    r_first, r_kmeans = recall("first"), recall("kmeans")
    assert r_kmeans >= r_first
    assert r_kmeans == 1.0


def test_batch_cosine_topk_matches_per_query_exact(spark, emb):
    """The batch plan must return, for every query id, exactly the
    single-query brute-force result — and do it in one plan (one broadcast,
    no driver loop)."""
    from s3parq_spark.operators import batch_cosine_topk

    q = emb.filter(F.col("vec_id") < 3)
    batch = batch_cosine_topk(emb, "vec_id", "embedding", q, k=4)
    got = {}
    for r in batch.collect():
        got.setdefault(r.query_id, []).append((r.vec_id, r.cosine))
    assert set(got) == {0, 1, 2}
    for qid in (0, 1, 2):
        single = brute_force_cosine_topk(
            emb, "vec_id", "embedding",
            emb.filter(F.col("vec_id") == qid), k=4,
        ).collect()
        assert [v for v, _ in got[qid]] == [r.vec_id for r in single]
    # AQE plan string repeats the initial plan, so assert shape not counts:
    # the query side is broadcast, ranking is WindowGroupLimit (partial
    # map-side top-k), and nothing shuffles the corpus for a sort-merge.
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan


def test_lsh_batch_topk_per_query_buckets(spark, emb):
    from s3parq_spark.operators import lsh_batch_topk

    q = emb.filter(F.col("vec_id") < 4)
    rows = lsh_batch_topk(
        emb, "vec_id", "embedding", q, dim=64, k=5, planes=4
    ).collect()
    by_q = {}
    for r in rows:
        assert r.vec_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r.cosine)
    assert set(by_q) <= {0, 1, 2, 3} and len(by_q) > 0
    for cos in by_q.values():
        assert len(cos) <= 5
        assert cos == sorted(cos, reverse=True)


def test_ivf_batch_topk_full_probe_equals_exact(spark, emb):
    """With n_probe == n_cells the batch IVF degenerates to exact search:
    per query it must equal batch_cosine_topk. Probe-cell selection is
    JVM-side (no driver collect of query vectors)."""
    from s3parq_spark.operators import batch_cosine_topk, ivf_batch_topk

    q = emb.filter(F.col("vec_id") < 3)
    exact = {}
    for r in batch_cosine_topk(emb, "vec_id", "embedding", q, k=4).collect():
        exact.setdefault(r.query_id, []).append(r.vec_id)
    full = {}
    out = ivf_batch_topk(
        emb, "vec_id", "embedding", q, k=4, n_cells=6, n_probe=6
    )
    for r in out.collect():
        full.setdefault(r.query_id, []).append(r.vec_id)
    assert full == exact
    # narrow probe returns a subset per query, ranked
    narrow = ivf_batch_topk(
        emb, "vec_id", "embedding", q, k=4, n_cells=6, n_probe=2
    ).collect()
    by_q = {}
    for r in narrow:
        assert r.vec_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r.cosine)
    for cos in by_q.values():
        assert cos == sorted(cos, reverse=True) and len(cos) <= 4


def test_kmeans_k_cap_clear_error(spark):
    from s3parq_spark.operators import kmeans_centroids
    from s3parq_spark.operators.similarity import _KMEANS_MAX_ENTRIES

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(4)],
        "vec_id int, embedding array<double>",
    )
    with pytest.raises(ValueError, match="exceeds the driver-side cap"):
        kmeans_centroids(
            df, "vec_id", "embedding", k=_KMEANS_MAX_ENTRIES + 1, iters=1
        )


def test_normalize_and_quantize_vectors(spark):
    import math

    from s3parq_spark.operators import normalize_vectors, quantize_vectors

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [2.0, 2.0])],
        "vec_id int, embedding array<double>",
    )
    normed = {r.vec_id: r.embedding
              for r in normalize_vectors(df, "embedding").collect()}
    assert abs(math.hypot(*normed[1]) - 1.0) < 1e-12
    assert normed[2] == [0.0, 0.0]  # zero vector passes through
    q = {r.vec_id: r for r in quantize_vectors(df, "embedding").collect()}
    assert q[1].qvec == [0, 255] and q[1].qvec_min == 3.0
    assert q[3].qvec == [0, 0] and q[3].qvec_scale == 0.0  # constant vector
    # dequantize round-trips within one quantization step
    r = q[1]
    for orig, qi in zip([3.0, 4.0], r.qvec):
        assert abs((r.qvec_min + qi * r.qvec_scale) - orig) <= r.qvec_scale + 1e-12


def test_kmeans_clamps_k_to_corpus_size(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)],
        "vec_id int, embedding array<double>",
    )
    from s3parq_spark.operators import kmeans_centroids

    cents = kmeans_centroids(emb, "vec_id", "embedding", k=8, iters=2)
    assert len(cents) == 3  # clamped, no IndexError mid-iteration


def test_scrub_pii_masks_and_preserves(spark):
    from s3parq_spark.operators import scrub_pii

    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.io call (555) 123-4567 ssn 123-45-6789 ok")],
        ["id", "t"],
    )
    got = scrub_pii(df, "t").first().t
    assert got == "mail <EMAIL> call <PHONE> ssn <SSN> ok"


def test_tf_idf_ranks_distinctive_terms(spark):
    from s3parq_spark.operators import tf_idf

    df = spark.createDataFrame(
        [
            (1, "apple apple banana common common"),
            (2, "banana cherry common common"),
            (3, "common cherry date date date"),
        ],
        ["doc_id", "text"],
    )
    out = tf_idf(df, "doc_id", "text", top_k=2)
    top1 = {r.doc_id: r.term for r in out.collect() if r.rk == 1}
    # 'apple' appears only in doc 1 (tf=2); 'date' only in doc 3 (tf=3);
    # 'common' is everywhere → idf 0, never ranks first
    assert top1[1] == "apple" and top1[3] == "date"
    assert all(r.term != "common" or r.tfidf == 0 for r in out.collect())


def test_deterministic_sample_stable_and_stratified(spark):
    from s3parq_spark.operators import deterministic_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(2000)], ["id", "s"]
    )
    s1 = {r.id for r in deterministic_sample(df, "id", 0.3).collect()}
    s2 = {r.id for r in
          deterministic_sample(df.repartition(7), "id", 0.3).collect()}
    assert s1 == s2  # partitioning-independent membership
    assert 0.25 < len(s1) / 2000 < 0.35
    strat = deterministic_sample(df, "id", {"a": 0.5, "b": 0.0}, strata_col="s")
    rows = strat.collect()
    assert rows and all(r.s == "a" for r in rows)
    # subset property: sampled ids at a lower fraction nest in the higher one
    s_small = {r.id for r in deterministic_sample(df, "id", 0.1).collect()}
    assert s_small <= s1


def test_connected_components_chain_and_islands(spark):
    from s3parq_spark.operators import connected_components

    # chain 1-2-3-4-5 (diameter 4 → several propagation rounds) + pair 10-11
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (4, 5), (10, 11)], ["src", "dst"]
    )
    got = {
        (r.node, r.cluster)
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (10, 10), (11, 10)}


def test_neardup_clusters_groups_planted_dups(docs, true_neardups):
    from s3parq_spark.operators import neardup_clusters

    labels = {r.doc_id: r.cluster for r in
              neardup_clusters(docs, "doc_id", "text").collect()}
    # every true pair lands in the same cluster
    for a, b in true_neardups:
        assert labels[a] == labels[b]
    # cluster id is the min member
    for doc, cl in labels.items():
        assert cl <= doc and labels[cl] == cl


def test_dedup_against_corpus(spark):
    from s3parq_spark.operators import dedup_against_corpus

    corpus = spark.createDataFrame(
        [(1, "Known   Text"), (2, "other doc")], ["id", "text"]
    )
    batch = spark.createDataFrame(
        [(10, "known text"), (11, "brand new"), (12, "OTHER  doc"), (13, "fresh")],
        ["id", "text"],
    )
    got = {r.id for r in dedup_against_corpus(batch, corpus, "text").collect()}
    assert got == {11, 13}  # whitespace/case-normalized matches dropped


def test_audio_window_features(spark):
    from s3parq_spark.operators import attach_binary_payload, audio_window_features

    df = spark.createDataFrame([(1, "ab" * 40), (2, "")], ["doc_id", "text"])
    rows = sorted(
        audio_window_features(
            attach_binary_payload(df, "text"), "doc_id", window_samples=32
        ).collect(),
        key=lambda r: (r.doc_id, r.window_id),
    )
    d1 = [r for r in rows if r.doc_id == 1]
    assert [r.n_samples for r in d1] == [32, 32, 16]  # 80 bytes → 32+32+16
    a, b = ord("a"), ord("b")
    assert d1[0].energy == 16 * (a * a + b * b)
    assert d1[0].peak == b
    assert not [r for r in rows if r.doc_id == 2]  # empty payload → no rows


def test_chunk_documents_coverage_and_overlap(spark):
    from s3parq_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words), (2, "short doc")], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk_tokens=10, overlap=2).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    short = [r for r in rows if r.doc_id == 2]
    assert len(short) == 1 and short[0].chunk_text == "short doc"
    long = [r for r in rows if r.doc_id == 1]
    # strides of 8: chunk k starts at token 8k; every token covered
    assert long[0].chunk_text.startswith("w0 w1")
    assert long[1].chunk_text.startswith("w8 w9")
    covered = set()
    for r in long:
        covered.update(r.chunk_text.split())
    assert len(covered) == 100
    assert all(r.n_chunk_tokens <= 10 for r in long)
    # consecutive chunks share the 2-token overlap
    assert long[0].chunk_text.split()[-2:] == long[1].chunk_text.split()[:2]


def test_token_stats_and_quality(spark):
    df = spark.createDataFrame([(1, "Hello world, this is a test!")], ["doc_id", "text"])
    r = token_stats(df, "text").first()
    assert r.n_tokens_ws == 6
    assert r.n_tokens_re == 8  # 6 words + ',' + '!'
    r2 = quality_scores(df, "text").first()
    assert r2.n_chars == 28
    assert r2.n_words == 6
    assert r2.n_punct == 2
    assert r2.n_stopwords == 2  # 'is', 'a'
    assert r2.punct_ratio == 2 / 28


def test_language_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house"),
            (2, "der hund und die katze ist nicht da"),
            (3, "el perro y la casa de los gatos"),
            (4, "xyzzy qwerty plugh"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.predicted_lang for r in language_id(df, "text").collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "und"}


def test_document_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")], ["doc_id", "text"]
    )
    fps = {r.doc_id: r.fingerprint for r in document_fingerprint(df, "text").collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_multimodal_plumbing(spark, docs):
    payloads = attach_binary_payload(docs.select("doc_id", "text"), "text")
    assert dict(payloads.dtypes)["payload"] == "binary"
    feats = extract_binary_features(payloads, "doc_id")
    sample = feats.orderBy("doc_id").limit(3).collect()
    texts = {r.doc_id: r.text for r in docs.orderBy("doc_id").limit(3).collect()}
    for r in sample:
        raw = texts[r.doc_id].encode()
        assert r.byte_len == len(raw)
        assert r.first_byte == raw[0]
        assert r.checksum == sum(raw) % 9_223_372_036_854_775_807


def test_stub_decoder_raises():
    with pytest.raises(NotImplementedError):
        stub_decode_image(b"\x89PNG")


def test_ivf_full_probe_equals_brute_force(spark, emb):
    """n_probe == n_cells degenerates IVF to an exact scan: the result must
    be identical to brute force (same ids, same cosines)."""
    from s3parq_spark.operators import ivf_topk

    q = emb.filter(F.col("vec_id") == 0)
    exact = brute_force_cosine_topk(emb, "vec_id", "embedding", q, k=10)
    full = ivf_topk(emb, "vec_id", "embedding", q, k=10, n_cells=8, n_probe=8)
    assert [tuple(r) for r in full.collect()] == [tuple(r) for r in exact.collect()]


def test_ivf_partial_probe_recall(spark, emb):
    """Probing half the cells must keep recall@10 high on the clustered
    embeddings (labels form natural cells), and every returned id must also
    appear in some cell (sanity: no fabricated rows)."""
    from s3parq_spark.operators import ivf_topk

    q = emb.filter(F.col("vec_id") == 0)
    exact = {r.vec_id for r in
             brute_force_cosine_topk(emb, "vec_id", "embedding", q, k=10).collect()}
    approx = {r.vec_id for r in
              ivf_topk(emb, "vec_id", "embedding", q, k=10, n_cells=8, n_probe=4).collect()}
    assert len(approx) == 10
    assert len(exact & approx) / 10 >= 0.5


def test_approx_sketches_bound_error(spark, sf_dir):
    """The query asserts its own 5% sketch error bounds (the oracle-checkable
    form): exact counts must agree with the exact query, and every *_ok
    boolean — |approx-exact|/exact < 0.05 for HLL++ and approx median —
    must hold."""
    from s3parq_spark.workload import QUERIES

    approx = {r.l_returnflag: r for r in
              QUERIES["approx_distinct_counts"](spark, sf_dir).collect()}
    exact = {r.l_returnflag: r for r in
             QUERIES["distinct_counts"](spark, sf_dir).collect()}
    for flag, e in exact.items():
        a = approx[flag]
        assert a.n_parts_exact == e.n_parts
        assert a.n_supps_exact == e.n_supps
        assert a.parts_ok and a.supps_ok and a.median_ok


def test_ngram_lm_scores_hand_computed(spark):
    """Add-one-smoothed bigram LM against hand-computed probabilities:
    train 'a b a c' -> V=3, C(a)=2, C(b)=1, C(a,b)=1; scoring 'a b x'
    gives ln((1+1)/(2+3)) for (a,b) and ln((0+1)/(1+3)) for the unseen
    (b,x). Docs with < 2 tokens drop out."""
    import math

    from s3parq_spark.operators import ngram_lm_scores

    corpus = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b x"), (3, "solo")],
        "doc_id int, text string",
    )
    train = corpus.filter(F.col("doc_id") == 1)
    got = {r.doc_id: r for r in
           ngram_lm_scores(corpus, train, "doc_id", "text").collect()}
    assert set(got) == {1, 2}  # 'solo' has no bigrams
    assert got[2].n_bigrams == 2
    want = (math.log(2 / 5) + math.log(1 / 4)) / 2
    assert abs(got[2].avg_logp - want) < 1e-9
    # the train doc scores higher than the half-unseen doc
    assert got[1].avg_logp > got[2].avg_logp


def test_bm25_scores_hand_computed(spark):
    import math

    from s3parq_spark.operators import bm25_scores

    corpus = spark.createDataFrame(
        [(1, "hash hash join"), (2, "join scan"), (3, "scan scan scan scan")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in
           bm25_scores(corpus, "doc_id", "text", ["hash", "join"]).collect()}
    assert set(got) == {1, 2}  # d3 matches no query term

    def idf(df_t, n=3):
        return math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)

    def tfn(tf, dl, avgdl=3.0, k1=1.2, b=0.75):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    want1 = idf(1) * tfn(2, 3) + idf(2) * tfn(1, 3)
    want2 = idf(2) * tfn(1, 2)
    assert abs(got[1].score - want1) < 1e-9
    assert abs(got[2].score - want2) < 1e-9
    assert got[1].score > got[2].score and got[1].n_terms == 2


def test_stratified_fixed_n_exact_counts_and_stability(spark):
    from s3parq_spark.operators import stratified_fixed_n

    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3)) for i in range(100)], "id int, src string"
    )
    out = stratified_fixed_n(df, "id", "src", 5)
    rows = out.collect()
    by = {}
    for r in rows:
        by.setdefault(r.src, set()).add(r.id)
    assert all(len(v) == 5 for v in by.values()) and len(by) == 3
    # membership is partitioning-independent
    again = {(r.src, r.id)
             for r in stratified_fixed_n(df.repartition(7), "id", "src", 5).collect()}
    assert again == {(r.src, r.id) for r in rows}
    # stratum smaller than N: all rows kept
    small = stratified_fixed_n(df.filter(F.col("id") < 2), "id", "src", 5)
    assert small.count() == 2


def test_duplicated_ngram_ratio_hand_computed(spark):
    from s3parq_spark.operators import duplicated_ngram_ratio

    df = spark.createDataFrame(
        [
            (1, "a b c d"),        # bigrams: ab, bc, cd
            (2, "a b x y"),        # bigrams: ab, xy... (shared: ab)
            (3, "p q"),            # unique bigram
            (4, "z"),              # no bigrams -> drops out
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in
           duplicated_ngram_ratio(df, "doc_id", "text", n=2).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].n_ngrams == 3 and got[1].n_dup == 1
    assert abs(got[1].dup_ratio - 1 / 3) < 1e-12
    assert got[3].n_dup == 0 and got[3].dup_ratio == 0.0


def test_resize_images_stub_raises(spark, docs):
    from s3parq_spark.operators import resize_images

    payloads = attach_binary_payload(docs.select("doc_id", "text").limit(4), "text")
    with pytest.raises(Exception) as ei:
        resize_images(payloads, "doc_id").collect()
    assert "NotImplementedError" in str(ei.value) or "media library" in str(ei.value)


def test_resize_images_with_injected_decoder(spark, docs):
    """With decode/resize injected the operator produces resized payloads —
    proving the plumbing contract without any media library."""
    from s3parq_spark.operators import resize_images

    payloads = attach_binary_payload(docs.select("doc_id", "text").limit(8), "text")
    out = resize_images(
        payloads, "doc_id", target=(4, 2),
        decode=lambda b: b,
        resize=lambda obj, t: bytes(obj[: t[0] * t[1]]),
    ).collect()
    assert len(out) == 8
    assert all(r.width == 4 and r.height == 2 for r in out)
    assert all(len(r.payload) <= 8 for r in out)


def test_sample_video_frames_cardinality(spark, docs):
    """1→N frame explosion: deterministic fake demux emits ≤4 slices per
    payload, ordered by frame timestamp."""
    from s3parq_spark.operators import sample_video_frames

    payloads = attach_binary_payload(docs.select("doc_id", "text").limit(5), "text")
    out = sample_video_frames(payloads, "doc_id", every_ms=500)
    rows = out.collect()
    assert len(rows) >= 5  # at least one frame per doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_ts_ms)
        assert r.media_type == "application/x-fake-frame"
    for ts_list in by_doc.values():
        assert 1 <= len(ts_list) <= 4
        assert ts_list == sorted(ts_list)
        assert all(t % 500 == 0 for t in ts_list)


def test_kmeans_centroids_deterministic_and_improving(spark, emb):
    """Lloyd refinement must be reproducible run-to-run (exact-decimal
    means) and must not degrade the clustering objective (mean best-cell
    cosine) versus the raw deterministic init."""
    from s3parq_spark.operators import ivf_topk, kmeans_centroids
    from s3parq_spark.operators.similarity import _cell_scores

    c1 = kmeans_centroids(emb, "vec_id", "embedding", k=8, iters=2)
    c2 = kmeans_centroids(emb, "vec_id", "embedding", k=8, iters=2)
    assert c1 == c2

    corpus = emb.select(F.col("embedding").cast("array<double>").alias("v"))

    def objective(cents):
        norms = [max(1e-12, sum(x * x for x in v) ** 0.5) for v in cents]
        s = _cell_scores(F.col("v"), cents, norms)
        return corpus.select(F.avg(F.array_max(s)).alias("o")).collect()[0].o

    raw = kmeans_centroids(emb, "vec_id", "embedding", k=8, iters=0)
    assert objective(c1) >= objective(raw) - 1e-9

    # refined centroids plug into ivf_topk; full probe stays exact
    q = emb.filter(F.col("vec_id") == 0)
    from s3parq_spark.operators import brute_force_cosine_topk
    exact = [tuple(r) for r in
             brute_force_cosine_topk(emb, "vec_id", "embedding", q, k=10).collect()]
    full = [tuple(r) for r in
            ivf_topk(emb, "vec_id", "embedding", q, k=10,
                     n_cells=8, n_probe=8, centroids=c1).collect()]
    assert full == exact


def test_semantic_dedup_drops_near_duplicates_keeps_lowest_id(spark):
    """SemDeDup greedy-by-id: exact/near copies of a lower-id vector are
    dropped (including transitively through an already-dropped one);
    near-orthogonal vectors all survive; output carries cell assignment."""
    from s3parq_spark.operators import semantic_dedup

    base = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [1.0, 0.001, 0.0, 0.0]),   # near-copy of 0 -> dropped
        (4, [1.0, 0.002, 0.0, 0.0]),   # near-copy of 0 and 3 -> dropped
        (5, [0.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(base, "vec_id int, v array<double>")
    kept = semantic_dedup(
        df, "vec_id", "v", n_cells=3, threshold=0.99, kmeans_iters=1
    )
    rows = {r["vec_id"]: r["cell"] for r in kept.collect()}
    assert sorted(rows) == [0, 1, 2, 5]
    # deterministic: same input -> same kept set and cells
    again = {
        r["vec_id"]: r["cell"]
        for r in semantic_dedup(
            df, "vec_id", "v", n_cells=3, threshold=0.99, kmeans_iters=1
        ).collect()
    }
    assert again == rows
    # threshold 1.01 keeps everything (no cosine can reach it)
    assert (
        semantic_dedup(df, "vec_id", "v", n_cells=3, threshold=1.01).count()
        == 6
    )


def test_semantic_dedup_guards_oversized_cells(spark):
    """The max_cell_rows guard fires BEFORE the quadratic in-cell join when
    a cell exceeds the cap (undersized n_cells at scale would make the
    self-join near-cartesian), names the remediation, and can be disabled
    explicitly (r5 verdict #4)."""
    import pytest

    from s3parq_spark.operators import semantic_dedup

    # 12 near-identical vectors: one cell swallows everything
    df = spark.createDataFrame(
        [(i, [1.0, 0.0001 * i, 0.0, 0.0]) for i in range(12)],
        "vec_id int, v array<double>",
    )
    with pytest.raises(ValueError, match="Raise n_cells"):
        semantic_dedup(
            df, "vec_id", "v", n_cells=2, threshold=0.99, max_cell_rows=4
        )
    # disabling the guard runs the quadratic plan deliberately
    kept = semantic_dedup(
        df, "vec_id", "v", n_cells=2, threshold=0.999999,
        max_cell_rows=None,
    )
    assert kept.count() >= 1
    # the default cap is far above gate-scale cells: normal runs unaffected
    assert semantic_dedup(
        df, "vec_id", "v", n_cells=2, threshold=1.01
    ).count() == 12


def test_pq_batch_topk_matches_single_query(spark):
    """The batched ADC (per-query LUTs, one plan for N queries) must return
    exactly the single-query pq_topk result for each query id."""
    from s3parq_spark.operators import pq_batch_topk, pq_topk

    import random

    rng = random.Random(7)
    df = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)],
        "vec_id int, v array<double>",
    )
    q = df.filter("vec_id < 3")
    batch = pq_batch_topk(df, "vec_id", "v", q, k=5, m=2, codes=4)
    got = {
        qid: [(r["vec_id"], r["adc"]) for r in rows]
        for qid, rows in (
            (qid, sorted(
                (r for r in batch.collect() if r["query_id"] == qid),
                key=lambda r: (-r["adc"], r["vec_id"]),
            ))
            for qid in (0, 1, 2)
        )
    }
    for qid in (0, 1, 2):
        single = pq_topk(
            df, "vec_id", "v", df.filter(f"vec_id = {qid}"), k=5, m=2, codes=4
        )
        want = [(r["vec_id"], r["adc"]) for r in single.collect()]
        assert got[qid] == want, f"query {qid} diverged"


def test_ivf_pq_batch_topk_matches_single_query(spark):
    """The batched IVF-PQ (JVM-side probe selection + per-query ADC LUTs)
    must return exactly the single-query ivf_pq_topk result per query."""
    import random

    from s3parq_spark.operators import ivf_pq_batch_topk, ivf_pq_topk

    rng = random.Random(11)
    df = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)],
        "vec_id int, v array<double>",
    )
    kw = dict(k=5, n_cells=4, n_probe=2, m=2, codes=4,
              coarse_iters=1, pq_iters=1)
    batch = ivf_pq_batch_topk(
        df, "vec_id", "v", df.filter("vec_id < 3"), **kw
    ).collect()
    for qid in (0, 1, 2):
        got = sorted(
            ((r["vec_id"], r["adc"]) for r in batch if r["query_id"] == qid),
            key=lambda t: (-t[1], t[0]),
        )
        single = ivf_pq_topk(
            df, "vec_id", "v", df.filter(f"vec_id = {qid}"), **kw
        )
        want = [(r["vec_id"], r["adc"]) for r in single.collect()]
        assert got == want, f"query {qid} diverged"


def test_linear_quality_classifier(spark):
    from s3parq_spark.operators import linear_quality_classifier

    df = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa aa aa"), (3, "zz")], ["doc_id", "text"]
    )
    rows = {
        r.doc_id: r
        for r in linear_quality_classifier(df, "text", n_features=64).collect()
    }
    assert rows[1].n_tokens == 3 and rows[3].n_tokens == 1
    # replay the arithmetic in python for one token
    import hashlib

    def w(tok, nf=64, scale=1 << 20):
        b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % nf
        return b * 2654435761 % scale - scale // 2

    assert rows[3].score == w("zz") / (1 << 20)
    assert rows[2].score == w("aa") / (1 << 20)  # mean of 3 equal weights
    assert abs(rows[1].score - (w("aa") + w("bb") + w("cc")) / 3 / (1 << 20)) < 1e-12
    for r in rows.values():
        assert r.keep == (r.score > 0.0)
    # deterministic across calls
    again = {
        r.doc_id: r.score
        for r in linear_quality_classifier(df, "text", n_features=64).collect()
    }
    assert {k: v.score for k, v in rows.items()} == again


def test_pq_encode_and_adc_topk(spark, emb):
    from s3parq_spark.operators import pq_encode, pq_topk

    enc, books = pq_encode(emb, "vec_id", "embedding", m=4, codes=8)
    assert len(books) == 4 and all(len(b) <= 8 for b in books)
    assert all(len(c) == 16 for b in books for c in b)  # dim 64 / m 4
    row = enc.select("__code_0", "__code_1", "__code_2", "__code_3").first()
    for j in range(4):
        assert 0 <= row[f"__code_{j}"] < 8
    # codes compress the corpus: distinct code tuples << corpus size
    n_tuples = enc.select("__code_0", "__code_1", "__code_2", "__code_3").distinct().count()
    assert n_tuples <= 8 ** 4

    q = emb.filter(F.col("vec_id") == 0)
    top = pq_topk(emb, "vec_id", "embedding", q, k=5, m=4, codes=8)
    rows = top.collect()
    assert len(rows) == 5
    assert all(r.vec_id != 0 for r in rows)
    scores = [r.adc for r in rows]
    assert scores == sorted(scores, reverse=True)
    # deterministic rebuild: same top-5
    again = pq_topk(emb, "vec_id", "embedding", q, k=5, m=4, codes=8).collect()
    assert [(r.vec_id, r.adc) for r in rows] == [(r.vec_id, r.adc) for r in again]
    # ADC approximates the exact search: its top-5 overlaps exact top-20
    from s3parq_spark.operators import brute_force_cosine_topk

    exact = {
        r.vec_id
        for r in brute_force_cosine_topk(emb, "vec_id", "embedding", q, k=20).collect()
    }
    assert len({r.vec_id for r in rows} & exact) >= 2


def test_ivf_pq_topk(spark, emb):
    from s3parq_spark.operators import ivf_pq_topk, pq_topk

    q = emb.filter(F.col("vec_id") == 0)
    top = ivf_pq_topk(
        emb, "vec_id", "embedding", q, k=5, n_cells=16, n_probe=4,
        m=4, codes=8,
    )
    rows = top.collect()
    assert len(rows) == 5
    assert all(r.vec_id != 0 for r in rows)
    scores = [r.adc for r in rows]
    assert scores == sorted(scores, reverse=True)
    # deterministic rebuild under a different partitioning
    again = ivf_pq_topk(
        emb.repartition(7), "vec_id", "embedding", q, k=5, n_cells=16,
        n_probe=4, m=4, codes=8,
    ).collect()
    assert [(r.vec_id, r.adc) for r in rows] == [
        (r.vec_id, r.adc) for r in again
    ]
    # probing ALL cells degenerates to the plain PQ ADC scan: identical
    # top-k — cell pruning only ever removes candidates, never rescores
    full = ivf_pq_topk(
        emb, "vec_id", "embedding", q, k=5, n_cells=16, n_probe=16,
        m=4, codes=8, coarse_iters=1, pq_iters=1,
    ).collect()
    flat = pq_topk(
        emb, "vec_id", "embedding", q, k=5, m=4, codes=8, kmeans_iters=1
    ).collect()
    assert [(r.vec_id, r.adc) for r in full] == [
        (r.vec_id, r.adc) for r in flat
    ]


def test_hard_negative_mining(spark, emb):
    from s3parq_spark.operators.similarity import hard_negative_mining

    out = hard_negative_mining(
        emb.filter(F.col("vec_id") < 200), "vec_id", "embedding", "label",
        k=3, dim=64, planes=4,
    )
    rows = out.collect()
    assert rows, "no negatives mined"
    by_anchor = {}
    for r in rows:
        by_anchor.setdefault(r.vec_id, []).append(r)
    labels = {r.vec_id: r.label for r in
              emb.filter(F.col("vec_id") < 200).select("vec_id", "label").collect()}
    for anchor, negs in by_anchor.items():
        assert len(negs) <= 3
        # every negative has a different label and never the anchor itself
        for n in negs:
            assert n.neg_label != labels[anchor]
            assert n.neg_id != anchor
        # ranked best-first
        cs = [n.cosine for n in sorted(negs, key=lambda x: x.rk)]
        assert cs == sorted(cs, reverse=True)
    # deterministic under repartitioning
    again = hard_negative_mining(
        emb.filter(F.col("vec_id") < 200).repartition(7), "vec_id",
        "embedding", "label", k=3, dim=64, planes=4,
    ).collect()
    assert sorted((r.vec_id, r.neg_id, r.rk) for r in rows) == sorted(
        (r.vec_id, r.neg_id, r.rk) for r in again
    )


def test_oov_rate(spark, sf_dir):
    from s3parq_spark.operators.text import oov_rate

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a c"), (3, "x y z")], ["doc_id", "text"]
    )
    out = {r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate)
           for r in oov_rate(docs, "doc_id", "text", vocab_size=2).collect()}
    # vocab = top-2 by count desc, token asc: 'a' (4), then 'b'/'c'/'x'/'y'/'z'
    # all have 1 -> 'b' wins the tiebreak
    assert out[1] == (4, 0, 0.0)            # a,a,a,b all in vocab
    assert out[2] == (2, 1, 0.5)            # c is OOV
    assert out[3] == (3, 3, 1.0)            # x,y,z all OOV


class TestEmbeddingOutliers:
    def test_far_vector_flagged(self, spark):
        from s3parq_spark.operators.similarity import embedding_outliers

        rows = [(i, [0.0, 0.0], "a") for i in range(10)]
        rows += [(98, [0.1, 0.0], "a"), (99, [50.0, 50.0], "a")]
        df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        out = {r["vec_id"]: r for r in
               embedding_outliers(df, "vec_id", "embedding", "label").collect()}
        assert out[99]["is_outlier"] is True
        assert all(not out[i]["is_outlier"] for i in range(10))
        # a correctly-placed vector in a tight cluster stays in
        assert out[98]["is_outlier"] is False

    def test_degenerate_label_no_flags(self, spark):
        from s3parq_spark.operators.similarity import embedding_outliers

        # single-member label: distance 0, std undefined -> coalesced 0,
        # never flagged (0 > 0 is false)
        df = spark.createDataFrame(
            [(1, [1.0, 2.0], "solo")], ["vec_id", "embedding", "label"]
        )
        r = embedding_outliers(df, "vec_id", "embedding", "label").collect()[0]
        assert r["is_outlier"] is False and r["dist"] == 0.0


class TestDecontaminateSemantic:
    def test_near_benchmark_vectors_dropped(self, spark):
        from s3parq_spark.operators.similarity import decontaminate_semantic

        bench = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0])], ["vec_id", "embedding"]
        )
        corpus = spark.createDataFrame(
            [
                (10, [0.99, 0.1, 0.0], "keepable?"),   # ~ parallel to bench
                (11, [0.0, 1.0, 0.0], "orthogonal"),
                (12, [-1.0, 0.0, 0.0], "opposite"),
            ],
            ["vec_id", "embedding", "tag"],
        )
        kept = decontaminate_semantic(
            corpus, "vec_id", "embedding", bench, threshold=0.9
        )
        assert sorted(r["vec_id"] for r in kept.collect()) == [11, 12]
        # payload columns ride through untouched
        assert kept.columns == corpus.columns

    def test_empty_benchmark_keeps_everything(self, spark):
        from s3parq_spark.operators.similarity import decontaminate_semantic

        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0])], ["vec_id", "embedding"]
        )
        bench = corpus.filter("vec_id < 0")
        assert decontaminate_semantic(
            corpus, "vec_id", "embedding", bench
        ).count() == 1

    def test_zero_vector_never_similar(self, spark):
        from s3parq_spark.operators.similarity import decontaminate_semantic

        bench = spark.createDataFrame(
            [(0, [1.0, 0.0])], ["vec_id", "embedding"]
        )
        corpus = spark.createDataFrame(
            [(10, [0.0, 0.0]), (11, [1.0, 0.0])], ["vec_id", "embedding"]
        )
        kept = decontaminate_semantic(
            corpus, "vec_id", "embedding", bench, threshold=0.5
        )
        # the zero vector's cosine is undefined -> kept; the parallel
        # vector is dropped
        assert [r["vec_id"] for r in kept.collect()] == [10]


def test_deterministic_sample_threshold_rounds_not_truncates(spark):
    """round(fraction*RESOLUTION), never int(): 0.57*10000 is
    5699.999999999999 in floats, and truncation would disagree with every
    engine (and oracle) that rounds."""
    import hashlib

    from s3parq_spark.operators import deterministic_sample

    df = spark.createDataFrame([(str(i),) for i in range(400)], ["id"])

    def bucket(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 10_000

    for frac in (0.57, 0.043, 0.5):
        got = {r["id"] for r in deterministic_sample(df, "id", frac).collect()}
        want = {
            str(i) for i in range(400)
            if bucket(str(i)) < round(frac * 10_000)
        }
        assert got == want, frac


def test_null_partition_selectable_via_eq_none(spark, tmp_path):
    """'== [None]' selects the __HIVE_DEFAULT_PARTITION__ rows (IS NULL
    semantics — the one extension over SQL 3-valued logic, which otherwise
    makes the NULL partition unreachable through filters); '!=' keeps SQL
    semantics and does NOT return them."""
    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.publish import publish_path

    ds = str(tmp_path / "nullsel")
    df = spark.createDataFrame(
        [(1, None, 1.0), (2, "a", 2.0), (3, "b", 3.0)],
        "k int, p string, v double",
    )
    publish_path(spark, ds, df, ["p"])
    eq_null = fetch_path(
        spark, ds,
        filters=[{"partition": "p", "comparison": "==", "values": [None]}],
    )
    assert [r["k"] for r in eq_null.collect()] == [1]
    mixed = fetch_path(
        spark, ds,
        filters=[{"partition": "p", "comparison": "==",
                  "values": ["a", None]}],
    )
    assert sorted(r["k"] for r in mixed.collect()) == [1, 2]
    neq = fetch_path(
        spark, ds,
        filters=[{"partition": "p", "comparison": "!=", "values": ["a"]}],
    )
    assert sorted(r["k"] for r in neq.collect()) == [3]  # SQL: NULL != 'a' -> NULL


def test_kmeans_skips_null_embeddings_and_guards_queries(spark):
    import pytest

    from s3parq_spark.operators import ivf_topk, kmeans_centroids

    df = spark.createDataFrame(
        [(0, None), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id int, v array<double>",
    )
    # NULL vector among the k lowest ids must not crash training
    cents = kmeans_centroids(df, "vec_id", "v", k=2, iters=1)
    assert len(cents) == 2
    # empty / NULL-vector queries refuse loudly instead of TypeError
    with pytest.raises(ValueError, match="empty"):
        ivf_topk(df, "vec_id", "v", df.filter("vec_id = 99"), k=2, n_cells=2)
    with pytest.raises(ValueError, match="NULL"):
        ivf_topk(df, "vec_id", "v", df.filter("vec_id = 0"), k=2, n_cells=2)


def test_batch_topk_keeps_colliding_ids_for_distinct_query_space(spark):
    """With a distinct query_id_col, a corpus row whose id equals a query
    id is an UNRELATED document and must stay in that query's candidates
    (the old filter silently dropped its true-neighbor rank)."""
    from s3parq_spark.operators import batch_cosine_topk

    corpus = spark.createDataFrame(
        [(7, [1.0, 0.0]), (8, [0.0, 1.0])], "doc_id int, v array<double>"
    )
    queries = spark.createDataFrame(
        [(7, [1.0, 0.0])], "qid int, v array<double>"
    )
    got = batch_cosine_topk(
        corpus, "doc_id", "v", queries, k=2, query_id_col="qid"
    ).collect()
    ids = sorted(r["doc_id"] for r in got)
    assert ids == [7, 8], "doc 7 must not be excluded for query qid=7"


def test_hyperplane_signature_dim_mismatch_raises(spark):
    import pytest

    from s3parq_spark.operators import lsh_bucketed_topk

    df = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [0.5] * 8)], "vec_id int, v array<double>"
    )
    q = df.filter("vec_id = 1")
    with pytest.raises(Exception, match="hyperplane_signature"):
        lsh_bucketed_topk(df, "vec_id", "v", q, dim=4, k=2).collect()
    # matching dim still works
    assert lsh_bucketed_topk(df, "vec_id", "v", q, dim=8, k=2).count() >= 0


class TestPerceptualHash:
    """aHash media fingerprinting (r8): JVM fake-decode path == the pure
    Python model, NULL/empty semantics, LSH banding soundness."""

    def test_matches_python_model(self, spark, sf_dir):
        from s3parq_spark.operators import attach_binary_payload, perceptual_hash
        from s3parq_spark.operators.multimodal import _ahash_from_pixels

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
        got = perceptual_hash(
            attach_binary_payload(docs, "text"), "doc_id"
        ).select("doc_id", "text", "ahash").collect()
        for r in got:
            exp = (
                _ahash_from_pixels([ord(c) for c in r["text"]])
                if r["text"] else None
            )
            assert r["ahash"] == exp, r["doc_id"]

    def test_null_and_empty_payloads(self, spark):
        from s3parq_spark.operators import attach_binary_payload, perceptual_hash

        df = spark.createDataFrame(
            [(1, "hello world"), (2, ""), (3, None)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["ahash"]
            for r in perceptual_hash(
                attach_binary_payload(df, "text"), "doc_id"
            ).collect()
        }
        assert got[1] is not None and got[2] is None and got[3] is None

    def test_banding_catches_all_close_pairs(self, spark):
        from s3parq_spark.operators import attach_binary_payload, phash_neardup_pairs
        from s3parq_spark.operators.multimodal import _ahash_from_pixels

        base = "the quick brown fox jumps over the lazy dog " * 4
        variants = [base, base.replace("quick", "quack"),
                    base.replace("dog", "cat"), "completely different text"]
        rows = [(i, t) for i, t in enumerate(variants)]
        df = attach_binary_payload(
            spark.createDataFrame(rows, "doc_id long, text string"), "text"
        )
        pairs = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in phash_neardup_pairs(df, "doc_id", max_hamming=3).collect()
        }
        # exhaustive model: every pair within hamming 3 must be emitted
        # (pigeonhole guarantee: <= bands-1 differing bits always share a band)
        hashes = {i: _ahash_from_pixels([ord(c) for c in t]) for i, t in rows}
        expected = {
            (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
            for a in hashes for b in hashes
            if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= 3
        }
        assert pairs == expected

    def test_injected_decoder_path(self, spark):
        from s3parq_spark.operators import attach_binary_payload, perceptual_hash
        from s3parq_spark.operators.multimodal import _ahash_from_pixels

        df = attach_binary_payload(
            spark.createDataFrame([(1, "abcdefgh" * 10)], "doc_id long, text string"),
            "text",
        )
        decode = lambda payload: list(payload)  # bytes as pixels
        got = perceptual_hash(df, "doc_id", decode=decode).collect()[0]
        assert got["ahash"] == _ahash_from_pixels(list(("abcdefgh" * 10).encode()))


def test_pq_encode_validates_supplied_books(spark, sf_dir):
    """r10 review: pre-trained codebooks must match m, codes AND the
    subspace dim — a books=16-codes cache fed into a codes=8 call would
    otherwise silently encode against the wrong cardinality."""
    import pytest

    from s3parq_spark.operators.similarity import pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(64)
    _, books = pq_encode(emb, "vec_id", "embedding", m=4, codes=8)
    # round trip: the same books re-encode fine
    enc, books2 = pq_encode(
        emb, "vec_id", "embedding", m=4, codes=8, books=books
    )
    assert books2 == books and enc.limit(1).count() == 1
    # codes is an UPPER bound for supplied books: small-corpus training
    # returns fewer centroids and those books must round-trip...
    _, books3 = pq_encode(
        emb, "vec_id", "embedding", m=4, codes=16, books=books
    )
    assert books3 == books
    # ...but books trained at a HIGHER cardinality than declared reject
    _, books16 = pq_encode(emb, "vec_id", "embedding", m=4, codes=16)
    if any(len(b) > 8 for b in books16):
        with pytest.raises(ValueError, match="codes=8"):
            pq_encode(
                emb, "vec_id", "embedding", m=4, codes=8, books=books16
            )
    with pytest.raises(ValueError, match="do not match m=2"):
        pq_encode(emb, "vec_id", "embedding", m=2, codes=8, books=books)


def test_trained_cvecs_round_trip_small_corpus(spark, sf_dir):
    """r10 third review: trained coarse centroids are capped at corpus
    size by training itself — its own output must round-trip through
    trained=; only HIGHER-cardinality supplies reject."""
    import pytest

    from s3parq_spark.operators.similarity import (
        ivf_pq_batch_topk, kmeans_centroids, pq_encode,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(10)
    cvecs = kmeans_centroids(emb, "vec_id", "embedding", k=16, iters=1)
    assert len(cvecs) <= 16
    _, books = pq_encode(emb, "vec_id", "embedding", m=4, codes=8, kmeans_iters=1)
    q = emb.limit(2)
    out = ivf_pq_batch_topk(
        emb, "vec_id", "embedding", q, k=3, n_cells=16, n_probe=4,
        m=4, codes=8, trained=(cvecs, books),
    )
    assert out.count() > 0
    with pytest.raises(ValueError, match="> n_cells"):
        ivf_pq_batch_topk(
            emb, "vec_id", "embedding", q, k=3,
            n_cells=max(1, len(cvecs) - 1), n_probe=2,
            m=4, codes=8, trained=(cvecs, books),
        )


def test_media_checksum_parity_vectorized(spark):
    """r16: media_features' checksum moved from a pure-Python byte sum to
    numpy — values must be identical, including empty payloads."""
    import random

    from s3parq_spark.operators.multimodal import extract_binary_features

    rng = random.Random(7)
    rows = [
        (i, bytes(rng.randrange(256) for _ in range(n)))
        for i, n in enumerate((0, 1, 3, 257, 10_000))
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: (r["byte_len"], r["first_byte"], r["checksum"])
        for r in extract_binary_features(df, "media_id").collect()
    }
    M = 9_223_372_036_854_775_807
    for i, p in rows:
        exp = (len(p), p[0] if p else -1, int(sum(p) % M))
        assert got[i] == exp, (i, got[i], exp)
