"""BPE training: the distributed implementation must learn the SAME merge
list as a pure-Python reference BPE on the same corpus, and application
must losslessly segment (tokens rejoin to the word)."""

import collections

from pyspark.sql import functions as F

from s3parq_spark.operators.bpe import bpe_apply, bpe_learn, word_freq_table


def ref_bpe(word_freqs, n_merges):
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        newv = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            newv[key] = newv.get(key, 0) + f
        vocab = newv
    return merges


def test_bpe_learn_matches_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    got = bpe_learn(docs, "text", n_merges=8)
    wf = {r.word: r.freq for r in word_freq_table(docs, "text").collect()}
    want = ref_bpe(wf, 8)
    assert got == want


def test_bpe_apply_is_lossless_and_compresses(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    merges = bpe_learn(docs, "text", n_merges=8)
    toks = bpe_apply(docs, "text", merges)
    rows = toks.select(
        "text",
        F.concat_ws("", "tokens").alias("joined"),
        F.size("tokens").alias("n_tok"),
        F.length(F.regexp_replace("text", r"\s+", "")).alias("n_chars"),
    ).collect()
    for r in rows:
        assert r.joined == r.text.replace(" ", "")
        assert r.n_tok < r.n_chars  # merges actually compress


def test_bpe_batched_merges_are_disjoint_and_apply_losslessly(spark, sf_dir):
    """batch_merges > 1 lands several merges per Spark job: within each
    round the accepted pairs share no symbol (the disjointness that makes
    batching sound), the list still contains n_merges entries, and the
    learned tokenizer still roundtrips losslessly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    merges = bpe_learn(docs, "text", n_merges=8, batch_merges=4)
    assert len(merges) == 8
    for round_start in (0, 4):
        used = set()
        for a, b in merges[round_start:round_start + 4]:
            assert a not in used and b not in used and (a + b) not in used
            used.update((a, b, a + b))
    toks = bpe_apply(docs.limit(50), "text", merges)
    rows = toks.select(
        "text", F.concat_ws("", "tokens").alias("joined")
    ).collect()
    for r in rows:
        assert r.joined == r.text.replace(" ", "")


def test_bpe_batch_one_identical_and_round_guard(spark, sf_dir):
    import pytest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    # batch_merges=1 is byte-identical to the pre-batching sequential path
    assert bpe_learn(docs, "text", n_merges=4, batch_merges=1) == bpe_learn(
        docs, "text", n_merges=4
    )
    # absurd sequential round counts refuse up front with remediation
    with pytest.raises(ValueError, match="batch_merges"):
        bpe_learn(docs, "text", n_merges=50_000, batch_merges=1)
    with pytest.raises(ValueError, match="must be >= 1"):
        bpe_learn(docs, "text", n_merges=4, batch_merges=0)
