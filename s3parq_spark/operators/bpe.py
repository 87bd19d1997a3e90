"""Distributed byte-pair-encoding tokenizer training and application.

Training a BPE vocabulary is the canonical pre-training corpus job the
reference never had: count adjacent symbol pairs across the corpus, merge
the most frequent pair, repeat. Expressed Spark-first:

- the corpus collapses ONCE to the (word, freq) table — all later passes
  run over distinct words weighted by frequency (orders of magnitude
  smaller than the corpus; the standard Sennrich et al., ACL'16 trick);
- each merge round is one explode → hash-aggregate (map-side partials) for
  pair counts, and one JVM-side `aggregate` fold that rewrites every
  word's symbol array — no Python in the loop, driver holds only the
  winning pair;
- the learned merge list applies to unseen text through an Arrow-batched
  ``mapInPandas`` (real tokenizers carry 10⁴–10⁵ merges — that is data,
  not expression trees).

Determinism: ties on pair count break lexicographically, so the learned
vocabulary is identical across cluster sizes and partitionings.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace tokens — the working set for training."""
    return (
        df.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_fold(a: str, b: str):
    """Fold symbols left-to-right, replacing each adjacent (a, b) with a+b.

    Greedy left-to-right, non-overlapping — after a merge the new symbol
    cannot re-trigger with the following one, matching reference BPE.
    """
    sa, sb = a.replace("'", "\\'"), b.replace("'", "\\'")
    return F.expr(
        "aggregate(__syms, CAST(array() AS ARRAY<STRING>)," \
        f" (acc, x) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{sa}'" \
        f"                   AND x = '{sb}'" \
        f"             THEN concat(slice(acc, 1, size(acc) - 1), array('{sa}{sb}'))" \
        "              ELSE concat(acc, array(x)) END)"
    )


#: sequential-round ceiling: each round is one Spark job, so a run that
#: needs more rounds than this would train by driver round-trip — raise
#: ``batch_merges`` (fast-trainer batching) or train on a word-freq sample.
_BPE_MAX_ROUNDS = 10_000


def bpe_learn(
    df: DataFrame, text_col: str, n_merges: int = 10, batch_merges: int = 1
) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list. Each round: one pair-count aggregate over the (distinct
    word, freq) table + one composed array rewrite, both JVM-side.

    ``batch_merges`` bounds how many merges land per round (per Spark
    job). The default 1 is exact sequential BPE. With ``batch_merges=k``
    the round takes the pair ranking once and greedily accepts up to k
    pairs whose symbols are pairwise DISJOINT — disjoint pairs' counts
    don't change when the others apply, so each accepted pair would have
    won its own round against the rest of the batch; the k rewrites
    compose into ONE projection (one job). This is the standard
    fast-trainer batching: the learned list can deviate from strict
    sequential order only when a pair newly CREATED mid-batch would have
    outranked a later batch member (its count is bounded by the creating
    merge's count, so deviations sit inside count ties). A real 32k-merge
    vocabulary at ``batch_merges=256`` is ~125 rounds instead of 32k
    sequential jobs.

    Guard: training that would need more than ``_BPE_MAX_ROUNDS``
    sequential rounds raises up front — that geometry means the driver
    loop, not the cluster, is the trainer; raise ``batch_merges`` or
    train on a word-frequency sample of the corpus.
    """
    if batch_merges < 1:
        raise ValueError("bpe_learn: batch_merges must be >= 1")
    rounds_needed = -(-n_merges // batch_merges)
    if rounds_needed > _BPE_MAX_ROUNDS:
        raise ValueError(
            f"bpe_learn: {n_merges} merges at batch_merges={batch_merges} "
            f"means {rounds_needed} sequential Spark jobs "
            f"(> {_BPE_MAX_ROUNDS}) — the driver loop would be the "
            "trainer, not the cluster. Raise batch_merges (disjoint-pair "
            "batching keeps rounds ≈ n_merges/batch_merges) or train on "
            "a word-frequency sample."
        )
    words = word_freq_table(df, text_col).withColumn(
        # character symbols; split(limit=-1) keeps a trailing empty match
        "__syms",
        F.filter(F.split(F.col("word"), "(?!^)"), lambda x: x != ""),
    ).localCheckpoint(eager=True)

    merges: List[Tuple[str, str]] = []
    pair_expr = F.expr(
        "transform(sequence(1, size(__syms) - 1),"
        " i -> struct(element_at(__syms, i) AS a, element_at(__syms, i + 1) AS b))"
    )
    while len(merges) < n_merges:
        want = min(batch_merges, n_merges - len(merges))
        ranked = (
            words.filter(F.size("__syms") >= 2)
            .select(F.explode(pair_expr).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            # over-fetch so disjointness filtering can still fill the batch
            .limit(want * 4)
            .collect()
        )
        if not ranked:
            break
        batch: List[Tuple[str, str]] = []
        used: set = set()
        for r in ranked:
            if len(batch) >= want:
                break
            a, b = r["a"], r["b"]
            if a in used or b in used or (a + b) in used:
                continue
            batch.append((a, b))
            used.update((a, b, a + b))
        merges.extend(batch)
        for a, b in batch:
            # lazy: Catalyst composes the batch's folds into one projection
            words = words.withColumn("__syms", _merge_fold(a, b))
        words = words.localCheckpoint(eager=True)
    return merges


def bpe_apply(
    df: DataFrame, text_col: str, merges: List[Tuple[str, str]], out_col: str = "tokens"
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list via Arrow-batched
    ``mapInPandas`` — the merge table is captured in the closure (broadcast
    with the serialized function), applied in merge-priority order per
    word. Output schema: input columns + ``out_col array<string>``."""
    import pandas as pd

    from pyspark.sql import types as T

    rank = {m: i for i, m in enumerate(merges)}
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def encode_word(word: str) -> List[str]:
        syms = list(word)
        while len(syms) >= 2:
            best, best_i = None, -1
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, best_i = r, i
            if best is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col].astype(str):
                out: List[str] = []
                for w in text.split():
                    if w not in cache:
                        cache[w] = encode_word(w)
                    out.extend(cache[w])
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    return df.mapInPandas(run, out_schema)
