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


def bpe_learn(
    df: DataFrame, text_col: str, n_merges: int = 10
) -> List[Tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list. Each round: one pair-count aggregate over the (distinct
    word, freq) table + one array rewrite, both JVM-side."""
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
    for _ in range(n_merges):
        top = (
            words.filter(F.size("__syms") >= 2)
            .select(F.explode(pair_expr).alias("p"), "freq")
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.withColumn("__syms", _merge_fold(a, b)).localCheckpoint(
            eager=True
        )
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
