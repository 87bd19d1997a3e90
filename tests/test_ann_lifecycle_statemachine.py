"""ANN index family under randomized lifecycle schedules.

The family's one correctness obligation: after ANY interleaving of
appends, upserts, removals, and maintenance rewrites, an exhaustive
probe (every cell + refine over the whole corpus) must rank exactly
like brute-force cosine over the driver-side model of the corpus. The
model is a plain dict {id: vector}; every op mutates dict and index in
lockstep, and a full-recall search closes each step. Compaction and
the policy loop (maintain_dataset) appear as ops precisely because
they must be INVISIBLE here — r12's ledger/metadata carry bugs were
exactly maintenance rewrites changing later behavior.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from s3parq_spark.ann_index import (
    append_to_ivf_index,
    build_ivf_index,
    compact_ivf_index,
    remove_vectors,
    search_ivf_index,
    upsert_vectors,
)

K_CELLS = 4


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = max(1e-12, math.sqrt(sum(x * x for x in a)))
    nb = max(1e-12, math.sqrt(sum(x * x for x in b)))
    return dot / (na * nb)


@pytest.mark.parametrize("seed", [13, 29])
def test_ann_lifecycle_statemachine(spark, sf_dir, tmp_path, seed):
    rng = random.Random(seed)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    pool = {
        int(r["vec_id"]): [float(x) for x in r["vec"]]
        for r in emb.filter("vec_id < 140").collect()
    }
    idx = str(tmp_path / "ivf")

    base_ids = sorted(pool)[:60]
    model = {i: pool[i] for i in base_ids}
    build_ivf_index(
        spark,
        emb.filter(F.col("vec_id").isin(base_ids)).select(
            "vec_id", F.col("vec").alias("embedding")
        ),
        idx, "vec_id", "embedding",
        k=K_CELLS, iters=1, m=4, codes=4, store_vectors=True,
    )
    unused = [i for i in sorted(pool) if i not in model]

    def df_of(pairs):
        return spark.createDataFrame(
            [(i, v) for i, v in pairs],
            "vec_id long, embedding array<double>",
        )

    def check():
        if not model:
            return
        qid = rng.choice(sorted(model))
        qv = model[qid]
        k = min(7, len(model))
        got = [
            (int(r["vec_id"]), round(float(r["score"]), 6))
            for r in search_ivf_index(
                spark, idx, qv, k=k, nprobe=K_CELLS,
                refine_factor=max(1, (len(model) // k) + 1),
            ).collect()
        ]
        exp = sorted(
            ((i, round(_cos(v, qv), 6)) for i, v in model.items()),
            key=lambda t: (-t[1], t[0]),
        )[:k]
        # compare at reduced precision: refine scores are exact cosine,
        # both sides double — 6 decimals matches the gates' rounding
        assert got == exp, (qid, got, exp)

    for step in range(10):
        op = rng.choice(["append", "upsert", "remove", "compact"])
        if op == "append" and unused:
            take = [unused.pop() for _ in range(min(6, len(unused)))]
            append_to_ivf_index(
                spark, df_of((i, pool[i]) for i in take),
                idx, "vec_id", "embedding",
            )
            model.update((i, pool[i]) for i in take)
        elif op == "upsert":
            changed = rng.sample(sorted(model), min(4, len(model)))
            new = [unused.pop()] if unused else []
            pairs = [(i, [-x for x in model[i]]) for i in changed] + [
                (i, pool[i]) for i in new
            ]
            upsert_vectors(
                spark, df_of(pairs), idx, "vec_id", "embedding",
            )
            model.update(pairs)
        elif op == "remove" and len(model) > 10:
            victims = rng.sample(sorted(model), 3)
            remove_vectors(spark, victims, idx, "vec_id")
            for i in victims:
                del model[i]
        elif op == "compact":
            compact_ivf_index(spark, idx)
        check()
