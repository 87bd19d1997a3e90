"""ANN index at rest with maintenance (ann_index.py): append with frozen
quantizers == rebuild with the same centroids; removal composes; probes
prune at the file index; drift is observable."""

import math

import pytest
from pyspark.sql import functions as F

from s3parq_spark.ann_index import (
    append_to_ivf_index,
    build_ivf_index,
    index_drift,
    remove_vectors,
    search_ivf_index,
)


@pytest.fixture()
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _rows(df):
    return [(r[0], round(r["score"], 9)) for r in df.collect()]


def _query_vec(emb, vid=0):
    row = emb.filter(F.col("vec_id") == vid).select(
        F.col("embedding").cast("array<double>").alias("v")
    ).first()
    return [float(x) for x in row["v"]]


def test_append_equals_rebuild_with_same_centroids(spark, emb, tmp_path):
    """The core maintenance contract (r10 verdict #3): build on a prefix,
    append the rest with the PERSISTED quantizers, and the search result
    must equal an index built over the full corpus with the SAME
    centroids (the FAISS train/add split — training never reruns)."""
    from s3parq_spark.ann_index import _load_quantizers

    path = str(tmp_path / "idx")
    base = emb.filter("vec_id < 350")
    build_ivf_index(spark, base, path, "vec_id", "embedding", k=8, iters=1)
    append_to_ivf_index(
        spark, emb.filter("vec_id >= 350"), path, "vec_id", "embedding"
    )
    qv = _query_vec(emb)
    got = _rows(search_ivf_index(spark, path, qv, k=10, nprobe=3))

    # reference: assign EVERYTHING with the same persisted centroids
    q = _load_quantizers(spark, path, "test")
    ref = str(tmp_path / "ref")
    build_ivf_index(spark, base, ref, "vec_id", "embedding", k=8, iters=1)
    qr = _load_quantizers(spark, ref, "test")
    assert q["centroids"] == qr["centroids"]  # deterministic training
    append_to_ivf_index(
        spark, emb.filter("vec_id >= 350"), ref, "vec_id", "embedding"
    )
    exp = _rows(search_ivf_index(spark, ref, qv, k=10, nprobe=3))
    assert got == exp and len(got) == 10
    # brute-force sanity inside the probed cells: top hit is the query
    # vector itself (cosine 1.0)
    assert got[0][0] == 0 and abs(got[0][1] - 1.0) < 1e-9


def test_remove_composes_and_is_idempotent(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    build_ivf_index(spark, emb, path, "vec_id", "embedding", k=8, iters=1)
    qv = _query_vec(emb)
    before = _rows(search_ivf_index(spark, path, qv, k=5, nprobe=8))
    victims = [r[0] for r in before[1:3]]
    assert remove_vectors(spark, victims, path, "vec_id") == 2
    assert remove_vectors(spark, victims, path, "vec_id") == 0
    after = _rows(search_ivf_index(spark, path, qv, k=5, nprobe=8))
    assert not {v for v, _ in after} & set(victims)
    # ranks shift up by exactly the removed entries (nprobe=8 == k: the
    # probe set is the whole index, so the orders must agree)
    kept = [x for x in before if x[0] not in victims]
    assert after[:3] == kept[:3]


def test_probe_prunes_at_file_index_and_pq_payload(spark, emb, tmp_path):
    """PQ flavor: rows store m code ints only; the probe's scan must show
    a cell PartitionFilter (file-index prune, not a row filter)."""
    path = str(tmp_path / "idx")
    build_ivf_index(
        spark, emb.filter("vec_id < 400"), path, "vec_id", "embedding",
        k=8, iters=1, m=4, codes=8,
    )
    append_to_ivf_index(
        spark, emb.filter("vec_id >= 400"), path, "vec_id", "embedding"
    )
    from s3parq_spark import metadata

    meta = metadata.read_sidecar(spark, path)
    assert sorted(meta.column_types) == [
        "cell", "code_0", "code_1", "code_2", "code_3", "vec_id",
    ]
    qv = _query_vec(emb, vid=1)
    out = search_ivf_index(spark, path, qv, k=10, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    i = plan.find("PartitionFilters")
    assert i >= 0 and "cell" in plan[i:i + 200], plan[i:i + 200]
    rows = out.collect()
    assert len(rows) == 10
    # ADC self-score: the query's own row scores its quantized self-dot
    assert rows[0]["vec_id"] == 1 or rows[0]["score"] >= rows[-1]["score"]


def test_drift_signal_and_health_integration(spark, tmp_path):
    """Synthetic clustered corpus so the error levels are controlled:
    training vectors sit in 4 tight clusters on dims 0..3; in-
    distribution appends quantize as well as training (ratio ~ 1);
    out-of-distribution appends live on dims 4..7 — near-orthogonal to
    every centroid — and must spike the appended error."""
    from s3parq_spark.maintenance import dataset_health

    def vecs(ids, base_dim):
        rows = []
        for i in ids:
            v = [0.0] * 8
            v[base_dim + (i % 4)] = 1.0
            # in-cluster spread decorrelated from the cluster id (i//4),
            # so each cluster holds TWO variants and train qerr is > 0
            v[(base_dim + 4 + ((i // 4) % 2)) % 8] = 0.05
            rows.append((i, v))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    path = str(tmp_path / "idx")
    build_ivf_index(
        spark, vecs(range(100), 0), path, "vec_id", "embedding",
        k=4, iters=2,
    )
    d0 = index_drift(spark, path)
    assert d0["appended_qerr"] is None and 0.0 <= d0["train_qerr"] < 0.2
    h = dataset_health(spark, path)
    assert "ann_train_qerr" in h and "ann_drift_ratio" not in h
    # in-distribution appends: drift ratio stays near 1
    append_to_ivf_index(
        spark, vecs(range(100, 200), 0), path, "vec_id", "embedding"
    )
    d1 = index_drift(spark, path)
    assert d1["appended_n"] == 100 and d1["drift_ratio"] is not None
    assert 0.5 < d1["drift_ratio"] < 2.0
    # out-of-distribution appends must RAISE the appended error
    append_to_ivf_index(
        spark, vecs(range(200, 300), 4), path, "vec_id", "embedding"
    )
    d2 = index_drift(spark, path)
    assert d2["appended_qerr"] > 2 * d1["appended_qerr"]
    assert d2["drift_ratio"] > 2.0
    h2 = dataset_health(spark, path)
    assert math.isclose(h2["ann_drift_ratio"], d2["drift_ratio"])


def test_key_mismatch_and_missing_index_fail_loudly(spark, emb, tmp_path):
    path = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="no quantizer sidecar"):
        search_ivf_index(spark, path, [0.0] * 8)
    build_ivf_index(
        spark, emb.filter("vec_id < 100"), path, "vec_id", "embedding",
        k=4, iters=1,
    )
    with pytest.raises(ValueError, match="keyed by"):
        append_to_ivf_index(
            spark, emb.withColumnRenamed("vec_id", "other"), path,
            "other", "embedding",
        )
    with pytest.raises(ValueError, match="keyed by"):
        remove_vectors(spark, [1], path, "other")


def test_upsert_replaces_and_reassigns_cells(spark, tmp_path):
    """upsert_vectors: a changed vector must leave its old cell and be
    found in the cell the frozen centroids now assign — probing the OLD
    cell alone no longer returns it, the NEW cell does, and the global
    top-1 for its new position is itself."""
    from s3parq_spark.ann_index import upsert_vectors

    def vecs(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    base = []
    for i in range(80):
        v = [0.0] * 8
        v[i % 4] = 1.0
        v[4 + ((i // 4) % 2)] = 0.05
        base.append((i, v))
    path = str(tmp_path / "idx")
    build_ivf_index(spark, vecs(base), path, "vec_id", "embedding",
                    k=4, iters=2)
    # move vector 5 (cluster 1) to cluster 2's region
    moved = [0.0] * 8
    moved[2] = 1.0
    moved[4] = 0.05
    assert upsert_vectors(
        spark, vecs([(5, moved), (9000, [0.0] * 7 + [1.0])]),
        path, "vec_id", "embedding",
    ) == 1  # 5 replaced, 9000 inserted
    got = _rows(search_ivf_index(spark, path, moved, k=3, nprobe=1))
    assert 5 in {i for i, _ in got}
    # the old cluster's probe no longer sees id 5
    old = [0.0] * 8
    old[1] = 1.0
    old_hits = _rows(search_ivf_index(spark, path, old, k=80, nprobe=1))
    assert 5 not in {i for i, _ in old_hits}
    # re-running the same upsert converges (now both ids replace)
    assert upsert_vectors(
        spark, vecs([(5, moved), (9000, [0.0] * 7 + [1.0])]),
        path, "vec_id", "embedding",
    ) == 2
    import pytest as _pt

    with _pt.raises(ValueError, match="unique"):
        upsert_vectors(
            spark, vecs([(1, moved), (1, moved)]), path,
            "vec_id", "embedding",
        )


def test_maintain_dataset_ann_drift_advisory(spark, tmp_path):
    from s3parq_spark.maintenance import maintain_dataset

    def vecs(ids, base_dim):
        rows = []
        for i in ids:
            v = [0.0] * 8
            v[base_dim + (i % 4)] = 1.0
            v[(base_dim + 4 + ((i // 4) % 2)) % 8] = 0.05
            rows.append((i, v))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    path = str(tmp_path / "idx")
    build_ivf_index(spark, vecs(range(100), 0), path, "vec_id",
                    "embedding", k=4, iters=2)
    rep = maintain_dataset(spark, path, dry_run=True)
    assert not [a for a in rep["actions"]
                if a["action"] == "rebuild_ivf_index"]
    # out-of-distribution appends push the ratio past the threshold
    append_to_ivf_index(spark, vecs(range(200, 300), 4), path,
                        "vec_id", "embedding")
    rep = maintain_dataset(spark, path, dry_run=True)
    adv = [a for a in rep["actions"] if a["action"] == "rebuild_ivf_index"]
    assert adv and "build_ivf_index" in adv[0]["advisory"]


def test_batch_search_equals_per_query(spark, emb, tmp_path):
    """search_ivf_index_batch: one pruned pass over the union of the
    queries' probed cells must reproduce each per-query search
    bit-for-bit — flat (exact cosine) and PQ (per-query ADC LUTs on the
    broadcast frame) flavors both."""
    from s3parq_spark.ann_index import search_ivf_index_batch

    queries = {
        "a": _query_vec(emb, 0),
        "b": _query_vec(emb, 7),
        "c": [0.1] * len(_query_vec(emb, 0)),
    }
    for kwargs in ({"k": 8, "iters": 1},
                   {"k": 8, "iters": 1, "m": 4, "codes": 8}):
        path = str(tmp_path / f"idx_{'pq' if 'm' in kwargs else 'flat'}")
        build_ivf_index(spark, emb, path, "vec_id", "embedding", **kwargs)
        got = search_ivf_index_batch(spark, path, queries, k=5, nprobe=3)
        by_q = {}
        for r in got.collect():
            by_q.setdefault(r["query_id"], []).append(
                (r["vec_id"], round(r["score"], 9))
            )
        for qid, qv in queries.items():
            exp = _rows(search_ivf_index(spark, path, qv, k=5, nprobe=3))
            assert by_q.get(qid, []) == exp, (path, qid)
        # the one scan is pruned to the union of probed cells
        plan = got._jdf.queryExecution().executedPlan().toString()
        i = plan.find("PartitionFilters")
        assert i >= 0 and "cell" in plan[i:i + 200]


def test_pq_refine_recovers_exact_ranking(spark, emb, tmp_path):
    """FAISS IndexRefineFlat shape: PQ + store_vectors — ADC selects
    candidates, their true vectors point-fetch from the id-bloomed
    companion, exact cosine re-ranks. With a refine pool covering the
    probed cells, the result must EQUAL a flat index's exact search
    over the same cells; maintenance keeps the companion in step."""
    from s3parq_spark.ann_index import upsert_vectors

    pq = str(tmp_path / "pq")
    build_ivf_index(
        spark, emb.filter("vec_id < 400"), pq, "vec_id", "embedding",
        k=8, iters=1, m=4, codes=8, store_vectors=True,
    )
    append_to_ivf_index(
        spark, emb.filter("vec_id >= 400"), pq, "vec_id", "embedding"
    )
    # the flat reference must share the PQ index's coarse quantizer:
    # same training prefix + append (deterministic training makes the
    # centroids — and so the probed cell membership — identical)
    flat = str(tmp_path / "flat")
    build_ivf_index(spark, emb.filter("vec_id < 400"), flat, "vec_id",
                    "embedding", k=8, iters=1)
    append_to_ivf_index(
        spark, emb.filter("vec_id >= 400"), flat, "vec_id", "embedding"
    )
    qv = _query_vec(emb, 3)
    # pool big enough to cover the probed cells: exact == flat exact
    got = _rows(search_ivf_index(spark, pq, qv, k=10, nprobe=3,
                                 refine_factor=100))
    exp = _rows(search_ivf_index(spark, flat, qv, k=10, nprobe=3))
    assert got == exp and got[0][0] == 3 and abs(got[0][1] - 1.0) < 1e-9
    # small pool: still exact cosines, k rows, self on top
    small = _rows(search_ivf_index(spark, pq, qv, k=5, nprobe=3,
                                   refine_factor=2))
    assert len(small) == 5 and small[0][0] == 3
    assert all(abs(s) <= 1.0 + 1e-9 for _, s in small)
    # removal tombstones the companion too: a removed id cannot
    # resurface through the refine path
    remove_vectors(spark, [got[1][0]], pq, "vec_id")
    after = _rows(search_ivf_index(spark, pq, qv, k=10, nprobe=3,
                                   refine_factor=100))
    assert got[1][0] not in {i for i, _ in after}
    # upsert keeps the companion coherent (replaced vector re-ranks by
    # its NEW true value)
    moved = list(qv)
    moved[0] = float(moved[0]) + 0.01  # slight, direction nearly kept
    upsert_vectors(
        spark,
        spark.createDataFrame([(3, moved)],
                              "vec_id long, embedding array<double>"),
        pq, "vec_id", "embedding",
    )
    again = _rows(search_ivf_index(spark, pq, qv, k=3, nprobe=8,
                                   refine_factor=200))
    assert 3 in {i for i, _ in again}  # still near, scored by NEW vector
    row = [r for r in again if r[0] == 3][0]
    assert row[1] < 1.0 - 1e-9  # no longer a perfect self-match
    # guards: flat index refuses refine; missing companion refuses
    with pytest.raises(ValueError, match="flat"):
        search_ivf_index(spark, flat, qv, refine_factor=2)
    pq2 = str(tmp_path / "pq2")
    build_ivf_index(spark, emb.filter("vec_id < 100"), pq2, "vec_id",
                    "embedding", k=4, iters=1, m=4, codes=8)
    with pytest.raises(ValueError, match="vectors companion"):
        search_ivf_index(spark, pq2, qv, refine_factor=2)


def test_validate_new_ids_refuses_duplicates(spark, emb, tmp_path):
    """The append contract becomes checkable: validate_new_ids point-
    fetches membership through the id blooms and refuses already-indexed
    ids before writing anything — both index families."""
    from s3parq_spark.text_index import (
        append_to_text_index,
        build_text_index,
    )

    ai = str(tmp_path / "ann")
    build_ivf_index(spark, emb.filter("vec_id < 200"), ai, "vec_id",
                    "embedding", k=4, iters=1)
    with pytest.raises(ValueError, match="already indexed"):
        append_to_ivf_index(
            spark, emb.filter("vec_id < 10"), ai, "vec_id", "embedding",
            validate_new_ids=True,
        )
    # clean batch passes, and the refusal wrote NOTHING
    append_to_ivf_index(
        spark, emb.filter("vec_id >= 200 and vec_id < 250"), ai,
        "vec_id", "embedding", validate_new_ids=True,
    )
    ti = str(tmp_path / "text")
    docs = spark.createDataFrame(
        [(i, f"word{i} common") for i in range(10)],
        "doc_id long, text string",
    )
    build_text_index(spark, docs, ti, "doc_id", "text", n_buckets=4)
    with pytest.raises(ValueError, match="already indexed"):
        append_to_text_index(
            spark, docs.limit(2), ti, "doc_id", "text",
            validate_new_ids=True,
        )
    from s3parq_spark.text_index import _read_stats

    assert _read_stats(spark, ti)[0] == 10  # stats untouched by refusal
    append_to_text_index(
        spark,
        spark.createDataFrame([(100, "fresh")], "doc_id long, text string"),
        ti, "doc_id", "text", validate_new_ids=True,
    )
    assert _read_stats(spark, ti)[0] == 11


def test_null_ids_rejected_at_build_and_append(spark, emb, tmp_path):
    """ADVICE r11: a null-id vector would be indexed yet permanently
    unremovable (remove_vectors drops None from its id list,
    upsert_vectors filters null ids) — build and append must refuse
    loudly, mirroring the text index's non-NULL-key contract. Null-VECTOR
    rows stay filtered (not indexed), including a (null id, null vec)
    row."""
    p = str(tmp_path / "ivf")
    poisoned = emb.limit(20).unionByName(
        spark.createDataFrame(
            [(None, [0.5] * 64)], "vec_id long, embedding array<double>"
        ).select("vec_id", F.col("embedding").cast("array<float>")
                 .alias("embedding"))
    )
    with pytest.raises(ValueError, match="NULL vec_id"):
        build_ivf_index(spark, poisoned, p, "vec_id", "embedding",
                        k=4, iters=1)
    build_ivf_index(spark, emb.filter("vec_id < 50"), p, "vec_id",
                    "embedding", k=4, iters=1)
    with pytest.raises(ValueError, match="NULL vec_id"):
        append_to_ivf_index(
            spark,
            poisoned.filter("vec_id is null or vec_id >= 50"),
            p, "vec_id", "embedding",
        )
    # a (null id, null vec) row is filtered with every other null-vec
    # row, never indexed — no refusal, no extra rows
    nullvec = spark.createDataFrame(
        [(None, None), (60, None)], "vec_id long, embedding array<float>"
    ).unionByName(emb.filter("vec_id >= 50 and vec_id < 60"))
    append_to_ivf_index(spark, nullvec, p, "vec_id", "embedding")
    from s3parq_spark.fetch import fetch_path

    assert fetch_path(spark, p).count() == 60


def test_remove_vectors_count_matches_opt_out(spark, emb, tmp_path):
    """count_matches=False skips the membership point-fetch (returns -1,
    unknown) and tombstones unconditionally — same post-state as the
    counted path, one commit either way, and idempotent re-runs stay
    convergent."""
    from s3parq_spark.fetch import fetch_path

    p = str(tmp_path / "ivf")
    build_ivf_index(spark, emb.filter("vec_id < 40"), p, "vec_id",
                    "embedding", k=4, iters=1)
    got = remove_vectors(spark, [1, 2, 999], p, "vec_id",
                         count_matches=False)
    assert got == -1
    left = {r[0] for r in fetch_path(spark, p).select("vec_id").collect()}
    assert left == set(range(40)) - {1, 2}
    # unconditional: re-running still returns -1 and changes nothing
    assert remove_vectors(spark, [1, 2], p, "vec_id",
                          count_matches=False) == -1
    assert fetch_path(spark, p).count() == 38


def test_stream_upsert_vectors_exactly_once_across_crash(
    spark, emb, tmp_path
):
    """r11 verdict #4: streaming ANN ingestion — readStream →
    foreachBatch(upsert_vectors) with the txn ledger. The crash window
    (batch committed, checkpoint completion marker not) must replay
    WITHOUT a duplicate snapshot and WITHOUT double-counting the drift
    counters (the r11 gap: the sidecar accumulation was not
    ledger-guarded). Search over the final index equals exact cosine
    over the final corpus (all cells probed + refine ⇒ exact)."""
    import glob
    import os
    import shutil

    from s3parq_spark import metadata
    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.streaming import stream_upsert_vectors

    idx = str(tmp_path / "ivfpq")
    src = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def land(df, name):
        scratch = str(tmp_path / f"scratch_{name}")
        df.coalesce(1).write.parquet(scratch)
        for i, p in enumerate(sorted(glob.glob(f"{scratch}/part-*.parquet"))):
            shutil.move(p, f"{src}/{name}-{i}.parquet")

    base = emb.filter("vec_id < 60").select("vec_id", "embedding")
    build_ivf_index(spark, base, idx, "vec_id", "embedding",
                    k=4, iters=1, m=4, codes=4, store_vectors=True)
    land(emb.filter("vec_id >= 60 and vec_id < 90")
         .select("vec_id", "embedding"), "w1")
    stream_upsert_vectors(spark, src, idx, "vec_id", "embedding",
                          checkpoint_location=ckpt)
    # wave 2: 10 changed (negated ⇒ different cell) + 10 new
    changed = base.filter("vec_id < 10").select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    land(changed.unionByName(
        emb.filter("vec_id >= 90 and vec_id < 100")
        .select("vec_id", "embedding")), "w2")
    stream_upsert_vectors(spark, src, idx, "vec_id", "embedding",
                          checkpoint_location=ckpt)

    meta = metadata.read_sidecar(spark, idx)
    n_snaps = len(meta.snapshots)
    assert meta.txns and max(meta.txns.values()) >= 1, meta.txns
    drift = index_drift(spark, idx)
    assert drift["appended_n"] == 50  # 30 + (10 changed + 10 new)

    # every id exactly once on BOTH sides (index and raw-vector
    # companion) — the unconditional tombstone kept them in step
    for path in (idx, idx + "_vectors"):
        per_id = (
            fetch_path(spark, path).groupBy("vec_id")
            .count().filter("count > 1").count()
        )
        assert per_id == 0, path
        assert fetch_path(spark, path).count() == 100, path

    # crash simulation: newest completion marker deleted, batch replays
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
    stream_upsert_vectors(spark, src, idx, "vec_id", "embedding",
                          checkpoint_location=ckpt)
    assert os.path.exists(victim), "batch was not re-delivered"
    meta2 = metadata.read_sidecar(spark, idx)
    assert len(meta2.snapshots) == n_snaps
    assert meta2.txns == meta.txns
    assert index_drift(spark, idx)["appended_n"] == 50  # not re-counted
    assert fetch_path(spark, idx).count() == 100

    # exact-search convergence: all cells probed + refine ⇒ exact cosine
    # over the final corpus (changed vectors found at their NEW values)
    qv = _query_vec(emb, 3)
    got = [
        (r["vec_id"], round(r["score"], 9))
        for r in search_ivf_index(spark, idx, qv, k=5, nprobe=4,
                                  refine_factor=40).collect()
    ]
    final = (
        emb.filter("vec_id >= 10 and vec_id < 100")
        .select("vec_id", F.col("embedding").cast("array<double>")
                .alias("v"))
        .unionByName(changed.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")))
    )
    dot = F.aggregate(
        F.zip_with(F.col("v"), F.lit(qv), lambda a, b: a * b),
        F.lit(0.0), lambda a, x: a + x,
    )
    nrm = F.sqrt(F.aggregate(F.col("v"), F.lit(0.0),
                             lambda a, x: a + x * x))
    qn = sum(x * x for x in qv) ** 0.5
    exp = [
        (r["vec_id"], round(r["score"], 9))
        for r in final.select(
            "vec_id", (dot / (nrm * F.lit(qn))).alias("score")
        ).orderBy(F.desc("score"), F.asc("vec_id")).limit(5).collect()
    ]
    assert got == exp


def test_stream_upsert_vectors_refuses_wrong_key_or_missing_index(
    spark, emb, tmp_path
):
    import os

    from s3parq_spark.streaming import stream_upsert_vectors

    src = str(tmp_path / "landing")
    os.makedirs(src)
    emb.limit(5).write.mode("overwrite").parquet(f"{src}/w1.parquet")
    with pytest.raises(ValueError, match="no quantizer sidecar"):
        stream_upsert_vectors(spark, src, str(tmp_path / "nope"),
                              "vec_id", "embedding")
    p = str(tmp_path / "ivf")
    build_ivf_index(spark, emb.filter("vec_id < 30"), p, "vec_id",
                    "embedding", k=2, iters=1)
    with pytest.raises(ValueError, match="keyed by"):
        stream_upsert_vectors(spark, src, p, "label", "embedding")


def test_attach_vectors_companion_backfills_refine(spark, emb, tmp_path):
    """r11 verdict #5: a PQ index built WITHOUT store_vectors gains the
    refine path by attaching the companion afterwards — no index
    rebuild. Id parity is enforced both ways before anything is
    written, and maintenance keeps the attached companion in step
    (appends append, removals tombstone)."""
    from s3parq_spark.ann_index import attach_vectors_companion
    from s3parq_spark.fetch import fetch_path

    pq = str(tmp_path / "pq")
    corpus = emb.filter("vec_id < 200")
    build_ivf_index(spark, corpus, pq, "vec_id", "embedding",
                    k=4, iters=1, m=4, codes=8)
    qv = _query_vec(emb, 3)
    with pytest.raises(ValueError, match="no vectors companion"):
        search_ivf_index(spark, pq, qv, k=5, nprobe=4, refine_factor=50)
    # refusals: wrong key, missing indexed ids, extra ids, dup ids
    with pytest.raises(ValueError, match="keyed by"):
        attach_vectors_companion(spark, pq, corpus, "label", "embedding")
    with pytest.raises(ValueError, match="absent from the batch"):
        attach_vectors_companion(
            spark, pq, corpus.filter("vec_id < 150"), "vec_id", "embedding"
        )
    with pytest.raises(ValueError, match="not in the index"):
        attach_vectors_companion(
            spark, pq, emb.filter("vec_id < 250"), "vec_id", "embedding"
        )
    with pytest.raises(ValueError, match="unique"):
        attach_vectors_companion(
            spark, pq, corpus.unionByName(corpus.limit(1)),
            "vec_id", "embedding",
        )
    assert attach_vectors_companion(
        spark, pq, corpus, "vec_id", "embedding"
    ) == 200
    # refine now works and (pool covers the probed cells) equals the
    # exact cosine ranking a flat index gives over the same cells
    flat = str(tmp_path / "flat")
    build_ivf_index(spark, corpus, flat, "vec_id", "embedding",
                    k=4, iters=1)
    got = _rows(search_ivf_index(spark, pq, qv, k=5, nprobe=4,
                                 refine_factor=50))
    exp = _rows(search_ivf_index(spark, flat, qv, k=5, nprobe=4))
    assert got == exp
    # maintenance keeps the attached companion in step
    append_to_ivf_index(
        spark, emb.filter("vec_id >= 200 and vec_id < 220"), pq,
        "vec_id", "embedding",
    )
    assert fetch_path(spark, pq + "_vectors").count() == 220
    # flat index refuses the attach (it already stores vectors)
    with pytest.raises(ValueError, match="flat index"):
        attach_vectors_companion(spark, flat, corpus, "vec_id",
                                 "embedding")


def test_batch_refine_equals_per_query_refine(spark, emb, tmp_path):
    """r11 verdict #6: search_ivf_index_batch(refine_factor=f) — one
    union point-fetch over all queries' ADC candidates, per-query exact
    re-rank — must reproduce per-query refine bit-for-bit, including a
    query whose ADC misranking refine corrects."""
    from s3parq_spark.ann_index import search_ivf_index_batch

    pq = str(tmp_path / "pq")
    build_ivf_index(spark, emb, pq, "vec_id", "embedding",
                    k=8, iters=1, m=4, codes=8, store_vectors=True)
    queries = {
        "a": _query_vec(emb, 0),
        "b": _query_vec(emb, 7),
        "c": [0.1] * len(_query_vec(emb, 0)),
    }
    got = search_ivf_index_batch(spark, pq, queries, k=5, nprobe=3,
                                 refine_factor=4)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["score"], 9))
        )
    for qid, qv in queries.items():
        exp = _rows(search_ivf_index(spark, pq, qv, k=5, nprobe=3,
                                     refine_factor=4))
        assert by_q.get(qid, []) == exp, qid
    # refine changed at least one query's ADC-only answer (the reason
    # the path exists) — deterministic fixture, checked once here
    adc = search_ivf_index_batch(spark, pq, queries, k=5, nprobe=3)
    adc_by_q = {}
    for r in adc.collect():
        adc_by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert any(
        adc_by_q.get(qid, []) != [v for v, _ in by_q.get(qid, [])]
        for qid in queries
    ), "ADC and refined rankings were identical for every query"
    with pytest.raises(ValueError, match="refine_factor is for PQ"):
        flat = str(tmp_path / "flat")
        build_ivf_index(spark, emb.limit(50), flat, "vec_id",
                        "embedding", k=2, iters=1)
        search_ivf_index_batch(spark, flat, queries, k=5, nprobe=2,
                               refine_factor=2)


def test_compact_ivf_index_search_parity_and_geometry(spark, emb, tmp_path):
    """compact_ivf_index materializes the family's MoR debt (batch-append
    small files, removal/upsert tombstones) in index AND companion
    without changing a single search answer: probes, ADC scores, refine
    re-ranks, and the drift counters are bit-identical across the
    rewrite, the frozen quantizers are untouched by construction, and
    the file count actually drops."""
    import glob
    import json

    from s3parq_spark.ann_index import compact_ivf_index, upsert_vectors

    idx = str(tmp_path / "ivfpq")
    build_ivf_index(
        spark, emb.filter("vec_id < 70"), idx, "vec_id", "embedding",
        k=4, iters=1, m=4, codes=4, store_vectors=True,
        max_records_per_file=16,
    )
    for lo, hi in ((70, 80), (80, 90), (90, 100)):
        append_to_ivf_index(
            spark,
            emb.filter(f"vec_id >= {lo} and vec_id < {hi}"),
            idx, "vec_id", "embedding",
        )
    remove_vectors(spark, [5, 17, 29], idx, "vec_id")
    upsert_vectors(
        spark,
        emb.filter("vec_id < 8").select(
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
        ),
        idx, "vec_id", "embedding",
    )

    def nfiles(p):
        return len(glob.glob(f"{p}/**/*.parquet", recursive=True))

    def probe():
        qv = _query_vec(emb, 3)
        adc = _rows(search_ivf_index(spark, idx, qv, k=8, nprobe=3))
        ref = _rows(search_ivf_index(spark, idx, qv, k=8, nprobe=3,
                                     refine_factor=6))
        return adc, ref, index_drift(spark, idx)

    before = probe()
    q_before = open(idx + "_quantizers.json").read()
    files_before = (nfiles(idx), nfiles(idx + "_vectors"))

    report = compact_ivf_index(spark, idx)
    assert set(report) == {"index", "vectors"}

    assert probe() == before
    assert open(idx + "_quantizers.json").read() == q_before
    files_after = (nfiles(idx), nfiles(idx + "_vectors"))
    assert files_after[0] < files_before[0], (files_before, files_after)
    assert files_after[1] < files_before[1], (files_before, files_after)
    # the debt is actually materialized: single-snapshot history, no
    # tombstones taxing the next read
    from s3parq_spark import metadata as _md
    for p in (idx, idx + "_vectors"):
        m = _md.read_sidecar(spark, p)
        assert len(m.snapshots) == 1, p
        assert not any(s.get("deletes") for s in m.snapshots), p


def test_stream_upsert_vectors_replay_after_compaction(spark, emb, tmp_path):
    """REGRESSION (r12): compact_dataset's rewrite used to reset the
    idempotent-writer ledger (an overwrite publish starts a fresh
    ``txns``), so a streaming sink's crash-replay AFTER a routine
    compaction re-applied an already-committed batch — double-counted
    drift counters and a duplicate snapshot. The ledger now rides the
    compaction carry-through (and is stamped onto the rewritten v1
    snapshot squash-base style, so it stays provable across restore)."""
    import glob
    import os
    import shutil

    from s3parq_spark import metadata
    from s3parq_spark.ann_index import compact_ivf_index
    from s3parq_spark.fetch import fetch_path
    from s3parq_spark.streaming import stream_upsert_vectors

    idx = str(tmp_path / "ivfpq")
    src = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def land(df, name):
        scratch = str(tmp_path / f"scratch_{name}")
        df.coalesce(1).write.parquet(scratch)
        for i, p in enumerate(sorted(glob.glob(f"{scratch}/part-*.parquet"))):
            shutil.move(p, f"{src}/{name}-{i}.parquet")

    build_ivf_index(
        spark, emb.filter("vec_id < 60").select("vec_id", "embedding"),
        idx, "vec_id", "embedding", k=4, iters=1, m=4, codes=4,
        store_vectors=True,
    )
    land(emb.filter("vec_id >= 60 and vec_id < 90")
         .select("vec_id", "embedding"), "w1")
    stream_upsert_vectors(spark, src, idx, "vec_id", "embedding",
                          checkpoint_location=ckpt)
    land(emb.filter("vec_id >= 90 and vec_id < 100")
         .select("vec_id", "embedding"), "w2")
    stream_upsert_vectors(spark, src, idx, "vec_id", "embedding",
                          checkpoint_location=ckpt)

    ledger = metadata.read_sidecar(spark, idx).txns
    assert ledger and max(ledger.values()) >= 1

    compact_ivf_index(spark, idx)
    meta = metadata.read_sidecar(spark, idx)
    assert meta.txns == ledger  # the carry under test
    assert len(meta.snapshots) == 1
    assert index_drift(spark, idx)["appended_n"] == 40

    # crash window: newest checkpoint completion marker deleted — the
    # sink re-delivers the last batch, and the carried ledger must skip it
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
    stream_upsert_vectors(spark, src, idx, "vec_id", "embedding",
                          checkpoint_location=ckpt)
    assert os.path.exists(victim), "batch was not re-delivered"

    meta2 = metadata.read_sidecar(spark, idx)
    assert len(meta2.snapshots) == 1  # replay SKIPPED: no new commit
    assert meta2.txns == ledger
    assert index_drift(spark, idx)["appended_n"] == 40  # not re-counted
    assert fetch_path(spark, idx).count() == 100
    dups = (
        fetch_path(spark, idx).groupBy("vec_id").count()
        .filter("count > 1").count()
    )
    assert dups == 0


def _clustered_vecs(spark, ids, base_dim):
    rows = []
    for i in ids:
        v = [0.0] * 8
        v[base_dim + (i % 4)] = 1.0
        v[(base_dim + 4 + ((i // 4) % 2)) % 8] = 0.05
        rows.append((i, v))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_rebuild_flat_index_resets_drift_and_matches_fresh_build(
    spark, tmp_path
):
    """r13 (verdict #3): the drift advisory's remedy. A flat index whose
    appends drifted out of distribution retrains over the CURRENT
    corpus (recovered from the index rows themselves) and swaps in —
    search equals a fresh build_ivf_index over the same corpus
    (deterministic training), drift counters reset."""
    from s3parq_spark.ann_index import _load_quantizers, rebuild_ivf_index

    path = str(tmp_path / "idx")
    build_ivf_index(spark, _clustered_vecs(spark, range(100), 0), path,
                    "vec_id", "embedding", k=4, iters=2)
    append_to_ivf_index(spark, _clustered_vecs(spark, range(200, 300), 4),
                        path, "vec_id", "embedding")
    assert index_drift(spark, path)["drift_ratio"] > 2.0
    old_cents = _load_quantizers(spark, path, "t")["centroids"]

    rep = rebuild_ivf_index(spark, path, iters=2)
    assert rep["n_vectors"] == 200 and rep["k"] == 4 and rep["m"] is None
    assert rep["prev_drift_ratio"] > 2.0
    d = index_drift(spark, path)
    assert d["appended_n"] == 0 and d["appended_qerr"] is None
    new_cents = _load_quantizers(spark, path, "t")["centroids"]
    assert new_cents != old_cents  # actually retrained

    # parity: a fresh build over the same corpus is byte-identical
    ref = str(tmp_path / "ref")
    corpus = _clustered_vecs(spark, range(100), 0).unionByName(
        _clustered_vecs(spark, range(200, 300), 4)
    )
    build_ivf_index(spark, corpus, ref, "vec_id", "embedding",
                    k=4, iters=2)
    assert _load_quantizers(spark, ref, "t")["centroids"] == new_cents
    qv = [0.0] * 8
    qv[4] = 1.0
    got = _rows(search_ivf_index(spark, path, qv, k=8, nprobe=2))
    want = _rows(search_ivf_index(spark, ref, qv, k=8, nprobe=2))
    assert got == want and len(got) == 8


def test_rebuild_pq_family_carries_ledger_and_companion(
    spark, emb, tmp_path
):
    """PQ + companion rebuild: corpus recovered from the raw-vector
    companion, refine search equals a fresh build, and the
    exactly-once txn ledger survives the swap (a streaming sink's
    crash-replay after a routine rebuild must not re-apply)."""
    from s3parq_spark import metadata as _md
    from s3parq_spark.ann_index import rebuild_ivf_index, upsert_vectors

    path = str(tmp_path / "idx")
    build_ivf_index(spark, emb.filter("vec_id < 300"), path, "vec_id",
                    "embedding", k=8, iters=1, m=4, codes=8,
                    store_vectors=True)
    upsert_vectors(
        spark, emb.filter("vec_id >= 300 and vec_id < 360"), path,
        "vec_id", "embedding", count_matches=False,
        _txn={"app": "sinkA", "version": 7},
    )
    assert _md.read_sidecar(spark, path).txns == {"sinkA": 7}

    rep = rebuild_ivf_index(spark, path, iters=1)
    assert rep["n_vectors"] == 360 and rep["m"] == 4
    # ledger carried through the swap (and provable from the squash base)
    m = _md.read_sidecar(spark, path)
    assert m.txns == {"sinkA": 7}
    assert m.snapshots[-1]["txns"] == {"sinkA": 7}
    # companion swapped in step: refine equals a fresh build's refine
    ref = str(tmp_path / "ref")
    build_ivf_index(spark, emb.filter("vec_id < 360"), ref, "vec_id",
                    "embedding", k=8, iters=1, m=4, codes=8,
                    store_vectors=True)
    qv = _query_vec(emb, 5)
    got = _rows(search_ivf_index(spark, path, qv, k=10, nprobe=3,
                                 refine_factor=5))
    want = _rows(search_ivf_index(spark, ref, qv, k=10, nprobe=3,
                                  refine_factor=5))
    assert got == want and len(got) == 10
    # no .prerebuild/.rebuilding residue
    import glob as _glob
    assert not _glob.glob(str(tmp_path / "idx*prerebuild*"))
    assert not _glob.glob(str(tmp_path / "idx*rebuilding*"))


def test_rebuild_pq_without_companion_needs_vectors(spark, emb, tmp_path):
    """A PQ index without a companion has no true vectors at rest: the
    rebuild refuses without an explicit corpus, and accepts one."""
    from s3parq_spark.ann_index import rebuild_ivf_index

    path = str(tmp_path / "idx")
    build_ivf_index(spark, emb.filter("vec_id < 200"), path, "vec_id",
                    "embedding", k=4, iters=1, m=4, codes=8)
    with pytest.raises(ValueError, match="no true vectors at rest"):
        rebuild_ivf_index(spark, path)
    rep = rebuild_ivf_index(
        spark, path, vectors=emb.filter("vec_id < 200"),
        vec_col="embedding", iters=1,
    )
    assert rep["n_vectors"] == 200
    qv = _query_vec(emb, 5)
    assert search_ivf_index(spark, path, qv, k=5, nprobe=2).count() == 5


def test_maintain_dataset_rebuild_on_drift(spark, tmp_path):
    """r13: the policy loop runs the retrain-and-swap when opted in and
    the vectors are recoverable; the default stays advisory."""
    from s3parq_spark.maintenance import maintain_dataset

    path = str(tmp_path / "idx")
    build_ivf_index(spark, _clustered_vecs(spark, range(100), 0), path,
                    "vec_id", "embedding", k=4, iters=2)
    append_to_ivf_index(spark, _clustered_vecs(spark, range(200, 300), 4),
                        path, "vec_id", "embedding")
    rep = maintain_dataset(
        spark, path, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999,
    )
    adv = [a for a in rep["actions"] if a["action"] == "rebuild_ivf_index"]
    assert adv and "advisory" in adv[0]  # default: advisory only
    rep = maintain_dataset(
        spark, path, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, rebuild_on_drift=True,
    )
    acts = [a for a in rep["actions"]
            if a["action"] == "rebuild_ivf_index"]
    assert acts and acts[0]["result"]["n_vectors"] == 200
    assert index_drift(spark, path)["appended_n"] == 0
    # after the retrain the ratio is gone; no further action scheduled
    rep = maintain_dataset(
        spark, path, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, rebuild_on_drift=True,
    )
    assert not [a for a in rep["actions"]
                if a["action"] == "rebuild_ivf_index"]


def test_crash_between_swaps_fails_loud_and_rerun_converges(
    spark, tmp_path, monkeypatch
):
    """r14 (verdict #3): kill the rebuild between the index-dir rename
    and the quantizer-JSON rename — the documented two-object crash
    window. The epoch pin (sidecar ``ann_epoch`` vs quantizer ``epoch``)
    turns the window from silent misprobe into a refusal: search,
    drift, and compaction all raise QuantizerEpochError naming the
    parked restore; maintain_dataset reports the mismatch and refuses
    to sweep the parked rollback state; re-running the rebuild
    converges to exactly a fresh build."""
    import s3parq_spark.fs as fsmod
    from s3parq_spark.ann_index import (
        QuantizerEpochError,
        compact_ivf_index,
        rebuild_ivf_index,
    )
    from s3parq_spark.maintenance import dataset_health, maintain_dataset

    path = str(tmp_path / "idx")
    build_ivf_index(spark, _clustered_vecs(spark, range(100), 0), path,
                    "vec_id", "embedding", k=4, iters=2)
    append_to_ivf_index(spark, _clustered_vecs(spark, range(200, 300), 4),
                        path, "vec_id", "embedding")

    real_rename = fsmod.rename

    def crash_at_quantizer_swap(sp, src, dst):
        if src.rstrip("/").endswith("idx_quantizers.json"):
            raise RuntimeError("simulated crash mid-swap")
        return real_rename(sp, src, dst)

    monkeypatch.setattr(fsmod, "rename", crash_at_quantizer_swap)
    with pytest.raises(RuntimeError, match="simulated crash"):
        rebuild_ivf_index(spark, path, iters=2)
    monkeypatch.setattr(fsmod, "rename", real_rename)

    # window state: NEW index rows live, OLD quantizer JSON live —
    # every quantizer consumer refuses loudly instead of misprobing
    qv = [0.0] * 8
    qv[4] = 1.0
    with pytest.raises(QuantizerEpochError, match="epoch mismatch"):
        search_ivf_index(spark, path, qv, k=5, nprobe=2)
    with pytest.raises(QuantizerEpochError):
        index_drift(spark, path)
    with pytest.raises(QuantizerEpochError):
        compact_ivf_index(spark, path)

    # the policy loop survives the window: health flags the mismatch,
    # the report carries the advisory, and the parked rollback state is
    # NOT swept even with the vacuum opt-in (it is the restore path)
    h = dataset_health(spark, path)
    assert h.get("ann_epoch_mismatch") == 1.0
    parked = path + ".prerebuild"
    assert fsmod.exists(spark, parked)
    rep = maintain_dataset(
        spark, path, compact_min_files=1, compact_below_fraction=1.0,
        max_snapshots=999, max_pending_tombstones=9999,
        vacuum_retention_hours=0.0,
    )
    kinds = [a["action"] for a in rep["actions"]]
    assert "quantizer_epoch_mismatch" in kinds
    assert "compact_ivf_index" not in kinds
    assert "remove_rewrite_residue" not in kinds
    assert fsmod.exists(spark, parked)

    # re-running the rebuild converges (it is the refusal's named
    # remedy, so it must not refuse on the state it repairs)
    rep2 = rebuild_ivf_index(spark, path, iters=2)
    assert rep2["n_vectors"] == 200
    assert rep2["prev_drift_ratio"] is None  # honest: window had no drift
    ref = str(tmp_path / "ref")
    corpus = _clustered_vecs(spark, range(100), 0).unionByName(
        _clustered_vecs(spark, range(200, 300), 4)
    )
    build_ivf_index(spark, corpus, ref, "vec_id", "embedding",
                    k=4, iters=2)
    got = _rows(search_ivf_index(spark, path, qv, k=8, nprobe=2))
    want = _rows(search_ivf_index(spark, ref, qv, k=8, nprobe=2))
    assert got == want and len(got) == 8


def test_failed_swap_unwinds_all_members(spark, emb, tmp_path, monkeypatch):
    """r14 (ADVICE): a failed rename-in must unwind EVERY member already
    swapped, in reverse — not just the failing one. Fail the LAST
    member's rename-in (quantizer JSON) on a PQ family: index dir and
    companion were already swapped, and without the unwind the old
    quantizers would serve a new index (wrong codebooks). After the
    error the OLD family must be fully live and searchable."""
    import s3parq_spark.fs as fsmod
    from s3parq_spark.ann_index import _load_quantizers, rebuild_ivf_index

    path = str(tmp_path / "idx")
    build_ivf_index(spark, emb.filter("vec_id < 300"), path, "vec_id",
                    "embedding", k=8, iters=1, m=4, codes=8,
                    store_vectors=True)
    qv = _query_vec(emb, 5)
    before = _rows(search_ivf_index(spark, path, qv, k=10, nprobe=3,
                                    refine_factor=5))
    old_epoch = _load_quantizers(spark, path, "t")["epoch"]

    real_rename = fsmod.rename

    def fail_quantizer_rename_in(sp, src, dst):
        if src.rstrip("/").endswith(".rebuilding_quantizers.json"):
            return False
        return real_rename(sp, src, dst)

    monkeypatch.setattr(fsmod, "rename", fail_quantizer_rename_in)
    with pytest.raises(IOError, match="could not swap in"):
        rebuild_ivf_index(spark, path, iters=1)
    monkeypatch.setattr(fsmod, "rename", real_rename)

    # old family fully live: consistent epochs, identical search, no
    # parked .prerebuild left holding the only good copy
    from s3parq_spark import metadata as _md
    assert _md.read_sidecar(spark, path).ann_epoch == old_epoch
    assert _load_quantizers(spark, path, "t")["epoch"] == old_epoch
    after = _rows(search_ivf_index(spark, path, qv, k=10, nprobe=3,
                                   refine_factor=5))
    assert after == before
    import glob as _glob
    assert not _glob.glob(str(tmp_path / "idx*prerebuild*"))


def test_compaction_preserves_epoch_pin(spark, emb, tmp_path):
    """r14 audit: compaction rewrites file geometry, never quantizers —
    the sidecar's epoch pin must carry through compact_ivf_index (both
    members) or every compacted index would refuse to serve."""
    from s3parq_spark import metadata as _md
    from s3parq_spark.ann_index import (
        _load_quantizers,
        compact_ivf_index,
        upsert_vectors,
    )

    path = str(tmp_path / "idx")
    build_ivf_index(spark, emb.filter("vec_id < 300"), path, "vec_id",
                    "embedding", k=8, iters=1, m=4, codes=8,
                    store_vectors=True)
    upsert_vectors(spark, emb.filter("vec_id >= 300 and vec_id < 340"),
                   path, "vec_id", "embedding", count_matches=False)
    epoch = _load_quantizers(spark, path, "t")["epoch"]
    qv = _query_vec(emb, 5)
    before = _rows(search_ivf_index(spark, path, qv, k=10, nprobe=3,
                                    refine_factor=5))
    compact_ivf_index(spark, path)
    assert _md.read_sidecar(spark, path).ann_epoch == epoch
    assert _load_quantizers(spark, path, "t")["epoch"] == epoch
    after = _rows(search_ivf_index(spark, path, qv, k=10, nprobe=3,
                                   refine_factor=5))
    assert after == before


def test_rebuild_geometry_override_matches_fresh_build(
    spark, emb, tmp_path
):
    """r14 (verdict #4): the k=/codes= resize path. A rebuild with k
    doubled must retrain at the NEW geometry — quantizer matrices
    reflect it, search equals a fresh build_ivf_index at the new k,
    and the exactly-once ledger still carries through the swap."""
    from s3parq_spark import metadata as _md
    from s3parq_spark.ann_index import _load_quantizers, rebuild_ivf_index

    path = str(tmp_path / "idx")
    build_ivf_index(spark, emb.filter("vec_id < 300"), path, "vec_id",
                    "embedding", k=4, iters=1)
    append_to_ivf_index(
        spark, emb.filter("vec_id >= 300 and vec_id < 360"), path,
        "vec_id", "embedding", _txn={"app": "sinkB", "version": 3},
    )

    rep = rebuild_ivf_index(spark, path, k=8, iters=1)
    assert rep["k"] == 8 and rep["n_vectors"] == 360
    q = _load_quantizers(spark, path, "t")
    assert len(q["centroids"]) == 8
    assert _md.read_sidecar(spark, path).txns == {"sinkB": 3}

    ref = str(tmp_path / "ref")
    build_ivf_index(spark, emb.filter("vec_id < 360"), ref, "vec_id",
                    "embedding", k=8, iters=1)
    assert _load_quantizers(spark, ref, "t")["centroids"] == q["centroids"]
    qv = _query_vec(emb, 5)
    got = _rows(search_ivf_index(spark, path, qv, k=10, nprobe=4))
    want = _rows(search_ivf_index(spark, ref, qv, k=10, nprobe=4))
    assert got == want and len(got) == 10

    # PQ codes override: resize the per-subspace codebook length
    pq = str(tmp_path / "pq")
    build_ivf_index(spark, emb.filter("vec_id < 300"), pq, "vec_id",
                    "embedding", k=4, iters=1, m=4, codes=4,
                    store_vectors=True)
    rep2 = rebuild_ivf_index(spark, pq, codes=8, iters=1)
    assert rep2["m"] == 4
    q2 = _load_quantizers(spark, pq, "t")
    assert all(len(b) == 8 for b in q2["books"])
    refpq = str(tmp_path / "refpq")
    build_ivf_index(spark, emb.filter("vec_id < 300"), refpq, "vec_id",
                    "embedding", k=4, iters=1, m=4, codes=8,
                    store_vectors=True)
    got2 = _rows(search_ivf_index(spark, pq, qv, k=10, nprobe=2))
    want2 = _rows(search_ivf_index(spark, refpq, qv, k=10, nprobe=2))
    assert got2 == want2 and len(got2) == 10


def test_maintain_dataset_dry_run_reports_would_run_rebuild(
    spark, tmp_path
):
    """r14 (ADVICE): dry_run with rebuild_on_drift=True must report the
    rebuild WOULD run — not re-advise the operator to pass the flag
    they already passed — and must change nothing."""
    from s3parq_spark.maintenance import maintain_dataset

    path = str(tmp_path / "idx")
    build_ivf_index(spark, _clustered_vecs(spark, range(100), 0), path,
                    "vec_id", "embedding", k=4, iters=2)
    append_to_ivf_index(spark, _clustered_vecs(spark, range(200, 300), 4),
                        path, "vec_id", "embedding")
    rep = maintain_dataset(
        spark, path, compact_min_files=9999, max_snapshots=999,
        max_pending_tombstones=9999, rebuild_on_drift=True, dry_run=True,
    )
    acts = [a for a in rep["actions"]
            if a["action"] == "rebuild_ivf_index"]
    assert acts and acts[0].get("would_run") is True
    assert "advisory" not in acts[0] and "result" not in acts[0]
    # nothing changed: the drift is still there
    assert index_drift(spark, path)["drift_ratio"] > 2.0


def test_pre_epoch_index_still_serves(spark, emb, tmp_path):
    """r14 back-compat: an index built before the epoch pin existed has
    neither sidecar ann_epoch nor quantizer epoch — the check must skip
    (both pins absent), never refuse, and the next rebuild upgrades the
    index to pinned."""
    import json as _json

    import s3parq_spark.fs as fsmod
    from s3parq_spark import metadata as _md
    from s3parq_spark.ann_index import (
        _load_quantizers,
        _quantizers_path,
        rebuild_ivf_index,
    )

    path = str(tmp_path / "idx")
    build_ivf_index(spark, emb.filter("vec_id < 200"), path, "vec_id",
                    "embedding", k=4, iters=1)
    # strip both pins, simulating a pre-r14 index at rest
    m = _md.read_sidecar(spark, path)
    m.ann_epoch = None
    _md.write_sidecar(spark, path, m)
    qp = _quantizers_path(path)
    q = _json.loads(fsmod.read_text(spark, qp))
    q.pop("epoch", None)
    fsmod.write_text(spark, qp, _json.dumps(q))

    qv = _query_vec(emb, 3)
    assert search_ivf_index(spark, path, qv, k=5, nprobe=2).count() == 5
    append_to_ivf_index(spark, emb.filter("vec_id >= 200 and vec_id < 240"),
                        path, "vec_id", "embedding")
    assert search_ivf_index(spark, path, qv, k=5, nprobe=2).count() == 5
    # a rebuild re-pins both halves
    rebuild_ivf_index(spark, path, iters=1)
    assert _md.read_sidecar(spark, path).ann_epoch is not None
    assert _load_quantizers(spark, path, "t")["epoch"] is not None
    assert (_md.read_sidecar(spark, path).ann_epoch
            == _load_quantizers(spark, path, "t")["epoch"])


def test_upgrade_rebuild_crash_window_still_refuses(
    spark, tmp_path, monkeypatch
):
    """r14 review fix: rebuilding a PRE-PIN index and crashing between
    the index-dir and quantizer-JSON renames leaves pinned-new rows
    beside old epoch-LESS quantizers — a missing stamp must count as a
    mismatch (half-pinned family refuses); requiring both pins present
    would make the upgrade rebuild's crash window silently fail open."""
    import json as _json

    import s3parq_spark.fs as fsmod
    from s3parq_spark import metadata as _md
    from s3parq_spark.ann_index import (
        QuantizerEpochError,
        _quantizers_path,
        rebuild_ivf_index,
    )

    path = str(tmp_path / "idx")
    build_ivf_index(spark, _clustered_vecs(spark, range(100), 0), path,
                    "vec_id", "embedding", k=4, iters=1)
    # strip both pins: a pre-r14 index at rest
    m = _md.read_sidecar(spark, path)
    m.ann_epoch = None
    _md.write_sidecar(spark, path, m)
    qp = _quantizers_path(path)
    q = _json.loads(fsmod.read_text(spark, qp))
    q.pop("epoch", None)
    fsmod.write_text(spark, qp, _json.dumps(q))

    real_rename = fsmod.rename

    def crash_at_quantizer_swap(sp, src, dst):
        if src.rstrip("/").endswith("idx_quantizers.json"):
            raise RuntimeError("simulated crash mid-upgrade")
        return real_rename(sp, src, dst)

    monkeypatch.setattr(fsmod, "rename", crash_at_quantizer_swap)
    with pytest.raises(RuntimeError, match="simulated crash"):
        rebuild_ivf_index(spark, path, iters=1)
    monkeypatch.setattr(fsmod, "rename", real_rename)

    qv = [0.0] * 8
    qv[1] = 1.0
    with pytest.raises(QuantizerEpochError, match="no epoch stamp"):
        search_ivf_index(spark, path, qv, k=5, nprobe=2)
    # re-running the upgrade converges and pins both halves
    rebuild_ivf_index(spark, path, iters=1)
    assert search_ivf_index(spark, path, qv, k=5, nprobe=2).count() == 5
    assert (_md.read_sidecar(spark, path).ann_epoch
            == _json.loads(fsmod.read_text(spark, qp))["epoch"])


def test_overwrite_build_publish_to_pin_gap_refuses(
    spark, tmp_path, monkeypatch
):
    """r15 optimization round: an overwrite-build over an EXISTING
    index used to fail OPEN between its index publish and its epoch
    pin — the overwritten sidecar CARRIES the old ann_epoch, which
    still matches the old quantizer JSON, so a crash there served the
    new rows against the OLD centroids silently. The build now
    pre-pins the NEW epoch (known from geometry before any publish)
    into the existing sidecar, so a crash anywhere before the
    quantizer write leaves a mismatched pair that refuses; a re-run
    converges."""
    import s3parq_spark.ann_index as ann
    from s3parq_spark.ann_index import QuantizerEpochError

    path = str(tmp_path / "idx")
    build_ivf_index(spark, _clustered_vecs(spark, range(100), 0), path,
                    "vec_id", "embedding", k=4, iters=1)
    qv = [0.0] * 8
    qv[1] = 1.0
    assert search_ivf_index(spark, path, qv, k=5, nprobe=2).count() == 5

    # rebuild with different geometry, dying after the publishes and
    # before the quantizer write — the widest sub-window of the gap
    def dying(*a, **k):
        raise RuntimeError("injected crash before quantizer write")

    monkeypatch.setattr(ann, "_write_quantizers", dying)
    with pytest.raises(RuntimeError, match="injected crash"):
        build_ivf_index(spark, _clustered_vecs(spark, range(60), 1),
                        path, "vec_id", "embedding", k=2, iters=1)
    monkeypatch.undo()

    with pytest.raises(QuantizerEpochError):
        search_ivf_index(spark, path, qv, k=5, nprobe=2)
    # converge forward: the re-run build completes both halves
    build_ivf_index(spark, _clustered_vecs(spark, range(60), 1), path,
                    "vec_id", "embedding", k=2, iters=1)
    assert search_ivf_index(spark, path, qv, k=5, nprobe=2).count() == 5


def test_rollback_rebuild_restores_parked_family(
    spark, tmp_path, monkeypatch
):
    """r14: the programmatic rollback the epoch refusal names. After a
    crashed swap, rollback_rebuild restores the parked pre-rebuild
    family (reverse swap order), search returns the PRE-rebuild
    answers, temp state is cleaned; with nothing parked it refuses,
    and with a CONSISTENT live family it refuses rather than destroy a
    healthy index over leftover residue."""
    import shutil as _sh

    import s3parq_spark.fs as fsmod
    from s3parq_spark.ann_index import rebuild_ivf_index, rollback_rebuild

    path = str(tmp_path / "idx")
    build_ivf_index(spark, _clustered_vecs(spark, range(100), 0), path,
                    "vec_id", "embedding", k=4, iters=2)
    append_to_ivf_index(spark, _clustered_vecs(spark, range(200, 300), 4),
                        path, "vec_id", "embedding")
    qv = [0.0] * 8
    qv[4] = 1.0
    before = _rows(search_ivf_index(spark, path, qv, k=8, nprobe=4))

    real_rename = fsmod.rename

    def crash_at_quantizer_swap(sp, src, dst):
        if src.rstrip("/").endswith("idx_quantizers.json"):
            raise RuntimeError("simulated crash mid-swap")
        return real_rename(sp, src, dst)

    monkeypatch.setattr(fsmod, "rename", crash_at_quantizer_swap)
    with pytest.raises(RuntimeError, match="simulated crash"):
        rebuild_ivf_index(spark, path, iters=2)
    monkeypatch.setattr(fsmod, "rename", real_rename)

    rep = rollback_rebuild(spark, path)
    assert path in rep["restored"]
    after = _rows(search_ivf_index(spark, path, qv, k=8, nprobe=4))
    assert after == before  # the pre-rebuild family answers again
    import glob as _glob
    assert not _glob.glob(str(tmp_path / "idx*rebuilding*"))
    assert not _glob.glob(str(tmp_path / "idx*prerebuild*"))
    # drift is back too (the restored family still carries the appends)
    assert index_drift(spark, path)["appended_n"] == 100

    with pytest.raises(ValueError, match="nothing to roll back"):
        rollback_rebuild(spark, path)

    # a healthy family with leftover residue must NOT be destroyed
    _sh.copytree(path, path + ".prerebuild")
    with pytest.raises(ValueError, match="consistent"):
        rollback_rebuild(spark, path)
    assert _rows(search_ivf_index(spark, path, qv, k=8, nprobe=4)) == before


def test_crash_mid_rollback_refuses_then_converges(
    spark, tmp_path, monkeypatch
):
    """r15 (VERDICT r14 #4): rollback_rebuild promises a crash BETWEEN
    its member restores leaves a REFUSING half-pinned family, never one
    that silently misprobes — fault-inject exactly that: the quantizer
    member restores (old epoch live again), then the index-dir restore
    dies. Search must raise (epoch mismatch / loud missing-index, never
    wrong answers), and a RE-RUN of rollback_rebuild converges to the
    bit-identical pre-rebuild results."""
    import s3parq_spark.fs as fsmod
    from s3parq_spark.ann_index import (
        QuantizerEpochError,
        rebuild_ivf_index,
        rollback_rebuild,
    )

    path = str(tmp_path / "idx")
    build_ivf_index(spark, _clustered_vecs(spark, range(100), 0), path,
                    "vec_id", "embedding", k=4, iters=2)
    append_to_ivf_index(spark, _clustered_vecs(spark, range(200, 260), 4),
                        path, "vec_id", "embedding")
    qv = [0.0] * 8
    qv[4] = 1.0
    before = _rows(search_ivf_index(spark, path, qv, k=8, nprobe=4))

    real_rename = fsmod.rename

    # crash #1: the rebuild swap dies at the quantizer-member rename —
    # the parked .prerebuild family is the rollback point
    def crash_swap(sp, src, dst):
        if src.rstrip("/").endswith("idx_quantizers.json"):
            raise RuntimeError("simulated swap crash")
        return real_rename(sp, src, dst)

    monkeypatch.setattr(fsmod, "rename", crash_swap)
    with pytest.raises(RuntimeError, match="simulated swap crash"):
        rebuild_ivf_index(spark, path, iters=2)

    # crash #2: the ROLLBACK itself dies after restoring the quantizer
    # member (first in reverse swap order) but before the index dir
    def crash_rollback(sp, src, dst):
        if src.rstrip("/").endswith("idx.prerebuild"):
            raise RuntimeError("simulated rollback crash")
        return real_rename(sp, src, dst)

    monkeypatch.setattr(fsmod, "rename", crash_rollback)
    with pytest.raises(RuntimeError, match="simulated rollback crash"):
        rollback_rebuild(spark, path)
    monkeypatch.setattr(fsmod, "rename", real_rename)

    # half-pinned: old quantizers live, index dir mid-restore — every
    # serve path REFUSES loudly (the docstring's promise), no wrong rows
    with pytest.raises((QuantizerEpochError, ValueError)):
        search_ivf_index(spark, path, qv, k=8, nprobe=4)

    # the re-run converges: restores the remaining member(s) and the
    # restored family answers bit-identically to the pre-rebuild state
    rep = rollback_rebuild(spark, path)
    assert path in rep["restored"]
    assert _rows(search_ivf_index(spark, path, qv, k=8, nprobe=4)) == before
    import glob as _glob

    assert not _glob.glob(str(tmp_path / "idx*rebuilding*"))
    assert not _glob.glob(str(tmp_path / "idx*prerebuild*"))


def test_overwrite_build_prewrite_failure_restores_healthy_index(
    spark, tmp_path, monkeypatch
):
    """ADVICE r15: the overwrite-build pre-pins the NEW epoch before any
    publish (fail-closed crash window), but an ORDINARY exception raised
    BEFORE anything destructive happens (validation error, concurrent
    write, sizing failure — all pre-writer.parquet) leaves the old rows
    and old quantizers fully consistent. The handler must restore the
    previous epoch so the previously healthy index keeps serving, while
    a failure AFTER the publish committed must keep the fail-closed
    pre-pin (the existing publish-to-pin gap test)."""
    import s3parq_spark.ann_index as ann

    path = str(tmp_path / "idx")
    build_ivf_index(spark, _clustered_vecs(spark, range(100), 0), path,
                    "vec_id", "embedding", k=4, iters=1)
    qv = [0.0] * 8
    qv[1] = 1.0
    before = _rows(search_ivf_index(spark, path, qv, k=5, nprobe=2))

    # inject a PRE-WRITE failure: the publish raises before touching data
    real_publish = ann.publish_path

    def refuse_publish(*a, **k):
        raise RuntimeError("injected pre-write validation failure")

    monkeypatch.setattr(ann, "publish_path", refuse_publish)
    with pytest.raises(RuntimeError, match="pre-write validation"):
        build_ivf_index(spark, _clustered_vecs(spark, range(60), 1),
                        path, "vec_id", "embedding", k=2, iters=1)
    monkeypatch.setattr(ann, "publish_path", real_publish)

    # nothing destructive happened -> the old family must still serve,
    # bit-identically (the pre-pin was rolled back)
    assert _rows(search_ivf_index(spark, path, qv, k=5, nprobe=2)) == before

    # and a later rebuild proceeds normally from the healthy state
    build_ivf_index(spark, _clustered_vecs(spark, range(60), 1), path,
                    "vec_id", "embedding", k=2, iters=1)
    assert search_ivf_index(spark, path, qv, k=5, nprobe=2).count() == 5
