"""Idempotent-writer txn ledger under randomized lifecycle schedules.

The ledger's one correctness obligation: it must NEVER claim a batch
whose snapshot the history no longer holds (a false claim makes the
writer silently skip a needed re-merge — data loss), while claims whose
snapshots survive must persist (a lost claim merely costs a duplicate,
value-correct replay — the safe direction). The model mirrors the
design: a list of (version, stamp) commits; expire folds stamps into
squash bases (ledger-lossless by construction), restore drops stamps
above the cut and recomputes max-per-writer. After every op the real
sidecar's ledger must equal the model's.
"""

import random

import pytest

from s3parq_spark import metadata
from s3parq_spark.publish import (
    compact_dataset,
    expire_snapshots,
    merge_upsert,
    publish_path,
    restore_dataset,
)


def _model_ledger(stamps):
    led = {}
    for _v, (app, ver) in stamps:
        if ver > led.get(app, -1):
            led[app] = ver
    return led


@pytest.mark.parametrize("seed", [7, 21])
def test_txn_ledger_statemachine(spark, tmp_path, seed):
    rng = random.Random(seed)
    ds = str(tmp_path / "ds")

    def rows(k0):
        return spark.createDataFrame(
            [(k0, 1.0, 100), (k0 + 1, 2.0, 100)], "k long, v double, seq long"
        )

    # model: stamps = [(snapshot version, (app, writer version))]
    stamps = []
    counters = {"w1": -1, "w2": -1}
    publish_path(spark, ds, rows(0), [])
    head = 1

    for step in range(14):
        op = rng.choice(
            ["stamped_append", "stamped_mor", "plain_append",
             "replay", "expire", "restore", "compact"]
        )
        meta = metadata.read_sidecar(spark, ds)
        if op == "stamped_append":
            app = rng.choice(["w1", "w2"])
            counters[app] += 1
            publish_path(spark, ds, rows(step * 10), [],
                         _txn={"app": app, "version": counters[app]})
            head = meta.snapshots[-1]["version"] + 1
            stamps.append((head, (app, counters[app])))
        elif op == "stamped_mor":
            app = rng.choice(["w1", "w2"])
            counters[app] += 1
            merge_upsert(
                spark, ds, rows(step * 10), ["k"], "seq",
                mode="merge-on-read",
                txn={"app": app, "version": counters[app]},
            )
            head = meta.snapshots[-1]["version"] + 1
            stamps.append((head, (app, counters[app])))
        elif op == "plain_append":
            publish_path(spark, ds, rows(step * 10), [])
            head = meta.snapshots[-1]["version"] + 1
        elif op == "replay":
            # an at-least-once writer re-sends an OLD version: the
            # monotone ledger must not move backwards
            app = rng.choice(["w1", "w2"])
            if counters[app] >= 0:
                publish_path(spark, ds, rows(step * 10), [],
                             _txn={"app": app, "version": 0})
                head = meta.snapshots[-1]["version"] + 1
                stamps.append((head, (app, 0)))
        elif op == "expire" and len(meta.snapshots) > 3:
            expire_snapshots(spark, ds, keep_last=2)
            # ledger-lossless: squash folds stamps into bases — the
            # model keeps every stamp (their versions may now name a
            # base, which only matters to restore below)
        elif op == "restore" and len(meta.snapshots) > 2:
            # restore to a surviving version strictly below head
            target = rng.choice(
                [s["version"] for s in meta.snapshots[:-1]]
            )
            restore_dataset(spark, ds, target)
            head = target
            # model: claims above the cut are destroyed... except claims
            # folded into a surviving squash BASE keep their provability
            # (the base's version is the run's LAST version; stamps of
            # squashed snapshots <= base version by construction, so
            # version <= target keeps exactly the provable ones)
            stamps = [(v, s) for v, s in stamps if v <= target]
        elif op == "compact":
            # maintenance rewrite: history restarts at v1 but the folded
            # ledger carries, stamped onto the v1 snapshot as a
            # squash-base ``txns`` dict — so every surviving claim is
            # provable at version 1 from now on (restore keeps them)
            compact_dataset(spark, ds)
            head = 1
            stamps = [
                (1, (a, v)) for a, v in sorted(_model_ledger(stamps).items())
            ]
        got = metadata.read_sidecar(spark, ds).txns
        want = _model_ledger(stamps)
        assert got == want, (step, op, got, want)
