"""Stateful property: random WAP x merge-on-read lifecycle sequences keep
fetch ≡ model.

Staged snapshots, predicate tombstones, EQUALITY key-deletes (r9
merge-on-read upserts), restore and expiry each carry their own
version-ordering rules; the escape route for example-based tests is an
interaction (stage → tombstone → upsert → promote → expire →
restore ...). This machine drives random op sequences against a real
dataset with a driver-side model of the snapshot list, asserting after
every step that the main read equals the model's visible (id, grp) ROWS
(not just ids: a failed eq-delete leaves the OLD image alive with a
different grp and the row-set comparison catches it), the staged/
tombstone/eq-delete bookkeeping matches, and (as a rule) that
``fetch_at`` of a random historical version equals the model's as-of
view — including the audit read of a staged version and era-correct
application of both tombstone kinds.
"""

import pytest
from hypothesis import HealthCheck, settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    precondition,
    rule,
    run_state_machine_as_test,
)

from s3parq_spark import metadata
from s3parq_spark.fetch import fetch_at, fetch_path
from s3parq_spark.publish import (
    delete_where,
    discard_snapshot,
    expire_snapshots,
    merge_upsert,
    promote_snapshot,
    publish_path,
    restore_dataset,
)


def _machine(spark, base_dir):
    import itertools

    dir_counter = itertools.count()

    class WapMorMachine(RuleBasedStateMachine):
        def __init__(self):
            super().__init__()
            self.path = None
            self.next_id = 0
            # model snapshot list, version order:
            # {"version", "rows": [(id, grp)..], "staged": bool,
            #  "pred": threshold or None (tombstone: id < threshold),
            #  "eq": set of upserted-over ids or None}
            self.snaps = []

        # -- model helpers ------------------------------------------------

        def _head(self):
            return self.snaps[-1]["version"] if self.snaps else 0

        def _visible(self, as_of=None, audit_of=None):
            snaps = self.snaps
            if as_of is not None:
                snaps = [s for s in snaps if s["version"] <= as_of]
            tombs = [
                (s["version"], s["pred"])
                for s in snaps
                if s["pred"] is not None
            ]
            eqs = [
                (s["version"], s["eq"])
                for s in snaps
                if s.get("eq") is not None
            ]
            out = set()
            for s in snaps:
                if s["staged"] and s["version"] != audit_of:
                    continue
                for i, g in s["rows"]:
                    if any(
                        tv > s["version"] and i < p for tv, p in tombs
                    ):
                        continue
                    if any(
                        ev > s["version"] and i in ks for ev, ks in eqs
                    ):
                        continue
                    out.add((i, g))
            return out

        def _frame(self, n):
            ids = list(range(self.next_id, self.next_id + n))
            self.next_id += n
            rows = [(i, i % 3) for i in ids]
            return rows, spark.createDataFrame(rows, "id long, grp long")

        # -- ops ----------------------------------------------------------

        @initialize(n=st.integers(1, 4))
        def create(self, n):
            self.path = f"{base_dir}/ds{next(dir_counter)}"
            rows, df = self._frame(n)
            publish_path(spark, self.path, df, [])
            self.snaps = [
                {"version": 1, "rows": rows, "staged": False,
                 "pred": None, "eq": None}
            ]

        @rule(n=st.integers(1, 4))
        def append(self, n):
            rows, df = self._frame(n)
            publish_path(spark, self.path, df, [])
            self.snaps.append(
                {"version": self._head() + 1, "rows": rows,
                 "staged": False, "pred": None, "eq": None}
            )

        @rule(n=st.integers(1, 3))
        def stage(self, n):
            rows, df = self._frame(n)
            publish_path(spark, self.path, df, [], staged=True)
            self.snaps.append(
                {"version": self._head() + 1, "rows": rows,
                 "staged": True, "pred": None, "eq": None}
            )

        @precondition(lambda self: any(s["staged"] for s in self.snaps))
        @rule(data=st.data())
        def promote(self, data):
            staged = [s for s in self.snaps if s["staged"]]
            s = data.draw(st.sampled_from(staged), label="promote")
            new_v = promote_snapshot(spark, self.path, s["version"])
            self.snaps.remove(s)
            assert new_v == self._head() + 1
            self.snaps.append(
                {"version": new_v, "rows": s["rows"],
                 "staged": False, "pred": None, "eq": None}
            )

        @precondition(lambda self: any(s["staged"] for s in self.snaps))
        @rule(data=st.data())
        def discard(self, data):
            staged = [s for s in self.snaps if s["staged"]]
            s = data.draw(st.sampled_from(staged), label="discard")
            discard_snapshot(spark, self.path, s["version"])
            self.snaps.remove(s)

        @rule(data=st.data())
        def mor_delete(self, data):
            thr = data.draw(
                st.integers(0, max(self.next_id, 1)), label="threshold"
            )
            n = delete_where(
                spark, self.path, f"id < {thr}", mode="merge-on-read"
            )
            expected_n = len(
                {(i, g) for i, g in self._visible() if i < thr}
            )
            assert n == expected_n
            if n > 0:
                self.snaps.append(
                    {"version": self._head() + 1, "rows": [],
                     "staged": False, "pred": thr, "eq": None}
                )

        @precondition(
            lambda self: not any(s["staged"] for s in self.snaps)
        )
        @rule(data=st.data(), n_new=st.integers(0, 2))
        def mor_upsert(self, data, n_new):
            visible_ids = sorted({i for i, _ in self._visible()})
            # force at least one update when there are no inserts (else
            # the step would silently no-op and never reach merge_upsert)
            lo = min(0 if n_new else 1, len(visible_ids))
            n_upd = data.draw(
                st.integers(lo, min(3, len(visible_ids))),
                label="n_updates",
            ) if visible_ids else 0
            upd_ids = (
                data.draw(
                    st.lists(st.sampled_from(visible_ids), min_size=n_upd,
                             max_size=n_upd, unique=True),
                    label="update_ids",
                )
                if n_upd
                else []
            )
            new_ids = list(range(self.next_id, self.next_id + n_new))
            self.next_id += n_new
            ids = [*upd_ids, *new_ids]
            if not ids:
                return  # nothing to upsert this step
            v = self._head() + 1
            rows = [(i, 100 + v) for i in ids]  # grp marks the new image
            batch = spark.createDataFrame(
                [(i, g, 1) for i, g in rows], "id long, grp long, seq int"
            )
            merge_upsert(
                spark, self.path, batch, ["id"], "seq",
                mode="merge-on-read",
            )
            self.snaps.append(
                {"version": v, "rows": rows, "staged": False,
                 "pred": None, "eq": set(ids)}
            )

        @precondition(lambda self: len(self.snaps) >= 2)
        @rule(data=st.data())
        def restore(self, data):
            idx = data.draw(
                st.integers(0, len(self.snaps) - 2), label="restore_to"
            )
            target = self.snaps[idx]["version"]
            restore_dataset(spark, self.path, target)
            self.snaps = self.snaps[: idx + 1]

        @precondition(lambda self: len(self.snaps) >= 3)
        @rule(keep=st.integers(1, 2))
        def expire(self, keep):
            expire_snapshots(spark, self.path, keep_last=keep)
            cut = len(self.snaps) - keep
            if cut > 1:
                squashed = self.snaps[:cut]
                runs = []
                for s in squashed:
                    boundary = (
                        s["staged"]
                        or s["pred"] is not None
                        or s.get("eq") is not None
                    )
                    if boundary or not runs or runs[-1][0]:
                        runs.append([boundary, [s]])
                    else:
                        runs[-1][1].append(s)
                bases = []
                changed = False
                for boundary, run in runs:
                    if len(run) == 1:
                        bases.append(run[0])
                        continue
                    changed = True
                    bases.append(
                        {
                            "version": run[-1]["version"],
                            "rows": [r for s in run for r in s["rows"]],
                            "staged": False,
                            "pred": None,
                            "eq": None,
                        }
                    )
                if changed:
                    self.snaps = [*bases, *self.snaps[cut:]]

        @precondition(lambda self: bool(self.snaps))
        @rule(data=st.data())
        def time_travel_matches_model(self, data):
            s = data.draw(st.sampled_from(self.snaps), label="as_of")
            v = s["version"]
            got = {
                (r["id"], r["grp"])
                for r in fetch_at(spark, self.path, v).collect()
            }
            expected = self._visible(as_of=v, audit_of=v)
            assert got == expected, (
                f"fetch_at({v}) {sorted(got)} != model {sorted(expected)}"
            )

        # -- invariants ---------------------------------------------------

        @invariant()
        def fetch_matches_model(self):
            if self.path is None:
                return
            got = {
                (r["id"], r["grp"])
                for r in fetch_path(spark, self.path).collect()
            }
            expected = self._visible()
            assert got == expected, (
                f"fetch {sorted(got)} != model {sorted(expected)}"
            )

        @invariant()
        def bookkeeping_matches(self):
            if self.path is None:
                return
            m = metadata.read_sidecar(spark, self.path)
            assert [s["version"] for s in m.snapshots] == [
                s["version"] for s in self.snaps
            ]
            assert m.staged_versions() == [
                s["version"] for s in self.snaps if s["staged"]
            ]
            assert m.tombstones() == [
                (s["version"], f"id < {s['pred']}")
                for s in self.snaps
                if s["pred"] is not None
            ]
            assert [v for v, _ in m.eq_deletes()] == [
                s["version"] for s in self.snaps if s.get("eq") is not None
            ]

    return WapMorMachine


@pytest.mark.slow
def test_wap_mor_statemachine(spark, tmp_path):
    run_state_machine_as_test(
        _machine(spark, str(tmp_path)),
        settings=settings(
            max_examples=6,
            stateful_step_count=8,
            deadline=None,
            suppress_health_check=[
                HealthCheck.too_slow,
                HealthCheck.data_too_large,
                HealthCheck.filter_too_much,
            ],
        ),
    )
