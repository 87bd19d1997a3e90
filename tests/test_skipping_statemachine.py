"""Stateful property: the data-skipping plane never changes answers.

The per-file zone/bloom state now lives in immutable columnar manifests
(r10) and is touched by every lifecycle op — publish collects it, append
inherits the declaration, compact re-collects for rewritten files,
merge-on-read upsert appends fingerprinted row images over eq-deleted
eras, restore/discard GC pointers. A stale or mis-attributed fingerprint
would silently DROP matching files on point probes — exactly the bug
class example tests miss because it needs an adversarial SCHEDULE.

This machine drives random publish/append/declare/compact/upsert/restore
sequences against a real dataset while keeping a driver-side model of
{key -> value}, asserting after every step that, for adversarial probe
keys (live, never-existed, upserted-over):

- ``fetch(key == k)`` equals the model, AND
- equals the same fetch with BOTH driver-side file prunes bypassed
  (skips must be pure optimization — r9 verdict 'next round' #7).
"""

import importlib

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

from s3parq_spark.publish import (
    compact_dataset,
    merge_upsert,
    publish_path,
    restore_dataset,
)

fetch_mod = importlib.import_module("s3parq_spark.fetch")


def _machine(spark, base_dir):
    import itertools

    dir_counter = itertools.count()

    def frame(rows):
        return spark.createDataFrame(rows, "key long, grp string, v long")

    class SkippingMachine(RuleBasedStateMachine):
        def __init__(self):
            super().__init__()
            self.path = None
            self.next_key = 0
            self.model = {}  # key -> (grp, v)
            self.history = []  # model snapshots per committed version
            self.declared = False

        def _rows(self, n, grp):
            out = []
            for _ in range(n):
                k = self.next_key
                self.next_key += 1
                out.append((k, grp, k * 10))
                self.model[k] = (grp, k * 10)
            return out

        def _decl_kwargs(self, declare):
            if not declare:
                return {}
            return {
                "zone_map_columns": ["v"],
                "file_bloom_columns": ["key"],
                "file_bloom_bits": 1024,
            }

        def _snapshot(self):
            self.history.append(dict(self.model))

        @initialize(declare=st.booleans())
        def fresh_dataset(self, declare):
            self.path = f"{base_dir}/ds{next(dir_counter)}"
            self.declared = declare
            rows = self._rows(6, "a")
            publish_path(
                spark, self.path, frame(rows), ["grp"],
                max_records_per_file=2, **self._decl_kwargs(declare),
            )
            self._snapshot()

        @rule(n=st.integers(1, 5), grp=st.sampled_from(["a", "b"]),
              declare=st.booleans())
        def append(self, n, grp, declare):
            # declare=True on an undeclared dataset STARTS the bloom plane
            # mid-life (older files have no fingerprints: must be kept)
            rows = self._rows(n, grp)
            kw = self._decl_kwargs(declare or self.declared)
            publish_path(
                spark, self.path, frame(rows), ["grp"], mode="append",
                max_records_per_file=2, **kw,
            )
            self.declared = self.declared or declare
            self._snapshot()

        @precondition(lambda self: len(self.model) >= 2)
        @rule(data=st.data())
        def upsert_mor(self, data):
            keys = sorted(self.model)
            picked = data.draw(
                st.lists(st.sampled_from(keys), min_size=1, max_size=3,
                         unique=True),
                label="upsert_keys",
            )
            rows = []
            for k in picked:
                grp, _ = self.model[k]
                rows.append((k, grp, k * 10 + 7))
                self.model[k] = (grp, k * 10 + 7)
            from pyspark.sql import functions as F

            batch = frame(rows).withColumn("seq", F.lit(1))
            merge_upsert(
                spark, self.path, batch, ["key"], "seq",
                mode="merge-on-read",
            )
            self._snapshot()

        @rule()
        def compact(self):
            compact_dataset(spark, self.path, max_records_per_file=3)
            self.model = dict(self.model)
            self.history = [dict(self.model)]

        @precondition(lambda self: len(self.history) >= 2)
        @rule(data=st.data())
        def restore(self, data):
            idx = data.draw(
                st.integers(0, len(self.history) - 2), label="restore_to"
            )
            restore_dataset(spark, self.path, idx + 1)
            self.history = self.history[: idx + 1]
            self.model = dict(self.history[-1])
            self.next_key = (max(self.model) + 1) if self.model else 0

        def _fetch_rows(self, flt):
            return {
                (r["key"], r["grp"], r["v"])
                for r in fetch_mod.fetch_path(
                    spark, self.path, filters=flt
                ).collect()
            }

        def _bypassed(self, flt):
            oz, ob = fetch_mod._prune_zone_files, fetch_mod._prune_bloom_files
            fetch_mod._prune_zone_files = lambda files, meta, zf, *a: files
            fetch_mod._prune_bloom_files = lambda files, meta, zf, *a: files
            try:
                return self._fetch_rows(flt)
            finally:
                fetch_mod._prune_zone_files = oz
                fetch_mod._prune_bloom_files = ob

        @invariant()
        def point_probes_exact_with_and_without_skips(self):
            if self.path is None or not self.declared:
                # undeclared value columns are not filterable (reference
                # partition-filter rule) — nothing to probe until a
                # declaring append starts the skipping plane
                return
            live = sorted(self.model)
            probes = {live[0], live[-1], self.next_key + 999}
            for k in probes:
                flt = [{"partition": "key", "comparison": "==",
                        "values": [int(k)]}]
                expected = (
                    {(k, *self.model[k])} if k in self.model else set()
                )
                got = self._fetch_rows(flt)
                assert got == expected, (k, got, expected)
                assert self._bypassed(flt) == expected, k
            # range probe exercises the zone (min/max) half
            vmax = live[-1] * 10 + 7
            flt = [{"partition": "v", "comparison": ">=", "values": [vmax]}]
            expected = {
                (k, g, v) for k, (g, v) in self.model.items() if v >= vmax
            }
            assert self._fetch_rows(flt) == expected
            assert self._bypassed(flt) == expected

        @invariant()
        def full_fetch_matches_model(self):
            if self.path is None:
                return
            got = self._fetch_rows(None)
            assert got == {
                (k, g, v) for k, (g, v) in self.model.items()
            }

    return SkippingMachine


@pytest.mark.slow
def test_skipping_statemachine(spark, tmp_path):
    run_state_machine_as_test(
        _machine(spark, str(tmp_path)),
        settings=settings(
            max_examples=5,
            stateful_step_count=6,
            deadline=None,
            suppress_health_check=[
                HealthCheck.function_scoped_fixture,
                HealthCheck.too_slow,
            ],
        ),
    )
