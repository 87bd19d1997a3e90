"""Stateful property: random lifecycle sequences keep fetch ≡ model.

The partition-evolution machinery threads through publish, fetch, restore,
expire and compaction; each is tested in isolation, but the failure mode
that escapes example-based tests is an unexpected INTERACTION (evolve →
restore → append → expire → evolve ...). This hypothesis state machine
drives random op sequences against a real dataset while maintaining a
driver-side model of (row ids, version history, current spec), asserting
after every step that:

- ``fetch_path`` returns exactly the model's live ids;
- a filtered fetch on the original partition column returns exactly the
  model rows matching (whichever spec each row's file landed under);
- the sidecar's spec bookkeeping matches the model's expectation of
  single- vs multi-spec.

Ops: append under the current spec, evolving append to a different spec,
restore to a random historical version, expire_snapshots, and
compact_dataset (the normalizer). Sequences are short (Spark ops are
~0.5–2 s each) but hypothesis shrinks any failure to a minimal script.
"""

import pytest
from hypothesis import HealthCheck, settings
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    precondition,
    rule,
    run_state_machine_as_test,
)
from hypothesis import strategies as st

from s3parq_spark import metadata
from s3parq_spark.fetch import fetch_path
from s3parq_spark.publish import (
    compact_dataset,
    expire_snapshots,
    publish_path,
    restore_dataset,
)

SPECS = (["p_a"], ["p_b"], ["p_a", "p_b"], [])


def _machine(spark, base_dir):
    import itertools

    dir_counter = itertools.count()  # unique dataset dir per EXAMPLE

    class EvolutionMachine(RuleBasedStateMachine):
        def __init__(self):
            super().__init__()
            self.path = None
            self.next_id = 0
            # model: [(version, ids_added, spec_idx)] — append-only until
            # restore/compact rewrite it
            self.versions = []
            self.rows = {}  # id -> (p_a, p_b)
            self.cur_spec = None

        def _frame(self, n):
            rows = []
            for _ in range(n):
                i = self.next_id
                self.next_id += 1
                row = (i, i % 3, f"s{i % 2}")
                rows.append(row)
                self.rows[i] = (row[1], row[2])
            return rows, spark.createDataFrame(
                rows, "id long, p_a long, p_b string"
            )

        def _publish(self, n, spec_idx, evolve):
            rows, df = self._frame(n)
            publish_path(
                spark,
                self.path,
                df,
                list(SPECS[spec_idx]),
                evolve_partitions=evolve,
            )
            self.versions.append(
                ((self.versions[-1][0] + 1) if self.versions else 1,
                 [r[0] for r in rows], spec_idx)
            )
            self.cur_spec = spec_idx

        @initialize(spec_idx=st.integers(0, len(SPECS) - 1),
                    n=st.integers(1, 4))
        def create(self, spec_idx, n):
            self.path = f"{base_dir}/ds{next(dir_counter)}"
            self._publish(n, spec_idx, evolve=False)

        @rule(n=st.integers(1, 4))
        def append_same_spec(self, n):
            self._publish(n, self.cur_spec, evolve=False)

        @rule(spec_idx=st.integers(0, len(SPECS) - 1), n=st.integers(1, 4))
        def evolve_append(self, spec_idx, n):
            self._publish(n, spec_idx, evolve=True)

        @precondition(lambda self: len(self.versions) >= 2)
        @rule(data=st.data())
        def restore(self, data):
            idx = data.draw(
                st.integers(0, len(self.versions) - 2), label="restore_to"
            )
            target = self.versions[idx][0]
            restore_dataset(spark, self.path, target)
            dropped = [v for v in self.versions[idx + 1:]]
            self.versions = self.versions[: idx + 1]
            for _, ids, _ in dropped:
                for i in ids:
                    self.rows.pop(i, None)
            self.cur_spec = self.versions[-1][2]

        @precondition(lambda self: len(self.versions) >= 3)
        @rule(keep=st.integers(1, 2))
        def expire(self, keep):
            expire_snapshots(spark, self.path, keep_last=keep)
            # fetch-visible state is unchanged; model versions compress the
            # same way the sidecar does (per contiguous same-spec run)
            cut = len(self.versions) - keep
            if cut > 1:
                squashed = self.versions[:cut]
                runs = []
                for v in squashed:
                    if runs and runs[-1][-1][2] == v[2]:
                        runs[-1].append(v)
                    else:
                        runs.append([v])
                bases = [
                    (run[-1][0], [i for v in run for i in v[1]], run[-1][2])
                    for run in runs
                ]
                if len(bases) < len(squashed):
                    self.versions = [*bases, *self.versions[cut:]]

        @rule()
        def compact(self):
            compact_dataset(spark, self.path)
            self.versions = [(1, sorted(self.rows), self.cur_spec)]

        @invariant()
        def fetch_matches_model(self):
            if self.path is None:
                return
            got = {r["id"] for r in fetch_path(spark, self.path).collect()}
            assert got == set(self.rows), (
                f"fetch ids {sorted(got)} != model {sorted(self.rows)}"
            )

        @invariant()
        def filtered_fetch_matches_model(self):
            if self.path is None:
                return
            # p_a is a partition under some specs and a data column under
            # others — when the engine accepts the filter it must be exact;
            # when it rejects (p_a a partition of NO live spec), the
            # rejection must agree with the sidecar's own spec record
            try:
                got = {
                    r["id"]
                    for r in fetch_path(
                        spark,
                        self.path,
                        [{"partition": "p_a", "comparison": "==",
                          "values": [1]}],
                    ).collect()
                }
            except ValueError:
                m = metadata.read_sidecar(spark, self.path)
                assert all(
                    "p_a" not in sp["partitions"] for sp in m.specs()
                ), "filter rejected though p_a partitions a live spec"
                return
            expected = {i for i, (a, _) in self.rows.items() if a == 1}
            assert got == expected

        @invariant()
        def spec_bookkeeping_consistent(self):
            if self.path is None:
                return
            m = metadata.read_sidecar(spark, self.path)
            assert m.partitions == list(SPECS[self.cur_spec])
            assert len(m.snapshots) == len(self.versions)
            assert [s["version"] for s in m.snapshots] == [
                v for v, _, _ in self.versions
            ]

    return EvolutionMachine


@pytest.mark.slow
def test_lifecycle_statemachine(spark, tmp_path):
    run_state_machine_as_test(
        _machine(spark, str(tmp_path)),
        settings=settings(
            max_examples=6,
            stateful_step_count=7,
            deadline=None,
            suppress_health_check=[
                HealthCheck.function_scoped_fixture,
                HealthCheck.too_slow,
            ],
        ),
    )
