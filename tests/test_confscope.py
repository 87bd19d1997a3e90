"""scoped_conf: thread-safe scoped session-conf overrides (ADVICE r15).

The naive prev=get/set/restore pattern leaks the override when two
driver threads overlap on the same key (thread B snapshots prev AFTER
thread A set the override, then "restores" the override permanently).
These tests pin the refcounted semantics with a stub conf — the logic
under test is pure threading, no Spark session required.
"""

import threading
import time

from s3parq_spark import confscope
from s3parq_spark.confscope import scoped_conf

KEY = "spark.test.scoped_conf"


class _StubConf:
    def __init__(self, initial=None):
        self._d = {} if initial is None else dict(initial)

    def get(self, key, default=None):
        return self._d.get(key, default)

    def set(self, key, value):
        self._d[key] = str(value)

    def unset(self, key):
        self._d.pop(key, None)


class _StubSpark:
    def __init__(self, initial=None):
        self.conf = _StubConf(initial)


def test_restores_unset_key():
    spark = _StubSpark()
    with scoped_conf(spark, KEY, "A"):
        assert spark.conf.get(KEY) == "A"
    assert spark.conf.get(KEY) is None


def test_restores_previous_value():
    spark = _StubSpark({KEY: "orig"})
    with scoped_conf(spark, KEY, "A"):
        assert spark.conf.get(KEY) == "A"
    assert spark.conf.get(KEY) == "orig"


def test_nested_same_value_restores_once():
    spark = _StubSpark({KEY: "orig"})
    with scoped_conf(spark, KEY, "A"):
        with scoped_conf(spark, KEY, "A"):
            assert spark.conf.get(KEY) == "A"
        # inner exit must NOT restore while the outer scope is live
        assert spark.conf.get(KEY) == "A"
    assert spark.conf.get(KEY) == "orig"


def test_concurrent_same_value_never_leaks():
    """The exact ADVICE interleaving: N threads set/restore the same
    override concurrently; afterwards the original value must hold (the
    naive pattern leaks the override here)."""
    spark = _StubSpark({KEY: "orig"})
    n, hold = 8, 0.02
    inside = []
    errors = []

    def worker():
        try:
            with scoped_conf(spark, KEY, "A"):
                inside.append(spark.conf.get(KEY))
                time.sleep(hold)
                inside.append(spark.conf.get(KEY))
        except Exception as e:  # pragma: no cover - diagnostic
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # every observation inside any scope saw the override...
    assert set(inside) == {"A"}
    # ...and the last scope out restored the ORIGINAL value, not "A"
    assert spark.conf.get(KEY) == "orig"


def test_conflicting_value_waits_for_holder():
    spark = _StubSpark()
    order = []
    entered = threading.Event()
    release = threading.Event()

    def holder():
        with scoped_conf(spark, KEY, "A"):
            entered.set()
            release.wait(timeout=5)
            order.append(("holder-exit", spark.conf.get(KEY)))

    def contender():
        entered.wait(timeout=5)
        with scoped_conf(spark, KEY, "B"):
            order.append(("contender-in", spark.conf.get(KEY)))

    th = threading.Thread(target=holder)
    tc = threading.Thread(target=contender)
    th.start()
    tc.start()
    time.sleep(0.05)
    # contender must still be waiting — the holder owns the key with "A"
    assert spark.conf.get(KEY) == "A"
    assert order == []
    release.set()
    th.join(timeout=5)
    tc.join(timeout=5)
    assert order == [("holder-exit", "A"), ("contender-in", "B")]
    assert spark.conf.get(KEY) is None


def test_exception_inside_scope_still_restores():
    spark = _StubSpark({KEY: "orig"})
    try:
        with scoped_conf(spark, KEY, "A"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(KEY) == "orig"
    # and the key is free for the next scope
    with scoped_conf(spark, KEY, "B"):
        assert spark.conf.get(KEY) == "B"
    assert spark.conf.get(KEY) == "orig"


def test_distinct_keys_do_not_interact():
    spark = _StubSpark()
    other = KEY + ".other"
    with scoped_conf(spark, KEY, "A"):
        with scoped_conf(spark, other, "B"):
            assert spark.conf.get(KEY) == "A"
            assert spark.conf.get(other) == "B"
        assert spark.conf.get(other) is None
    assert spark.conf.get(KEY) is None


def test_timeout_raises_loudly(monkeypatch):
    monkeypatch.setattr(confscope, "_CONFLICT_WAIT_SECS", 0.1)
    spark = _StubSpark()
    entered = threading.Event()
    release = threading.Event()

    def holder():
        with scoped_conf(spark, KEY, "A"):
            entered.set()
            release.wait(timeout=5)

    th = threading.Thread(target=holder)
    th.start()
    entered.wait(timeout=5)
    try:
        import pytest

        with pytest.raises(RuntimeError, match="timed out"):
            with scoped_conf(spark, KEY, "B"):
                pass  # pragma: no cover
    finally:
        release.set()
        th.join(timeout=5)
