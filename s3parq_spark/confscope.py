"""Thread-safe scoped overrides of session-global Spark SQL confs.

``spark.conf`` is one shared SQLConf per session: the naive
``prev = get; set(v); ...; restore(prev)`` pattern breaks as soon as two
driver threads overlap on the same key (guide §2.6 runs publishes from
thread pools) — thread B can snapshot ``prev`` AFTER thread A already
set the override and then "restore" the override value permanently, or
a restore can land between another thread's set and its write
submission. For ``spark.sql.parquet.outputTimestampType`` that silently
truncates every later timestamp write in the session (ADVICE r15).

``scoped_conf`` fixes it with a per-key depth count under one lock: the
FIRST scope in snapshots the true previous value and sets the override;
nested/concurrent scopes wanting the SAME value just increment the
depth; the LAST scope out restores the snapshot. A scope wanting a
DIFFERENT value for an actively-held key waits for the holders to
drain (today's callers never actually conflict — publish always wants
MILLIS, the one MICROS caller is a serial fixture builder — so the wait
is a correctness backstop, not a throughput path).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

_GUARD = threading.Condition()
#: key -> {"depth": int, "value": str, "prev": Optional[str]}
_HELD: dict = {}

#: backstop against a programming error that would otherwise deadlock a
#: conflicting scope forever (a thread nesting two different values of
#: the same key); generous because the holder may be mid-write
_CONFLICT_WAIT_SECS = 600.0


@contextmanager
def scoped_conf(spark, key: str, value):
    """Set ``key`` to ``value`` for the duration of the block, restoring
    the pre-scope value when the last concurrent scope exits."""
    sval = str(value)
    with _GUARD:
        deadline = None
        while True:
            st = _HELD.get(key)
            if st is None or st["depth"] == 0:
                prev = spark.conf.get(key, None)
                spark.conf.set(key, sval)
                _HELD[key] = {"depth": 1, "value": sval, "prev": prev}
                break
            if st["value"] == sval:
                st["depth"] += 1
                break
            # conflicting value: wait for the current holders to drain
            import time as _time

            if deadline is None:
                deadline = _time.monotonic() + _CONFLICT_WAIT_SECS
            remaining = deadline - _time.monotonic()
            if remaining <= 0:
                raise RuntimeError(
                    f"scoped_conf: timed out waiting to set {key}="
                    f"{sval}; held at {st['value']} by {st['depth']} "
                    "scope(s) for over "
                    f"{int(_CONFLICT_WAIT_SECS)}s — a scope is likely "
                    "leaking or a thread nested conflicting values"
                )
            _GUARD.wait(timeout=remaining)
    try:
        yield
    finally:
        with _GUARD:
            st = _HELD[key]
            st["depth"] -= 1
            if st["depth"] == 0:
                if st["prev"] is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, st["prev"])
                _GUARD.notify_all()
