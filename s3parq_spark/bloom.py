"""Per-FILE bloom fingerprints for driver-side point-lookup skipping.

The zone-map plane (``publish(zone_map_columns=...)``) prunes files from
per-file [min, max] — which only bites when the column is clustered
(sorted/zordered). A point lookup on a SCATTERED high-cardinality key
(``doc_id == X`` over an ingest-ordered corpus) matches every file's
min/max and scans everything. This module is the other half of the
data-skipping story: publish records a small bloom fingerprint of each
new file's values for the declared columns (``file_bloom_columns``), and
fetch drops every file whose fingerprint proves the probed key absent —
at the DRIVER, before the py4j path transfer, the JVM file index, or any
footer read. Iceberg puts the same idea in puffin files / Delta in
per-file stats; parquet's own bloom (``bloom_filter_columns``) still
prunes row groups INSIDE the files that survive.

Geometry: k = 4 hash probes per value; the bit width m is chosen per
publish (``file_bloom_bits``, default 8192 = 1 KiB of sidecar hex per
file per column) and recorded with each fingerprint, so files written
under different budgets coexist. False-positive rate is
``(1 - e^(-k*n/m))^k`` for n distinct values per file: ~0.1% at n=400,
~1.2% at n=800 under the default. An under-sized fingerprint (n >> m/10)
degrades toward keep-everything but can never drop a matching file —
size ``file_bloom_bits`` to ~10x the distinct keys per file
(``maxRecordsPerFile`` is the natural anchor). Collection cost is
bounded by m, not rows: the per-file aggregation state is k sets of
DISTINCT bit positions (<= m entries each however many rows the file
has).

The two base hashes are the first/second 60-bit halves of md5 of the
value's canonical string form, combined Kirsch–Mitzenmacher style
(``h1 + i*h2 mod m``). md5-of-string is the one hash both engines
compute identically: collection runs JVM-side as ``conv(substr(md5(cast
(col as string)),...),16,10)`` (no Python in the write path) and probing
runs driver-side via ``hashlib`` — the same portable-hash trick the
oracle parity layer uses (ARCHITECTURE.md §7).

Reference analog: none (extension; the reference's fetch surface is
partition-only, ``fetch_parq.py:131-172``).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, List

#: probes per value — fixed (part of the fingerprint contract)
K_HASHES = 4
#: default per-file fingerprint width in bits (1 KiB hex per column)
DEFAULT_M_BITS = 8192
#: accepted ``file_bloom_bits`` range: below 64 nothing prunes, above
#: 2^20 the sidecar JSON stops being a sidecar (puffin-class payloads
#: belong in their own files)
MIN_M_BITS, MAX_M_BITS = 64, 1 << 20

#: value vocabularies whose Spark ``cast(col as string)`` provably equals
#: Python ``str()`` of the typed filter value: strings are identity,
#: integers print identically in both engines. Floats (trailing-zero
#: rules), decimals (scale padding), dates/timestamps (format) and
#: booleans (true vs True) do not round-trip — rejected at declaration.
PORTABLE_VOCABS = ("string", "integer")


def validate_bits(m_bits: int) -> int:
    if not isinstance(m_bits, int) or not MIN_M_BITS <= m_bits <= MAX_M_BITS:
        raise ValueError(
            f"file_bloom_bits must be an int in [{MIN_M_BITS}, "
            f"{MAX_M_BITS}]; got {m_bits!r}"
        )
    return m_bits


def spark_position_exprs(col: str, m_bits: int) -> List[str]:
    """The K_HASHES per-row bit positions as Spark SQL expressions (NULL
    for a NULL value — collect_set then drops it, so NULLs set no bits;
    ``== None`` probes never consult the bloom)."""
    base = f"md5(cast(`{col}` as string))"
    h1 = f"cast(conv(substr({base}, 1, 15), 16, 10) as bigint)"
    h2 = f"cast(conv(substr({base}, 16, 15), 16, 10) as bigint)"
    # h1 + 3*h2 < 2^62: no 64-bit overflow
    return [f"pmod({h1} + {i} * {h2}, {m_bits})" for i in range(K_HASHES)]


def positions(value_str: str, m_bits: int) -> List[int]:
    """Driver-side twin of ``spark_position_exprs`` — must stay
    bit-identical (tests pin the equality on random values)."""
    d = hashlib.md5(value_str.encode("utf-8")).hexdigest()
    h1 = int(d[:15], 16)
    h2 = int(d[15:30], 16)
    return [(h1 + i * h2) % m_bits for i in range(K_HASHES)]


def canonical_str(value) -> str:
    """Canonical probe form of a TYPED filter value (str or int — the
    PORTABLE_VOCABS contract): what Spark's ``cast(col as string)``
    produced at collection time."""
    return value if isinstance(value, str) else str(value)


def pack(m_bits: int, all_positions: Iterable[int]) -> List:
    """Pack set-bit positions into the sidecar's self-describing
    ``[m_bits, hex]`` fingerprint."""
    bits = 0
    for p in all_positions:
        bits |= 1 << int(p)
    return [m_bits, format(bits, f"0{(m_bits + 3) // 4}x")]


def parse(fingerprint):
    """``[m_bits, hex]`` → ``(m_bits, bits_int)``, or ``None`` for an
    unreadable fingerprint (callers must then KEEP the file). Parsing is
    the dominant prune cost (one big-int conversion of m/4 hex chars), so
    prune loops call this once per file and probe the int many times."""
    try:
        m_bits, hexstr = fingerprint
        m_bits = int(m_bits)
        bits = int(hexstr, 16)
        if m_bits < MIN_M_BITS:
            return None
        return m_bits, bits
    except (TypeError, ValueError):
        return None


def bits_contain(bits: int, probe_positions: List[int]) -> bool:
    return all((bits >> p) & 1 for p in probe_positions)


def may_contain(fingerprint, value) -> bool:
    """False only when the file PROVABLY lacks ``value`` (every kept file
    still gets the exact predicate row-level and in parquet pushdown).
    Unreadable fingerprints keep the file."""
    parsed = parse(fingerprint)
    if parsed is None:
        return True  # unreadable fingerprint: conservative keep
    m_bits, bits = parsed
    return bits_contain(bits, positions(canonical_str(value), m_bits))
