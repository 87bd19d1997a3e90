"""Vectorized XXH64 + word-shingle pipeline over Arrow batches (numpy).

Bit-identical to the JVM expression pipeline it replaces
(``word_shingle_hashes`` → ``array_distinct`` → ``array_sort`` and the
``min(xxhash64(i, shingle))`` minhash aggregate): the hash is Spark's
catalyst ``XxHash64`` (seed 42, little-endian reads), word splitting
replicates ``split(trim(text), '\\s+')`` exactly (ASCII-space trim; Java
``\\s`` = ``[ \\t\\n\\x0B\\f\\r]``; limit −1 keeps leading/trailing empty
tokens), the shingle fold replicates ``zip_with(..., xxhash64(a, b))``
chaining, and distinct+sort is signed-int64 ascending.

Why: the JVM higher-order functions (``transform``/``zip_with``/
``array_distinct``/``array_sort``) run interpreted per element, and the
minhash aggregate pays an explode + ``num_hashes`` aggregate expressions
per shingle row plus a shuffle on the doc id (guide §4.2: hand whole
batches to vectorized native code instead). Here each task runs a few
dozen numpy kernels per Arrow batch: no explode, no shuffle for the
signature, one Python-boundary crossing of exactly (id, text).

Parity is pinned by ``tests/test_nphash_parity.py`` (fixed vectors
captured from Spark + randomized equivalence against the expression
pipeline, edge whitespace included).
"""

from __future__ import annotations

import numpy as np

P1 = np.uint64(0x9E3779B185EBCA87)
P2 = np.uint64(0xC2B2AE3D27D4EB4F)
P3 = np.uint64(0x165667B19E3779F9)
P4 = np.uint64(0x85EBCA77C2B2AE63)
P5 = np.uint64(0x27D4EB2F165667C5)
SEED = np.uint64(42)

#: Java ``\s`` byte set (ASCII-only; multi-byte UTF-8 chars never contain
#: these bytes, so byte-level splitting is exact)
_WS = np.array([9, 10, 11, 12, 13, 32], dtype=np.uint8)


def _rotl(x, r):
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix(h):
    h = h ^ (h >> np.uint64(33))
    h = h * P2
    h = h ^ (h >> np.uint64(29))
    h = h * P3
    h = h ^ (h >> np.uint64(32))
    return h


def hash_long(x, seed):
    """``XXH64.hashLong`` — Spark's ``xxhash64`` over one LongType value.
    ``x`` uint64 array; ``seed`` scalar or same-shape uint64 array."""
    with np.errstate(over="ignore"):
        x = np.asarray(x, dtype=np.uint64)
        seed = np.asarray(seed, dtype=np.uint64)
        h = seed + P5 + np.uint64(8)
        h = h ^ (_rotl(x * P2, 31) * P1)
        h = _rotl(h, 27) * P1 + P4
        return _fmix(h)


def hash_int(x, seed):
    """``XXH64.hashInt`` — Spark's ``xxhash64`` over one IntegerType value
    (the ``lit(i)`` hash-family index of the minhash aggregate)."""
    with np.errstate(over="ignore"):
        x = np.asarray(x, dtype=np.uint32).astype(np.uint64)
        seed = np.asarray(seed, dtype=np.uint64)
        h = seed + P5 + np.uint64(4)
        h = h ^ (x * P1)
        h = _rotl(h, 23) * P2 + P3
        return _fmix(h)


def _tail(h, mat, start, length):
    i = start
    while length - i >= 8:
        k8 = mat[:, i:i + 8].copy().view("<u8").reshape(-1)
        h = h ^ (_rotl(k8 * P2, 31) * P1)
        h = _rotl(h, 27) * P1 + P4
        i += 8
    if length - i >= 4:
        k4 = mat[:, i:i + 4].copy().view("<u4").reshape(-1).astype(np.uint64)
        h = h ^ (k4 * P1)
        h = _rotl(h, 23) * P2 + P3
        i += 4
    while i < length:
        b = mat[:, i].astype(np.uint64)
        h = h ^ (b * P5)
        h = _rotl(h, 11) * P1
        i += 1
    return h


def _hash_bytes_fixed(mat, seed):
    """XXH64 of n byte strings of one shared length L ((n, L) uint8)."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        return _hash_bytes_fixed_impl(mat, seed)


def _hash_bytes_fixed_impl(mat, seed):
    n, L = mat.shape
    seed = np.uint64(seed)
    if L >= 32:
        v1 = np.full(n, seed + P1 + P2, dtype=np.uint64)
        v2 = np.full(n, seed + P2, dtype=np.uint64)
        v3 = np.full(n, seed, dtype=np.uint64)
        v4 = np.full(n, seed - P1, dtype=np.uint64)
        i = 0
        while L - i >= 32:
            c = mat[:, i:i + 32].copy().view("<u8")
            v1 = _rotl(v1 + c[:, 0] * P2, 31) * P1
            v2 = _rotl(v2 + c[:, 1] * P2, 31) * P1
            v3 = _rotl(v3 + c[:, 2] * P2, 31) * P1
            v4 = _rotl(v4 + c[:, 3] * P2, 31) * P1
            i += 32
        h = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ (_rotl(v * P2, 31) * P1)) * P1 + P4
        h = h + np.uint64(L)
        h = _tail(h, mat, i, L)
    else:
        h = np.full(n, seed + P5, dtype=np.uint64) + np.uint64(L)
        h = _tail(h, mat, 0, L)
    return _fmix(h)


with np.errstate(over="ignore"):
    #: xxhash64('') — the hash of an empty token (leading/trailing
    #: separator under Java split limit −1)
    EMPTY_HASH = np.uint64(_fmix(SEED + P5))


def hash_bytes_ranges(buf, starts, ends, seed):
    """XXH64 of n variable-length byte strings given as [start, end)
    ranges into ``buf`` (uint8). Rows are grouped by length so each group
    runs the fixed-chunk-count path fully vectorized."""
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    lens = ends - starts
    out = np.empty(len(lens), dtype=np.uint64)
    for L in np.unique(lens):
        idx = np.nonzero(lens == L)[0]
        if L == 0:
            with np.errstate(over="ignore"):
                out[idx] = _fmix(np.uint64(seed) + P5)
            continue
        gather = starts[idx][:, None] + np.arange(L, dtype=np.int64)[None, :]
        out[idx] = _hash_bytes_fixed(buf[gather], seed)
    return out


def _string_bytes(arr):
    """pyarrow string array → (uint8 data buffer, start offsets, end
    offsets, validity bool array), all absolute into the buffer."""
    import pyarrow as pa

    if pa.types.is_dictionary(arr.type):
        arr = arr.dictionary_decode()
    if pa.types.is_large_string(arr.type):
        odt = np.int64
    else:
        odt = np.int32
    bufs = arr.buffers()
    item = np.dtype(odt).itemsize
    offs = np.frombuffer(
        bufs[1], dtype=odt, count=len(arr) + 1, offset=arr.offset * item
    ).astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    valid = arr.is_valid().to_numpy(zero_copy_only=False).astype(bool)
    return data, offs[:-1].copy(), offs[1:].copy(), valid


def shingle_docs(texts, n):
    """The whole ``_sized_shingle_table`` computation for one Arrow string
    array: returns ``(kept, values, counts)`` where ``kept`` indexes the
    input rows that survive (≥1 shingle), ``values`` is the concatenated
    per-doc sorted-distinct signed-int64 shingle hashes (doc-major), and
    ``counts[i]`` is the number of values for ``kept[i]``."""
    buf, S, E, valid = _string_bytes(texts)
    ndoc = len(S)
    if ndoc == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    S = S.copy()
    E = E.copy()
    S[~valid] = 0
    E[~valid] = 0

    # trim: ASCII space (0x20) ONLY — Spark `trim` semantics
    while True:
        idx = S < E
        lead = np.zeros(ndoc, bool)
        lead[idx] = buf[S[idx]] == 32
        if not lead.any():
            break
        S[lead] += 1
    while True:
        idx = S < E
        tr = np.zeros(ndoc, bool)
        tr[idx] = buf[E[idx] - 1] == 32
        if not tr.any():
            break
        E[tr] -= 1

    nb = buf.size
    ws = np.isin(buf, _WS)
    nonempty = S < E
    delta = np.zeros(nb + 1, np.int32)
    np.add.at(delta, S[nonempty], 1)
    np.add.at(delta, E[nonempty], -1)
    inb = np.cumsum(delta[:nb]) > 0
    tok = inb & ~ws

    bound_s = np.zeros(nb, bool)
    bound_s[S[nonempty]] = True
    bound_e = np.zeros(nb, bool)
    bound_e[E[nonempty] - 1] = True
    prev_tok = np.concatenate(([False], tok[:-1]))
    next_tok = np.concatenate((tok[1:], [False]))
    t_start = tok & (~prev_tok | bound_s)
    t_end = tok & (~next_tok | bound_e)
    ts = np.nonzero(t_start)[0]
    te = np.nonzero(t_end)[0] + 1

    dt = np.searchsorted(S, ts, side="right") - 1
    ntok = np.bincount(dt, minlength=ndoc).astype(np.int64)

    # empty tokens: Java split(limit=-1) keeps a leading '' when the
    # trimmed text starts with a separator, a trailing '' when it ends
    # with one, and yields [''] for an empty string
    lead_e = np.zeros(ndoc, bool)
    lead_e[nonempty] = ws[S[nonempty]]
    trail_e = np.zeros(ndoc, bool)
    trail_e[nonempty] = ws[E[nonempty] - 1]
    empty_doc = valid & ~nonempty

    wcount = ntok + lead_e + trail_e + empty_doc
    dwo = np.zeros(ndoc + 1, np.int64)
    np.cumsum(wcount, out=dwo[1:])
    WH = np.empty(dwo[-1], np.uint64)
    WH[dwo[:-1][lead_e]] = EMPTY_HASH
    WH[(dwo[1:] - 1)[trail_e]] = EMPTY_HASH
    WH[dwo[:-1][empty_doc]] = EMPTY_HASH
    tok_before = np.zeros(ndoc, np.int64)
    np.cumsum(ntok[:-1], out=tok_before[1:])
    tok_rank = np.arange(len(ts), dtype=np.int64) - tok_before[dt]
    WH[dwo[dt] + lead_e[dt] + tok_rank] = hash_bytes_ranges(buf, ts, te, SEED)

    # shingle fold: acc = w_i; for j in 1..n-1: acc = HL(w_{i+j}, HL(acc, 42))
    nsh = np.maximum(wcount - (n - 1), 0)
    sho = np.zeros(ndoc + 1, np.int64)
    np.cumsum(nsh, out=sho[1:])
    total = int(sho[-1])
    doc_of_sh = np.repeat(np.arange(ndoc, dtype=np.int64), nsh)
    sh_rank = np.arange(total, dtype=np.int64) - sho[doc_of_sh]
    base = dwo[doc_of_sh] + sh_rank
    acc = WH[base]
    for j in range(1, n):
        acc = hash_long(WH[base + j], hash_long(acc, SEED))
    vals = acc.view(np.int64)

    # per-doc sorted distinct (signed ascending — Spark array_sort)
    order = np.lexsort((vals, doc_of_sh))
    sv = vals[order]
    sd = doc_of_sh[order]
    if len(sv):
        keep = np.concatenate(
            ([True], (sv[1:] != sv[:-1]) | (sd[1:] != sd[:-1]))
        )
        sv = sv[keep]
        sd = sd[keep]
    cnt = np.bincount(sd, minlength=ndoc).astype(np.int64)
    kept = np.nonzero(cnt > 0)[0].astype(np.int64)
    return kept, sv, cnt[kept]


def minhash_from_values(values, counts, num_hashes):
    """Minhash signatures from the concatenated per-doc distinct shingle
    hashes: ``sig[d][j] = min over the doc's hashes of
    xxhash64(lit(j) :: int, hash :: long)`` with signed-int64 min — the
    exact semantics of the ``min(xxhash64(lit(i), col))`` aggregate.
    Returns an (ndoc, num_hashes) int64 matrix."""
    seg = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=seg[1:])
    u = values.view(np.uint64)
    sig = np.empty((len(counts), num_hashes), np.int64)
    seeds = hash_int(np.arange(num_hashes, dtype=np.uint32), SEED)
    for j in range(num_hashes):
        hj = hash_long(u, seeds[j]).view(np.int64)
        sig[:, j] = np.minimum.reduceat(hj, seg[:-1]) if len(hj) else 0
    return sig


def sized_shingle_batches(batch_iter, n, num_hashes=None):
    """mapInArrow body shared by the near-dup operators: input batches of
    exactly (id, text); yields (doc, sh, n[, sig]) — the sorted-distinct
    shingle-hash array, its size, and (when ``num_hashes``) the minhash
    signature, all computed in one vectorized pass."""
    import pyarrow as pa

    for batch in batch_iter:
        ids, texts = batch.column(0), batch.column(1)
        kept, values, counts = shingle_docs(texts, n)
        if len(kept) == 0:
            continue
        off = np.zeros(len(kept) + 1, np.int64)
        np.cumsum(counts, out=off[1:])
        sh = pa.ListArray.from_arrays(
            pa.array(off, type=pa.int32()), pa.array(values, type=pa.int64())
        )
        cols = [
            ids.take(pa.array(kept, type=pa.int64())),
            sh,
            pa.array(counts.astype(np.int32), type=pa.int32()),
        ]
        names = ["doc", "sh", "n"]
        if num_hashes:
            sig = minhash_from_values(values, counts, num_hashes)
            sig_off = np.arange(len(kept) + 1, dtype=np.int64) * num_hashes
            cols.append(
                pa.ListArray.from_arrays(
                    pa.array(sig_off, type=pa.int32()),
                    pa.array(sig.reshape(-1), type=pa.int64()),
                )
            )
            names.append("sig")
        yield pa.RecordBatch.from_arrays(cols, names=names)
