"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

The Spark-side plumbing — schema, partitioning, batch iteration, UDF
signatures — is real and tested; the actual media DECODE step is stubbed
(``stub_decode_image`` raises ``NotImplementedError`` unless a decoder
callable is injected) because no image/audio libraries exist in this
container. At deployment, swap the stub for Pillow/torchaudio/ffmpeg and
nothing else changes: batches stay Arrow-shaped, partitioning is by file or
content hash, and the operator never materializes more than one batch per
task."""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: schema fragment every multimodal table carries
MULTIMODAL_SCHEMA_DDL = (
    "payload binary, media_type string, width int, height int, duration_ms bigint"
)


def _bytes(p) -> bytes:
    """NULL payloads (outer-joined media tables, NULL source columns) are
    treated as empty payloads: every operator already defines the empty
    shape (first_byte=-1, zero audio windows, one empty fake frame), while
    a bare None would crash the whole job inside the Arrow batch loop
    (TypeError: object of type NoneType has no len())."""
    return b"" if p is None else p


def attach_binary_payload(
    df: DataFrame, source_col: str, media_type: str = "text/plain"
) -> DataFrame:
    """Wrap a column as an opaque binary payload + media-type metadata —
    the canonical shape for multimodal ingestion (payload stays opaque to
    the engine; only metadata is queryable without decode)."""
    return (
        df.withColumn("payload", F.encode(F.col(source_col), "UTF-8"))
        .withColumn("media_type", F.lit(media_type))
    )


def stub_decode_image(payload: bytes) -> "object":
    """Placeholder decoder. Deployment injects a real decoder (e.g. Pillow's
    ``Image.open(BytesIO(payload))``); the container has no media libraries,
    and a silent fake here would hide that."""
    raise NotImplementedError(
        "media decoding requires an image library not present in this "
        "container; inject decode= into extract_binary_features"
    )


def extract_binary_features(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    decode: Optional[Callable[[bytes], object]] = None,
    featurize: Optional[Callable[[object], dict]] = None,
) -> DataFrame:
    """Per-payload feature extraction via ``mapInPandas`` (Arrow batches, not
    rows). Default features are decode-free byte statistics (length, first
    byte, xxhash-free checksum) so the plumbing is fully testable here; with
    ``decode``/``featurize`` injected the same operator runs real media
    feature extraction, one Arrow batch at a time, per partition."""

    out_schema = f"{id_col} bigint, byte_len bigint, first_byte int, checksum bigint"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [_bytes(p) for p in pdf[payload_col]]
            if decode is not None and featurize is not None:
                feats = [featurize(decode(p)) for p in payloads]
                yield pd.DataFrame(
                    {id_col: pdf[id_col], **pd.DataFrame(feats).to_dict("series")}
                )
            else:
                # r16 (guide §4.2): the checksum is a byte sum — a pure
                # Python sum() walked every payload byte row-at-a-time;
                # numpy sums the same bytes vectorized. Values are
                # identical: an int64 accumulator cannot overflow below
                # ~2^55 payload bytes, and the modulus is unchanged
                # (pinned by test_media_checksum_parity).
                import numpy as np

                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "byte_len": [len(p) for p in payloads],
                        "first_byte": [p[0] if len(p) else -1 for p in payloads],
                        "checksum": [
                            int(
                                np.frombuffer(p, dtype=np.uint8)
                                .sum(dtype=np.int64)
                                % 9_223_372_036_854_775_807
                            )
                            for p in payloads
                        ],
                    }
                )

    return df.select(id_col, payload_col).mapInPandas(op, schema=out_schema)


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    target: tuple = (224, 224),
    decode: Optional[Callable[[bytes], object]] = None,
    resize: Optional[Callable[[object, tuple], bytes]] = None,
) -> DataFrame:
    """Batch image resize via ``mapInPandas``: payload in → resized payload +
    target dims out. Decode/resize are injected at deployment (Pillow:
    ``decode=Image.open∘BytesIO``, ``resize=lambda im, t:
    im.resize(t).tobytes()``); without them the operator is a loud stub —
    the Spark-side contract (schema ``payload binary``, one Arrow batch per
    yield, per-partition iteration) is the tested part."""

    out_schema = f"{id_col} bigint, payload binary, width int, height int"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode is None or resize is None:
                raise NotImplementedError(
                    "image resize requires a media library not present in "
                    "this container; inject decode= and resize="
                )
            out = [resize(decode(_bytes(p)), target) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": out,
                    "width": target[0],
                    "height": target[1],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, schema=out_schema)


def audio_window_features(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    window_samples: int = 32,
    decode: Optional[Callable[[bytes], list]] = None,
) -> DataFrame:
    """Windowed audio features over PCM payloads: one payload → one row per
    ``window_samples`` window with integer-exact energy (Σv²), peak and
    sample count — the 1→N ``mapInPandas`` shape again, Arrow-batched.

    ``decode(payload) -> [sample, ...]`` is injected at deployment
    (torchaudio/soundfile for real containers); the default interprets the
    payload as unsigned 8-bit PCM — which is CORRECT for raw u8 PCM and
    doubles as the deterministic test path for arbitrary bytes. All outputs
    are integers, so results are engine-exact end to end."""

    out_schema = (
        f"{id_col} bigint, window_id int, n_samples int, energy bigint, peak int"
    )

    def u8_pcm(payload: bytes) -> list:
        return list(payload)

    fn = decode or u8_pcm

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wids, ns, es, pk = [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                samples = fn(_bytes(p))
                # empty payload → no windows (0 samples yields 0 rows)
                for w in range(0, len(samples), window_samples):
                    win = samples[w : w + window_samples]
                    ids.append(i)
                    wids.append(w // window_samples)
                    ns.append(len(win))
                    es.append(sum(v * v for v in win))
                    pk.append(max(win))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "window_id": pd.Series(wids, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "energy": pd.Series(es, dtype="int64"),
                    "peak": pd.Series(pk, dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    every_ms: int = 1000,
    demux: Optional[Callable[[bytes, int], list]] = None,
) -> DataFrame:
    """Frame sampling: one input video payload → MANY output frame rows
    (``mapInPandas`` is the right shape for 1→N; a scalar pandas_udf cannot
    change cardinality). ``demux(payload, every_ms) -> [(ts_ms, frame_bytes),
    ...]`` is injected at deployment (pyav/ffmpeg); the default is a
    deterministic fake that emits byte-slice "frames" so cardinality,
    ordering and schema are testable without media libraries — marked fake
    by ``media_type='application/x-fake-frame'``."""

    out_schema = (
        f"{id_col} bigint, frame_ts_ms bigint, frame binary, media_type string"
    )

    def fake_demux(payload: bytes, step: int) -> list:
        n = max(1, min(4, len(payload) // 16))  # deterministic: ≤4 slices
        return [
            (i * step, payload[i * 16 : (i + 1) * 16]) for i in range(n)
        ]

    fn = demux or fake_demux
    mt = "application/x-fake-frame" if demux is None else "video/frame"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, tss, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                for ts, fr in fn(_bytes(p), every_ms):
                    ids.append(i)
                    tss.append(ts)
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": frames,
                    "media_type": mt,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, schema=out_schema)


def _ahash_from_pixels(pixels) -> Optional[int]:
    """60-bit average hash from a grayscale pixel sequence: sample 64
    pixels evenly, bit_i = (pixel_i >= mean) for the first 60 samples
    (integer-exact: ``p*64 >= total``). None for empty input."""
    n = len(pixels)
    if n == 0:
        return None
    sampled = [int(pixels[(i * n) // 64]) for i in range(64)]
    total = sum(sampled)
    h = 0
    for i in range(60):
        if sampled[i] * 64 >= total:
            h |= 1 << i
    return h


def perceptual_hash(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    decode: Optional[Callable[[bytes], "object"]] = None,
) -> DataFrame:
    """Adds ``ahash: bigint`` — a 60-bit AVERAGE HASH (the classic aHash
    perceptual fingerprint: sample a fixed grid, threshold each sample at
    the mean) over the binary payload. Two images that differ only by
    mild re-encoding/brightness shifts keep small Hamming distance — the
    standard first-pass signal for image-level dedup of a multimodal
    corpus.

    ``decode`` injected (deployment: decode → grayscale → flat pixel
    list) runs per payload through an Arrow-batched ``mapInPandas``.
    Without it the payload bytes are interpreted as UTF-8 text and
    sampled via ``ascii(substr(...))`` — ONE whole-stage-codegen JVM
    expression, no Python in the loop, and byte-for-byte replayable in
    the SQL oracle (the same deterministic-fake-decode stance as the
    other media operators: the plumbing and the hash algebra are real
    and tested; only the pixel source is faked in this container).

    Empty/NULL payloads hash to NULL (dedup then ignores them rather
    than colliding every empty payload onto one fingerprint)."""
    if decode is not None:
        # SAME output contract as the fake path: every input column passes
        # through (typed from df.schema, never hardcoded) plus ahash —
        # swapping the real decoder in must not change the frame shape
        from pyspark.sql import types as T

        out_schema = T.StructType(
            [*df.schema.fields, T.StructField("ahash", T.LongType(), True)]
        )

        def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                hashes = [
                    _ahash_from_pixels(decode(_bytes(p)))
                    for p in pdf[payload_col]
                ]
                yield pdf.assign(ahash=hashes)

        return df.mapInPandas(op, out_schema)

    # array + higher-order functions, NOT 60 inlined copies of the
    # 64-term pixel sum: project-collapse would re-substitute the pixel
    # expressions into every bit term (60×64 ascii() nodes — minutes of
    # analysis); as one array the plan stays a few nodes
    s = "__ph_s"
    # non-BMP characters normalize to '?' BEFORE sampling: Spark's ascii()
    # is charAt(0) (returns the high surrogate) while the Python model and
    # the SQL oracle return the full code point — replacing astral chars
    # (1 char for 1 char, so sampling positions stay aligned) keeps all
    # three implementations bit-identical
    out = (
        df.withColumn(
            s,
            F.regexp_replace(
                F.expr(f"decode({payload_col}, 'UTF-8')"),
                "[\\x{10000}-\\x{10FFFF}]",
                "?",
            ),
        )
        .withColumn(
            "__ph_pix",
            F.array(
                *[
                    F.expr(
                        f"ascii(substr({s}, 1 + (({i} * length({s})) div 64), 1))"
                    )
                    for i in range(64)
                ]
            ),
        )
        .withColumn(
            "__ph_tot",
            F.expr("aggregate(__ph_pix, 0, (a, x) -> a + x)"),
        )
    )
    h = F.expr(
        "aggregate(zip_with(slice(__ph_pix, 1, 60), sequence(0, 59), "
        "(x, i) -> IF(x * 64 >= __ph_tot, shiftleft(CAST(1 AS BIGINT), i), "
        "CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    return (
        out.withColumn(
            "ahash",
            F.when(F.length(F.col(s)) > 0, h).otherwise(F.lit(None)),
        )
        .drop(s, "__ph_pix", "__ph_tot")
    )


def phash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    payload_col: str = "payload",
    bands: int = 4,
    max_hamming: int = 3,
    decode: Optional[Callable[[bytes], "object"]] = None,
) -> DataFrame:
    """Near-duplicate MEDIA pairs by perceptual hash: banded LSH over the
    60-bit aHash + exact ``bit_count(xor)`` verify, via the SAME
    ``banded_hamming_pairs`` engine as the simhash text fingerprint (one
    copy of the plan shape). Returns ``(doc_a, doc_b, hamming)`` with
    ``doc_a < doc_b``; NULL hashes (empty payloads) never pair.

    Recall contract (pigeonhole): complete for pairs with Hamming ≤
    bands-1 (the defaults, 4 bands / ≤3, are inside that bound); a
    larger ``max_hamming`` has BOUNDED recall — such pairs surface only
    when some band happens to match, the simhash_neardup_pairs stance."""
    from .dedup import banded_hamming_pairs

    fps = perceptual_hash(df, id_col, payload_col, decode=decode).select(
        F.col(id_col).alias("doc"), "ahash"
    ).filter(F.col("ahash").isNotNull())
    return banded_hamming_pairs(fps, "ahash", 60, bands, max_hamming)
