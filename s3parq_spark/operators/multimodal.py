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
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "byte_len": [len(p) for p in payloads],
                        "first_byte": [p[0] if len(p) else -1 for p in payloads],
                        "checksum": [
                            int(sum(p) % 9_223_372_036_854_775_807) for p in payloads
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
