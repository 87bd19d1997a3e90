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
            payloads = pdf[payload_col]
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
