"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so the (external) media libraries would touch whole
batches, never rows. The media libs are NOT in this container, so the
actual decoders are stubbed behind ``NotImplementedError`` with a
deterministic fake path used by tests — the Spark-side plumbing (schema,
batch shape, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_binary_payload(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap a column as the canonical multimodal shape:
    (id, payload binary, meta struct<n_bytes, mime>)."""
    payload = F.col(text_col).cast("binary")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str) -> bytes:
    """Real media decode (PIL/librosa/av) — not available in this
    container. The mapInPandas plumbing around it is real; swap this body
    for the actual decoder on a cluster with the media libs installed."""
    raise NotImplementedError(
        "media decoding requires image/audio libs not present in this image"
    )


def extract_features(
    media: DataFrame, id_col: str, deterministic_fake: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    With ``deterministic_fake`` the 'features' are cheap exact functions of
    the bytes (length, first byte, byte sum mod 2^31) so the pipeline is
    testable end-to-end; the real decoder plugs into the same batch shape.
    """
    # All-BIGINT output: the correctness oracle's value-hash is
    # type-sensitive, and DuckDB arithmetic lands on BIGINT — int32 here
    # would match values but fail the hash.
    out_schema = f"{id_col} long, n_bytes long, first_byte long, byte_sum long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            if not deterministic_fake:
                payloads = payloads.map(lambda b: decode_media(b, "application/octet-stream"))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int64"),
                    "byte_sum": payloads.map(lambda b: sum(b) % 2147483647).astype(
                        "int64"
                    ),
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def resize_payload(
    media: DataFrame, id_col: str, target_bytes: int
) -> DataFrame:
    """Resize every payload to exactly ``target_bytes`` — the media-agnostic
    stand-in for image resize / audio resample: truncate long payloads,
    cycle-repeat short ones (deterministic fake; a real resampler drops
    into the same Arrow batch shape). Emits the resized payload plus
    integrity scalars (n_bytes, checksum) so downstream stages and the
    oracle can verify without decoding."""
    out_schema = f"{id_col} long, payload binary, n_bytes long, checksum long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def resize(b: bytes) -> bytes:
            if not b:
                return bytes(target_bytes)
            reps = -(-target_bytes // len(b))  # ceil division
            return (b * reps)[:target_bytes]

        for pdf in it:
            resized = pdf["payload"].map(resize)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": resized,
                    "n_bytes": resized.map(len).astype("int64"),
                    "checksum": resized.map(
                        lambda b: sum(b) % 2147483647
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema=out_schema)


def frame_sample(media: DataFrame, id_col: str, stride: int) -> DataFrame:
    """Sample every ``stride``-th byte of the payload as a 'frame' — the
    plumbing shape of video frame-sampling (stride over the time axis);
    a real decoder swaps the byte stride for a frame stride with the
    identical batch signature. Emits frame count + integrity scalars."""
    out_schema = f"{id_col} long, n_frames long, first_frame long, frame_sum long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = pdf["payload"].map(lambda b: b[::stride])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_frames": frames.map(len).astype("int64"),
                    "first_frame": frames.map(
                        lambda f: f[0] if len(f) else -1
                    ).astype("int64"),
                    "frame_sum": frames.map(
                        lambda f: sum(f) % 2147483647
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema=out_schema)
