"""Multimodal columns — §2.I9 + training-pipeline mandate.

Images/audio/video ride through the engine as opaque `binary` columns
with a typed metadata struct — the same carrier the Connect BYTES
schema type provides (SURVEY.md §1.2). The Spark-side plumbing is
real and tested: schema, Arrow batch shape, mapInPandas signatures,
partitioning. The actual codecs (PIL/ffmpeg/librosa) are NOT in this
container, so `decode_*` uses a clearly-marked deterministic fake
keyed on payload bytes; swap `_STUB_DECODERS=False` on a cluster with
the libs installed and the same plumbing carries real decoding.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: this container has no image/audio codecs — deterministic fake
_STUB_DECODERS = True

META_SCHEMA = "struct<mime:string,n_bytes:bigint,modality:string>"
DECODED_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, width int, height int, "
    "n_frames int, decoder string"
)


def attach_payload(df: DataFrame, text_col: str = "text", mime: str = "image/png") -> DataFrame:
    """Wrap content as (payload binary, meta struct) — the multimodal
    column pair every downstream operator consumes."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.split(F.lit(mime), "/")[0].alias("modality"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def decode_images(df: DataFrame) -> DataFrame:
    """'Decode' image payloads via mapInPandas. Batch shape, schema and
    partitioning are production-real; pixel decoding is stubbed
    (deterministic dims from byte length) because codecs are absent."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].str.len()
            if not _STUB_DECODERS:  # pragma: no cover - requires PIL
                raise NotImplementedError("real codec path requires PIL/ffmpeg")
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n.astype("int64"),
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "n_frames": ((n % 16) + 1).astype("int32"),
                    "decoder": "stub-deterministic",
                }
            )
            yield out

    flat = df.select("doc_id", "payload", F.col("meta.mime").alias("mime"))
    return flat.mapInPandas(decode, DECODED_SCHEMA)


FEATURES_SCHEMA = "doc_id bigint, features array<double>"


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas — the
    embed-the-image step of a training pipeline. Stub features are
    deterministic byte arithmetic (length, first/last byte, a mixed
    residue), each divided by a power of two so every component is
    exactly representable in binary FP — bit-identical across engines
    with no rounding step. Real model inference drops into the same
    batch loop (load the model once per Python worker, infer per
    Arrow batch)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not _STUB_DECODERS:  # pragma: no cover - requires a model runtime
                raise NotImplementedError("real featurizer requires an inference lib")
            b = pdf["payload"]
            n = b.str.len().astype("int64")
            first = b.str[0].fillna(0).astype("int64")
            last = b.str[-1].fillna(0).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": [
                        [ni / 1024.0, fi / 256.0, li / 256.0, (ni * 7 % 256) / 256.0]
                        for ni, fi, li in zip(n, first, last)
                    ],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(extract, FEATURES_SCHEMA)


def sample_frames(decoded: DataFrame, stride: int = 4) -> DataFrame:
    """Frame sampling: one row per sampled frame index (video path).
    Pure JVM explode — no Python."""
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))
    return decoded.select("doc_id", "n_frames", F.explode(idx).alias("frame_idx"))


def resize_meta(decoded: DataFrame, max_side: int = 256) -> Column:
    """Resize planning (metadata-only): scale factor to fit max_side."""
    scale = F.least(
        F.lit(max_side) / F.col("width"), F.lit(max_side) / F.col("height"), F.lit(1.0)
    )
    return F.round(scale, 4)
