"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``
(SURVEY.md §7 phase 7 / task brief).

The decode step is STUBBED — the image/audio libraries are not in this
container — behind ``decoder=`` hooks that default to a deterministic
fake (byte statistics standing in for pixel statistics).  Everything
Spark-side is real and tested: schema, batch iteration, partitioning,
UDF signatures, and the output contract.  Swapping the fake for
Pillow/librosa is a one-function change on the executors.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the feature extractor (stable driver-facing contract).
FEATURE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_byte", DoubleType()),
        StructField("feature_ok", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def attach_binary_payload(
    df: DataFrame,
    source_col: str,
    id_col: str,
    modality: str = "image",
) -> DataFrame:
    """Build a multimodal table from any string column: payload =
    UTF-8 bytes (deterministic stand-in for a real media blob), plus
    typed metadata columns.  Schema: (id, modality, payload binary,
    width int, height int)."""
    payload = F.encode(F.col(source_col), "UTF-8")
    n = F.length(payload)
    return df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        # deterministic fake dimensions derived from the payload size
        (F.pmod(n, F.lit(640)) + 1).cast("int").alias("width"),
        (F.pmod(n, F.lit(480)) + 1).cast("int").alias("height"),
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real decoder: byte statistics.
    A real deployment replaces this with e.g. PIL.Image.open."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    return {
        "n_bytes": len(payload),
        "mean_byte": float(sum(payload)) / len(payload),
    }


def extract_features(
    mm: DataFrame,
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``mapInPandas`` streams batches of (id, modality, payload, width,
    height); the decoder runs per-row inside the batch; failures yield
    feature_ok='error:<msg>' rows instead of killing the task — at 100 TB
    a handful of corrupt blobs must not fail the job."""
    dec = decoder or fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    feats = dec(row.payload)
                    out.append(
                        (
                            row.id,
                            row.modality,
                            feats["n_bytes"],
                            row.width,
                            row.height,
                            round(feats["mean_byte"], 6),
                            "ok",
                        )
                    )
                except Exception as e:  # noqa: BLE001 — per-row isolation
                    out.append((row.id, row.modality, None, row.width, row.height, None, f"error:{e}"))
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return mm.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    mm: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling plumbing: split the payload into fixed-stride
    "frames" (stand-in for video frame extraction), at most
    ``max_frames`` per document.  Pure JVM (substring over binary cast
    to string is lossy, so slice the byte array instead)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                p = row.payload or b""
                for i in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    out.append((row.id, i, p[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return mm.mapInPandas(run, FRAME_SCHEMA)


def resize_payload(
    mm: DataFrame,
    target_width: int = 32,
    target_height: int = 32,
) -> DataFrame:
    """Resize plumbing: deterministic stride-sampling of the payload down
    to ``target_width × target_height`` bytes (stand-in for real pixel
    resampling — swap the inner loop for PIL.Image.resize on real
    executors).  Output keeps the multimodal schema with updated
    dimension metadata, so resize composes with extract_features /
    sample_frames downstream."""
    budget = target_width * target_height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                p = row.payload or b""
                if len(p) <= budget:
                    small = p
                else:
                    stride = len(p) / budget
                    small = bytes(p[int(i * stride)] for i in range(budget))
                out.append((row.id, row.modality, small, target_width, target_height))
            yield pd.DataFrame(
                out, columns=["id", "modality", "payload", "width", "height"]
            )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("modality", StringType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    return mm.mapInPandas(run, schema)


def decode_image_real(payload: bytes) -> dict:
    """The real decoder slot — requires Pillow, not present in this
    container (task brief: stub behind NotImplementedError)."""
    raise NotImplementedError(
        "image decoding requires Pillow/libvips on the executors; "
        "wire it here and pass decoder=decode_image_real"
    )
