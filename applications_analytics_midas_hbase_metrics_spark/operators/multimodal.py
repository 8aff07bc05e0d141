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
from pyspark.sql import DataFrame, Window
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
    a handful of corrupt blobs must not fail the job.

    Dimensions come from the DECODER when it reports them (a real
    decoder parses width/height out of the binary header — e.g.
    decode_image_real's BITMAPINFOHEADER fields), falling back to the
    frame's metadata columns only for decoders that don't (fake_decode)
    or on decode failure.  This routes the parsed header fields through
    the output, so a dimension-parsing bug in the decoder shows up in
    the differential gate, not just in unit tests."""
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
                            feats.get("width", row.width),
                            feats.get("height", row.height),
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


#: PNG file signature (RFC 2083 §3.1).
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_image_real(payload: bytes) -> dict:
    """Real image decoding for the two formats that need no imaging
    library: uncompressed 24-bit BMP (numpy straight off the byte
    buffer, BITMAPINFOHEADER offsets) and 8-bit RGB PNG (stdlib zlib
    inflate + numpy scanline unfilter, :func:`decode_png`).  Returns
    n_bytes / mean_byte (the extract_features contract) plus the true
    pixel dimensions parsed from the binary header.  Every other
    format still raises NotImplementedError — wire Pillow/libvips here
    on real executors and the error-isolation in extract_features
    routes undecodable blobs to 'error:' rows instead of failing the
    task."""
    if payload is not None and payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError(
            "only uncompressed 24-bit BMP and 8-bit RGB PNG decode without "
            "Pillow/libvips; wire a full decoder here and pass "
            "decoder=decode_image_real"
        )
    import numpy as np

    off = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        raise NotImplementedError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression})"
        )
    rows = abs(height)
    arr = _bmp_rows(payload, off, width, height)
    return {
        "n_bytes": len(payload),
        "mean_byte": float(arr.mean()),
        "width": width,
        "height": rows,
    }


def _bmp_rows(payload: bytes, off: int, width: int, height: int):
    """The (rows, width*3) top-down uint8 pixel array of a parsed
    uncompressed 24-bit BMP (padding stripped, bottom-up order
    flipped) — shared by decode_image_real's statistics and
    patchify_images' tile math."""
    import numpy as np

    rows = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    if off + row_bytes * rows > len(payload):
        raise ValueError("truncated BMP payload")
    arr = np.frombuffer(payload, np.uint8, count=row_bytes * rows, offset=off)
    arr = arr.reshape(rows, row_bytes)[:, : width * 3]
    if height > 0:  # positive height = bottom-up row order
        arr = arr[::-1]
    return arr


def patchify_images(
    df: DataFrame,
    patch: int = 2,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """ViT-style patch grid over decoded images: each uncompressed
    24-bit BMP payload splits into ``patch``×``patch``-pixel tiles
    (FULL tiles only — the trailing remainder is dropped, the standard
    ViT convention of resizing to a multiple of the patch size
    upstream) and every tile reports its mean byte value — the
    cheapest stand-in for the per-patch embedding a vision tower would
    compute, with the Spark-side plumbing (Arrow batching, per-row
    error isolation, deterministic tile order) being the real subject.

    Tile sums are exact integers (≤ patch²·3·255 « 2⁵³), so the mean
    is bit-identical in any summation order and the closed-form pixel
    fixture replays in SQL.  Undecodable payloads emit ONE
    (patch_row=-1, patch_col=-1, patch_mean=NULL) row instead of
    failing the task — the extract_features error-isolation contract.

    Returns (id, patch_row, patch_col, patch_mean)."""
    from collections.abc import Iterator as _Iter

    def run(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                rid = int(getattr(row, id_col))
                payload = getattr(row, payload_col)
                try:
                    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
                        raise NotImplementedError("not an uncompressed BMP")
                    off = int.from_bytes(payload[10:14], "little")
                    width = int.from_bytes(payload[18:22], "little", signed=True)
                    height = int.from_bytes(payload[22:26], "little", signed=True)
                    bpp = int.from_bytes(payload[28:30], "little")
                    comp = int.from_bytes(payload[30:34], "little")
                    if bpp != 24 or comp != 0 or width <= 0 or height == 0:
                        raise NotImplementedError("unsupported BMP variant")
                    px = _bmp_rows(payload, off, width, height).reshape(
                        abs(height), width, 3
                    )
                except Exception:  # noqa: BLE001 — per-row isolation
                    out.append((rid, -1, -1, None))
                    continue
                h, w = px.shape[0], px.shape[1]
                for pr in range(h // patch):
                    for pc in range(w // patch):
                        tile = px[
                            pr * patch : (pr + 1) * patch,
                            pc * patch : (pc + 1) * patch,
                        ]
                        out.append(
                            (
                                rid,
                                pr,
                                pc,
                                round(
                                    int(tile.astype(np.int64).sum())
                                    / (patch * patch * 3),
                                    6,
                                ),
                            )
                        )
            yield pd.DataFrame(
                out, columns=["id", "patch_row", "patch_col", "patch_mean"]
            )

    return df.select(
        F.col(id_col).cast("bigint").alias(id_col), F.col(payload_col)
    ).mapInPandas(
        run,
        "id bigint, patch_row bigint, patch_col bigint, patch_mean double",
    )


def image_ahash(
    df: DataFrame,
    patch: int = 2,
    grid: int = 8,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """Average-hash (aHash) image signature — the classic perceptual
    near-dup key, composed ENTIRELY from existing DataFrame ops on top
    of :func:`patchify_images`: the top-left ``grid``x``grid`` tile
    block of each decoded image contributes one bit per tile
    (tile mean > image mean over the block), serialized in (row, col)
    order as a '0'/'1' string.  Images with identical pixel content
    hash identically; a dedup groups on the signature (for
    hamming-distance near-matches, band the bit string exactly like
    simhash — the same multi-index machinery applies).

    Exactness across engines is integer arithmetic: the tile SUM is
    recovered from patchify's 6-decimal mean (error 6e-6 < 1/2, so
    round(mean*3*patch² ) is the exact integer sum) and the threshold
    compare is ``tile_sum * n_tiles > total_sum`` — no float average
    ever crosses an engine boundary.

    Returns (id, n_tiles, ahash) — n_tiles in the key guards
    different-geometry images from colliding on short strings.
    Undecodable payloads (patchify's error rows) emit n_tiles=0 with
    an empty signature."""
    tiles = patchify_images(
        df, patch=patch, id_col=id_col, payload_col=payload_col
    )
    denom = 3 * patch * patch
    t8 = tiles.filter(
        (F.col("patch_row") >= 0)
        & (F.col("patch_row") < grid)
        & (F.col("patch_col") < grid)
    ).select(
        "id",
        "patch_row",
        "patch_col",
        F.round(F.col("patch_mean") * denom).cast("bigint").alias("_s"),
    )
    per_img = t8.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tiles"),
        F.sum("_s").alias("_tot"),
        F.array_sort(
            F.collect_list(F.struct("patch_row", "patch_col", "_s"))
        ).alias("_tl"),
    )
    bits = F.expr(
        "array_join(transform(_tl, t ->"
        " if(t._s * n_tiles > _tot, '1', '0')), '')"
    )
    hashed = per_img.select("id", "n_tiles", bits.alias("ahash"))
    # error rows (patch_row=-1) never pass the filter; re-attach those
    # ids with an empty signature so the output is total over input
    all_ids = tiles.select("id").distinct()
    return (
        all_ids.join(hashed, "id", "left")
        .select(
            "id",
            F.coalesce("n_tiles", F.lit(0)).cast("bigint").alias("n_tiles"),
            F.coalesce("ahash", F.lit("")).alias("ahash"),
        )
    )


def audio_fingerprint(
    df: DataFrame,
    frame: int = 8,
    max_frames: int = 64,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """Energy-sign audio fingerprint — the audio sibling of
    :func:`image_ahash`, composed from DataFrame ops on top of
    :func:`frame_audio`: the first ``max_frames`` frames contribute
    one bit each (frame energy > clip mean over those frames),
    serialized in frame order.  Identical PCM content fingerprints
    identically; dedup groups on (n_frames, fp) — the shape of every
    spectral fingerprinting scheme (Shazam-style peaks, chromaprint)
    reduced to its deterministic level-sign core.

    The integer-exactness recipe is image_ahash's: the frame SUM of
    absolute amplitudes is recovered from frame_audio's 6-decimal mean
    times ``frame * n_channels`` — the mean divides by frame·ch, so
    multiplying by frame alone would recover only sum/ch
    (half-integers on stereo, bit-flip risk at the threshold on any
    engine that rounds differently); with the full product the
    recovery is an exact integer (rounding error 5e-7 × frame × ch
    < 1/2 for frame·ch <= 1e5) and the threshold is
    ``frame_sum * n_frames > total`` — no float mean crosses an engine
    boundary for mono OR multichannel clips.  Undecodable payloads
    emit (0, '').

    Returns (id, n_frames, fp)."""
    frames = frame_audio(
        df, frame=frame, id_col=id_col, payload_col=payload_col
    )
    fr = frames.filter(
        (F.col("frame_idx") >= 0) & (F.col("frame_idx") < max_frames)
    ).select(
        "id",
        "frame_idx",
        F.round(F.col("frame_mean_abs") * frame * F.col("n_channels"))
        .cast("bigint")
        .alias("_s"),
    )
    per = fr.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum("_s").alias("_tot"),
        F.array_sort(F.collect_list(F.struct("frame_idx", "_s"))).alias("_fl"),
    )
    bits = F.expr(
        "array_join(transform(_fl, t ->"
        " if(t._s * n_frames > _tot, '1', '0')), '')"
    )
    hashed = per.select("id", "n_frames", bits.alias("fp"))
    all_ids = frames.select("id").distinct()
    return all_ids.join(hashed, "id", "left").select(
        "id",
        F.coalesce("n_frames", F.lit(0)).cast("bigint").alias("n_frames"),
        F.coalesce("fp", F.lit("")).alias("fp"),
    )


#: Magic header of the toy video container: ``VID0`` + u32 frame count
#: + per frame (u32 length + uncompressed BMP bytes).  A REAL codec
#: (H.264 etc.) needs libraries this container deliberately avoids —
#: the Spark-side plumbing (binary parse, frame explode, per-row error
#: isolation, downstream reuse of the image operators) is the subject,
#: exactly like the BMP/PNG/WAV fixtures.
VIDEO_MAGIC = b"VID0"


def explode_video_frames(
    df: DataFrame, id_col: str = "id", payload_col: str = "payload"
) -> DataFrame:
    """Video → frame rows: parse the length-prefixed container and emit
    one (id, frame_idx, frame_payload) row per frame — each payload a
    standalone BMP any image operator consumes (patchify_images,
    image_ahash), so the whole image toolchain lifts to video for free.
    Undecodable containers emit ONE (frame_idx=-1, NULL) row — the
    per-row isolation contract.  Truncated frames raise inside the row
    and land in the same error row — including a LYING header: a
    declared frame count that runs past the payload hits the
    short-header check below (``pos + 4 <= len``) before any slice is
    taken, because ``int.from_bytes(b'') == 0`` would otherwise turn a
    truncated container into up to 2³²-1 zero-length "frames" and
    break the isolation contract with a single bad row."""
    from collections.abc import Iterator as _Iter

    def run(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                rid = int(getattr(row, id_col))
                payload = getattr(row, payload_col)
                try:
                    if payload is None or payload[:4] != VIDEO_MAGIC:
                        raise NotImplementedError("not a VID0 container")
                    n = int.from_bytes(payload[4:8], "little")
                    pos = 8
                    frames = []
                    for f in range(n):
                        if pos + 4 > len(payload):
                            raise ValueError(
                                f"short header: frame {f}/{n} has no "
                                "length prefix"
                            )
                        ln = int.from_bytes(payload[pos : pos + 4], "little")
                        body = payload[pos + 4 : pos + 4 + ln]
                        if len(body) < ln:
                            raise ValueError(f"truncated frame {f}")
                        frames.append((f, bytes(body)))
                        pos += 4 + ln
                except Exception:  # noqa: BLE001 — per-row isolation
                    out.append((rid, -1, None))
                    continue
                out.extend((rid, f, b) for f, b in frames)
            yield pd.DataFrame(
                out, columns=["id", "frame_idx", "frame_payload"]
            )

    return df.select(
        F.col(id_col).cast("bigint").alias(id_col), F.col(payload_col)
    ).mapInPandas(run, "id bigint, frame_idx bigint, frame_payload binary")


def _frame_composite(good: DataFrame, stride: int) -> DataFrame:
    """(id, frame_idx, frame_payload) → (id = doc·stride + frame_idx,
    payload) for reusing the image operators on exploded video frames —
    with a LOUD guard: a container holding ≥ ``stride`` frames would
    otherwise silently collide its tail frames into the next doc's id
    space and corrupt every downstream signature, so the overflow
    raises (callers pass a bigger ``frame_stride`` for longer clips;
    the decode path itself has no frame limit)."""
    composite = F.when(
        F.col("frame_idx") < stride,
        F.col("id") * stride + F.col("frame_idx"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"video frame_idx >= frame_stride ({stride}) for doc "
                ),
                F.col("id").cast("string"),
                F.lit(" — raise frame_stride to keep composite ids unique"),
            )
        )
    )
    return good.select(
        composite.cast("bigint").alias("id"),
        F.col("frame_payload").alias("payload"),
    )


def video_scene_cuts(
    df: DataFrame,
    patch: int = 2,
    id_col: str = "id",
    payload_col: str = "payload",
    frame_stride: int = 64,
) -> DataFrame:
    """Scene segmentation over the toy video container: every frame
    gets its :func:`image_ahash` signature (the container explodes to
    standalone BMP frames, so the image path is reused verbatim via a
    composite frame id), and a new scene starts wherever the hamming
    distance to the previous frame's signature exceeds a quarter of
    the bits (``hamming * 4 > n_tiles``, integer compare) — the
    shot-boundary heuristic every keyframe sampler starts from.

    The composite frame id ``doc * frame_stride + frame`` is
    collision-free ONLY below ``frame_stride`` frames per container, so
    :func:`_frame_composite` raises loudly on overflow instead of
    silently bleeding into the next doc's id space; the hamming
    distance is a JVM char-wise compare over the bit strings under one
    per-doc window.

    Returns (id, n_frames, n_scenes)."""
    frames = explode_video_frames(df, id_col=id_col, payload_col=payload_col)
    good = frames.filter(F.col("frame_idx") >= 0)
    sigs = image_ahash(
        _frame_composite(good, frame_stride),
        patch=patch,
    ).select(
        F.expr(f"id div {frame_stride}").alias("vid"),
        F.pmod("id", F.lit(frame_stride)).alias("frame_idx"),
        "n_tiles",
        "ahash",
    )
    w = Window.partitionBy("vid").orderBy("frame_idx")
    prev = F.lag("ahash").over(w)
    hamming = F.size(
        F.filter(
            F.expr(
                "zip_with("
                " transform(sequence(1, char_length(ahash)),"
                "           i -> substring(ahash, i, 1)),"
                " transform(sequence(1, char_length(_prev)),"
                "           i -> substring(_prev, i, 1)),"
                " (a, b) -> a <> b)"
            ),
            lambda x: x,
        )
    )
    cuts = (
        sigs.withColumn("_prev", prev)
        .withColumn(
            "_new_scene",
            F.when(F.col("_prev").isNull(), F.lit(1))
            .when(hamming * 4 > F.col("n_tiles"), F.lit(1))
            .otherwise(F.lit(0)),
        )
        .groupBy(F.col("vid").alias("id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            F.sum("_new_scene").cast("bigint").alias("n_scenes"),
        )
    )
    # error containers: no good frames -> (0, 0) report rows
    all_ids = frames.select("id").distinct()
    return all_ids.join(cuts, "id", "left").select(
        "id",
        F.coalesce("n_frames", F.lit(0)).cast("bigint").alias("n_frames"),
        F.coalesce("n_scenes", F.lit(0)).cast("bigint").alias("n_scenes"),
    )


def video_keyframes(
    df: DataFrame,
    patch: int = 2,
    id_col: str = "id",
    payload_col: str = "payload",
    frame_stride: int = 64,
) -> DataFrame:
    """Keyframe selection: the first frame of every scene
    (:func:`video_scene_cuts` boundary rule — hamming to the previous
    frame's aHash exceeds a quarter of the bits, plus frame 0), with
    the frame PAYLOAD carried through so the selected BMPs are the
    stored artifact a multimodal training pipeline actually keeps
    (one representative image per shot instead of every frame).

    Returns (id, frame_idx, frame_payload) of the keyframes only."""
    frames = explode_video_frames(df, id_col=id_col, payload_col=payload_col)
    good = frames.filter(F.col("frame_idx") >= 0)
    sigs = image_ahash(
        _frame_composite(good, frame_stride),
        patch=patch,
    ).select(
        F.expr(f"id div {frame_stride}").alias("vid"),
        F.pmod("id", F.lit(frame_stride)).alias("frame_idx"),
        "n_tiles",
        "ahash",
    )
    w = Window.partitionBy("vid").orderBy("frame_idx")
    prev = F.lag("ahash").over(w)
    hamming = F.size(
        F.filter(
            F.expr(
                "zip_with("
                " transform(sequence(1, char_length(ahash)),"
                "           i -> substring(ahash, i, 1)),"
                " transform(sequence(1, char_length(_prev)),"
                "           i -> substring(_prev, i, 1)),"
                " (a, b) -> a <> b)"
            ),
            lambda x: x,
        )
    )
    keys = (
        sigs.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (hamming * 4 > F.col("n_tiles")))
        .select(F.col("vid").alias("id"), "frame_idx")
    )
    return good.join(keys, ["id", "frame_idx"]).select(
        "id", "frame_idx", "frame_payload"
    )


def image_ahash_near_pairs(
    df: DataFrame,
    max_hamming: int = 1,
    bands: int | None = None,
    patch: int = 2,
    grid: int = 8,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """Near-duplicate image pairs by aHash hamming distance — the
    banded (multi-index) join over :func:`image_ahash` signatures,
    exactly the simhash pigeonhole: split each bit string into
    ``bands`` contiguous slices; two equal-geometry signatures within
    hamming <= bands-1 must agree on at least one ENTIRE slice, so an
    equi-join on (n_tiles, band_idx, slice) is a sound-and-complete
    candidate generator and the exact hamming verify runs on
    candidates only, never on the cross product.  ``bands`` defaults
    to ``max_hamming + 1`` (the minimum with zero recall loss).

    Tiny signatures (few tiles) can make a slice empty, in which case
    every same-geometry image shares that band — blocking degrades
    toward per-geometry groups but exactness never does (the verify
    decides).  Returns (id_a, id_b, hamming) with id_a < id_b."""
    if bands is None:
        bands = max_hamming + 1
    if bands < max_hamming + 1:
        raise ValueError(
            f"bands={bands} cannot guarantee recall for hamming "
            f"<= {max_hamming} (pigeonhole needs >= {max_hamming + 1})"
        )
    sig = image_ahash(
        df, patch=patch, grid=grid, id_col=id_col, payload_col=payload_col
    ).filter(F.col("n_tiles") > 0)
    nb = sig.select(
        "id",
        "n_tiles",
        "ahash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("b"),
    ).withColumn(
        "slice",
        F.expr(
            f"substring(ahash, int(b * n_tiles / {bands}) + 1,"
            f" int((b + 1) * n_tiles / {bands})"
            f" - int(b * n_tiles / {bands}))"
        ),
    )
    left, right = nb.alias("l"), nb.alias("r")
    cand = (
        left.join(
            right,
            [
                F.col("l.n_tiles") == F.col("r.n_tiles"),
                F.col("l.b") == F.col("r.b"),
                F.col("l.slice") == F.col("r.slice"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.ahash").alias("ha"),
            F.col("r.ahash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.size(
        F.filter(
            F.expr(
                "zip_with("
                " transform(sequence(1, char_length(ha)),"
                "           i -> substring(ha, i, 1)),"
                " transform(sequence(1, char_length(hb)),"
                "           i -> substring(hb, i, 1)),"
                " (a, b) -> a <> b)"
            ),
            lambda x: x,
        )
    )
    return (
        cand.withColumn("hamming", hamming.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def synthesize_video_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL toy-container video payloads deterministically from row
    ids: document d holds ``d%5+2`` frames of ``(d%4+2) x (d%3+2)``
    24-bit BMPs where pixel k of frame f is ``(7d + 11f + 13k) mod
    256`` — closed-form, so a SQL oracle recomputes every per-frame
    tile statistic without parsing either container or BMP.
    Distributed through the same Arrow-batched mapInPandas as the
    image/audio synthesizers."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf["id"]:
                d = int(d)
                n, w, h = d % 5 + 2, d % 4 + 2, d % 3 + 2
                body = b""
                for f in range(n):
                    k = np.arange(w * h * 3, dtype=np.int64)
                    px = (
                        ((7 * d + 11 * f + 13 * k) % 256)
                        .astype(np.uint8)
                        .reshape(h, w, 3)
                    )
                    bmp = encode_bmp(px)
                    body += len(bmp).to_bytes(4, "little") + bmp
                out.append(
                    (d, "video", VIDEO_MAGIC + n.to_bytes(4, "little") + body)
                )
            yield pd.DataFrame(out, columns=["id", "modality", "payload"])

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("modality", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    return df.select(F.col(id_col).cast("bigint").alias("id")).mapInPandas(
        run, schema
    )


def synthesize_bmp_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build REAL image payloads deterministically from row ids: pixel k
    of document d is (7d + 13k) mod 256, encoded as an uncompressed
    24-bit BMP (encode_bmp), dimensions (d%6+2) x (d%4+2).  Runs as an
    Arrow-batched mapInPandas so payload construction is distributed
    like any media ingest; the closed-form pixel rule is what lets a
    SQL oracle recompute the decoded statistics without parsing BMP."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf["id"]:
                d = int(d)
                w, h = d % 6 + 2, d % 4 + 2
                k = np.arange(w * h * 3, dtype=np.int64)
                px = ((7 * d + 13 * k) % 256).astype(np.uint8).reshape(h, w, 3)
                out.append((d, "image", encode_bmp(px), w, h))
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
    return df.select(F.col(id_col).cast("bigint").alias("id")).mapInPandas(
        run, schema
    )


def encode_bmp(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit
    BMP — the writer half of decode_image_real, used to build real
    image payloads in tests and fixtures without imaging libraries."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = a.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = body.tobytes()
    header = (
        b"BM"
        + (54 + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + data


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels) -> bytes:
    """Minimal 8-bit RGB PNG encoder from stdlib zlib + numpy — the
    writer half of :func:`decode_png`.  Scanline filters CYCLE through
    all five types (None, Sub, Up, Average, Paeth) by row index, so an
    encode→decode roundtrip genuinely exercises every unfilter branch,
    not just the trivial filter-0 path."""
    import zlib

    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = a.shape
    raw = a.astype(np.int32)
    out = bytearray()
    prev = np.zeros(w * 3, dtype=np.int32)
    for r in range(h):
        cur = raw[r].reshape(-1)
        left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
        ul = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
        ft = r % 5
        if ft == 0:
            filt = cur
        elif ft == 1:
            filt = cur - left
        elif ft == 2:
            filt = cur - prev
        elif ft == 3:
            filt = cur - (left + prev) // 2
        else:
            pred = np.fromiter(
                (_paeth(int(left[i]), int(prev[i]), int(ul[i]))
                 for i in range(w * 3)),
                np.int32, w * 3,
            )
            filt = cur - pred
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + ctype
            + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # depth 8, RGB, deflate, adaptive, none
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Real PNG decoding without an imaging library: chunk walk, IHDR
    dimension parse, zlib inflate of the concatenated IDAT stream, and
    a full numpy scanline unfilter (all five RFC 2083 filter types —
    Sub/Average/Paeth carry intra-row dependencies, so those run as a
    per-pixel recurrence; fine for the thumbnails this path handles,
    and Pillow replaces it wholesale on real executors).  CRCs are
    verified per chunk.  Only 8-bit non-interlaced RGB is supported —
    anything else raises NotImplementedError into extract_features'
    per-row error isolation."""
    import zlib

    import numpy as np

    if payload is None or payload[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG signature")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        crc = payload[pos + 8 + ln : pos + 12 + ln]
        if len(data) < ln or len(crc) < 4:
            raise ValueError("truncated PNG chunk")
        if zlib.crc32(ctype + data) != int.from_bytes(crc, "big"):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            depth, color, comp, filt, ilace = data[8:13]
            if (depth, color, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    f"unsupported PNG variant (depth={depth}, color={color}, "
                    f"interlace={ilace})"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if not width or not height or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    stride = width * 3
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel payload length mismatch")
    rows = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(height):
        ft, filt = int(rows[r, 0]), rows[r, 1:].astype(np.int32)
        if ft == 0:
            cur = filt
        elif ft == 2:
            cur = (filt + prev) % 256
        elif ft in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = cur[i - 3] if i >= 3 else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + int(prev[i])) // 2
                else:
                    ul = int(prev[i - 3]) if i >= 3 else 0
                    pred = _paeth(left, int(prev[i]), ul)
                cur[i] = (int(filt[i]) + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[r] = cur
        prev = cur
    return {
        "n_bytes": len(payload),
        "mean_byte": float(out.mean()),
        "width": width,
        "height": height,
    }


def synthesize_png_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL PNG payloads deterministically from row ids: pixel k of
    document d is (11d + 13k) mod 256, encoded through encode_png
    (zlib-deflated scanlines, per-row filter cycle), dimensions
    (d%5+2) x (d%3+2).  Same Arrow-batched mapInPandas distribution as
    the BMP synthesizer; the closed-form pixel rule lets a SQL oracle
    recompute the decoded statistics without inflating PNGs."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf["id"]:
                d = int(d)
                w, h = d % 5 + 2, d % 3 + 2
                k = np.arange(w * h * 3, dtype=np.int64)
                px = ((11 * d + 13 * k) % 256).astype(np.uint8).reshape(h, w, 3)
                out.append((d, "image", encode_png(px), w, h))
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
    return df.select(F.col(id_col).cast("bigint").alias("id")).mapInPandas(
        run, schema
    )


#: Output schema of the audio feature extractor.
AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("mean_abs", DoubleType()),
        StructField("feature_ok", StringType()),
    ]
)


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE writer for 16-bit PCM (mono or multi-channel
    from a (n, channels) array) — the writer half of
    :func:`decode_wav`, built from int.to_bytes + numpy alone."""
    import numpy as np

    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.reshape(-1).tobytes()  # interleaved frames, little-endian
    byte_rate = sample_rate * ch * 2
    fmt = (
        (1).to_bytes(2, "little")          # PCM
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + byte_rate.to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little")   # block align
        + (16).to_bytes(2, "little")       # bits per sample
    )
    return (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )


def decode_wav(payload: bytes) -> dict:
    """Real audio decoding without an audio library: RIFF chunk walk,
    fmt parse (16-bit integer PCM only — anything else raises
    NotImplementedError into the extractor's per-row isolation), and a
    numpy view over the data chunk.  Returns byte size, the parsed
    sample_rate / n_samples / n_channels, and the mean absolute
    amplitude (the level statistic a curation filter thresholds on)."""
    import numpy as np

    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        ln = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # RIFF chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    a, rate, ch = _wav_pcm(fmt, data)
    return {
        "n_bytes": len(payload),
        "sample_rate": rate,
        "n_samples": a.shape[0],
        "n_channels": ch,
        "mean_abs": float(np.abs(a.astype(np.int32)).mean()),
    }


def _wav_pcm(fmt: bytes, data: bytes):
    """(samples (n, ch) int16 view, sample_rate, n_channels) of parsed
    fmt/data chunks — shared by decode_wav's statistics and
    frame_audio's windowing.  16-bit integer PCM only."""
    import numpy as np

    codec = int.from_bytes(fmt[0:2], "little")
    ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if codec != 1 or bits != 16 or ch < 1:
        raise NotImplementedError(
            f"only 16-bit integer PCM decodes here (codec={codec}, bits={bits})"
        )
    if len(data) % (ch * 2):
        raise ValueError("WAV data length is not a whole number of frames")
    return np.frombuffer(data, dtype="<i2").reshape(-1, ch), rate, ch


def frame_audio(
    df: DataFrame,
    frame: int = 8,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-level audio features — the audio sibling of
    :func:`patchify_images`: each 16-bit PCM WAV payload splits into
    non-overlapping ``frame``-sample windows (FULL frames only, the
    trailing remainder dropped) and every window reports its mean
    absolute amplitude and its peak — the per-frame level features a
    speech-data curation pass thresholds on (silence trimming, clip
    detection) before any model-based VAD.

    Frame sums are exact integers (≤ frame·ch·32768 « 2⁵³), so the
    means are bit-identical in any summation order and the closed-form
    sample fixture replays in SQL.  Undecodable payloads emit ONE
    (frame_idx=-1, NULLs) row — the per-row isolation contract.

    ``n_channels`` rides along so consumers that need the exact frame
    SUM back (audio_fingerprint's integer-threshold trick) can multiply
    by ``frame * n_channels`` — the mean divides by frame·ch, so
    ``mean * frame`` alone recovers only sum/ch (half-integers on
    stereo, which would flip fingerprint bits across engines).

    Returns (id, frame_idx, frame_mean_abs, frame_peak, n_channels)."""
    from collections.abc import Iterator as _Iter

    def run(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                rid = int(getattr(row, id_col))
                payload = getattr(row, payload_col)
                try:
                    if (
                        payload is None
                        or len(payload) < 44
                        or payload[:4] != b"RIFF"
                        or payload[8:12] != b"WAVE"
                    ):
                        raise NotImplementedError("not a RIFF/WAVE payload")
                    pos, fmt, data = 12, None, None
                    while pos + 8 <= len(payload):
                        cid = payload[pos : pos + 4]
                        ln = int.from_bytes(payload[pos + 4 : pos + 8], "little")
                        body = payload[pos + 8 : pos + 8 + ln]
                        if len(body) < ln:
                            raise ValueError(f"truncated WAV chunk {cid!r}")
                        if cid == b"fmt ":
                            fmt = body
                        elif cid == b"data":
                            data = body
                        pos += 8 + ln + (ln & 1)
                    if fmt is None or data is None:
                        raise ValueError("WAV missing fmt or data chunk")
                    a, _rate, ch = _wav_pcm(fmt, data)
                except Exception:  # noqa: BLE001 — per-row isolation
                    out.append((rid, -1, None, None, None))
                    continue
                aa = np.abs(a.astype(np.int64))
                for fi in range(a.shape[0] // frame):
                    win = aa[fi * frame : (fi + 1) * frame]
                    out.append(
                        (
                            rid,
                            fi,
                            round(int(win.sum()) / (frame * ch), 6),
                            int(win.max()),
                            ch,
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "id",
                    "frame_idx",
                    "frame_mean_abs",
                    "frame_peak",
                    "n_channels",
                ],
            )

    return df.select(
        F.col(id_col).cast("bigint").alias(id_col), F.col(payload_col)
    ).mapInPandas(
        run,
        "id bigint, frame_idx bigint, frame_mean_abs double, "
        "frame_peak bigint, n_channels bigint",
    )


def extract_audio_features(
    mm: DataFrame,
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """Arrow-batched audio feature extraction — the audio twin of
    :func:`extract_features`, with the same per-row error isolation
    (corrupt blobs become 'error:' rows, never task failures)."""
    dec = decoder or decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    f = dec(row.payload)
                    out.append(
                        (
                            row.id, row.modality, f["n_bytes"],
                            f["sample_rate"], f["n_samples"],
                            f["n_channels"], round(f["mean_abs"], 6), "ok",
                        )
                    )
                except Exception as e:  # noqa: BLE001 — per-row isolation
                    out.append(
                        (row.id, row.modality, None, None, None, None, None,
                         f"error:{e}")
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields]
            )

    return mm.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def synthesize_wav_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL audio payloads deterministically from row ids: sample k of
    document d is ((5d + 7k) mod 4096) - 2048 (16-bit PCM mono),
    n = d%50+20 samples at rate 8000 + (d%3)*4000 Hz — closed-form, so
    a SQL oracle recomputes every decoded statistic including the exact
    byte size (44 + 2n: PCM is uncompressed).  Distributed through the
    same Arrow-batched mapInPandas as the image synthesizers."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf["id"]:
                d = int(d)
                n = d % 50 + 20
                rate = 8000 + (d % 3) * 4000
                k = np.arange(n, dtype=np.int64)
                s = (((5 * d + 7 * k) % 4096) - 2048).astype(np.int16)
                out.append((d, "audio", encode_wav(s, rate)))
            yield pd.DataFrame(out, columns=["id", "modality", "payload"])

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("modality", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    return df.select(F.col(id_col).cast("bigint").alias("id")).mapInPandas(
        run, schema
    )
