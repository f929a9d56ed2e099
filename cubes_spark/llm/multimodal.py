"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with
typed metadata columns alongside.  The *decode* step (pixel/sample
access) is stubbed — the decode libraries are not available in this
environment — but everything Spark-side is real and tested: the
schema contract, Arrow-batched ``mapInPandas`` plumbing, batch shaping
and partition behavior.  Swapping the stub for a real decoder (PIL,
torchaudio, pyav) changes one function body, not the pipeline.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["binary_metadata", "image_dimensions", "audio_metadata",
           "decode_features", "FEATURE_SCHEMA"]


# -- pure-JVM header parsing ------------------------------------------------
#
# Format sniffing and container-header fields (image dimensions, audio
# sample rate) never need a decoder library: they are fixed-offset (or
# boundedly-scanned) byte fields, expressible with substring/conv —
# whole-stage-codegen'd, zero Python in the row path.  Real pixel and
# sample DECODE stays behind the Arrow ``mapInPandas`` stub below.


def _be_uint(col, pos, nbytes):
    """Big-endian unsigned int from `nbytes` at 1-indexed `pos` (works
    on binary; NULL when the slice is short/absent)."""
    sliced = F.substring(col, pos, nbytes)
    return F.when(
        F.length(sliced) == nbytes,
        F.conv(F.hex(sliced), 16, 10).cast("long"),
    )


def _le_uint(col, pos, nbytes):
    """Little-endian unsigned int: reassemble per-byte (no JVM
    byte-swap intrinsic exposed to SQL)."""
    total = F.lit(0).cast("long")
    for i in range(nbytes):
        byte = _be_uint(col, pos + i if isinstance(pos, int) else
                        pos + F.lit(i), 1)
        total = total + byte * F.lit(256 ** i).cast("long")
    return total


def sniff_format(payload) -> "F.Column":
    """Magic-byte format sniff as a Column expression: png/jpeg/gif/
    bmp/wav/avi/matroska/unknown."""
    magic = F.hex(F.substring(payload, 1, 4))
    riff_kind = F.hex(F.substring(payload, 9, 4))
    return (
        F.when(magic.startswith("FFD8"), "jpeg")
        .when(magic == "89504E47", "png")
        .when(magic.startswith("474946"), "gif")
        .when(magic.startswith("424D"), "bmp")
        .when((magic == "52494646") & (riff_kind == "57415645"), "wav")
        .when((magic == "52494646") & (riff_kind == "41564920"), "avi")
        .when(magic == "1A45DFA3", "matroska")
        .otherwise("unknown")
    )


def binary_metadata(df: DataFrame, binary_col: str,
                    id_col: str = "doc_id") -> DataFrame:
    """Cheap metadata over an opaque binary column — JVM-side only:
    byte length, md5 digest and a magic-byte sniff.  This is the
    exact-dedup / partition-statistics entry point for media blobs.
    """
    payload = F.col(binary_col)
    return df.select(
        F.col(id_col),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_hash"),
        sniff_format(payload).alias("format_guess"),
    )


def image_dimensions(df: DataFrame, binary_col: str,
                     id_col: str = "doc_id",
                     max_jpeg_segments: int = 16) -> DataFrame:
    """(id, format, width, height) from container headers, pure JVM.

    * PNG — IHDR is mandatory-first: width/height BE u32 at bytes
      17/21.
    * GIF — logical screen LE u16 at bytes 7/9.
    * BMP — BITMAPINFOHEADER LE u32 at bytes 19/23.
    * JPEG — bounded marker-segment walk to the first SOF0/1/2 frame
      header (height BE u16 at seg+5, width at seg+7).  The walk is a
      single ``aggregate`` fold over ``max_jpeg_segments`` steps —
      O(1) plan size, no per-step expression blow-up, no Python.

    Unknown formats / truncated headers yield NULL dimensions, never
    errors — at 100 TB some blobs WILL be garbage; a corrupt row must
    not kill the scan.
    """
    payload = F.col(binary_col)
    fmt = sniff_format(payload)

    png_w, png_h = _be_uint(payload, 17, 4), _be_uint(payload, 21, 4)
    gif_w, gif_h = _le_uint(payload, 7, 2), _le_uint(payload, 9, 2)
    bmp_w, bmp_h = _le_uint(payload, 19, 4), _le_uint(payload, 23, 4)

    # JPEG: fold (pos, w, h) over a fixed step count.  Each step reads
    # the marker at `pos`; SOF0/C0, SOF1/C1, SOF2/C2 capture the frame
    # size and pin pos (further steps no-op); other markers advance by
    # 2 + payload length.  pos = -1 marks walk failure (non-FF byte).
    def _jpeg_step(acc, _i):
        pos = acc.getField("pos")
        w, h = acc.getField("w"), acc.getField("h")
        done = w.isNotNull() | (pos < 0)
        is_ff = _be_uint(payload, pos, 1) == 0xFF
        marker = _be_uint(payload, pos + 1, 1)
        seglen = _be_uint(payload, pos + 2, 2)
        is_sof = marker.isin(0xC0, 0xC1, 0xC2)
        valid = is_ff & marker.isNotNull() & seglen.isNotNull()
        new_w = F.when(done, w).when(
            valid & is_sof, _be_uint(payload, pos + 7, 2))
        new_h = F.when(done, h).when(
            valid & is_sof, _be_uint(payload, pos + 5, 2))
        new_pos = (
            F.when(done | (valid & is_sof), pos)
            .when(valid, pos + 2 + seglen)
            .otherwise(F.lit(-1))
        )
        return F.struct(new_pos.cast("long").alias("pos"),
                        new_w.cast("long").alias("w"),
                        new_h.cast("long").alias("h"))

    jpeg_walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_jpeg_segments)),
        F.struct(F.lit(3).cast("long").alias("pos"),
                 F.lit(None).cast("long").alias("w"),
                 F.lit(None).cast("long").alias("h")),
        _jpeg_step,
    )

    width = (
        F.when(fmt == "png", png_w)
        .when(fmt == "gif", gif_w)
        .when(fmt == "bmp", bmp_w)
        .when(fmt == "jpeg", jpeg_walk.getField("w"))
    )
    height = (
        F.when(fmt == "png", png_h)
        .when(fmt == "gif", gif_h)
        .when(fmt == "bmp", bmp_h)
        .when(fmt == "jpeg", jpeg_walk.getField("h"))
    )
    return df.select(
        F.col(id_col),
        fmt.alias("format"),
        width.cast("long").alias("width"),
        height.cast("long").alias("height"),
        F.length(payload).alias("n_bytes"),
    )


def audio_metadata(df: DataFrame, binary_col: str,
                   id_col: str = "doc_id") -> DataFrame:
    """(id, format, n_channels, sample_rate, bits_per_sample) for WAV
    (RIFF) headers with the canonical fmt chunk at byte 13 — fixed
    little-endian offsets, pure JVM.  Non-WAV rows yield NULLs."""
    payload = F.col(binary_col)
    fmt = sniff_format(payload)
    is_wav = (fmt == "wav") & \
        (F.hex(F.substring(payload, 13, 4)) == "666D7420")
    return df.select(
        F.col(id_col),
        fmt.alias("format"),
        F.when(is_wav, _le_uint(payload, 23, 2)).alias("n_channels"),
        F.when(is_wav, _le_uint(payload, 25, 4)).alias("sample_rate"),
        F.when(is_wav, _le_uint(payload, 35, 2)).alias("bits_per_sample"),
        F.length(payload).alias("n_bytes"),
    )


#: Output schema of :func:`decode_features` — fixed, so downstream
#: plans (joins, ANN over the feature vector) bind before any decode
#: runs.
FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("format_guess", StringType()),
    StructField("n_bytes", LongType()),
    StructField("features", ArrayType(DoubleType())),
])


def _decode_stub(payload: bytes, dim: int) -> list:
    """STUB decode: a real implementation would decode pixels/samples
    and pool them.  Raises by default; with ``fake=True`` callers get a
    deterministic md5-seeded pseudo-feature so the full pipeline is
    testable end-to-end.
    """
    raise NotImplementedError(
        "media decode requires an image/audio library not present in "
        "this environment; use decode_features(..., fake=True) for the "
        "deterministic test double"
    )


def _fake_features(payload: bytes, dim: int) -> list:
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(payload + i.to_bytes(4, "big")).digest()
        out.append(int.from_bytes(h[:8], "big") / float(1 << 63) - 1.0)
    return out


def decode_features(df: DataFrame, binary_col: str,
                    id_col: str = "doc_id", dim: int = 8,
                    fake: bool = False,
                    batch_size_hint: Optional[int] = None) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    ``mapInPandas`` streams Arrow record batches through Python — the
    decode cost is amortized per batch, the output schema is fixed
    up-front, and the operation is a narrow map (no shuffle), so it
    scales linearly with partitions.  ``fake=True`` uses the
    deterministic md5-based test double instead of a real decoder.
    """
    decoder = _fake_features if fake else _decode_stub
    sniffed = binary_metadata(df, binary_col, id_col).join(
        df.select(F.col(id_col), F.col(binary_col)), id_col
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "format_guess": pdf["format_guess"],
                "n_bytes": pdf["n_bytes"],
                "features": [
                    decoder(bytes(p), dim) for p in pdf[binary_col]
                ],
            })

    return sniffed.mapInPandas(extract, FEATURE_SCHEMA)
