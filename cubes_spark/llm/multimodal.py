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

__all__ = ["binary_metadata", "decode_features", "FEATURE_SCHEMA"]


def binary_metadata(df: DataFrame, binary_col: str,
                    id_col: str = "doc_id") -> DataFrame:
    """Cheap metadata over an opaque binary column — JVM-side only:
    byte length, md5 digest and a best-effort magic-byte sniff.  This is
    the exact-dedup / partition-statistics entry point for media blobs.
    """
    payload = F.col(binary_col)
    magic = F.hex(F.substring(payload, 1, 4))
    kind = (
        F.when(magic.startswith("FFD8"), "jpeg")
        .when(magic == "89504E47", "png")
        .when(magic == "52494646", "riff")  # wav/avi containers
        .when(magic == "1A45DFA3", "matroska")
        .otherwise("unknown")
    )
    return df.select(
        F.col(id_col),
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("content_hash"),
        kind.alias("format_guess"),
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
