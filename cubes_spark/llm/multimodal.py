"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with
typed metadata columns alongside.  PNG, GIF, BMP, baseline JPEG and
PCM WAV decode are REAL — stdlib-only decoders (``zlib`` inflate +
full scanline unfiltering in :func:`decode_png`; complete
variable-width LZW in :func:`decode_gif`; BI_RGB rows in
:func:`decode_bmp`; Huffman entropy decode + dequant + IDCT with
subsampling and restart intervals in :func:`decode_jpeg`, plus the
matching :func:`encode_jpeg` re-encode path; RIFF chunk walk +
s16le/u8 samples in :func:`decode_wav`) feeding Arrow-batched
``mapInPandas`` operators (:func:`png_pixel_stats`,
:func:`gif_pixel_stats`, :func:`bmp_pixel_stats`,
:func:`jpeg_pixel_stats`, :func:`wav_sample_stats`,
:func:`decode_features`).  Progressive (SOF2) JPEG decodes through
the T.81 Annex-G coefficient-accumulation path; BI_RLE8 BMPs and
IMA-ADPCM / G.711 WAVs decode through their own state machines.
Video gets real container support: AVI demux + uncompressed-DIB
frame decode with every-k frame sampling (:func:`decode_avi`,
:func:`avi_frame_stats`).  Entropy-coded inter-frame video and
MPEG-family audio need external codec libraries not present in this
environment and stay behind a clearly-marked error; swapping a codec
in changes a function body, not the pipeline — the schema contract,
batch shaping and partition behavior are shared and tested.
"""

from __future__ import annotations

import math
import struct
import sys
import zlib
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["binary_metadata", "image_dimensions", "audio_metadata",
           "decode_features", "decode_png", "png_pixel_stats",
           "decode_wav", "wav_sample_stats",
           "decode_gif", "gif_pixel_stats",
           "decode_bmp", "bmp_pixel_stats",
           "decode_jpeg", "encode_jpeg", "encode_jpeg_progressive",
           "jpeg_pixel_stats",
           "decode_avi", "avi_frame_stats",
           "matroska_tracks", "matroska_metadata",
           "ahash_bytes", "image_ahash", "image_duplicates",
           "audio_fingerprint_bytes", "audio_duplicates",
           "resize_samples", "resize_image", "image_resize_stats",
           "resample_samples", "resample_audio", "audio_resample_stats",
           "video_frame_pipeline",
           "FEATURE_SCHEMA", "PIXEL_STATS_SCHEMA",
           "SAMPLE_STATS_SCHEMA", "INDEX_STATS_SCHEMA",
           "FRAME_STATS_SCHEMA", "TRACK_META_SCHEMA",
           "RESIZED_IMAGE_SCHEMA", "RESIZE_STATS_SCHEMA"]


# -- pure-JVM header parsing ------------------------------------------------
#
# Format sniffing and container-header fields (image dimensions, audio
# sample rate) never need a decoder library: they are fixed-offset (or
# boundedly-scanned) byte fields, expressible with substring/conv —
# whole-stage-codegen'd, zero Python in the row path.  Real pixel and
# sample DECODE lives in the Arrow ``mapInPandas`` operators below.


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


# -- real PNG decode (stdlib only) ------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per PNG color type (0 grey, 2 RGB, 4 grey+alpha, 6 RGBA)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes):
    """Decode an 8-bit non-interlaced PNG with the stdlib only.

    Chunk walk → IDAT concat → ``zlib`` inflate → full scanline
    unfiltering (None/Sub/Up/Average/Paeth, the complete PNG filter
    set).  Returns ``(width, height, channels, samples)`` with
    ``samples`` the row-major unfiltered bytes (``height × width ×
    channels``).  Chunk CRCs are deliberately NOT verified — at scale
    some blobs are slightly damaged, and a bad CRC on an otherwise
    decodable image must not kill the batch; truly corrupt streams
    still fail in inflate or the size checks.  Raises ``ValueError``
    on non-PNG / unsupported (interlaced, 16-bit, paletted) input.
    """
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG stream")
    pos, idat = 8, b""
    width = height = bitdepth = colortype = interlace = None
    while pos + 8 <= len(payload):
        length = int.from_bytes(payload[pos:pos + 4], "big")
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            if length < 13:
                raise ValueError("short IHDR")
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            bitdepth, colortype = data[8], data[9]
            interlace = data[12]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + CRC
    if width is None:
        raise ValueError("missing IHDR")
    if bitdepth != 8 or colortype not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bitdepth={bitdepth}, colortype={colortype},"
            f" interlace={interlace})")
    channels = _PNG_CHANNELS[colortype]
    raw = zlib.decompress(idat)
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data size mismatch")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    p = 0
    for y in range(height):
        ftype = raw[p]
        line = bytearray(raw[p + 1:p + 1 + stride])
        p += 1 + stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, npixels: int) -> bytes:
    """GIF-variant LZW: LSB-first variable-width codes (min+1 … 12
    bits), clear/EOI codes, KwKwK case, deferred-clear handling (table
    capped at 4096, codes keep flowing at 12 bits)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)]
    table = base + [b"", b""]
    width = min_code_size + 1
    buf = nbits = 0
    out = bytearray()
    prev = None
    for byte in data:
        buf |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = buf & ((1 << width) - 1)
            buf >>= width
            nbits -= width
            if code == clear:
                table = base + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out[:npixels])
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            else:               # KwKwK: code == len(table)
                entry = prev + prev[:1]
                if len(table) < 4096:
                    table.append(entry)
            out += entry
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
            if len(out) >= npixels:
                return bytes(out[:npixels])
    return bytes(out[:npixels])


def _deinterlace(indices: bytes, width: int, height: int) -> bytes:
    """Reorder GIF 4-pass interlaced rows into natural order."""
    rows = [indices[y * width:(y + 1) * width] for y in range(height)]
    order = (list(range(0, height, 8)) + list(range(4, height, 8))
             + list(range(2, height, 4)) + list(range(1, height, 2)))
    out = [b""] * height
    for src, dst in zip(rows, order):
        out[dst] = src
    return b"".join(out)


def decode_gif(payload: bytes):
    """Decode the first frame of a GIF87a/89a with the stdlib only.

    Logical screen + color tables → extension-block skip → image
    descriptor → full LZW decompression (:func:`_lzw_decode`) →
    de-interlace when flagged.  Returns ``(width, height, indices,
    palette)`` where ``indices`` is the row-major palette-index bytes
    of the first frame and ``palette`` the active color table as a
    list of (r, g, b).  Raises ``ValueError`` on non-GIF/truncated
    input."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    pos = 6
    pos += 4  # logical screen w/h (frame size comes from the descriptor)
    if pos + 3 > len(payload):
        raise ValueError("truncated GIF header")
    packed = payload[pos]
    pos += 3  # packed + background + aspect
    palette = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw = payload[pos:pos + 3 * n]
        if len(raw) < 3 * n:
            raise ValueError("truncated GIF color table")
        palette = [(raw[i], raw[i + 1], raw[i + 2])
                   for i in range(0, 3 * n, 3)]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:           # extension: label + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:         # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            w = int.from_bytes(payload[pos + 4:pos + 6], "little")
            h = int.from_bytes(payload[pos + 6:pos + 8], "little")
            ipacked = payload[pos + 8]
            pos += 9
            if ipacked & 0x80:      # local color table wins
                n = 2 << (ipacked & 0x07)
                raw = payload[pos:pos + 3 * n]
                palette = [(raw[i], raw[i + 1], raw[i + 2])
                           for i in range(0, 3 * n, 3)]
                pos += 3 * n
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            if not (2 <= min_code_size <= 11):
                raise ValueError(f"bad LZW min code size {min_code_size}")
            indices = _lzw_decode(bytes(data), min_code_size, w * h)
            if len(indices) != w * h:
                raise ValueError("truncated GIF image data")
            if ipacked & 0x40:
                indices = _deinterlace(indices, w, h)
            return w, h, indices, palette
        elif block == 0x3B:         # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("no image frame in GIF")


#: Output schema of :func:`gif_pixel_stats`.
INDEX_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_pixels", LongType()),
    StructField("index_sum", LongType()),
    StructField("rgb_sum", LongType()),
])


def gif_pixel_stats(df: DataFrame, binary_col: str,
                    id_col: str = "doc_id") -> DataFrame:
    """Real pixel statistics over a GIF binary column — full LZW
    decompression per row: dimensions, palette-index sum and the
    palette-resolved r+g+b sum.  Arrow-batched narrow map; NULL stats
    on undecodable rows."""
    slim = df.select(F.col(id_col), F.col(binary_col))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "n_pixels": [], "index_sum": [], "rgb_sum": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    w, h, idx, pal = decode_gif(bytes(p))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_pixels"].append(len(idx))
                    out["index_sum"].append(sum(idx))
                    out["rgb_sum"].append(
                        sum(sum(pal[i]) for i in idx) if pal else None)
                except (ValueError, IndexError):
                    for k in ("width", "height", "n_pixels",
                              "index_sum", "rgb_sum"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(stats, INDEX_STATS_SCHEMA)


# -- baseline JPEG decode (stdlib only) -------------------------------------

#: JPEG zigzag order: index in the 64-coefficient stream → block pos.
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_JPEG_DCT_M = None


def _jpeg_dct_matrix():
    """Orthonormal 8-point DCT-II matrix M (``M @ M.T == I``):
    forward 2-D DCT of a block B is ``M @ B @ M.T``, inverse is
    ``M.T @ C @ M`` — one cached 8×8 float array instead of 8192
    ``math.cos`` calls PER BLOCK (the round-9 bench's single biggest
    constant: doc_jpeg_roundtrip was 39%% of total wall)."""
    global _JPEG_DCT_M
    if _JPEG_DCT_M is None:
        import numpy as np

        u = np.arange(8, dtype=np.float64).reshape(8, 1)
        x = np.arange(8, dtype=np.float64).reshape(1, 8)
        m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
        m[0, :] /= math.sqrt(2)
        _JPEG_DCT_M = m
    return _JPEG_DCT_M


def _jpeg_idct(block):
    """8×8 type-III DCT (matrix product) → spatial samples."""
    import numpy as np

    m = _jpeg_dct_matrix()
    b = np.asarray(block, dtype=np.float64).reshape(8, 8)
    return (m.T @ b @ m).reshape(64).tolist()


def _jpeg_idct_batch(coefs):
    """(n, 64) natural-order dequantized coefficients → (n, 8, 8)
    spatial samples in ONE broadcast matrix product — the batched
    form every decode path feeds after entropy decode."""
    m = _jpeg_dct_matrix()
    b = coefs.reshape(-1, 8, 8)
    return m.T @ b @ m


def _jpeg_huff_table(bits, values):
    """Canonical Huffman: (length, code) → symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with FF00
    unstuffing; restart markers terminate the current segment."""

    def __init__(self, data, pos):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def _next_byte(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG scan")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            raise ValueError("marker inside entropy data")
        self.pos += 1
        return b

    def bit(self):
        if self.n == 0:
            self.buf = self._next_byte()
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k):
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self):
        """Skip padding bits and an expected RSTn marker."""
        self.n = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF \
                and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("missing restart marker")

    def decode_huffman(self, table):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("bad Huffman code")


def _jpeg_extend(v, t):
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def _jpeg_refine_nonzero(reader, coef, k, p1):
    """One AC refinement correction bit for an already-nonzero
    coefficient (spec G.1.2.3): append the bit to the magnitude if it
    is not there yet."""
    if reader.bit():
        if (coef[k] & p1) == 0:
            coef[k] += p1 if coef[k] > 0 else -p1


def _jpeg_progressive_scan(payload, pos, scan, comps, frame_geom,
                           huff_dc, huff_ac, restart_interval):
    """Decode one progressive scan into the per-block coefficient
    arrays (zigzag order, successive-approximation-scaled integers).

    Implements all four scan kinds of ITU-T T.81 Annex G: DC first
    (interleaved MCU order, predictor + point transform), DC refine
    (one bit per block), AC first (single component, EOB runs) and AC
    refine (correction bits, EOB runs).  Returns the stream position
    of the next marker."""
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    scomps = scan["comps"]
    mcux, mcuy, hmax, vmax = frame_geom
    reader = _JpegBitReader(payload, pos)
    p1 = 1 << al

    def maybe_restart(n, state):
        if restart_interval and n and n % restart_interval == 0:
            reader.align_to_marker()
            state["eobrun"] = 0
            for c in scomps:
                c["dc"] = 0

    state = {"eobrun": 0}
    if ss == 0:                                  # DC scan
        for c in scomps:
            c["dc"] = 0
        if len(scomps) > 1:
            # interleaved MCU order (the normal DC-scan shape)
            n = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart(n, state)
                    n += 1
                    for c in scomps:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                bi = ((my * c["v"] + by) * c["bw"]
                                      + mx * c["h"] + bx)
                                coef = c["coef"][bi]
                                if ah == 0:
                                    t = reader.decode_huffman(
                                        huff_dc[c["td"]])
                                    diff = _jpeg_extend(
                                        reader.bits(t), t) if t else 0
                                    c["dc"] += diff
                                    coef[0] = c["dc"] * p1
                                elif reader.bit():
                                    coef[0] |= p1
        else:
            # single-component DC scan: the component's own block
            # raster (non-interleaved MCU = one block)
            c = scomps[0]
            n = 0
            for by in range(c["nbh"]):
                for bx in range(c["nbw"]):
                    maybe_restart(n, state)
                    n += 1
                    coef = c["coef"][by * c["bw"] + bx]
                    if ah == 0:
                        t = reader.decode_huffman(huff_dc[c["td"]])
                        diff = _jpeg_extend(reader.bits(t), t) \
                            if t else 0
                        c["dc"] += diff
                        coef[0] = c["dc"] * p1
                    elif reader.bit():
                        coef[0] |= p1
    else:                                        # AC scan: one component
        if len(scomps) != 1:
            raise ValueError("interleaved progressive AC scan")
        c = scomps[0]
        table = huff_ac[c["ta"]]
        n = 0
        for by in range(c["nbh"]):
            for bx in range(c["nbw"]):
                maybe_restart(n, state)
                n += 1
                coef = c["coef"][by * c["bw"] + bx]
                if ah == 0:                      # AC first
                    if state["eobrun"] > 0:
                        state["eobrun"] -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = reader.decode_huffman(table)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r != 15:
                                state["eobrun"] = (1 << r) - 1
                                if r:
                                    state["eobrun"] += reader.bits(r)
                                break
                            k += 16
                        else:
                            k += r
                            if k > se:
                                raise ValueError("AC index overflow")
                            coef[k] = _jpeg_extend(
                                reader.bits(s), s) * p1
                            k += 1
                else:                            # AC refine
                    k = ss
                    if state["eobrun"] == 0:
                        while k <= se:
                            rs = reader.decode_huffman(table)
                            r, s = rs >> 4, rs & 0x0F
                            val = 0
                            if s == 0:
                                if r != 15:
                                    state["eobrun"] = 1 << r
                                    if r:
                                        state["eobrun"] += \
                                            reader.bits(r)
                                    break
                            else:
                                val = p1 if reader.bit() else -p1
                            while k <= se:
                                if coef[k] != 0:
                                    _jpeg_refine_nonzero(
                                        reader, coef, k, p1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val and k <= se:
                                coef[k] = val
                            k += 1
                    if state["eobrun"] > 0:
                        while k <= se:
                            if coef[k] != 0:
                                _jpeg_refine_nonzero(reader, coef, k, p1)
                            k += 1
                        state["eobrun"] -= 1
    # skip padding bits, then find the next marker
    pos = reader.pos
    while pos + 1 < len(payload):
        if payload[pos] == 0xFF and payload[pos + 1] != 0x00:
            if 0xD0 <= payload[pos + 1] <= 0xD7:
                pos += 2                         # stray restart marker
                continue
            return pos
        pos += 1
    raise ValueError("unterminated progressive scan")


def decode_jpeg(payload: bytes):
    """Decode a BASELINE (SOF0/SOF1) or PROGRESSIVE (SOF2) JPEG with
    the stdlib only: full Huffman entropy decode, dequantization,
    inverse zigzag, 8×8 float IDCT, restart-interval handling and
    subsampling factors up to 2×2 (4:4:4, 4:2:2, 4:2:0), grayscale or
    3-component YCbCr.  Progressive streams accumulate coefficients
    across spectral-selection / successive-approximation scans
    (T.81 Annex G) and reconstruct at EOI.

    Returns ``(width, height, n_components, planes)`` where ``planes``
    is one ``bytes`` of ``width × height`` samples per component,
    upsampled to full resolution by replication, in the order they
    appear in the frame header (Y, Cb, Cr) — raw component values, no
    color transform (component semantics belong to the caller).
    Raises ``ValueError`` on arithmetic-coded/hierarchical/12-bit
    streams.
    """
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qtables = {}
    huff_dc, huff_ac = {}, {}
    frame = None
    progressive = False
    prog_ready = False
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        seglen = int.from_bytes(payload[pos + 2:pos + 4], "big")
        seg = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:                      # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = list(seg[i + 1:i + 65])
                i += 65
        elif marker == 0xC4:                    # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nval = sum(bits)
                values = list(seg[i + 17:i + 17 + nval])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _jpeg_huff_table(bits, values)
                i += 17 + nval
        elif marker in (0xC0, 0xC1, 0xC2):      # SOF0/1 baseline, SOF2
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            progressive = marker == 0xC2
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (width, height, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "lossless/arithmetic/hierarchical JPEG unsupported")
        elif marker == 0xDD:                    # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA and progressive:    # progressive scan
            if frame is None:
                raise ValueError("SOS before SOF")
            width, height, comps = frame
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            if not prog_ready:
                for c in comps:
                    c["bw"] = mcux * c["h"]
                    c["bh"] = mcuy * c["v"]
                    cw = (width * c["h"] + hmax - 1) // hmax
                    chh = (height * c["v"] + vmax - 1) // vmax
                    c["nbw"] = (cw + 7) // 8
                    c["nbh"] = (chh + 7) // 8
                    c["coef"] = [[0] * 64
                                 for _ in range(c["bw"] * c["bh"])]
                prog_ready = True
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                comp["td"], comp["ta"] = tdta >> 4, tdta & 0x0F
                scomps.append(comp)
            scan = {"ss": seg[1 + 2 * ns], "se": seg[2 + 2 * ns],
                    "ah": seg[3 + 2 * ns] >> 4,
                    "al": seg[3 + 2 * ns] & 0x0F,
                    "comps": scomps}
            pos = _jpeg_progressive_scan(
                payload, pos + 2 + seglen, scan, comps,
                (mcux, mcuy, hmax, vmax), huff_dc, huff_ac,
                restart_interval)
            continue
        elif marker == 0xDA:                    # SOS: decode the scan
            if frame is None:
                raise ValueError("SOS before SOF")
            width, height, comps = frame
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cs] = (tdta >> 4, tdta & 0x0F)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c["bw"] = mcux * c["h"]         # blocks across
                c["bh"] = mcuy * c["v"]
                c["rows"] = []                  # dequantized naturals
                c["idx"] = []                   # row-major block index
                c["dc"] = 0
                c["td"], c["ta"] = scan_tables[c["id"]]
            reader = _JpegBitReader(payload, pos + 2 + seglen)
            nmcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and nmcu and \
                            nmcu % restart_interval == 0:
                        reader.align_to_marker()
                        for c in comps:
                            c["dc"] = 0
                    nmcu += 1
                    for c in comps:
                        q = qtables[c["tq"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                block = [0] * 64
                                t = reader.decode_huffman(
                                    huff_dc[c["td"]])
                                diff = _jpeg_extend(reader.bits(t), t) \
                                    if t else 0
                                c["dc"] += diff
                                block[0] = c["dc"] * q[0]
                                k = 1
                                while k < 64:
                                    rs = reader.decode_huffman(
                                        huff_ac[c["ta"]])
                                    r, s = rs >> 4, rs & 0x0F
                                    if s == 0:
                                        if r == 15:
                                            k += 16
                                            continue
                                        break           # EOB
                                    k += r
                                    if k > 63:
                                        raise ValueError(
                                            "AC index overflow")
                                    block[_JPEG_ZIGZAG[k]] = _jpeg_extend(
                                        reader.bits(s), s) * q[k]
                                    k += 1
                                c["rows"].append(block)
                                c["idx"].append(
                                    (my * c["v"] + by) * c["bw"]
                                    + mx * c["h"] + bx)
            # entropy decode done — batched IDCT + block scatter per
            # component (the per-pixel Python loops this replaces
            # were the decode constant)
            import numpy as np

            for c in comps:
                nat = np.empty((c["bh"] * c["bw"], 64), np.float64)
                nat[np.asarray(c["idx"])] = np.asarray(
                    c["rows"], np.float64)
                spatial = _jpeg_idct_batch(nat)
                c["plane"] = (spatial
                              .reshape(c["bh"], c["bw"], 8, 8)
                              .transpose(0, 2, 1, 3)
                              .reshape(c["bh"] * 8, c["bw"] * 8))
            return width, height, len(comps), _jpeg_assemble(
                width, height, comps, hmax, vmax)
        pos += 2 + seglen
        # skip fill bytes between segments
        while pos < len(payload) and payload[pos] != 0xFF:
            pos += 1
    if progressive and prog_ready:
        # EOI: all scans accumulated — dequantize, IDCT, assemble
        width, height, comps = frame
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        import numpy as np

        for c in comps:
            dq = (np.asarray(c["coef"], np.float64)
                  * np.asarray(qtables[c["tq"]], np.float64))
            nat = np.zeros_like(dq)
            nat[:, np.asarray(_JPEG_ZIGZAG)] = dq
            spatial = _jpeg_idct_batch(nat)
            c["plane"] = (spatial
                          .reshape(c["bh"], c["bw"], 8, 8)
                          .transpose(0, 2, 1, 3)
                          .reshape(c["bh"] * 8, c["bw"] * 8))
        return width, height, len(comps), _jpeg_assemble(
            width, height, comps, hmax, vmax)
    raise ValueError("no scan in JPEG stream")


def _jpeg_assemble(width, height, comps, hmax, vmax):
    """Component planes → full-resolution clamped bytes (replication
    upsample + level shift), shared by the baseline and progressive
    paths."""
    import numpy as np

    planes = []
    for c in comps:
        sx, sy = hmax // c["h"], vmax // c["v"]
        p = c["plane"]
        if not isinstance(p, np.ndarray):
            p = np.asarray(p, np.float64).reshape(
                c["bh"] * 8, c["bw"] * 8)
        up = np.repeat(np.repeat(p, sy, axis=0), sx, axis=1)
        # np.rint rounds half-to-even exactly like Python round()
        v = np.rint(up[:height, :width]) + 128
        planes.append(np.clip(v, 0, 255).astype(np.uint8).tobytes())
    return planes




# -- baseline JPEG encode (stdlib only) -------------------------------------
#
# The re-encode path of a multimodal pipeline (image normalization to a
# common container before training).  Baseline sequential, 4:4:4 or
# grayscale, unit quantization (visually lossless for the flat/smooth
# content this engine generates; callers pass real quant tables for
# size/quality trades via the `quant` argument).

#: Annex K (K.3.3) luminance Huffman tables, reused for all components.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _codes(bits, values):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out

DC_CODE = _codes(DC_BITS, DC_VALS)
AC_CODE = _codes(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def put(self, value, length):
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)      # byte stuffing
                self.buf = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)                     # pad with 1-bits


def _fdct(block):
    """8×8 forward DCT of one block (matrix product; ``out[v*8+u]``
    frequency order, identical to the textbook double sum)."""
    import numpy as np

    m = _jpeg_dct_matrix()
    b = np.asarray(block, dtype=np.float64).reshape(8, 8)
    return (m @ b @ m.T).reshape(64).tolist()


def _dct_quant_zigzag(plane, width, height):
    """Whole-plane batched forward DCT → quantized (unit table)
    zigzag blocks: edge-replicated pad to 8×8 multiples, ONE
    broadcast matrix product over all blocks, half-to-even rounding
    (``np.rint`` == Python ``round``), zigzag reorder by fancy
    index.  Returns a row-major (by, bx) nested list of 64-int
    zigzag blocks for the sequential Huffman pass."""
    import numpy as np

    bx_n = (width + 7) // 8
    by_n = (height + 7) // 8
    if isinstance(plane, (bytes, bytearray, memoryview)):
        arr = np.frombuffer(plane, dtype=np.uint8).astype(np.float64)
    else:
        arr = np.asarray(plane, dtype=np.float64)
    arr = arr.reshape(height, width) - 128.0
    arr = np.pad(arr, ((0, by_n * 8 - height), (0, bx_n * 8 - width)),
                 mode="edge")
    blocks = arr.reshape(by_n, 8, bx_n, 8).transpose(0, 2, 1, 3)
    m = _jpeg_dct_matrix()
    co = m @ blocks @ m.T
    q = np.rint(co).astype(np.int64).reshape(by_n, bx_n, 64)
    zz = q[:, :, np.asarray(_JPEG_ZIGZAG)]
    return zz.tolist()


def _magnitude(v):
    if v == 0:
        return 0, 0
    t = v.bit_length() if v > 0 else (-v).bit_length()
    return t, v if v > 0 else v + (1 << t) - 1


def _encode_block(writer, samples, pred):
    coeffs = _fdct([s - 128 for s in samples])
    q = [int(round(c)) for c in coeffs]        # quant table all ones
    zz = [q[_JPEG_ZIGZAG[k]] for k in range(64)]
    return _encode_zz(writer, zz, pred)


def _encode_zz(writer, zz, pred):
    """Huffman-encode one already-quantized zigzag block (the
    sequential tail of :func:`_encode_block`; the DCT/quant front is
    batched per plane by :func:`_dct_quant_zigzag`)."""
    t, bits = _magnitude(zz[0] - pred)
    length, code = DC_CODE[t]
    writer.put(code, length)
    if t:
        writer.put(bits, t)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            length, code = AC_CODE[0xF0]       # ZRL
            writer.put(code, length)
            run -= 16
        t, bits = _magnitude(zz[k])
        length, code = AC_CODE[(run << 4) | t]
        writer.put(code, length)
        writer.put(bits, t)
        run = 0
    if run:
        length, code = AC_CODE[0x00]           # EOB
        writer.put(code, length)
    return zz[0]


def encode_jpeg(width, height, planes):
    """Real baseline JPEG encoder: 4:4:4 (or grayscale), quant=1,
    Annex-K Huffman, edge-replicated partial blocks."""
    ncomp = len(planes)
    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xDB" + (2 + 65).to_bytes(2, "big") + b"\x00" \
        + bytes([1] * 64)
    sof = bytes([8]) + height.to_bytes(2, "big") \
        + width.to_bytes(2, "big") + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xFF\xC0" + (2 + len(sof)).to_bytes(2, "big") + sof
    dht = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    out += b"\xFF\xC4" + (2 + len(dht)).to_bytes(2, "big") + dht
    dht = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    out += b"\xFF\xC4" + (2 + len(dht)).to_bytes(2, "big") + dht
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xFF\xDA" + (2 + len(sos)).to_bytes(2, "big") + sos

    writer = _BitWriter()
    preds = [0] * ncomp
    bx_n = (width + 7) // 8
    by_n = (height + 7) // 8
    # batched per-plane DCT + quant + zigzag; only the entropy coder
    # (inherently sequential bit stream) stays a Python loop
    zzs = [_dct_quant_zigzag(planes[c], width, height)
           for c in range(ncomp)]
    for by in range(by_n):
        for bx in range(bx_n):
            for c in range(ncomp):
                preds[c] = _encode_zz(writer, zzs[c][by][bx],
                                      preds[c])
    writer.flush()
    out += writer.out
    out += b"\xFF\xD9"
    return bytes(out)


def encode_jpeg_progressive(width, height, plane):
    """Real progressive (SOF2) grayscale JPEG encoder: quant=1,
    Annex-K Huffman, three scans — DC first with successive
    approximation (Al=1), DC refinement, then the full AC band
    (spectral selection 1..63, per-block EOBs).  The transcode
    counterpart of :func:`decode_jpeg`'s progressive path."""
    zz_rows = _dct_quant_zigzag(plane, width, height)
    blocks = [zz for row in zz_rows for zz in row]

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xDB" + (2 + 65).to_bytes(2, "big") + b"\x00" \
        + bytes([1] * 64)
    sof = bytes([8]) + height.to_bytes(2, "big") \
        + width.to_bytes(2, "big") + bytes([1, 1, 0x11, 0])
    out += b"\xFF\xC2" + (2 + len(sof)).to_bytes(2, "big") + sof
    dht = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    out += b"\xFF\xC4" + (2 + len(dht)).to_bytes(2, "big") + dht
    dht = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    out += b"\xFF\xC4" + (2 + len(dht)).to_bytes(2, "big") + dht

    def sos(ss, se, ah, al, blob):
        head = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        return b"\xFF\xDA" + (2 + len(head)).to_bytes(2, "big") \
            + head + blob

    # scan 1: DC first, point transform Al=1 (arithmetic shift)
    w = _BitWriter()
    pred = 0
    for zz in blocks:
        v = zz[0] >> 1
        t, bits = _magnitude(v - pred)
        pred = v
        length, code = DC_CODE[t]
        w.put(code, length)
        if t:
            w.put(bits, t)
    w.flush()
    out += sos(0, 0, 0, 1, bytes(w.out))
    # scan 2: DC refinement — the Al=0 bit of each DC coefficient
    w = _BitWriter()
    for zz in blocks:
        w.put(zz[0] & 1, 1)
    w.flush()
    out += sos(0, 0, 1, 0, bytes(w.out))
    # scan 3: the whole AC band at full precision, per-block EOBs
    w = _BitWriter()
    for zz in blocks:
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                length, code = AC_CODE[0xF0]
                w.put(code, length)
                run -= 16
            t, bits = _magnitude(zz[k])
            length, code = AC_CODE[(run << 4) | t]
            w.put(code, length)
            w.put(bits, t)
            run = 0
        if run:
            length, code = AC_CODE[0x00]
            w.put(code, length)
    w.flush()
    out += sos(1, 63, 0, 0, bytes(w.out))
    out += b"\xFF\xD9"
    return bytes(out)


def jpeg_pixel_stats(df: DataFrame, binary_col: str,
                     id_col: str = "doc_id") -> DataFrame:
    """Real luma statistics over a baseline-JPEG binary column:
    dimensions, luma sample count and exact integer luma sum (first
    component plane).  Same contract as :func:`png_pixel_stats`."""
    slim = df.select(F.col(id_col), F.col(binary_col))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "n_samples": [], "sample_sum": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    w, h, _nc, planes = decode_jpeg(bytes(p))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_samples"].append(w * h)
                    out["sample_sum"].append(sum(planes[0]))
                except (ValueError, IndexError):
                    for k in ("width", "height", "n_samples",
                              "sample_sum"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(stats, PIXEL_STATS_SCHEMA)


# -- Matroska/WebM EBML metadata walk (stdlib only) -------------------------


def _ebml_vint(payload: bytes, pos: int, keep_marker: bool):
    """Read one EBML variable-length integer at ``pos`` → (value,
    next_pos).  Element IDs keep the length-marker bit; sizes strip
    it.  All-ones size payload means 'unknown size' → None."""
    if pos >= len(payload):
        raise ValueError("truncated EBML varint")
    first = payload[pos]
    length = 8 - first.bit_length() + 1 if first else 0
    if first == 0 or length > 8:
        raise ValueError("bad EBML varint marker")
    if pos + length > len(payload):
        raise ValueError("truncated EBML varint body")
    raw = payload[pos:pos + length]
    value = int.from_bytes(raw, "big")
    if not keep_marker:
        marker = 1 << (8 * length - length)
        value -= marker
        if value == marker - 1:     # all data bits set: unknown size
            return None, pos + length
    return value, pos + length


#: EBML element IDs used by the walk (with their length markers).
_EBML_SEGMENT = 0x18538067
_EBML_INFO = 0x1549A966
_EBML_TRACKS = 0x1654AE6B
_EBML_TRACK_ENTRY = 0xAE
_EBML_TRACK_TYPE = 0x83
_EBML_CODEC_ID = 0x86
_EBML_TIMESTAMP_SCALE = 0x2AD7B1
#: containers the walk descends into
_EBML_RECURSE = {_EBML_SEGMENT, _EBML_INFO, _EBML_TRACKS,
                 _EBML_TRACK_ENTRY}


def matroska_tracks(payload: bytes):
    """Parse Matroska/WebM container METADATA with the stdlib only:
    EBML varint walk over Segment → Info / Tracks → TrackEntry.

    Returns ``(timestamp_scale, tracks)`` where ``tracks`` is a list
    of ``(track_type, codec_id)`` — type 1 video, 2 audio, 17
    subtitle.  Frame payloads stay opaque (every Matroska codec is
    entropy-coded and needs external libraries); this is the container
    triage step: route by codec, count streams, validate blobs.
    Raises ``ValueError`` on non-EBML input."""
    if payload[:4] != b"\x1A\x45\xDF\xA3":
        raise ValueError("not an EBML/Matroska stream")
    scale = 1000000
    tracks = []

    def walk(lo, hi, in_entry):
        nonlocal scale
        pos = lo
        entry = {}
        while pos < hi and pos < len(payload):
            eid, pos = _ebml_vint(payload, pos, keep_marker=True)
            size, pos = _ebml_vint(payload, pos, keep_marker=False)
            end = hi if size is None else min(pos + size, hi)
            if eid in _EBML_RECURSE:
                sub = walk(pos, end, eid == _EBML_TRACK_ENTRY)
                if eid == _EBML_TRACK_ENTRY and sub is not None:
                    tracks.append((sub.get("type"), sub.get("codec")))
            elif eid == _EBML_TRACK_TYPE and in_entry:
                entry["type"] = int.from_bytes(payload[pos:end], "big")
            elif eid == _EBML_CODEC_ID and in_entry:
                entry["codec"] = payload[pos:end].decode(
                    "ascii", "replace")
            elif eid == _EBML_TIMESTAMP_SCALE:
                scale = int.from_bytes(payload[pos:end], "big")
            if size is None:
                break               # unknown-size element: stop here
            pos = end
        return entry if in_entry else None

    # skip the EBML header element itself, then walk the rest
    _eid, pos = _ebml_vint(payload, 0, keep_marker=True)
    hsize, pos = _ebml_vint(payload, pos, keep_marker=False)
    walk(pos + (hsize or 0), len(payload), False)
    return scale, tracks


#: Output schema of :func:`matroska_metadata`.
TRACK_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("timestamp_scale", LongType()),
    StructField("n_video", LongType()),
    StructField("n_audio", LongType()),
    StructField("n_subtitle", LongType()),
    StructField("codec_ids", StringType()),
])


def matroska_metadata(df: DataFrame, binary_col: str,
                      id_col: str = "doc_id") -> DataFrame:
    """Container triage over a Matroska/WebM binary column: timestamp
    scale, per-type track counts and the comma-joined codec IDs in
    track order.  NULL row on undecodable input."""
    slim = df.select(F.col(id_col), F.col(binary_col))

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "timestamp_scale": [], "n_video": [],
                   "n_audio": [], "n_subtitle": [], "codec_ids": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    scale, tracks = matroska_tracks(bytes(p))
                    out["timestamp_scale"].append(scale)
                    out["n_video"].append(
                        sum(1 for t, _ in tracks if t == 1))
                    out["n_audio"].append(
                        sum(1 for t, _ in tracks if t == 2))
                    out["n_subtitle"].append(
                        sum(1 for t, _ in tracks if t == 17))
                    out["codec_ids"].append(
                        ",".join(c or "" for _, c in tracks))
                except ValueError:
                    for k in ("timestamp_scale", "n_video", "n_audio",
                              "n_subtitle", "codec_ids"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(meta, TRACK_META_SCHEMA)


# -- AVI video demux + uncompressed-frame decode (stdlib only) --------------


def decode_avi(payload: bytes, every_k: int = 1):
    """Demux an AVI (RIFF) container and decode its UNCOMPRESSED
    (BI_RGB 24-bit DIB) video frames with the stdlib only.

    The stream format comes from the ``strf`` BITMAPINFOHEADER inside
    ``LIST hdrl``; frame payloads are the ``##db``/``##dc`` chunks of
    ``LIST movi`` (word-aligned, in presentation order) — bottom-up
    4-byte-padded BGR rows, exactly a headerless BMP.  ``every_k``
    keeps every k-th frame (frame *sampling*, the standard
    training-pipeline step — decode cost scales with kept frames, the
    demux walk is O(container)).  Returns ``(width, height, frames)``
    with ``frames`` a list of ``(frame_index, samples)``; ``samples``
    are row-major top-down RGB bytes.  Compressed codecs raise
    ``ValueError`` — entropy-coded video needs libraries not present
    in this environment.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    width = height = bpp = compression = None
    frames = []
    frame_no = 0

    def walk(lo, hi):
        nonlocal width, height, bpp, compression, frame_no
        pos = lo
        while pos + 8 <= hi:
            cid = payload[pos:pos + 4]
            size = int.from_bytes(payload[pos + 4:pos + 8], "little")
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + size)     # skip list type tag
            elif cid == b"strf" and width is None and size >= 40:
                width = int.from_bytes(
                    payload[body + 4:body + 8], "little", signed=True)
                height = int.from_bytes(
                    payload[body + 8:body + 12], "little", signed=True)
                bpp = int.from_bytes(
                    payload[body + 14:body + 16], "little")
                compression = int.from_bytes(
                    payload[body + 16:body + 20], "little")
            elif len(cid) == 4 and cid[2:4] in (b"db", b"dc"):
                if frame_no % every_k == 0:
                    frames.append((frame_no, payload[body:body + size]))
                frame_no += 1
            pos = body + size + (size & 1)      # word alignment

    walk(12, len(payload))
    if width is None or not frames:
        raise ValueError("missing stream format or frames")
    if compression != 0 or bpp != 24:
        raise ValueError(
            f"unsupported AVI codec (bpp={bpp}, fourcc={compression})")
    top_down = height < 0
    height = abs(height)
    stride = (width * 3 + 3) // 4 * 4
    decoded = []
    for idx, raw in frames:
        if len(raw) < stride * height:
            raise ValueError("truncated AVI frame")
        out = bytearray()
        rows = range(height) if top_down else range(height - 1, -1, -1)
        for y in rows:
            row = raw[y * stride:y * stride + width * 3]
            for x in range(width):              # BGR → RGB
                out += bytes((row[3 * x + 2], row[3 * x + 1],
                              row[3 * x]))
        decoded.append((idx, bytes(out)))
    return width, height, decoded


#: Output schema of :func:`avi_frame_stats` — one row per KEPT frame.
FRAME_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_samples", LongType()),
    StructField("sample_sum", LongType()),
])


def avi_frame_stats(df: DataFrame, binary_col: str,
                    id_col: str = "doc_id",
                    every_k: int = 1) -> DataFrame:
    """Real video frame sampling: demux AVI containers, decode every
    k-th uncompressed frame, one output row per kept frame with exact
    RGB sums.  Arrow-batched narrow FLATMAP (a row fans out to its
    kept frames); undecodable containers yield a single NULL-stats
    row so corrupt blobs stay visible without killing the batch."""
    slim = df.select(F.col(id_col), F.col(binary_col))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_id": [], "width": [],
                   "height": [], "n_samples": [], "sample_sum": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                try:
                    w, h, frames = decode_avi(bytes(p), every_k)
                    for idx, samples in frames:
                        out["doc_id"].append(did)
                        out["frame_id"].append(idx)
                        out["width"].append(w)
                        out["height"].append(h)
                        out["n_samples"].append(len(samples))
                        out["sample_sum"].append(sum(samples))
                except (ValueError, IndexError):
                    out["doc_id"].append(did)
                    for k in ("frame_id", "width", "height",
                              "n_samples", "sample_sum"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(stats, FRAME_STATS_SCHEMA)


def _decode_rle8(data: bytes, width: int, height: int) -> bytes:
    """BI_RLE8 pixel decode (bottom-up by definition): runs
    ``(count, index)``, escapes ``00 00`` end-of-line / ``00 01``
    end-of-bitmap / ``00 02 dx dy`` delta / ``00 n>=3`` absolute mode
    (word-aligned).  Pixels never written stay 0 (the spec leaves them
    undefined; 0 is the conventional fill).  Returns top-down
    row-major palette indices."""
    grid = [bytearray(width) for _ in range(height)]
    x = y = i = 0                       # y is the FILE row (bottom-up)
    while i + 2 <= len(data):
        count, val = data[i], data[i + 1]
        i += 2
        if count > 0:
            for _ in range(count):
                if x < width and y < height:
                    grid[y][x] = val
                x += 1
        elif val == 0:                  # end of line
            x, y = 0, y + 1
        elif val == 1:                  # end of bitmap
            break
        elif val == 2:                  # delta
            if i + 2 > len(data):
                raise ValueError("truncated RLE8 delta")
            x += data[i]
            y += data[i + 1]
            i += 2
        else:                           # absolute mode, word-aligned
            if i + val > len(data):
                raise ValueError("truncated RLE8 absolute run")
            for b in data[i:i + val]:
                if x < width and y < height:
                    grid[y][x] = b
                x += 1
            i += val + (val & 1)
    out = bytearray()
    for y in range(height - 1, -1, -1):   # bottom-up file -> top-down
        out += grid[y]
    return bytes(out)


def decode_bmp(payload: bytes):
    """Decode a BMP with the stdlib only: BITMAPINFOHEADER(+), 24-bit
    BGR or 8-bit paletted, BI_RGB (4-byte row padding, bottom-up or
    top-down) or BI_RLE8 run-length compression.  Returns ``(width,
    height, channels, samples, palette)`` with ``samples`` row-major
    top-down — RGB triplets for 24-bit, palette indices for 8-bit —
    and ``palette`` the (r, g, b) color table (empty for 24-bit).
    Raises ``ValueError`` on otherwise unsupported input."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP stream")
    data_offset = int.from_bytes(payload[10:14], "little")
    hdr_size = int.from_bytes(payload[14:18], "little")
    if hdr_size < 40:
        raise ValueError("unsupported BMP core header")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression not in (0, 1) or bpp not in (8, 24) \
            or width <= 0 or height == 0 \
            or (compression == 1 and (bpp != 8 or height < 0)):
        raise ValueError(
            f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    palette = []
    if bpp == 8:
        ncolors = int.from_bytes(payload[46:50], "little") or 256
        off = 14 + hdr_size
        raw = payload[off:off + 4 * ncolors]
        if len(raw) < 4 * ncolors:
            raise ValueError("truncated BMP color table")
        # stored as BGRA quads
        palette = [(raw[i + 2], raw[i + 1], raw[i])
                   for i in range(0, 4 * ncolors, 4)]
    channels = 1 if bpp == 8 else 3
    if compression == 1:
        samples = _decode_rle8(payload[data_offset:], width, height)
        return width, height, channels, samples, palette
    stride = (width * channels + 3) // 4 * 4
    data = payload[data_offset:]
    if len(data) < stride * height:
        raise ValueError("truncated BMP pixel data")
    out = bytearray()
    file_rows = range(height) if top_down else range(height - 1, -1, -1)
    for y in file_rows:
        row = data[y * stride:y * stride + width * channels]
        if channels == 3:
            for x in range(width):           # BGR → RGB
                out += bytes((row[3 * x + 2], row[3 * x + 1],
                              row[3 * x]))
        else:
            out += row
    return width, height, channels, bytes(out), palette


def bmp_pixel_stats(df: DataFrame, binary_col: str,
                    id_col: str = "doc_id") -> DataFrame:
    """Real pixel statistics over an uncompressed BMP binary column —
    same contract and schema as :func:`png_pixel_stats` (NULL stats on
    undecodable rows; ``sample_sum`` over RGB bytes or palette
    indices)."""
    slim = df.select(F.col(id_col), F.col(binary_col))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "n_samples": [], "sample_sum": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    w, h, _ch, samples, _pal = decode_bmp(bytes(p))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_samples"].append(len(samples))
                    out["sample_sum"].append(sum(samples))
                except ValueError:
                    for k in ("width", "height", "n_samples",
                              "sample_sum"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(stats, PIXEL_STATS_SCHEMA)


def _g711_tables():
    """256-entry µ-law / A-law expansion tables (ITU-T G.711).

    µ-law: complement, then ``((mant<<3)+0x84) << exp − 0x84`` with the
    sign from the complemented byte.  A-law: XOR 0x55, then segment 0
    is ``(mant<<4)+8`` and segment s>0 is ``((mant<<4)+0x108) <<
    (s−1)``, positive when the raw byte has bit 0x80 set.  Matches the
    classic ``audioop.ulaw2lin``/``alaw2lin`` 16-bit outputs."""
    ulaw, alaw = [], []
    for b in range(256):
        c = ~b & 0xFF
        mag = (((c & 0x0F) << 3) + 0x84) << ((c >> 4) & 7)
        ulaw.append(0x84 - mag if c & 0x80 else mag - 0x84)
        i = b ^ 0x55
        seg = (i & 0x70) >> 4
        mant = i & 0x0F
        val = (mant << 4) + 8 if seg == 0 else \
            ((mant << 4) + 0x108) << (seg - 1)
        alaw.append(val if b & 0x80 else -val)
    return ulaw, alaw


_ULAW_TABLE, _ALAW_TABLE = _g711_tables()

#: IMA/DVI ADPCM step-size and index-adjust tables (public IMA spec).
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(nibble: int, pred: int, index: int):
    """One IMA ADPCM state transition: (new predictor, new index)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX[nibble]))
    return pred, index


def _decode_ima_adpcm(data: bytes, channels: int, block_align: int):
    """IMA ADPCM (WAV format 0x11) block decode: per block and channel
    a 4-byte header (s16le predictor, step index, reserved) whose
    predictor IS the first output sample, then nibble data in 4-byte
    per-channel groups, LOW nibble first.  Returns frame-major
    interleaved 16-bit samples."""
    if block_align < 4 * channels:
        raise ValueError("ADPCM block_align smaller than headers")
    out = []
    for start in range(0, len(data) - block_align + 1, block_align):
        block = data[start:start + block_align]
        pred, index, chans = [], [], []
        for ch in range(channels):
            p = int.from_bytes(block[4 * ch:4 * ch + 2], "little",
                               signed=True)
            i = block[4 * ch + 2]
            if i > 88:
                raise ValueError("ADPCM step index out of range")
            pred.append(p)
            index.append(i)
            chans.append([p])
        pos = 4 * channels
        while pos + 4 * channels <= block_align:
            for ch in range(channels):
                for byte in block[pos + 4 * ch:pos + 4 * ch + 4]:
                    for nib in (byte & 0x0F, byte >> 4):
                        pred[ch], index[ch] = _ima_step(
                            nib, pred[ch], index[ch])
                        chans[ch].append(pred[ch])
            pos += 4 * channels
        n_frames = len(chans[0])
        for f in range(n_frames):
            for ch in range(channels):
                out.append(chans[ch][f])
    return out


def decode_wav(payload: bytes):
    """Decode a PCM or G.711 RIFF/WAVE stream with the stdlib only.

    Chunk walk (word-aligned, unknown chunks skipped) → fmt + data →
    samples as signed ints: 16-bit little-endian or 8-bit unsigned
    re-centered to signed (the PCM conventions), 8-bit µ-law
    (format 7) / A-law (format 6) expanded to 16-bit through the
    G.711 tables, or IMA ADPCM (format 0x11) block-decoded through
    the IMA state machine.  Returns ``(n_channels, sample_rate,
    bits, samples)`` with ``samples`` frame-major interleaved.
    Raises ``ValueError`` on other formats (entropy-coded audio needs
    codec libraries not present in this environment)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        chunk = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)   # chunks are word-aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if channels == 0 or (audio_format == 1 and bits not in (8, 16)) \
            or (audio_format in (6, 7) and bits != 8) \
            or (audio_format == 0x11 and bits != 4) \
            or audio_format not in (1, 6, 7, 0x11):
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits})")
    if audio_format == 0x11:
        samples = _decode_ima_adpcm(data, channels, block_align)
    elif audio_format == 7:
        samples = [_ULAW_TABLE[b] for b in data]
    elif audio_format == 6:
        samples = [_ALAW_TABLE[b] for b in data]
    elif bits == 8:
        samples = [b - 128 for b in data]
    else:
        import array

        arr = array.array("h")
        arr.frombytes(data[:len(data) // 2 * 2])
        if sys.byteorder == "big":
            arr.byteswap()
        samples = arr.tolist()
    return channels, rate, bits, samples


#: Output schema of :func:`wav_sample_stats`.
SAMPLE_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_channels", LongType()),
    StructField("sample_rate", LongType()),
    StructField("n_samples", LongType()),
    StructField("sample_sum", LongType()),
])


def wav_sample_stats(df: DataFrame, binary_col: str,
                     id_col: str = "doc_id") -> DataFrame:
    """Real sample-level statistics over a PCM WAV binary column:
    channel count, sample rate, total sample count and the exact
    integer sum of all (signed) samples.  Same contract as
    :func:`png_pixel_stats`: Arrow-batched narrow map, NULL stats on
    undecodable rows."""
    slim = df.select(F.col(id_col), F.col(binary_col))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_channels": [], "sample_rate": [],
                   "n_samples": [], "sample_sum": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    ch, rate, _bits, samples = decode_wav(bytes(p))
                    out["n_channels"].append(ch)
                    out["sample_rate"].append(rate)
                    out["n_samples"].append(len(samples))
                    out["sample_sum"].append(sum(samples))
                except ValueError:
                    out["n_channels"].append(None)
                    out["sample_rate"].append(None)
                    out["n_samples"].append(None)
                    out["sample_sum"].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(stats, SAMPLE_STATS_SCHEMA)


#: Output schema of :func:`png_pixel_stats` — corrupt/unsupported rows
#: yield NULL stats, never errors.
PIXEL_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_samples", LongType()),
    StructField("sample_sum", LongType()),
])


def png_pixel_stats(df: DataFrame, binary_col: str,
                    id_col: str = "doc_id") -> DataFrame:
    """Real pixel-level statistics over a PNG binary column:
    ``(doc_id, width, height, n_samples, sample_sum)`` with
    ``n_samples = width × height × channels`` and ``sample_sum`` the
    exact integer sum of all unfiltered samples.

    Arrow-batched ``mapInPandas`` over a slim (id, payload) projection;
    a narrow map — no shuffle, linear in partitions.  Rows that fail to
    decode produce NULL stats (corruption tolerance at scale)."""
    slim = df.select(F.col(id_col), F.col(binary_col))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "n_samples": [], "sample_sum": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    w, h, ch, samples = decode_png(bytes(p))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_samples"].append(len(samples))
                    out["sample_sum"].append(sum(samples))
                except (ValueError, IndexError, KeyError,
                        zlib.error, struct.error):
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_samples"].append(None)
                    out["sample_sum"].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(stats, PIXEL_STATS_SCHEMA)


def _strip_pool(samples, dim: int, scale: float) -> list:
    """``dim`` equal-strip means over a sample sequence, normalized."""
    n = len(samples)
    feats = []
    for i in range(dim):
        lo = i * n // dim
        hi = max((i + 1) * n // dim, lo + 1)
        seg = samples[lo:hi]
        feats.append(sum(seg) / len(seg) / scale)
    return feats


def _decode_stub(payload: bytes, dim: int) -> list:
    """Feature extraction: REAL for PNG, GIF, BMP, baseline JPEG and
    PCM WAV (stdlib decode + strip pooling); compressed audio/video
    codecs need external libraries not present in this environment and
    raise.  ``fake=True`` on :func:`decode_features` remains the
    deterministic test double for arbitrary formats."""
    if payload[:8] == _PNG_SIG:
        _w, _h, _ch, samples = decode_png(payload)
        return _strip_pool(samples, dim, 255.0)
    if payload[:2] == b"\xFF\xD8":
        _w, _h, _nc, planes = decode_jpeg(payload)
        return _strip_pool(planes[0], dim, 255.0)   # luma pooling
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        _w, _h, indices, _pal = decode_gif(payload)
        return _strip_pool(indices, dim, 255.0)
    if payload[:2] == b"BM":
        _w, _h, _ch, samples, _pal = decode_bmp(payload)
        return _strip_pool(samples, dim, 255.0)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        _ch, _rate, _bits, samples = decode_wav(payload)
        return _strip_pool(samples, dim, 32768.0)
    raise NotImplementedError(
        "PNG/GIF/BMP/JPEG/PCM-WAV decode is implemented with the "
        "stdlib; other codecs require media libraries not present in "
        "this environment — use decode_features(..., fake=True) for "
        "the deterministic test double"
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
                    _safe_features(decoder, p, dim)
                    for p in pdf[binary_col]
                ],
            })

    return sniffed.mapInPandas(extract, FEATURE_SCHEMA)


# -- image resize -----------------------------------------------------------


def _safe_features(decoder, payload, dim):
    """Per-row decode boundary: ANY failure (unknown format raising
    NotImplementedError, truncated container, empty media) quarantines
    as a NULL feature row instead of failing the task — the module's
    corruption-tolerance contract at 100 TB."""
    try:
        return decoder(bytes(payload), dim)
    except Exception:
        return None


def _decode_image_samples(payload: bytes):
    """Decode any supported still-image format to ``(width, height,
    channels, samples)`` with ``samples`` row-major top-down
    interleaved bytes — the shared ingest for :func:`resize_image`.
    Paletted formats (GIF, 8-bit BMP) are expanded through their color
    table to RGB so interpolation happens in color space, not index
    space; JPEG components are interleaved in frame-header order.
    Raises ``ValueError`` on non-image / unsupported input."""
    import numpy as np

    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xFF\xD8":
        w, h, nc, planes = decode_jpeg(payload)
        arr = np.stack([np.frombuffer(p, dtype=np.uint8).reshape(h, w)
                        for p in planes], axis=-1)
        return w, h, nc, arr.tobytes()
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h, indices, palette = decode_gif(payload)
        lut = np.asarray(palette, dtype=np.uint8)
        rgb = lut[np.frombuffer(indices, dtype=np.uint8)]
        return w, h, 3, rgb.tobytes()
    if payload[:2] == b"BM":
        w, h, ch, samples, palette = decode_bmp(payload)
        if ch == 1:
            lut = np.asarray(palette, dtype=np.uint8)
            rgb = lut[np.frombuffer(samples, dtype=np.uint8)]
            return w, h, 3, rgb.tobytes()
        return w, h, ch, samples
    raise ValueError("unsupported image format for resize")


def ahash_bytes(payload: bytes, hash_w: int = 8,
                hash_h: int = 8) -> str:
    """Perceptual average hash (aHash) of any supported still image:
    decode, nearest-resize to ``hash_w × hash_h``, integer grayscale
    (per-pixel channel mean, floor), bit = pixel >= image mean — the
    mean compare is exact integer arithmetic (``gray · npixels >=
    total``), so the hash is bit-stable across platforms.  Bits are
    row-major, MSB first; returns a fixed-width hex string.

    The image-side analog of the text content hash: visually identical
    images (any size, any supported container) collapse to one hash,
    and small edits flip few bits (Hamming-near hashes)."""
    import numpy as np

    w, h, ch, samples = _decode_image_samples(payload)
    small = resize_samples(samples, w, h, ch, hash_w, hash_h,
                           "nearest")
    arr = np.frombuffer(small, np.uint8).reshape(
        hash_h, hash_w, ch).astype(np.int64)
    gray = arr.sum(axis=2) // ch
    total = int(gray.sum())
    npx = hash_w * hash_h
    val = 0
    for bit in (gray * npx >= total).flatten():
        val = (val << 1) | int(bit)
    return format(val, f"0{npx // 4}x")


def image_ahash(df: DataFrame, binary_col: str,
                id_col: str = "doc_id", hash_w: int = 8,
                hash_h: int = 8) -> DataFrame:
    """(id, ahash) over an image binary column — Arrow-batched narrow
    map, NULL on undecodable rows (contract of the other decode
    operators)."""
    slim = df.select(F.col(id_col), F.col(binary_col))
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("ahash", StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "ahash": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    out["ahash"].append(
                        ahash_bytes(bytes(p), hash_w, hash_h))
                except (ValueError, IndexError):
                    out["ahash"].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(run, schema)


def image_duplicates(df: DataFrame, binary_col: str,
                     id_col: str = "doc_id",
                     min_docs: int = 2) -> DataFrame:
    """Image near-duplicate groups: decode → aHash → one hash
    group-by (``(ahash, n_docs, canonical_id)``) — the multimodal
    counterpart of ``exact_duplicates``: same one-shuffle shape, keyed
    by the 64-bit perceptual hash instead of the text content hash."""
    hashed = image_ahash(df, binary_col, id_col)
    return (
        hashed.filter(F.col("ahash").isNotNull())
        .groupBy("ahash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("canonical_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def audio_fingerprint_bytes(payload: bytes, n_points: int = 65) -> str:
    """Perceptual audio fingerprint: decode (any supported WAV
    format), floor-mean mono mixdown, nearest-resample the waveform to
    ``n_points`` anchors, then one sign-of-difference bit per adjacent
    anchor pair (rising = 1) — the classic envelope-contour hash:
    invariant to container, sample width and uniform gain, Hamming-
    near under small edits.  Returns ``(n_points-1)/4`` hex chars."""
    channels, _rate, _bits, samples = decode_wav(payload)
    frames = len(samples) // channels
    if frames < 2:
        raise ValueError("too short to fingerprint")
    mono = [sum(samples[f * channels:(f + 1) * channels]) // channels
            for f in range(frames)]
    pts = [mono[(i * frames) // n_points] for i in range(n_points)]
    val = 0
    for i in range(n_points - 1):
        val = (val << 1) | (1 if pts[i + 1] > pts[i] else 0)
    return format(val, f"0{(n_points - 1) // 4}x")


def audio_duplicates(df: DataFrame, binary_col: str,
                     id_col: str = "doc_id",
                     min_docs: int = 2) -> DataFrame:
    """Audio near-duplicate groups: decode → contour fingerprint →
    one hash group-by (``(fingerprint, n_docs, canonical_id)``) —
    completes the per-modality dedup family (text content hash, image
    aHash, audio contour)."""
    slim = df.select(F.col(id_col), F.col(binary_col))
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("fingerprint", StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "fingerprint": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    out["fingerprint"].append(
                        audio_fingerprint_bytes(bytes(p)))
                except (ValueError, IndexError):
                    out["fingerprint"].append(None)
            yield pd.DataFrame(out)

    hashed = slim.mapInPandas(run, schema)
    return (
        hashed.filter(F.col("fingerprint").isNotNull())
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("canonical_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def resize_samples(samples, width: int, height: int, channels: int,
                   out_width: int, out_height: int,
                   method: str = "nearest") -> bytes:
    """Resize a decoded row-major sample buffer — numpy-vectorized,
    no per-pixel Python.

    ``nearest`` maps output pixel ``x`` to source pixel
    ``(x * width) // out_width`` (pure integer floor — exactly
    reproducible in SQL, which is what the driver oracle does).
    ``bilinear`` uses half-pixel-center sampling
    (``(x + 0.5) * scale - 0.5``, edges clamped — the standard
    align_corners=False convention) with the result rounded half-up.
    """
    import numpy as np

    if out_width <= 0 or out_height <= 0:
        raise ValueError("output dimensions must be positive")
    arr = np.frombuffer(bytes(samples), dtype=np.uint8).reshape(
        height, width, channels)
    if method == "nearest":
        ys = (np.arange(out_height) * height) // out_height
        xs = (np.arange(out_width) * width) // out_width
        out = arr[ys][:, xs]
    elif method == "bilinear":
        fy = np.clip((np.arange(out_height) + 0.5) * (height / out_height)
                     - 0.5, 0, height - 1)
        fx = np.clip((np.arange(out_width) + 0.5) * (width / out_width)
                     - 0.5, 0, width - 1)
        y0 = np.floor(fy).astype(np.int64)
        x0 = np.floor(fx).astype(np.int64)
        y1 = np.minimum(y0 + 1, height - 1)
        x1 = np.minimum(x0 + 1, width - 1)
        wy = (fy - y0)[:, None, None]
        wx = (fx - x0)[None, :, None]
        a = arr.astype(np.float64)
        top = a[y0][:, x0] * (1.0 - wx) + a[y0][:, x1] * wx
        bot = a[y1][:, x0] * (1.0 - wx) + a[y1][:, x1] * wx
        out = np.floor(top * (1.0 - wy) + bot * wy + 0.5).astype(np.uint8)
    else:
        raise ValueError(f"unknown resize method {method!r}")
    return out.tobytes()


#: Output schema of :func:`resize_image` — corrupt/unsupported rows
#: yield a NULL payload, never errors.
RESIZED_IMAGE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("src_width", LongType()),
    StructField("src_height", LongType()),
    StructField("channels", LongType()),
    StructField("out_width", LongType()),
    StructField("out_height", LongType()),
    StructField("resized", BinaryType()),
])


def resize_image(df: DataFrame, binary_col: str, out_width: int,
                 out_height: int, method: str = "nearest",
                 id_col: str = "doc_id") -> DataFrame:
    """Batch image resize over a binary column: decode (PNG / GIF /
    BMP / baseline JPEG), resize to ``out_width × out_height``
    (``nearest`` or ``bilinear``), return the resized sample buffer as
    a binary column with its dimensions — the uniform-shape step a
    training-data pipeline runs before feature extraction.

    Arrow-batched ``mapInPandas`` over a slim (id, payload)
    projection; a narrow map — no shuffle, linear in partitions.  Rows
    that fail to decode produce NULL stats/payload (corruption
    tolerance at scale)."""
    slim = df.select(F.col(id_col), F.col(binary_col))

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "src_width": [], "src_height": [],
                   "channels": [], "out_width": [], "out_height": [],
                   "resized": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    w, h, ch, samples = _decode_image_samples(bytes(p))
                    resized = resize_samples(
                        samples, w, h, ch, out_width, out_height, method)
                    out["src_width"].append(w)
                    out["src_height"].append(h)
                    out["channels"].append(ch)
                    out["out_width"].append(out_width)
                    out["out_height"].append(out_height)
                    out["resized"].append(resized)
                except (ValueError, IndexError, KeyError,
                        zlib.error, struct.error):
                    for k in ("src_width", "src_height", "channels",
                              "out_width", "out_height", "resized"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(work, RESIZED_IMAGE_SCHEMA)


#: Output schema of :func:`image_resize_stats`.
RESIZE_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("out_width", LongType()),
    StructField("out_height", LongType()),
    StructField("n_samples", LongType()),
    StructField("sample_sum", LongType()),
])


def image_resize_stats(df: DataFrame, binary_col: str, out_width: int,
                       out_height: int, method: str = "nearest",
                       id_col: str = "doc_id") -> DataFrame:
    """Decode + resize + exact integer sample sum in ONE Python stage
    — the verification face of :func:`resize_image` (same decode and
    resize code paths; summing here avoids shipping pixel buffers back
    just to check them)."""
    slim = df.select(F.col(id_col), F.col(binary_col))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "out_width": [], "out_height": [], "n_samples": [],
                   "sample_sum": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    w, h, ch, samples = _decode_image_samples(bytes(p))
                    resized = resize_samples(
                        samples, w, h, ch, out_width, out_height, method)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["out_width"].append(out_width)
                    out["out_height"].append(out_height)
                    out["n_samples"].append(len(resized))
                    out["sample_sum"].append(sum(resized))
                except (ValueError, IndexError, KeyError,
                        zlib.error, struct.error):
                    for k in ("width", "height", "out_width",
                              "out_height", "n_samples", "sample_sum"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(stats, RESIZE_STATS_SCHEMA)


# -- audio resample ---------------------------------------------------------


def resample_samples(samples, channels: int, in_rate: int,
                     out_rate: int, method: str = "nearest"):
    """Resample frame-major interleaved integer samples to a new rate
    — numpy-vectorized, no per-sample Python.

    Output length is ``max(1, (n_frames * out_rate) // in_rate)``
    frames.  ``nearest`` maps output frame ``j`` to source frame
    ``(j * n_frames) // out_n`` (pure integer floor — exactly
    reproducible in SQL, which is what the driver oracle does);
    ``linear`` interpolates at source position
    ``j * (in_rate / out_rate)`` (edges clamped, result rounded
    half-up, symmetric with :func:`resize_samples`).  Returns a list
    of signed ints, frame-major interleaved."""
    import numpy as np

    if in_rate <= 0 or out_rate <= 0 or channels <= 0:
        raise ValueError("rates and channel count must be positive")
    arr = np.asarray(samples, dtype=np.int64)
    if arr.size % channels:
        raise ValueError("sample count not a multiple of channels")
    n_frames = arr.size // channels
    if n_frames == 0:
        raise ValueError("no frames to resample")
    arr = arr.reshape(n_frames, channels)
    out_n = max(1, (n_frames * out_rate) // in_rate)
    if method == "nearest":
        idx = (np.arange(out_n) * n_frames) // out_n
        out = arr[idx]
    elif method == "linear":
        pos = np.clip(np.arange(out_n) * (in_rate / out_rate),
                      0, n_frames - 1)
        i0 = np.floor(pos).astype(np.int64)
        i1 = np.minimum(i0 + 1, n_frames - 1)
        frac = (pos - i0)[:, None]
        a = arr.astype(np.float64)
        out = np.floor(a[i0] * (1.0 - frac) + a[i1] * frac
                       + 0.5).astype(np.int64)
    else:
        raise ValueError(f"unknown resample method {method!r}")
    return out.reshape(-1).tolist()


#: Output schema of :func:`resample_audio` — corrupt/unsupported rows
#: yield a NULL payload, never errors.
RESAMPLED_AUDIO_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_channels", LongType()),
    StructField("sample_rate", LongType()),
    StructField("out_rate", LongType()),
    StructField("n_frames", LongType()),
    StructField("resampled", BinaryType()),
])


def resample_audio(df: DataFrame, binary_col: str, out_rate: int,
                   method: str = "nearest",
                   id_col: str = "doc_id") -> DataFrame:
    """Batch audio resample over a PCM WAV binary column: decode,
    resample to ``out_rate`` (``nearest`` or ``linear``), return the
    resampled buffer as signed-16-bit-LE bytes with its frame count —
    the rate-normalization step an audio training pipeline runs before
    featurization.  Arrow-batched narrow ``mapInPandas``; rows that
    fail to decode produce NULL columns."""
    import numpy as np

    slim = df.select(F.col(id_col), F.col(binary_col))

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_channels": [], "sample_rate": [],
                   "out_rate": [], "n_frames": [], "resampled": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    ch, rate, _bits, samples = decode_wav(bytes(p))
                    res = resample_samples(samples, ch, rate, out_rate,
                                           method)
                    out["n_channels"].append(ch)
                    out["sample_rate"].append(rate)
                    out["out_rate"].append(out_rate)
                    out["n_frames"].append(len(res) // ch)
                    out["resampled"].append(
                        np.asarray(res, dtype="<i2").tobytes())
                except ValueError:
                    for k in ("n_channels", "sample_rate", "out_rate",
                              "n_frames", "resampled"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(work, RESAMPLED_AUDIO_SCHEMA)


#: Output schema of :func:`audio_resample_stats`.
AUDIO_RESAMPLE_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_rate", LongType()),
    StructField("out_rate", LongType()),
    StructField("n_frames", LongType()),
    StructField("n_samples", LongType()),
    StructField("sample_sum", LongType()),
])


def audio_resample_stats(df: DataFrame, binary_col: str, out_rate: int,
                         method: str = "nearest",
                         id_col: str = "doc_id") -> DataFrame:
    """Decode + resample + exact integer sample sum in ONE Python
    stage — the verification face of :func:`resample_audio` (same
    decode and resample code paths)."""
    slim = df.select(F.col(id_col), F.col(binary_col))

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "sample_rate": [], "out_rate": [],
                   "n_frames": [], "n_samples": [], "sample_sum": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    ch, rate, _bits, samples = decode_wav(bytes(p))
                    res = resample_samples(samples, ch, rate, out_rate,
                                           method)
                    out["sample_rate"].append(rate)
                    out["out_rate"].append(out_rate)
                    out["n_frames"].append(len(res) // ch)
                    out["n_samples"].append(len(res))
                    out["sample_sum"].append(sum(res))
                except ValueError:
                    for k in ("sample_rate", "out_rate", "n_frames",
                              "n_samples", "sample_sum"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(stats, AUDIO_RESAMPLE_STATS_SCHEMA)


#: Output schema of :func:`video_frame_pipeline` — one row per KEPT
#: frame; undecodable containers yield one NULL-stats row.
FRAME_PIPELINE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_id", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("out_width", LongType()),
    StructField("out_height", LongType()),
    StructField("n_samples", LongType()),
    StructField("sample_sum", LongType()),
])


def video_frame_pipeline(df: DataFrame, binary_col: str,
                         out_width: int, out_height: int,
                         every_k: int = 1, method: str = "nearest",
                         id_col: str = "doc_id") -> DataFrame:
    """The full multimodal video chain — demux + every-k frame
    sampling + per-frame resize to a uniform shape — in ONE Arrow
    ``mapInPandas`` stage (decode cost amortized per batch, no
    intermediate pixel buffers shuffled).  One output row per kept
    frame with the resized frame's exact integer sample sum;
    undecodable containers yield a single NULL-stats row."""
    slim = df.select(F.col(id_col), F.col(binary_col))

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_id": [], "width": [],
                   "height": [], "out_width": [], "out_height": [],
                   "n_samples": [], "sample_sum": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                try:
                    w, h, frames = decode_avi(bytes(p), every_k)
                    for idx, samples in frames:
                        resized = resize_samples(
                            samples, w, h, 3, out_width, out_height,
                            method)
                        out["doc_id"].append(did)
                        out["frame_id"].append(idx)
                        out["width"].append(w)
                        out["height"].append(h)
                        out["out_width"].append(out_width)
                        out["out_height"].append(out_height)
                        out["n_samples"].append(len(resized))
                        out["sample_sum"].append(sum(resized))
                except (ValueError, IndexError):
                    out["doc_id"].append(did)
                    for k in ("frame_id", "width", "height",
                              "out_width", "out_height", "n_samples",
                              "sample_sum"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(work, FRAME_PIPELINE_SCHEMA)


# -- EXIF / TIFF metadata (stdlib only) --------------------------------------

#: IFD0 tags a curation pipeline actually filters/groups on.  Tag
#: 306 is TIFF DateTime — FILE MODIFICATION time, not capture time —
#: so it maps to ``modified_at``; true capture time is
#: DateTimeOriginal (0x9003) inside the Exif sub-IFD reached through
#: the ExifIFD pointer (0x8769), parsed separately below.
_EXIF_TAGS = {256: "width", 257: "height", 271: "make",
              272: "model", 274: "orientation", 306: "modified_at"}

#: Exif sub-IFD (pointed to by tag 0x8769) tags
_EXIF_SUBIFD_TAGS = {36867: "taken_at"}       # 0x9003 DateTimeOriginal

_EXIF_IFD_POINTER = 34665                     # 0x8769 ExifIFD


def _parse_ifd(payload: bytes, end: str, ifd_off: int, tags: dict,
               out: dict) -> int:
    """Walk one IFD, writing recognised ``tags`` into ``out``;
    returns the ExifIFD pointer if the IFD carries one, else 0."""
    if ifd_off + 2 > len(payload):
        raise ValueError("ifd offset out of range")
    (n,) = struct.unpack(end + "H", payload[ifd_off:ifd_off + 2])
    pos = ifd_off + 2
    sub_off = 0
    for _ in range(n):
        if pos + 12 > len(payload):
            raise ValueError("truncated ifd entry")
        tag, typ, cnt = struct.unpack(end + "HHI", payload[pos:pos + 8])
        raw = payload[pos + 8:pos + 12]
        if tag == _EXIF_IFD_POINTER and typ == 4 and cnt == 1:
            (sub_off,) = struct.unpack(end + "I", raw)
        name = tags.get(tag)
        if name is not None:
            if typ == 3 and cnt == 1:                       # SHORT
                out[name] = struct.unpack(end + "H", raw[:2])[0]
            elif typ == 4 and cnt == 1:                     # LONG
                out[name] = struct.unpack(end + "I", raw)[0]
            elif typ == 2:                                  # ASCII
                if cnt <= 4:
                    data = raw[:cnt]
                else:
                    (off,) = struct.unpack(end + "I", raw)
                    if off + cnt > len(payload):
                        raise ValueError("ascii value out of range")
                    data = payload[off:off + cnt]
                out[name] = data.split(b"\x00", 1)[0] \
                    .decode("ascii", "replace")
        pos += 12
    return sub_off


def parse_tiff_exif(payload: bytes) -> dict:
    """Parse a TIFF header + IFD0 (the container EXIF lives in —
    CIPA DC-008 / TIFF 6.0): both byte orders (``II``/``MM``),
    SHORT/LONG/ASCII entry types, inline vs offset-addressed values,
    and the ExifIFD pointer (0x8769) followed into the Exif sub-IFD
    for DateTimeOriginal.  ``taken_at`` is DateTimeOriginal when the
    sub-IFD carries it, else falls back to IFD0's DateTime (exiftool
    precedence); ``modified_at`` is always IFD0 DateTime.  Returns
    the fields found plus ``endian``; raises ``ValueError`` on
    anything malformed or out of range — callers quarantine to a
    NULL row, never crash the stage."""
    if len(payload) < 8:
        raise ValueError("truncated tiff header")
    bom = payload[:2]
    if bom == b"II":
        end = "<"
    elif bom == b"MM":
        end = ">"
    else:
        raise ValueError("bad byte-order mark")
    (magic,) = struct.unpack(end + "H", payload[2:4])
    if magic != 42:
        raise ValueError("bad tiff magic")
    (ifd_off,) = struct.unpack(end + "I", payload[4:8])
    out = {"endian": bom.decode("ascii")}
    sub_off = _parse_ifd(payload, end, ifd_off, _EXIF_TAGS, out)
    if sub_off:
        _parse_ifd(payload, end, sub_off, _EXIF_SUBIFD_TAGS, out)
    if "taken_at" not in out and "modified_at" in out:
        out["taken_at"] = out["modified_at"]
    return out


def parse_exif(payload: bytes):
    """EXIF from a standalone TIFF or from a JPEG's APP1 ``Exif``
    segment (marker walk — segment lengths, standalone RSTn/TEM
    markers skipped).  Returns ``(container, fields)``."""
    if payload[:2] in (b"II", b"MM"):
        return "tiff", parse_tiff_exif(payload)
    if payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("bad jpeg marker stream")
            marker = payload[pos + 1]
            if marker == 0xD9:                              # EOI
                break
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            seglen = int.from_bytes(payload[pos + 2:pos + 4], "big")
            if seglen < 2 or pos + 2 + seglen > len(payload):
                raise ValueError("bad segment length")
            seg = payload[pos + 4:pos + 2 + seglen]
            if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
                return "jpeg", parse_tiff_exif(seg[6:])
            pos += 2 + seglen
        raise ValueError("no exif app1 segment")
    raise ValueError("not a tiff or jpeg payload")


EXIF_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("container", StringType()),
    StructField("endian", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("orientation", LongType()),
    StructField("make", StringType()),
    StructField("model", StringType()),
    StructField("taken_at", StringType()),
    StructField("modified_at", StringType()),
])

_EXIF_OUT_COLS = ("container", "endian", "width", "height",
                  "orientation", "make", "model", "taken_at",
                  "modified_at")


def exif_metadata(df: DataFrame, binary_col: str,
                  id_col: str = "doc_id") -> DataFrame:
    """EXIF triage over an image binary column: dimensions,
    orientation, camera make/model and capture time from IFD0 of a
    TIFF or a JPEG APP1 segment — what an image-curation pipeline
    groups, filters and dedups on before any pixel decode.  NULL row
    on undecodable input (quarantine, never a stage failure).

    Arrow-batched ``mapInPandas`` over a slim (id, payload)
    projection — the designated Python escape hatch; one narrow
    stage, no shuffle."""
    slim = df.select(F.col(id_col), F.col(binary_col))

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": []}
            out.update({k: [] for k in _EXIF_OUT_COLS})
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    container, fields = parse_exif(bytes(p))
                    out["container"].append(container)
                    out["endian"].append(fields.get("endian"))
                    for k in ("width", "height", "orientation",
                              "make", "model", "taken_at",
                              "modified_at"):
                        out[k].append(fields.get(k))
                except ValueError:
                    for k in _EXIF_OUT_COLS:
                        out[k].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(meta, EXIF_META_SCHEMA)


# -- ID3v2 audio metadata (stdlib only) --------------------------------------

#: the ID3v2 text frames a curation pipeline actually uses
_ID3_FRAMES = {"TIT2": "title", "TPE1": "artist", "TALB": "album"}


def parse_id3(payload: bytes) -> dict:
    """Parse an ID3v2.3/2.4 tag header + text frames (ISO 14496-style
    MP3 metadata, informal spec id3.org): syncsafe tag size, plain
    (v2.3) or syncsafe (v2.4) frame sizes, latin-1 (encoding 0) and
    UTF-16-with-BOM (encoding 1) text payloads, NUL-terminated.
    Returns ``version``, ``n_frames`` and the :data:`_ID3_FRAMES`
    fields found; raises ``ValueError`` on malformed input."""
    if len(payload) < 10 or payload[:3] != b"ID3":
        raise ValueError("no id3v2 header")
    ver = payload[3]
    if ver not in (3, 4):
        raise ValueError(f"unsupported id3v2.{ver}")
    if any(b & 0x80 for b in payload[6:10]):
        raise ValueError("tag size not syncsafe")
    size = ((payload[6] << 21) | (payload[7] << 14)
            | (payload[8] << 7) | payload[9])
    end = min(10 + size, len(payload))
    out = {"version": ver, "n_frames": 0}
    pos = 10
    while pos + 10 <= end:
        fid = payload[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":          # padding
            break
        if not all(65 <= c <= 90 or 48 <= c <= 57 for c in fid):
            raise ValueError("bad frame id")
        if ver == 4:
            if any(b & 0x80 for b in payload[pos + 4:pos + 8]):
                raise ValueError("frame size not syncsafe")
            fsize = ((payload[pos + 4] << 21) | (payload[pos + 5] << 14)
                     | (payload[pos + 6] << 7) | payload[pos + 7])
        else:
            fsize = int.from_bytes(payload[pos + 4:pos + 8], "big")
        if pos + 10 + fsize > end:
            raise ValueError("frame overruns tag")
        body = payload[pos + 10:pos + 10 + fsize]
        out["n_frames"] += 1
        name = _ID3_FRAMES.get(fid.decode("ascii"))
        if name is not None and fsize >= 1:
            enc, text = body[0], body[1:]
            if enc == 0:
                out[name] = text.split(b"\x00", 1)[0] \
                    .decode("latin-1")
            elif enc == 1:
                # the UTF-16 terminator is a 0x0000 CODE UNIT: scan
                # only even offsets, else a 0x00 byte pair spanning
                # two units (e.g. 'a' 61 00 + U+6100 00 61) splits
                # mid-character and mangles the decode
                raw = text
                for i in range(0, len(text) - 1, 2):
                    if text[i] == 0 and text[i + 1] == 0:
                        raw = text[:i]
                        break
                if len(raw) % 2:        # unterminated odd payload
                    raw = raw[:-1]
                out[name] = raw.decode("utf-16")
            else:
                raise ValueError(f"unsupported text encoding {enc}")
        pos += 10 + fsize
    return out


ID3_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("version", LongType()),
    StructField("n_frames", LongType()),
    StructField("title", StringType()),
    StructField("artist", StringType()),
    StructField("album", StringType()),
])


def id3_metadata(df: DataFrame, binary_col: str,
                 id_col: str = "doc_id") -> DataFrame:
    """ID3v2 triage over an MP3-style binary column: tag version,
    frame count and title/artist/album — the audio-curation analogue
    of :func:`exif_metadata`.  NULL row on undecodable input.
    Arrow-batched ``mapInPandas``, one narrow stage, no shuffle."""
    slim = df.select(F.col(id_col), F.col(binary_col))

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "version": [], "n_frames": [],
                   "title": [], "artist": [], "album": []}
            for did, p in zip(pdf[id_col], pdf[binary_col]):
                out["doc_id"].append(did)
                try:
                    got = parse_id3(bytes(p))
                    for k in ("version", "n_frames", "title",
                              "artist", "album"):
                        out[k].append(got.get(k))
                except ValueError:
                    for k in ("version", "n_frames", "title",
                              "artist", "album"):
                        out[k].append(None)
            yield pd.DataFrame(out)

    return slim.mapInPandas(meta, ID3_META_SCHEMA)
