"""AVI demux + uncompressed-frame decode tests — real container
encoder counterpart (RIFF hdrl/strl/strf/movi, word alignment)."""

import struct

import pytest

from cubes_spark.llm.multimodal import avi_frame_stats, decode_avi


def _chunk(cid, data):
    pad = b"\x00" if len(data) & 1 else b""
    return cid + struct.pack("<I", len(data)) + data + pad


def _list(ltype, body):
    return _chunk(b"LIST", ltype + body)


def encode_avi(width, height, frames_rgb, top_down=False,
               extra_chunk=False):
    """Minimal real AVI: BI_RGB 24-bit DIB frames, bottom-up padded
    rows (like BMP), one video stream."""
    stride = (width * 3 + 3) // 4 * 4
    payloads = []
    for rgb in frames_rgb:
        rows = []
        for y in range(height):
            row = bytearray()
            for x in range(width):
                r, g, b = rgb[3 * (y * width + x):3 * (y * width + x) + 3]
                row += bytes((b, g, r))
            row += bytes(stride - len(row))
            rows.append(bytes(row))
        if not top_down:
            rows.reverse()
        payloads.append(b"".join(rows))

    strf = struct.pack("<IiiHHIIiiII", 40, width,
                       -height if top_down else height,
                       1, 24, 0, stride * height, 0, 0, 0, 0)
    strh = b"vids" + b"DIB " + bytes(48)
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    avih = struct.pack("<IIIIIIIIIIIIII", 33367, 0, 0, 0,
                       len(frames_rgb), 0, 1, 0, width, height,
                       0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi_body = b""
    if extra_chunk:
        movi_body += _chunk(b"00tx", b"subtitle!")    # odd-size chunk
    for p in payloads:
        movi_body += _chunk(b"00db", p)
    movi = _list(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _rgb(width, height, seed):
    return bytes(((seed * 13 + i * 7) % 256)
                 for i in range(width * height * 3))


def test_avi_demux_roundtrip():
    w, h = 6, 4
    frames = [_rgb(w, h, s) for s in range(5)]
    for top_down in (False, True):
        gw, gh, got = decode_avi(
            encode_avi(w, h, frames, top_down=top_down))
        assert (gw, gh) == (w, h)
        assert [i for i, _ in got] == [0, 1, 2, 3, 4]
        assert [s for _, s in got] == frames


def test_avi_frame_sampling_and_extra_chunks():
    w, h = 5, 3
    frames = [_rgb(w, h, s) for s in range(7)]
    gw, gh, got = decode_avi(
        encode_avi(w, h, frames, extra_chunk=True), every_k=3)
    assert (gw, gh) == (w, h)
    assert [i for i, _ in got] == [0, 3, 6]
    assert [s for _, s in got] == [frames[0], frames[3], frames[6]]


def test_avi_rejects_compressed_and_garbage():
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    good = bytearray(encode_avi(4, 4, [_rgb(4, 4, 1)]))
    at = bytes(good).index(b"strf") + 8 + 16
    good[at:at + 4] = b"MJPG"                 # compressed fourcc
    with pytest.raises(ValueError):
        decode_avi(bytes(good))


def test_avi_frame_stats(spark):
    w, h = 4, 4
    frames = {1: [_rgb(w, h, 3), _rgb(w, h, 9)], 2: [_rgb(w, h, 5)]}
    rows = [(did, encode_avi(w, h, fs)) for did, fs in frames.items()]
    rows.append((3, b"RIFF\x08\x00\x00\x00AVI corrupted"))
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    out = avi_frame_stats(df, "payload").collect()
    by_key = {(r["doc_id"], r["frame_id"]): r for r in out}
    for did, fs in frames.items():
        for idx, rgb in enumerate(fs):
            r = by_key[(did, idx)]
            assert r["n_samples"] == w * h * 3
            assert r["sample_sum"] == sum(rgb)
    assert by_key[(3, None)]["sample_sum"] is None


def _ebml(eid, body):
    """Encode one EBML element: ID bytes as conventionally written +
    shortest-form size varint + body."""
    id_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(body)
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            size = (n | (1 << (7 * length))).to_bytes(length, "big")
            break
    return id_bytes + size + body


def encode_mkv(tracks, timestamp_scale=None):
    """Minimal real Matroska: EBML header + Segment(Info?, Tracks)."""
    header = _ebml(0x1A45DFA3, _ebml(0x4282, b"matroska"))
    body = b""
    if timestamp_scale is not None:
        body += _ebml(0x1549A966, _ebml(
            0x2AD7B1,
            timestamp_scale.to_bytes(
                (timestamp_scale.bit_length() + 7) // 8, "big")))
    entries = b""
    for ttype, codec in tracks:
        entries += _ebml(0xAE, _ebml(0x83, bytes([ttype]))
                         + _ebml(0x86, codec.encode()))
    body += _ebml(0x1654AE6B, entries)
    return header + _ebml(0x18538067, body)


def test_matroska_tracks():
    from cubes_spark.llm.multimodal import matroska_tracks

    scale, tracks = matroska_tracks(encode_mkv(
        [(1, "V_VP9"), (2, "A_OPUS"), (17, "S_TEXT/UTF8")],
        timestamp_scale=500000))
    assert scale == 500000
    assert tracks == [(1, "V_VP9"), (2, "A_OPUS"), (17, "S_TEXT/UTF8")]

    scale, tracks = matroska_tracks(encode_mkv([(2, "A_AAC")]))
    assert scale == 1000000            # default
    assert tracks == [(2, "A_AAC")]

    import pytest

    with pytest.raises(ValueError):
        matroska_tracks(b"RIFFnot ebml")


def test_matroska_metadata(spark):
    from cubes_spark.llm.multimodal import matroska_metadata

    rows = [
        (1, encode_mkv([(1, "V_AV1"), (2, "A_OPUS"), (2, "A_VORBIS")])),
        (2, encode_mkv([(17, "S_TEXT/ASS")], timestamp_scale=250000)),
        (3, b"\x1A\x45\xDF\xA3garbage\xff\xff"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    meta = {r["doc_id"]: r for r in
            matroska_metadata(df, "payload").collect()}
    assert meta[1]["n_video"] == 1
    assert meta[1]["n_audio"] == 2
    assert meta[1]["codec_ids"] == "V_AV1,A_OPUS,A_VORBIS"
    assert meta[2]["n_subtitle"] == 1
    assert meta[2]["timestamp_scale"] == 250000


def test_video_frame_pipeline(spark):
    """Demux + every-k sampling + per-frame nearest resize in one
    stage: kept frames come back at the uniform target shape with
    sums matching an independently decoded + resized reference;
    corrupt rows yield one NULL row."""
    from cubes_spark.llm import video_frame_pipeline
    from cubes_spark.llm.multimodal import resize_samples

    w, h = 5, 4
    frames = [_rgb(w, h, s) for s in (1, 2, 3, 4, 5)]
    rows = [(1, encode_avi(w, h, frames)),
            (2, b"RIFFxxxxAVI corrupt")]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    got = video_frame_pipeline(df, "payload", 3, 2, every_k=2,
                               method="nearest").collect()
    by_frame = {(r["doc_id"], r["frame_id"]): r for r in got}
    assert set(by_frame) == {(1, 0), (1, 2), (1, 4), (2, None)}
    for fid in (0, 2, 4):
        r = by_frame[(1, fid)]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["out_width"], r["out_height"], r["n_samples"]) == (3, 2, 18)
        expect = resize_samples(frames[fid], w, h, 3, 3, 2, "nearest")
        assert r["sample_sum"] == sum(expect)
    assert by_frame[(2, None)]["sample_sum"] is None
