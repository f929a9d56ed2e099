"""Baseline-JPEG decoder tests: a REAL test-side encoder (forward DCT,
quantization, Annex-K Huffman tables, bit stuffing) produces streams
the repo decoder must reconstruct — exactly for flat/DC-only images,
within quantization tolerance for textured ones."""

import pytest

from cubes_spark.llm.multimodal import (
    AC_BITS,
    AC_VALS,
    DC_BITS,
    DC_VALS,
    _BitWriter,
    _encode_block,
    decode_jpeg,
    encode_jpeg,
)


def test_jpeg_flat_gray_exact():
    for v in (0, 57, 128, 200, 255):
        w, h = 8, 8
        payload = encode_jpeg(w, h, [bytes([v]) * (w * h)])
        gw, gh, nc, planes = decode_jpeg(payload)
        assert (gw, gh, nc) == (w, h, 1)
        assert set(planes[0]) == {v}


def test_jpeg_multi_block_dc_levels():
    # 16x8: two horizontal blocks with different flat values
    w, h = 16, 8
    plane = bytearray(w * h)
    for y in range(h):
        for x in range(w):
            plane[y * w + x] = 64 if x < 8 else 192
    gw, gh, nc, planes = decode_jpeg(encode_jpeg(w, h, [bytes(plane)]))
    assert (gw, gh, nc) == (w, h, 1)
    assert planes[0] == bytes(plane)


def test_jpeg_gradient_close():
    w, h = 24, 16
    plane = bytes(((x * 7 + y * 5) % 200 + 20)
                  for y in range(h) for x in range(w))
    gw, gh, nc, planes = decode_jpeg(encode_jpeg(w, h, [plane]))
    assert (gw, gh) == (w, h)
    err = max(abs(a - b) for a, b in zip(planes[0], plane))
    assert err <= 2, err


def test_jpeg_three_components_and_odd_size():
    w, h = 11, 5                       # forces edge-replicated blocks
    planes = [
        bytes(((37 * c + x * 3 + y * 9) % 256)
              for y in range(h) for x in range(w))
        for c in range(3)
    ]
    gw, gh, nc, got = decode_jpeg(encode_jpeg(w, h, planes))
    assert (gw, gh, nc) == (w, h, 3)
    for c in range(3):
        err = max(abs(a - b) for a, b in zip(got[c], planes[c]))
        assert err <= 2, (c, err)


def test_jpeg_rejects_non_baseline():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not jpeg")
    payload = bytearray(encode_jpeg(8, 8, [bytes(64)]))
    sof_at = payload.index(b"\xFF\xC0")
    for marker in (0xC3, 0xC9):        # lossless, arithmetic-coded
        payload[sof_at + 1] = marker
        with pytest.raises(ValueError):
            decode_jpeg(bytes(payload))


def encode_jpeg_420(width, height, y_plane, cb_half, cr_half):
    """Baseline encoder with 4:2:0 sampling: Y at (2,2), chroma at
    (1,1) — one 16×16 MCU = 4 Y blocks + 1 Cb + 1 Cr, chroma fed at
    half resolution."""
    cw, ch = (width + 1) // 2, (height + 1) // 2
    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xDB" + (2 + 65).to_bytes(2, "big") + b"\x00" \
        + bytes([1] * 64)
    sof = bytes([8]) + height.to_bytes(2, "big") \
        + width.to_bytes(2, "big") + bytes([3])
    sof += bytes([1, 0x22, 0])         # Y: h=2 v=2
    sof += bytes([2, 0x11, 0])         # Cb
    sof += bytes([3, 0x11, 0])         # Cr
    out += b"\xFF\xC0" + (2 + len(sof)).to_bytes(2, "big") + sof
    dht = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    out += b"\xFF\xC4" + (2 + len(dht)).to_bytes(2, "big") + dht
    dht = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    out += b"\xFF\xC4" + (2 + len(dht)).to_bytes(2, "big") + dht
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    out += b"\xFF\xDA" + (2 + len(sos)).to_bytes(2, "big") + sos

    def block_at(plane, pw, ph, bx, by):
        blk = []
        for y in range(8):
            sy = min(by * 8 + y, ph - 1)
            for x in range(8):
                sx = min(bx * 8 + x, pw - 1)
                blk.append(plane[sy * pw + sx])
        return blk

    writer = _BitWriter()
    preds = [0, 0, 0]
    mcux = (width + 15) // 16
    mcuy = (height + 15) // 16
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):
                for bx in range(2):
                    preds[0] = _encode_block(
                        writer,
                        block_at(y_plane, width, height,
                                 mx * 2 + bx, my * 2 + by),
                        preds[0])
            preds[1] = _encode_block(
                writer, block_at(cb_half, cw, ch, mx, my), preds[1])
            preds[2] = _encode_block(
                writer, block_at(cr_half, cw, ch, mx, my), preds[2])
    writer.flush()
    out += writer.out + b"\xFF\xD9"
    return bytes(out)


def test_jpeg_420_subsampling():
    w, h = 20, 12
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y_plane = bytes(((x * 6 + y * 4) % 180 + 30)
                    for y in range(h) for x in range(w))
    cb = bytes([90]) * (cw * ch)
    cr = bytes([161]) * (cw * ch)
    payload = encode_jpeg_420(w, h, y_plane, cb, cr)
    gw, gh, nc, planes = decode_jpeg(payload)
    assert (gw, gh, nc) == (w, h, 3)
    # luma within quantization tolerance
    err = max(abs(a - b) for a, b in zip(planes[0], y_plane))
    assert err <= 2, err
    # flat chroma reconstructs exactly and fully upsampled
    assert set(planes[1]) == {90}
    assert set(planes[2]) == {161}


def test_jpeg_pixel_stats(spark):
    from cubes_spark.llm.multimodal import jpeg_pixel_stats

    imgs = {1: (16, 8, 77), 2: (8, 8, 200)}
    rows = [(did, encode_jpeg(w, h, [bytes([v]) * (w * h)]))
            for did, (w, h, v) in imgs.items()]
    rows.append((3, b"\xFF\xD8garbage"))
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    stats = {r["doc_id"]: r for r in
             jpeg_pixel_stats(df, "payload").collect()}
    for did, (w, h, v) in imgs.items():
        assert stats[did]["width"] == w
        assert stats[did]["height"] == h
        assert stats[did]["n_samples"] == w * h
        assert stats[did]["sample_sum"] == v * w * h
    assert stats[3]["sample_sum"] is None


def test_jpeg_restart_intervals():
    """DRI + RSTn markers: DC predictors reset at each restart."""
    import struct

    w, h = 32, 8                      # 4 MCUs, restart every 2
    plane = bytearray()
    for y in range(h):
        for x in range(w):
            plane.append(50 + (x // 8) * 40)
    payload = bytearray(encode_jpeg(w, h, [bytes(plane)]))
    # re-encode manually with DRI=2: splice a DRI segment before SOS
    # and rebuild the scan with restarts
    sos_at = payload.index(b"\xFF\xDA")
    head = bytes(payload[:sos_at])
    sos_len = struct.unpack(">H", payload[sos_at + 2:sos_at + 4])[0]
    sos_seg = bytes(payload[sos_at:sos_at + 2 + sos_len])
    writer = _BitWriter()
    chunks = []
    pred = 0
    for bx in range(4):
        block = []
        for y in range(8):
            for x in range(8):
                block.append(plane[y * w + bx * 8 + x])
        pred = _encode_block(writer, block, pred)
        if bx % 2 == 1 and bx < 3:
            writer.flush()
            chunks.append(bytes(writer.out))
            writer = _BitWriter()
            pred = 0                   # predictors reset at restart
    writer.flush()
    chunks.append(bytes(writer.out))
    scan = chunks[0] + b"\xFF\xD0" + chunks[1]
    dri = b"\xFF\xDD" + struct.pack(">HH", 4, 2)
    stream = head + dri + sos_seg + scan + b"\xFF\xD9"
    gw, gh, nc, planes = decode_jpeg(stream)
    assert (gw, gh, nc) == (w, h, 1)
    assert planes[0] == bytes(plane)


def test_decode_features_all_codecs(spark):
    """decode_features resolves every stdlib codec for real — feature
    vectors are strip means of the decoded samples."""
    from cubes_spark.llm.multimodal import decode_features
    from tests.test_llm import _encode_bmp, _encode_gif, _encode_png, \
        _encode_wav

    w, h = 8, 8
    flat = bytes([120]) * (w * h)
    rows = [
        (1, _encode_png(w, h, 1, flat)),
        (2, _encode_gif(w, h, flat)),
        (3, _encode_bmp(w, h, 8, flat)),
        (4, encode_jpeg(w, h, [flat])),
        (5, _encode_wav(1, 8000, 16, [1000] * 64)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    feats = {r["doc_id"]: r["features"] for r in
             decode_features(df, "payload", dim=4).collect()}
    for did in (1, 2, 3, 4):
        assert feats[did] == pytest.approx([120 / 255.0] * 4), did
    assert feats[5] == pytest.approx([1000 / 32768.0] * 4)


def test_jpeg_flat_tiles_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        tiles_x=st.integers(1, 3), tiles_y=st.integers(1, 2),
        values=st.lists(st.integers(0, 255), min_size=6, max_size=6),
    )
    def check(tiles_x, tiles_y, values):
        w, h = tiles_x * 8, tiles_y * 8
        plane = bytearray(w * h)
        for y in range(h):
            for x in range(w):
                plane[y * w + x] = values[(y // 8) * tiles_x + x // 8]
        gw, gh, nc, planes = decode_jpeg(
            encode_jpeg(w, h, [bytes(plane)]))
        assert (gw, gh, nc) == (w, h, 1)
        assert planes[0] == bytes(plane)

    check()


# -- progressive (SOF2) -----------------------------------------------------

def _prog_container(width, height, scan_blobs):
    """Grayscale SOF2 container: quant=1 DQT, Annex-K DHTs, then the
    given (sos_params, entropy_bytes) scans."""
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
    for (ss, se, ah, al), blob in scan_blobs:
        sos = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        out += b"\xFF\xDA" + (2 + len(sos)).to_bytes(2, "big") + sos
        out += blob
    out += b"\xFF\xD9"
    return bytes(out)


def _zz_blocks(width, height, plane):
    """Per-block zigzag coefficient arrays (quant 1), edge-replicated
    — the same block shaping as encode_jpeg."""
    import math

    from cubes_spark.llm.multimodal import _JPEG_ZIGZAG, _fdct

    blocks = []
    for by in range((height + 7) // 8):
        for bx in range((width + 7) // 8):
            block = []
            for y in range(8):
                sy = min(by * 8 + y, height - 1)
                for x in range(8):
                    sx = min(bx * 8 + x, width - 1)
                    block.append(plane[sy * width + sx])
            co = _fdct([s - 128 for s in block])
            q = [int(round(c)) for c in co]
            blocks.append([q[_JPEG_ZIGZAG[k]] for k in range(64)])
    return blocks


def _encode_progressive_gray(width, height, plane):
    """Spectral-selection-only progressive encoder (test side): one DC
    scan (0,0,0,0) + one AC scan (1,63,0,0) with per-block EOBs."""
    from cubes_spark.llm.multimodal import _codes, _magnitude

    dc_code = _codes(DC_BITS, DC_VALS)
    ac_code = _codes(AC_BITS, AC_VALS)
    blocks = _zz_blocks(width, height, plane)

    w = _BitWriter()
    pred = 0
    for zz in blocks:
        t, bits = _magnitude(zz[0] - pred)
        pred = zz[0]
        length, code = dc_code[t]
        w.put(code, length)
        if t:
            w.put(bits, t)
    w.flush()
    dc_blob = bytes(w.out)

    w = _BitWriter()
    for zz in blocks:
        run = 0
        for k in range(1, 64):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                length, code = ac_code[0xF0]
                w.put(code, length)
                run -= 16
            t, bits = _magnitude(zz[k])
            length, code = ac_code[(run << 4) | t]
            w.put(code, length)
            w.put(bits, t)
            run = 0
        if run:
            length, code = ac_code[0x00]       # EOB (run of 1)
            w.put(code, length)
    w.flush()
    ac_blob = bytes(w.out)
    return _prog_container(width, height,
                           [((0, 0, 0, 0), dc_blob),
                            ((1, 63, 0, 0), ac_blob)])


def test_progressive_spectral_equals_baseline():
    # gradient image: progressive (DC scan + AC scan) must reconstruct
    # byte-identically to the baseline encoding (same coefficients)
    w, h = 19, 13
    plane = bytes(((x * 13 + y * 29) % 256)
                  for y in range(h) for x in range(w))
    base = decode_jpeg(encode_jpeg(w, h, [plane]))
    prog = decode_jpeg(_encode_progressive_gray(w, h, plane))
    assert base[:3] == prog[:3] == (w, h, 1)
    assert base[3][0] == prog[3][0]


def test_progressive_flat_exact():
    for v in (0, 77, 255):
        w, h = 10, 9
        plane = bytes([v]) * (w * h)
        gw, gh, nc, planes = decode_jpeg(
            _encode_progressive_gray(w, h, plane))
        assert (gw, gh, nc) == (w, h, 1)
        assert set(planes[0]) == {v}


def test_progressive_successive_approximation():
    # hand-assembled 4-scan stream for one 8x8 block with zigzag
    # coefficients DC=5, c1=3, c5=1 (quant 1): DC first Al=1, DC
    # refine, AC first Al=1, AC refine — exercises every scan kind
    from cubes_spark.llm.multimodal import (
        _JPEG_ZIGZAG,
        _codes,
        _jpeg_idct,
        _magnitude,
    )

    dc_code = _codes(DC_BITS, DC_VALS)
    ac_code = _codes(AC_BITS, AC_VALS)

    def put(w, sym, table):
        length, code = table[sym]
        w.put(code, length)

    # scan 1: DC first, Al=1 -> send 5>>1 = 2
    w1 = _BitWriter()
    t, bits = _magnitude(2)
    put(w1, t, dc_code)
    w1.put(bits, t)
    w1.flush()
    # scan 2: DC refine -> bit 5&1 = 1
    w2 = _BitWriter()
    w2.put(1, 1)
    w2.flush()
    # scan 3: AC first, Al=1 -> c1: 3>>1=1 as (r=0,s=1); c5 invisible;
    # then EOB
    w3 = _BitWriter()
    put(w3, 0x01, ac_code)
    w3.put(1, 1)                    # magnitude bits for +1
    put(w3, 0x00, ac_code)          # EOB
    w3.flush()
    # scan 4: AC refine, Al=0 -> symbol (r=3, s=1) for c5, sign +,
    # then correction bit 1 for c1 crossed during the run, then EOB
    w4 = _BitWriter()
    put(w4, 0x31, ac_code)
    w4.put(1, 1)                    # sign: positive
    w4.put(1, 1)                    # correction bit for c1 (3 & 1)
    put(w4, 0x00, ac_code)          # EOB
    w4.flush()

    payload = _prog_container(8, 8, [
        ((0, 0, 0, 1), bytes(w1.out)),
        ((0, 0, 1, 0), bytes(w2.out)),
        ((1, 63, 0, 1), bytes(w3.out)),
        ((1, 63, 1, 0), bytes(w4.out)),
    ])
    gw, gh, nc, planes = decode_jpeg(payload)
    assert (gw, gh, nc) == (8, 8, 1)

    block = [0] * 64
    block[_JPEG_ZIGZAG[0]] = 5
    block[_JPEG_ZIGZAG[1]] = 3
    block[_JPEG_ZIGZAG[5]] = 1
    spatial = _jpeg_idct(block)
    expect = bytes(
        max(0, min(255, int(round(v)) + 128))) if False else bytes(
        max(0, min(255, int(round(v)) + 128)) for v in spatial)
    assert planes[0] == expect


def test_progressive_truncated_raises():
    w, h = 10, 9
    plane = bytes(((x + y) % 256) for y in range(h) for x in range(w))
    payload = _encode_progressive_gray(w, h, plane)
    with pytest.raises(ValueError):
        decode_jpeg(payload[:40])


def test_library_progressive_encoder_matches_baseline():
    from cubes_spark.llm.multimodal import encode_jpeg_progressive

    w, h = 21, 11
    plane = bytes(((x * 7 + y * 31) % 256)
                  for y in range(h) for x in range(w))
    base = decode_jpeg(encode_jpeg(w, h, [plane]))
    prog = decode_jpeg(encode_jpeg_progressive(w, h, plane))
    assert base[:3] == prog[:3] == (w, h, 1)
    assert base[3][0] == prog[3][0]


def test_library_progressive_flat_blocks_exact():
    from cubes_spark.llm.multimodal import encode_jpeg_progressive

    # per-block flat values decode exactly (DC-only, even DC coefs)
    w, h = 24, 16
    plane = bytearray(w * h)
    vals = {}
    for by in range(2):
        for bx in range(3):
            vals[(bx, by)] = (bx * 77 + by * 131 + 9) % 256
    for y in range(h):
        for x in range(w):
            plane[y * w + x] = vals[(x // 8, y // 8)]
    gw, gh, _nc, planes = decode_jpeg(
        encode_jpeg_progressive(w, h, bytes(plane)))
    assert (gw, gh) == (w, h)
    assert planes[0] == bytes(plane)
