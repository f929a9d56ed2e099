"""Property-based roundtrips for the stdlib codecs: ANY random image /
audio content survives encode→decode bit-exactly (hypothesis drives
dimensions, channel layouts, filter choices and sample content).

Pure-Python properties (no SparkSession) — the Spark-side operators are
covered in test_llm.py; these hammer the decoders themselves.
"""

from hypothesis import given, settings, strategies as st

from cubes_spark.llm.multimodal import (
    decode_bmp,
    decode_gif,
    decode_png,
    decode_wav,
)
from tests.test_llm import (
    _encode_bmp,
    _encode_gif,
    _encode_png,
    _encode_wav,
)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24), h=st.integers(1, 24),
    channels=st.sampled_from([1, 2, 3, 4]),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=6),
    data=st.data(),
)
def test_png_roundtrip_property(w, h, channels, filters, data):
    n = w * h * channels
    samples = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=n, max_size=n)))
    gw, gh, gch, got = decode_png(
        _encode_png(w, h, channels, samples, filters))
    assert (gw, gh, gch, got) == (w, h, channels, samples)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24), h=st.integers(1, 24),
    min_code=st.sampled_from([2, 4, 8]),
    interlace=st.booleans(),
    data=st.data(),
)
def test_gif_roundtrip_property(w, h, min_code, interlace, data):
    n = w * h
    top = (1 << min_code) - 1
    indices = bytes(data.draw(st.lists(
        st.integers(0, top), min_size=n, max_size=n)))
    palette_bits = max(min_code, 1)
    gw, gh, got, _pal = decode_gif(_encode_gif(
        w, h, indices, min_code_size=min_code, interlace=interlace,
        palette_bits=palette_bits))
    assert (gw, gh, got) == (w, h, indices)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 16), h=st.integers(1, 16),
    bpp=st.sampled_from([8, 24]),
    top_down=st.booleans(),
    data=st.data(),
)
def test_bmp_roundtrip_property(w, h, bpp, top_down, data):
    n = w * h * (3 if bpp == 24 else 1)
    samples = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=n, max_size=n)))
    gw, gh, _ch, got, _pal = decode_bmp(
        _encode_bmp(w, h, bpp, samples, top_down=top_down))
    assert (gw, gh, got) == (w, h, samples)


@settings(max_examples=40, deadline=None)
@given(
    channels=st.integers(1, 2),
    rate=st.sampled_from([8000, 22050, 44100]),
    bits=st.sampled_from([8, 16]),
    data=st.data(),
)
def test_wav_roundtrip_property(channels, rate, bits, data):
    lo, hi = (-128, 127) if bits == 8 else (-32768, 32767)
    samples = data.draw(st.lists(st.integers(lo, hi),
                                 min_size=1, max_size=300))
    ch, grate, gbits, got = decode_wav(
        _encode_wav(channels, rate, bits, samples))
    assert (ch, grate, gbits) == (channels, rate, bits)
    assert got == samples
