"""pipeline.codecs: dependency-free PPM/BMP/WAV parsers (r11) —
round-trip properties, spec corner cases (comments, padding,
bottom-up rows, chunk walking), and error paths."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zef_spark.pipeline.codecs import (decode_bmp, decode_ppm, decode_wav,
                                       encode_bmp, encode_ppm, encode_wav,
                                       sniff_codec)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 9), st.integers(1, 7), st.integers(0, 10 ** 9))
def test_ppm_roundtrip(w, h, seed):
    rgb = bytes((seed + 31 * j) % 256 for j in range(w * h * 3))
    assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 9), st.integers(1, 7), st.integers(0, 10 ** 9))
def test_bmp_roundtrip(w, h, seed):
    # widths 1..9 cover all four row-padding residues
    rgb = bytes((seed + 17 * j) % 256 for j in range(w * h * 3))
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip(samples, sr):
    assert decode_wav(encode_wav(samples, sr)) == (sr, 1, samples)


def test_ppm_header_comments_and_whitespace():
    raw = b"P6\n# a comment\n 3\t2 # another\n255\n" + bytes(range(18))
    assert decode_ppm(raw) == (3, 2, bytes(range(18)))


def test_bmp_top_down():
    # negative height = top-down row order; decoder must NOT flip
    w, h = 2, 2
    rgb = bytes(range(12))
    data = bytearray(encode_bmp(w, h, rgb))
    # encoded bottom-up: flip the two 8-byte strides (2px*3B + 2 pad)
    off = struct.unpack_from("<I", data, 10)[0]
    stride = 8
    rows = [bytes(data[off + i * stride:off + (i + 1) * stride])
            for i in range(h)]
    data[off:off + 2 * stride] = rows[1] + rows[0]
    struct.pack_into("<i", data, 22, -h)
    assert decode_bmp(bytes(data)) == (w, h, rgb)


def test_wav_chunk_walk():
    # a LIST chunk (odd size → word alignment) before fmt/data
    wav = encode_wav([1, -2, 3], 8000)
    body = wav[12:]
    injected = (wav[:12] + b"LIST" + struct.pack("<I", 5) + b"INFOx\x00"
                + body)
    injected = (injected[:4]
                + struct.pack("<I", len(injected) - 8) + injected[8:])
    assert decode_wav(injected) == (8000, 1, [1, -2, 3])


def test_error_paths():
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")  # P5 is not P6
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00AVI ")
    with pytest.raises(ValueError):
        encode_wav([40000])  # out of int16 range
    with pytest.raises(ValueError):
        encode_ppm(2, 2, b"\x00" * 5)  # wrong byte count
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n4 4\n255\n\x00\x00")  # truncated raster


def test_sniff():
    assert sniff_codec(encode_ppm(1, 1, b"\x01\x02\x03")) == "ppm"
    assert sniff_codec(encode_bmp(1, 1, b"\x01\x02\x03")) == "bmp"
    assert sniff_codec(encode_wav([0])) == "wav"
    assert sniff_codec(b"\x89PNG\r\n") is None
