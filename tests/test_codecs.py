"""pipeline.codecs: dependency-free PPM/BMP/WAV parsers (r11) —
round-trip properties, spec corner cases (comments, padding,
bottom-up rows, chunk walking), and error paths."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zef_spark.pipeline.codecs import (decode_bmp, decode_png,
                                       decode_ppm, decode_wav,
                                       encode_bmp, encode_png,
                                       encode_ppm, encode_wav,
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
    assert sniff_codec(encode_png(1, 1, b"\x01\x02\x03")) == "png"
    assert sniff_codec(b"\x89PNG\r\n") is None  # truncated signature


# ------------------------------------------------------------- PNG


def _png_from_raw(width, height, color, raw):
    """Wrap pre-filtered scanline bytes into a well-formed PNG —
    lets tests exercise every decode filter path independently of
    the (filter-0-only) encoder."""
    import zlib

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", crc))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _apply_filter(ftype, line, prev, nch):
    """FORWARD filter per the PNG spec (§9) — an independent
    implementation the decoder's unfilter must invert exactly."""
    out = bytearray([ftype])
    for i, x in enumerate(line):
        a = line[i - nch] if i >= nch else 0
        b = prev[i]
        c = prev[i - nch] if i >= nch else 0
        if ftype == 0:
            out.append(x)
        elif ftype == 1:
            out.append((x - a) & 0xFF)
        elif ftype == 2:
            out.append((x - b) & 0xFF)
        elif ftype == 3:
            out.append((x - ((a + b) >> 1)) & 0xFF)
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((x - pred) & 0xFF)
    return out


def test_png_roundtrip_rgb_rgba():
    rgb = bytes((x * 7 + 13) % 256 for x in range(8 * 6 * 3))
    assert decode_png(encode_png(8, 6, rgb)) == (8, 6, rgb)
    alpha = bytes((x * 11) % 256 for x in range(48))
    # alpha is carried in the file but dropped by decode (documented)
    assert decode_png(encode_png(8, 6, rgb, alpha=alpha)) == (8, 6, rgb)


def test_png_all_filter_types_invert():
    # 5 rows, one per filter type 0..4, forward-filtered by the
    # independent spec implementation above; decode must recover the
    # original raster exactly for RGB and RGBA layouts
    import random
    rnd = random.Random(12)
    for nch, color in ((3, 2), (4, 6)):
        w, h = 7, 5
        raster = [bytes(rnd.randrange(256) for _ in range(w * nch))
                  for _ in range(h)]
        raw = bytearray()
        prev = bytearray(w * nch)
        for y, line in enumerate(raster):
            raw += _apply_filter(y % 5, line, prev, nch)
            prev = bytearray(line)
        got = decode_png(_png_from_raw(w, h, color, raw))
        want = b"".join(
            bytes(line[nch * x + k] for x in range(w) for k in range(3))
            for line in raster) if nch == 4 else b"".join(raster)
        assert got == (w, h, want)


def test_png_grayscale_replicates():
    import zlib
    w, h = 4, 2
    gray = bytes(range(w * h))
    raw = bytearray()
    for y in range(h):
        raw += bytes([0]) + gray[y * w:(y + 1) * w]
    got = decode_png(_png_from_raw(w, h, 0, raw))
    assert got == (w, h, bytes(g for g in gray for _ in range(3)))
    # gray + alpha (color 4): alpha dropped, gray replicated
    raw = bytearray()
    for y in range(h):
        raw += bytes([0]) + bytes(
            b for g in gray[y * w:(y + 1) * w] for b in (g, 200))
    assert decode_png(_png_from_raw(w, h, 4, raw)) == \
        (w, h, bytes(g for g in gray for _ in range(3)))


def test_png_error_paths():
    rgb = b"\x00" * 12
    good = encode_png(2, 2, rgb)
    with pytest.raises(ValueError):
        decode_png(b"\x88PNG\r\n\x1a\n" + good[8:])  # bad signature
    # interlace byte flipped inside IHDR -> explicit rejection
    import zlib
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    bad = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
           + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bad)
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad16 = (b"\x89PNG\r\n\x1a\n"
             + struct.pack(">I", len(ihdr16)) + b"IHDR" + ihdr16
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr16) & 0xFFFFFFFF))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad16)
    pal = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    badp = (b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(pal)) + b"IHDR" + pal
            + struct.pack(">I", zlib.crc32(b"IHDR" + pal) & 0xFFFFFFFF))
    with pytest.raises(ValueError, match="palette"):
        decode_png(badp)


# ------------------------------------------------------------- JPEG


def _flat_expected_gray(v: int, quality: int) -> int:
    """Independent closed-form replay of the flat-block DC chain
    (the contract the SQL oracle uses)."""
    import math

    from zef_spark.pipeline.codecs import jpeg_quant_tables
    ql, _ = jpeg_quant_tables(quality)
    dq = math.floor(8.0 * (v - 128) / ql[0] + 0.5)
    return min(255, max(0, math.floor((dq * ql[0]) / 8.0
                                      + 128.0 + 0.5)))


def _flat_expected_rgb(r, g, b, quality):
    import math

    from zef_spark.pipeline.codecs import jpeg_quant_tables
    ql, qc = jpeg_quant_tables(quality)
    y = math.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = math.floor(128.0 - 0.168736 * r - 0.331264 * g
                    + 0.5 * b + 0.5)
    cr = math.floor(128.0 + 0.5 * r - 0.418688 * g
                    - 0.081312 * b + 0.5)
    y, cb, cr = (min(255, max(0, c)) for c in (y, cb, cr))
    yD = (math.floor(8.0 * (y - 128) / ql[0] + 0.5) * ql[0]) / 8.0 \
        + 128.0
    cbD = (math.floor(8.0 * (cb - 128) / qc[0] + 0.5) * qc[0]) / 8.0 \
        + 128.0
    crD = (math.floor(8.0 * (cr - 128) / qc[0] + 0.5) * qc[0]) / 8.0 \
        + 128.0
    R = math.floor(yD + 1.402 * (crD - 128.0) + 0.5)
    G = math.floor(yD - 0.344136 * (cbD - 128.0)
                   - 0.714136 * (crD - 128.0) + 0.5)
    B = math.floor(yD + 1.772 * (cbD - 128.0) + 0.5)
    return tuple(min(255, max(0, int(c))) for c in (R, G, B))


@given(st.integers(0, 255), st.sampled_from([10, 30, 50, 75, 95]))
@settings(max_examples=40, deadline=None)
def test_jpeg_flat_gray_closed_form(v, quality):
    """Uniform gray decodes to EXACTLY the closed-form DC chain at
    any quality — the property the p_jpeg_decode oracle relies on."""
    import numpy as np

    from zef_spark.pipeline.codecs import decode_jpeg, encode_jpeg
    data = encode_jpeg(16, 16, bytes([v]) * 256, quality=quality,
                       gray=True)
    w, h, rgb = decode_jpeg(data)
    assert (w, h) == (16, 16)
    got = set(rgb)
    assert got == {_flat_expected_gray(v, quality)}


@given(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255),
       st.sampled_from(["4:4:4", "4:2:0"]),
       st.sampled_from([25, 40, 75, 90]))
@settings(max_examples=60, deadline=None)
def test_jpeg_flat_color_closed_form(r, g, b, sub, quality):
    import numpy as np

    from zef_spark.pipeline.codecs import decode_jpeg, encode_jpeg
    data = encode_jpeg(16, 16, bytes([r, g, b]) * 256,
                       quality=quality, subsampling=sub)
    _, _, rgb = decode_jpeg(data)
    px = np.frombuffer(rgb, np.uint8).reshape(16, 16, 3)
    exp = _flat_expected_rgb(r, g, b, quality)
    for c in range(3):
        assert set(px[..., c].reshape(-1).tolist()) == {exp[c]}, \
            (r, g, b, sub, quality, c)


def test_jpeg_roundtrip_bounds():
    """General content: lossy but bounded at high quality, and both
    subsampling modes invert their own layout (dims + close values)."""
    import numpy as np

    from zef_spark.pipeline.codecs import decode_jpeg, encode_jpeg
    # smooth (wrap-free) gradients: sharp wrap edges would add
    # legitimate Gibbs ringing and turn the bound into a flaky guess
    rng = [(x * 7, y * 6, x * 3 + y * 4)
           for y in range(32) for x in range(32)]
    raw = bytes(v for p in rng for v in p)
    a = np.frombuffer(raw, np.uint8).astype(int).reshape(32, 32, 3)
    w, h, rgb = decode_jpeg(encode_jpeg(32, 32, raw, quality=90))
    out = np.frombuffer(rgb, np.uint8).astype(int).reshape(32, 32, 3)
    assert (w, h) == (32, 32)
    assert np.abs(a - out).max() <= 8
    assert np.abs(a - out).mean() < 2.0
    # 4:2:0 on 2x2-constant chroma: subsampling is information-
    # lossless there, so only DCT error remains
    blocky = np.zeros((16, 16, 3), np.uint8)
    for y in range(16):
        for x in range(16):
            blocky[y, x] = ((x // 2) * 16, (y // 2) * 16,
                            ((x // 2) + (y // 2)) * 8)
    w, h, rgb = decode_jpeg(encode_jpeg(
        16, 16, blocky.tobytes(), quality=95, subsampling="4:2:0"))
    out = np.frombuffer(rgb, np.uint8).astype(int).reshape(16, 16, 3)
    assert np.abs(blocky.astype(int) - out).max() <= 6
    # odd (non-multiple-of-MCU) dimensions survive
    odd = bytes((i * 37) % 256 for i in range(13 * 9 * 3))
    w, h, rgb = decode_jpeg(encode_jpeg(13, 9, odd, quality=75,
                                        subsampling="4:2:0"))
    assert (w, h, len(rgb)) == (13, 9, 13 * 9 * 3)


def test_jpeg_idct_matches_independent_cosine_sum():
    """The decoder's matrix IDCT against a from-the-spec direct
    cosine double sum (T.81 A.3.3) — independent implementation of
    the same transform, elementwise within float tolerance."""
    import math

    import numpy as np

    from zef_spark.pipeline.codecs import _dct_matrix
    rng = np.random.RandomState(7)
    coef = rng.randint(-200, 200, size=(8, 8)).astype(np.float64)
    A = _dct_matrix()
    fast = A.T @ coef @ A

    def c(u):
        return 1 / math.sqrt(2) if u == 0 else 1.0

    slow = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (c(u) * c(v) * coef[u, v]
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            slow[x, y] = s / 4.0
    assert np.abs(fast - slow).max() < 1e-9


def test_jpeg_error_paths_and_sniff():
    import struct as _struct

    from zef_spark.pipeline.codecs import (decode_jpeg, encode_jpeg,
                                           sniff_codec)
    good = encode_jpeg(8, 8, bytes(192), quality=75)
    assert sniff_codec(good) == "jpeg"
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00" + good)
    # progressive (SOF2) explicitly rejected, not mis-decoded
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))
    # truncated entropy segment
    with pytest.raises(ValueError):
        decode_jpeg(good[:len(good) - 12])
    # DRI with nonzero restart interval rejected
    dri = (good[:2] + b"\xff\xdd" + _struct.pack(">HH", 4, 8)
           + good[2:])
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(dri)


def test_jpeg_feature_extraction_routing(spark):
    """extract_features reports codec='jpeg' and the channel means of
    the DECODED pixels (flat fixture -> closed-form expectation)."""
    import pandas as pd

    from zef_spark.pipeline.codecs import encode_jpeg
    from zef_spark.pipeline.multimodal import extract_features
    exp = _flat_expected_rgb(40, 90, 200, 75)
    pdf = pd.DataFrame({
        "media_id": [1],
        "media_type": ["image"],
        "content": [encode_jpeg(16, 16, bytes([40, 90, 200]) * 256,
                                quality=75, subsampling="4:2:0")],
    })
    df = spark.createDataFrame(pdf)
    row = extract_features(df, dim=9).collect()[0]
    assert row["codec"] == "jpeg"
    assert row["feature"][3:6] == [float(c) for c in exp]


@given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 10**6),
       st.sampled_from(["4:4:4", "4:2:0"]), st.booleans())
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_shape_and_determinism(w, h, seed, sub, gray):
    """Arbitrary content/dims: encode→decode preserves dimensions,
    output is pure-function deterministic, and values stay in-range.
    (Value closeness is content-dependent for a lossy codec — the
    bounded checks live in test_jpeg_roundtrip_bounds.)"""
    from zef_spark.pipeline.codecs import decode_jpeg, encode_jpeg
    nch = 1 if gray else 3
    n = w * h * nch
    raw = bytes((seed * 2654435761 + i * 97) % 256 for i in range(n))
    data = encode_jpeg(w, h, raw, quality=80, gray=gray,
                       subsampling=sub)
    out1 = decode_jpeg(data)
    out2 = decode_jpeg(data)
    assert out1 == out2
    assert (out1[0], out1[1], len(out1[2])) == (w, h, w * h * 3)


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=60, deadline=None)
def test_jpeg_decoder_rejects_garbage(blob):
    """Arbitrary bytes after an SOI marker must raise ValueError (or
    a clean struct error) — never hang, loop, or mis-decode."""
    from zef_spark.pipeline.codecs import decode_jpeg
    try:
        decode_jpeg(b"\xff\xd8" + blob)
    except (ValueError, IndexError) as _:
        pass
    except Exception as e:  # struct.error subclasses included
        import struct as _s
        assert isinstance(e, _s.error), type(e)
