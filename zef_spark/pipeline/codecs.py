"""Dependency-free media codecs for UNCOMPRESSED formats — the real
decode tier behind pipeline.multimodal (r11; retires the r08–r10
`_decode_stub`). No imaging/AV libraries exist in this environment,
but PPM (P6), BMP (24-bit BI_RGB) and WAV (PCM16) are pure byte
layouts a ~50-line parser reads exactly; these decoders return real
pixel/sample values, so downstream feature extraction is genuinely
content-derived.

Reference parity: the reference treats media as opaque blobs plus
typed metadata (SURVEY §2.P multimodal columns); this module gives the
Spark engine an actually-verifiable decode step for the formats the
container can support, with compressed codecs (png/jpeg/opus/h264)
still routed to the documented stub fallback in multimodal.py.

All functions are plain bytes→ints, no Spark imports — they run inside
Arrow-batched mapInPandas workers (multimodal.extract_features).
"""

from __future__ import annotations

import struct

# --------------------------------------------------------------- PPM


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """P6 binary PPM: 'P6\\n<w> <h>\\n255\\n' + row-major RGB bytes."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"encode_ppm: need {width * height * 3} bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(rgb)


def decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, row-major RGB bytes). Handles comment lines
    (#...) and arbitrary whitespace in the header, per the netpbm
    spec: exactly one whitespace byte follows maxval, then raster."""
    if data[:2] != b"P6":
        raise ValueError("decode_ppm: not a P6 PPM (bad magic)")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":  # comment to end-of-line
            while pos < len(data) and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"decode_ppm: only maxval 255 (got {maxval})")
    need = width * height * 3
    raster = data[pos:pos + need]
    if len(raster) != need:
        raise ValueError("decode_ppm: truncated raster")
    return width, height, raster


# --------------------------------------------------------------- BMP


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit uncompressed (BI_RGB) bottom-up BMP from row-major RGB.
    BMP stores rows bottom-to-top as BGR with rows padded to 4 bytes."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"encode_bmp: need {width * height * 3} bytes, got {len(rgb)}")
    row_sz = width * 3
    pad = (-row_sz) % 4
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = rgb[y * row_sz:(y + 1) * row_sz]
        for x in range(width):  # RGB -> BGR
            body += bytes((row[3 * x + 2], row[3 * x + 1], row[3 * x]))
        body += b"\x00" * pad
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    return hdr + dib + bytes(body)


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, row-major RGB bytes) from a 24-bit BI_RGB BMP.
    Supports bottom-up (positive height) and top-down (negative)."""
    if data[:2] != b"BM":
        raise ValueError("decode_bmp: not a BMP (bad magic)")
    off = struct.unpack_from("<I", data, 10)[0]
    hsz, width, height = struct.unpack_from("<Iii", data, 14)
    if hsz < 40:
        raise ValueError(f"decode_bmp: unsupported DIB header size {hsz}")
    planes, bpp, comp = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"decode_bmp: only 24-bit BI_RGB (got bpp={bpp}, comp={comp})")
    top_down = height < 0
    height = abs(height)
    row_sz = width * 3
    stride = row_sz + ((-row_sz) % 4)
    out = bytearray(width * height * 3)
    for r in range(height):
        y = r if top_down else height - 1 - r
        src = off + r * stride
        row = data[src:src + row_sz]
        if len(row) != row_sz:
            raise ValueError("decode_bmp: truncated pixel data")
        base = y * row_sz
        for x in range(width):  # BGR -> RGB
            out[base + 3 * x] = row[3 * x + 2]
            out[base + 3 * x + 1] = row[3 * x + 1]
            out[base + 3 * x + 2] = row[3 * x]
    return width, height, bytes(out)


# --------------------------------------------------------------- WAV


def encode_wav(samples: list[int], sample_rate: int = 16000,
               n_channels: int = 1) -> bytes:
    """RIFF/WAVE, PCM signed 16-bit little-endian, interleaved."""
    if any(s < -32768 or s > 32767 for s in samples):
        raise ValueError("encode_wav: sample out of int16 range")
    body = struct.pack("<%dh" % len(samples), *samples)
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      n_channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, n_channels, samples[int16]) from a PCM16 WAV.
    Walks RIFF chunks (fmt may precede data with LIST etc. between),
    honoring each chunk's declared size + word alignment."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE file")
    pos, sr, nch, fmt_code, body = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        csz = struct.unpack_from("<I", data, pos + 4)[0]
        payload = data[pos + 8:pos + 8 + csz]
        if cid == b"fmt ":
            fmt_code, nch, sr = struct.unpack_from("<HHI", payload, 0)
            bits = struct.unpack_from("<H", payload, 14)[0]
            if fmt_code != 1 or bits != 16:
                raise ValueError(
                    "decode_wav: only PCM16 "
                    f"(got fmt={fmt_code}, bits={bits})")
        elif cid == b"data":
            body = payload
        pos += 8 + csz + (csz & 1)  # chunks are word-aligned
    if sr is None or body is None:
        raise ValueError("decode_wav: missing fmt or data chunk")
    n = len(body) // 2
    return sr, nch, list(struct.unpack("<%dh" % n, body[:n * 2]))


# --------------------------------------------------------------- PNG


def encode_png(width: int, height: int, rgb: bytes,
               alpha: bytes | None = None) -> bytes:
    """8-bit PNG from row-major RGB bytes (color type 2), or RGBA
    (color type 6) when ``alpha`` gives one byte per pixel. Filter 0
    on every scanline, one zlib IDAT — minimal but spec-conformant
    (PNG spec ISO/IEC 15948; CRCs via zlib.crc32)."""
    import zlib
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"encode_png: need {width * height * 3} bytes, got {len(rgb)}")
    if alpha is not None and len(alpha) != width * height:
        raise ValueError("encode_png: alpha must be one byte per pixel")

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", crc))

    color = 2 if alpha is None else 6
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = bytearray()
    row_px = width * 3
    for y in range(height):
        raw.append(0)  # filter type None
        if alpha is None:
            raw += rgb[y * row_px:(y + 1) * row_px]
        else:
            for x in range(width):
                raw += rgb[(y * width + x) * 3:(y * width + x) * 3 + 3]
                raw.append(alpha[y * width + x])
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9, Filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, row-major RGB bytes) from an 8-bit PNG —
    pure stdlib (zlib inflate + per-scanline unfilter incl. Paeth).

    Supported: bit depth 8, color types 0 (gray), 2 (RGB), 4
    (gray+alpha), 6 (RGBA), non-interlaced, multi-IDAT. Grayscale is
    replicated to RGB; ALPHA IS DROPPED (feature extraction consumes
    RGB statistics — compositing policy belongs to the caller).
    Rejects interlace (Adam7), palette (3), and non-8-bit depths
    explicitly rather than mis-decoding."""
    import zlib
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("decode_png: not a PNG (bad signature)")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        ln = struct.unpack_from(">I", data, pos)[0]
        ctype = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        if len(payload) != ln:
            raise ValueError("decode_png: truncated chunk")
        if ctype == b"IHDR":
            (width, height, depth, color,
             comp, filt, interlace) = struct.unpack(">IIBBBBB", payload)
            if depth != 8:
                raise ValueError(
                    f"decode_png: only bit depth 8 (got {depth})")
            if color not in (0, 2, 4, 6):
                raise ValueError(
                    f"decode_png: unsupported color type {color}"
                    + (" (palette)" if color == 3 else ""))
            if comp != 0 or filt != 0:
                raise ValueError("decode_png: nonstandard comp/filter")
            if interlace != 0:
                raise ValueError("decode_png: interlaced (Adam7) "
                                 "PNGs are rejected, not mis-decoded")
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # len + type + payload + crc
    if width is None:
        raise ValueError("decode_png: missing IHDR")
    raw = zlib.decompress(bytes(idat))
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("decode_png: raster size mismatch")
    prev = bytearray(stride)
    out = bytearray(width * height * 3)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        if ftype == 1:    # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                c = prev[i - nch] if i >= nch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"decode_png: bad filter type {ftype}")
        base = y * width * 3
        if color == 2:
            out[base:base + stride] = line
        elif color == 6:
            for x in range(width):
                out[base + 3 * x:base + 3 * x + 3] = \
                    line[4 * x:4 * x + 3]
        elif color == 0:
            for x in range(width):
                g = line[x]
                out[base + 3 * x:base + 3 * x + 3] = bytes((g, g, g))
        else:  # 4: gray + alpha
            for x in range(width):
                g = line[2 * x]
                out[base + 3 * x:base + 3 * x + 3] = bytes((g, g, g))
        prev = line
    return width, height, bytes(out)


# -------------------------------------------------------------- JPEG
# Baseline JFIF (ITU T.81): SOF0, standard Annex K quantization and
# huffman tables, 8-bit samples, grayscale or YCbCr at 4:4:4 / 4:2:0.
# numpy does the block DCT/IDCT (float64 matrix products); everything
# else is stdlib byte-level work. Two deliberate conventions make the
# codec verifiable by an independent SQL oracle on flat-color content:
#
#  1. RGB→YCbCr rounds to INTEGER samples with the engine's floor-grid
#     convention floor(x + 0.5) (functions/rounding.py), written in
#     the exact left-associative operation order the oracle's SQL
#     parses to — identical IEEE doubles on both engines, so even
#     exact .5 boundaries agree.
#  2. Flat blocks shortcut the float DCT: a block of one repeated
#     sample s encodes DC = 8.0·s EXACTLY (the mathematical value; a
#     float cosine-matrix product would carry ±ulp jitter across the
#     quantizer's floor boundary), and a DC-only block decodes to the
#     exact constant (dc·q)/8.0 + 128.0. Real codecs ship the same
#     shortcut as a speed path; here it is also the exactness path.
#
# General (non-flat) content is lossy as JPEG always is and is
# verified by round-trip error bounds + an independent cosine-sum
# IDCT replay in tests/test_codecs.py.

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

# Annex K Table K.1 / K.2 (natural row-major order)
_Q_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99]
_Q_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99]

# Annex K Tables K.3–K.6: (BITS counts per code length 1..16, HUFFVAL)
_HUFF_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
_HUFF_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_HUFF_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_HUFF_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def jpeg_quant_tables(quality: int) -> tuple[list[int], list[int]]:
    """(luma, chroma) quantization tables at ``quality`` 1..100,
    libjpeg's integer scaling: scale = 5000//q below 50 else
    200 − 2q; tq = clamp1..255((base·scale + 50)//100). Exposed so
    fixture oracles can inline the exact constants."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    mk = lambda base: [max(1, min(255, (b * scale + 50) // 100))
                       for b in base]
    return mk(_Q_LUMA), mk(_Q_CHROMA)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol → (code, length) per T.81 Annex C code assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_codes(bits: list[int], vals: list[int]) -> dict:
    return {(ln, c): sym
            for sym, (c, ln) in _canonical_codes(bits, vals).items()}


class _BitWriter:
    """MSB-first bit accumulator with 0xFF00 byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad 1s
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment; un-stuffs
    0xFF00 and stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("decode_jpeg: truncated entropy data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) \
                    else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError(
                        f"decode_jpeg: marker 0xFF{nxt:02x} inside "
                        "entropy data (progressive/restart streams "
                        "with DRI are not supported)")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("decode_jpeg: invalid huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t received bits to a signed coefficient."""
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _dct_matrix():
    import numpy as np
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    m[0, :] /= np.sqrt(2.0)
    return m  # A: spatial = A.T @ coef @ A; coef = A @ spatial @ A.T


def _pad_to_blocks(plane, bh: int, bw: int):
    """Edge-replicate an int plane to (bh·8, bw·8)."""
    import numpy as np
    h, w = plane.shape
    out = np.empty((bh * 8, bw * 8), dtype=plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1:h, :]
    out[:, w:] = out[:, w - 1:w]
    return out


def _encode_plane_blocks(plane, q, writer, codes_dc, codes_ac,
                         dc_pred: int, order) -> int:
    """Encode ``plane`` (already padded, level-unshifted ints) block
    by block in the (by, bx) sequence ``order``; returns new DC
    predictor. Flat blocks take the exact-DC shortcut (see module
    comment)."""
    import numpy as np
    A = _dct_matrix()
    qv = np.asarray(q, dtype=np.float64).reshape(8, 8)
    for by, bx in order:
        blk = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
        s0 = int(blk[0, 0])
        if (blk == s0).all():
            dq = np.zeros((8, 8), dtype=np.int64)
            # exact: DC = 8.0·(s−128); quantize on the same floor
            # grid the oracle replays
            dq[0, 0] = int(np.floor(8.0 * (s0 - 128) / qv[0, 0] + 0.5))
        else:
            sh = blk.astype(np.float64) - 128.0
            coef = A @ sh @ A.T
            dq = np.floor(coef / qv + 0.5).astype(np.int64)
        zz = dq.reshape(64)[_ZIGZAG]
        diff = int(zz[0]) - dc_pred
        dc_pred = int(zz[0])
        t = _category(diff)
        code, ln = codes_dc[t]
        writer.put(code, ln)
        if t:
            writer.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last = max((i for i in range(1, 64) if zz[i]), default=0)
        for i in range(1, last + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = codes_ac[0xF0]  # ZRL
                writer.put(code, ln)
                run -= 16
            t = _category(v)
            code, ln = codes_ac[(run << 4) | t]
            writer.put(code, ln)
            writer.put(v if v >= 0 else v + (1 << t) - 1, t)
            run = 0
        if last < 63:
            code, ln = codes_ac[0x00]  # EOB
            writer.put(code, ln)
    return dc_pred


def encode_jpeg(width: int, height: int, pixels: bytes,
                quality: int = 75, gray: bool = False,
                subsampling: str = "4:4:4") -> bytes:
    """Baseline JFIF from row-major RGB bytes (or one luma byte per
    pixel when ``gray``). ``subsampling``: '4:4:4' or '4:2:0'
    (ignored for gray). Integer YCbCr conversion + exact flat-block
    DC (module comment) make flat-color output oracle-replicable;
    general content is ordinarily lossy."""
    import numpy as np
    nch = 1 if gray else 3
    if len(pixels) != width * height * nch:
        raise ValueError(f"encode_jpeg: need {width * height * nch} "
                         f"bytes, got {len(pixels)}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    ql, qc = jpeg_quant_tables(quality)
    px = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    if gray:
        planes = [np.floor(px + 0.5).astype(np.int64)
                  .reshape(height, width)]
    else:
        px = px.reshape(height, width, 3)
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        # operation order mirrors the oracle SQL exactly (module note)
        y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
        cb = np.floor(128.0 - 0.168736 * r - 0.331264 * g
                      + 0.5 * b + 0.5)
        cr = np.floor(128.0 + 0.5 * r - 0.418688 * g
                      - 0.081312 * b + 0.5)
        planes = [np.clip(p, 0, 255).astype(np.int64)
                  for p in (y, cb, cr)]
    sub = (not gray) and subsampling == "4:2:0"
    if sub:
        for i in (1, 2):
            p = planes[i]
            h2, w2 = (p.shape[0] + 1) // 2, (p.shape[1] + 1) // 2
            pp = _pad_to_blocks(p, (2 * h2 + 7) // 8, (2 * w2 + 7) // 8)
            pe = pp[:2 * h2, :2 * w2]
            planes[i] = ((pe[0::2, 0::2] + pe[0::2, 1::2]
                          + pe[1::2, 0::2] + pe[1::2, 1::2] + 2) // 4)

    # ---- headers
    out = bytearray(b"\xff\xd8")                              # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes((1, 1, 0)) + struct.pack(">HH", 1, 1) + bytes((0, 0))

    def dqt(tid: int, tbl: list[int]) -> bytes:
        return (b"\xff\xdb" + struct.pack(">H", 67) + bytes((tid,))
                + bytes(tbl[i] for i in _ZIGZAG))
    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)
    hv = (0x22 if sub else 0x11, 0x11, 0x11)
    comps = b"".join(bytes((i + 1, hv[i], 0 if i == 0 else 1))
                     for i in range(nch))
    out += (b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nch, 8,
                                      height, width, nch) + comps)

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return (b"\xff\xc4"
                + struct.pack(">H", 19 + len(vals))
                + bytes(((cls << 4) | tid,)) + bytes(bits)
                + bytes(vals))
    out += dht(0, 0, _HUFF_DC_L) + dht(1, 0, _HUFF_AC_L)
    if not gray:
        out += dht(0, 1, _HUFF_DC_C) + dht(1, 1, _HUFF_AC_C)
    sel = b"".join(bytes((i + 1, 0 if i == 0 else 0x11))
                   for i in range(nch))
    out += (b"\xff\xda" + struct.pack(">HB", 6 + 2 * nch, nch) + sel
            + bytes((0, 63, 0)))

    # ---- entropy-coded segment (interleaved MCUs)
    cdc = [_canonical_codes(*_HUFF_DC_L)] \
        + [_canonical_codes(*_HUFF_DC_C)] * (nch - 1)
    cac = [_canonical_codes(*_HUFF_AC_L)] \
        + [_canonical_codes(*_HUFF_AC_C)] * (nch - 1)
    qs = [ql] + [qc] * (nch - 1)
    hmax = 2 if sub else 1
    mcu_y = (height + 8 * hmax - 1) // (8 * hmax)
    mcu_x = (width + 8 * hmax - 1) // (8 * hmax)
    padded = []
    for i, p in enumerate(planes):
        f = hmax if (sub and i > 0) else 1  # chroma plane is half-res
        padded.append(_pad_to_blocks(
            p, mcu_y * (hmax // f), mcu_x * (hmax // f)))
    w = _BitWriter()
    preds = [0] * nch
    for my in range(mcu_y):
        for mx in range(mcu_x):
            for i in range(nch):
                f = hmax if not (sub and i > 0) else 1
                order = [(my * f + dy, mx * f + dx)
                         for dy in range(f) for dx in range(f)]
                preds[i] = _encode_plane_blocks(
                    padded[i], qs[i], w, cdc[i], cac[i], preds[i],
                    order)
    out += w.flush()
    out += b"\xff\xd9"                                        # EOI
    return bytes(out)


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, row-major RGB bytes) from a baseline JFIF —
    stdlib byte walk + numpy IDCT. Supported: SOF0, 8-bit, 1 or 3
    components, sampling factors ≤ 2×2 (4:4:4, 4:2:2, 4:2:0),
    interleaved single scan, no restart intervals. Progressive
    (SOF2), arithmetic coding, DRI and 12-bit streams are rejected
    explicitly rather than mis-decoded. Grayscale replicates to RGB.
    DC-only blocks decode to the exact constant (dc·q)/8.0 (module
    comment); chroma upsampling is pixel replication."""
    import numpy as np
    if data[:2] != b"\xff\xd8":
        raise ValueError("decode_jpeg: not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    comps = []  # (cid, h, v, tq)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"decode_jpeg: bad marker sync at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2:pos + seg_len]
        if len(seg) < seg_len - 2:
            raise ValueError("decode_jpeg: truncated segment "
                             f"(marker 0xFF{marker:02x})")
        if marker == 0xDB:                                    # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 15
                sp += 1
                if pq:
                    vals = [struct.unpack_from(">H", seg, sp + 2 * i)[0]
                            for i in range(64)]
                    sp += 128
                else:
                    vals = list(seg[sp:sp + 64])
                    sp += 64
                nat = [0] * 64
                for i, z in enumerate(_ZIGZAG):
                    nat[z] = vals[i]
                qtabs[tq] = nat
        elif marker == 0xC4:                                  # DHT
            sp = 0
            while sp < len(seg):
                cls, tid = seg[sp] >> 4, seg[sp] & 15
                bits = list(seg[sp + 1:sp + 17])
                n = sum(bits)
                vals = list(seg[sp + 17:sp + 17 + n])
                htabs[(cls, tid)] = _decode_codes(bits, vals)
                sp += 17 + n
        elif marker == 0xC0:                                  # SOF0
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("decode_jpeg: only 8-bit supported")
            comps = [(seg[6 + 3 * i], seg[7 + 3 * i] >> 4,
                      seg[7 + 3 * i] & 15, seg[8 + 3 * i])
                     for i in range(nc)]
            sof = (h, w, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"decode_jpeg: SOF{marker - 0xC0} (progressive/"
                "extended/arithmetic) not supported — baseline only")
        elif marker == 0xDD:                                  # DRI
            if struct.unpack_from(">H", seg, 0)[0] != 0:
                raise ValueError(
                    "decode_jpeg: restart intervals not supported")
        elif marker == 0xDA:                                  # SOS
            if sof is None:
                raise ValueError("decode_jpeg: SOS before SOF0")
            ns = seg[0]
            sel = {seg[1 + 2 * i]: (seg[2 + 2 * i] >> 4,
                                    seg[2 + 2 * i] & 15)
                   for i in range(ns)}
            pos += seg_len
            return _jpeg_scan(data, pos, sof, comps, sel, qtabs,
                              htabs)
        pos += seg_len
    raise ValueError("decode_jpeg: no scan data found")


def _jpeg_scan(data, pos, sof, comps, sel, qtabs, htabs):
    import numpy as np
    h, w, nc = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("decode_jpeg: sampling factors > 2 "
                         "not supported")
    mcu_y = (h + 8 * vmax - 1) // (8 * vmax)
    mcu_x = (w + 8 * hmax - 1) // (8 * hmax)
    A = _dct_matrix()
    planes = []
    for cid, ch, cv, tq in comps:
        planes.append(np.zeros((mcu_y * cv * 8, mcu_x * ch * 8),
                               dtype=np.float64))
    rdr = _BitReader(data, pos)
    preds = [0] * nc
    for my in range(mcu_y):
        for mx in range(mcu_x):
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dct_t = htabs[(0, sel[cid][0])]
                act_t = htabs[(1, sel[cid][1])]
                qv = np.asarray(qtabs[tq],
                                dtype=np.int64).reshape(8, 8)
                for dy in range(cv):
                    for dx in range(ch):
                        t = rdr.huff(dct_t)
                        diff = _extend(rdr.bits(t), t)
                        preds[ci] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = rdr.huff(act_t)
                            if rs == 0x00:                    # EOB
                                break
                            if rs == 0xF0:                    # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError(
                                    "decode_jpeg: AC index overrun")
                            zz[k] = _extend(rdr.bits(rs & 15),
                                            rs & 15)
                            k += 1
                        dq = np.zeros(64, dtype=np.int64)
                        dq[_ZIGZAG] = zz
                        dqb = (dq.reshape(8, 8) * qv)
                        if not dqb.reshape(64)[1:].any():
                            # DC-only: exact constant (module note)
                            blk = np.full(
                                (8, 8),
                                (dqb[0, 0]) / 8.0 + 128.0)
                        else:
                            blk = (A.T @ dqb.astype(np.float64)
                                   @ A) + 128.0
                        by, bx = my * cv + dy, mx * ch + dx
                        planes[ci][by * 8:(by + 1) * 8,
                                   bx * 8:(bx + 1) * 8] = blk
    # upsample to full MCU-padded resolution, then crop
    full = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        p = planes[ci]
        if ch < hmax:
            p = np.repeat(p, hmax // ch, axis=1)
        if cv < vmax:
            p = np.repeat(p, vmax // cv, axis=0)
        full.append(p[:h, :w])
    if nc == 1:
        lum = np.clip(np.floor(full[0] + 0.5), 0, 255) \
            .astype(np.uint8)
        return w, h, np.repeat(lum[..., None], 3, axis=2).tobytes()
    y, cb, cr = full
    # operation order mirrors the oracle SQL exactly (module note)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([np.clip(np.floor(c + 0.5), 0, 255)
                    for c in (r, g, b)], axis=2).astype(np.uint8)
    return w, h, rgb.tobytes()


def sniff_codec(data: bytes) -> str | None:
    """'ppm' | 'bmp' | 'wav' | 'png' | 'jpeg' from magic bytes, None
    if unrecognized."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None
