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


def sniff_codec(data: bytes) -> str | None:
    """'ppm' | 'bmp' | 'wav' | 'png' from magic bytes, None if
    unrecognized."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None
