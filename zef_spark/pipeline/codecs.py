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


def sniff_codec(data: bytes) -> str | None:
    """'ppm' | 'bmp' | 'wav' from magic bytes, None if unrecognized."""
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None
