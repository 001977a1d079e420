"""From-scratch PNG codec (stdlib-only: struct + zlib) — the one REAL
media format behind `media.decode_media`, so the multimodal kernels
(extract_features / resize_media / sample_frames) demonstrably run over
real decoded pixel bytes, not just the `fake/*` identity transform.

Public-knowledge implementation of the PNG spec (RFC 2083 / W3C PNG):
8-byte signature, length-type-data-CRC chunks, IHDR geometry, zlib
(RFC 1950) IDAT stream, and the five scanline filters (None/Sub/Up/
Average/Paeth) undone row by row. Scope is the still-image subset a
training-data pipeline actually stores: 8-bit depth, grayscale /
gray+alpha / RGB / RGBA, non-interlaced. Anything else raises — a decode
error must surface as a poisoned row, never as silently wrong pixels.

CRCs are VERIFIED on read: a truncated or bit-flipped payload in a
100 TB corpus must be detected at the decode kernel, the only place that
still has the bytes. The encoder writes filter-0 rows at max compression
— it exists to round-trip tests and synthesize fixtures, not to compete
with optimized encoders.

Reference analog: none — the reference observes deals (JS+SQL, no media
path); this module belongs to the LLM-data-pipeline mandate.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[bytes, int, int, int]:
    """PNG bytes -> (raw pixels row-major, width, height, channels).

    Verifies the signature and every chunk CRC, concatenates IDAT,
    inflates, and un-filters each scanline per the spec's five filter
    types. Raises ValueError on corruption or unsupported variants."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated chunk {ctype!r}")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in chunk {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    else:
        raise ValueError("no IEND chunk")
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS:
        raise ValueError(f"unsupported depth/color: {depth}/{color}")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported compression/filter/interlace method")
    ch = _CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # keep the documented single error type: CRC-valid but malformed
        # deflate data (or a crafted stream) must still surface as the
        # ValueError poisoned-row handlers filter on
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match geometry")
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _y in range(h):
        f = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += stride + 1
        if f == 1:  # Sub: + left
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up: + above
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average: + floor((left+above)/2)
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth predictor
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown scanline filter {f}")
        out += line
        prev = line
    return bytes(out), w, h, ch


def encode_png(pixels: bytes, width: int, height: int, channels: int) -> bytes:
    """Raw row-major pixel bytes -> PNG (8-bit, filter 0, one IDAT)."""
    if channels not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer does not match geometry")
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0
    )
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )
