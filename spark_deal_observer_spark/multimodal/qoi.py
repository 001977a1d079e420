"""From-scratch QOI codec (the "Quite OK Image" format, qoiformat.org —
public 1-page spec). Fourth real codec next to png.py / wav.py / gif.py,
and the second IMAGE codec — which is the point: two independent byte
encodings of the same pixels let corpus-level queries prove that dedup
happens at the DECODED-CONTENT level, not the payload level
(multimodal_cross_codec_dedup: a PNG and a QOI of the same image must
produce identical bucket means and phash keys).

Format summary (all from the public spec):
  header   "qoif" | u32 BE width | u32 BE height | u8 channels (3|4)
           | u8 colorspace
  stream   chunks against state (prev pixel, 64-slot index keyed by
           hash = (3r+5g+7b+11a) % 64; index updated after EVERY pixel):
    0xFE r g b        QOI_OP_RGB   (alpha = prev alpha)
    0xFF r g b a      QOI_OP_RGBA
    00iiiiii          QOI_OP_INDEX (pixel = index[i])
    01rrggbb          QOI_OP_DIFF  (channel deltas −2..1, bias +2, mod 256)
    10gggggg rrrrbbbb QOI_OP_LUMA  (dg −32..31 bias +32;
                                    dr−dg, db−dg −8..7 bias +8; mod 256)
    11rrrrrr          QOI_OP_RUN   (run of prev, 1..62, bias −1;
                                    62/63 tags reserved for RGB/RGBA)
  trailer  7×0x00 then 0x01

Pure stdlib; malformed input raises ValueError (the png.py error
contract — executors surface a typed poisoned-row error, never a
low-level struct crash)."""

from __future__ import annotations

import struct

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"

_OP_RGB = 0xFE
_OP_RGBA = 0xFF
_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(
    pixels: bytes, width: int, height: int, channels: int, colorspace: int = 0
) -> bytes:
    """Encode raw row-major pixel bytes (RGB or RGBA) to a QOI file."""
    if channels not in (3, 4):
        raise ValueError(f"QOI channels must be 3 or 4, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width * height * channels}"
        )
    out = bytearray()
    out += _MAGIC
    out += struct.pack(">II", width, height)
    out += bytes((channels, colorspace))

    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    n = width * height
    for i in range(n):
        o = i * channels
        r, g, b = pixels[o], pixels[o + 1], pixels[o + 2]
        a = pixels[o + 3] if channels == 4 else pa
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
        else:
            if run:
                out.append(_OP_RUN | (run - 1))
                run = 0
            h = _hash(r, g, b, a)
            if index[h] == (r, g, b, a):
                out.append(_OP_INDEX | h)
            else:
                index[h] = (r, g, b, a)
                if a == pa:
                    # deltas are mod-256 (wraparound is part of the spec)
                    dr = (r - pr + 128) % 256 - 128
                    dg = (g - pg + 128) % 256 - 128
                    db = (b - pb + 128) % 256 - 128
                    dr_dg = dr - dg
                    db_dg = db - dg
                    if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                        out.append(
                            _OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                        )
                    elif -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7:
                        out.append(_OP_LUMA | (dg + 32))
                        out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                    else:
                        out += bytes((_OP_RGB, r, g, b))
                else:
                    out += bytes((_OP_RGBA, r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(_OP_RUN | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(data: bytes) -> tuple[bytes, int, int, int]:
    """Decode a QOI file → (raw pixel bytes, width, height, channels)."""
    if len(data) < 14 + len(_END):
        raise ValueError("QOI: truncated file")
    if data[:4] != _MAGIC:
        raise ValueError("QOI: bad magic")
    width, height = struct.unpack(">II", data[4:12])
    channels, colorspace = data[12], data[13]
    if channels not in (3, 4):
        raise ValueError(f"QOI: bad channel count {channels}")
    if colorspace not in (0, 1):
        raise ValueError(f"QOI: bad colorspace {colorspace}")
    n = width * height
    out = bytearray()
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    end = len(data) - len(_END)
    px = 0
    emit = (
        (lambda: out.extend((r, g, b)))
        if channels == 3
        else (lambda: out.extend((r, g, b, a)))
    )
    while px < n:
        if pos >= end:
            raise ValueError("QOI: chunk stream ended before pixel count")
        byte = data[pos]
        pos += 1
        if byte == _OP_RGB:
            if pos + 3 > end:
                raise ValueError("QOI: truncated RGB chunk")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == _OP_RGBA:
            if pos + 4 > end:
                raise ValueError("QOI: truncated RGBA chunk")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            op = byte & 0xC0
            if op == _OP_INDEX:
                r, g, b, a = index[byte & 0x3F]
            elif op == _OP_DIFF:
                r = (r + ((byte >> 4) & 0x03) - 2) % 256
                g = (g + ((byte >> 2) & 0x03) - 2) % 256
                b = (b + (byte & 0x03) - 2) % 256
            elif op == _OP_LUMA:
                if pos >= end:
                    raise ValueError("QOI: truncated LUMA chunk")
                dg = (byte & 0x3F) - 32
                rb = data[pos]
                pos += 1
                r = (r + dg + ((rb >> 4) & 0x0F) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (rb & 0x0F) - 8) % 256
            else:  # _OP_RUN
                run = (byte & 0x3F) + 1
                if px + run > n:
                    raise ValueError("QOI: run overflows pixel count")
                for _ in range(run):
                    emit()
                px += run
                index[_hash(r, g, b, a)] = (r, g, b, a)
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        emit()
        px += 1
    if data[end:] != _END:
        raise ValueError("QOI: missing end marker")
    if pos != end:
        raise ValueError("QOI: trailing bytes after final pixel")
    return bytes(out), width, height, channels
