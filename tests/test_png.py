"""From-scratch PNG codec (multimodal/png.py): golden filter-level decode
checks (each of the five spec filters applied FORWARD by this test's own
independent filtering code, then recovered by the decoder), corruption
detection, round-trips, and — the point — real PNG bytes flowing through
the existing Arrow mapInPandas kernels (features / resize / frames)."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from spark_deal_observer_spark.multimodal.png import (
    _SIG,
    decode_png,
    encode_png,
)


def _gradient(w: int, h: int, ch: int) -> bytes:
    """Deterministic test image: pixel value mixes x, y and channel."""
    return bytes(
        (3 * x + 7 * y + 11 * c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _filter_row(f: int, row: bytes, prev: bytes, ch: int) -> bytes:
    """FORWARD application of scanline filter `f` — an independent
    re-implementation of the spec (the test's ground truth), not a call
    into the decoder's inverse."""
    out = bytearray()
    for i, x in enumerate(row):
        a = row[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if f == 0:
            out.append(x)
        elif f == 1:
            out.append((x - a) & 0xFF)
        elif f == 2:
            out.append((x - b) & 0xFF)
        elif f == 3:
            out.append((x - ((a + b) >> 1)) & 0xFF)
        elif f == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((x - pred) & 0xFF)
    return bytes(out)


def _png_with_filters(pixels: bytes, w: int, h: int, ch: int, filters) -> bytes:
    """Hand-assemble a PNG whose row `y` uses filter `filters[y]`."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    raw, prev = b"", bytes(stride)
    for y in range(h):
        row = pixels[y * stride : (y + 1) * stride]
        raw += bytes([filters[y]]) + _filter_row(filters[y], row, prev, ch)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_round_trip_every_color_type(ch):
    pixels = _gradient(9, 7, ch)
    out, w, h, c = decode_png(encode_png(pixels, 9, 7, ch))
    assert (out, w, h, c) == (pixels, 9, 7, ch)


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_each_scanline_filter_decodes_to_golden_pixels(f):
    """Every spec filter, forward-applied independently, must invert."""
    pixels = _gradient(16, 5, 3)
    data = _png_with_filters(pixels, 16, 5, 3, [f] * 5)
    assert decode_png(data)[0] == pixels


def test_mixed_filters_and_prev_row_chaining():
    pixels = _gradient(11, 5, 4)
    data = _png_with_filters(pixels, 11, 5, 4, [0, 1, 2, 3, 4])
    assert decode_png(data)[0] == pixels


def test_corruption_is_detected():
    good = encode_png(_gradient(8, 8, 3), 8, 8, 3)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good[4:])
    flipped = bytearray(good)
    flipped[40] ^= 0xFF  # inside a chunk body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(flipped))
    with pytest.raises(ValueError, match="IEND"):
        decode_png(good[:-12])


def test_real_png_through_arrow_kernels(spark):
    """Real PNG bytes through the SAME mapInPandas kernels the fake
    codec exercises: features = decoded pixel stats, resize = truncated
    pixel buffer, frames = keyframe slices of the pixel buffer."""
    from spark_deal_observer_spark.multimodal.media import (
        extract_features,
        resize_media,
        sample_frames,
    )

    imgs = {d: _gradient(8 + d, 6, 3) for d in range(4)}
    rows = [
        (d, encode_png(px, 8 + d, 6, 3), "image/png", 8 + d, 6)
        for d, px in imgs.items()
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, codec string, width int, height int"
    )

    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    for d, px in imgs.items():
        assert feats[d]["num_bytes"] == len(px) == (8 + d) * 6 * 3
        assert feats[d]["first_byte"] == px[0]
        assert feats[d]["content_md5"] == hashlib.md5(px).hexdigest()

    resized = {r["doc_id"]: r for r in resize_media(media, 32).collect()}
    for d, px in imgs.items():
        assert bytes(resized[d]["payload"]) == px[:32]
        assert resized[d]["content_md5"] == hashlib.md5(px[:32]).hexdigest()

    frames = sample_frames(media, frame_bytes=16, every_k=2).collect()
    by_doc: dict[int, dict[int, str]] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = r["frame_md5"]
    for d, px in imgs.items():
        n_frames = (len(px) + 15) // 16
        want = {
            i: hashlib.md5(px[i * 16 : (i + 1) * 16]).hexdigest()
            for i in range(0, n_frames, 2)
        }
        assert by_doc[d] == want


def test_malformed_deflate_raises_valueerror():
    """ADVICE r5: a CRC-valid chunk whose IDAT payload is not valid
    deflate data must still raise the documented ValueError (zlib.error
    would slip past poisoned-row handlers filtering on ValueError)."""
    import struct
    import zlib

    import pytest

    from spark_deal_observer_spark.multimodal.png import encode_png

    good = encode_png(bytes(range(12)), 2, 2, 3)
    # locate the IDAT chunk and replace its body with CRC-valid garbage
    pos = 8
    out = bytearray(good[:8])
    while pos + 12 <= len(good):
        (length,) = struct.unpack(">I", good[pos : pos + 4])
        ctype = good[pos + 4 : pos + 8]
        body = good[pos + 8 : pos + 8 + length]
        if ctype == b"IDAT":
            body = b"\x99" * len(body)  # not a deflate stream
        out += struct.pack(">I", len(body)) + ctype + body
        out += struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        pos += 12 + length

    from spark_deal_observer_spark.multimodal.png import decode_png

    with pytest.raises(ValueError, match="corrupt IDAT"):
        decode_png(bytes(out))
