"""QOI codec unit tests: exact round-trips through every opcode family,
spec-edge behavior (62-run flush, wraparound deltas, index reuse), and
the ValueError contract on malformed input."""

from __future__ import annotations

import random

import pytest

from spark_deal_observer_spark.multimodal.qoi import decode_qoi, encode_qoi


def _roundtrip(pixels: bytes, w: int, h: int, ch: int) -> bytes:
    data = encode_qoi(pixels, w, h, ch)
    out, dw, dh, dch = decode_qoi(data)
    assert (dw, dh, dch) == (w, h, ch)
    return out


def test_roundtrip_random_rgb():
    rng = random.Random(7)
    px = bytes(rng.randrange(256) for _ in range(31 * 9 * 3))
    assert _roundtrip(px, 31, 9, 3) == px


def test_roundtrip_random_rgba():
    rng = random.Random(11)
    px = bytes(rng.randrange(256) for _ in range(17 * 5 * 4))
    assert _roundtrip(px, 17, 5, 4) == px


def test_long_run_flush_at_62():
    # 200 identical pixels force multiple QOI_OP_RUN chunks (cap 62)
    px = bytes([42, 99, 7]) * 200
    data = encode_qoi(px, 200, 1, 3)
    assert _roundtrip(px, 200, 1, 3) == px
    # the stream should be tiny: 1 RGB chunk + ceil((200-1)/62) runs
    assert len(data) < 14 + 8 + 4 + 8


def test_diff_and_luma_paths():
    # walk the channel values in ±1 steps (DIFF) then ±20 (LUMA)
    vals = [(100, 100, 100)]
    for i in range(1, 20):
        r, g, b = vals[-1]
        vals.append(((r + 1) % 256, (g - 1) % 256, (b + 1) % 256))
    for i in range(20):
        r, g, b = vals[-1]
        vals.append(((r + 21) % 256, (g + 20) % 256, (b + 19) % 256))
    px = bytes(v for t in vals for v in t)
    assert _roundtrip(px, len(vals), 1, 3) == px


def test_wraparound_delta():
    # 255 -> 0 is a +1 DIFF under mod-256 (the spec's wraparound rule)
    px = bytes([255, 255, 255, 0, 0, 0])
    assert _roundtrip(px, 2, 1, 3) == px


def test_index_reuse():
    # A B A B ... the repeats after the first pair must hit the index
    a, b = (10, 20, 30), (200, 150, 100)
    px = bytes(v for t in [a, b] * 30 for v in t)
    data = encode_qoi(px, 60, 1, 3)
    assert _roundtrip(px, 60, 1, 3) == px
    # two RGB/LUMA-ish chunks then 58 one-byte INDEX ops: stream stays small
    assert len(data) < 14 + 8 + 10 + 60


def test_alpha_change_forces_rgba():
    px = bytes([1, 2, 3, 255, 1, 2, 3, 128, 1, 2, 3, 128])
    assert _roundtrip(px, 3, 1, 4) == px


@pytest.mark.parametrize(
    "mutate",
    [
        lambda d: b"xoif" + d[4:],               # bad magic
        lambda d: d[:20],                        # truncated stream
        lambda d: d[:-8] + b"\x00" * 8,          # missing end marker
        lambda d: d[:13] + bytes([9]) + d[14:],  # bad colorspace
    ],
)
def test_malformed_raises_valueerror(mutate):
    good = encode_qoi(bytes(range(0, 120, 2)) * 3, 60, 1, 3)  # arbitrary
    with pytest.raises(ValueError):
        decode_qoi(mutate(good))


def test_encode_rejects_bad_buffer():
    with pytest.raises(ValueError):
        encode_qoi(b"\x00" * 10, 2, 2, 3)
    with pytest.raises(ValueError):
        encode_qoi(b"\x00" * 12, 2, 2, 2)


def test_reference_vector_single_red_pixel():
    # hand-derived from the spec: one RGB pixel (255,0,0)
    data = encode_qoi(bytes([255, 0, 0]), 1, 1, 3)
    assert data[:4] == b"qoif"
    assert data[12] == 3
    # one pixel differing from (0,0,0,255) by r=-1 mod 256 ... dr=-1? no:
    # r 0->255 is dr=-1 under wraparound -> DIFF chunk 0b01_01_10_10
    assert data[14] == 0b01011010
    assert data[15:] == b"\x00" * 7 + b"\x01"


def test_cross_codec_pixel_parity_with_png():
    # The load-bearing property for multimodal_cross_codec_dedup: the same
    # pixels through PNG and QOI decode back identical, while the payload
    # bytes differ (different container + entropy coding).
    import random

    from spark_deal_observer_spark.multimodal.media import decode_media
    from spark_deal_observer_spark.multimodal.png import encode_png

    rng = random.Random(3)
    gray = [rng.randrange(256) for _ in range(64 * 8)]
    rgb = bytes(v for g in gray for v in (g, g, g))
    png = encode_png(rgb, 64, 8, 3)
    qoi = encode_qoi(rgb, 64, 8, 3)
    assert png != qoi
    assert decode_media(png, "image/png") == rgb
    assert decode_media(qoi, "image/qoi") == rgb
