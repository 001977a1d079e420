"""From-scratch GIF89a/LZW codec (multimodal/gif.py): golden bytes, LZW
roundtrips across table growth and resets, corruption contracts, and the
container-invariance property the video dedup leg relies on."""

from __future__ import annotations

import random
import struct

import pytest

from spark_deal_observer_spark.multimodal.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def test_lzw_roundtrip_random_streams():
    rng = random.Random(11)
    for n in (1, 7, 300, 5000, 70000):
        for mcs in (2, 4, 8):
            data = bytes(rng.randrange(1 << mcs) for _ in range(n))
            assert _lzw_decode(_lzw_encode(data, mcs), mcs) == data


def test_lzw_roundtrip_repetitive_stream_with_table_resets():
    """70k symbols of period 3 grows the dictionary past 4096 → the
    encoder must emit CLEAR and the decoder must reset identically."""
    data = b"\x01\x02\x03" * 25000
    assert _lzw_decode(_lzw_encode(data, 2), 2) == data


def test_lzw_kwkwk_case():
    """The classic code==next_code case (cScSc): decoder must synthesize
    prev + prev[0] for a code not yet in its table."""
    data = b"\x01\x01\x01\x01\x01\x01"
    assert _lzw_decode(_lzw_encode(data, 2), 2) == data


def test_lzw_rejects_garbage():
    with pytest.raises(ValueError):
        _lzw_decode(b"\xff\xff\xff\xff\xff\xff\xff\xff", 2)
    with pytest.raises(ValueError):
        _lzw_decode(b"", 2)  # truncated before end code


def test_gif_roundtrip_multiframe():
    frames = [bytes((i * 7 + f * 3) % 16 for i in range(64)) for f in range(5)]
    data = encode_gif(frames, 8, 8)
    raw, w, h, nf = decode_gif(data)
    assert (w, h, nf) == (8, 8, 5)
    assert raw == b"".join(frames)


def test_gif_golden_header_layout():
    data = encode_gif([bytes(64)], 8, 8, color_bits=4)
    assert data[:6] == b"GIF89a"
    assert struct.unpack("<HH", data[6:10]) == (8, 8)
    assert data[10] & 0x80  # global color table present
    assert data[10] & 7 == 3  # 2^4 entries
    assert data[-1] == 0x3B  # trailer


def test_gif_reencoded_variant_same_frames():
    frames = [bytes((i * 5 + f) % 16 for i in range(64)) for f in range(3)]
    a = encode_gif(frames, 8, 8)
    b = encode_gif(frames, 8, 8, extra_app_ext=b"v2")
    assert a != b
    assert decode_gif(a)[0] == decode_gif(b)[0]


@pytest.mark.parametrize(
    "mutate",
    [
        lambda g: b"NOTG" + g[4:],  # bad signature
        lambda g: g[:20],  # truncated mid-structure
        lambda g: g[:-1],  # missing trailer
        lambda g: g[:6] + b"\x00\x00\x00\x00" + g[10:],  # zero screen size
    ],
)
def test_gif_corruption_raises_valueerror(mutate):
    g = encode_gif([bytes(range(16)) * 4], 8, 8)
    with pytest.raises(ValueError):
        decode_gif(mutate(g))


def test_gif_unsupported_variants_raise():
    g = bytearray(encode_gif([bytes(64)], 8, 8))
    # flip the interlace bit in the image descriptor flags
    pos = g.index(0x2C)
    g[pos + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(g))


def test_gif_frame_size_validation():
    with pytest.raises(ValueError):
        encode_gif([bytes(63)], 8, 8)  # short frame
    with pytest.raises(ValueError):
        encode_gif([bytes([16] * 64)], 8, 8, color_bits=4)  # index overflow
    with pytest.raises(ValueError):
        encode_gif([], 8, 8)
