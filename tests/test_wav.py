"""From-scratch WAV codec + audio kernels: golden round-trips,
closed-form feature checks on a synthesized sine, poisoned-row errors,
and chunk-reordered re-encodes pairing through the perceptual pipeline
(the audio twin of the PNG re-encode case)."""

from __future__ import annotations

import math
import struct

import pytest

from spark_deal_observer_spark.multimodal.media import (
    extract_audio_features,
    phash_dedup_pairs_2d,
    sample_frames,
)
from spark_deal_observer_spark.multimodal.wav import decode_wav, encode_wav


def _sine(freq=440, rate=8000, ms=100, amp=10000):
    n = rate * ms // 1000
    return (
        b"".join(
            struct.pack("<h", int(amp * math.sin(2 * math.pi * freq * i / rate)))
            for i in range(n)
        ),
        rate,
    )


def test_roundtrip_and_multi_data_chunks():
    pcm, rate = _sine()
    wav = encode_wav(pcm, rate)
    got, r, ch = decode_wav(wav)
    assert (got, r, ch) == (pcm, rate, 1)
    # extra ignorable chunk: different bytes, identical decode
    wav2 = encode_wav(pcm, rate, extra_chunk=(b"LIST", b"INFOx"))
    assert wav2 != wav
    assert decode_wav(wav2) == (pcm, rate, 1)


def test_corruption_raises_valueerror():
    pcm, rate = _sine(ms=10)
    wav = encode_wav(pcm, rate)
    with pytest.raises(ValueError, match="signature"):
        decode_wav(b"RIFX" + wav[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(wav[:-3])
    # 8-bit format tag rejected
    bad = bytearray(wav)
    fmt_at = wav.index(b"fmt ") + 8
    bad[fmt_at + 14 : fmt_at + 16] = struct.pack("<H", 8)
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(bad))


def _audio_df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p), "audio/wav", 0, 0) for i, p in enumerate(rows, 1)],
        "doc_id BIGINT, payload BINARY, codec STRING, width INT, height INT",
    )


def test_audio_features_closed_form(spark):
    pcm, rate = _sine(freq=440, rate=8000, ms=100, amp=10000)
    feats = extract_audio_features(
        _audio_df(spark, [encode_wav(pcm, rate)])
    ).first()
    assert feats["n_samples"] == 800
    assert feats["sample_rate"] == 8000
    assert feats["duration_ms"] == 100.0
    # sine RMS = A/sqrt(2); discrete sampling keeps it within 1%
    assert abs(feats["rms"] - 10000 / math.sqrt(2)) < 100
    # zero crossings of a 440 Hz tone at 8 kHz: ~2f/sr per sample
    assert abs(feats["zero_cross_rate"] - 2 * 440 / 8000) < 0.01


def test_audio_frames_and_reencode_pairs_perceptually(spark):
    """The shared media kernels run unchanged over audio: frame sampling
    slices real PCM, and a chunk-reordered re-encode (different payload
    bytes, identical samples) pairs at Hamming 0 through the perceptual
    pipeline while an inverted-phase+detuned clip does not."""
    pcm_a, rate = _sine(freq=440, ms=200)
    pcm_b, _ = _sine(freq=1333, ms=200, amp=3000)
    wav_a = encode_wav(pcm_a, rate)
    wav_a2 = encode_wav(pcm_a, rate, extra_chunk=(b"LIST", b"INFO" + b"y" * 33))
    wav_b = encode_wav(pcm_b, rate)
    assert wav_a2 != wav_a

    media = _audio_df(spark, [wav_a, wav_a2, wav_b])
    frames = sample_frames(media.where("doc_id = 1"))
    assert frames.count() > 0  # 64-byte PCM frames, every 4th kept

    pairs = {
        (r["doc_a"], r["doc_b"]): (r["hamming"], r["is_dup"])
        for r in phash_dedup_pairs_2d(media).collect()
    }
    assert pairs[(1, 2)] == (0, True)
    for p, (ham, dup) in pairs.items():
        if p != (1, 2):
            assert not dup, (p, ham)
