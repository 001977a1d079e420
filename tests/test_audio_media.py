"""Audio media leg: WAV round-trip features, Haar spectral fingerprint,
re-encode-invariant perceptual dedup. Oracle parity at sf0.01 is auto-swept
by test_oracle_parity; these pin kernel-level physics the value diff can't:
octave-band energy placement and container invariance at Hamming 0."""

from __future__ import annotations

import numpy as np

from spark_deal_observer_spark.multimodal.media import (
    AUDIO_RATE,
    attach_audio,
    audio_phash_dedup_pairs,
    audio_spectral_means,
    extract_audio_features,
)
from spark_deal_observer_spark.multimodal.wav import decode_wav, encode_wav


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "unit", len(t)) for i, t in enumerate(rows)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )


def _media(spark, rows):
    """(doc_id, pcm_int16_array, inject_extra_chunk) -> media table."""
    data = [
        (
            d,
            encode_wav(
                np.asarray(pcm, dtype="<i2").tobytes(),
                AUDIO_RATE,
                1,
                extra_chunk=(b"LIST", b"INFO") if extra else None,
            ),
            "audio/wav",
            0,
            0,
        )
        for d, pcm, extra in rows
    ]
    return spark.createDataFrame(
        data,
        "doc_id BIGINT, payload BINARY, codec STRING, width INT, height INT",
    )


def test_attach_audio_is_decodable_real_wav(spark):
    media = attach_audio(_docs(spark, ["hello world this is a doc " * 4]))
    row = media.collect()[0]
    pcm, rate, ch = decode_wav(bytes(row.payload))
    assert rate == AUDIO_RATE and ch == 1
    assert len(pcm) == 2 * 8 * len("hello world this is a doc " * 4)


def test_audio_features_match_hand_computation(spark):
    text = "ab" * 40
    feats = extract_audio_features(attach_audio(_docs(spark, [text]))).collect()[0]
    codes = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int64)
    s = ((codes[:, None] * 257 + np.arange(8) * 193) % 4096 - 2048).ravel()
    assert feats.n_samples == len(s)
    assert feats.duration_ms == round(len(s) / AUDIO_RATE * 1000.0, 6)
    assert feats.rms == round(float(np.sqrt(np.mean((s * s).astype(float)))), 6)
    zc = np.mean(np.signbit(s[1:]) != np.signbit(s[:-1]))
    assert feats.zero_cross_rate == round(float(zc), 6)


def test_haar_energy_lands_in_the_right_octave(spark):
    """A period-2 alternating signal is pure highest-band: ALL detail
    energy at level 1 (buckets 0..15), zero at levels 2-4. A constant
    signal has zero detail energy everywhere."""
    n = 512
    alt = [1000 if i % 2 == 0 else -1000 for i in range(n)]
    const = [700] * n
    bm = audio_spectral_means(
        _media(spark, [(1, alt, False), (2, const, False)])
    ).collect()
    by_doc: dict[int, dict[int, float]] = {}
    for r in bm:
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.mean
    assert all(by_doc[1][b] > 0 for b in range(16)), "level-1 energy missing"
    assert all(by_doc[1][b] == 0.0 for b in range(16, 64)), "energy leaked down"
    assert all(by_doc[2][b] == 0.0 for b in range(64))


def test_reencoded_audio_pairs_at_hamming_zero(spark):
    """Same PCM, different RIFF encodings (injected ignorable chunk) must
    fingerprint identically — the pair surfaces at Hamming 0; an unrelated
    signal must not pair with them as a dup."""
    rng = np.random.default_rng(7)
    a = rng.integers(-2000, 2000, size=600).tolist()
    other = rng.integers(-2000, 2000, size=600).tolist()
    pairs = audio_phash_dedup_pairs(
        _media(spark, [(1, a, False), (2, a, True), (3, other, False)])
    ).collect()
    got = {(r.doc_a, r.doc_b): (r.hamming, r.is_dup) for r in pairs}
    assert got[(1, 2)] == (0, True)
    assert all(not v[1] for k, v in got.items() if k != (1, 2))
