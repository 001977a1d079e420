"""From-scratch WAV (RIFF/PCM) codec — the SECOND real media format
behind `media.decode_media` (multimodal/png.py is the first), so the
audio leg of the multimodal pipeline (feature extraction, frame
sampling, perceptual dedup) demonstrably runs over real decoded PCM
samples, not a stand-in.

Public-knowledge implementation of the RIFF/WAVE container (Microsoft
WAVE spec / RFC 2361 registry): little-endian `RIFF` size `WAVE`
header, word-aligned `<id><size><body>` chunks, `fmt ` geometry, one or
more `data` chunks concatenated in order. Scope is the subset a
training-data pipeline actually stores: format tag 1 (integer PCM),
16-bit samples. Anything else raises ValueError — a decode error must
surface as a poisoned row, never as silently wrong samples. The encoder
writes a canonical minimal file and can inject an extra ignorable chunk
(e.g. `LIST`), which is how the tests build a RE-ENCODED file: different
payload bytes, identical PCM.

Reference analog: none — this module belongs to the LLM-data-pipeline
mandate (multimodal columns over opaque binary payloads).
"""

from __future__ import annotations

import struct


def decode_wav(data: bytes) -> tuple[bytes, int, int]:
    """WAV bytes -> (PCM sample bytes, sample_rate, n_channels).

    Verifies the RIFF/WAVE signature, walks word-aligned chunks,
    requires 16-bit integer PCM, and concatenates every `data` chunk.
    Raises ValueError on corruption or unsupported variants."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos, fmt, pcm = 12, None, bytearray()
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm += body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("no fmt chunk")
    if not pcm:
        raise ValueError("no data chunk")
    audio_format, channels, rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported format/bits: {audio_format}/{bits}")
    if channels < 1 or rate < 1:
        raise ValueError("invalid channel count or sample rate")
    if len(pcm) % (2 * channels):
        raise ValueError("PCM length does not match frame geometry")
    return bytes(pcm), rate, channels


def encode_wav(
    pcm: bytes,
    sample_rate: int,
    channels: int = 1,
    extra_chunk: tuple[bytes, bytes] | None = None,
) -> bytes:
    """PCM 16-bit sample bytes -> minimal canonical WAV. `extra_chunk`
    injects an ignorable (id, body) chunk before `data` — a different
    ENCODING of the same samples, for re-encode tests."""
    if len(pcm) % (2 * channels):
        raise ValueError("PCM length does not match frame geometry")
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    chunks = chunk(b"fmt ", fmt)
    if extra_chunk is not None:
        chunks += chunk(*extra_chunk)
    chunks += chunk(b"data", pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
