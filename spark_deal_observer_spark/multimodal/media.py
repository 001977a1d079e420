"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas functions via mapInPandas.

A 100 TB multimodal corpus stores media as `binary` columns next to a typed
metadata struct; decode/resize/feature-extraction runs as mapInPandas so
each Arrow batch crosses the JVM↔Python boundary once. `decode_media`
supports the `fake/*` identity codec (the deterministic, oracle-checkable
path) and REAL PNG via the from-scratch stdlib-zlib decoder in
`multimodal/png.py`; codecs that would need external libraries
(JPEG/ffmpeg) raise NotImplementedError. The plumbing — schema, batch
iteration, partition-preserving mapInPandas shape — is identical for all
codecs, so the fake-path oracle checks validate the same kernels the PNG
path runs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("codec", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("num_bytes", IntegerType()),
        StructField("first_byte", IntegerType()),
        StructField("content_md5", StringType()),
    ]
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Wrap documents as a media table: binary payload + typed metadata.

    Payload is the UTF-8 encoding of `text` under the `fake/text` codec —
    a deterministic stand-in for real image bytes. The scan is spread to
    full parallelism first: every downstream media kernel is CPU-bound
    Python, and a small file would otherwise feed a single worker."""
    from ..operators.dedup import spread_cpu

    docs = spread_cpu(docs)
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("fake/text").alias("codec"),
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
    )


def decode_media(payload: bytes, codec: str) -> bytes:
    """Decode a media payload to raw content bytes.

    `fake/*` is the identity transform (the oracle-checkable path);
    `image/png` is a REAL codec — the from-scratch RFC 2083 decoder in
    `multimodal/png.py` (stdlib zlib), returning row-major pixel bytes,
    so every downstream kernel (features/resize/frames) runs on real
    decoded pixels for at least one production format. Codecs that would
    need external libraries (JPEG/ffmpeg) still raise."""
    if codec.startswith("fake/"):
        return payload
    if codec in ("image/png", "png"):
        from .png import decode_png

        return decode_png(payload)[0]
    raise NotImplementedError(
        f"codec {codec!r}: real decoders (PIL/ffmpeg) are not installed; "
        "only fake/* and image/png are supported here"
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("num_bytes", IntegerType()),
        StructField("content_md5", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def resize_media(media: DataFrame, target_bytes: int) -> DataFrame:
    """Resize pass: decode → byte-level downscale → re-encode, per Arrow batch.

    With real codecs this is PIL `Image.resize`; the fake codec's "resize" is
    a deterministic truncation to `target_bytes` so the oracle can recompute
    it. The plumbing (binary in, binary out, 1:1 rows, mapInPandas batch
    shape) is exactly what the real kernel needs."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            resized = [
                decode_media(bytes(p), c)[:target_bytes]
                for p, c in zip(pdf["payload"], pdf["codec"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "num_bytes": pd.Series([len(b) for b in resized], dtype="int32"),
                    "content_md5": [hashlib.md5(b).hexdigest() for b in resized],
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 64, every_k: int = 4) -> DataFrame:
    """Frame sampling: split each payload into fixed-size frames, keep every
    k-th — the video-keyframe pattern as a row-expanding (1:N) mapInPandas.

    With real codecs the frames come from ffmpeg; here a frame is a
    `frame_bytes` slice of the decoded payload (last frame may be short)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            md5s: list[str] = []
            for d, p, c in zip(pdf["doc_id"], pdf["payload"], pdf["codec"]):
                b = decode_media(bytes(p), c)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_k):
                    ids.append(d)
                    idxs.append(i)
                    md5s.append(
                        hashlib.md5(b[i * frame_bytes : (i + 1) * frame_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Byte-level feature extraction through mapInPandas (Arrow batches).

    Features are deterministic (length, first byte, md5) so the DuckDB
    oracle can recompute them from the source text — which makes the whole
    binary → pandas → features plumbing value-checkable."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            decoded = [
                decode_media(bytes(p), c) for p, c in zip(pdf["payload"], pdf["codec"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "num_bytes": [len(b) for b in decoded],
                    "first_byte": [b[0] if len(b) else -1 for b in decoded],
                    "content_md5": [hashlib.md5(b).hexdigest() for b in decoded],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def media_features_oracle() -> str:
    """DuckDB twin of attach_media ∘ extract_features (ASCII corpus: the
    first byte is the first character's code point)."""
    return """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS num_bytes,
               CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
               md5(text) AS content_md5
        FROM documents
    """
