"""Raw actor-event decode pipeline: the reference's ingest path, Spark-first.

Reference flow (backend/lib/deal-observer.js:35-40, rpc-service/service.js:
51-86, rpc-service/utils.js:19-53): fetch raw events whose entries are
base64pad(dag-CBOR) key/values, decode+validate into ClaimEvents, reshape
into ActiveDeal rows.

Here:
  * `synth_raw_events` manufactures fixture-shaped RawActorEvent rows
    (FIXTURES.md §1) from the synthetic `events` table — deterministic, so
    the decoded output is oracle-checkable against a plain relational
    derivation (roundtrip identity).
  * `decode_raw_events` is the decode: ONE Arrow-batched mapInPandas pass
    (the single Python boundary, mirroring §2.8 — CBOR has no JVM builtin),
    yielding typed BlockEvent/ClaimEvent columns.
  * `claims_to_deals` is the F8 reshape (backend/lib/utils.js:11-27) as pure
    column expressions.

Unknown event types are counted and dropped (strict mode raises), mirroring
service.js:80-82's reject-unknown behavior.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.cbor import CID, b64pad_decode, b64pad_encode, cbor_decode, cbor_encode

if TYPE_CHECKING:
    import pandas as pd

DAG_CBOR_CODEC = 81  # dag-CBOR; the reference only accepts codec 81 (utils.js:30-35)

ENTRY_SCHEMA = StructType(
    [
        StructField("Codec", IntegerType()),
        StructField("Flags", IntegerType()),
        StructField("Key", StringType()),
        StructField("Value", StringType()),
    ]
)

RAW_EVENT_SCHEMA = StructType(
    [
        StructField("emitter", StringType()),
        StructField("height", IntegerType()),
        StructField("reverted", BooleanType()),
        StructField("entries", ArrayType(ENTRY_SCHEMA)),
        StructField("msg_cid", StringType()),
    ]
)

CLAIM_SCHEMA = StructType(
    [
        StructField("height", IntegerType()),
        StructField("emitter", StringType()),
        StructField("reverted", BooleanType()),
        StructField("event_type", StringType()),
        StructField("claim_id", LongType()),
        StructField("client", LongType()),
        StructField("provider", LongType()),
        StructField("piece_cid", StringType()),
        StructField("piece_size", LongType()),
        StructField("term_min", LongType()),
        StructField("term_max", LongType()),
        StructField("term_start", LongType()),
        StructField("sector", LongType()),
    ]
)

_CLAIM_KEYS = (
    "id",
    "client",
    "provider",
    "piece-cid",
    "piece-size",
    "term-min",
    "term-max",
    "term-start",
    "sector",
)


def _cid_for(n: int) -> CID:
    """Deterministic CIDv1-raw-sha256-shaped bytes for fixture building."""
    digest = bytes((n * (i + 7) + i * i) % 256 for i in range(32))
    return CID(bytes([0x01, 0x55, 0x12, 32]) + digest)


def synth_raw_events(events: DataFrame) -> DataFrame:
    """events table → RawActorEvent-shaped rows with base64pad(CBOR) entries.

    event_type 'error' → reverted claim, other types all encode as 'claim'
    except 'signup' which becomes an unknown type ('allocation') so the
    reject-unknown path has data to reject."""

    from ..operators.dedup import spread_cpu

    def encode(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                etype = "allocation" if r.event_type == "signup" else "claim"
                eid = int(r.event_id)
                values = {
                    "id": eid,
                    "client": eid % 97,
                    "provider": int(r.user_id),
                    "piece-cid": _cid_for(eid),
                    "piece-size": (eid % 64 + 1) * 2**30,
                    "term-min": 518400 + (eid % 5) * 2880,
                    "term-max": 1036800,
                    "term-start": 4622000 + eid % 2000,
                    "sector": eid % 1024,
                }
                entries = [
                    (DAG_CBOR_CODEC, 3, "$type", b64pad_encode(cbor_encode(etype)))
                ] + [
                    (DAG_CBOR_CODEC, 3, k, b64pad_encode(cbor_encode(values[k])))
                    for k in _CLAIM_KEYS
                ]
                rows.append(
                    {
                        "emitter": "f06",
                        "height": 4622000 + eid % 2000,
                        "reverted": r.event_type == "error",
                        "entries": entries,
                        "msg_cid": str(_cid_for(eid + 1)),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RAW_EVENT_SCHEMA.fields])

    # The pure-Python CBOR encode is ~1000× heavier per row than the scan;
    # a small parquet file arrives as one split, which would serialize the
    # whole pass onto a single Python worker. Spread first.
    return spread_cpu(events).mapInPandas(encode, RAW_EVENT_SCHEMA)


def decode_raw_events(raw: DataFrame, strict: bool = False) -> DataFrame:
    """RawActorEvent rows → typed claim rows (the F3/F4/F7/F15 chain).

    Decodes every entry (base64pad + dag-CBOR), pivots the Key/Value list
    into one record, validates the event type. Non-'claim' events are
    dropped (or raise when strict), mirroring service.js:66-83."""

    def decode(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                record: dict[str, object] = {}
                for e in r.entries:
                    codec, _flags, key, value = e["Codec"], e["Flags"], e["Key"], e["Value"]
                    if codec != DAG_CBOR_CODEC:
                        raise ValueError(f"unsupported entry codec {codec}")
                    record[key] = cbor_decode(b64pad_decode(value))
                etype = record.get("$type")
                if etype != "claim":
                    if strict:
                        raise ValueError(f"unknown event type {etype!r}")
                    continue
                rows.append(
                    {
                        "height": int(r.height),
                        "emitter": r.emitter,
                        "reverted": bool(r.reverted),
                        "event_type": str(etype),
                        "claim_id": int(record["id"]),
                        "client": int(record["client"]),
                        "provider": int(record["provider"]),
                        "piece_cid": str(record["piece-cid"]),
                        "piece_size": int(record["piece-size"]),
                        "term_min": int(record["term-min"]),
                        "term_max": int(record["term-max"]),
                        "term_start": int(record["term-start"]),
                        "sector": int(record["sector"]),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in CLAIM_SCHEMA.fields])

    return raw.mapInPandas(decode, CLAIM_SCHEMA)


def claims_to_deals(claims: DataFrame) -> DataFrame:
    """ClaimEvent → ActiveDeal reshape (backend/lib/utils.js:11-27): rename
    provider→miner_id etc., default enrichment columns. Pure projection."""
    return claims.select(
        F.col("height").alias("activated_at_epoch"),
        F.col("provider").cast("int").alias("miner_id"),
        F.col("client").cast("int").alias("client_id"),
        "piece_cid",
        "piece_size",
        F.col("term_start").cast("int").alias("term_start_epoch"),
        F.col("term_min").cast("int").alias("term_min"),
        F.col("term_max").cast("int").alias("term_max"),
        F.col("sector").alias("sector_id"),
        F.lit(None).cast("string").alias("payload_cid"),
        F.lit("PAYLOAD_CID_NOT_QUERIED_YET").alias("payload_retrievability_state"),
        "reverted",
    )


ROUTED_SCHEMA = StructType(
    list(CLAIM_SCHEMA.fields)
    + [StructField("dlq_reason", StringType()), StructField("msg_cid", StringType())]
)


def decode_raw_events_routed(raw: DataFrame) -> DataFrame:
    """Decode with a DEAD-LETTER route instead of drop-or-crash: every input
    row lands in the output exactly once — decoded claims with
    `dlq_reason IS NULL`, undecodable/unknown rows with their reason and
    `msg_cid` (the reprocessing handle) and NULL claim fields.

    The third point on the strictness spectrum (`decode_raw_events`: lax
    drops silently with a counter, strict raises): production ingest wants
    neither data loss nor a poison-pill crash loop — quarantine the bad
    rows, keep the stream moving, replay the DLQ after a codec fix. The
    reference hard-fails on unknown types (service.js:80-82) because its
    loop retries the same epoch forever; a micro-batch engine must instead
    bound the blast radius of one bad event. Same Arrow-batched single
    pass as the lax decoder; downstream splits with two narrow filters on
    `dlq_reason`."""

    def decode(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cols = [f.name for f in ROUTED_SCHEMA.fields]
        empty_claim = {f.name: None for f in CLAIM_SCHEMA.fields}

        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                try:
                    record: dict[str, object] = {}
                    for e in r.entries:
                        codec, _flags, key, value = (
                            e["Codec"], e["Flags"], e["Key"], e["Value"],
                        )
                        if codec != DAG_CBOR_CODEC:
                            raise ValueError(f"unsupported entry codec {codec}")
                        record[key] = cbor_decode(b64pad_decode(value))
                    etype = record.get("$type")
                    if etype != "claim":
                        # keep the raw row's envelope fields (they decoded
                        # fine) so quarantined events can be triaged without
                        # re-reading the raw stream
                        rows.append(
                            {**empty_claim,
                             "height": int(r.height),
                             "emitter": r.emitter,
                             "reverted": bool(r.reverted),
                             "dlq_reason": f"unknown event type {etype!r}",
                             "msg_cid": r.msg_cid}
                        )
                        continue
                    rows.append(
                        {
                            "height": int(r.height),
                            "emitter": r.emitter,
                            "reverted": bool(r.reverted),
                            "event_type": str(etype),
                            "claim_id": int(record["id"]),
                            "client": int(record["client"]),
                            "provider": int(record["provider"]),
                            "piece_cid": str(record["piece-cid"]),
                            "piece_size": int(record["piece-size"]),
                            "term_min": int(record["term-min"]),
                            "term_max": int(record["term-max"]),
                            "term_start": int(record["term-start"]),
                            "sector": int(record["sector"]),
                            "dlq_reason": None,
                            "msg_cid": r.msg_cid,
                        }
                    )
                except Exception as exc:  # noqa: BLE001 — quarantine, never crash
                    rows.append(
                        {**empty_claim,
                         "height": int(r.height),
                         "emitter": r.emitter,
                         "reverted": bool(r.reverted),
                         "dlq_reason": f"{type(exc).__name__}: {exc}",
                         "msg_cid": r.msg_cid}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(decode, ROUTED_SCHEMA)
