"""PII scrub + repetition filter semantics on synthetic rows (the corpus
texts rarely contain PII, so the registered queries alone would only prove
the all-zero case)."""

from __future__ import annotations

from spark_deal_observer_spark.functions.text import with_pii_scrub, with_repetition


def test_pii_scrub_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact alice@example.com or +1 (555) 123-4567 now"),
            (2, "server at 192.168.10.1 responded"),
            (3, "no pii here at all"),
            (4, "two mails: a@b.io and c.d@e-corp.org"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r for r in with_pii_scrub(docs).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 1, 0)
    assert "<EMAIL>" in out[1]["scrubbed"] and "<PHONE>" in out[1]["scrubbed"]
    assert "alice" not in out[1]["scrubbed"] and "555" not in out[1]["scrubbed"]
    assert out[2]["n_ipv4"] == 1 and "<IPV4>" in out[2]["scrubbed"]
    assert out[3]["scrubbed"] == "no pii here at all"
    assert out[4]["n_email"] == 2 and out[4]["scrubbed"].count("<EMAIL>") == 2


def test_repetition_fraction_flags_looping_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam ham eggs " * 20),  # one 3-gram cycle repeated
            (2, "the quick brown fox jumps over the lazy dog"),  # all distinct
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r for r in with_repetition(docs).collect()}
    assert out[1]["dup_ngram_frac"] > 0.9
    assert out[2]["dup_ngram_frac"] == 0.0


def test_pii_scrub_matches_oracle_on_synthetic_rows(spark):
    """Run the SAME synthetic rows through the DuckDB twin — the engines
    must agree even on PII-dense text, not just the corpus's zero case."""
    import duckdb

    from spark_deal_observer_spark.functions.text import pii_scrub_sql

    rows = [
        (1, "contact alice@example.com or +1 (555) 123-4567 now"),
        (2, "ip 10.0.0.255 and mail x.y+z@host.museum"),
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = sorted(tuple(r) for r in with_pii_scrub(docs).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    cols = ", ".join(
        f"CAST({e} AS INT) AS {k}" if k.startswith("n_") else f"{e} AS {k}"
        for k, e in pii_scrub_sql("duckdb", "text").items()
    )
    want = sorted(tuple(r) for r in con.execute(f"SELECT doc_id, {cols} FROM documents").fetchall())
    assert got == want
