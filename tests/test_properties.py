"""Property-based tests (hypothesis) for the portable primitives.

The oracle suite checks fixed corpora; these check the algebraic contracts
on adversarial inputs: CBOR encode/decode is an identity, epoch conversion
round-trips, and the cross-engine hash expressions agree with an
independent Python reference on arbitrary strings (the property the whole
near-dup family rests on)."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_deal_observer_spark.functions.cbor import (
    CID,
    b64pad_decode,
    b64pad_encode,
    cbor_decode,
    cbor_encode,
)
from spark_deal_observer_spark.functions.hashing import (
    _MINHASH_PRIME,
    MINHASH_PERMS,
    hash32_sql,
    minhash_from_hashed_sql,
)

# dag-CBOR values the event pipeline actually carries: unsigned/negative
# ints, text, byte strings, CIDs (tag 42), and entry-shaped nesting.
scalar = st.one_of(
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.text(max_size=80),
    st.binary(max_size=80),
    st.builds(CID, st.binary(min_size=1, max_size=40)),
)
value = st.recursive(
    scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=6),
        st.dictionaries(st.text(max_size=20), inner, max_size=6),
    ),
    max_leaves=20,
)


@given(value)
@settings(max_examples=300, deadline=None)
def test_cbor_roundtrip(v):
    assert cbor_decode(cbor_encode(v)) == v


@given(st.binary(max_size=200))
@settings(max_examples=300, deadline=None)
def test_b64pad_roundtrip(b):
    assert b64pad_decode(b64pad_encode(b)) == b


def _hash32_py(s: str) -> int:
    """Independent reference for hash32_sql: md5 hex prefix as an integer."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


@given(st.lists(st.text(max_size=40), min_size=1, max_size=50))
@settings(max_examples=30, deadline=None)
def test_duckdb_hash32_matches_python_reference(strings):
    con = duckdb.connect()
    for s in strings:
        got = con.execute(f"SELECT {hash32_sql('$1', 'duckdb')}", [s]).fetchone()[0]
        assert got == _hash32_py(s), s


@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=20),
       st.integers(min_value=0, max_value=len(MINHASH_PERMS) - 1))
@settings(max_examples=50, deadline=None)
def test_duckdb_minhash_matches_python_reference(hashes, perm):
    a, b = MINHASH_PERMS[perm]
    expected = min((a * (h % _MINHASH_PRIME) + b) % _MINHASH_PRIME for h in hashes)
    # the real pipeline's hashed arrays are BIGINT (hash32_sql casts); a bare
    # literal list would be INT32 and overflow the permutation multiply
    arr = "CAST([" + ",".join(str(h % _MINHASH_PRIME) for h in hashes) + "] AS BIGINT[])"
    got = duckdb.sql(
        f"SELECT {minhash_from_hashed_sql('duckdb', arr, perm)}"
    ).fetchone()[0]
    assert got == expected


def test_spark_and_duckdb_hash32_agree_on_fuzz_corpus(spark):
    """One batch check over a diverse corpus: the Spark and DuckDB hash
    expressions produce identical values (run as a single job — the
    per-example form would pay JVM latency 300×)."""
    corpus = (
        [f"s{i}" for i in range(50)]
        + ["", " ", "'", '"', "\\", "\t", "üñïçødé", "🙂🙃", "a" * 500]
        + [chr(0x100 + i) * (i % 7 + 1) for i in range(50)]
    )
    sdf = spark.createDataFrame([(s,) for s in corpus], ["s"])
    spark_vals = [
        r["h"] for r in sdf.selectExpr(f"{hash32_sql('s', 'spark')} AS h").collect()
    ]
    con = duckdb.connect()
    duck_vals = [
        con.execute(f"SELECT {hash32_sql('$1', 'duckdb')}", [s]).fetchone()[0]
        for s in corpus
    ]
    py_vals = [_hash32_py(s) for s in corpus]
    assert spark_vals == duck_vals == py_vals


# -- connected components vs a reference union-find -------------------------


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min always roots ⇒ label = component min
    return {n: find(n) for n in parent}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=60,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Random small graphs: the iterative min-label propagation must land on
    exactly the union-find components with component-min labels."""
    from spark_deal_observer_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_a LONG, doc_b LONG"
    )
    got = {r.doc_id: r.cluster for r in connected_components(pairs).collect()}
    want = _uf_components([(int(a), int(b)) for a, b in edges])
    assert got == want
