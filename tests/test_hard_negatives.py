"""Contrastive hard-negative mining: the three properties that make a
negative pair TABLE useful for contrastive training — exclusion (no
returned pair is an LSH duplicate candidate), hardness (returned
cosines sit far above the random-pair baseline), and the usual top-k
output contract."""

from __future__ import annotations

from conftest import SF_ORACLE

from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.dedup import _band_rows
from spark_deal_observer_spark.operators.similarity import cosine_spark, hard_negatives
from spark_deal_observer_spark.operators.ranking import hashed_doc_embeddings
from spark_deal_observer_spark.sources.tables import load_table


def test_exclusion_hardness_and_contract(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    out = hard_negatives(docs).collect()
    assert out

    # exclusion: no returned pair shares any LSH band bucket
    pairs = {(r.query_doc, r.neg_doc) for r in out}
    bands = _band_rows(docs)
    qids = {q for q, _ in pairs}
    qb = bands.where(F.col("doc_id").isin(list(qids)))
    cand = (
        bands.join(
            qb.select(F.col("doc_id").alias("q"), "band", "key"), ["band", "key"]
        )
        .where(F.col("doc_id") != F.col("q"))
        .select("q", "doc_id")
        .collect()
    )
    lsh_pairs = {(r.q, r.doc_id) for r in cand}
    assert not (pairs & lsh_pairs), "returned a near-duplicate as a negative"

    # hardness: mean returned cosine must beat the corpus random-pair
    # baseline by a wide margin (these are the TOP similar non-dups)
    emb = hashed_doc_embeddings(docs)
    base = (
        emb.where("doc_id % 97 = 0").select(F.col("embedding").alias("a"))
        .crossJoin(
            F.broadcast(
                emb.where("doc_id % 89 = 3").select(F.col("embedding").alias("b"))
            )
        )
        .select(F.expr(cosine_spark("a", "b")).alias("c"))
        .agg(F.avg("c"))
        .collect()[0][0]
    )
    mined = sum(r.cosine for r in out) / len(out)
    assert mined > base + 0.2, (mined, base)

    # contract: contiguous ranks, sorted cosines, k-bounded
    byq = {}
    for r in out:
        byq.setdefault(r.query_doc, []).append(r)
    for q, rs in byq.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        cs = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert cs == sorted(cs, reverse=True)
