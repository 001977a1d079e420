"""Randomized contract tests for the round-3 operator families: the
bucketed range join equals the naive theta-join, the k-NN join equals
per-bucket brute force, and stratified sampling is a deterministic pure
function of the keys."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from spark_deal_observer_spark.operators.intervals import interval_range_join
from spark_deal_observer_spark.operators.similarity import _N_SIGN_BITS, knn_join


def _random_events(spark, seed: int, n: int = 400):
    rng = random.Random(seed)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                base + dt.timedelta(seconds=rng.randrange(0, 6 * 3600)),
                rng.randrange(0, 12),  # few users -> windows genuinely overlap
                rng.choice(["error", "purchase", "view"]),
            )
        )
    return spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING"
    )


def test_bucketed_range_join_equals_theta_join(spark):
    """The bucket decomposition must compute exactly the BETWEEN relation —
    including windows that straddle a bucket boundary (the 2-bucket case)."""
    for seed in (7, 23, 99):
        ev = _random_events(spark, seed)
        got = {
            (r["error_event_id"], r["event_id"])
            for r in interval_range_join(ev).collect()
        }
        w = ev.where(F.col("event_type") == "error").select(
            F.col("event_id").alias("weid"),
            F.col("user_id").alias("wuid"),
            F.col("ts").alias("ws"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("we"),
        )
        p = ev.where(F.col("event_type") == "purchase")
        naive = {
            (r["weid"], r["event_id"])
            for r in p.join(
                w,
                (p.user_id == w.wuid) & (p.ts > w.ws) & (p.ts <= w.we),
            ).collect()
        }
        assert got == naive, f"seed {seed}"


def test_knn_join_equals_per_bucket_brute_force(spark):
    """Within each sign-LSH bucket the kNN join must return exactly the
    brute-force top-k by (cosine desc, neighbor asc)."""
    from conftest import SF_SMALL

    from spark_deal_observer_spark.operators.similarity import (
        _bucket_spark,
        _dot_spark,
    )
    from spark_deal_observer_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    got = {
        (r["vec_id"], r["rank"]): (r["neighbor"], r["cosine"])
        for r in knn_join(emb).collect()
    }

    rows = emb.select(
        "vec_id",
        F.expr(_bucket_spark("embedding", _N_SIGN_BITS)).alias("bucket"),
        F.expr(f"sqrt({_dot_spark('embedding', 'embedding')})").alias("nrm"),
        "embedding",
    ).collect()
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    want = {}
    for members in by_bucket.values():
        for a in members:
            cands = []
            for b in members:
                if b["vec_id"] == a["vec_id"]:
                    continue
                dot = sum(x * y for x, y in zip(a["embedding"], b["embedding"]))
                cands.append((round(dot / (a["nrm"] * b["nrm"]), 6), b["vec_id"]))
            cands.sort(key=lambda t: (-t[0], t[1]))
            for rank, (cos, vid) in enumerate(cands[:3], 1):
                want[(a["vec_id"], rank)] = (vid, cos)
    assert got == want


def test_stratified_sample_is_pure_function_of_keys(spark):
    """Same keys in, same rows out — regardless of row order or partitioning
    — and every kept row's bucket respects its stratum's rate."""
    from conftest import SF_SMALL

    from spark_deal_observer_spark.operators.corpus import (
        DEFAULT_RATE,
        STRATA_RATES,
        stratified_sample,
    )
    from spark_deal_observer_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    a = sorted(tuple(r) for r in stratified_sample(docs).collect())
    b = sorted(
        tuple(r)
        for r in stratified_sample(docs.repartition(13).orderBy(F.rand(5))).collect()
    )
    assert a == b
    rates = dict(STRATA_RATES)
    for doc_id, lang, bucket in a:
        assert bucket < rates.get(lang, DEFAULT_RATE), (doc_id, lang, bucket)


def test_generated_embeddings_feed_the_vector_family(spark):
    """End-to-end composition: the feature-hashed embedding generator's
    output slots directly into knn_join (schema + semantics), and cosine
    of identical texts is 1.0."""
    from conftest import SF_SMALL

    from spark_deal_observer_spark.operators.ranking import hashed_doc_embeddings
    from spark_deal_observer_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents").limit(60)
    vecs = hashed_doc_embeddings(docs).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    out = knn_join(vecs, k=2)
    rows = out.collect()
    assert rows, "expected neighbors within at least one bucket"
    assert set(out.columns) == {"vec_id", "neighbor", "cosine", "rank"}
    # duplicate text ⇒ identical vector ⇒ cosine 1.0 at rank 1
    t = docs.limit(1).collect()[0]["text"]
    dup = spark.createDataFrame([(900001, t), (900002, t)], "doc_id BIGINT, text STRING")
    dup_vecs = hashed_doc_embeddings(dup).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    top = {r["vec_id"]: r for r in knn_join(dup_vecs, k=1).collect()}
    assert top[900001]["neighbor"] == 900002 and abs(top[900001]["cosine"] - 1.0) < 1e-6


def test_canonical_pick_keeps_exactly_one_per_cluster(spark):
    """Every cluster has exactly one keep=true, and it is the member with
    the (score DESC, doc_id ASC)-max quality."""
    from conftest import SF_SMALL

    from spark_deal_observer_spark.plans.registry import REGISTRY

    df = REGISTRY["dedup_canonical_pick"].fn(spark, SF_SMALL)
    per_cluster = df.groupBy("cluster").agg(
        F.sum(F.col("keep").cast("int")).alias("n_keep"),
        F.count("*").alias("n"),
        F.max(F.struct(F.col("score"), -F.col("doc_id"))).alias("best"),
    )
    bad = per_cluster.where(F.col("n_keep") != 1)
    assert bad.count() == 0, bad.collect()[:5]
    # the keeper IS the argmax member
    keepers = df.where("keep").select("cluster", "score", "doc_id")
    joined = keepers.join(per_cluster, "cluster")
    wrong = joined.where(
        (F.col("score") != F.col("best.score")) | (F.col("doc_id") != -F.col("best.col2"))
    )
    assert wrong.count() == 0, wrong.collect()[:5]
    # every document appears exactly once
    n_docs = df.count()
    assert df.select("doc_id").distinct().count() == n_docs


def test_global_shuffle_positions_are_dense_and_deterministic(spark):
    """Within each shard, pos is exactly 0..n_shard-1 (dense, no gaps); the
    layout is a pure function of doc_id (two runs identical); shards are
    roughly balanced (hash uniformity)."""
    from conftest import SF_SMALL

    from spark_deal_observer_spark.plans.registry import REGISTRY

    fn = REGISTRY["corpus_global_shuffle"].fn
    df = fn(spark, SF_SMALL)
    stats = df.groupBy("shard").agg(
        F.count("*").alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("npos"),
    )
    bad = stats.where((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1) | (F.col("npos") != F.col("n")))
    assert bad.count() == 0, bad.collect()
    counts = [r["n"] for r in stats.collect()]
    assert max(counts) < 2.5 * min(counts), counts  # no pathological imbalance
    a = sorted(map(tuple, fn(spark, SF_SMALL).collect()))
    b = sorted(map(tuple, fn(spark, SF_SMALL).collect()))
    assert a == b


# -- round-3 session additions ----------------------------------------------


def _random_docs(spark, seed: int, n: int = 120):
    rng = random.Random(seed)
    vocab = ["the", "a", "data", "spark", "join", "hash", "scan", "zz1", "zz2", "und"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 40))),
         rng.choice(["en", "de"]), f"src{i % 3}", 0)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )


def test_cms_one_sided_on_random_corpora(spark):
    """For random corpora, every probe's estimate bounds its true count
    from above (the CMS guarantee is structural, not data-dependent)."""
    from spark_deal_observer_spark.operators.sketches import cms_token_counts

    for seed in (3, 41):
        docs = _random_docs(spark, seed)
        for r in cms_token_counts(docs).collect():
            assert r.cms_est >= r.true_cnt, (seed, r)


def test_hashed_jaccard_matches_python_sets(spark):
    """The engine's hashed-shingle Jaccard must equal a plain-Python
    reimplementation (same md5 prefix hash) on random near-dup corpora."""
    import hashlib

    from spark_deal_observer_spark.operators.dedup import ngram_jaccard_pairs

    P = 2_147_483_647

    def hset(text: str) -> set:
        k = 5
        n = max(len(text) - k + 1, 1)
        sh = {text[i : i + k] for i in range(n)}
        return {
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % P for s in sh
        }

    rng = random.Random(17)
    base = _random_docs(spark, 5, n=40).collect()
    # make explicit near-dups so candidates exist
    rows = [(r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in base]
    rows += [
        (100 + r.doc_id, r.text + " tail", r.lang, r.source, r.n_chars)
        for r in base[:20]
    ]
    docs = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    texts = {r[0]: r[1] for r in rows}
    got = ngram_jaccard_pairs(docs).collect()
    assert len(got) > 0
    for r in got:
        a, b = hset(texts[r.doc_a]), hset(texts[r.doc_b])
        expect = round(len(a & b) / len(a | b), 6)
        assert abs(r.jaccard - expect) < 1e-9, (r, expect)


def test_grouped_fixed_sample_is_prefix_stable(spark):
    """Reservoir contract: the k-sample of a stratum is a PREFIX of the
    (k+5)-sample (hash order is fixed), and sizes are min(k, |stratum|)."""
    from spark_deal_observer_spark.operators.corpus import grouped_fixed_sample

    docs = _random_docs(spark, 11, n=90)
    small = grouped_fixed_sample(docs, k=5).collect()
    big = grouped_fixed_sample(docs, k=10).collect()
    big_set = {(r.lang, r.doc_id) for r in big}
    assert all((r.lang, r.doc_id) in big_set for r in small)
    from collections import Counter

    sizes = Counter(r.lang for r in small)
    strata = Counter(r.lang for r in docs.collect())
    for lang, n in strata.items():
        assert sizes[lang] == min(5, n)


def test_funnel_counts_are_monotone_nonincreasing(spark):
    """Each funnel rung can only lose users (step i requires step i−1
    first), and no count exceeds the distinct-user total."""
    from spark_deal_observer_spark.operators.sessions import funnel_conversion
    from spark_deal_observer_spark.sources.tables import load_table
    from conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    rows = {r.step_n: r.n_users for r in funnel_conversion(ev).collect()}
    assert list(rows) == [1, 2, 3]
    assert rows[1] >= rows[2] >= rows[3] >= 0
    assert rows[1] <= ev.select("user_id").distinct().count()


def test_cohort_offset_zero_covers_every_user(spark):
    """Every user is active on their own first day, so the day_offset=0
    diagonal sums to the distinct-user count, and offsets are never
    negative."""
    from spark_deal_observer_spark.operators.sessions import cohort_retention
    from spark_deal_observer_spark.sources.tables import load_table
    from conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    rows = cohort_retention(ev).collect()
    assert all(r.day_offset >= 0 for r in rows)
    day0 = sum(r.n_users for r in rows if r.day_offset == 0)
    assert day0 == ev.select("user_id").distinct().count()


def test_psi_of_baseline_against_itself_is_zero(spark):
    """PSI(q ‖ q) = 0 exactly: every term is (p−p)·ln(p/p). The baseline
    source's own row in the drift report must be 0.0."""
    from spark_deal_observer_spark.operators.profile import source_drift_psi
    from spark_deal_observer_spark.sources.tables import load_table
    from conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    rows = {r.source: r.psi for r in source_drift_psi(docs).collect()}
    assert rows["src0"] == 0.0
    assert all(v >= 0.0 for v in rows.values())  # PSI is nonnegative


def test_classifier_eval_consistent_with_scores(spark):
    """The eval report's cells must recompute exactly from the scored rows."""
    from spark_deal_observer_spark.operators.classifier import (
        classifier_eval,
        classifier_scores,
    )
    from spark_deal_observer_spark.sources.tables import load_table
    from conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    ev = classifier_eval(docs).collect()[0]
    rows = classifier_scores(docs).collect()
    n = len(rows)
    tp = sum(1 for r in rows if r.predicted and r.label == 1.0)
    fp = sum(1 for r in rows if r.predicted and r.label == 0.0)
    fn = sum(1 for r in rows if not r.predicted and r.label == 1.0)
    tn = sum(1 for r in rows if not r.predicted and r.label == 0.0)
    assert ev.n == n == tp + fp + fn + tn
    assert ev.accuracy == round((tp + tn) / n, 6)
    assert ev.precision == round(tp / (tp + fp), 6)
    assert ev.recall == round(tp / (tp + fn), 6)
