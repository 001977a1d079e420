"""Document deduplication family for large-scale training-data pipelines.

Five dedup strategies over a `documents(doc_id, text, lang, source, n_chars)`
table, each expressed so the hot path stays JVM-side (generated SQL column
expressions — no Python UDFs) and each with a DuckDB-oracle SQL twin built
from the same formula generators (functions/hashing.py):

  * exact          — md5(normalized text) group-by; one shuffle of 16-byte keys
  * minhash LSH    — shingle → 16 MinHashes → banded keys → bucket self-join;
                     the scale path: candidate pairs are generated per band
                     bucket, never all-pairs
  * simhash        — 32-bit per-doc signature; hamming≤k pairs via xor+bit_count
  * n-gram Jaccard — exact Jaccard on distinct 5-gram sets for candidate pairs
  * embedding      — cosine near-dup over `embeddings(vec_id, embedding, label)`

At 100 TB: exact dedup shuffles only (hash, doc_id) pairs; MinHash banding
bounds the self-join to same-bucket groups (skew-salted by AQE); the pairwise
verify steps only ever run on candidate pairs, which is the point of LSH.
The all-pairs-within-group forms used for the small-SF oracle are explicitly
candidate-generation stand-ins — the group key (source/label/band) is the
blocking key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    hashed_shingles_sql,
    hashed_tokens_sql,
    minhash_from_hashed_sql,
    normalize_text_sql,
    shingles_sql,
    simhash_sql,
    tokens_sql,
)


def spread_cpu(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the cluster's full parallelism.

    Signature computation is CPU-bound and orders of magnitude heavier than
    the narrow (doc_id, text) rows it reads; a small parquet file arrives as
    ONE input split, serializing the whole pass onto one core. The repartition
    shuffle moves only the narrow text rows and buys every core. On a real
    100 TB corpus the scan already has thousands of splits and this is a
    cheap rebalance (AQE folds it away when splits ≥ parallelism)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)

N_MINHASH = 8  # signature width used by the LSH queries
N_BANDS = 4  # 4 bands × 2 rows: catches pairs with Jaccard ≳ 0.5
ROWS_PER_BAND = N_MINHASH // N_BANDS


# -- exact ------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (post-normalization) documents.

    Returns (fingerprint, n_docs, keep_doc_id): one row per content group;
    `keep_doc_id` is the smallest doc_id (the canonical survivor). Shuffles
    only (md5, doc_id) — at 100 TB this is the cheapest possible dedup pass.
    """
    fp = F.expr(normalize_text_sql("spark", "text"))
    return (
        docs.select(F.md5(fp).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
    )


def exact_dedup_groups_oracle() -> str:
    fp = normalize_text_sql("duckdb", "text")
    return f"""
        SELECT md5({fp}) AS fingerprint,
               CAST(count(*) AS BIGINT) AS n_docs,
               min(doc_id) AS keep_doc_id
        FROM documents GROUP BY md5({fp})
    """


# -- MinHash + LSH ----------------------------------------------------------


def minhash_signatures(docs: DataFrame, n: int = N_MINHASH) -> DataFrame:
    """Per-document MinHash signature as columns mh0..mh{n-1}.

    Two codegen'd passes: shingles are md5-hashed ONCE into a 31-bit array,
    then each permutation is an array_min of pure arithmetic over it — the
    md5 cost is paid once regardless of signature width.
    """
    hs = hashed_shingles_sql("spark", "text")
    cols = [
        F.expr(minhash_from_hashed_sql("spark", "hs", j)).alias(f"mh{j}") for j in range(n)
    ]
    return spread_cpu(docs.select("doc_id", "text")).select(
        "doc_id", F.expr(hs).alias("hs")
    ).select("doc_id", *cols)


def minhash_signatures_oracle(n: int = N_MINHASH) -> str:
    hs = hashed_shingles_sql("duckdb", "text")
    cols = ", ".join(f"{minhash_from_hashed_sql('duckdb', 'hs', j)} AS mh{j}" for j in range(n))
    return f"SELECT doc_id, {cols} FROM (SELECT doc_id, {hs} AS hs FROM documents)"


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash (doc_a < doc_b).

    Bands are exploded to (band_id, band_key, doc_id) and candidates come
    from a self-join on the band bucket — the classic LSH shape that scales:
    the join key is (band_id, band_key), so only same-bucket docs ever meet.
    """
    sigs = minhash_signatures(docs)
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "-", *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
            ).alias("key"),
        )
        for b in range(N_BANDS)
    ]
    exploded = sigs.select(
        "doc_id", F.explode(F.array(*bands)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # One shuffle on the bucket key, signatures computed once. A self-join
    # formulation would evaluate the signature subtree twice and shuffle two
    # full copies; grouping collects each bucket's ids and emits the a<b
    # pairs in-place. LSH buckets are small by construction — a pathological
    # hot bucket degrades either formulation identically (m² pairs on one
    # key), so this loses nothing on skew.
    buckets = exploded.groupBy("band", "key").agg(F.collect_set("doc_id").alias("ids"))
    pairs = (
        "flatten(transform(ids, "
        "a -> transform(filter(ids, b -> b > a), b -> struct(a AS doc_a, b AS doc_b))))"
    )
    return (
        buckets.where(F.size("ids") > 1)
        .select(F.explode(F.expr(pairs)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_lsh_pairs_oracle() -> str:
    sig = minhash_signatures_oracle()
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " || '-' || ".join(
            f"CAST(mh{b * ROWS_PER_BAND + r} AS STRING)" for r in range(ROWS_PER_BAND)
        )
        + " AS key FROM sigs"
        for b in range(N_BANDS)
    )
    return f"""
        WITH sigs AS ({sig}),
        bands AS ({band_selects})
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
    """


# -- SimHash ----------------------------------------------------------------


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """32-bit SimHash per document (token-level)."""
    tok = tokens_sql("spark", "text")
    ht = hashed_tokens_sql("spark", tok)
    expr = simhash_sql("spark", ht, f"size({tok})")
    return spread_cpu(docs.select("doc_id", "text")).select(
        "doc_id", F.expr(expr).alias("simhash")
    )


def simhash_signatures_oracle() -> str:
    tok = tokens_sql("duckdb", "text")
    ht = hashed_tokens_sql("duckdb", tok)
    expr = simhash_sql("duckdb", ht, f"len({tok})")
    return f"SELECT doc_id, {expr} AS simhash FROM documents"


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked by `source`.

    Hamming = bit_count(xor) — pure JVM. The `source` column is the blocking
    key standing in for the band-prefix blocking a 100 TB run would use
    (split the 32 bits into prefixes, self-join per prefix)."""
    sigs = simhash_signatures(docs).join(docs.select("doc_id", "source"), "doc_id")
    x, y = sigs.alias("x"), sigs.alias("y")
    ham = F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash")))
    return (
        x.join(
            y,
            (F.col("x.source") == F.col("y.source")) & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .where(ham <= max_hamming)
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
    )


def simhash_near_pairs_oracle(max_hamming: int = 6) -> str:
    sig = simhash_signatures_oracle()
    return f"""
        WITH sigs0 AS ({sig}),
        sigs AS (SELECT s.doc_id, s.simhash, d.source
                 FROM sigs0 s JOIN documents d ON s.doc_id = d.doc_id)
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
               CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
        FROM sigs x JOIN sigs y
          ON x.source = y.source AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
    """


# -- n-gram Jaccard ---------------------------------------------------------


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Exact Jaccard over distinct 5-gram sets for same-`source` candidate
    pairs (doc_a < doc_b, jaccard rounded to 6 dp).

    array_intersect/size are codegen'd; |A∪B| = |A|+|B|−|A∩B| avoids building
    the union array."""
    sh = F.expr(shingles_sql("spark", "text"))
    with_sh = spread_cpu(docs.select("doc_id", "source", "text")).select(
        "doc_id", "source", sh.alias("sh")
    )
    x, y = with_sh.alias("x"), with_sh.alias("y")
    inter = F.size(F.array_intersect(F.col("x.sh"), F.col("y.sh")))
    union = F.size(F.col("x.sh")) + F.size(F.col("y.sh")) - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        x.join(
            y,
            (F.col("x.source") == F.col("y.source")) & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_oracle(threshold: float = 0.35) -> str:
    sh = shingles_sql("duckdb", "text")
    return f"""
        WITH s AS (SELECT doc_id, source, {sh} AS sh FROM documents)
        SELECT doc_a, doc_b, jaccard FROM (
          SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                 ROUND(CAST(len(list_filter(x.sh, e -> list_contains(y.sh, e))) AS DOUBLE)
                       / (len(x.sh) + len(y.sh)
                          - len(list_filter(x.sh, e -> list_contains(y.sh, e)))), 6) AS jaccard
          FROM s x JOIN s y ON x.source = y.source AND x.doc_id < y.doc_id)
        WHERE jaccard >= {threshold}
    """


# -- connected components (dedup clusters) ----------------------------------


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Cluster near-dup pairs into components: (doc_id, cluster) where
    `cluster` is the component's minimum doc_id (the canonical survivor).

    Iterative min-label propagation — the Spark-shaped form of union-find:
    every node repeatedly takes the min of its own label and its neighbors',
    converging in O(component diameter) rounds. Each round is one join +
    one aggregate; `localCheckpoint` truncates the plan each round, without
    which iterative algorithms compound their lineage into an
    exponentially-replanned DAG (the classic Spark-iteration trap). Driver
    involvement per round is a single "did anything change" count — the
    data never leaves the executors.
    """
    edges = pairs.select("doc_a", "doc_b")
    sym = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("doc_a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym.doc_b == labels.node)
            .groupBy("doc_a")
            .agg(F.min("label").alias("neigh_label"))
        )
        new_labels = (
            labels.join(neigh_min, labels.node == neigh_min.doc_a, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("neigh_label", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster"))


def connected_components_oracle(pairs_sql: str) -> str:
    """DuckDB twin via recursive CTE: min reachable id == component min."""
    return f"""
        WITH RECURSIVE pairs AS ({pairs_sql}),
        sym AS (SELECT doc_a, doc_b FROM pairs
                UNION ALL SELECT doc_b, doc_a FROM pairs),
        walk(node, reach) AS (
          SELECT DISTINCT doc_a, doc_a FROM sym
          UNION
          SELECT w.node, s.doc_b FROM walk w JOIN sym s ON s.doc_a = w.reach
        )
        SELECT node AS doc_id, min(reach) AS cluster FROM walk GROUP BY node
    """


__all__ = [
    "N_MINHASH",
    "N_BANDS",
    "exact_dedup_groups",
    "exact_dedup_groups_oracle",
    "minhash_signatures",
    "minhash_signatures_oracle",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_oracle",
    "simhash_signatures",
    "simhash_signatures_oracle",
    "simhash_near_pairs",
    "simhash_near_pairs_oracle",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_oracle",
]
