"""Similarity search over embedding columns (`embeddings(vec_id, embedding
float[], label)`).

Three tiers, mirroring how ANN actually scales:
  * brute-force cosine top-k — exact baseline; a broadcast of the query
    vector against a full scan (fine for one query over any corpus size —
    it's one pass, no shuffle)
  * IVF-style partition-restricted top-k — `label` stands in for a coarse
    quantizer cell: search only the query's cell. At 100 TB the table is
    written partitioned by cell id, so the scan prunes to one partition.
  * sign-LSH bucketed top-k — deterministic hyperplane-free sketch (sign
    pattern of coordinate differences) as the bucket key; bucket join then
    exact re-rank inside the bucket.

All cosine math is generated SQL over the array column (zip_with/aggregate
in Spark, list_transform/list_sum in DuckDB) — JVM-side, no Python UDF.
Floats are upcast to double before multiplying; results round to 6 dp so
both engines land on the same representable value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 64  # corpus embedding width


def _dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _dot_duck(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {DIM}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def cosine_spark(a: str, b: str) -> str:
    return (
        f"ROUND({_dot_spark(a, b)} / "
        f"(sqrt({_dot_spark(a, a)}) * sqrt({_dot_spark(b, b)})), 6)"
    )


def cosine_duck(a: str, b: str) -> str:
    return (
        f"ROUND({_dot_duck(a, b)} / "
        f"(sqrt({_dot_duck(a, a)}) * sqrt({_dot_duck(b, b)})), 6)"
    )


def brute_force_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact cosine top-k against the embedding of `query_vec_id`.

    The 1-row query side is broadcast; the scan side never shuffles — Spark
    plans broadcast-nested-loop + TakeOrderedAndProject."""
    q = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    cos = F.expr(cosine_spark("embedding", "qvec"))
    return (
        emb.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def brute_force_topk_oracle(query_vec_id: int = 0, k: int = 10) -> str:
    cos = cosine_duck("e.embedding", "q.embedding")
    return f"""
        SELECT e.vec_id, e.label, {cos} AS cosine
        FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id}) q
        WHERE e.vec_id != {query_vec_id}
        ORDER BY cosine DESC, e.vec_id LIMIT {k}
    """


def ivf_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """IVF-style ANN: restrict the scan to the query's coarse cell (label).

    With the table partitioned by cell, the `label = q.label` predicate is
    partition pruning — the 100 TB scan reads one cell."""
    q = emb.where(f"vec_id = {query_vec_id}").selectExpr(
        "embedding AS qvec", "label AS qlabel"
    )
    return (
        emb.where(f"vec_id != {query_vec_id}")
        .join(F.broadcast(q), F.expr("label = qlabel"))
        .selectExpr(
            "vec_id", "label",
            f"{cosine_spark('embedding', 'qvec')} AS cosine",
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivf_topk_oracle(query_vec_id: int = 0, k: int = 10) -> str:
    cos = cosine_duck("e.embedding", "q.embedding")
    return f"""
        SELECT e.vec_id, e.label, {cos} AS cosine
        FROM embeddings e
        JOIN (SELECT embedding, label FROM embeddings WHERE vec_id = {query_vec_id}) q
          ON e.label = q.label
        WHERE e.vec_id != {query_vec_id}
        ORDER BY cosine DESC, e.vec_id LIMIT {k}
    """


def ivf_centroid_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10, n_cells: int = 8
) -> DataFrame:
    """True IVF: coarse-quantize against real centroid vectors, then search
    only the query's cell with exact re-rank.

    Centroids are the first `n_cells` corpus vectors (deterministic sampled
    init — the seeding step k-means would start from). Assignment is one
    pass: broadcast the C centroids, score n×C affinities, keep the argmax
    per vector via a window. At 100 TB that pass is the IVF *build* (run
    once, result written partitioned by cell); the *query* side then prunes
    to one cell — the same broadcast + TakeOrdered plan as `ivf_topk`.
    """
    cents = emb.where(f"vec_id < {n_cells}").selectExpr(
        "vec_id AS cell", "embedding AS cvec"
    )
    scored = emb.crossJoin(F.broadcast(cents)).selectExpr(
        "vec_id", "label", "embedding", "cell",
        f"{cosine_spark('embedding', 'cvec')} AS aff",
    )
    assigned = (
        scored.selectExpr(
            "*",
            "row_number() OVER (PARTITION BY vec_id"
            " ORDER BY aff DESC, cell) AS rn",
        )
        .where("rn = 1")
        .select("vec_id", "label", "embedding", "cell")
    )
    q = assigned.where(f"vec_id = {query_vec_id}").selectExpr(
        "embedding AS qvec", "cell AS qcell"
    )
    return (
        assigned.where(f"vec_id != {query_vec_id}")
        .join(F.broadcast(q), F.expr("cell = qcell"))
        .selectExpr(
            "vec_id", "label", "CAST(cell AS INT) AS cell",
            f"{cosine_spark('embedding', 'qvec')} AS cosine",
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivf_centroid_topk_oracle(query_vec_id: int = 0, k: int = 10, n_cells: int = 8) -> str:
    aff = cosine_duck("e.embedding", "c.cvec")
    cos = cosine_duck("a.embedding", "q.embedding")
    return f"""
        WITH cents AS (
          SELECT vec_id AS cell, embedding AS cvec FROM embeddings WHERE vec_id < {n_cells}),
        scored AS (
          SELECT e.vec_id, e.label, e.embedding, c.cell, {aff} AS aff
          FROM embeddings e, cents c),
        assigned AS (
          SELECT vec_id, label, embedding, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY aff DESC, cell) AS rn
            FROM scored) WHERE rn = 1)
        SELECT a.vec_id, a.label, CAST(a.cell AS INT) AS cell, {cos} AS cosine
        FROM assigned a
        JOIN (SELECT embedding, cell FROM assigned WHERE vec_id = {query_vec_id}) q
          ON a.cell = q.cell
        WHERE a.vec_id != {query_vec_id}
        ORDER BY cosine DESC, a.vec_id LIMIT {k}
    """


# -- k-means (Lloyd) centroid training --------------------------------------


def kmeans_cells(
    emb: DataFrame, n_cells: int = 8, n_iter: int = 2
) -> DataFrame:
    """Distributed Lloyd iterations training the IVF coarse quantizer:
    (cell, n_members, centroid) after `n_iter` assignment/mean rounds from
    the deterministic first-`n_cells` seed.

    Each round is the two k-means halves in Spark shapes that scale:
      * ASSIGN — broadcast the C centroids (C·dim doubles, KBs), score n×C
        cosine affinities in the scan stage, keep the argmax per vector via
        a window (one shuffle on vec_id);
      * UPDATE — posexplode components to (cell, pos, val), two-phase
        avg keyed on (cell, pos) (map-side combine ⇒ the shuffle moves
        C·dim partial sums per task, independent of corpus size), then
        reassemble the centroid array with a position sort.

    Centroid components are ROUNDed between rounds: summation order differs
    across engines (and across Spark task schedules), and the round pins
    every iteration to identical representable doubles everywhere — the
    property that makes the fixed-iteration DuckDB oracle byte-exact.
    Fixed n_iter (vs convergence polling) keeps the whole computation one
    declarative plan; the CC operator shows the driver-polled loop form.
    """
    cents, assigned = _kmeans_fit(emb, n_cells, n_iter)
    sizes = assigned.groupBy("cell").agg(F.count("*").alias("n_members"))
    return cents.join(sizes, "cell").select(
        F.col("cell").cast("int").alias("cell"), "n_members", F.col("cvec").alias("centroid")
    )


def _kmeans_assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Argmax-cosine assignment: broadcast the centroids, then a map-side-
    combinable argmax — min(struct(-aff, cell)) — per vector.

    Deliberately an AGGREGATE, not a window: the window form shuffles all
    n×C scored rows (each dragging the full embedding array) and sorts
    them; partial aggregation collapses to one row per vector BEFORE the
    exchange and needs no sort — C× less shuffle IO on a corpus-sized
    input. Struct comparison is lexicographic, so (-aff, cell) reproduces
    the (aff DESC, cell ASC) tiebreak exactly (negation is exact for
    doubles); first(embedding) is safe because every row in the group
    carries the identical array."""
    aff = F.expr(cosine_spark("embedding", "cvec"))
    return (
        vecs.crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "cell", (-aff).alias("neg_aff"))
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("neg_aff", "cell")).alias("best"),
            F.first("embedding").alias("embedding"),
        )
        .select("vec_id", "embedding", F.col("best.cell").alias("cell"))
    )


def _kmeans_fit(emb: DataFrame, n_cells: int, n_iter: int):
    """Run the Lloyd rounds; returns (final centroids, last assignment).

    Each round's centroid table (K rows) is localCheckpoint'ed: the trained
    model is a TINY artifact, but without the checkpoint every downstream
    reference to it (the search side, the affinity join, the representative
    pick) re-executes the whole unrolled training ladder over the corpus —
    the plan duplicates the n_iter full-data passes once per consumer.
    Truncating lineage at the model boundary makes training run exactly
    n_iter passes no matter how many operators consume the centroids; the
    values are unchanged (the per-round ROUND pins them to identical
    doubles, checkpointed or not). This is the same lineage discipline
    dedup_clusters applies per label-propagation round.

    The round ladder itself is a PUBLISHED artifact (operators/models.py):
    every operator composing this quantizer on the same logical input —
    `kmeans_cells`, `semantic_dedup`, `ivf_kmeans_topk` — shares one
    training run per session instead of retraining per query, exactly as a
    pipeline publishes its model once per corpus snapshot. Determinism (the
    per-round ROUND) makes cached vs retrained value-identical."""
    from .models import published

    vecs = emb.select("vec_id", "embedding")
    rounds = published(
        vecs, "kmeans", (n_cells, n_iter), lambda: _kmeans_rounds(vecs, n_cells, n_iter)
    )
    # The fit's final assignment is against the PRE-update centroids of the
    # last round (rounds[-2]); recomputed per consumer because it is
    # corpus-sized — only the tiny centroid ladder is published.
    return rounds[-1], _kmeans_assign(vecs, rounds[-2])


def _kmeans_rounds(vecs: DataFrame, n_cells: int, n_iter: int) -> list[DataFrame]:
    """The Lloyd ladder [c0, c1, …, c_n_iter], each round checkpointed."""
    cents = vecs.where(F.col("vec_id") < n_cells).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("embedding").alias("cvec")
    ).localCheckpoint(eager=True)
    rounds = [cents]
    for _ in range(n_iter):
        assigned = _kmeans_assign(vecs, cents)
        mean = (
            assigned.select("cell", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("val"), 6).alias("val"))
        )
        cents = mean.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "val"))), lambda s: s["val"]
            ).alias("cvec")
        ).localCheckpoint(eager=True)
        rounds.append(cents)
    return rounds


def _kmeans_ctes(
    n_cells: int,
    n_iter: int,
    *,
    with_final_assign: bool = False,
    vecs_sql: str = "SELECT vec_id, embedding FROM embeddings",
) -> list[str]:
    """The Lloyd rounds unrolled as DuckDB CTEs (a0 assigns against c0, c1
    averages a0, ...); optionally adds a final assignment a{n_iter} against
    the trained centroids c{n_iter} for search-side twins. `vecs_sql` lets a
    twin train over any (vec_id, embedding) source — e.g. the hashed doc
    embeddings — with the identical ladder."""
    parts = [
        f"vecs AS MATERIALIZED (SELECT vec_id, embedding FROM ({vecs_sql}) t)",
        f"""c0 AS (SELECT CAST(vec_id AS INT) AS cell, CAST(embedding AS DOUBLE[]) AS cvec
             FROM vecs WHERE vec_id < {n_cells})""",
    ]
    cos = cosine_duck("v.embedding", "c.cvec")
    n_assign = n_iter + 1 if with_final_assign else n_iter
    for i in range(n_assign):
        parts.append(
            f"""a{i} AS (SELECT vec_id, cell FROM (
                 SELECT v.vec_id, c.cell,
                        row_number() OVER (PARTITION BY v.vec_id
                                           ORDER BY {cos} DESC, c.cell) AS rn
                 FROM vecs v CROSS JOIN c{i} c) WHERE rn = 1)"""
        )
        if i == n_iter:
            break
        parts.append(
            f"""m{i} AS (SELECT a.cell, g.pos, ROUND(avg(CAST(v.embedding[g.pos + 1] AS DOUBLE)), 6) AS val
                 FROM a{i} a JOIN vecs v USING (vec_id)
                 CROSS JOIN generate_series(0, {DIM - 1}) AS g(pos)
                 GROUP BY a.cell, g.pos)"""
        )
        parts.append(
            f"c{i + 1} AS (SELECT cell, list(val ORDER BY pos) AS cvec FROM m{i} GROUP BY cell)"
        )
    return parts


def kmeans_cells_oracle(n_cells: int = 8, n_iter: int = 2) -> str:
    """Fixed-iteration twin: the same seed, assign, and rounded-mean steps
    unrolled as CTEs."""
    joined = ",\n        ".join(_kmeans_ctes(n_cells, n_iter))
    return f"""
        WITH {joined}
        SELECT c.cell, CAST(n.n AS BIGINT) AS n_members, c.cvec AS centroid
        FROM c{n_iter} c
        JOIN (SELECT cell, count(*) AS n FROM a{n_iter - 1} GROUP BY cell) n USING (cell)
    """


def ivf_kmeans_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10, n_cells: int = 8, n_iter: int = 2
) -> DataFrame:
    """End-to-end IVF over TRAINED centroids: Lloyd-fit the coarse
    quantizer, assign every vector to its trained cell, prune the search to
    the query's cell, exact cosine re-rank inside it.

    The build (fit + assign) is the one-off index pass — at 100 TB its
    output is written partitioned by cell so the query side is partition
    pruning + ⚓ broadcast query vector + TakeOrdered, identical in shape to
    `ivf_topk`. Composes the trained quantizer with the search plan the
    sampled-seed variants (`ivf_centroid_topk`) already exercise."""
    cents, _ = _kmeans_fit(emb, n_cells, n_iter)
    assigned = _kmeans_assign(emb.select("vec_id", "embedding"), cents).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    q = assigned.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec"), F.col("cell").alias("qcell")
    )
    cos = F.expr(cosine_spark("embedding", "qvec"))
    return (
        assigned.where(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), F.col("cell") == F.col("qcell"))
        .select("vec_id", "label", F.col("cell").cast("int").alias("cell"), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivf_kmeans_topk_oracle(
    query_vec_id: int = 0, k: int = 10, n_cells: int = 8, n_iter: int = 2
) -> str:
    joined = ",\n        ".join(_kmeans_ctes(n_cells, n_iter, with_final_assign=True))
    cos = cosine_duck("v.embedding", "q.qvec")
    return f"""
        WITH {joined}
        SELECT a.vec_id, e.label, CAST(a.cell AS INT) AS cell, {cos} AS cosine
        FROM a{n_iter} a
        JOIN vecs v USING (vec_id)
        JOIN embeddings e ON e.vec_id = a.vec_id
        JOIN (SELECT v2.embedding AS qvec, a2.cell AS qcell
              FROM a{n_iter} a2 JOIN vecs v2 USING (vec_id)
              WHERE a2.vec_id = {query_vec_id}) q
          ON a.cell = q.qcell
        WHERE a.vec_id != {query_vec_id}
        ORDER BY cosine DESC, a.vec_id LIMIT {k}
    """


# Sign-LSH bucket: bit n compares coordinates (2n+1, 2n+2) (1-based). The
# key width is tunable — more bits ⇒ exponentially smaller buckets, lower
# recall; 4 bits for single-query top-k, 8 bits for the all-pairs stage.
_N_SIGN_BITS = 4


def _sign_pairs(n_bits: int) -> list[tuple[int, int]]:
    return [(2 * n + 1, 2 * n + 2) for n in range(n_bits)]


def _bucket_spark(col: str, n_bits: int = _N_SIGN_BITS) -> str:
    bits = [
        f"(CASE WHEN CAST({col}[{i - 1}] AS DOUBLE) >= CAST({col}[{j - 1}] AS DOUBLE) "
        f"THEN {1 << n} ELSE 0 END)"
        for n, (i, j) in enumerate(_sign_pairs(n_bits))
    ]
    return "(" + " + ".join(bits) + ")"


def _bucket_duck(col: str, n_bits: int = _N_SIGN_BITS) -> str:
    bits = [
        f"(CASE WHEN CAST({col}[{i}] AS DOUBLE) >= CAST({col}[{j}] AS DOUBLE) "
        f"THEN {1 << n} ELSE 0 END)"
        for n, (i, j) in enumerate(_sign_pairs(n_bits))
    ]
    return "(" + " + ".join(bits) + ")"


def lsh_bucket_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Sign-LSH ANN: bucket by the sign pattern of 4 coordinate comparisons,
    search only the query's bucket, exact re-rank inside it.

    The bucket key is computed in one codegen'd expression; at scale the
    bucket id is the shuffle/partition key, so the candidate set per query
    is ~1/16 of the corpus."""
    bucketed = emb.withColumn("bucket", F.expr(_bucket_spark("embedding")))
    q = bucketed.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec"), F.col("bucket").alias("qbucket")
    )
    cos = F.expr(cosine_spark("embedding", "qvec"))
    return (
        bucketed.where(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def lsh_bucket_topk_oracle(query_vec_id: int = 0, k: int = 10) -> str:
    cos = cosine_duck("e.embedding", "q.embedding")
    return f"""
        WITH b AS (SELECT vec_id, label, embedding, {_bucket_duck('embedding')} AS bucket
                   FROM embeddings)
        SELECT e.vec_id, e.label, {cos} AS cosine
        FROM b e JOIN (SELECT embedding, bucket FROM b WHERE vec_id = {query_vec_id}) q
          ON e.bucket = q.bucket
        WHERE e.vec_id != {query_vec_id}
        ORDER BY cosine DESC, e.vec_id LIMIT {k}
    """


def lsh_multiprobe_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10, n_bits: int = _N_SIGN_BITS
) -> DataFrame:
    """Multi-probe sign-LSH ANN: search the query's bucket AND every
    1-bit-flip neighbor bucket (the standard multi-probe recall fix — a
    vector whose sign pattern differs by one comparison lands one flip
    away). Probes = n_bits + 1 buckets of ~n/2^n_bits each; the probe set
    is a handful of ints riding on the broadcast query row, so the plan is
    the same broadcast + TakeOrdered as single-probe, scanning
    (n_bits+1)/2^n_bits of the corpus instead of 1/2^n_bits."""
    bucketed = emb.withColumn("bucket", F.expr(_bucket_spark("embedding", n_bits)))
    probe_arr = "array(" + ", ".join(
        ["bucket"] + [f"bucket ^ {1 << i}" for i in range(n_bits)]
    ) + ")"
    q = (
        bucketed.where(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qvec"), F.explode(F.expr(probe_arr)).alias("pbucket"))
    )
    cos = F.expr(cosine_spark("embedding", "qvec"))
    return (
        bucketed.where(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("pbucket"))
        .select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def lsh_multiprobe_topk_oracle(
    query_vec_id: int = 0, k: int = 10, n_bits: int = _N_SIGN_BITS
) -> str:
    cos = cosine_duck("e.embedding", "q.embedding")
    probes = ", ".join(["bucket"] + [f"xor(bucket, {1 << i})" for i in range(n_bits)])
    return f"""
        WITH b AS (SELECT vec_id, label, embedding, {_bucket_duck('embedding', n_bits)} AS bucket
                   FROM embeddings),
        q AS (SELECT embedding, unnest([{probes}]) AS pbucket
              FROM b WHERE vec_id = {query_vec_id})
        SELECT e.vec_id, e.label, {cos} AS cosine
        FROM b e JOIN q ON e.bucket = q.pbucket
        WHERE e.vec_id != {query_vec_id}
        ORDER BY cosine DESC, e.vec_id LIMIT {k}
    """


_PAIR_SIGN_BITS = 8  # 256 buckets for the all-pairs stage


def embedding_near_pairs(emb: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by the 8-bit sign-LSH
    bucket — the same family of key `lsh_bucket_topk` shuffles on, two bits
    wider so the blocks stay bounded for an all-pairs stage (~n/256, and the
    key widens with the corpus; near-identical vectors agree on coordinate
    orderings, which is exactly what the sign bits encode).

    The oracle replicates the identical bucket join, so parity is exact; the
    recall tradeoff vs unblocked all-pairs is the standard LSH one and is the
    price of not being O(n²) at 100 TB. Norms are computed once per VECTOR in
    a narrow pre-pass, not once per pair — the pairwise stage then does a
    single dot product. Same doubles as the inline form (identical op order:
    sqrt of the self-dot), so both engines land on the same representable
    value."""
    from .dedup import spread_cpu

    norm = F.expr(f"sqrt({_dot_spark('embedding', 'embedding')})")
    bucket = F.expr(_bucket_spark("embedding", _PAIR_SIGN_BITS))
    base = spread_cpu(emb.select("vec_id", "embedding")).select(
        "vec_id", "embedding", norm.alias("nrm"), bucket.alias("bucket")
    )
    x, y = base.alias("x"), base.alias("y")
    cos = F.round(
        F.expr(_dot_spark("x.embedding", "y.embedding")) / (F.col("x.nrm") * F.col("y.nrm")),
        6,
    )
    return (
        x.join(
            y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.vec_id") < F.col("y.vec_id"))
        )
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def knn_join(emb: DataFrame, k: int = 3, n_bits: int = _N_SIGN_BITS) -> DataFrame:
    """k-NN JOIN: for EVERY vector, its top-k neighbors within its sign-LSH
    bucket — the set-wise companion of the single-query ANN searches
    (semantic-dedup and clustering pipelines need neighbors for all rows,
    not one probe).

    Plan: one narrow pass computes (norm, bucket) per vector, a bucketed
    self-join generates candidates (bounded blocks — the same key the ANN
    bucket search shuffles on), one dot product per candidate, and a
    per-vector window keeps the top-k. Directed: (vec_id, neighbor, rank);
    both directions of a close pair appear, each under its own anchor.
    Recall is the standard LSH trade — neighbors in other buckets are
    unseen — and the multiprobe variant widens it the same way as search.
    """
    from pyspark.sql.window import Window

    from .dedup import spread_cpu

    norm = F.expr(f"sqrt({_dot_spark('embedding', 'embedding')})")
    bucket = F.expr(_bucket_spark("embedding", n_bits))
    base = spread_cpu(emb.select("vec_id", "embedding")).select(
        "vec_id", "embedding", norm.alias("nrm"), bucket.alias("bucket")
    )
    x, y = base.alias("x"), base.alias("y")
    cos = F.round(
        F.expr(_dot_spark("x.embedding", "y.embedding")) / (F.col("x.nrm") * F.col("y.nrm")),
        6,
    )
    cand = x.join(
        y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.vec_id") != F.col("y.vec_id"))
    ).select(
        F.col("x.vec_id").alias("vec_id"),
        F.col("y.vec_id").alias("neighbor"),
        cos.alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("neighbor").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor", "cosine", "rank")
    )


def knn_join_oracle(k: int = 3, n_bits: int = _N_SIGN_BITS) -> str:
    cos = cosine_duck("x.embedding", "y.embedding")
    bucket = _bucket_duck("embedding", n_bits)
    return f"""
        WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
        cand AS (
          SELECT x.vec_id AS vec_id, y.vec_id AS neighbor, {cos} AS cosine
          FROM b x JOIN b y
            ON x.bucket = y.bucket AND x.vec_id != y.vec_id),
        ranked AS (
          SELECT vec_id, neighbor, cosine,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cosine DESC, neighbor ASC) AS rank
          FROM cand)
        SELECT vec_id, neighbor, cosine, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= {k}
    """


def embedding_near_pairs_oracle(threshold: float = 0.4) -> str:
    cos = cosine_duck("x.embedding", "y.embedding")
    bucket = _bucket_duck("embedding", _PAIR_SIGN_BITS)
    return f"""
        WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings)
        SELECT vec_a, vec_b, cosine FROM (
          SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, {cos} AS cosine
          FROM b x JOIN b y
            ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
        WHERE cosine >= {threshold}
    """


# -- semantic deduplication (SemDeDup-style) ---------------------------------


def semantic_dedup(
    emb: DataFrame, threshold: float = 0.6, n_cells: int = 8, n_iter: int = 2
) -> DataFrame:
    """Embedding-space deduplication the way LLM corpora actually do it
    (the SemDeDup recipe): cluster with the trained coarse quantizer, pick
    one representative per cluster (highest centroid affinity), and flag
    every member whose cosine to its representative exceeds `threshold` as
    a semantic duplicate.

    (vec_id, cell, rep_id, cos_to_rep, keep): keep = the representative
    itself, or a member below the threshold. Scale shape: all pairwise
    comparisons are member-vs-ONE-representative — O(n) dot products, no
    pair explosion; the per-cluster argmax is one window shuffle on the
    cell id, and the representative set (K rows) broadcasts back. The
    trained-quantizer build is the same one-off pass `ivf_kmeans_topk`
    amortizes across queries."""
    from pyspark.sql.window import Window

    cents, _ = _kmeans_fit(emb, n_cells, n_iter)
    assigned = _kmeans_assign(emb.select("vec_id", "embedding"), cents)
    aff = assigned.join(F.broadcast(cents), "cell").select(
        "vec_id",
        "cell",
        "embedding",
        F.expr(cosine_spark("embedding", "cvec")).alias("c_aff"),
    )
    w = Window.partitionBy("cell").orderBy(F.col("c_aff").desc(), F.col("vec_id"))
    ranked = aff.withColumn("rn", F.row_number().over(w))
    reps = ranked.where(F.col("rn") == 1).select(
        "cell", F.col("vec_id").alias("rep_id"), F.col("embedding").alias("rep_vec")
    )
    cos = F.expr(cosine_spark("embedding", "rep_vec"))
    return ranked.join(F.broadcast(reps), "cell").select(
        "vec_id",
        F.col("cell").cast("int").alias("cell"),
        "rep_id",
        cos.alias("cos_to_rep"),
        ((F.col("vec_id") == F.col("rep_id")) | (cos < threshold)).alias("keep"),
    )


def semantic_dedup_oracle(
    threshold: float = 0.6, n_cells: int = 8, n_iter: int = 2
) -> str:
    joined = ",\n        ".join(_kmeans_ctes(n_cells, n_iter, with_final_assign=True))
    c_aff = cosine_duck("v.embedding", "c.cvec")
    cos = cosine_duck("r.embedding", "reps.rep_vec")
    return f"""
        WITH {joined},
        aff AS (
          SELECT a.vec_id, a.cell, v.embedding, {c_aff} AS c_aff
          FROM a{n_iter} a
          JOIN vecs v USING (vec_id)
          JOIN c{n_iter} c USING (cell)),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY cell
                                       ORDER BY c_aff DESC, vec_id) AS rn
          FROM aff),
        reps AS (SELECT cell, vec_id AS rep_id, embedding AS rep_vec
                 FROM ranked WHERE rn = 1)
        SELECT r.vec_id, CAST(r.cell AS INT) AS cell, reps.rep_id,
               {cos} AS cos_to_rep,
               (r.vec_id = reps.rep_id OR {cos} < {threshold}) AS keep
        FROM ranked r JOIN reps USING (cell)
    """


# -- random-projection dimensionality reduction ------------------------------

RP_DIM = 16  # projected width (DIM 64 -> 16)


def _rp_sign(dialect: str, i: str, j: str) -> str:
    """Deterministic ±1 projection-matrix entry from the (i, j) hash parity
    (the Achlioptas sign matrix, reproducible in both engines — no RNG
    state to ship)."""
    from ..functions.hashing import hash32_sql

    s = "STRING" if dialect == "spark" else "VARCHAR"
    cell = f"concat(CAST({i} AS {s}), '_', CAST({j} AS {s}))"
    return f"CASE WHEN {hash32_sql(cell, dialect)} % 2 = 0 THEN 1.0 ELSE -1.0 END"


def _rp_sign_py(i: int, j: int) -> float:
    """Python twin of `_rp_sign` — same md5-hex-prefix parity, evaluated at
    PLAN-BUILD time so the projection matrix folds into the expression tree
    as literals. The oracle keeps the in-SQL form, so every parity run
    cross-checks this equivalence."""
    import hashlib

    h = int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:8], 16)
    return 1.0 if h % 2 == 0 else -1.0


def random_projection(emb: DataFrame, out_dim: int = RP_DIM) -> DataFrame:
    """(vec_id, proj double[out_dim]): Johnson–Lindenstrauss sign-matrix
    projection y_j = Σ_i x_i·R[i][j] / √out_dim — the dimensionality-
    reduction front end for ANN/clustering over wide embedding columns
    (pairwise distances preserved within 1±ε at out_dim = O(log n / ε²)).

    Scale shape: NO exchange of any kind. The ±1 matrix is deterministic
    (md5 parity of the (i, j) cell), so it is unrolled at plan-build time
    into out_dim codegen'd sum expressions — DIM·out_dim static multiply-
    adds per row inside WholeStageCodegen, with the same left-to-right
    i-ascending accumulation order as the oracle's list_sum (bit-identical
    partial sums; ROUND(…, 6) is belt-and-braces). A lambda-based variant
    (broadcast matrix + nested higher-order functions) computed the same
    values ~4× slower: Spark interprets HOF lambdas per element, while the
    unrolled form stays in generated code.

    Codegen-size discipline: the ±1 multiplies are folded into SIGNED
    ADDITION (`+x` / `-x`, IEEE-identical to `±1.0*x` with the same
    left-to-right accumulation) — the multiply form's DIM·out_dim extra
    Literal/Multiply nodes pushed the generated processNext() past janino's
    method limit, silently degrading the whole stage to interpreted eval on
    every run."""
    return emb.select(
        "vec_id", F.expr(f"array({', '.join(_rp_comps(out_dim))})").alias("proj")
    )


def _rp_comps(out_dim: int) -> list[str]:
    """The out_dim projected-component SQL expressions (signed-add form)."""
    scale = out_dim ** 0.5
    cols = []
    for j in range(out_dim):
        terms = " ".join(
            ("+" if _rp_sign_py(i, j) > 0 else "-") + f" CAST(embedding[{i}] AS DOUBLE)"
            for i in range(DIM)
        )
        # normalize the leading sign: "+ x…" -> "x…", "- x…" -> "0.0D - x…"
        terms = terms[2:] if terms.startswith("+ ") else "0.0D " + terms
        cols.append(f"ROUND(({terms}) / {scale!r}, 6)")
    return cols


def random_projection_flat(emb: DataFrame, out_dim: int = RP_DIM) -> DataFrame:
    """(vec_id, pos, val): the driver-gate (atomic-columns) form of
    `random_projection`. The components are projected as out_dim SEPARATE
    columns first and the posexplode generator consumes plain attribute
    refs — fusing the full unrolled arithmetic INTO the Generate stage
    overflows janino's method limit and drops the stage to interpreted
    eval (~4× slower, re-attempting the failed compile on every run)."""
    comps = _rp_comps(out_dim)
    cols = emb.selectExpr(
        "vec_id", *[f"{c} AS p{j}" for j, c in enumerate(comps)]
    )
    return cols.select(
        "vec_id",
        F.posexplode(F.array(*[f"p{j}" for j in range(out_dim)])).alias("pos", "val"),
    )


def random_projection_oracle(out_dim: int = RP_DIM) -> str:
    scale = out_dim ** 0.5
    return f"""
        WITH rmat AS (
          SELECT list_transform(generate_series(0, {DIM - 1}), i ->
                   list_transform(generate_series(0, {out_dim - 1}), j ->
                     {_rp_sign('duckdb', 'i', 'j')})) AS rmat)
        SELECT e.vec_id,
               list_transform(generate_series(1, {out_dim}), j ->
                 ROUND(list_sum(list_transform(generate_series(1, {DIM}),
                       i -> CAST(e.embedding[i] AS DOUBLE) * r.rmat[i][j]))
                       / {scale!r}, 6)) AS proj
        FROM embeddings e CROSS JOIN rmat r
    """


# -- contrastive negative sampling ------------------------------------------

NEG_BUCKETS = 50  # candidate-pool buckets (bounds the per-anchor join)
NEG_K = 3  # negatives per anchor


def contrastive_negatives(
    emb: DataFrame,
    k: int = NEG_K,
    n_buckets: int = NEG_BUCKETS,
    n_cells: int = 8,
    n_iter: int = 2,
) -> DataFrame:
    """(anchor_id, neg_id, rank): k deterministic negative examples per
    anchor for contrastive/embedding training — candidates drawn from a
    hash bucket of the corpus, excluding the anchor itself and everything
    in the anchor's TRAINED quantizer cell (same-cell vectors are likely
    semantic positives; the published kmeans artifact supplies the cells,
    not a retrain).

    Scale shape: the candidate pool for an anchor is ONE bucket of
    ~n/n_buckets vectors (an equi-join on the bucket id — never
    anchor × corpus), the per-anchor ranking hash is a scan-stage
    expression, and the top-k is a bounded window inside the
    (anchor-bucket) join output. Both the bucket assignment and the
    ranking come from the portable hash, so resampling is reproducible
    and the oracle replays it exactly.

    Parameterization invariant (measured: 15× wall at 10× corpus with a
    FIXED n_buckets, because join output = n·(n/n_buckets) is quadratic
    when the bucket count stands still): scale `n_buckets` WITH the
    corpus so the per-anchor pool n/n_buckets stays a constant ~2–10×
    k — then the join output is Θ(n·pool) = linear. Same contract as
    LSH banding: the blocking key's cardinality is the operator's knob,
    and holding it fixed across a 10× growth is a misconfiguration, not
    a property of the plan."""
    from pyspark.sql.window import Window

    from ..functions.hashing import hash32_sql

    cents, _ = _kmeans_fit(emb, n_cells, n_iter)
    # FINAL assignment against the trained centroids (the a{n_iter} pass of
    # the oracle ladder), not the in-training last-round assignment.
    cells = _kmeans_assign(emb.select("vec_id", "embedding"), cents).select(
        "vec_id", "cell"
    )
    h_bucket = F.expr(
        f"{hash32_sql('CAST(vec_id AS STRING)', 'spark')} % {n_buckets}"
    )
    pool = cells.select(
        F.col("vec_id").alias("neg_id"),
        F.col("cell").alias("neg_cell"),
        h_bucket.cast("int").alias("bucket"),
    )
    anchors = cells.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("cell").alias("anchor_cell"),
        F.expr(
            f"CAST({hash32_sql('CAST(vec_id AS STRING)', 'spark')} % {n_buckets} AS INT)"
        ).alias("bucket"),
    )
    rank_h = F.expr(
        hash32_sql(
            "concat(CAST(anchor_id AS STRING), '|', CAST(neg_id AS STRING))", "spark"
        )
    )
    w = Window.partitionBy("anchor_id").orderBy("rh", "neg_id")
    return (
        anchors.join(pool, "bucket")
        .where(
            (F.col("neg_id") != F.col("anchor_id"))
            & (F.col("neg_cell") != F.col("anchor_cell"))
        )
        .select("anchor_id", "neg_id", rank_h.alias("rh"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("anchor_id", "neg_id", "rank")
    )


def contrastive_negatives_oracle(
    k: int = NEG_K,
    n_buckets: int = NEG_BUCKETS,
    n_cells: int = 8,
    n_iter: int = 2,
) -> str:
    from ..functions.hashing import hash32_sql

    joined = ",\n        ".join(
        _kmeans_ctes(n_cells, n_iter, with_final_assign=True)
    )
    hb = lambda col: (
        f"CAST({hash32_sql(f'CAST({col} AS VARCHAR)', 'duckdb')} % {n_buckets} AS INT)"
    )
    rh = hash32_sql(
        "concat(CAST(anchor_id AS VARCHAR), '|', CAST(neg_id AS VARCHAR))", "duckdb"
    )
    return f"""
        WITH {joined},
        cells AS (SELECT vec_id, cell FROM a{n_iter}),
        pool AS (SELECT vec_id AS neg_id, cell AS neg_cell,
                        {hb('vec_id')} AS bucket FROM cells),
        anchors AS (SELECT vec_id AS anchor_id, cell AS anchor_cell,
                           {hb('vec_id')} AS bucket FROM cells),
        ranked AS (
          SELECT anchor_id, neg_id,
                 row_number() OVER (PARTITION BY anchor_id
                                    ORDER BY {rh}, neg_id) AS rank
          FROM anchors JOIN pool USING (bucket)
          WHERE neg_id != anchor_id AND neg_cell != anchor_cell)
        SELECT anchor_id, neg_id, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# cluster topic profiling — the vector family meets the text family
# ---------------------------------------------------------------------------

TOPIC_TOP_K = 5
TOPIC_MIN_CNT = 3
TOPIC_MIN_LEN = 3


def cluster_topic_profile(
    docs: DataFrame, n_cells: int = 8, n_iter: int = 2, topk: int = TOPIC_TOP_K
) -> DataFrame:
    """(cell, rank, token, cnt, score): the distinctive vocabulary of each
    k-means cluster over the corpus's OWN hashed embeddings — the
    "what is in my clusters" exploration report a training-data pipeline
    runs after clustering: per cell, the top-k tokens by lift
    (in-cell relative frequency / corpus relative frequency), with a
    min-count floor so one-off tokens can't dominate the ratio.

    Composition, not recompute: the doc vectors are the PUBLISHED hashed
    embedding table (ranking.hashed_doc_embeddings) and the quantizer is
    the PUBLISHED Lloyd ladder (`_kmeans_fit` — the same artifact pattern
    as kmeans_cells, keyed by the doc-vector input), so the profile adds
    one token-explode scan, one (cell, token) count shuffle, and a
    vocabulary-bounded top-k window. At 100 TB the window's candidate set
    is |vocab|·C scored rows (never corpus-sized); the lift arithmetic is
    exact-count division, deterministic across engines."""
    from .ranking import hashed_doc_embeddings
    from ..functions.hashing import tokens_sql

    vecs = hashed_doc_embeddings(docs).selectExpr("doc_id AS vec_id", "embedding")
    _, assigned = _kmeans_fit(vecs, n_cells, n_iter)
    toks = (
        docs.select(
            "doc_id", F.explode(F.expr(tokens_sql("spark", "text"))).alias("token")
        )
        .where(F.length("token") >= TOPIC_MIN_LEN)
        .join(
            assigned.selectExpr("vec_id AS doc_id", "cell"), "doc_id"
        )
    )
    # cells partition the corpus, so corpus-level counts roll up from the
    # (cell, token) table — the second and third aggregations run over
    # vocabulary-sized input instead of re-shuffling the token stream
    cell_cnt = toks.groupBy("cell", "token").agg(F.count("*").alias("cnt"))
    cell_tot = cell_cnt.groupBy("cell").agg(F.sum("cnt").alias("cell_tot"))
    corp_cnt = cell_cnt.groupBy("token").agg(F.sum("cnt").alias("corp_cnt"))
    corp_tot = cell_tot.agg(F.sum("cell_tot").alias("corp_tot"))
    from pyspark.sql import Window

    scored = (
        cell_cnt.where(F.col("cnt") >= TOPIC_MIN_CNT)
        .join(cell_tot, "cell")
        .join(corp_cnt, "token")
        .crossJoin(F.broadcast(corp_tot))
        .selectExpr(
            "cell",
            "token",
            "cnt",
            "ROUND((CAST(cnt AS DOUBLE) / cell_tot) / "
            "(CAST(corp_cnt AS DOUBLE) / corp_tot), 6) AS score",
        )
    )
    w = Window.partitionBy("cell").orderBy(
        F.col("score").desc(), F.col("cnt").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(
            F.col("cell").cast("int").alias("cell"),
            F.col("rank").cast("int").alias("rank"),
            "token",
            F.col("cnt").cast("bigint").alias("cnt"),
            "score",
        )
    )


def cluster_topic_profile_oracle(
    n_cells: int = 8, n_iter: int = 2, topk: int = TOPIC_TOP_K
) -> str:
    from .ranking import hashed_doc_embeddings_oracle
    from ..functions.hashing import tokens_sql

    vecs_sql = (
        f"SELECT doc_id AS vec_id, embedding FROM ({hashed_doc_embeddings_oracle()}) e"
    )
    ladder = ",\n        ".join(
        _kmeans_ctes(n_cells, n_iter, vecs_sql=vecs_sql)
    )
    toks = tokens_sql("duckdb", "text")
    return f"""
        WITH {ladder},
        toks AS MATERIALIZED (
          SELECT t.doc_id, t.token, a.cell
          FROM (SELECT doc_id, unnest({toks}) AS token FROM documents) t
          JOIN a{n_iter - 1} a ON a.vec_id = t.doc_id
          WHERE length(t.token) >= {TOPIC_MIN_LEN}),
        cell_cnt AS (SELECT cell, token, count(*) AS cnt
                     FROM toks GROUP BY cell, token),
        cell_tot AS (SELECT cell, count(*) AS cell_tot FROM toks GROUP BY cell),
        corp_cnt AS (SELECT token, count(*) AS corp_cnt FROM toks GROUP BY token),
        corp_tot AS (SELECT count(*) AS corp_tot FROM toks),
        scored AS (
          SELECT c.cell, c.token, c.cnt,
                 ROUND((CAST(c.cnt AS DOUBLE) / ct.cell_tot) /
                       (CAST(g.corp_cnt AS DOUBLE) / gt.corp_tot), 6) AS score
          FROM cell_cnt c
          JOIN cell_tot ct USING (cell)
          JOIN corp_cnt g USING (token)
          CROSS JOIN corp_tot gt
          WHERE c.cnt >= {TOPIC_MIN_CNT}),
        ranked AS (
          SELECT cell, token, cnt, score,
                 row_number() OVER (PARTITION BY cell
                                    ORDER BY score DESC, cnt DESC, token) AS rank
          FROM scored)
        SELECT CAST(cell AS INT) AS cell, CAST(rank AS INT) AS rank, token,
               CAST(cnt AS BIGINT) AS cnt, score
        FROM ranked WHERE rank <= {topk}
    """


# -- MMR diversity rerank -----------------------------------------------------

MMR_LAMBDA = 0.7
MMR_POOL = 20
MMR_K = 5


def mmr_rerank(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = MMR_K,
    pool_n: int = MMR_POOL,
    lam: float = MMR_LAMBDA,
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998): from
    the exact-cosine top-`pool_n` candidates, greedily select `k` results
    maximizing lam·relevance − (1−lam)·max-similarity-to-already-selected —
    the diversity-aware retrieval head (dedups near-identical hits that a
    pure top-k returns).

    Scale split: the DISTRIBUTED work is the candidate pool construction
    (ANN top-pool over the corpus — here the exact brute-force tier; any
    indexed tier drops in); the greedy rerank is O(k·pool²) over CONSTANTS
    (20 candidates → 380 pairwise cosines, computed in-plan over a
    checkpointed pool and collected once — bounded by pool_n, never by the
    corpus). An unrolled in-plan greedy would add k scheduler rounds for
    zero scale benefit. Every cosine is pre-rounded to 6dp, so the
    driver-side float arithmetic is bit-identical to the oracle's. The
    step-1 score is lam·rel (no diversity term yet, the standard MMR
    convention)."""
    spark = emb.sparkSession
    pool = (
        brute_force_topk(emb, query_vec_id, pool_n)
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .select("vec_id", F.col("cosine").alias("rel"), "embedding")
        .localCheckpoint(eager=True)
    )
    a = pool.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = pool.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    sims = {
        (r["a"], r["b"]): r["sim"]
        for r in a.join(F.broadcast(b), F.col("a") != F.col("b"))
        .select("a", "b", F.expr(cosine_spark("ea", "eb")).alias("sim"))
        .collect()
    }
    rel = {r["vec_id"]: r["rel"] for r in pool.select("vec_id", "rel").collect()}
    # 1-lam must be the SAME double the oracle's SQL literal parses to
    # (1.0 - 0.7 is one ulp off the literal 0.3) or boundary ROUNDs split.
    coef = round(1.0 - lam, 10)
    selected: list[tuple[int, int, float, float]] = []  # rank, vec_id, rel, mmr
    remaining = set(rel)
    while remaining and len(selected) < k:
        best = None
        for v in sorted(remaining):  # vec_id ascending = deterministic tiebreak
            if selected:
                max_sim = max(sims[(v, s[1])] for s in selected)
                score = round(lam * rel[v] - coef * max_sim, 6)
            else:
                score = round(lam * rel[v], 6)
            if best is None or score > best[1]:
                best = (v, score)
        selected.append((len(selected) + 1, best[0], rel[best[0]], best[1]))
        remaining.discard(best[0])
    return spark.createDataFrame(
        selected, "rank int, vec_id bigint, rel double, mmr double"
    ).orderBy("rank")


def mmr_rerank_oracle(
    query_vec_id: int = 0,
    k: int = MMR_K,
    pool_n: int = MMR_POOL,
    lam: float = MMR_LAMBDA,
) -> str:
    cos = cosine_duck("a.embedding", "b.embedding")
    steps = []
    for i in range(1, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT vec_id FROM s{j}" for j in range(1, i)
        )
        if i == 1:
            steps.append(
                f"s1 AS (SELECT vec_id, rel, ROUND({lam} * rel, 6) AS mmr "
                f"FROM pe ORDER BY mmr DESC, vec_id LIMIT 1)"
            )
        else:
            steps.append(
                f"s{i} AS (SELECT pe.vec_id, pe.rel, "
                f"ROUND({lam} * pe.rel - {round(1.0 - lam, 10)} * "
                f"(SELECT max(sim) FROM sims "
                f" WHERE sims.a = pe.vec_id AND sims.b IN ({prev})), 6) AS mmr "
                f"FROM pe WHERE pe.vec_id NOT IN ({prev}) "
                f"ORDER BY mmr DESC, pe.vec_id LIMIT 1)"
            )
    union = " UNION ALL ".join(
        f"SELECT {i} AS rank, vec_id, rel, mmr FROM s{i}" for i in range(1, k + 1)
    )
    return f"""
        WITH pool AS MATERIALIZED ({brute_force_topk_oracle(query_vec_id, pool_n)}),
        pe AS MATERIALIZED (
          SELECT p.vec_id, p.cosine AS rel, e.embedding
          FROM pool p JOIN embeddings e USING (vec_id)),
        sims AS MATERIALIZED (
          SELECT a.vec_id AS a, b.vec_id AS b, {cos} AS sim
          FROM pe a JOIN pe b ON a.vec_id != b.vec_id),
        {", ".join(steps)}
        SELECT rank, vec_id, rel, mmr FROM ({union}) ORDER BY rank
    """


# -- semantic decontamination --------------------------------------------------

SEM_DECON_PROBES = 5
SEM_DECON_T = 0.3


def semantic_decontaminate(
    emb: DataFrame,
    n_probes: int = SEM_DECON_PROBES,
    threshold: float = SEM_DECON_T,
) -> DataFrame:
    """Embedding-space benchmark decontamination: corpus vectors whose
    cosine against ANY probe (benchmark item) reaches the threshold —
    the semantic complement of the n-gram decontaminator
    (corpus.py::contaminated_docs), catching paraphrased leakage exact
    shingles miss.

    Same 100 TB shape as the lexical variant: the probe set is KBs and
    BROADCAST (the bounded ×n_probes fan-out is a scan-stage multiplier,
    not a shuffle); per-doc reduction is one max-struct aggregate carrying
    the nearest probe for auditability (ties → smallest probe id)."""
    probes = emb.where(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pvec")
    )
    cos = F.expr(cosine_spark("embedding", "pvec"))
    return (
        emb.where(F.col("vec_id") >= n_probes)
        .crossJoin(F.broadcast(probes))
        .select("vec_id", "probe_id", cos.alias("cos"))
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("cos"), (-F.col("probe_id")).alias("np"))
            ).alias("m")
        )
        .select(
            "vec_id",
            F.col("m.cos").alias("max_cos"),
            (-F.col("m.np")).alias("nearest_probe"),
        )
        .where(F.col("max_cos") >= threshold)
    )


def semantic_decontaminate_oracle(
    n_probes: int = SEM_DECON_PROBES, threshold: float = SEM_DECON_T
) -> str:
    cos = cosine_duck("e.embedding", "p.pvec")
    return f"""
        WITH probes AS (
          SELECT vec_id AS probe_id, embedding AS pvec
          FROM embeddings WHERE vec_id < {n_probes}),
        c AS MATERIALIZED (
          SELECT e.vec_id, p.probe_id, {cos} AS cos
          FROM embeddings e CROSS JOIN probes p
          WHERE e.vec_id >= {n_probes}),
        m AS (SELECT vec_id, max(cos) AS max_cos FROM c GROUP BY vec_id)
        SELECT m.vec_id, m.max_cos, min(c.probe_id) AS nearest_probe
        FROM m JOIN c ON c.vec_id = m.vec_id AND c.cos = m.max_cos
        WHERE m.max_cos >= {threshold}
        GROUP BY m.vec_id, m.max_cos
    """


def prototype_classifier_eval(emb: DataFrame) -> DataFrame:
    """(label, n, n_correct, accuracy): nearest-centroid (Rocchio)
    classification of every embedding against its own corpus's per-label
    mean prototypes — the fastest embedding-quality probe there is (are
    the labels linearly separated by their centroids?), and the eval a
    pipeline runs on a new embedding model before anything expensive.

    One per-label mean aggregate (|labels| rows, broadcast), one argmax-
    cosine assignment as a map-side-combinable struct-min (the
    _kmeans_assign shape with FIXED centroids), one per-label filtered
    count. ROUND(6) pins assignment ties across engines."""
    vecs = emb.select("vec_id", "label", "embedding")
    proto = (
        vecs.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("val"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "val"))),
                lambda s: s["val"],
            ).alias("pvec")
        )
        .select(F.col("label").alias("plabel"), "pvec")
    )
    aff = F.expr(cosine_spark("embedding", "pvec"))
    assigned = (
        vecs.crossJoin(F.broadcast(proto))
        .select("vec_id", "label", "plabel", (-aff).alias("neg_aff"))
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("neg_aff", "plabel")).alias("best"),
            F.first("label").alias("label"),
        )
        .select("label", F.col("best.plabel").alias("predicted"))
    )
    return (
        assigned.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(F.col("label") == F.col("predicted"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
        )
        .select(
            "label",
            "n",
            "n_correct",
            F.round(F.col("n_correct") / F.col("n"), 6).alias("accuracy"),
        )
    )


def prototype_classifier_eval_oracle() -> str:
    cos = cosine_duck("v.embedding", "p.pvec")
    return f"""
        WITH flat AS (
          SELECT label, g.pos,
                 CAST(embedding[g.pos + 1] AS DOUBLE) AS val
          FROM embeddings CROSS JOIN generate_series(0, {DIM - 1}) AS g(pos)),
        pm AS (SELECT label, pos, ROUND(avg(val), 6) AS val
               FROM flat GROUP BY label, pos),
        proto AS (SELECT label AS plabel, list(val ORDER BY pos) AS pvec
                  FROM pm GROUP BY label),
        assigned AS (
          SELECT vec_id, label, plabel FROM (
            SELECT v.vec_id, v.label, p.plabel,
                   row_number() OVER (PARTITION BY v.vec_id
                                      ORDER BY {cos} DESC, p.plabel) AS rn
            FROM embeddings v CROSS JOIN proto p) WHERE rn = 1)
        SELECT label, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN label = plabel THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_correct,
               ROUND(sum(CASE WHEN label = plabel THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS accuracy
        FROM assigned GROUP BY label
    """


# -- dimension-truncation ablation ---------------------------------------------

ABL_DIMS = (8, 16, 32, 64)  # truncation tiers; 64 = DIM is the ground truth
ABL_PROBES = 24  # fixed probe set: vec_id < ABL_PROBES (probe-audit shape)
ABL_K = 10


def _dot_prefix_spark(a: str, b: str, d: int) -> str:
    return (
        f"aggregate(zip_with(slice({a}, 1, {d}), slice({b}, 1, {d}), "
        f"(p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _dot_prefix_duck(a: str, b: str, d: int) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {d}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def dim_ablation(
    emb: DataFrame,
    dims: tuple[int, ...] = ABL_DIMS,
    n_probes: int = ABL_PROBES,
    k: int = ABL_K,
) -> DataFrame:
    """(dim, n_probes, total_hits, recall_at_k): exact-cosine recall@k of
    PREFIX-truncated embeddings vs the full-width ground truth, per
    truncation tier — the dimension-ablation audit behind
    Matryoshka-style storage tiering (Kusupati et al. 2022): how much
    retrieval quality survives keeping only the first d of DIM
    components. The storage-side twin of the ANN recall report: that one
    varies the INDEX (IVF/LSH/PQ) at full width, this varies the WIDTH
    under exact search, so the two reports together separate index loss
    from representation loss.

    Probe-audit shape (the dedup_lsh_recall rule): a FIXED probe set
    (vec_id < n_probes) against the corpus — |probes|·|corpus|·|dims|
    scored pairs, linear in corpus for the fixed panel. Truncated
    cosines are computed as plain pre-projected columns (non-cheap
    aliases — kept out of the Generate per the janino fusion hazard),
    then exploded to (dim, cos) rows over attribute refs. recall =
    total_hits / (k·n_probes) is ONE division of exact integers.
    """
    from .models import published

    return published(
        emb, "dim_ablation", (dims, n_probes, k), lambda: _dim_ablation_run(emb, dims, n_probes, k)
    )


def _dim_ablation_run(
    emb: DataFrame, dims: tuple[int, ...], n_probes: int, k: int
) -> DataFrame:
    probes = emb.where(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("qvec")
    )
    pairs = emb.crossJoin(F.broadcast(probes)).where(
        F.col("vec_id") != F.col("probe_id")
    )
    cos_cols = [
        F.expr(
            f"ROUND({_dot_prefix_spark('embedding', 'qvec', d)} / "
            f"(sqrt({_dot_prefix_spark('embedding', 'embedding', d)}) * "
            f"sqrt({_dot_prefix_spark('qvec', 'qvec', d)})), 6)"
        ).alias(f"cos_{d}")
        for d in dims
    ]
    scored = pairs.select("probe_id", "vec_id", *cos_cols)
    tiers = scored.select(
        "probe_id",
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dim"), F.col(f"cos_{d}").alias("cos")
                    )
                    for d in dims
                ]
            )
        ).alias("t"),
    ).select("probe_id", "vec_id", F.col("t.dim").alias("dim"), F.col("t.cos").alias("cos"))
    from pyspark.sql.window import Window

    rn = F.row_number().over(
        Window.partitionBy("probe_id", "dim").orderBy(
            F.col("cos").desc(), F.col("vec_id")
        )
    )
    # eager checkpoint: BOTH the truth filter and the hits join read
    # topk, and without the barrier each branch re-executes the probe
    # cross-join + 4 prefix-dot-products per pair + the window sort —
    # the build's dominant stage, twice (the link_prediction `capped`
    # rationale). Also breaks the self-join lineage ambiguity.
    topk = (
        tiers.select("probe_id", "vec_id", "dim", rn.alias("rn"))
        .where(F.col("rn") <= k)
        .select("probe_id", "vec_id", "dim")
        .localCheckpoint(eager=True)
    )
    truth = topk.where(F.col("dim") == max(dims)).select(
        F.col("probe_id").alias("tp"), F.col("vec_id").alias("tv")
    )
    hits = topk.join(
        truth, (topk.probe_id == truth.tp) & (topk.vec_id == truth.tv)
    ).select("probe_id", "dim")
    return (
        hits.groupBy("dim")
        .agg(F.count("*").cast("bigint").alias("total_hits"))
        .select(
            "dim",
            F.lit(n_probes).cast("bigint").alias("n_probes"),
            "total_hits",
            F.round(F.col("total_hits") / (k * n_probes), 6).alias("recall_at_k"),
        )
        .localCheckpoint(eager=True)  # |dims| rows — the published artifact
    )


def dim_ablation_oracle(
    dims: tuple[int, ...] = ABL_DIMS,
    n_probes: int = ABL_PROBES,
    k: int = ABL_K,
) -> str:
    tier_selects = " UNION ALL ".join(
        f"""SELECT probe_id, vec_id, {d} AS dim,
            ROUND({_dot_prefix_duck('embedding', 'qvec', d)} /
                  (sqrt({_dot_prefix_duck('embedding', 'embedding', d)}) *
                   sqrt({_dot_prefix_duck('qvec', 'qvec', d)})), 6) AS cos
            FROM abl_pairs"""
        for d in dims
    )
    return f"""
        WITH abl_probes AS (
          SELECT vec_id AS probe_id, embedding AS qvec
          FROM embeddings WHERE vec_id < {n_probes}),
        abl_pairs AS MATERIALIZED (
          SELECT e.vec_id, e.embedding, p.probe_id, p.qvec
          FROM embeddings e CROSS JOIN abl_probes p
          WHERE e.vec_id != p.probe_id),
        abl_tiers AS MATERIALIZED ({tier_selects}),
        abl_topk AS MATERIALIZED (
          SELECT probe_id, vec_id, dim FROM (
            SELECT probe_id, vec_id, dim,
                   row_number() OVER (PARTITION BY probe_id, dim
                                      ORDER BY cos DESC, vec_id) AS rn
            FROM abl_tiers) WHERE rn <= {k}),
        abl_truth AS (
          SELECT probe_id, vec_id AS tv FROM abl_topk WHERE dim = {max(dims)}),
        abl_hits AS (
          SELECT t.probe_id, t.dim FROM abl_topk t
          JOIN abl_truth g ON g.probe_id = t.probe_id AND g.tv = t.vec_id)
        SELECT dim, CAST({n_probes} AS BIGINT) AS n_probes,
               CAST(count(*) AS BIGINT) AS total_hits,
               ROUND(count(*) / CAST({k * n_probes} AS DOUBLE), 6) AS recall_at_k
        FROM abl_hits GROUP BY dim
    """


# -- contrastive hard-negative mining ----------------------------------------

HARDNEG_QUERY_MOD = 40
HARDNEG_QUERY_CAP = 2000  # fixed panel: same ≤50 queries at every SF
HARDNEG_K = 5


def hard_negatives(
    docs: DataFrame,
    k: int = HARDNEG_K,
    query_mod: int = HARDNEG_QUERY_MOD,
    cap: int = HARDNEG_QUERY_CAP,
) -> DataFrame:
    """Contrastive hard-negative mining over the documents corpus:
    (query_doc, neg_doc, rank, cosine) — the top-`k` most-similar docs
    that are NOT near-duplicates of the query. The op a contrastive /
    embedding-training pipeline runs to build its negative pairs: random
    negatives are too easy, true duplicates are false negatives, the
    valuable negatives sit just below the duplicate boundary.

    Composition of two published artifacts (nothing retrains):
    similarity = exact cosine over the hashed embedding table (the ANN
    family's brute tier — fixed broadcast panel × ONE candidate scan);
    the duplicate EXCLUSION is the MinHash LSH candidate relation
    (dedup.py::_band_rows — shares every banding constant with the dedup
    family, so "not a near-duplicate" here means exactly what the dedup
    pipeline would dedup). The exclusion join is panel-bands ⋈ corpus
    bands on (band, key) — banded, never all-pairs — and lands as a
    broadcast left-anti on the scored scan. At 100 TB: panel is bounded,
    both artifacts are the ones the ANN/dedup families already maintain,
    and the scan is the same single pass the brute ANN tier costs.

    No reference counterpart (training-data surface, SURVEY §2 extension
    family), oracle-checked like the rest of the catalog.
    """
    from .dedup import _band_rows
    from .ranking import hashed_doc_embeddings

    emb = hashed_doc_embeddings(docs)
    # Norms precompute once per vector (the crossmodal lesson): the HOF
    # folds are interpreted per element, so the inline 3-fold cosine in
    # the |panel|×|corpus| scan costs 3× the single dot — sqrt-of-fold
    # values are bit-identical either way, so the oracle keeps the
    # inline form. Measured 7.4 → ~2.5 s warm in the retrieval_suite.
    emb = emb.withColumn(
        "en", F.expr(f"sqrt({_dot_spark('embedding', 'embedding')})")
    )
    q = emb.where(
        (F.col("doc_id") % query_mod == 0) & (F.col("doc_id") < cap)
    ).select(
        F.col("doc_id").alias("query_doc"),
        F.col("embedding").alias("qvec"),
        F.col("en").alias("qn"),
    )

    bands = _band_rows(docs)
    qbands = bands.where(
        (F.col("doc_id") % query_mod == 0) & (F.col("doc_id") < cap)
    ).select(F.col("doc_id").alias("query_doc"), "band", "key")
    excluded = (
        bands.join(F.broadcast(qbands), ["band", "key"])
        .where(F.col("doc_id") != F.col("query_doc"))
        .select("query_doc", F.col("doc_id").alias("neg_doc"))
        .distinct()
    )

    cos = F.expr(
        f"ROUND({_dot_spark('embedding', 'qvec')} / (en * qn), 6)"
    )
    # The published embedding artifact is a single small parquet split at
    # test SFs, which would serialize the |panel|×|corpus| cosine
    # projection onto one core (the known single-split gotcha) — spread
    # the candidate side across the executors before the heavy stage.
    from .dedup import spread_cpu

    scored = (
        spread_cpu(emb).crossJoin(F.broadcast(q))
        .where(F.col("doc_id") != F.col("query_doc"))
        .select("query_doc", F.col("doc_id").alias("neg_doc"), cos.alias("cosine"))
        .join(F.broadcast(excluded), ["query_doc", "neg_doc"], "left_anti")
    )
    from pyspark.sql.window import Window

    rk = Window.partitionBy("query_doc").orderBy(
        F.col("cosine").desc(), F.col("neg_doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_doc", "neg_doc", "rank", "cosine")
    )


def hard_negatives_oracle(
    k: int = HARDNEG_K,
    query_mod: int = HARDNEG_QUERY_MOD,
    cap: int = HARDNEG_QUERY_CAP,
) -> str:
    from .dedup import _band_selects_sql, minhash_signatures_oracle
    from .ranking import hashed_doc_embeddings_oracle

    cos = cosine_duck("e.embedding", "q.qvec")
    return f"""
        WITH emb AS MATERIALIZED ({hashed_doc_embeddings_oracle()}),
        sigs AS MATERIALIZED ({minhash_signatures_oracle()}),
        bands AS MATERIALIZED ({_band_selects_sql()}),
        hn_q AS (SELECT doc_id AS query_doc, embedding AS qvec FROM emb
                 WHERE doc_id % {query_mod} = 0 AND doc_id < {cap}),
        hn_excl AS (
          SELECT DISTINCT qb.doc_id AS query_doc, cb.doc_id AS neg_doc
          FROM bands qb JOIN bands cb ON qb.band = cb.band AND qb.key = cb.key
          WHERE qb.doc_id % {query_mod} = 0 AND qb.doc_id < {cap}
            AND cb.doc_id != qb.doc_id),
        hn_scored AS (
          SELECT q.query_doc, e.doc_id AS neg_doc, {cos} AS cosine
          FROM emb e CROSS JOIN hn_q q
          WHERE e.doc_id != q.query_doc
            AND NOT EXISTS (SELECT 1 FROM hn_excl x
                            WHERE x.query_doc = q.query_doc
                              AND x.neg_doc = e.doc_id)),
        hn_ranked AS (
          SELECT query_doc, neg_doc, cosine,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_doc
                      ORDER BY cosine DESC, neg_doc ASC) AS INT) AS rank
          FROM hn_scored)
        SELECT query_doc, neg_doc, rank, cosine
        FROM hn_ranked WHERE rank <= {k}
    """
