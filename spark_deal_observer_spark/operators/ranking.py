"""Relevance ranking for training-data pipelines: TF-IDF term extraction,
BM25 document scoring, and grouped top-k selection.

These are the retrieval-side primitives of a data pipeline: TF-IDF keywords
feed quality/topic filters, BM25 ranks documents against a probe query
(e.g. dataset targeting or contamination triage), grouped top-k picks the
best documents per stratum for curriculum or subset building.

Scale posture (the shapes that survive 100 TB):
  * tokenize/explode runs in the scan stage; tf is ONE shuffle on
    (doc_id, token) with map-side partial aggregation;
  * the document-frequency table is tokens-sized (vocabulary ≪ corpus) and
    joins back broadcast;
  * corpus scalars (N, avg doc length) are one-row broadcast cross joins,
    never driver-side collects inside the operator;
  * top-k per group is a window row_number over the group partition — one
    shuffle on the group key, no global sort.

All generated SQL (JVM codegen in Spark) with DuckDB twins from the same
formula builders — the dual-dialect discipline of the dedup/text families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import tokens_sql
from ..functions.text import quality_sql

# BM25 free parameters (the standard Robertson defaults).
BM25_K1 = 1.2
BM25_B = 0.75

# Probe query for the registered bm25_scores query: frequent corpus terms so
# the score distribution is non-degenerate at every scale factor.
DEFAULT_QUERY_TERMS = ("join", "hash", "scan")


# -- TF-IDF top terms -------------------------------------------------------


def tfidf_top_terms(docs: DataFrame, top_k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, token, score, rank).

    score = tf · ln(N / df). Plan shape: explode in the scan stage, one
    (doc_id, token) shuffle for tf, a vocabulary-sized df aggregate joined
    back (broadcast at real scale — vocabulary ≪ corpus), the corpus size N
    as a one-row cross join, and a per-document window for the top-k.
    Deterministic: ties broken by token ascending.
    """
    toks = docs.select(
        "doc_id", F.explode(F.expr(tokens_sql("spark", "text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    # r9 (guide §2.4, the column-pruning reuse breaker): consumed bare,
    # dfreq's copy of the tf subtree gets its `tf` aggregate PRUNED
    # (df only counts rows), so the two tf exchanges no longer
    # canonicalize equal and the corpus tokenize+count pass ran TWICE per
    # execution. The always-true `tf >= 1` filter (count(*) of an
    # existing group is ≥ 1) references the aggregate output, keeping
    # both subtrees identical — ONE tokenize pass, ReusedExchange pinned
    # in tests/test_plans.py::test_rankers_reuse_one_tokenize_pass.
    dfreq = tf.where(F.col("tf") >= 1).groupBy("token").agg(
        F.count("*").alias("df")
    )
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            # ROUND before ranking, not after: JVM Math.log and libm log can
            # differ in the last ulp, and an unrounded ORDER BY would let
            # that flip ranks between the engines.
            F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "token", "score", "rank")
    )


def tfidf_top_terms_oracle(top_k: int = 3) -> str:
    toks = tokens_sql("duckdb", "text")
    return f"""
        WITH toks AS (SELECT doc_id, unnest({toks}) AS token FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
        dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS MATERIALIZED (
          SELECT tf.doc_id, tf.token,
                 ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS score
          FROM tf JOIN dfreq USING (token) CROSS JOIN n),
        ranked AS (
          SELECT doc_id, token, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, token ASC) AS rank
          FROM scored)
        SELECT doc_id, token, score, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= {top_k}
    """


# -- BM25 -------------------------------------------------------------------


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...] = DEFAULT_QUERY_TERMS,
    top_k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents by BM25 against a fixed term set: (doc_id, score).

    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)); the length normalization
    uses whitespace token count against the corpus mean. The query side is
    a literal handful of terms — tf for them is a scan-stage filtered
    aggregate, the two corpus scalars (N, avgdl) are one-row broadcast
    joins, and the final top-k is TakeOrdered on the ROUNDED score with
    doc_id tiebreak (rounding first keeps the sort identical across
    engines' last-ulp differences).
    """
    toks_e = tokens_sql("spark", "text")
    # r10 (guide §2.3/§2.4): the doc-length normalizer used to come from a
    # separate `lens` scan JOINED back onto tf — a corpus-sized join (at
    # 100 TB that join shuffles/broadcasts every document's length), plus
    # TWO more full scans for the corpus scalars (count in one, avg(dl)
    # in another). dl is a per-document constant, so it rides the tf
    # aggregate for free (min of a constant within the (doc_id, token)
    # group — exact), and both scalars fold into ONE aggregate over the
    # same length projection. documents passes: 4 → 2, the corpus-scale
    # length join: gone. Values identical: same dl double, same n/avgdl
    # over the same rows, same downstream arithmetic (oracle re-verified
    # at sf0.01 + sf0.1).
    base = docs.select(
        "doc_id", F.expr(toks_e).alias("toks")
    ).select(
        "doc_id",
        F.expr("CAST(size(toks) AS DOUBLE)").alias("dl"),
        F.explode("toks").alias("token"),
    )
    toks = base.where(F.col("token").isin(*terms))
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").alias("tf"), F.min("dl").alias("dl")
    )
    # r9 (guide §2.4): df used to be a second aggregate over tf joined
    # back — a duplicate of the tf subtree that Catalyst's asymmetric
    # isnotnull inference (from the lens join) kept from ever reusing, so
    # the term-filtered corpus pass shuffled twice per run. df = number
    # of tf rows per token IS a window count over tf: same value, zero
    # extra subtree, one tiny |terms|-keyed exchange instead of an
    # aggregate + broadcast join.
    tf_df = tf.withColumn("df", F.count("*").over(Window.partitionBy("token")))
    scal = docs.select(
        F.expr(f"CAST(size({toks_e}) AS DOUBLE)").alias("dl")
    ).agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    per_term = (
        tf_df.crossJoin(F.broadcast(scal))
        .select("doc_id", (idf * tf_part).alias("term_score"))
    )
    scored = per_term.groupBy("doc_id").agg(
        F.round(F.sum("term_score"), 6).alias("score")
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(top_k)
        .select("doc_id", "score")
    )


def bm25_scores_oracle(
    terms: tuple[str, ...] = DEFAULT_QUERY_TERMS,
    top_k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    toks = tokens_sql("duckdb", "text")
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH lens AS (SELECT doc_id, CAST(len({toks}) AS DOUBLE) AS dl FROM documents),
        toks AS (SELECT doc_id, unnest({toks}) AS token FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
               WHERE token IN ({term_list}) GROUP BY doc_id, token),
        dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        scal AS (SELECT (SELECT count(*) FROM documents) AS n,
                        (SELECT avg(dl) FROM lens) AS avgdl),
        per_term AS (
          SELECT tf.doc_id,
                 ln(1.0 + (scal.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * (tf.tf * ({k1} + 1))
                 / (tf.tf + {k1} * (1 - {b} + {b} * lens.dl / scal.avgdl)) AS term_score
          FROM tf JOIN dfreq USING (token) JOIN lens USING (doc_id) CROSS JOIN scal)
        SELECT doc_id, ROUND(sum(term_score), 6) AS score
        FROM per_term GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC LIMIT {top_k}
    """


# -- grouped top-k ----------------------------------------------------------


def grouped_topk(docs: DataFrame, top_k: int = 3) -> DataFrame:
    """Top-k documents per language stratum by composite quality score.

    The curriculum/subset-building primitive: one shuffle on the group key,
    a window row_number inside each group — never a global sort. Ties
    broken by doc_id ascending.
    """
    score = F.expr(quality_sql("spark", "text")["quality_score"])
    w = Window.partitionBy("lang").orderBy(F.col("qscore").desc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang", score.cast("double").alias("qscore"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("lang", "doc_id", F.col("qscore").alias("quality_score"), "rank")
    )


def grouped_topk_oracle(top_k: int = 3) -> str:
    score = quality_sql("duckdb", "text")["quality_score"]
    return f"""
        WITH scored AS (
          SELECT doc_id, lang, CAST({score} AS DOUBLE) AS quality_score FROM documents),
        ranked AS (
          SELECT lang, doc_id, quality_score,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY quality_score DESC, doc_id ASC) AS rank
          FROM scored)
        SELECT lang, doc_id, quality_score, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= {top_k}
    """


# -- unigram LM surprisal scoring -------------------------------------------


def unigram_logprob_scores(docs: DataFrame) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM (add-one smoothing): the classic model-based quality signal —
    gibberish and vocabulary-skewed documents sit far below the corpus mean,
    without shipping an external LM.

    score(d) = mean over tokens t of ln((count(t)+1) / (T + V)), with T =
    total corpus tokens, V = vocabulary size. Plan: one explode + (token)
    count for the LM (vocabulary-sized, broadcast back), the two corpus
    scalars as a one-row broadcast cross join, one (doc_id) shuffle for the
    per-doc mean. Same scale posture as TF-IDF."""
    toks = docs.select(
        "doc_id", F.explode(F.expr(tokens_sql("spark", "text"))).alias("token")
    )
    lm = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    scal = lm.agg(
        F.sum("cnt").alias("t_total"), F.count("*").alias("v_size")
    )
    logp = F.log(
        (F.col("cnt") + F.lit(1.0)) / (F.col("t_total") + F.col("v_size"))
    )
    return (
        toks.join(F.broadcast(lm), "token")
        .crossJoin(F.broadcast(scal))
        .groupBy("doc_id")
        .agg(F.round(F.avg(logp), 6).alias("mean_logprob"))
    )


def unigram_logprob_scores_oracle() -> str:
    toks = tokens_sql("duckdb", "text")
    return f"""
        WITH toks AS (SELECT doc_id, unnest({toks}) AS token FROM documents),
        lm AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
        scal AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t_total,
                        CAST(count(*) AS DOUBLE) AS v_size FROM lm)
        SELECT t.doc_id,
               ROUND(avg(ln((lm.cnt + 1.0) / (scal.t_total + scal.v_size))), 6)
                 AS mean_logprob
        FROM toks t JOIN lm USING (token) CROSS JOIN scal
        GROUP BY t.doc_id
    """


# -- feature-hashed document embeddings (the hashing trick) -----------------

EMBED_DIM = 64


def hashed_doc_embeddings(docs: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """L2-normalized hashed bag-of-words embedding per document
    (feature hashing, Weinberger et al. 2009): token → hash32 % dim buckets,
    counts assembled into a dense vector and normalized.

    This is the embedding GENERATOR the rest of the vector family (ANN,
    kNN join, k-means, near-dup) consumes — text in, `array<double>` out,
    entirely in generated SQL: explode in the scan stage, ONE (doc_id)
    shuffle carrying dim partial sums per doc (map-side combined), the
    vector assembled from `dim` conditional aggregates. No Python, no
    external model; the oracle builds the identical vector.

    Published per (input, dim) through the session artifact registry like
    the MinHash/SimHash signature tables — the embedding table is shared
    dominant compute (the registered query, the text-scoring gate suite,
    and any downstream vector consumer read the same artifact), so the
    tokenize+hash+aggregate pass runs once per corpus snapshot."""
    from ..functions.hashing import hash32_sql
    from .models import published

    def build() -> DataFrame:
        toks = docs.select(
            "doc_id", F.explode(F.expr(tokens_sql("spark", "text"))).alias("token")
        )
        dims = toks.select(
            "doc_id", F.expr(f"{hash32_sql('token', 'spark')} % {dim}").alias("d")
        )
        # Two-level aggregate so the L2 norm is a PLAIN aggregate, never an
        # unrolled dim²-term expression: the unrolled form puts dim² multiply
        # terms (plus a sqrt tree per component) into one generated Java class,
        # which OOMs janino on a default-heap driver. sum(cnt*cnt) over INTEGER
        # bucket counts is exactly associative, so the arbitrary row order of
        # the aggregate lands on the identical double as the oracle's ordered
        # c0²+c1²+… chain (integer-valued doubles add exactly below 2^53).
        cnts = dims.groupBy("doc_id", "d").agg(F.count("*").alias("cnt"))
        sums = cnts.groupBy("doc_id").agg(
            *[
                F.sum(F.when(F.col("d") == i, F.col("cnt")).otherwise(0))
                .cast("double")
                .alias(f"c{i}")
                for i in range(dim)
            ],
            F.sqrt(F.sum(F.col("cnt") * F.col("cnt")).cast("double")).alias("nrm"),
        )
        arr = F.array(*[F.col(f"c{i}") for i in range(dim)])
        vec = F.transform(arr, lambda x: F.round(x / F.col("nrm"), 6))
        # docs x dim doubles: corpus-sized -> columnar disk artifact
        from .models import disk_checkpoint

        return disk_checkpoint(
            sums.select("doc_id", vec.alias("embedding")), "hashed_emb"
        )

    return published(docs, "hashed_emb", (dim,), build)


def hashed_doc_embeddings_oracle(dim: int = EMBED_DIM) -> str:
    from ..functions.hashing import hash32_sql

    toks = tokens_sql("duckdb", "text")
    cases = ", ".join(
        f"CAST(sum(CASE WHEN d = {i} THEN 1 ELSE 0 END) AS DOUBLE) AS c{i}"
        for i in range(dim)
    )
    # norm factored into its own CTE level: inlining sqrt(Σc²) into every
    # component made the SQL O(dim²) in text size — noticeable at the
    # crossmodal map's 256-dim input. sqrt once, divide per component:
    # value-identical doubles either way.
    allc = ", ".join(f"c{i}" for i in range(dim))
    # list_sum over a FLAT list literal, not a `+` chain: DuckDB's binder
    # recurses per binary op and hits its depth cap (128) at dim 256.
    # c_i are integer-valued doubles, so any summation order is exact.
    sq = "list_sum([" + ", ".join(f"c{i} * c{i}" for i in range(dim)) + "])"
    comps = ", ".join(f"ROUND(c{i} / emb_nrm, 6)" for i in range(dim))
    return f"""
        WITH dims AS (
          SELECT doc_id, {hash32_sql('token', 'duckdb')} % {dim} AS d
          FROM (SELECT doc_id, unnest({toks}) AS token FROM documents)),
        sums AS (SELECT doc_id, {cases} FROM dims GROUP BY doc_id),
        emb_nrmd AS (SELECT doc_id, {allc}, sqrt({sq}) AS emb_nrm FROM sums)
        SELECT doc_id, [{comps}] AS embedding FROM emb_nrmd
    """


# -- hybrid retrieval (reciprocal-rank fusion) ------------------------------

RRF_K = 60  # the standard RRF dampening constant (Cormack et al. 2009)


def hybrid_rrf(
    docs: DataFrame,
    emb: DataFrame,
    query_vec_id: int = 0,
    list_k: int = 20,
    top_k: int = 10,
) -> DataFrame:
    """Hybrid lexical+vector retrieval fused with reciprocal-rank fusion:
    rrf(d) = Σ_lists 1/(RRF_K + rank_list(d)) over the BM25 top-`list_k`
    (probe terms) and the cosine top-`list_k` (query vector) — the standard
    two-tower retrieval head of a RAG / data-targeting pipeline.

    Scale shape: each retriever produces a BOUNDED list (`list_k` rows), so
    the fusion is driver-free arithmetic over two tiny lists — full-outer
    join on doc id, rank-reciprocal sum, top-`top_k`. The single-partition
    rank windows are over `list_k` rows, not the corpus; all corpus-sized
    work lives inside the two retrievers, which keep their own scale
    postures (BM25: scan-stage tf + broadcast scalars; cosine: broadcast
    query + TakeOrdered). Missing-from-one-list contributes 0 — exactly the
    RRF convention."""
    from .similarity import brute_force_topk

    w_bm = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bm = (
        bm25_scores(docs, top_k=list_k)
        .withColumn("bm25_rank", F.row_number().over(w_bm).cast("int"))
        .select("doc_id", "bm25_rank")
    )
    w_cos = Window.orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    cos = (
        brute_force_topk(emb, query_vec_id=query_vec_id, k=list_k)
        .withColumn("cos_rank", F.row_number().over(w_cos).cast("int"))
        .select(F.col("vec_id").alias("doc_id"), "cos_rank")
    )
    rec = lambda r: F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col(r)), F.lit(0.0))
    return (
        bm.join(cos, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(rec("bm25_rank") + rec("cos_rank"), 6).alias("rrf_score"),
            "bm25_rank",
            "cos_rank",
        )
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
        .limit(top_k)
    )


def hybrid_rrf_oracle(
    query_vec_id: int = 0, list_k: int = 20, top_k: int = 10
) -> str:
    from .similarity import brute_force_topk_oracle

    rec = lambda r: f"COALESCE(1.0 / ({RRF_K} + {r}), 0.0)"
    return f"""
        WITH bm AS (
          SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
                   AS bm25_rank
          FROM ({bm25_scores_oracle(top_k=list_k)})),
        cos AS (
          SELECT vec_id AS doc_id,
                 CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS INT)
                   AS cos_rank
          FROM ({brute_force_topk_oracle(query_vec_id=query_vec_id, k=list_k)}))
        SELECT COALESCE(bm.doc_id, cos.doc_id) AS doc_id,
               ROUND({rec('bm25_rank')} + {rec('cos_rank')}, 6) AS rrf_score,
               bm25_rank, cos_rank
        FROM bm FULL OUTER JOIN cos USING (doc_id)
        ORDER BY rrf_score DESC, doc_id ASC LIMIT {top_k}
    """


# -- frequent n-grams (heavy hitters) ---------------------------------------


def ngram_heavy_hitters(docs: DataFrame, n: int = 3, top_k: int = 25) -> DataFrame:
    """Corpus-wide most-frequent token `n`-grams: (ngram, cnt) — the
    boilerplate detector (repeated headers/footers/license blurbs surface
    as heavy hitters) and the phrase-level corpus statistic.

    Plan: gram expansion in the scan stage, ONE (ngram) shuffle with
    map-side partial counts, TakeOrdered for the top-k — the exact heavy-
    hitter shape that survives 100 TB. Skewed grams are absorbed by the
    partial aggregation (each task emits one row per distinct gram);
    at extreme cardinality the count-min/HLL analog is the
    `approx_distinct_users` sketch family."""
    toks = docs.select(F.expr(tokens_sql("spark", "text")).alias("t"))
    from ..functions.hashing import token_ngrams_sql

    grams = toks.select(
        F.explode(F.expr(token_ngrams_sql("spark", "t", n))).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("ngram").asc())
        .limit(top_k)
    )


def ngram_heavy_hitters_oracle(n: int = 3, top_k: int = 25) -> str:
    from ..functions.hashing import token_ngrams_sql

    toks = tokens_sql("duckdb", "text")
    grams = token_ngrams_sql("duckdb", "t", n)
    return f"""
        WITH toks AS (SELECT {toks} AS t FROM documents),
        grams AS (SELECT unnest({grams}) AS ngram FROM toks)
        SELECT ngram, count(*) AS cnt FROM grams
        GROUP BY ngram ORDER BY cnt DESC, ngram ASC LIMIT {top_k}
    """


# -- interpolated bigram-LM perplexity (CCNet-style quality filter) ---------

# Interpolation weight on the bigram term; the unigram backoff carries the
# rest. Fixed (not tuned) — the bucket CONTRACT, not the value, is the
# operator's surface.
PPL_LAMBDA = 0.7
PPL_TERTILES = (1.0 / 3.0, 2.0 / 3.0)


def _ppl_scores_plan(docs: DataFrame) -> DataFrame:
    """Per-document perplexity under an interpolated bigram LM trained on
    the corpus itself (the plan behind `lm_perplexity` — point plan-shape
    tests here; the registered query reads the published checkpoint).

    p(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·(c(w2)+1)/(T+V)
    ppl(d)   = exp(−mean over d's adjacent-token transitions of ln p)

    Every scored transition was counted into the LM (self-trained), so the
    bigram join always hits; the add-one unigram backoff is what makes the
    same model honest on HELD-OUT text (unseen w2 still scores).

    Scale shape — ONE corpus scan: each token array is prepended with a
    sentinel BOS token (a single space — whitespace-split tokens can never
    contain one, so it is collision-free by construction), and adjacent
    pairs come from `arrays_zip(slice(...), slice(...))` IN THE SCAN STAGE
    (codegen'd expressions, no window, no interpreted HOF lambda). Every
    REAL token then appears exactly once as the target of a transition, so
    the unigram LM falls out of the same per-(doc, bigram) aggregation
    that feeds the bigram LM — no second tokenize pass (a naive
    separate-unigram-scan shape measured 2× the scan work at sf0.1, and at
    100 TB the scan IS the cost). The one corpus-sized shuffle is the
    (doc, prev, token) compression with map-side combine, checkpointed as
    the shared input of every aggregate (separate actions do not reuse
    shuffle files — unchecked, the tokenize pass re-executes once per
    consumer); everything downstream is vocabulary-sized: bigram and
    unigram counts are small aggregates over the checkpoint, the unigram
    LM broadcasts into both of its join slots, and the two corpus scalars
    (T, V) fold to literals.
    BOS transitions are excluded from scoring, which also preserves the
    contract that docs with <2 real tokens are unscored.
    """
    from .dedup import spread_cpu

    toks_expr = tokens_sql("spark", "text")
    # spread: the tokenize pass is CPU-dominant and a small parquet corpus
    # arrives as ONE split; no-op on a real many-split scan.
    t = spread_cpu(docs.select("doc_id", "text")).select(
        "doc_id", F.expr(f"concat(array(' '), {toks_expr})").alias("toks")
    )
    trans = (
        t.select(
            "doc_id",
            F.explode(
                F.expr(
                    "arrays_zip(slice(toks, 1, size(toks) - 1), "
                    "slice(toks, 2, size(toks) - 1))"
                )
            ).alias("pr"),
        )
        .select("doc_id", F.col("pr.0").alias("prev"), F.col("pr.1").alias("token"))
    )
    # dt is the SHARED input of all three aggregates below (unigram LM,
    # bigram LM, per-doc scoring) — checkpoint it so the corpus is scanned
    # exactly once per training run (separate actions do not reuse shuffle
    # files; without this the tokenize pass executes once per consumer).
    # It is the per-doc DISTINCT-bigram compression of the corpus; at
    # 100 TB this is the table a production run would persist DISK_ONLY
    # for the duration of the two vocabulary-sized aggregates.
    dt = (
        trans.groupBy("doc_id", "prev", "token")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    ug = dt.groupBy("token").agg(F.sum("n").alias("ug_cnt"))
    t_total, v_size = (
        ug.agg(F.sum("ug_cnt").cast("double"), F.count("*").cast("double"))
        .first()
    )
    real = dt.where(F.col("prev") != F.lit(" "))
    bg = real.groupBy("prev", "token").agg(F.sum("n").alias("bg_cnt"))
    lam = F.lit(PPL_LAMBDA)
    p = lam * F.col("bg_cnt") / F.col("prev_cnt") + (F.lit(1.0) - lam) * (
        F.col("ug_cnt") + F.lit(1.0)
    ) / (F.lit(float(t_total)) + F.lit(float(v_size)))
    return (
        real.join(bg, ["prev", "token"])
        .join(
            F.broadcast(
                ug.select(
                    F.col("token").alias("prev"), F.col("ug_cnt").alias("prev_cnt")
                )
            ),
            "prev",
        )
        .join(F.broadcast(ug), "token")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.exp(-F.sum(F.col("n") * F.log(p)) / F.sum("n")), 4
            ).alias("perplexity")
        )
    )


def lm_perplexity(docs: DataFrame) -> DataFrame:
    """CCNet-style perplexity filter (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    score every document's perplexity under a corpus-trained bigram LM and
    bucket the corpus into head/middle/tail at the exact perplexity
    tertiles — the classic keep-the-head / sample-the-middle / drop-the-
    tail curation signal.

    The scored table is published through the session artifact registry
    (shared dominant compute — the registered query, the text-scoring gate
    suite, and any downstream curation step read one training pass) and the
    tertile thresholds come from `exact_quantiles` (sketch-bracket +
    exact-refine, bit-exact with DuckDB `quantile_cont`) over the
    checkpointed scores — two docs-table-sized actions, no value-buffer
    percentile aggregate. At 100 TB the thresholds would come from a
    sample (CCNet itself computes them on a reference subset); the knob is
    the `ps` argument of `exact_quantiles`, the bucket labeling is
    unchanged. Docs with <2 tokens have no transitions and are (by
    definition) unscored.
    """
    from .models import disk_checkpoint, published
    from .profile import exact_quantiles

    scored = published(
        docs,
        "bigram_ppl",
        (PPL_LAMBDA,),
        # one row per doc: corpus-sized -> columnar disk artifact
        lambda: disk_checkpoint(_ppl_scores_plan(docs), "bigram_ppl"),
    )
    t1, t2 = exact_quantiles(scored, "perplexity", list(PPL_TERTILES))
    return scored.select(
        "doc_id",
        "perplexity",
        F.when(F.col("perplexity") <= F.lit(t1), "head")
        .when(F.col("perplexity") <= F.lit(t2), "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


def lm_perplexity_oracle() -> str:
    toks = tokens_sql("duckdb", "text")
    lam = PPL_LAMBDA
    return f"""
        WITH t AS MATERIALIZED (
          SELECT doc_id, list_prepend(' ', {toks}) AS toks FROM documents),
        tr AS (
          SELECT doc_id, pr[1] AS prev, pr[2] AS token
          FROM (SELECT doc_id,
                       unnest(list_zip(toks[:len(toks) - 1], toks[2:])) AS pr
                FROM t WHERE len(toks) >= 2)),
        dt AS MATERIALIZED (SELECT doc_id, prev, token, CAST(count(*) AS DOUBLE) AS n
               FROM tr GROUP BY doc_id, prev, token),
        ug AS MATERIALIZED (SELECT token, sum(n) AS ug_cnt FROM dt GROUP BY token),
        bg AS (SELECT prev, token, sum(n) AS bg_cnt FROM dt
               WHERE prev <> ' ' GROUP BY prev, token),
        scal AS (SELECT CAST(sum(ug_cnt) AS DOUBLE) AS t_total,
                        CAST(count(*) AS DOUBLE) AS v_size FROM ug),
        scored AS (
          SELECT dt.doc_id,
                 ROUND(exp(-(sum(dt.n * ln(
                   {lam} * bg.bg_cnt / pu.ug_cnt
                   + {1.0 - lam} * (wu.ug_cnt + 1.0)
                     / (scal.t_total + scal.v_size))) / sum(dt.n))), 4)
                   AS perplexity
          FROM dt
          JOIN bg ON dt.prev = bg.prev AND dt.token = bg.token
          JOIN ug pu ON pu.token = dt.prev
          JOIN ug wu ON wu.token = dt.token
          CROSS JOIN scal
          WHERE dt.prev <> ' '
          GROUP BY dt.doc_id),
        th AS (SELECT quantile_cont(perplexity, {PPL_TERTILES[0]!r}) AS t1,
                      quantile_cont(perplexity, {PPL_TERTILES[1]!r}) AS t2
               FROM scored)
        SELECT s.doc_id, s.perplexity,
               CASE WHEN s.perplexity <= th.t1 THEN 'head'
                    WHEN s.perplexity <= th.t2 THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM scored s CROSS JOIN th
    """


def postings_index(docs: DataFrame) -> DataFrame:
    """(token, doc_id, tf, df): the materialized inverted index — the
    storage structure the BM25/TF-IDF heads implicitly rebuild, made an
    explicit artifact a serving system would write token-partitioned
    (point lookups become partition pruning). One scan-stage explode, one
    (doc_id, token) shuffle for tf, and the vocabulary-sized df aggregate
    joined back broadcast — identical plan mass to one ranking pass."""
    toks = docs.select(
        "doc_id", F.explode(F.expr(tokens_sql("spark", "text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    dfreq = tf.groupBy("token").agg(F.count("*").cast("bigint").alias("df"))
    return tf.join(F.broadcast(dfreq), "token").select(
        "token", "doc_id", "tf", "df"
    )


def postings_index_oracle() -> str:
    toks = tokens_sql("duckdb", "text")
    return f"""
        WITH toks AS (SELECT doc_id, unnest({toks}) AS token FROM documents),
        tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
               FROM toks GROUP BY doc_id, token),
        dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
                  FROM tf GROUP BY token)
        SELECT tf.token, tf.doc_id, tf.tf, dfreq.df
        FROM tf JOIN dfreq USING (token)
    """
