"""Cross-modal retrieval: text query → media corpus top-k (VERDICT r6 #5).

The one LLM-pipeline shape the engine lacked: given a TEXT query, rank a
MEDIA corpus by relevance — the "find the images for this caption" head
of a multimodal training-data pipeline. The two modalities live in
incompatible spaces (hashed bag-of-words vs decoded-byte bucket means),
so retrieval goes through a TRAINED LINEAR MAP — the trained analog of
the data-independent JL projection in similarity.random_projection:

    W = D⁻¹ · Xᵀ · Y_c        (diagonally-whitened cross-covariance)

where X = text embeddings (ranking.hashed_doc_embeddings at
XMODAL_TEXT_DIM = 256 — widened from 64 in r8, see the constant's
docstring for the measured ladder), Y_c = centered media bucket-mean
vectors (media.media_bucket_means, 64 buckets) over PAIRED training docs
(each doc's own media rendering is its positive pair), and D =
diag(XᵀX). Among the SQL-expressible maps measured at sf0.01 on the
full paired panel (n=486), diagonal whitening at 256-dim input reaches
recall@10 0.288 — tying closed-form ridge at any λ/dim (the linear-map
ceiling here) while costing ONE aggregation pass; raw covariance scores
0.12 — see tests/test_crossmodal.py for the pinned floor.

Cross-engine exactness discipline (every aggregate is order-free exact
integer math; the ONLY rounded division is W itself):

- 6-dp inputs are scaled to ints (×1e6); sums of products accumulate in
  DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact, order-independent.
- Centering avoids a mean division entirely: y_c ∝ n·y − Σy (exact
  ints); cosine is invariant to the uniform n scaling.
- w6 = ROUND(N/D, 6) is the single cross-engine rounding boundary,
  via the shortest-repr round template (D is a huge unstructured
  denominator, so exact 6-dp ties are measure-zero — unlike the dyadic
  media ratios that bit round 6).
- Projected queries p_j = Σ_i xq_i·w6_ij are again exact scaled-int
  sums; the final cosine over (p, y_c) is the established ANN pattern
  (doubles from exact ints, ordered-array folds, ROUND 6).

Scale shape: training is one X⋈Y join fanning out dim² rows per paired
doc, map-side combined into a 4096-row W — published once per corpus
snapshot through operators/models.py (at 100 TB you'd bound the pair
sample; the train_mod knob is that lever). Retrieval is the brute-force
tier: queries are a bounded deterministic sample, broadcast against the
candidate vectors (one corpus scan, TakeOrdered per query); the IVF
ladder in operators/similarity.py is the drop-in scale path once the
projected queries live in media space.

Reference parity note: the reference (CheckerNetwork/spark-deal-observer)
has no media pipeline; this family is part of the brief's
training-data-pipeline surface, not a reference port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import round6_sql

XMODAL_DIM = 64          # media side: PHASH_BUCKETS bucket-mean dims
# Text-side input dim for the trained map. r8 (VERDICT r7 #3a): widening
# the hashed-BOW input from 64 → 256 is the one linear-map upgrade that
# measured above the diag-whitening floor on the FULL paired panel
# (n=486, sf0.01): r@10 0.251 → 0.288, r@5 0.195 → 0.212, mrr 0.165 →
# 0.182. Closed-form ridge (any λ, any dim) tied 0.288 r@10 — not worth
# a 256×256 solve the SQL can't express; 20/40-step GD diverged in the
# experiment and was dropped (recorded negative result). Cost: W grows
# to 256×64 rows (still broadcast-trivial) and the one-off training join
# fans 4× (256·64 terms/paired doc) — retrieval cost is unchanged since
# cosine stays in 64-dim media space.
XMODAL_TEXT_DIM = 256
# Length-routed local maps (VERDICT r8 #4): r8 proved 0.288 recall@10 is
# the ridge ceiling of ANY global linear map at these features, so r9
# changes the FEATURES — piecewise linearity. Docs route into 4 cells by
# FIXED text-length cuts (media bucket means segment BY length, so the
# x→y relationship bends with length); one diagonally-whitened map
# trains per cell (per-cell X stats, GLOBAL y-centering so predictions
# rank against the whole candidate corpus). Fixed cuts — not quantiles —
# keep routing a pure per-doc function, so the per-cell moments stay
# abelian and the streaming maintainer carries over bit-exactly.
# Measured on the full paired panel (n=486, sf0.01,
# scripts/xmodal_local_experiment.py): recall@10 0.288 → 0.679, r@5
# 0.212 → 0.611, MRR 0.182 → 0.490, cells balanced (min 107/486).
# kmeans-cell routing measured 0.426/0.537/0.735 @ C=4/8/16 but
# degenerates to 1-member cells at C≥8; length cells are balanced at
# every SF (media-doc length quartiles ≈ 185/305/420 at sf0.001-0.1).
# HONEST LIMIT (recorded, SCALE.md §r9): the panel metric is IN-SAMPLE
# (training pairs are the queries, the established r8 methodology);
# held-out recall is chance level for EVERY linear/piecewise variant
# including the r8 global map — hashed BOW destroys the positional
# structure the media space is built from, so the map family encodes
# the training pairing rather than generalizing. Local maps raise that
# encoding capacity 2.4×, which is what this metric measures.
XMODAL_LEN_CUTS = (192, 304, 420)
XMODAL_QUERY_MOD = 10    # query sample: media docs with doc_id % mod == 0
XMODAL_QUERY_CAP = 500   # ...restricted to doc_id < cap: the query set is a
                         # FIXED 50-doc panel at every SF, so retrieval cost
                         # scales with the corpus only on the candidate side
XMODAL_TRAIN_MOD = 1     # training-pair sample (1 = all paired docs)
XMODAL_TOPK = 5
XMODAL_IVF_CELLS = 8     # coarse cells over the media corpus (IVF tier)
XMODAL_IVF_PROBE = 2     # cells probed per query → scan probe/n_cells

_S = 1_000_000  # 6-dp fixed-point scale


def _int6(col):
    """6-dp double → exact scaled BIGINT (ROUND repairs the float fuzz)."""
    return F.round(col * _S).cast("long")


def _text_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, i, xi_int): the dense exploded text embedding, 0-based i.

    XMODAL_TEXT_DIM (256) is a crossmodal-only artifact next to the ANN
    family's 64-dim table — `published` keys on (input plan, dim), so the
    two never alias."""
    from ..operators.ranking import hashed_doc_embeddings

    emb = hashed_doc_embeddings(docs, dim=XMODAL_TEXT_DIM)
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("i", "x")
    ).select("doc_id", "i", _int6(F.col("x")).alias("xi"))


def _media_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, j, yi_int): decoded bucket means, published once per
    corpus snapshot (the Arrow decode pass is the dominant cost)."""
    from ..operators.models import disk_checkpoint, published
    from .media import attach_media, media_bucket_means

    def build() -> DataFrame:
        means = media_bucket_means(attach_media(docs))
        return disk_checkpoint(
            means.select(
                "doc_id",
                F.col("bucket").cast("int").alias("j"),
                _int6(F.col("mean")).alias("yi"),
            ),
            "xmodal_means",
        )

    return published(docs, "xmodal_means", (), build)


def _centered_media(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(ycn rows for ALL media docs, 1-row training-count frame).

    ycn = n·y − Σ_train y in exact scaled ints — centering without a
    mean division; cosine is invariant to the uniform n factor."""
    y = _media_rows(docs)
    train = y.where(F.col("doc_id") % XMODAL_TRAIN_MOD == 0)
    stats = train.groupBy("j").agg(
        F.sum("yi").alias("sy"), F.count("*").alias("n")
    )
    ycn = y.join(F.broadcast(stats), "j").select(
        "doc_id", "j", (F.col("n") * F.col("yi") - F.col("sy")).alias("ycn")
    )
    return ycn, stats.select("n").limit(1)


def crossmodal_cell_moments(docs: DataFrame) -> DataFrame:
    """r9 OPTIMIZATION (guide §2.4 — remove whole passes, not just
    shuffles): the ONE corpus-scale crossmodal training pass, published.

    Before this round the x⋈y dim-fanout join ran THREE times per cold
    build (global n_tab, local n_tab, and the registered moments query —
    which, unpublished, re-ran it on every WARM bench run too: ~4 s/run
    at sf0.1). Every one of those consumers is a pure function of the
    per-cell abelian moment families (kind, cell, i, j, v) that the
    streaming maintainer already sum-merges — so build THAT table once
    per corpus snapshot and derive everything else from it:

      global moments  = Σ_cells          (exact integer sums)
      global W        : num = n·S − T·sy, den = D      (read_w identity)
      local  W        : num_c = n·S_c − T_c·sy, den_c = D_c
      xstats (pvec)   : sx_i = T_i, m = n  (zero x-components add 0)

    Each identity is the one tests/test_streaming_crossmodal.py pins
    bit-identical against the direct training join; the direct plans are
    kept as `_w_direct_plan`/`_local_w_direct_plan` and equality is
    re-pinned per build in tests/test_crossmodal.py."""
    from ..operators.models import published
    from ..streaming.crossmodal_maint import batch_local_moments

    def build() -> DataFrame:
        return batch_local_moments(docs).localCheckpoint()  # ≤ 4·dim·65 rows

    return published(docs, "xmodal_cell_moments", (XMODAL_TRAIN_MOD,), build)


def _global_moments(docs: DataFrame) -> DataFrame:
    """(kind, i, j, v): the global five-family moments — exact integer
    cell-sums of the published per-cell table (each doc lives in exactly
    one cell, so Σ_cells S_c,ij = S_ij etc.; sy/n are stored global)."""
    m = crossmodal_cell_moments(docs)
    xtd = (
        m.where(F.col("kind").isin("S", "T", "D"))
        .groupBy("kind", "i", "j")
        .agg(F.sum("v").alias("v"))
    )
    return xtd.unionByName(
        m.where(F.col("kind").isin("sy", "n")).select("kind", "i", "j", "v")
    )


def crossmodal_projection(docs: DataFrame) -> DataFrame:
    """The published 4096-row linear map: (i, j, w6) with
    w6 = ROUND(Σ_train xi·ycn_j / Σ_train xi², 6) — derived from the
    published moments via num = n·S − T·sy, den = D (the exact-integer
    identity CrossmodalMomentSink.read_w uses, pinned bit-identical to
    the direct training join by tests/test_streaming_crossmodal.py and
    tests/test_crossmodal.py::test_moment_derived_w_equals_direct)."""
    from ..operators.models import published

    def build() -> DataFrame:
        m = _global_moments(docs)
        s = m.where("kind = 'S'").select("i", "j", F.col("v").alias("s"))
        t = m.where("kind = 'T'").select("i", F.col("v").alias("t"))
        d = m.where("kind = 'D'").select("i", F.col("v").alias("den"))
        sy = m.where("kind = 'sy'").select("j", F.col("v").alias("sy"))
        n = m.where("kind = 'n'").select(F.col("v").alias("n"))
        w = (
            s.join(F.broadcast(t), "i")
            .join(F.broadcast(d), "i")
            .join(F.broadcast(sy), "j")
            .crossJoin(F.broadcast(n))
            .select(
                "i",
                "j",
                F.when(F.col("den") == 0, F.lit(0.0))
                .otherwise(
                    F.round(
                        (F.col("n") * F.col("s") - F.col("t") * F.col("sy")).cast(
                            "double"
                        )
                        / F.col("den").cast("double"),
                        6,
                    )
                )
                .alias("w6"),
            )
        )
        return w.localCheckpoint()  # node-sized: dim² rows

    return published(docs, "xmodal_w", (XMODAL_TRAIN_MOD,), build)


def _w_direct_plan(docs: DataFrame) -> DataFrame:
    """The pre-r9 DIRECT training join (unpublished): one x⋈ycn fanout
    aggregated to (i, j, w6). Kept as the independent second derivation
    the moments-path equality test compares against — zero x-components
    contribute exactly 0 to num and den, so the nonzero filter is
    value-neutral; a dim whose every paired component is zero leaves W
    entirely (both factors 0)."""
    x = _text_rows(docs).where(
        (F.col("doc_id") % XMODAL_TRAIN_MOD == 0) & (F.col("xi") != 0)
    )
    ycn, _ = _centered_media(docs)
    ytrain = ycn.where(F.col("doc_id") % XMODAL_TRAIN_MOD == 0)
    paired = ytrain.select("doc_id").distinct()
    n_tab = (
        x.join(ytrain, "doc_id")
        .groupBy("i", "j")
        .agg(
            F.sum(
                F.col("xi").cast("decimal(38,0)")
                * F.col("ycn").cast("decimal(38,0)")
            ).alias("num")
        )
    )
    d_tab = (
        x.join(F.broadcast(paired), "doc_id")
        .groupBy("i")
        .agg(
            F.sum(
                F.col("xi").cast("decimal(38,0)")
                * F.col("xi").cast("decimal(38,0)")
            ).alias("den")
        )
    )
    return n_tab.join(d_tab, "i").select(
        "i",
        "j",
        F.when(F.col("den") == 0, F.lit(0.0))
        .otherwise(
            F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6)
        )
        .alias("w6"),
    )


def _vec(df: DataFrame, key: str, pos: str, val: str, out: str) -> DataFrame:
    """Assemble (key, ordered array<double>) — array order IS the fold
    order, which is what makes the cosine bit-identical across engines."""
    return df.groupBy(key).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(pos), F.col(val).alias("v")))),
            lambda s: s["v"].cast("double"),
        ).alias(out)
    )


def _dot(a: str, b: str) -> str:
    """Ordered left-fold dot product (interpreted HOF — measured FASTER
    here than the unrolled codegen form: 4.0 s vs 8.0 s warm at sf0.1,
    the 128-element_at expression fused into the cross-join stage loses
    to the tight interpreted fold; the reverse of the JL-projection
    finding, recorded in SCALE.md). Array order IS the fold order, which
    keeps the value bit-identical to the oracle's list_sum."""
    return (
        f"aggregate(zip_with({a}, {b}, (p, q) -> p * q), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _pvec_yvec(
    docs: DataFrame, query_mod: int = XMODAL_QUERY_MOD
) -> tuple[DataFrame, DataFrame]:
    """The shared retrieval inputs: projected query vectors
    (query_doc, pv, pn) and candidate media vectors (doc_id, yv, yn) —
    used by both the brute-force tier and the IVF tier, so both are
    PUBLISHED (yvec corpus-sized → disk; pvec panel-sized → memory):
    running the two tiers in one suite pays the xstats corpus aggregate
    and the yvec assembly once, not twice."""
    from ..operators.models import disk_checkpoint, published

    def _build() -> tuple[DataFrame, DataFrame]:
        return _pvec_yvec_plan(docs, query_mod)

    pvec = published(
        docs, "xmodal_pvec", (query_mod,), lambda: _build()[0].localCheckpoint()
    )
    yvec = published(
        docs, "xmodal_yvec", (), lambda: disk_checkpoint(_build()[1], "xmodal_yvec")
    )
    return pvec, yvec


def _pvec_yvec_plan(
    docs: DataFrame, query_mod: int = XMODAL_QUERY_MOD
) -> tuple[DataFrame, DataFrame]:
    """The unpublished plan builders (plan-shape tests point here)."""
    w = crossmodal_projection(docs)
    # Queries are CENTERED against the paired-training-doc mean before
    # projecting (measured: 0.163 recall@5 vs 0.060 uncentered at
    # sf0.01 — the raw bag-of-words vector is dominated by the corpus-
    # common direction, which projects onto the corpus-mean media vector
    # for every query). Same no-division trick as the media side:
    # xcn = m·x − Σ_train x in exact scaled ints; cosine is invariant to
    # the uniform m factor.
    x = _text_rows(docs)
    ycn_all, _ = _centered_media(docs)
    # r9: the centering stats are moments — sx_i = T_i (zero x-components
    # add exactly 0 to the sum) and m = n (the dense explode emits every
    # i once per paired doc, so the per-i row count IS the paired-doc
    # count). Deriving them from the published moments removes the
    # corpus-scale dense-explode aggregate this plan used to pay. An i
    # absent from T (no paired doc has a nonzero component there) is
    # also absent from W, so its xq rows died in the W join anyway —
    # final p is row-identical (exact integers either way).
    m_ = _global_moments(docs)
    xstats = m_.where("kind = 'T'").select("i", F.col("v").alias("sx"))
    n_sc = m_.where("kind = 'n'").select(F.col("v").alias("m"))
    xq = (
        x.where(
            (F.col("doc_id") % query_mod == 0)
            & (F.col("doc_id") < XMODAL_QUERY_CAP)
        )
        .join(F.broadcast(xstats), "i")
        .crossJoin(F.broadcast(n_sc))
        .select(
            "doc_id", "i", (F.col("m") * F.col("xi") - F.col("sx")).alias("xcn")
        )
    )
    # p_{q,j} = Σ_i xcn_i · w6_ij in exact scaled ints (decimal sums).
    p = (
        xq.join(
            F.broadcast(w.select("i", "j", _int6(F.col("w6")).alias("wi"))), "i"
        )
        .groupBy(F.col("doc_id").alias("query_doc"), "j")
        # cast each FACTOR to decimal: the long*long product overflows at
        # sf0.1 (xcn ~ m*1e6 deviations x wi ~ 1e13) BEFORE an outer cast
        # could widen it - caught by scripts/verify_gate_sf01.py, the
        # scale-dependent-value-bug gate
        .agg(
            F.sum(
                F.col("xcn").cast("decimal(38,0)")
                * F.col("wi").cast("decimal(38,0)")
            ).alias("p")
        )
    )
    # Norms precompute once per vector: the HOF folds are INTERPRETED
    # per element, so folding dot(p,p)/dot(y,y) inside the |q|×|docs|
    # cross join tripled the dominant cost (measured 30 s warm at sf0.1
    # before this; the sqrt-of-fold VALUE is bit-identical either way,
    # so the oracle keeps the inline form).
    pvec = _vec(p, "query_doc", "j", "p", "pv").withColumn(
        "pn", F.expr(f"sqrt({_dot('pv', 'pv')})")
    )
    yvec = _vec(ycn_all, "doc_id", "j", "ycn", "yv").withColumn(
        "yn", F.expr(f"sqrt({_dot('yv', 'yv')})")
    )
    return pvec, yvec


def crossmodal_retrieval(
    docs: DataFrame, k: int = XMODAL_TOPK, query_mod: int = XMODAL_QUERY_MOD
) -> DataFrame:
    """Top-`k` media docs per sampled text query by cosine in media
    space: (query_doc, media_doc, rank, cos). Self-retrieval quality is
    pinned by tests/test_crossmodal.py (recall floor vs the measured
    0.288 @10 ceiling of SQL-expressible linear maps at 256-dim input)."""
    pvec, yvec = _pvec_yvec(docs, query_mod)
    # Queries are a bounded sample → broadcast; one scan of candidates.
    # Zero-norm guard: a degenerate corpus (single paired training doc →
    # ycn ≡ 0, or an all-zero projected query) makes pn*yn = 0, and
    # Spark/DuckDB double ÷0 semantics differ — emit 0.0 on both engines,
    # mirroring crossmodal_projection's den == 0 branch.
    cos = F.expr(
        f"CASE WHEN pn * yn = 0.0D THEN CAST(0.0 AS DOUBLE) "
        f"ELSE ROUND({_dot('pv', 'yv')} / (pn * yn), 6) END"
    )
    scored = yvec.crossJoin(F.broadcast(pvec)).select(
        "query_doc", F.col("doc_id").alias("media_doc"), cos.alias("cos")
    )
    # Queries without media (never: queries sample media docs' ids, but a
    # text doc below the 64-byte media floor can be sampled) still emit
    # their top-k — retrieval is defined for any embedded text.
    rk = Window.partitionBy("query_doc").orderBy(
        F.col("cos").desc(), F.col("media_doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_doc", "media_doc", "rank", "cos")
    )


def _len_cell_expr() -> str:
    """The routing cell as a pure per-doc expression (both dialects):
    cell = Σ_k [length(text) > cut_k] ∈ {0..3}."""
    c1, c2, c3 = XMODAL_LEN_CUTS
    return (
        f"CAST(length(text) > {c1} AS INT) + CAST(length(text) > {c2} AS INT)"
        f" + CAST(length(text) > {c3} AS INT)"
    )


def _doc_cells(docs: DataFrame) -> DataFrame:
    """(doc_id, cell): fixed-cut length routing — a pure function of the
    doc, which is what keeps the per-cell moments abelian."""
    return docs.selectExpr("doc_id", f"{_len_cell_expr()} AS cell")


def crossmodal_local_projection(docs: DataFrame) -> DataFrame:
    """The published per-cell map: (cell, i, j, w6) with
    w6 = ROUND(Σ_{train∩cell} xi·ycn_j / Σ_{train∩cell} xi², 6).

    Same exact-int discipline as the global map (crossmodal_projection);
    the only new plan mass is the doc_id-keyed cells join and a `cell`
    column in the two aggregation keys — the training join still fans
    nonzero-dims × 64 per paired doc, map-side combined into ≤ 4·dim²
    rows. y-centering stays GLOBAL (ycn = n·y − Σ_train y) so every
    cell's predictions live in one comparable media space."""
    from ..operators.models import published

    def build() -> DataFrame:
        m = crossmodal_cell_moments(docs)
        s = m.where("kind = 'S'").select(
            "cell", "i", "j", F.col("v").alias("s")
        )
        t = m.where("kind = 'T'").select("cell", "i", F.col("v").alias("t"))
        d = m.where("kind = 'D'").select("cell", "i", F.col("v").alias("den"))
        sy = m.where("kind = 'sy'").select("j", F.col("v").alias("sy"))
        n = m.where("kind = 'n'").select(F.col("v").alias("n"))
        w = (
            s.join(F.broadcast(t), ["cell", "i"])
            .join(F.broadcast(d), ["cell", "i"])
            .join(F.broadcast(sy), "j")
            .crossJoin(F.broadcast(n))
            .select(
                "cell",
                "i",
                "j",
                F.when(F.col("den") == 0, F.lit(0.0))
                .otherwise(
                    F.round(
                        (F.col("n") * F.col("s") - F.col("t") * F.col("sy")).cast(
                            "double"
                        )
                        / F.col("den").cast("double"),
                        6,
                    )
                )
                .alias("w6"),
            )
        )
        return w.localCheckpoint()  # node-sized: ≤ 4·dim² rows

    return published(docs, "xmodal_local_w", (XMODAL_TRAIN_MOD,), build)


def _local_w_direct_plan(docs: DataFrame) -> DataFrame:
    """The pre-r9 DIRECT per-cell training join (unpublished), kept as
    the independent second derivation for the moments-path equality
    test (tests/test_crossmodal.py::test_moment_derived_w_equals_direct)."""
    cells = _doc_cells(docs)
    x = _text_rows(docs).where(F.col("xi") != 0).join(cells, "doc_id")
    ycn, _ = _centered_media(docs)
    ytrain = ycn.where(F.col("doc_id") % XMODAL_TRAIN_MOD == 0)
    paired = ytrain.select("doc_id").distinct()
    xp = x.join(F.broadcast(paired), "doc_id")
    n_tab = (
        xp.join(ytrain, "doc_id")
        .groupBy("cell", "i", "j")
        .agg(
            F.sum(
                F.col("xi").cast("decimal(38,0)")
                * F.col("ycn").cast("decimal(38,0)")
            ).alias("num")
        )
    )
    d_tab = xp.groupBy("cell", "i").agg(
        F.sum(
            F.col("xi").cast("decimal(38,0)")
            * F.col("xi").cast("decimal(38,0)")
        ).alias("den")
    )
    return n_tab.join(d_tab, ["cell", "i"]).select(
        "cell",
        "i",
        "j",
        F.when(F.col("den") == 0, F.lit(0.0))
        .otherwise(
            F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6)
        )
        .alias("w6"),
    )


def _pvec_local(docs: DataFrame, query_mod: int = XMODAL_QUERY_MOD) -> DataFrame:
    """Projected query vectors through the CELL-ROUTED map:
    (query_doc, pv, pn). Queries center against their OWN cell's train
    stats (xcn = m_c·x − Σ_{train∩cell} x — the same no-division trick;
    the uniform m_c factor cancels in cosine) and project through their
    cell's W."""
    from ..operators.models import published

    def build() -> DataFrame:
        w = crossmodal_local_projection(docs)
        cells = _doc_cells(docs)
        x = _text_rows(docs).join(cells, "doc_id")
        # r9: per-cell centering stats from the published moments —
        # sx_c,i = T_c,i; m_c = the cell's paired-doc count (a doc-level
        # count, replacing the dense-explode aggregate; the dense row
        # count per (cell, i) IS that count). (cell, i) slots absent
        # from T are absent from the per-cell W too, so their xq rows
        # contributed nothing — final p is row-identical.
        mm = crossmodal_cell_moments(docs)
        xstats = mm.where("kind = 'T'").select(
            "cell", "i", F.col("v").alias("sx")
        )
        paired = (
            _media_rows(docs)
            .where(F.col("doc_id") % XMODAL_TRAIN_MOD == 0)
            .select("doc_id")
            .distinct()
        )
        ncell = (
            cells.join(paired, "doc_id")
            .groupBy("cell")
            .agg(F.count("*").cast("decimal(38,0)").alias("m"))
        )
        xq = (
            x.where(
                (F.col("doc_id") % query_mod == 0)
                & (F.col("doc_id") < XMODAL_QUERY_CAP)
            )
            .join(F.broadcast(xstats), ["cell", "i"])
            .join(F.broadcast(ncell), "cell")
            .select(
                "doc_id",
                "cell",
                "i",
                (F.col("m") * F.col("xi") - F.col("sx")).alias("xcn"),
            )
        )
        p = (
            xq.join(
                F.broadcast(
                    w.select("cell", "i", "j", _int6(F.col("w6")).alias("wi"))
                ),
                ["cell", "i"],
            )
            .groupBy(F.col("doc_id").alias("query_doc"), "j")
            .agg(
                F.sum(
                    F.col("xcn").cast("decimal(38,0)")
                    * F.col("wi").cast("decimal(38,0)")
                ).alias("p")
            )
        )
        pvec = _vec(p, "query_doc", "j", "p", "pv").withColumn(
            "pn", F.expr(f"sqrt({_dot('pv', 'pv')})")
        )
        return pvec.localCheckpoint()  # panel-sized

    return published(docs, "xmodal_local_pvec", (query_mod,), build)


def crossmodal_local_retrieval(
    docs: DataFrame, k: int = XMODAL_TOPK, query_mod: int = XMODAL_QUERY_MOD
) -> DataFrame:
    """Top-`k` media docs per query through the LENGTH-ROUTED local maps:
    (query_doc, media_doc, rank, cos). Candidate side and cosine/rank
    shape are identical to the brute tier — only the projection differs —
    so retrieval cost is unchanged and the published yvec is shared."""
    from ..operators.models import disk_checkpoint, published

    pvec = _pvec_local(docs, query_mod)
    yvec = published(
        docs,
        "xmodal_yvec",
        (),
        lambda: disk_checkpoint(
            _pvec_yvec_plan(docs, query_mod)[1], "xmodal_yvec"
        ),
    )
    cos = F.expr(
        f"CASE WHEN pn * yn = 0.0D THEN CAST(0.0 AS DOUBLE) "
        f"ELSE ROUND({_dot('pv', 'yv')} / (pn * yn), 6) END"
    )
    scored = yvec.crossJoin(F.broadcast(pvec)).select(
        "query_doc", F.col("doc_id").alias("media_doc"), cos.alias("cos")
    )
    rk = Window.partitionBy("query_doc").orderBy(
        F.col("cos").desc(), F.col("media_doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_doc", "media_doc", "rank", "cos")
    )


def crossmodal_moments_oracle() -> str:
    """DuckDB twin of streaming/crossmodal_maint.batch_moments: the five
    abelian raw-moment families as exact HUGEINT sums, emitted as STRINGS
    so any magnitude compares exactly across engines."""
    return f"""
        WITH {_xmodal_rows_sql()},
        xmo_paired AS (SELECT DISTINCT doc_id FROM ytrain),
        xmo_xp AS (
          SELECT x.* FROM xrows x
          WHERE x.doc_id % {XMODAL_TRAIN_MOD} = 0
            AND x.xi <> 0  -- zero terms add nothing; rowset matches Spark
            AND x.doc_id IN (SELECT doc_id FROM xmo_paired))
        SELECT 'S' AS kind, x.i, y.j,
               CAST(SUM(CAST(x.xi AS HUGEINT) * y.yi) AS VARCHAR) AS v_str
        FROM xmo_xp x JOIN ytrain y ON x.doc_id = y.doc_id
        GROUP BY x.i, y.j
        UNION ALL
        SELECT 'T', i, -1, CAST(SUM(CAST(xi AS HUGEINT)) AS VARCHAR)
        FROM xmo_xp GROUP BY i
        UNION ALL
        SELECT 'D', i, -1, CAST(SUM(CAST(xi AS HUGEINT) * xi) AS VARCHAR)
        FROM xmo_xp GROUP BY i
        UNION ALL
        SELECT 'sy', -1, j, CAST(SUM(CAST(yi AS HUGEINT)) AS VARCHAR)
        FROM ytrain GROUP BY j
        UNION ALL
        SELECT 'n', -1, -1, CAST(COUNT(*) AS VARCHAR) FROM xmo_paired
    """


def _oracle_dot(a: str, b: str) -> str:
    """Ordered list fold over the 64 media-space dims (DuckDB twin of
    `_dot`)."""
    return (
        f"list_sum(list_transform(generate_series(1, {XMODAL_DIM}), "
        f"n_ -> {a}[n_] * {b}[n_]))"
    )


def _xmodal_rows_sql() -> str:
    """The raw-rows CTE prefix (text xrows + media yrows + ytrain) shared
    by the retrieval oracles and the moments oracle."""
    from ..operators.ranking import hashed_doc_embeddings_oracle

    nb = XMODAL_DIM
    return f"""emb AS MATERIALIZED ({hashed_doc_embeddings_oracle(XMODAL_TEXT_DIM)}),
        xrows AS MATERIALIZED (
          SELECT doc_id, generate_subscripts(embedding, 1) - 1 AS i,
                 CAST(ROUND(unnest(embedding) * {_S}) AS BIGINT) AS xi
          FROM emb),
        pdocs AS (SELECT doc_id, text, length(text) AS len FROM documents
                  WHERE length(text) >= {nb}),
        chars AS (
          SELECT doc_id, len, generate_subscripts(cs, 1) AS pos, unnest(cs) AS ch
          FROM (SELECT doc_id, len, str_split(text, '') AS cs FROM pdocs) t),
        yrows AS MATERIALIZED (
          SELECT doc_id, CAST(((pos - 1) * {nb}) // len AS INT) AS j,
                 CAST(ROUND(ROUND(avg(CAST(ascii(ch) AS DOUBLE)), 6) * {_S})
                      AS BIGINT) AS yi
          FROM chars GROUP BY doc_id, ((pos - 1) * {nb}) // len),
        ytrain AS (SELECT * FROM yrows WHERE doc_id % {XMODAL_TRAIN_MOD} = 0)"""


def _xmodal_body_sql(query_mod: int = XMODAL_QUERY_MOD) -> str:
    """The shared WITH-body (embeddings → trained W → projected pvec +
    candidate yvec) both retrieval-tier oracles build on — the exact
    SQL twin of `_pvec_yvec`."""
    return f"""{_xmodal_rows_sql()},
        stats AS (SELECT j, SUM(yi) AS sy, COUNT(*) AS n FROM ytrain GROUP BY j),
        ycn AS MATERIALIZED (
          SELECT y.doc_id, y.j, s.n * y.yi - s.sy AS ycn
          FROM yrows y JOIN stats s ON y.j = s.j),
        ycn_train AS (SELECT * FROM ycn WHERE doc_id % {XMODAL_TRAIN_MOD} = 0),
        xtrain AS (SELECT * FROM xrows WHERE doc_id % {XMODAL_TRAIN_MOD} = 0),
        ntab AS (
          SELECT x.i, y.j, SUM(CAST(x.xi AS HUGEINT) * y.ycn) AS num
          FROM xtrain x JOIN ycn_train y ON x.doc_id = y.doc_id
          GROUP BY x.i, y.j),
        dtab AS (
          SELECT x.i, SUM(CAST(x.xi AS HUGEINT) * x.xi) AS den
          FROM xtrain x
          WHERE x.doc_id IN (SELECT DISTINCT doc_id FROM ycn_train)
          GROUP BY x.i),
        w AS MATERIALIZED (
          SELECT n_.i, n_.j,
                 CASE WHEN d_.den = 0 THEN 0.0
                      ELSE {round6_sql("CAST(n_.num AS DOUBLE) / CAST(d_.den AS DOUBLE)")} END AS w6
          FROM ntab n_ JOIN dtab d_ ON n_.i = d_.i),
        xstats AS (
          SELECT i, SUM(xi) AS sx, COUNT(*) AS m
          FROM xrows
          WHERE doc_id IN (SELECT DISTINCT doc_id FROM ycn_train)
          GROUP BY i),
        xq AS (
          SELECT x.doc_id, x.i, s.m * x.xi - s.sx AS xcn
          FROM xrows x JOIN xstats s ON x.i = s.i
          WHERE x.doc_id % {query_mod} = 0
            AND x.doc_id < {XMODAL_QUERY_CAP}),
        p AS (
          SELECT x.doc_id AS query_doc, w.j,
                 SUM(CAST(x.xcn AS HUGEINT) * CAST(ROUND(w.w6 * {_S}) AS BIGINT)) AS p
          FROM xq x JOIN w ON x.i = w.i
          GROUP BY x.doc_id, w.j),
        pvec AS (
          SELECT query_doc,
                 list(CAST(p AS DOUBLE) ORDER BY j) AS pv
          FROM p GROUP BY query_doc),
        yvec AS (
          SELECT doc_id, list(CAST(ycn AS DOUBLE) ORDER BY j) AS yv
          FROM ycn GROUP BY doc_id)"""


def crossmodal_retrieval_oracle(
    k: int = XMODAL_TOPK, query_mod: int = XMODAL_QUERY_MOD
) -> str:
    """DuckDB twin: identical scaled-int pipeline (HUGEINT sums), the
    shortest-repr round template at the single W rounding boundary, and
    the ordered list fold for the cosine."""
    d = _oracle_dot
    return f"""
        WITH {_xmodal_body_sql(query_mod)},
        scored AS (
          SELECT q.query_doc, y.doc_id AS media_doc,
                 CASE WHEN sqrt({d('q.pv', 'q.pv')}) * sqrt({d('y.yv', 'y.yv')}) = 0
                      THEN 0.0
                      ELSE ROUND({d('q.pv', 'y.yv')} /
                           (sqrt({d('q.pv', 'q.pv')}) * sqrt({d('y.yv', 'y.yv')})), 6)
                 END AS cos
          FROM yvec y CROSS JOIN pvec q),
        ranked AS (
          SELECT query_doc, media_doc, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_doc
                      ORDER BY cos DESC, media_doc ASC) AS INT) AS rank
          FROM scored)
        SELECT query_doc, media_doc, rank, cos
        FROM ranked WHERE rank <= {k}
    """


def _xmodal_local_body_sql(query_mod: int = XMODAL_QUERY_MOD) -> str:
    """The WITH-body of the local-map oracle (cells → per-cell W →
    routed projection + the shared global-centered candidate vectors) —
    the exact SQL twin of crossmodal_local_projection + _pvec_local.
    CTE names are l-prefixed: compound-suite oracles inline component
    bodies under one outer WITH, and DuckDB resolves colliding names
    against the OUTER aliases (the r7 `tf` shadowing gotcha)."""
    return f"""{_xmodal_rows_sql()},
        lstats AS (SELECT j, SUM(yi) AS sy, COUNT(*) AS n FROM ytrain GROUP BY j),
        lycn AS MATERIALIZED (
          SELECT y.doc_id, y.j, s.n * y.yi - s.sy AS ycn
          FROM yrows y JOIN lstats s ON y.j = s.j),
        lycn_train AS (
          SELECT * FROM lycn WHERE doc_id % {XMODAL_TRAIN_MOD} = 0),
        lcells AS (SELECT doc_id, {_len_cell_expr()} AS cell FROM documents),
        lxc AS MATERIALIZED (
          SELECT x.doc_id, c.cell, x.i, x.xi
          FROM xrows x JOIN lcells c ON x.doc_id = c.doc_id),
        lpaired AS (SELECT DISTINCT doc_id FROM lycn_train),
        lxp AS (
          SELECT * FROM lxc
          WHERE xi <> 0 AND doc_id IN (SELECT doc_id FROM lpaired)),
        lntab AS (
          SELECT x.cell, x.i, y.j, SUM(CAST(x.xi AS HUGEINT) * y.ycn) AS num
          FROM lxp x JOIN lycn_train y ON x.doc_id = y.doc_id
          GROUP BY x.cell, x.i, y.j),
        ldtab AS (
          SELECT cell, i, SUM(CAST(xi AS HUGEINT) * xi) AS den
          FROM lxp GROUP BY cell, i),
        lw AS MATERIALIZED (
          SELECT n_.cell, n_.i, n_.j,
                 CASE WHEN d_.den = 0 THEN 0.0
                      ELSE {round6_sql("CAST(n_.num AS DOUBLE) / CAST(d_.den AS DOUBLE)")} END AS w6
          FROM lntab n_ JOIN ldtab d_ ON n_.cell = d_.cell AND n_.i = d_.i),
        lxstats AS (
          SELECT cell, i, SUM(xi) AS sx, COUNT(*) AS m
          FROM lxc WHERE doc_id IN (SELECT doc_id FROM lpaired)
          GROUP BY cell, i),
        lxq AS (
          SELECT x.doc_id, x.cell, x.i, s.m * x.xi - s.sx AS xcn
          FROM lxc x JOIN lxstats s ON x.cell = s.cell AND x.i = s.i
          WHERE x.doc_id % {query_mod} = 0
            AND x.doc_id < {XMODAL_QUERY_CAP}),
        lp AS (
          SELECT x.doc_id AS query_doc, w.j,
                 SUM(CAST(x.xcn AS HUGEINT) * CAST(ROUND(w.w6 * {_S}) AS BIGINT)) AS p
          FROM lxq x JOIN lw w ON x.cell = w.cell AND x.i = w.i
          GROUP BY x.doc_id, w.j),
        lpvec AS (
          SELECT query_doc, list(CAST(p AS DOUBLE) ORDER BY j) AS pv
          FROM lp GROUP BY query_doc),
        lyvec AS (
          SELECT doc_id, list(CAST(ycn AS DOUBLE) ORDER BY j) AS yv
          FROM lycn GROUP BY doc_id)"""


def crossmodal_local_retrieval_oracle(
    k: int = XMODAL_TOPK, query_mod: int = XMODAL_QUERY_MOD
) -> str:
    """DuckDB twin of the length-routed local-map retrieval."""
    d = _oracle_dot
    return f"""
        WITH {_xmodal_local_body_sql(query_mod)},
        lscored AS (
          SELECT q.query_doc, y.doc_id AS media_doc,
                 CASE WHEN sqrt({d('q.pv', 'q.pv')}) * sqrt({d('y.yv', 'y.yv')}) = 0
                      THEN 0.0
                      ELSE ROUND({d('q.pv', 'y.yv')} /
                           (sqrt({d('q.pv', 'q.pv')}) * sqrt({d('y.yv', 'y.yv')})), 6)
                 END AS cos
          FROM lyvec y CROSS JOIN lpvec q),
        lranked AS (
          SELECT query_doc, media_doc, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_doc
                      ORDER BY cos DESC, media_doc ASC) AS INT) AS rank
          FROM lscored)
        SELECT query_doc, media_doc, rank, cos
        FROM lranked WHERE rank <= {k}
    """


def crossmodal_ivf_retrieval(
    docs: DataFrame,
    k: int = XMODAL_TOPK,
    query_mod: int = XMODAL_QUERY_MOD,
    n_cells: int = XMODAL_IVF_CELLS,
    probe: int = XMODAL_IVF_PROBE,
) -> DataFrame:
    """The IVF scale tier of cross-modal retrieval (VERDICT r7 #3b): the
    projected text queries run through coarse cells over the MEDIA
    corpus instead of a full scan.

    Build side (once per corpus): centroids = the `n_cells`
    lowest-doc_id media vectors (the deterministic seed the IVF family
    uses, similarity.ivf_centroid_topk); every candidate assigns to its
    max-affinity cell — one broadcast join + per-doc argmax window, the
    same partition-prunable layout as the ANN IVF build. Query side:
    each projected query probes its `probe` nearest cells and ranks
    exact cosine INSIDE those cells only — the scan shrinks to
    probe/n_cells of the corpus, and at 100 TB the cell assignment is
    the partition key so pruning happens at the file level.

    Affinities round to 6 dp (the iterative-op rounding rule) with
    cell-doc tie-breaks, so assignment is deterministic on both engines;
    recall vs the brute-force tier is pinned in tests/test_crossmodal.py.
    """
    pvec, yvec = _pvec_yvec(docs, query_mod)
    cents = (
        yvec.orderBy("doc_id")
        .limit(n_cells)
        .select(
            F.col("doc_id").alias("cell_doc"),
            F.col("yv").alias("cvec"),
            F.col("yn").alias("cn_"),
        )
    )

    def aff(vec: str, nrm: str) -> str:
        return (
            f"CASE WHEN {nrm} * cn_ = 0.0D THEN CAST(0.0 AS DOUBLE) "
            f"ELSE ROUND({_dot(vec, 'cvec')} / ({nrm} * cn_), 6) END"
        )

    wa = Window.partitionBy("doc_id").orderBy(
        F.col("aff").desc(), F.col("cell_doc").asc()
    )
    assigned = (
        yvec.crossJoin(F.broadcast(cents))
        .select("doc_id", "yv", "yn", "cell_doc", F.expr(aff("yv", "yn")).alias("aff"))
        .withColumn("arn", F.row_number().over(wa))
        .where(F.col("arn") == 1)
        .select("doc_id", "yv", "yn", "cell_doc")
    )
    wq = Window.partitionBy("query_doc").orderBy(
        F.col("aff").desc(), F.col("cell_doc").asc()
    )
    probed = (
        pvec.crossJoin(F.broadcast(cents))
        .select("query_doc", "pv", "pn", "cell_doc", F.expr(aff("pv", "pn")).alias("aff"))
        .withColumn("qrn", F.row_number().over(wq))
        .where(F.col("qrn") <= probe)
        .select("query_doc", "pv", "pn", "cell_doc")
    )
    cos = F.expr(
        f"CASE WHEN pn * yn = 0.0D THEN CAST(0.0 AS DOUBLE) "
        f"ELSE ROUND({_dot('pv', 'yv')} / (pn * yn), 6) END"
    )
    scored = assigned.join(F.broadcast(probed), "cell_doc").select(
        "query_doc", F.col("doc_id").alias("media_doc"), cos.alias("cos")
    )
    rk = Window.partitionBy("query_doc").orderBy(
        F.col("cos").desc(), F.col("media_doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rk).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_doc", "media_doc", "rank", "cos")
    )


def crossmodal_ivf_retrieval_oracle(
    k: int = XMODAL_TOPK,
    query_mod: int = XMODAL_QUERY_MOD,
    n_cells: int = XMODAL_IVF_CELLS,
    probe: int = XMODAL_IVF_PROBE,
) -> str:
    """DuckDB twin of the IVF tier — same body, same rounded affinities,
    same deterministic tie-breaks."""
    d = _oracle_dot

    def aff(vec: str, nrm: str) -> str:
        return (
            f"CASE WHEN {nrm} * c.cn_ = 0 THEN 0.0 "
            f"ELSE ROUND({d(vec, 'c.cvec')} / ({nrm} * c.cn_), 6) END"
        )

    return f"""
        WITH {_xmodal_body_sql(query_mod)},
        yn_ AS (SELECT doc_id, yv, sqrt({d('yv', 'yv')}) AS yn FROM yvec),
        pn_ AS (SELECT query_doc, pv, sqrt({d('pv', 'pv')}) AS pn FROM pvec),
        cents AS (
          SELECT doc_id AS cell_doc, yv AS cvec, yn AS cn_
          FROM yn_ ORDER BY doc_id LIMIT {n_cells}),
        assigned AS (
          SELECT doc_id, yv, yn, cell_doc FROM (
            SELECT y.doc_id, y.yv, y.yn, c.cell_doc,
                   ROW_NUMBER() OVER (PARTITION BY y.doc_id
                       ORDER BY {aff('y.yv', 'y.yn')} DESC, c.cell_doc ASC) AS arn
            FROM yn_ y CROSS JOIN cents c) t WHERE arn = 1),
        probed AS (
          SELECT query_doc, pv, pn, cell_doc FROM (
            SELECT q.query_doc, q.pv, q.pn, c.cell_doc,
                   ROW_NUMBER() OVER (PARTITION BY q.query_doc
                       ORDER BY {aff('q.pv', 'q.pn')} DESC, c.cell_doc ASC) AS qrn
            FROM pn_ q CROSS JOIN cents c) t WHERE qrn <= {probe}),
        scored AS (
          SELECT q.query_doc, a.doc_id AS media_doc,
                 CASE WHEN q.pn * a.yn = 0 THEN 0.0
                      ELSE ROUND({d('q.pv', 'a.yv')} / (q.pn * a.yn), 6)
                 END AS cos
          FROM assigned a JOIN probed q ON a.cell_doc = q.cell_doc),
        ranked AS (
          SELECT query_doc, media_doc, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_doc
                      ORDER BY cos DESC, media_doc ASC) AS INT) AS rank
          FROM scored)
        SELECT query_doc, media_doc, rank, cos
        FROM ranked WHERE rank <= {k}
    """
