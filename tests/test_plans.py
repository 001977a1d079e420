"""Physical-plan assertions: the scale properties the engine is designed
around, locked in as tests so a refactor can't silently regress them.

Each assertion is a property that matters at 100 TB:
  * filters/column pruning reach the parquet scan (PushedFilters/ReadSchema)
  * dimension joins broadcast instead of shuffling the fact side
  * single-pass pipelines stay in one WholeStageCodegen span (no Exchange)
  * aggregations are two-phase (map-side partial combine before the shuffle)
  * top-k plans as TakeOrderedAndProject, never a global sort
  * the JVM-only operator families really contain no Python evaluation
"""

from __future__ import annotations

import re

import pytest
from conftest import SF_ORACLE

from spark_deal_observer_spark.plans.registry import REGISTRY


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def q(spark, name):
    return REGISTRY[name].fn(spark, SF_ORACLE)


def test_scan_filter_pushdown(spark):
    p = plan(q(spark, "events_scan"))
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]" in p


def test_scan_column_pruning(spark):
    # events has more columns than the query touches; the scan must not read them
    p = plan(q(spark, "events_scan"))
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "event_type" in read_schema
    assert "props" not in read_schema


@pytest.mark.parametrize(
    "name", ["dim_lookup_join", "composite_key_join", "semi_join_ids", "dedup_insert"]
)
def test_dimension_joins_broadcast(spark, name):
    """No shuffle of the big side for any dimension-shaped join."""
    p = plan(q(spark, name))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_eligible_deals_single_codegen_pass(spark):
    """The flagship filter+project chain is one codegen'd scan pipeline:
    zero exchanges, zero sorts — it would scale linearly with input splits."""
    p = plan(q(spark, "eligible_deals"))
    assert "Exchange" not in p, p
    assert "WholeStageCodegen" in p or "*(1)" in p, p


def test_aggregation_is_two_phase(spark):
    """groupBy must partial-aggregate map-side before the shuffle."""
    p = plan(q(spark, "count_by_state"))
    assert p.count("HashAggregate") >= 2, p
    assert "partial_count" in p, p


@pytest.mark.parametrize("name", ["topn_asc", "top1_desc"])
def test_topk_avoids_global_sort(spark, name):
    p = plan(q(spark, name))
    assert "TakeOrderedAndProject" in p, p


@pytest.mark.parametrize(
    "name",
    [
        "dedup_exact",
        "dedup_minhash_sig",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "dedup_embedding",
        "ann_brute_force",
        "text_token_count",
        "text_quality",
        "text_lang_id",
        "text_fingerprint",
        "corpus_train_val_split",
        "corpus_quality_gate",
        "corpus_decontaminate",
        "corpus_token_doc_freq",
        "corpus_pack_manifest",
    ],
)
def test_hot_paths_have_no_python(spark, name):
    """The dedup/ANN/text families are generated SQL — any Python evaluator
    appearing in their plans is a regression to the slow path."""
    p = plan(q(spark, name))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonUDF"):
        assert marker not in p, f"{marker} in {name} plan:\n{p}"


@pytest.mark.parametrize(
    "name", ["cbor_decode_pipeline", "multimodal_audio_features"]
)
def test_python_stages_are_parallel(spark, name):
    """The declared-Python pipelines must not funnel through one partition:
    the mapInPandas input must carry the full-parallelism repartition.
    (r9: multimodal_features/frame_sample left this list — their fake-codec
    identity decode moved to JVM built-ins, pinned bit-equal to the kernels
    in test_media_jvm.py; the REAL-codec Arrow pipelines stand in here.)"""
    p = plan(q(spark, name))
    assert "MapInPandas" in p, p
    assert "REPARTITION_BY_NUM" in p or "RoundRobinPartitioning" in p, p


@pytest.mark.parametrize(
    "name", ["multimodal_features", "multimodal_resize", "multimodal_frame_sample"]
)
def test_fake_codec_media_queries_are_jvm(spark, name):
    """r9: the fake-codec media feature queries run as codegen'd built-ins
    (md5/substring/sequence over encode(text)) — no Python boundary."""
    p = plan(q(spark, name))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in p, f"{marker} in {name} plan:\n{p}"


def test_cms_reuses_one_tokenize_pass(spark):
    """r9: cms_token_counts' truth side filters tok_counts on its grouping
    key; without the barrier projection the pushed filter re-derives the
    corpus tokenize+count aggregate a second time per run. The executed
    plan must reuse the exchange (ONE tokenize pass feeds sketch + truth).
    Runs the query (AQE reuse only shows in the final plan)."""
    import contextlib
    import io

    df = q(spark, "cms_token_counts")
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "isFinalPlan=true" in p, p
    assert "Reused" in p, f"tokenize aggregate re-derived (no exchange reuse):\n{p}"


def test_rankers_tokenize_once(spark):
    """r9: both rankers used to re-derive their tf subtree for df — the
    count column was pruned from the copy (tfidf) or asymmetric isnotnull
    inference broke canonical equality (bm25), so the tokenize pass
    shuffled twice per run. tfidf must now REUSE the tf exchange (the
    always-true `tf >= 1` guard keeps the subtrees identical); bm25
    computes df as a window count over tf — no second subtree at all."""
    import contextlib
    import io

    def final_plan(name):
        df = q(spark, name)
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        assert "isFinalPlan=true" in p, p
        return p

    p = final_plan("tfidf_top_terms")
    assert "Reused" in p, f"tfidf: tf subtree re-derived (no exchange reuse):\n{p}"
    p = final_plan("bm25_scores")
    assert "Window" in p, p
    # r10: dl rides the tf aggregate and n/avgdl fold into ONE scalar
    # aggregate — the corpus-sized lens join is gone and documents is
    # scanned exactly TWICE (term-filtered tf pass + scalar pass). The
    # final tree names each scan once; details add one mention each, and
    # the initial-plan tree up to two more — 8 total mentions max (the
    # pre-r10 lens-join form showed 4 scans; pre-r9 duplicated-tf 15+).
    assert p.count("Scan parquet") <= 8, f"bm25: extra corpus pass:\n{p}"


def test_psi_and_histogram_reuse_shared_aggregate(spark):
    """r10 (guide §2.4): source_drift_psi's baseline branch must REUSE the
    per-source binned-distribution exchange (the filter on the grouping
    key used to push below the aggregate — barrier-column form holds it
    up), and histogram_quantile_audit's broadcast (lo, hi) branch must
    REUSE the per-type bounds exchange (ColumnPruning used to drop n/qs
    from the copy — the always-true n/qs guard keeps the aggregates
    identical). Executed-plan (AQE-final) assertions; initial plans are
    blind to reuse."""
    import contextlib
    import io

    def final_plan(name):
        df = q(spark, name)
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        assert "isFinalPlan=true" in p, p
        return p.split("== Initial Plan ==")[0]

    p = final_plan("source_drift_psi")
    assert "ReusedExchange" in p, f"psi: baseline re-derives the binned aggregate:\n{p}"
    assert p.count("Scan parquet") == 1, f"psi: more than one corpus pass:\n{p}"
    p = final_plan("histogram_quantile_audit")
    assert "ReusedExchange" in p, f"hqa: bounds aggregate re-derived:\n{p}"
    assert p.count("Scan parquet") == 2, f"hqa: expected bounds+binned passes only:\n{p}"


def test_setsim_probe_fan_out_stage_is_pinned_wide(spark):
    """r10 (the AQE fan-out hazard): the probe's prefix rows are ~1 MB of
    shuffle bytes, so AQE coalesced the postings-join stage — the 25 M-row
    fan-out plus the positional partial aggregate ran on ONE task (8.45 s
    of the 12.6 s cold probe at sf0.1). The plan must carry the explicit
    doc_id-keyed REPARTITION_BY_NUM (user counts are not AQE-coalescible;
    doc_id keying keeps every pair inside one task so the partial
    aggregate still compacts the fan-out before the exchange — the
    round-robin form lost that and shuffled ~0.5 GB of raw pair rows)."""
    from spark_deal_observer_spark.operators import dedup as dd
    from spark_deal_observer_spark.operators import models
    from spark_deal_observer_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_ORACLE, "documents")
    sets = dd._setsim_sets(docs)
    postings, df_, csets = dd.setsim_corpus_index(
        sets.where(F.col("doc_id") % 10 != 0), dd.SETSIM_THRESHOLD
    )
    probe = dd.setsim_probe(
        sets.where(F.col("doc_id") % 10 == 0), postings, df_, csets,
        dd.SETSIM_THRESHOLD,
    )
    p = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert re.search(r"hashpartitioning\(doc_id#\d+L?, \d+\), REPARTITION_BY_NUM", p), (
        f"probe fan-out width pin missing:\n{p}"
    )


def test_simhash_pairs_block_on_band_prefix(spark):
    """The simhash pair stage must be an EQUI-join on the bounded
    (band, key) bucket — never an all-pairs or unbounded product join.
    The self-join formulation (rather than collect_set + HOF expansion)
    keeps a hot bucket's quadratic pair fan-out in codegen'd, AQE-skew-
    splittable join rows instead of one interpreted lambda on one row."""
    p = plan(q(spark, "dedup_simhash_pairs"))
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[band", p), p
    for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in p, f"{marker} in plan:\n{p}"


def test_jaccard_is_candidate_verify(spark):
    """n-gram Jaccard runs over LSH candidates joined back by primary key:
    equality joins only, no product-shaped join anywhere in the plan.
    Asserted on the logical builder (`pair_intersections_plan`, the shared
    verify build behind the Jaccard and containment policies) — the
    registered query returns its published checkpoint, whose plan is a
    scan by design."""
    from spark_deal_observer_spark.operators.dedup import pair_intersections_plan
    from spark_deal_observer_spark.sources.tables import load_table

    p = plan(pair_intersections_plan(load_table(spark, SF_ORACLE, "documents")))
    for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in p, f"{marker} in plan:\n{p}"
    assert "hashpartitioning(band" in p, p  # the LSH bucket stage is inside


def test_embedding_pairs_block_on_lsh_bucket(spark):
    """Embedding near-dup pairs join on the sign-LSH bucket equality (the
    bounded block), with the vec_id ordering as a post-filter — an equality
    join, not a product."""
    p = plan(q(spark, "dedup_embedding"))
    assert "bucket" in p, p
    for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in p, f"{marker} in plan:\n{p}"


def test_decontamination_broadcasts_probe_set(spark):
    """The benchmark probe shingles must broadcast — the TB corpus side
    never shuffles for the join."""
    p = plan(q(spark, "corpus_decontaminate"))
    assert "BroadcastHashJoin" in p, p


def test_split_is_scan_stage_only(spark):
    """The train/val split plan must be exchange-free: a pure projection."""
    p = plan(q(spark, "corpus_train_val_split"))
    assert "Exchange" not in p, p


def test_salted_join_spreads_on_salt(spark):
    """The skew-spread join must carry the salt in its join keys."""
    p = plan(q(spark, "salted_join_dim"))
    assert "_salt" in p, p
    assert "CartesianProduct" not in p, p


def test_sessionize_single_shuffle(spark):
    """Gaps-and-islands sessionization: lag window, running sum, and the
    final aggregate all share the user_id partitioning — exactly one
    exchange on user_id in the plan."""
    p = plan(q(spark, "sessionize_events"))
    assert p.count("Exchange hashpartitioning(user_id") == 1, p


def test_minhash_lsh_single_signature_pass(spark):
    """The LSH bucket formulation computes signatures once. With the
    published signature artifact (operators/models.py) the query plan
    reads the checkpointed signature table — ZERO parquet scans; a
    self-join shape would show two. Either way, never more than one."""
    p = plan(q(spark, "dedup_minhash_lsh"))
    assert p.count("FileScan parquet") <= 1, p
    assert "Scan ExistingRDD" in p or p.count("FileScan parquet") == 1, p


def test_interval_range_join_has_no_nested_loop(spark):
    """The range join must run as the bucketed equi-join decomposition —
    any theta-join fallback (BroadcastNestedLoopJoin / CartesianProduct)
    would be O(windows x probes) at scale."""
    p = plan(q(spark, "interval_range_join"))
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_stratified_sample_is_scan_stage_only(spark):
    """Hash-threshold sampling is a pure scan-stage filter: no exchange."""
    p = plan(q(spark, "stratified_sample"))
    assert "Exchange" not in p, p


def test_rollup_day_grain_reuses_hourly_partials(spark):
    """The day grain must re-aggregate hourly rows, not rescan raw events:
    exactly two scans total (one per union branch over the SAME hourly
    subtree would still show as two FileScans of events; what must NOT
    appear is a third scan or a day-grain aggregate keyed on raw ts)."""
    p = plan(q(spark, "hypertable_rollup"))
    assert p.count("FileScan parquet") <= 2, p


def test_tfidf_vocabulary_join_broadcasts(spark):
    """The document-frequency side (vocabulary-sized) must broadcast."""
    p = plan(q(spark, "tfidf_top_terms"))
    assert "BroadcastHashJoin" in p, p


def test_bm25_topk_avoids_global_sort(spark):
    p = plan(q(spark, "bm25_scores"))
    assert "TakeOrderedAndProject" in p, p


def test_pq_adc_scan_reads_codes_only(spark):
    """ADC search: the distance table must broadcast (never shuffle the
    codes side against it), and the final top-k must be TakeOrdered."""
    p = plan(q(spark, "ann_pq_adc"))
    assert "BroadcastHashJoin" in p, p
    assert "TakeOrderedAndProject" in p, p


def test_pq_codes_shapes(spark):
    """Every vector gets exactly M_SUB codes, each within [0, K_CODES).
    The registered query emits the exploded (vec_id, subspace, code) shape."""
    from pyspark.sql import functions as F

    from spark_deal_observer_spark.operators.quantization import K_CODES, M_SUB

    df = q(spark, "pq_codes")
    per_vec = df.groupBy("vec_id").agg(
        F.count("*").alias("m"), F.min("code").alias("lo"), F.max("code").alias("hi")
    )
    bad = per_vec.where((F.col("m") != M_SUB) | (F.col("lo") < 0) | (F.col("hi") >= K_CODES))
    assert bad.count() == 0


def test_mixture_sample_upweights_tail_languages(spark):
    """alpha < 1 must sample tail languages at a HIGHER rate than the head:
    the rate ordering is the reverse of the count ordering."""
    rows = (
        q(spark, "corpus_mixture_sample")
        .groupBy("lang")
        .agg({"rate": "max", "*": "count"})
        .collect()
    )
    by_count = sorted(rows, key=lambda r: r["count(1)"])
    rates = [r["max(rate)"] for r in by_count]
    assert rates == sorted(rates, reverse=True), rates


def test_trained_assign_is_aggregate_not_window(spark):
    """k-means/PQ assignment must be the map-side-combinable argmin
    aggregate (partial min(struct)) — a Window here would shuffle all n×K
    scored rows with their embedding arrays and sort them."""
    for name in ("kmeans_cells", "pq_codes"):
        p = plan(q(spark, name))
        assert "Window" not in p, f"{name}: window-based argmin\n{p}"
        assert "partial_min" in p, f"{name}: no map-side combine\n{p}"


@pytest.mark.slow  # r10 test tier: see pytest.ini
def test_no_registered_query_emits_non_atomic_columns(spark):
    """Driver-canonicalizer contract: the driver gate sorts/hashes results
    with pandas, which cannot sort list-valued cells (r3: kmeans_cells red
    on its ARRAY<DOUBLE> centroid). Every registered query must therefore
    emit only atomic column types — vector-valued operators explode to
    (pos, val) rows at the registration boundary (registry._flatten_vec)."""
    from conftest import SF_SMALL
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, qd in REGISTRY.items():
        df = qd.fn(spark, SF_SMALL)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders


def test_domain_cap_single_window_shuffle(spark):
    """Per-source quota cap: one Exchange (the by-source window), quality
    computed in the scan stage, no Python."""
    p = plan(q(spark, "corpus_domain_cap"))
    assert p.count("Exchange") == 1, p
    assert "Window" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_source_overlap_joins_on_shingle_value(spark):
    """Cross-source overlap: the pair count is an equi-join on the shingle
    value (per-key fan-out bounded by |sources|) — never a cartesian; the
    per-source counts broadcast back onto the pair table."""
    p = plan(q(spark, "source_ngram_overlap"))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p  # counts joins
    assert "[g" in p or "g#" in p  # join key is the shingle value


def test_incremental_dedup_rides_published_store(spark):
    """Warm plan must be filter + map-side-combinable argmax AGGREGATE
    over the published verify store: no re-scan of the documents corpus,
    no candidate re-enumeration join, and no Window (the aggregate form
    collapses each task's candidates before the exchange). The store
    itself IS a parquet scan since r5 — corpus-sized artifacts live on
    the columnar disk tier (models.disk_checkpoint), not in deserialized
    cache — so the pin is on scanning `documents`, not on file scans."""
    q(spark, "dedup_incremental").count()  # ensure artifact is published
    p = plan(q(spark, "dedup_incremental"))
    assert "documents.parquet" not in p, p
    assert "Window" not in p, p
    assert "partial_max" in p, p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p


def test_suite_component_map_in_sync():
    """SUITE_COMPONENTS (surfaced in COVERAGE.md as the driver-verified
    accounting) must reference only registered queries, and every gate
    compound suite must carry a component list."""
    from spark_deal_observer_spark.plans.registry import (
        DRIVER_ORDER,
        SUITE_COMPONENTS,
    )

    for suite, comps in SUITE_COMPONENTS.items():
        assert suite in REGISTRY, suite
        for c in comps:
            assert c in REGISTRY, (suite, c)
    gate = set(DRIVER_ORDER[:50])
    for name in gate:
        if name.endswith("_suite") or name in (
            "agg_counters", "topk_ends", "scalar_funcs", "text_metrics",
            "ann_recall_report", "corpus_e2e_pipeline",
        ):
            assert name in SUITE_COMPONENTS, f"{name} missing a component map"


def test_suite_components_cover_registry_refs():
    """Teeth for the accounting (VERDICT r8 #1): a component wired into a
    suite's Spark fn or assembled oracle via `REGISTRY["name"]` but absent
    from SUITE_COMPONENTS[suite] silently under-reports gate coverage in
    COVERAGE.md (the r8 bug: approx_distinct_users/_quantiles rode
    sketch_suite's fn+oracle yet the accounting said 240/243). Parse BOTH
    surfaces — the suite fn's source and the `REGISTRY["suite"] =
    QueryDef(...)` oracle-assembly block in registry.py — and fail if any
    referenced registered query is missing from the component list."""
    import inspect
    import re

    import spark_deal_observer_spark.plans.registry as regmod
    from spark_deal_observer_spark.plans.registry import SUITE_COMPONENTS

    ref_re = re.compile(r'REGISTRY\["([a-z0-9_]+)"\]')
    src = inspect.getsource(regmod)
    for suite, comps in SUITE_COMPONENTS.items():
        refs: set[str] = set()
        try:
            refs.update(ref_re.findall(inspect.getsource(REGISTRY[suite].fn)))
        except (OSError, TypeError):
            pass  # fn source unavailable (shouldn't happen for suites)
        # the oracle-assembly patch block: from `REGISTRY["suite"] =` to the
        # next top-level closing paren
        m = re.search(
            rf'^REGISTRY\["{suite}"\] = QueryDef\(\n(.*?)^\)$',
            src, re.S | re.M,
        )
        if m:
            refs.update(ref_re.findall(m.group(1)))
        refs.discard(suite)
        missing = {r for r in refs if r in REGISTRY} - set(comps)
        assert not missing, (
            f"{suite}: wired-but-unlisted components {sorted(missing)} — "
            f"add them to SUITE_COMPONENTS[{suite!r}]"
        )


def test_gate_prefix_is_the_curated_fifty():
    """The driver's correctness gate snapshots DRIVER_ORDER[:50] — pin the
    curated membership so a refactor can't silently eject a gate slot (an
    ejected query loses its driver-side value verification; an ejected
    suite loses verification for its whole melted family). Update this
    list ONLY as a deliberate gate re-curation."""
    from spark_deal_observer_spark.plans.registry import DRIVER_ORDER

    expected = [
        "chain_head", "events_scan", "dedup_insert", "state_update_merge",
        "mark_submitted", "submit_payload_projection", "dim_lookup_fallback",
        "resolve_state_tick", "filter_suite", "eligible_deals",
        "dim_lookup_join", "composite_key_join", "agg_counters", "argmax_row",
        "dedup_9col", "topk_ends", "scalar_funcs", "cbor_decode_pipeline",
        "event_to_deal", "dedup_minhash_lsh", "dedup_clusters",
        "dedup_pair_verify_suite", "dedup_embedding", "dedup_semantic",
        "ann_recall_report", "ann_tier_suite", "kmeans_cells", "knn_join",
        "retrieval_suite", "corpus_curation_report", "classifier_quality",
        "bpe_encode", "text_metrics", "text_winnow_fingerprints",
        "text_scoring_suite", "multimodal_suite", "corpus_e2e_pipeline",
        "corpus_prep_suite", "dedup_lifecycle_suite", "corpus_sampling_suite",
        "graph_suite", "fuzzy_name_pairs", "temporal_history_suite",
        "windowed_counts", "profile_suite", "event_analytics_suite",
        "sketch_suite", "diff_session_recall_suite", "tpch_agg_suite",
        "ml_eval_suite",
    ]
    assert list(DRIVER_ORDER[:50]) == expected


@pytest.mark.parametrize(
    "name",
    [
        "tpch_local_supplier_volume",
        "tpch_volume_shipping",
        "tpch_product_type_profit",
        "tpch_min_cost_supplier",
    ],
)
def test_classic_multijoins_broadcast_dims(spark, name):
    """The Q5/Q7/Q9/Q2-shape queries must broadcast every dimension side —
    the fact table is the only side allowed to shuffle, and no join may
    degrade to a product."""
    p = plan(q(spark, name))
    assert "BroadcastHashJoin" in p, p
    for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in p, f"{marker} in {name} plan:\n{p}"


def test_ivf_pq_plan_shape(spark):
    """The composed IVF-PQ tier must keep every small side broadcast —
    probe list, distance table, centroid table, query vector — with no
    sort-merge join or cartesian anywhere: the only corpus-sized work is
    the code-scan ADC aggregate inside the probed cells."""
    p = plan(q(spark, "ann_ivf_pq"))
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert p.count("BroadcastHashJoin") >= 3, p


def test_lm_perplexity_plan_shape(spark):
    """The bigram-LM scoring plan must pair adjacent tokens in the scan
    stage (array zip via Generate — never a Window over a per-token
    shuffle), broadcast the vocabulary-sized unigram table to both of its
    join slots, and keep the whole pipeline JVM-side. Asserted on the plan
    builder (`_ppl_scores_plan`) — the registered query reads its
    published checkpoint, whose physical plan is a scan."""
    from spark_deal_observer_spark.operators.ranking import _ppl_scores_plan
    from spark_deal_observer_spark.sources.tables import load_table

    p = plan(_ppl_scores_plan(load_table(spark, SF_ORACLE, "documents")))
    assert "Window" not in p, p
    assert p.count("BroadcastHashJoin") >= 2, p
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in p, f"{marker} in plan:\n{p}"


def test_dsir_plan_shape(spark):
    """DSIR: the scoring plan must broadcast the DSIR_M-row delta table
    and stay windowless and JVM-only (asserted on `_dsir_logw_plan` — the
    registered query reads its published checkpoint, whose physical plan
    is a scan); the registered resample head must plan as TakeOrdered,
    never a global sort."""
    from spark_deal_observer_spark.operators.corpus import (
        _dsir_logw_plan, dsir_importance_sample,
    )
    from spark_deal_observer_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    p = plan(_dsir_logw_plan(docs))
    assert "BroadcastHashJoin" in p, p
    assert "Window" not in p, p
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in p, f"{marker} in plan:\n{p}"
    head = plan(dsir_importance_sample(docs))
    assert "TakeOrderedAndProject" in head, head
    assert "Window" not in head, head


def test_budget_admission_avoids_single_partition_window(spark):
    """The token-budget admission must never plan the global ORDER BY
    window's Exchange-to-one-partition: the two-phase prefix sum keeps the
    window partitioned by range (the primitive's whole point)."""
    p = plan(q(spark, "corpus_budget_admission"))
    assert "Window" in p, p
    assert "SinglePartition" not in p, p
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in p, f"{marker} in plan:\n{p}"


def test_seasonal_decompose_single_corpus_shuffle(spark):
    """Everything after the hourly rollup is |types|×hours rows: one
    events-scan aggregate, then window + slot-join over the bucket table
    — no second scan of the events source."""
    df = q(spark, "event_seasonal_decompose")
    df.write.format("noop").mode("overwrite").save()  # materialize the barrier
    p = plan(df)
    assert p.count("events.parquet") <= 1
    assert "BatchEvalPython" not in p and "CartesianProduct" not in p


def test_link_prediction_is_published_scan(spark):
    """The registered query reads the published top-k artifact — its
    plan is a scan, never the wedge enumeration (the copurchase rule);
    the wedge work is pinned cold by the bench's cold_s."""
    df = q(spark, "graph_link_prediction")
    p = plan(df)
    assert "Join" not in p and "Window" not in p


def test_zonemap_report_no_global_window(spark):
    """Chunk keys are value-range expressions — a whole-table row_number
    (single-task) must never appear; the zonemap aggregate is two-phase."""
    p = plan(q(spark, "zonemap_pruning_report"))
    assert "Window" not in p
    assert "partial_count" in p or "HashAggregate" in p


def test_incremental_clusters_contraction_is_bounded(spark):
    """The incremental path must not run CC over the full graph: its
    delta CC input is the contracted batch-touched subgraph. Pinned
    structurally: the published full-corpus label build and the
    incremental result agree (oracle-proven), and the registered query's
    plan contains no iterative-driver artifacts at read time (published
    checkpoint scans + the final relabel joins only)."""
    p = plan(q(spark, "dedup_clusters_incremental"))
    assert "documents.parquet" not in p  # rides published artifacts, not a rescan
