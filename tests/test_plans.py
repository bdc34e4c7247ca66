"""Physical-plan shape tests — the 100 TB design contracts.

Correctness says a query returns the right rows; these tests pin HOW:
filters reach the parquet scan, projections prune columns, dimension
joins broadcast, global top-k never fully sorts, and hot paths stay in
whole-stage codegen.  A regression here is a scale bug even when the
sf0.01 answers still match.
"""

from __future__ import annotations

import contextlib
import io

from parquet_to_postgres_spark.queries import load_all

from .conftest import SF_SMOKE

SPECS = load_all()


def plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def build(name: str, spark):
    return SPECS[name].builder(spark, SF_SMOKE)


def test_pricing_summary_pushdown_and_pruning(spark):
    p = plan(build("pricing_summary", spark))
    # The shipdate predicate must reach the parquet reader...
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # ...and the scan must read only the 7 needed columns.
    assert "l_comment" not in p
    for unused in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        assert unused not in p, f"scan reads unused column {unused}"
    # Whole-stage codegen spans (the `*(n)` markers) appear in the final
    # adaptive plan, which exists only after execution.
    df = build("pricing_summary", spark)
    df.collect()  # count() would plan a different tree; execute THIS one
    p_final = plan(df, mode="simple")
    assert "isFinalPlan=true" in p_final and "*(" in p_final


def test_filter_predicates_pushdown(spark):
    p = plan(build("select_filter_case", spark))
    assert "PushedFilters: [" in p
    assert "PushedFilters: []" not in p


def test_dimension_joins_broadcast(spark):
    # region/nation joins must broadcast, never shuffle both sides.
    p = plan(build("join_dims_grid", spark))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_star_join_broadcasts_dimensions(spark):
    p = plan(build("join_star_revenue", spark))
    assert p.count("BroadcastHashJoin") >= 2, (
        "star-schema dimension tables must broadcast"
    )


def test_top_k_global_avoids_full_sort(spark):
    p = plan(build("top_k_global", spark))
    assert "TakeOrderedAndProject" in p, (
        "orderBy+limit must plan TakeOrderedAndProject, not a global Sort"
    )


def test_no_python_in_jvm_hot_paths(spark):
    # Python evaluation is opt-in (L8 UDF queries only); relational and
    # text queries must stay JVM-side.
    for name in ("pricing_summary", "text_metrics", "scalar_functions", "join_star_revenue"):
        p = plan(build(name, spark))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, (
            f"{name} fell out of the JVM into Python"
        )


def test_projection_prunes_scan_schema(spark):
    # rotated out of the registry in r7 but still the cleanest pruning
    # probe: two columns used out of five.
    from parquet_to_postgres_spark.queries.llm_q import term_frequency_top

    p = plan(term_frequency_top(spark, SF_SMOKE))
    # documents has (doc_id, text, lang, source, n_chars); only two used.
    assert "n_chars" not in p
    assert "source" not in p


def test_interval_overlap_join_is_banded_equi(spark):
    """J6 letter form: the raw interval-overlap theta join must execute
    as the banding rewrite — ONE equi-join on the exploded bin key —
    and never fall back to a nested-loop/cartesian over the pair space."""
    df = build("join_interval_overlap", spark)
    p = plan(df)
    assert "BroadcastNestedLoopJoin" not in p, "theta join fell to O(n*m)"
    assert "CartesianProduct" not in p, "theta join fell to cross product"
    assert "Generate" in p, "banding must explode intervals over bins"
    assert "Join" in p
    # and the same DataFrame must actually produce rows at smoke scale
    assert df.count() > 0


def test_global_rank_is_range_partitioned(spark):
    # distributed_rank contract: the relation is range-repartitioned and
    # the rank window is per-partition — never a global one-task window.
    p = plan(build("global_sort_rank", spark))
    assert "rangepartitioning" in p.lower(), "rank must range-repartition"
    assert "windowspecdefinition(__pid" in p, (
        "rank window must be partitioned by __pid, not a global window"
    )


def test_token_dictionary_has_no_global_window(spark):
    # The vocabulary rank must use the same two-phase plan (at 100 TB the
    # vocabulary is billions of tokens — one ranking task is a ceiling).
    from parquet_to_postgres_spark.llm import dedup as D
    from parquet_to_postgres_spark.tables import Catalog

    t = Catalog(spark, SF_SMOKE)
    p = plan(D.token_dictionary(D.tokenize(t.documents)))
    assert "rangepartitioning" in p.lower()
    assert "windowspecdefinition(__pid" in p


def test_minhash_profiles_single_logical_shuffle(spark):
    # Dictionary-free signatures: the profile job must be explode ->
    # per-doc aggregate.  Exactly 2 exchanges allowed — the opt-in
    # compute spread (round-robin) and the groupBy(doc_id) hash
    # partitioning.  A third would mean a dictionary join / rank crept
    # back onto the signature path.
    from parquet_to_postgres_spark.llm import dedup as D
    from parquet_to_postgres_spark.tables import Catalog

    t = Catalog(spark, SF_SMOKE)
    p = plan(D.minhash_profiles(t.documents, shingle_n=5), mode="simple")
    assert p.count("Exchange") == 2
    assert "hashpartitioning(doc_id" in p
    assert "Join" not in p and "Window" not in p


def test_minhash_profiles_arrow_zero_shuffle(spark):
    # r16 kernel pin: the Arrow profile path (now feeding
    # minhash_near_dup and near_dedup_corpus) must finish in the scan
    # stage — exactly ONE Exchange (the opt-in compute spread), no
    # aggregate exchange, and the Python boundary is MapInArrow
    # (batched), never BatchEvalPython (row-at-a-time).
    from parquet_to_postgres_spark.llm import dedup as D
    from parquet_to_postgres_spark.tables import Catalog

    t = Catalog(spark, SF_SMOKE)
    p = plan(D.minhash_profiles_arrow(t.documents, shingle_n=5), mode="simple")
    assert p.count("Exchange") == 1
    assert "MapInArrow" in p
    assert "BatchEvalPython" not in p
    assert "Join" not in p and "Window" not in p and "Aggregate" not in p


def test_simhash_pairs_blocked_not_allpairs(spark):
    # Candidate generation must be the (band, key) equi-join, never a
    # cartesian / broadcast-nested-loop all-pairs comparison.
    # (rotated out of the registry in r7; the plan contract holds.)
    from parquet_to_postgres_spark.queries.llm_q import textsim_pairs

    p = plan(textsim_pairs(spark, SF_SMOKE))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_declared_queries_deterministic(spark):
    """Representative double-run: same rows both times (canon compare)."""
    import pandas as pd  # noqa: F401

    from ._compare import canon

    for name in ("pricing_summary", "minhash_near_dup", "funnel_counts", "collect_nations"):
        a = canon(build(name, spark).toPandas())
        b = canon(build(name, spark).toPandas())
        assert a == b, f"{name} is nondeterministic across runs"


def test_spread_noop_when_parallel_enough(spark):
    """spread() must be a no-op (same DataFrame object) when the input
    already carries parallelism — a shuffled relation (no file lineage)
    or a many-file table never fires; only an under-split file scan (the
    single-file fixtures) repartitions.  The probe is analysis-only:
    building the operator must not convert the plan to an RDD."""
    from parquet_to_postgres_spark.tables import load_table, spread

    df = spark.range(1000).repartition(64)
    assert spread(df) is df
    shuffled = spark.range(1000).coalesce(1)
    assert spread(shuffled) is shuffled  # no file lineage -> untouched
    onefile = load_table(spark, SF_SMOKE, "documents")
    assert spread(onefile).rdd.getNumPartitions() >= 8


def test_filter_pushdown_survives_spread(spark):
    """Catalyst pushes scan filters below the spread repartition — the
    Exchange must not fence off PushedFilters."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.tables import load_table, spread

    df = spread(load_table(spark, SF_SMOKE, "documents")).where(
        F.col("lang") == "en"
    )
    p = plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in p


def test_sessionize_single_keyed_shuffle(spark):
    # sessionize contract: ONE shuffle total — both stacked windows ride
    # the same hashpartitioning(user_id) Exchange, and the per-session
    # aggregate reuses it too (its grouping keys are a superset of the
    # partitioning key), so the whole query is scan → one Exchange →
    # windows → partial+final agg.
    from parquet_to_postgres_spark.queries.pipeline_q import sessionize_events

    p = plan(sessionize_events(spark, SF_SMOKE), mode="simple")
    assert "windowspecdefinition(user_id" in p
    assert p.count("Exchange") == 1, p


def test_pack_token_budget_is_distributed_cumsum(spark):
    # pack_by_budget must ride distributed_cumsum: range-repartition +
    # per-partition (__pid) windows — never a single-task global window.
    p = plan(build("pack_token_budget", spark))
    assert "rangepartitioning" in p.lower()
    assert "windowspecdefinition(__pid" in p


def test_tf_idf_windows_are_doc_partitioned(spark):
    # doc-length and rank windows reuse the (doc_id, term) aggregate's
    # partitioning key; the corpus-count side must broadcast.
    # (tf_idf_top rotated out of the registry in r12 — build the plan
    # from the module function, the shape contract is unchanged)
    from parquet_to_postgres_spark.queries.pipeline_q import tf_idf_top

    p = plan(tf_idf_top(spark, SF_SMOKE))
    assert "windowspecdefinition(doc_id" in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_corpus_preprocess_no_full_corpus_window(spark):
    """The corpus-cleaning composite must stay aggregate/join shaped:
    its only window is partitioned by the dedup hash (per-key grain);
    a global (empty-partition) window would serialize the corpus."""
    p = plan(build("corpus_preprocess", spark))
    assert "Window" in p  # the n_copies count per dedup key
    # Spark renders a global window with an EMPTY partition spec
    # (trailing '], []'); the dedup-key window must carry its key
    # (Catalyst hoists md5(clean_text) into a _w0 projection, so match
    # the spec shape, not the expression text).
    for line in p.splitlines():
        if "windowspecdefinition" in line:
            assert not line.rstrip().endswith(", []"), (
                f"global window found: {line}"
            )
    # boilerplate frequency is an aggregate, not a self cross join
    assert "CartesianProduct" not in p


def test_profile_drift_diff_consumes_aggregates_not_rows(spark):
    """Drift = two single-pass profiles + a column-count-sized diff.
    The scale contract is that the outer-join DIFF consumes the
    profiles' 1-row aggregate outputs, never the raw table: each
    orders scan must feed a HashAggregate below the join (join
    strategy itself is irrelevant — full outer over two ~6-row frames;
    Spark picks SMJ since full outer can't broadcast-hash)."""
    p = plan(build("profile_drift_report", spark))
    assert "HashAggregate" in p or "SortAggregate" in p
    assert "Join FullOuter" in p
    # the join keys on the stacked profile's column name, i.e. its
    # inputs are the unpivoted profile frames — not o_* table columns
    assert "CartesianProduct" not in p
    # one scan per half, nothing else (formatted output lists every
    # node twice — tree and details — so match the details form)
    import re

    assert len(re.findall(r"^\(\d+\) Scan parquet", p, re.M)) == 2


def test_aqe_skew_join_splits_zipfian_partition(spark):
    """Skew evidence (VERDICT r5 item 2): on a zipf-style key (90% of a
    300k-row fact on ONE key) AQE's skew-join handling must engage —
    the executed sort-merge join reports skew=true, i.e. the oversized
    partition was split instead of serializing on one reducer.

    Thresholds are lowered to make local-scale data exhibit the same
    decision a 100 TB partition would; the salting alternative for
    AGGREGATION skew is pinned by salted_user_totals' oracle match
    (identical results to plain GROUP BY, shuffle reshaped by salt)."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB"
        )
        # force a sort-merge join: broadcast would dodge the skew
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        fact = spark.range(0, 300_000).select(
            F.when(F.pmod(F.col("id"), F.lit(10)) < 9, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(0, 5_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        # collapse the join output driver-side cheaply; the final
        # adaptive plan (skew decision included) lives on THIS DataFrame
        # only after ITS execution, so execute exactly this tree.  The
        # sums keep the varying payload columns IN the shuffle — a
        # pruned-to-constant-key hot partition lz4-compresses below any
        # realistic threshold and hides the skew from map statistics.
        joined = fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.sum("w").alias("sw"),
        )
        # 270k hot rows hit dim k=0; the 500 cold keys under 5000
        # (9, 19, ..., 4999) hit one dim row each
        assert joined.collect()[0]["n"] == 270_000 + 500
        p = plan(joined, mode="simple")
        assert "isFinalPlan=true" in p
        assert "SortMergeJoin" in p
        assert "skew=true" in p, p
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime filtering evidence: a selective dim-side predicate must
    inject a bloom filter into the fact side of a shuffle join
    (`might_contain(...)` guarding the lineitem scan), so at 100 TB the
    fact scan drops non-joining rows BEFORE the shuffle instead of
    shipping them.  Thresholds lowered so probe-scale data takes the
    same decision a warehouse-scale plan would; broadcast disabled
    because a broadcast hash join already prunes via its build side."""
    from pyspark.sql import functions as F

    from .conftest import SF_CORRECT

    keys = (
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet").where(
            F.col("o_orderstatus") == "F"
        )
        j = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        p = plan(j, mode="simple")
        assert "might_contain" in p.lower(), p
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_decontaminate_corpus_side_never_shuffles(spark):
    """Benchmark decontamination must cost ONE corpus scan: eval grams
    aggregate and broadcast; the corpus probes map-side.  A plan that
    sort-merge-joins (or hash-partitions corpus grams) would shuffle
    100 TB of exploded n-grams."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.llm.text import contaminated_ids
    from parquet_to_postgres_spark.tables import Catalog

    docs = Catalog(spark, SF_SMOKE).documents
    eval_df = docs.where(F.col("doc_id") % 7 == 0).select("text")
    p = plan(contaminated_ids(docs, eval_df, n=8))

    assert "BroadcastHashJoin LeftSemi" in p
    assert "SortMergeJoin" not in p
    # the gram key is hash-partitioned exactly once — the eval-side
    # distinct (benchmark-sized); corpus grams reach the join unshuffled
    assert p.count("hashpartitioning(__g") == 1
    # column pruning reaches the scan: only (doc_id, text) are read
    assert "struct<doc_id:bigint,text:string>" in p


def test_semantic_dedup_pairs_form_on_cell_equi_join(spark):
    """SemDeDup's whole point is N^2/k: the within-cluster pair join
    must plan as an equi-join on the cell id, never a nested-loop over
    the corpus cross product."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.llm.similarity import semantic_dedup
    from parquet_to_postgres_spark.tables import Catalog

    vecs = Catalog(spark, SF_SMOKE).embeddings.select("vec_id", "embedding")
    clusters = vecs.select(
        "vec_id", (F.col("vec_id") % 8).cast("int").alias("cell")
    )
    p = plan(semantic_dedup(vecs, threshold=0.9, clusters=clusters))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_char_lm_scoring_model_joins_broadcast(spark):
    """Perplexity scoring must never shuffle the corpus for the model:
    both LM joins (context totals, pair counts) broadcast the bounded
    model; the only corpus shuffle is the per-doc aggregate on doc_id."""
    from parquet_to_postgres_spark.llm.text import (
        score_char_lm,
        train_char_lm,
    )
    from parquet_to_postgres_spark.tables import Catalog

    docs = Catalog(spark, SF_SMOKE).documents
    lm, v = train_char_lm(docs, n=3)
    lm = lm.localCheckpoint(eager=True)  # isolate scoring from training
    p = plan(score_char_lm(docs, lm, v, n=3))
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p
    # the ONLY corpus exchange is the per-doc aggregate; any ctx-keyed
    # exchange must be the model-side distinct (its row carries
    # ctx_total), never the corpus gram stream (whose rows don't)
    assert p.count("hashpartitioning(doc_id") == 1
    for line in p.splitlines():
        if "hashpartitioning(ctx" in line:
            assert "ctx_total" in line, f"corpus gram shuffle: {line}"


def test_pq_adc_scan_corpus_side_unshuffled(spark):
    """The PQ ADC pass is a pure scan of the encoded corpus: the query
    LUTs broadcast (nested-loop on the tiny side is the deliberate
    brute-force-over-codes shape); the encoded corpus must reach the
    scoring operator with no exchange keyed on its rows, and the
    argmin/encode aggregates must be partial (map-side combined)."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.llm import similarity as S
    from parquet_to_postgres_spark.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    corpus = emb.where(F.col("vec_id") >= 5)
    queries = emb.where(F.col("vec_id") < 5)
    cb = S.pq_train(corpus, max_iterations=2).localCheckpoint(eager=True)
    p = plan(S.ann_topk_pq(corpus, queries, k=5, codebooks=cb))
    # candidate generation: broadcast of the bounded LUT set only
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    # the LUT build's reassembly aggregate is map-side combinable
    assert "partial_collect_list" in p
    # encode is a pure scan (round 8): literal codebooks, argmin as an
    # array_min expression — NO exchange, join, or aggregate anywhere
    c_unit = corpus.select(
        F.col("vec_id").alias("cid"), S._unit("embedding").alias("cvec")
    )
    pe = plan(S.pq_encode(c_unit, cb, id_col="cid", vec_col="cvec"))
    assert "Exchange" not in pe and "Join" not in pe and "Aggregate" not in pe


def test_pq_argmin_projection_skips_whole_stage_codegen(spark):
    """r9: the literal argmin forest can never janino-compile (64 KB
    method limit) and every compiled rewrite measured SLOWER than the
    interpreted projection (BASELINE.md shootout) — so the design is
    to not even ATTEMPT the doomed compile: the _no_wsc poison must
    keep the argmin Project OUTSIDE every WholeStageCodegen region
    (no '*(' prefix on its executed-plan line).  If this pin breaks,
    either the poison was optimized away (compile stall returns, one
    per Lloyd round) or someone re-inlined the forest into a codegen
    stage (bytecode-interpreter slowdown returns)."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.llm import similarity as S
    from parquet_to_postgres_spark.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    corpus = emb.where(F.col("vec_id") >= 5)
    cb = S.pq_train(corpus, max_iterations=1).localCheckpoint(eager=True)
    enc = S.pq_encode(corpus, cb)
    assert enc.count() == corpus.count()
    plan = enc._jdf.queryExecution().executedPlan().toString()
    argmin_lines = [
        ln for ln in plan.split("\n")
        if "__codes" in ln and "Project" in ln
    ]
    assert argmin_lines, "argmin projection not found in executed plan"
    for ln in argmin_lines:
        assert "*(" not in ln.split("Project")[0], ln[:120]


def test_bpe_tokenize_adds_no_exchange(spark):
    """Tokenization is embarrassingly parallel: merge ranks ride the UDF
    closure, so the plan over a parquet scan must contain NO Exchange —
    any shuffle here would be a scale bug on a pure projection."""
    from parquet_to_postgres_spark.llm import bpe
    from parquet_to_postgres_spark.tables import Catalog

    docs = Catalog(spark, SF_SMOKE).documents.select("doc_id", "text")
    merges = bpe.train_bpe(bpe.bpe_word_counts(docs), n_merges=20)
    p = plan(bpe.bpe_tokenize(docs, merges))
    assert "Exchange" not in p
    assert "ArrowEvalPython" in p  # the pandas UDF, Arrow-batched


def test_udtf_chunker_adds_no_exchange(spark):
    """The lateral Python-UDTF fan-out must evaluate inside the scan
    stage like explode: scan -> BatchEvalPythonUDTF, zero Exchanges —
    the corpus never shuffles to chunk."""
    from parquet_to_postgres_spark.llm.udfs import chunk_documents_udtf
    from parquet_to_postgres_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    p = plan(chunk_documents_udtf(docs))
    assert "PythonUDTF" in p
    assert "Exchange" not in p


def test_classifier_pandas_scorer_adds_no_exchange(spark):
    """score_quality_pandas is the full-corpus filtering path: features
    are built scan-level (higher-order functions) and the margin UDF is
    Arrow-batched over them — the plan must contain NO Exchange.  The
    shuffle-bearing twin (score_quality) exists for JVM-only contexts;
    this one is the 100 TB default."""
    import numpy as np

    from parquet_to_postgres_spark.llm.classify import (
        LinearModel,
        score_quality_pandas,
    )
    from parquet_to_postgres_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    model = LinearModel(np.ones(17), 16, (1,))
    p = plan(score_quality_pandas(docs, model))
    assert "Exchange" not in p
    assert "ArrowEvalPython" in p


def test_classifier_iteration_shuffles_only_the_model(spark):
    """One training iteration over the cached feature table must reuse
    the cache's hash-partitioning for the per-doc window (no exchange
    before Window) and shuffle only the model-bounded groupBy(feat)
    gradient: exactly ONE Exchange in the whole iteration plan, and it
    hashes on feat."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.llm.classify import LinearModel, featurize
    from parquet_to_postgres_spark.tables import load_table

    dim = 1 << 10
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    rows = (
        featurize(docs, dim=dim)
        .select(F.col("doc_id").alias("__id"), F.explode("features").alias("f"))
        .select("__id", F.col("f.feat").alias("feat"), F.col("f.x").alias("x"))
        .repartition("__id")
        .sortWithinPartitions("__id", "feat")
        .persist()
    )
    try:
        rows.count()  # materialize the cache so its partitioning is visible
        w = LinearModel(np.ones(dim + 1), dim, (1,)).nonzero_weights_df(spark)
        j = rows.join(F.broadcast(w), "feat", "left")
        margin = F.sum(
            F.round(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("x") * 1e9)
            .cast("long")
        ).over(Window.partitionBy("__id"))
        grad = (
            j.select("feat", (margin * F.col("x")).alias("g"))
            .groupBy("feat")
            .agg(F.sum("g"))
        )
        # Only the plan ABOVE the cache boundary is per-iteration cost;
        # the InMemoryRelation section replays the one-time build plan.
        p = plan(grad, mode="simple").split("InMemoryRelation")[0]
        shuffles = [
            ln for ln in p.splitlines()
            if "Exchange" in ln and "BroadcastExchange" not in ln
        ]
        assert len(shuffles) == 1 and "hashpartitioning(feat" in shuffles[0], p
        assert "BroadcastHashJoin" in p
        # the window consumes the cache's partitioning directly: nothing
        # between Window and the cached scan may shuffle.
        win_part = p.split("Window")[1]
        assert "Exchange" not in win_part.split("InMemoryTableScan")[0], p
    finally:
        rows.unpersist()


def test_unigram_tokenize_adds_no_exchange(spark):
    """Like BPE: the vocab rides the UDF closure, so unigram Viterbi
    tokenization over a parquet scan must contain NO Exchange."""
    import math

    from parquet_to_postgres_spark.llm.unigram import (
        UnigramModel,
        unigram_tokenize,
    )
    from parquet_to_postgres_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    model = UnigramModel({"▁": math.log(0.5), "a": math.log(0.5)})
    p = plan(unigram_tokenize(docs, model))
    assert "Exchange" not in p
    assert "ArrowEvalPython" in p


def test_importance_resample_avoids_full_sort(spark):
    """Gumbel-top-k must execute as TakeOrderedAndProject (partition-
    local top-k then merge) — a global Sort of the scored corpus would
    defeat the point of sampling."""
    from parquet_to_postgres_spark.llm.classify import importance_resample

    scored = spark.range(1000).selectExpr(
        "id AS doc_id", "CAST(-id AS DOUBLE) AS logw"
    )
    p = plan(importance_resample(scored, 10))
    assert "TakeOrderedAndProject" in p
    assert "rangepartitioning" not in p.lower()


def test_predict_lang_model_joins_broadcast(spark):
    """The LID count model and label list are bounded (charset^n x
    labels); both must broadcast — the corpus grams never shuffle to
    meet the model."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.llm.classify import (
        predict_lang,
        train_lang_id,
    )
    from parquet_to_postgres_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    model = train_lang_id(docs.withColumn("lang", F.lit("en")))
    p = plan(predict_lang(docs, model), mode="simple")
    assert p.count("BroadcastExchange") >= 2
    assert "SortMergeJoin" not in p


def test_kmeans_assignment_plan_is_shuffle_free(spark):
    """r10 scale pin (twin of the PQ big-model pin): the Lloyd
    assignment pass must put NO exchange on the corpus side — the
    centroid set rides a single-row BroadcastExchange and the argmin
    is a per-row expression.  Any other Exchange means assignment is
    re-shuffling the corpus (vectors included) every round — the shape
    the r10 rewrite removed."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.llm import similarity as S
    from parquet_to_postgres_spark.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = S._centroid_arrays(emb, "label", "embedding").select(
        F.col("label").cast("int").alias("cell"), "centroid"
    )
    v = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    out = S._nearest_cell(v, cents.localCheckpoint())
    p = out._jdf.queryExecution().executedPlan().toString()
    # the centroid list's own tiny aggregate may exchange; the corpus
    # side may not — strip the broadcast subtree marker and require the
    # only Exchange nodes to be broadcast ones
    assert "Exchange" not in p.replace("BroadcastExchange", "BX").replace(
        "Exchange SinglePartition", "SP-agg", 1
    ), p[:800]
    assert out.count() == emb.count()


def test_ivf_assignment_plan_has_no_window(spark):
    """r10 scale pin: IVF cell assignment must be a pure scan — the
    former row_number window hash-partitioned AND sorted all N·k
    scored rows (vectors riding along).  The executed plan of the
    assignment side may contain no Window and no non-broadcast
    Exchange."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.llm import similarity as S
    from parquet_to_postgres_spark.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = S._centroid_arrays(emb, "label", "embedding").select(
        F.col("label").cast("int").alias("cell"), "centroid"
    ).localCheckpoint()
    pre = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cvec"),
    )
    out = S._nearest_cells(pre, cents, 2, "cvec")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p, p[:500]
    # allowed exchanges: the model BroadcastExchange and the k-row
    # centroid-list SinglePartition aggregate; a hash/range exchange
    # would mean the CORPUS is being shuffled for a per-row selection
    assert "Exchange hashpartitioning" not in p, p[:800]
    assert "Exchange rangepartitioning" not in p, p[:800]
    assert out.count() == emb.count() * 2


def test_cell_assignment_empty_centroids_yield_zero_rows(spark):
    """r10 ADVICE: the single-row collect_list aggregate emits one row
    even over ZERO centroids; unguarded, _nearest_cell(s) assigned a
    NULL cell to every corpus row on the probes==1 array_min branch
    (nulls leaking into downstream joins) while the probes>1 explode
    dropped all rows.  Both helpers must match the prior crossJoin
    form: zero output rows on a degenerate centroid set — and the
    OUTPUT SCHEMA must be unchanged so downstream selects still bind."""
    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.llm import similarity as S
    from parquet_to_postgres_spark.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(20)
    no_cents = (
        S._centroid_arrays(emb, "label", "embedding")
        .select(F.col("label").cast("int").alias("cell"), "centroid")
        .where(F.lit(False))
        .localCheckpoint()
    )
    v = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    out1 = S._nearest_cell(v, no_cents)
    assert out1.columns == ["id", "vec", "cell", "dist"]
    assert out1.count() == 0

    pre = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec")
    )
    for probes in (1, 2):
        out = S._nearest_cells(pre, no_cents, probes, "cvec")
        assert out.columns == ["neighbor_id", "cvec", "cell"], probes
        assert out.count() == 0, probes


def test_fused_lloyd_update_shuffles_model_grain_only(spark):
    """r12 scale pin: the fused Lloyd mean update
    (_cell_partial_means_np / _pq_partial_means_np) must show NO
    Exchange below the MapInPandas — the corpus never shuffles; the
    only exchanges sit ABOVE it, carrying the k·d model-grain partial
    rows (posexplode of per-partition sums) into the tiny aggregate."""
    import random

    from pyspark.sql import functions as F

    from parquet_to_postgres_spark.llm import similarity as S

    rng = random.Random(5)
    d, k = 300, 4
    cents_rows = [
        (c, [rng.uniform(-1, 1) for _ in range(d)]) for c in range(k)
    ]
    v = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(d)]) for i in range(50)],
        "id long, vec array<double>",
    )
    p = plan(S._cell_partial_means_np(v, cents_rows), mode="simple")
    # everything below the python map is exchange-free
    below = p[p.index("MapInPandas"):]
    assert "Exchange" not in below, below
    # and the exchanges above exist (the model-grain aggregate)
    above = p[: p.index("MapInPandas")]
    assert "Exchange" in above

    cmap = {
        (j, c): [rng.uniform(-1, 1) for _ in range(30)]
        for j in range(2)
        for c in range(8)
    }
    base = v.select("id", F.col("vec").alias("__v"))
    p2 = plan(S._pq_partial_means_np(base, cmap, 2, 30, 8), mode="simple")
    below2 = p2[p2.index("MapInPandas"):]
    assert "Exchange" not in below2, below2


def test_bloom_semi_reduction_filters_fact_at_scan(spark):
    """The explicit bloom operator must test fact keys BEFORE the semi
    join's exchange: the bitmap rides a broadcast (single-row nested
    loop, constant cost) and the k-probe test is a scan-level filter —
    the fact side sheds rows pre-shuffle.  Complements the Catalyst-
    injected runtime filter pinned above: this one is user-controlled
    and survives sink/checkpoint boundaries where injection cannot
    reach."""
    p = plan(build("bloom_semi_reduction", spark), mode="simple")
    # k-probe expression present as a filter (xxhash64 per seed)
    assert "xxhash64" in p
    # bitmap attaches via broadcast, never a shuffle of the fact
    assert "BroadcastNestedLoopJoin" in p
    # the real semi join still runs (false-positive removal)
    assert "LeftSemi" in p


def test_fuzzy_name_pairs_is_blocked_equi_join(spark):
    """The fuzzy join must plan as an EQUI join on the block key with
    levenshtein as a post-join filter — never a cartesian/broadcast-
    nested-loop over all pairs."""
    p = plan(build("fuzzy_name_pairs", spark), mode="simple")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "levenshtein" in p


def test_weighted_sample_avoids_global_sort(spark):
    """A-ES top-k selection must plan TakeOrderedAndProject (per-
    partition heaps + driver merge of P·k rows), never a global sort."""
    p = plan(build("weighted_sample", spark), mode="simple")
    assert "TakeOrderedAndProject" in p
    assert "rangepartitioning" not in p.lower()


def test_cdc_apply_state_partial_aggregates_before_exchange(spark):
    """CDC compaction must pre-reduce map-side (partial max(struct))
    so the exchange carries a row per (task, key), never the window
    idiom that shuffles the whole changelog history."""
    p = plan(build("cdc_apply_state", spark), mode="simple")
    assert "Window" not in p
    assert "partial_max" in p


def test_cosine_two_stage_topk_plan_shape(spark):
    """The two-stage top-k contract the rotated-out cosine_topk row
    certified: stage 1 ranks within (query, input-partition) — a
    WindowGroupLimit whose FIRST pass runs pre-shuffle — so only k rows
    per (query, partition) reach the exchange; no global sort of the
    full score stream appears (r13 review finding: this pin was claimed
    but didn't exist)."""
    from parquet_to_postgres_spark.llm import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = S.two_stage_topk(
        emb.where("vec_id >= 5"), emb.where("vec_id < 5"), k=10
    )
    p = plan(out, mode="simple")
    # both ranking stages plan as WindowGroupLimit (partial + final
    # per stage), and the broadcast of the bounded query set is there
    assert p.count("WindowGroupLimit") >= 2, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    # the full corpus-score stream is never globally sorted: every Sort
    # is local (the "false" flag = no global ordering requirement)
    import re

    assert not re.search(r"Sort \[[^\]]*\], true", p), p


def test_cube_orders_expands_preaggregated_grain(spark):
    """r15 (guide §2.3): the CUBE's Expand multiplies its INPUT rows by
    the number of grouping sets, so cube_orders pre-aggregates to
    (status, priority, custkey) grain — the finest grain any cell
    needs, count-distinct key included — and Expand quadruples the
    grain rows, not the raw order rows.  Pin: a grain HashAggregate
    sits BELOW the Expand (parents print before children in simple
    mode), keyed on exactly the two cube columns plus the distinct
    key."""
    import re

    p = plan(build("cube_orders", spark), mode="simple")
    i_expand = p.index("Expand")
    m = re.search(
        r"HashAggregate\(keys=\[o_orderstatus#\d+, o_orderpriority#\d+, "
        r"o_custkey#\d+L?\]",
        p,
    )
    assert m, p
    assert m.start() > i_expand, "grain pre-aggregate must feed the Expand"
