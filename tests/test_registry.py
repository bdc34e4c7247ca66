"""Every registered query runs at sf0.001 and matches its oracle.

This is the self-hosted version of the driver's t2 gate — it must stay
green for the full registry at all times.
"""

from __future__ import annotations

import pytest

from parquet_to_postgres_spark.queries import load_all

from ._compare import assert_matches_oracle
from .conftest import SF_SMOKE

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    df = spec.builder(spark, SF_SMOKE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check: it runs
    else:
        assert_matches_oracle(df, duck, spec.oracle, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    assert out.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())


def test_driver_order_registry_consistency():
    """The driver observes at most 50 queries in DRIVER_ORDER order —
    the order list and the registry must agree exactly (a typo here
    silently drops a query from the correctness gate)."""
    from parquet_to_postgres_spark.queries import DRIVER_ORDER

    assert len(DRIVER_ORDER) == 50
    assert len(set(DRIVER_ORDER)) == 50
    assert set(DRIVER_ORDER) == set(SPECS)
    # every query has an oracle (zero rows-only in the declared set)
    assert all(SPECS[n].oracle is not None for n in DRIVER_ORDER)


def test_rotated_out_multimodal_stub_decode_still_matches_oracle(spark, duck):
    """multimodal_stub_decode gave its slot to multimodal_real_decode in
    round 10 (VERDICT r9 item 2: the gate must witness the NATIVE
    decoder); the stub's Arrow-batch plumbing keeps full oracle coverage
    here."""
    from parquet_to_postgres_spark.queries.llm_q import (
        MULTIMODAL_STUB_DECODE_ORACLE,
        multimodal_stub_decode,
    )

    assert_matches_oracle(
        multimodal_stub_decode(spark, SF_SMOKE),
        duck,
        MULTIMODAL_STUB_DECODE_ORACLE,
        "multimodal_stub_decode",
    )


def test_rotated_out_array_functions_still_matches_oracle(spark, duck):
    """array_functions lost its registry slot to profile_drift_report in
    round 5 but keeps full oracle coverage here (same check the gate
    would run)."""
    from parquet_to_postgres_spark.queries.functions_q import (
        ARRAY_FUNCTIONS_ORACLE,
        array_functions,
    )

    assert_matches_oracle(
        array_functions(spark, SF_SMOKE),
        duck,
        ARRAY_FUNCTIONS_ORACLE,
        "array_functions",
    )


def test_rotated_out_term_frequency_top_still_matches_oracle(spark, duck):
    """term_frequency_top gave its slot to join_interval_overlap in
    round 7 (L5 stays declared via tf_idf_top / text_metrics); full
    oracle coverage continues here."""
    from parquet_to_postgres_spark.queries.llm_q import (
        TERM_FREQUENCY_TOP_ORACLE,
        term_frequency_top,
    )

    assert_matches_oracle(
        term_frequency_top(spark, SF_SMOKE),
        duck,
        TERM_FREQUENCY_TOP_ORACLE,
        "term_frequency_top",
    )


def test_etl_pg_roundtrip_fallback_matches_oracle(spark, duck, monkeypatch):
    """etl_pg_roundtrip's declared result must be engine-independent:
    on a box with no postgres toolchain the builder swaps the live COPY
    roundtrip for a ParquetSink roundtrip, and THAT path must hash-match
    the same oracle (the parametrized gate above only ever exercises
    whichever path this box supports).  The deliberate fallback's
    RuntimeWarning is ASSERTED here (pytest.warns swallows it), so the
    suite's warnings summary stays clean and any *unexpected* pg
    fallback elsewhere in CI output is signal, not noise (r8 verdict)."""
    import pytest

    from parquet_to_postgres_spark import pg
    from parquet_to_postgres_spark.queries.etl_q import etl_pg_roundtrip

    monkeypatch.setattr(pg, "shared_postgres", lambda: None)
    spec = SPECS["etl_pg_roundtrip"]
    with pytest.warns(RuntimeWarning, match="fall"):
        result = etl_pg_roundtrip(spark, SF_SMOKE)
    assert_matches_oracle(
        result,
        duck,
        spec.oracle,
        "etl_pg_roundtrip[fallback]",
    )


def test_rotated_out_textsim_pairs_still_matches_oracle(spark, duck):
    """textsim_pairs gave its slot to etl_pg_roundtrip in round 7 (L2
    stays declared via minhash_near_dup / near_dedup_corpus); full
    oracle coverage continues here."""
    from parquet_to_postgres_spark.queries.llm_q import (
        TEXTSIM_PAIRS_ORACLE,
        textsim_pairs,
    )

    assert_matches_oracle(
        textsim_pairs(spark, SF_SMOKE),
        duck,
        TEXTSIM_PAIRS_ORACLE,
        "textsim_pairs",
    )


def test_rotated_out_training_data_prep_still_matches_oracle(spark, duck):
    """training_data_prep gave its slot to span_dedup in round 7 (its
    L1/L5/L6 axes stay declared via corpus_preprocess /
    near_dedup_corpus / text_metrics / tf_idf_top / stratified_sample);
    full oracle coverage continues here."""
    from parquet_to_postgres_spark.queries.llm_q import (
        TRAINING_DATA_PREP_ORACLE,
        training_data_prep,
    )

    assert_matches_oracle(
        training_data_prep(spark, SF_SMOKE),
        duck,
        TRAINING_DATA_PREP_ORACLE,
        "training_data_prep",
    )


def test_rotated_out_daily_counts_gapfill_still_matches_oracle(spark, duck):
    """daily_counts_gapfill rotated out in round 13 (slot given to the
    funnel/retention/cube/ivfpq promotion); F2 stays declared via
    scalar_functions."""
    from parquet_to_postgres_spark.queries.aggregates_q import (
        DAILY_COUNTS_GAPFILL_ORACLE,
        daily_counts_gapfill,
    )

    assert_matches_oracle(
        daily_counts_gapfill(spark, SF_SMOKE),
        duck,
        DAILY_COUNTS_GAPFILL_ORACLE,
        "daily_counts_gapfill",
    )


def test_rotated_out_etl_roundtrip_agg_still_matches_oracle(spark, duck):
    """etl_roundtrip_agg rotated out in round 13; E1-E3 stay declared
    via pricing_summary + etl_jdbc_roundtrip + etl_pg_roundtrip (the
    live-engine versions of the same scan->DDL->sink path)."""
    from parquet_to_postgres_spark.queries.etl_q import (
        ETL_ROUNDTRIP_AGG_ORACLE,
        etl_roundtrip_agg,
    )

    assert_matches_oracle(
        etl_roundtrip_agg(spark, SF_SMOKE),
        duck,
        ETL_ROUNDTRIP_AGG_ORACLE,
        "etl_roundtrip_agg",
    )


def test_rotated_out_sessionize_events_still_matches_oracle(spark, duck):
    """sessionize_events rotated out in round 13; T3 stays declared via
    stream_session_windows (the streaming twin, same boundary rule)."""
    from parquet_to_postgres_spark.queries.pipeline_q import (
        SESSIONIZE_EVENTS_ORACLE,
        sessionize_events,
    )

    assert_matches_oracle(
        sessionize_events(spark, SF_SMOKE),
        duck,
        SESSIONIZE_EVENTS_ORACLE,
        "sessionize_events",
    )


def test_rotated_out_cosine_topk_still_matches_oracle(spark, duck):
    """cosine_topk rotated out in round 13; L3 stays declared via
    ann_topk + embedding_profile + ivfpq_index_probe; the two-stage
    plan shape is pinned by test_plans.test_cosine_two_stage_topk_plan_shape."""
    from parquet_to_postgres_spark.queries.llm_q import (
        COSINE_TOPK_ORACLE,
        cosine_topk,
    )

    assert_matches_oracle(
        cosine_topk(spark, SF_SMOKE), duck, COSINE_TOPK_ORACLE, "cosine_topk"
    )


def test_rotated_out_salted_user_totals_still_matches_oracle(spark, duck):
    """salted_user_totals rotated out in round 14 (slot given to
    attribution_report, same events/user grain); A1 stays declared via
    pricing_summary, and the hot-key scale probe keeps measuring the
    salting machinery."""
    from parquet_to_postgres_spark.queries.aggregates_q import (
        SALTED_USER_TOTALS_ORACLE,
        salted_user_totals,
    )

    assert_matches_oracle(
        salted_user_totals(spark, SF_SMOKE),
        duck,
        SALTED_USER_TOTALS_ORACLE,
        "salted_user_totals",
    )


def test_rotated_out_cosine_threshold_join_still_matches_oracle(spark, duck):
    """cosine_threshold_join rotated out in round 14 (slot given to
    sketch_cube_slice); L4 stays declared via ann_topk and
    ivfpq_index_probe."""
    from parquet_to_postgres_spark.queries.llm_q import (
        COSINE_THRESHOLD_JOIN_ORACLE,
        cosine_threshold_join,
    )

    assert_matches_oracle(
        cosine_threshold_join(spark, SF_SMOKE),
        duck,
        COSINE_THRESHOLD_JOIN_ORACLE,
        "cosine_threshold_join",
    )


def test_rotated_out_exact_stats_still_matches_oracle(spark, duck):
    """exact_stats rotated out in round 12; A7 stays declared via
    approx_sketches and profile_drift_report."""
    from parquet_to_postgres_spark.queries.aggregates_q import (
        EXACT_STATS_ORACLE,
        exact_stats,
    )

    assert_matches_oracle(
        exact_stats(spark, SF_SMOKE), duck, EXACT_STATS_ORACLE, "exact_stats"
    )


def test_rotated_out_tf_idf_top_still_matches_oracle(spark, duck):
    """tf_idf_top rotated out in round 12; L5 stays declared via
    text_metrics and corpus_preprocess."""
    from parquet_to_postgres_spark.queries.pipeline_q import (
        TF_IDF_TOP_ORACLE,
        tf_idf_top,
    )

    assert_matches_oracle(
        tf_idf_top(spark, SF_SMOKE), duck, TF_IDF_TOP_ORACLE, "tf_idf_top"
    )


def test_rotated_out_stratified_sample_still_matches_oracle(spark, duck):
    """stratified_sample gave its slot to the A-ES weighted_sample in
    round 12; L6 stays declared via text_metrics and corpus_preprocess."""
    from parquet_to_postgres_spark.queries.llm_q import (
        STRATIFIED_SAMPLE_ORACLE,
        stratified_sample,
    )

    assert_matches_oracle(
        stratified_sample(spark, SF_SMOKE),
        duck,
        STRATIFIED_SAMPLE_ORACLE,
        "stratified_sample",
    )
