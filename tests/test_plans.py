"""Physical-plan shape assertions — the 100 TB properties.

Correctness tests prove the numbers; these prove the PLAN: filters
reach the parquet scan, small dimensions broadcast, aggregates combine
map-side, hot paths stay inside whole-stage codegen, and the anti-join
probe carries keys only. A regression here means a query silently
degraded to a shape that won't survive scale-up, even though its
results still match.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_predicate_scan_pushes_filters(spark, sf_dir):
    df = QUERIES["predicate_scan"](spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    # at least one concrete pushed predicate, not an empty list
    assert "PushedFilters: []" not in plan


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    df = QUERIES["star_join_revenue"](spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan


def test_anti_join_is_single_left_anti(spark, sf_dir):
    df = QUERIES["anti_join_new_keys"](spark, sf_dir)
    plan = plan_of(df)
    assert "LeftAnti" in plan
    # the reference's shape was one probe query per row; ours is ONE join
    assert plan.count("LeftAnti") == 1


def test_groupby_agg_has_partial_and_final(spark, sf_dir):
    df = QUERIES["groupby_agg_pricing_summary"](spark, sf_dir)
    plan = plan_of(df)
    # partial (map-side combine) + final hash aggregate
    assert plan.count("HashAggregate") >= 2


def test_scalar_pipeline_stays_in_codegen(spark, sf_dir):
    df = QUERIES["text_quality_score"](spark, sf_dir)
    # "*(n) " prefixes mark whole-stage-codegen'd operators in toString()
    assert "*(1)" in plan_of(df)


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = QUERIES["groupby_agg_pricing_summary"](spark, sf_dir)
    plan = plan_of(df)
    # the pricing summary needs a handful of lineitem columns; the scan
    # must not read the full 11-column schema
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert m, plan
    assert len(m.group(1).split(",")) <= 8


def test_salted_join_spreads_key_space(spark, sf_dir):
    df = QUERIES["skew_salted_join_agg"](spark, sf_dir)
    opt = optimized_of(df)
    # the salt column must be part of the join keys in the logical plan
    assert "_salt" in opt


def test_range_join_is_hash_not_nested_loop(spark, sf_dir):
    df = QUERIES["range_join_error_windows"](spark, sf_dir)
    plan = plan_of(df)
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_corpus_curation_semi_join_and_partial_aggs(spark, sf_dir):
    df = QUERIES["corpus_curation"](spark, sf_dir)
    plan = plan_of(df)
    assert "LeftSemi" in plan               # survivors gate, not inner+distinct
    assert plan.count("HashAggregate") >= 2  # partial+final rollup


def test_tfidf_idf_join_broadcasts_vocabulary(spark, sf_dir):
    df = QUERIES["tfidf_top_terms"](spark, sf_dir)
    plan = plan_of(df)
    # small-vocab side broadcasts at this SF; window top-k present
    assert "BroadcastHashJoin" in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_stratified_sample_is_narrow_filter(spark, sf_dir):
    df = QUERIES["stratified_sample_langs"](spark, sf_dir)
    plan = plan_of(df)
    assert "Exchange" not in plan            # pure scan+filter, no shuffle
