"""Incremental rollup maintenance == full recompute, at batch cost."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiment_analysis_data_engineering_spark.operators.incremental import merge_rollup
from sentiment_analysis_data_engineering_spark.plans.registry import load_tables

MEASURES = {
    "n_events": ("count", "*"),
    "total_value": ("sum", "value"),
    "max_value": ("max", "value"),
}


def daily(events):
    return events.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
        "value",
    )


def test_two_batches_equal_full_recompute(spark, sf_dir, tmp_path):
    (events,) = load_tables(spark, sf_dir, "events")
    rows = daily(events)
    target = str(tmp_path / "rollup")

    # split by event id parity → two incremental loads
    (e,) = load_tables(spark, sf_dir, "events")
    b1 = daily(e.filter(F.col("event_id") % 2 == 0))
    b2 = daily(e.filter(F.col("event_id") % 2 == 1))
    merge_rollup(spark, b1, target, keys=["day", "event_type"],
                 partition_col="day", measures=MEASURES)
    merge_rollup(spark, b2, target, keys=["day", "event_type"],
                 partition_col="day", measures=MEASURES)

    got = {
        (r.day, r.event_type): (r.n_events, round(r.total_value, 2), r.max_value)
        for r in spark.read.parquet(target)
        .withColumn("day", F.col("day").cast("string")).collect()
    }
    full = rows.groupBy("day", "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"),
        F.max("value").alias("m"),
    )
    want = {(r.day, r.event_type): (r.n, r.v, r.m) for r in full.collect()}
    assert {k: (a, round(b, 2), c) for k, (a, b, c) in got.items()} == want


def test_untouched_partitions_survive(spark, sf_dir, tmp_path):
    (events,) = load_tables(spark, sf_dir, "events")
    target = str(tmp_path / "rollup2")
    merge_rollup(spark, daily(events), target, keys=["day", "event_type"],
                 partition_col="day", measures=MEASURES)
    before = spark.read.parquet(target).count()

    # a batch touching ONE day must leave all other partitions intact
    one_day = daily(events).filter(F.col("day") == "2024-01-05")
    merge_rollup(spark, one_day, target, keys=["day", "event_type"],
                 partition_col="day", measures=MEASURES)
    after = spark.read.parquet(target).withColumn(
        "day", F.col("day").cast("string")
    )
    assert after.count() == before
    # and the touched day doubled its counts (same rows merged again)
    n = after.filter(F.col("day") == "2024-01-05").agg(
        F.sum("n_events")
    ).collect()[0][0]
    n0 = daily(events).filter(F.col("day") == "2024-01-05").count()
    assert n == 2 * n0


def test_unreadable_target_raises_not_overwrites(spark, sf_dir, tmp_path):
    """A target that EXISTS but fails to read must raise — silently
    treating it as 'no rollup yet' would overwrite touched partitions
    with batch-only aggregates and drop history."""
    import pytest

    (events,) = load_tables(spark, sf_dir, "events")
    target = tmp_path / "corrupt_rollup"
    target.mkdir()
    (target / "part-00000.parquet").write_bytes(b"this is not parquet")

    with pytest.raises(Exception) as exc_info:
        merge_rollup(spark, daily(events), str(target),
                     keys=["day", "event_type"], partition_col="day",
                     measures=MEASURES)
    # and the garbage file was not clobbered by a fresh write
    assert (target / "part-00000.parquet").read_bytes() == b"this is not parquet"


def test_distinct_sketch_piecewise_union_equals_whole(spark, sf_dir):
    from pyspark.sql import functions as F

    from sentiment_analysis_data_engineering_spark.operators.incremental import (
        distinct_sketch,
        merged_distinct_estimate,
    )
    from sentiment_analysis_data_engineering_spark.plans.registry import load_tables

    (events,) = load_tables(spark, sf_dir, "events")
    whole = merged_distinct_estimate(
        distinct_sketch(events, "user_id")
    ).first().n_distinct_est
    pieces = distinct_sketch(
        events.filter(F.col("event_id") % 3 == 0), "user_id"
    ).unionByName(
        distinct_sketch(events.filter(F.col("event_id") % 3 == 1), "user_id")
    ).unionByName(
        distinct_sketch(events.filter(F.col("event_id") % 3 == 2), "user_id")
    )
    merged = merged_distinct_estimate(pieces).first().n_distinct_est
    assert merged == whole  # deterministic sketch: piecewise == whole
    exact = events.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < 0.05  # HLL error bound honored


def test_distinct_sketch_grouped(spark, sf_dir):
    from sentiment_analysis_data_engineering_spark.operators.incremental import (
        distinct_sketch,
        merged_distinct_estimate,
    )
    from sentiment_analysis_data_engineering_spark.plans.registry import load_tables

    (events,) = load_tables(spark, sf_dir, "events")
    per_type = merged_distinct_estimate(
        distinct_sketch(events, "user_id", by=["event_type"]),
        by=["event_type"],
    )
    got = {r.event_type: r.n_distinct_est for r in per_type.collect()}
    assert set(got) == {"click", "view", "signup", "purchase", "error"}
    assert all(v > 0 for v in got.values())
