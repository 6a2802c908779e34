"""Unit tests for as-of and range joins (operators/temporal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _ts(s):
    return f"2024-01-01 {s}"


def _events(spark, rows):
    df = spark.createDataFrame(rows, "id long, user long, ts string")
    return df.select("id", "user", F.col("ts").cast("timestamp").alias("ts"))


def test_as_of_join_backward_inclusive(spark):
    from sentiment_analysis_data_engineering_spark.operators.temporal import as_of_join

    left = _events(spark, [
        (1, 1, _ts("10:00:00")),
        (2, 1, _ts("10:30:00")),
        (3, 1, _ts("09:00:00")),   # before any right row
        (4, 2, _ts("10:00:00")),   # other user
    ])
    right = _events(spark, [
        (100, 1, _ts("09:30:00")),
        (101, 1, _ts("10:30:00")),  # equal-ts: must match (inclusive)
        (102, 2, _ts("09:59:59")),
    ]).select("user", "ts")

    out = as_of_join(left, right, ts="ts", by=["user"], right_value_cols=[])
    got = {r.id: (r.matched["_rts"].strftime("%H:%M:%S") if r.matched else None)
           for r in out.collect()}
    assert got == {1: "09:30:00", 2: "10:30:00", 3: None, 4: "09:59:59"}


def test_as_of_join_tolerance(spark):
    from sentiment_analysis_data_engineering_spark.operators.temporal import as_of_join

    left = _events(spark, [(1, 1, _ts("10:00:00"))])
    right = _events(spark, [(100, 1, _ts("08:00:00"))]).select("user", "ts")
    out = as_of_join(
        left, right, ts="ts", by=["user"], right_value_cols=[],
        tolerance_seconds=3600,
    ).first()
    assert out.matched is None  # 2h gap exceeds 1h tolerance


def test_range_join_buckets_matches_inequality_join(spark, sf_dir):
    """Bucketized range join ≡ plain inequality join on real data."""
    from sentiment_analysis_data_engineering_spark.operators.temporal import (
        range_join_buckets,
    )
    from sentiment_analysis_data_engineering_spark.plans.registry import load_tables

    (events,) = load_tables(spark, sf_dir, "events")
    windows = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("window_id"),
            "user_id",
            F.col("ts").alias("win_start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("win_end"),
        )
    )
    bucketed = range_join_buckets(
        events.select("user_id", "ts"), windows,
        by=["user_id"], event_ts="ts",
        win_start="win_start", win_end="win_end", bucket_seconds=700,
    ).select("window_id", "ts")
    plain = (
        events.select("user_id", "ts").alias("e")
        .join(windows.alias("w"), (F.col("e.user_id") == F.col("w.user_id"))
              & (F.col("e.ts") >= F.col("w.win_start"))
              & (F.col("e.ts") <= F.col("w.win_end")))
        .select("window_id", "e.ts")
    )
    assert bucketed.exceptAll(plain).isEmpty()
    assert plain.exceptAll(bucketed).isEmpty()


def test_asof_join_forward_direction(spark):
    from datetime import datetime

    from pyspark.sql import functions as F
    from sentiment_analysis_data_engineering_spark.operators.temporal import as_of_join

    t = lambda m: datetime(2024, 1, 1, 10, m, 0)
    left = spark.createDataFrame(
        [(1, t(10)), (1, t(30)), (2, t(5))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t(10), "exact"), (1, t(25), "later"), (2, t(0), "before")],
        "k long, ts timestamp, tag string",
    )
    out = as_of_join(
        left, right, ts="ts", by=["k"], right_value_cols=["tag"],
        direction="forward",
    )
    got = {(r.k, r.ts.minute): (r.matched.tag if r.matched else None)
           for r in out.collect()}
    assert got[(1, 10)] == "exact"    # inclusive at equal ts
    assert got[(1, 30)] is None       # nothing after 10:30
    assert got[(2, 5)] is None        # right row is before, not after
