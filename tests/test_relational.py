"""Unit tests for operators.relational (SURVEY.md §2.2-2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sentiment_analysis_data_engineering_spark.operators.relational import (
    add_literal,
    anti_join_new_rows,
    conjunctive_filter,
    multiset_equal,
    n_way_inner_join,
    rename_columns,
    union_all,
)


def test_rename_and_literal(spark):
    df = spark.createDataFrame([(1, "a")], "x int, y string")
    out = add_literal(rename_columns(df, {"x": "id", "y": "name"}), "ticker", "D05.SI")
    assert out.columns == ["id", "name", "ticker"]
    assert out.first().ticker == "D05.SI"


def test_conjunctive_filter(spark):
    df = spark.createDataFrame(
        [(2023, 5, 1), (2023, 6, 1), (2022, 5, 9)], "year int, month int, day int"
    )
    assert conjunctive_filter(df, year=2023, month=5).count() == 1
    assert conjunctive_filter(df, year=2023).count() == 2


def test_union_all_by_name(spark):
    a = spark.createDataFrame([(1, "x")], "id int, v string")
    b = spark.createDataFrame([("y", 2)], "v string, id int")  # swapped order
    out = union_all([a, b])
    assert out.count() == 2
    assert {r.id for r in out.collect()} == {1, 2}


def test_n_way_inner_join(spark):
    dfs = [
        spark.createDataFrame([("2023-01", float(i))], f"date string, v{i} double")
        for i in range(9)
    ]
    wide = n_way_inner_join(dfs, on="date", broadcast_all_but_first=True)
    assert len(wide.columns) == 10  # date + 9 values
    assert wide.count() == 1


def test_anti_join_new_rows(spark):
    incoming = spark.createDataFrame(
        [(2023, 5, 1.0), (2023, 6, 2.0), (2023, 7, 3.0)], "year int, month int, v double"
    )
    existing = spark.createDataFrame(
        [(2023, 5, 99.0), (2023, 6, 98.0)], "year int, month int, v double"
    )
    out = anti_join_new_rows(incoming, existing, ["year", "month"])
    assert [(r.year, r.month) for r in out.collect()] == [(2023, 7)]


def test_multiset_equal(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (2, "y")], "id int, v string")
    b = spark.createDataFrame([(2, "y"), (1, "x"), (2, "y")], "id int, v string")
    c = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    assert multiset_equal(a, b)  # order-insensitive, duplicate-sensitive
    assert not multiset_equal(a, c)


def test_broadcast_join_is_planned(spark, sf_dir):
    """The star join must broadcast the small dimensions, not shuffle them."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
