"""Law tests for the statistical-analytics family (plans/stats_queries).

The DuckDB-equality oracle (test_queries_oracle.py) already pins every
output value at sf0.001; these tests pin the MATHEMATICAL laws the
numbers must satisfy regardless of data — the properties a refactor
could silently break while still matching a refactored oracle.
"""

from __future__ import annotations

import math

import pytest

from sentiment_analysis_data_engineering_spark.plans import stats_queries as sq


@pytest.fixture(scope="module")
def rows(spark, sf_dir):
    """Materialize each query once for the module."""

    def run(name):
        return [r.asDict() for r in getattr(sq, name)(spark, sf_dir).collect()]

    return run


def test_markov_rows_are_distributions(rows):
    out = rows("markov_event_transitions")
    assert out, "no transitions at sf0.001?"
    by_prev: dict[str, float] = {}
    for r in out:
        assert r["n"] >= 1
        assert 0.0 < r["prob"] <= 1.0
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["prob"]
    for prev, total in by_prev.items():
        # probs are rounded to 6dp per row; sum must still hit 1
        assert abs(total - 1.0) < 1e-4, (prev, total)


def test_rfm_scores_bounded_and_conserving(rows, spark, sf_dir):
    out = rows("rfm_customer_segments")
    assert out
    for r in out:
        assert 1 <= r["r_q"] <= 4 and 1 <= r["f_q"] <= 4 and 1 <= r["m_q"] <= 4
        assert r["n_customers"] >= 1
    total = sum(r["n_customers"] for r in out)
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert total == n_cust  # every ordering customer lands in one cell


def test_market_basket_pair_laws(rows):
    out = rows("market_basket_part_pairs")
    for r in out:
        assert r["part_a"] < r["part_b"]  # canonical orientation
        assert r["support"] >= sq._MB_MIN_PAIR
        assert r["lift"] > 0


def test_chi_square_shape(rows):
    (r,) = rows("chi_square_segment_priority")
    assert r["chi2"] >= 0.0
    # 5 segments x 5 priorities in the TPC-H-ish fixtures
    assert r["dof"] == 16
    assert r["n"] > 0


def test_zipf_slope_negative_and_fit(rows):
    (r,) = rows("zipf_token_rank_slope")
    assert r["n_terms"] > 0
    assert r["slope"] < 0  # frequency falls with rank, by construction
    assert 0.0 <= r["r2"] <= 1.0


def test_dow_index_weighted_mean_is_one(rows):
    out = rows("dow_seasonality_index")
    assert 1 <= len(out) <= 7
    for r in out:
        assert 1 <= r["iso_weekday"] <= 7
        assert r["seasonality_idx"] > 0
    # avg over days of (per-dow avg) weighted by day counts = global avg
    w = sum(r["n_days"] * r["seasonality_idx"] for r in out)
    n = sum(r["n_days"] for r in out)
    assert abs(w / n - 1.0) < 1e-3


def test_top_session_paths_shape(rows):
    out = rows("top_session_paths")
    assert 0 < len(out) <= sq._PATH_TOP
    counts = [r["n_sessions"] for r in out]
    assert counts == sorted(counts, reverse=True)  # ranked output
    for r in out:
        assert 1 <= len(r["path"].split(">")) <= sq._PATH_LEN


def test_gap_stats_ordering(rows):
    out = rows("customer_order_gap_stats")
    assert out
    for r in out:
        assert r["n_gaps"] > 0
        assert 0 <= r["avg_gap_days"] <= r["max_gap_days"]
        assert 0 <= r["med_gap_days"] <= r["max_gap_days"]


def test_mad_outliers_bounded(rows):
    out = rows("mad_outlier_prices")
    assert out
    for r in out:
        assert r["mad_price"] >= 0
        assert 0 <= r["n_outliers"] < r["n_orders"]
        # 3xMAD outliers are a minority by construction of the median
        assert r["n_outliers"] <= r["n_orders"] / 2


def test_regr_identities(rows, spark, sf_dir):
    out = rows("regr_price_quantity")
    assert out
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    for r in out:
        g = li[li.l_returnflag == r["l_returnflag"]]
        assert r["n"] == len(g)
        # slope/intercept reproduce the numpy least-squares fit
        x, y = g.l_quantity.to_numpy(), g.l_extendedprice.to_numpy()
        xm, ym = x.mean(), y.mean()
        slope = ((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum()
        assert math.isclose(r["slope"], slope, rel_tol=1e-3)
        assert math.isclose(
            r["intercept"], ym - slope * xm, rel_tol=1e-3, abs_tol=1e-2
        )
        assert 0.0 <= r["r2"] <= 1.0


def test_seasonal_anomalies_are_tail_events(rows, spark, sf_dir):
    out = rows("seasonal_adjusted_anomalies")
    n_days = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderdate")
        .distinct()
        .count()
    )
    # |z| > 2 flags the tails: a small fraction of days, never most
    assert len(out) < n_days * 0.2
    for r in out:
        assert abs(r["z"]) > 2.0
        assert r["idx_adj"] > 0
