"""Sketch-backed queries: exact heavy hitters via Misra-Gries
candidate pruning, and Bloom-filter join pruning.

Both sketches are WORK-pruning devices, never answer-changing ones, so
each query's DuckDB oracle is the plain exact formulation — the gate
verifies that the sketch path returns the bit-identical answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load_tables, query

# --------------------------------------------------------------------------
# Heavy hitters (operators/sketches.py::heavy_hitters_exact)
# --------------------------------------------------------------------------

_HH_K = 99  # threshold fraction 1/(k+1) = 1/100 of the stream


@query(
    "heavy_hitter_users",
    oracle=f"""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows
    FROM events
    GROUP BY user_id
    HAVING count(*) > (SELECT count(*) FROM events) / {_HH_K + 1}.0
    """,
)
def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users contributing more than 1/{_HH_K + 1} of all events, with
    exact counts — computed by the two-pass Misra-Gries pattern
    (operators/sketches.py::heavy_hitters_exact) instead of a full
    group-by over the key cardinality.

    Why this matters at 100 TB: a naive group-by(user) shuffles EVERY
    distinct user; the MG pass reduces the candidate set to
    ≤ k × partitions keys (cluster-bounded), the recount shuffles only
    candidate-matching rows, and the exact threshold filter makes the
    result identical to the naive plan — which is exactly what the
    DuckDB oracle checks."""
    from ..operators.sketches import heavy_hitters_exact

    (events,) = load_tables(spark, sf_dir, "events")
    return heavy_hitters_exact(events, "user_id", k=_HH_K)


# --------------------------------------------------------------------------
# Bloom-pruned star join (operators/sketches.py::bloom_build/bloom_prune)
# --------------------------------------------------------------------------


@query(
    "bloom_pruned_order_revenue",
    oracle="""
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'AUTOMOBILE'
    GROUP BY c.c_nationkey
    """,
)
def bloom_pruned_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation for AUTOMOBILE-segment customers, with the
    fact side Bloom-pruned before the join: a filter built over the
    selected customer keys drops non-matching orders at scan time, so
    the join's shuffle moves only (matches + ~0.24% false positives),
    and the exact equi-join removes the FPs — the oracle is the plain
    join, verifying prune→join ≡ join.

    At 100 TB this is the classic "selective dim prunes huge fact"
    play when the dim is too big to broadcast outright but its KEY SET
    compresses into a few MB of bitmap; the build is a bounded driver
    OR-merge (bytes ∝ m_bits × build_partitions, not rows). Spark's
    AQE runtime bloom join does this implicitly when stats align; the
    explicit operator makes it deterministic and reusable."""
    from ..operators.sketches import bloom_build, bloom_prune

    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    dim = customer.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        "c_custkey", "c_nationkey"
    )
    bloom = bloom_build(dim, "c_custkey")
    pruned = bloom_prune(
        orders.select("o_custkey", "o_totalprice"), "o_custkey", bloom
    )
    return (
        pruned.join(dim, pruned["o_custkey"] == dim["c_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
