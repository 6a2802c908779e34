"""Graph analytics queries: fixed-point PageRank over the part
co-purchase graph.

The oracle is EXACT with zero rounding tolerance: the operator's
fixed-point integer arithmetic (operators/graph.py) makes every
iteration bit-identical across engines, so the DuckDB replica chains
the same integer recurrences through plain CTEs.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load_tables, query

_PR_ITERS = 3
_SCALE = 10**12


def _pagerank_oracle() -> str:
    prev = "r0"
    iters = []
    for i in range(1, _PR_ITERS + 1):
        iters.append(f"""
    r{i} AS (
      SELECT d.node,
             (3 * {_SCALE}) // (20 * (SELECT n FROM nn))
             + CAST((17 * coalesce(sum(c.contrib), 0)) // 20 AS BIGINT) AS r
      FROM deg d LEFT JOIN (
        SELECT e.t AS node, p.r // dg.dg AS contrib
        FROM edges e
        JOIN {prev} p ON p.node = e.s
        JOIN deg dg ON dg.node = e.s
      ) c ON c.node = d.node
      GROUP BY d.node
    )""")
        prev = f"r{i}"
    return f"""
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS t
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
      SELECT s, t FROM pairs UNION ALL SELECT t AS s, s AS t FROM pairs
    ),
    deg AS (SELECT s AS node, count(*) AS dg FROM edges GROUP BY s),
    nn AS (SELECT count(*) AS n FROM deg),
    r0 AS (
      SELECT node, {_SCALE} // (SELECT n FROM nn) AS r FROM deg
    ),{",".join(iters)}
    SELECT node AS p_partkey, r AS pr_fixed FROM {prev}
    """


@query("pagerank_copurchase_parts", oracle=_pagerank_oracle())
def pagerank_copurchase_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph: parts are linked when
    they appear in the same order (distinct undirected pairs, both
    directions materialized), then {_PR_ITERS} fixed-point PageRank
    iterations (damping 17/20) rank parts by co-purchase centrality —
    the "representative item" signal a recommender or curation stage
    reads.

    The graph build is a per-order self-equi-join: fan-out is bounded
    by (items-per-order choose 2) — a data-model constant, ~20 pairs
    per order — never corpus-pairs. The undirected edge list means no
    dangling nodes, satisfying the operator's contract. Ranks are
    EXACT integers (×10¹²): the oracle replays the identical integer
    recurrence, no rounding tolerance anywhere (see operators/graph.py
    on why floating PageRank can never be checked this way)."""
    from ..operators.graph import pagerank_fixed_point

    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    li = lineitem.select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("s"), F.col("b.l_partkey").alias("t")
        )
        .distinct()
    )
    edges = pairs.unionByName(
        pairs.select(F.col("t").alias("s"), F.col("s").alias("t"))
    )
    ranks = pagerank_fixed_point(
        edges, src="s", dst="t",
        damping=Fraction(17, 20), iterations=_PR_ITERS,
        assume_symmetric=True,  # undirected edge list by construction
    )
    return ranks.select(F.col("node").alias("p_partkey"), "pr_fixed")
