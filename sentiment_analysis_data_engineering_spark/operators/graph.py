"""Iterative graph analytics: PageRank over an edge DataFrame.

Extension layer (the dedup family's min-label connected components,
operators/dedup.py, is the other graph op in the engine). PageRank is
the canonical "influence on a similarity/co-occurrence graph" score a
curation pipeline uses to pick representative documents or rank
entities.

Determinism design — the interesting part: floating-point PageRank is
NOT reproducible across engines (or even across partition layouts):
each iteration sums contributions in nondeterministic order, and after
k iterations the accumulated wobble approaches the rounding bucket of
any fixed output precision. So ranks here are **fixed-point integers**
(rank × 10^12 as long) and every step is exact integer arithmetic:

- init        r0 = SCALE div N
- teleport    (1-d)·SCALE = (dnum_c · SCALE) div dden  with d = dnum/dden
- contrib     r div out_degree          (integer division)
- combine     teleport + (dnum · Σcontrib) div dden

Integer division truncates a sub-1e-12 remainder per operation — the
price of bit-identical results on ANY engine, cluster layout, or rerun
(and what lets a DuckDB oracle verify the Spark loop EXACTLY, no
rounding tolerance at all). Overflow headroom: ranks ≤ SCALE=1e12,
damping numerator ≤ 100 → products ≤ 1e14 « 2^63.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = ["pagerank_fixed_point", "personalized_pagerank_fixed_point", "PR_SCALE"]

PR_SCALE = 10**12


def pagerank_fixed_point(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: Fraction = Fraction(17, 20),
    iterations: int = 3,
    assume_symmetric: bool = False,
) -> DataFrame:
    """Fixed-point PageRank; returns (node long, pr_fixed long) where
    ``pr_fixed`` is the rank scaled by :data:`PR_SCALE`.

    Contract: every node reachable via ``dst`` must also appear as a
    ``src`` (no dangling nodes) — symmetric/undirected edge lists
    satisfy this by construction. ``damping`` is a Fraction so the
    teleport and damping steps stay in exact integer arithmetic.

    ``weight`` names an optional POSITIVE INTEGER edge-weight column
    (e.g. co-purchase counts): each edge then carries
    ``(rank · w) div Σw_out`` instead of ``rank div out_degree`` —
    still exact integer arithmetic, so the determinism guarantee is
    unchanged. Integer weights are a contract, not a limitation:
    scale fractional weights by a fixed factor upstream (headroom:
    rank·w ≤ 10¹²·w must stay below 2⁶³, so w < ~9·10⁶).

    Scale shape: the edge list is annotated with its out-degree totals
    in a SINGLE shuffle (a full-partition window sum keyed on src — one
    exchange + sort, versus the groupBy-then-join formulation's two
    exchanges and two cache materializations; a super-node's edges land
    in one task either way, so the skew profile is unchanged) and that
    one frame is persisted and reused every iteration; each iteration
    is one equi-join (edges ⋈ ranks on src — both sides
    hash-partitioned on the same key) plus one map-side-combining sum
    keyed on dst, then a left join
    back to the node set so in-degree-0 nodes keep their teleport mass.
    ``assume_symmetric=True`` (correct for any undirected edge list)
    skips that per-iteration left join — a symmetric graph has no
    in-degree-0 nodes, so the contribution aggregate already covers
    every node. Per-iteration shuffle volume ∝ edges, never
    pairs-of-pairs; the rank frame is O(nodes). The node count rides
    the plan as a 1-row broadcast aggregate (no driver action), so the
    whole fixed-iteration recurrence compiles into ONE job. The final
    frame is localCheckpoint-ed so the persisted edge frame can be
    released eagerly.
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    dnum, dden = damping.numerator, damping.denominator
    if not 0 <= dnum <= dden <= 100:
        raise ValueError(f"damping must be in [0, 1] with denominator <= 100, got {damping}")

    # ONE persisted frame: the (possibly expensive) upstream edge
    # derivation runs exactly once, into the persist, and the window
    # sum annotates out-degree totals in the same shuffle — the node
    # set and node count are then cheap aggregates over the cached
    # frame instead of consumers of a second pinned copy.
    wcol = (
        F.col(weight).cast("long") if weight is not None else F.lit(1).cast("long")
    )
    edges_deg = (
        edges.select(
            F.col(src).alias("_s"), F.col(dst).alias("_t"), wcol.alias("_w")
        )
        .withColumn("_dg", F.sum("_w").over(W.partitionBy("_s")))
        .persist()
    )
    try:
        # node count as a 1-row broadcast frame — stays in-plan, exact
        # integer arithmetic throughout (empty graph => empty output;
        # the DIV-by-zero branch is never evaluated on zero rows)
        nodes = edges_deg.select(F.col("_s").alias("node")).distinct()
        n1 = nodes.agg(F.count("*").alias("_n"))
        new_rank = (
            F.expr(f"(({dden - dnum}) * {PR_SCALE}) DIV ({dden} * _n)")
            + F.expr(f"({dnum} * coalesce(_sum, 0L)) DIV {dden}")
        ).cast("long")

        ranks = nodes.crossJoin(F.broadcast(n1)).select(
            "node", F.expr(f"{PR_SCALE} DIV _n").cast("long").alias("pr_fixed")
        )
        for _ in range(iterations):
            contribs = (
                edges_deg.join(
                    ranks, edges_deg["_s"] == ranks["node"]
                )
                .select(
                    F.col("_t").alias("node"),
                    F.expr("(pr_fixed * _w) DIV _dg").alias("_c"),
                )
                .groupBy("node")
                .agg(F.sum("_c").alias("_sum"))
            )
            if assume_symmetric:
                base = contribs
            else:
                base = nodes.join(contribs, "node", "left")
            ranks = base.crossJoin(F.broadcast(n1)).select(
                "node", new_rank.alias("pr_fixed")
            )
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        edges_deg.unpersist()
    return ranks


def personalized_pagerank_fixed_point(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: Fraction = Fraction(17, 20),
    iterations: int = 3,
) -> DataFrame:
    """Personalized (seed-biased) PageRank: the teleport mass lands
    ONLY on the seed nodes — the "similar to these items" random walk
    recommenders and graph-expansion curation use. Same fixed-point
    integer arithmetic as :func:`pagerank_fixed_point`, so results are
    bit-identical across engines and layouts.

    ``seeds`` is a one-column DataFrame of node ids (its column name is
    irrelevant; the first column is used). Seeds absent from the graph
    are ignored; if NO seed is present the walk has no mass source and
    every rank is 0 — callers wanting a loud failure should validate
    seed membership upfront. Initial mass and teleport
    are split evenly over the |S| seeds: r0 = SCALE div |S| on seeds,
    0 elsewhere; each iteration adds ((1-d)·SCALE) div (d_den·|S|) to
    seeds only. Non-seed nodes accumulate mass purely through walks,
    so ranks decay with graph distance from the seed set.

    Scale shape mirrors the global variant — per iteration one src
    equi-join + one dst-keyed sum; the seed frame is aggregate-counted
    in-plan and joined as a (node, is_seed) marker, broadcastable when
    small (the typical case: a handful of query items).
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    dnum, dden = damping.numerator, damping.denominator
    if not 0 <= dnum <= dden <= 100:
        raise ValueError(
            f"damping must be in [0, 1] with denominator <= 100, got {damping}"
        )

    wcol = (
        F.col(weight).cast("long") if weight is not None else F.lit(1).cast("long")
    )
    edges_deg = (
        edges.select(
            F.col(src).alias("_s"), F.col(dst).alias("_t"), wcol.alias("_w")
        )
        .withColumn("_dg", F.sum("_w").over(W.partitionBy("_s")))
        .persist()
    )
    try:
        seed_nodes = (
            seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
        )
        ns = seed_nodes.agg(F.count("*").alias("_ns"))
        nodes = edges_deg.select(F.col("_s").alias("node")).distinct()
        marked = nodes.join(
            seed_nodes.withColumn("_seed", F.lit(True)), "node", "left"
        ).select("node", F.coalesce(F.col("_seed"), F.lit(False)).alias("_seed"))

        ranks = marked.crossJoin(F.broadcast(ns)).select(
            "node",
            F.when(
                F.col("_seed"), F.expr(f"{PR_SCALE} DIV _ns")
            ).otherwise(F.lit(0)).cast("long").alias("pr_fixed"),
        )
        teleport = F.when(
            F.col("_seed"),
            F.expr(f"(({dden - dnum}) * {PR_SCALE}) DIV ({dden} * _ns)"),
        ).otherwise(F.lit(0))
        for _ in range(iterations):
            contribs = (
                edges_deg.join(ranks, edges_deg["_s"] == ranks["node"])
                .select(
                    F.col("_t").alias("node"),
                    F.expr("(pr_fixed * _w) DIV _dg").alias("_c"),
                )
                .groupBy("node")
                .agg(F.sum("_c").alias("_sum"))
            )
            ranks = (
                marked.join(contribs, "node", "left")
                .crossJoin(F.broadcast(ns))
                .select(
                    "node",
                    (
                        teleport
                        + F.expr(f"({dnum} * coalesce(_sum, 0L)) DIV {dden}")
                    ).cast("long").alias("pr_fixed"),
                )
            )
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        edges_deg.unpersist()
    return ranks
