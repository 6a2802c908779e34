"""Incremental aggregate maintenance: keep a stored rollup current by
merging only the new data's partial aggregates — never recomputing
history.

Extension of the reference's incremental-warehouse pattern (SURVEY.md
§2.9): its pipelines append new FACT rows idempotently; a warehouse
also wants derived AGGREGATE tables (daily rollups, per-entity
totals) kept in step. The scalable recipe is the classic partial-agg
merge:

1. aggregate ONLY the incoming batch (tiny vs history);
2. restrict the stored rollup to the partitions the batch touches
   (partition pruning — history stays on disk);
3. combine the two with a re-aggregate — every supported measure is
   decomposable (sum/count/min/max merge by sum/sum/min/max; avg is
   carried as sum+count and finalized by the reader);
4. dynamic-partition-overwrite exactly the touched partitions.

Cost scales with |batch| + |touched partitions|, not |history| — the
same reason the reference's probe-then-append beats full reload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import replace_partition, scan_or_none

__all__ = ["merge_rollup", "distinct_sketch", "merged_distinct_estimate"]

#: measure name → (partial expr builder, merge expr builder)
_MERGES = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),  # counts combine by summing
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def merge_rollup(
    spark: SparkSession,
    new_rows: DataFrame,
    target: str,
    *,
    keys: list[str],
    partition_col: str,
    measures: dict[str, tuple[str, str]],
) -> None:
    """Merge ``new_rows`` into the stored rollup at ``target``.

    ``measures`` maps output column → (agg, input column), agg in
    {sum,count,min,max}; e.g. ``{"n_events": ("count", "*"),
    "total_value": ("sum", "value")}``. ``partition_col`` must be one
    of ``keys`` — it is the pruning and overwrite unit.
    """
    if partition_col not in keys:
        raise ValueError("partition_col must be one of keys")
    for name, (agg, _col) in measures.items():
        if agg not in _MERGES:
            raise ValueError(f"unsupported agg {agg!r} for {name!r}")

    def aggregate(df: DataFrame, merge: bool) -> DataFrame:
        exprs = []
        for name, (agg, col) in measures.items():
            partial, combine = _MERGES[agg]
            fn = combine if merge else partial
            exprs.append(fn(name if merge else col).alias(name))
        return df.groupBy(*keys).agg(*exprs)

    batch = aggregate(new_rows, merge=False)

    # First-run detection must be precise: ONLY "the rollup does not
    # exist yet" may fall through to merged=batch (scan_or_none
    # re-raises anything else — a swallowed transient read failure
    # would overwrite touched partitions with batch-only aggregates).
    existing = scan_or_none(spark, target)

    if existing is None:
        merged = batch
    else:
        # partition columns round-trip through directory names and come
        # back type-inferred (e.g. '2024-01-05' → DATE); align to the
        # incoming schema before the merge union
        batch_types = dict(batch.dtypes)
        existing = existing.select(
            *[F.col(c).cast(batch_types[c]) for c in batch.columns]
        )
        touched = batch.select(partition_col).distinct()
        # partition-pruned read of the stored rollup: only partitions
        # the batch touches participate in the merge
        current = existing.join(F.broadcast(touched), partition_col, "left_semi")
        merged = aggregate(
            current.select(*keys, *measures.keys()).unionByName(
                batch.select(*keys, *measures.keys())
            ),
            merge=True,
        )

    replace_partition(spark, merged, target, [partition_col])


def distinct_sketch(
    df: DataFrame, col: str, *, by: list[str] | None = None, lg_k: int = 12
) -> DataFrame:
    """Mergeable distinct-count sketch (Datasketches HLL via Spark's
    ``hll_sketch_agg``): one binary sketch per group — the persistable
    form of a distinct count. Store it next to each batch/partition;
    :func:`merged_distinct_estimate` unions sketches later WITHOUT
    touching the underlying rows. That turns "distinct users ever" —
    normally a full-history re-scan per refresh at 100 TB — into a
    merge over kilobyte sketches, the same maintenance shape as
    merge_rollup's partial aggregates.

    The sketch is deterministic for fixed input, so piecewise-built
    unions estimate EXACTLY what a whole-corpus sketch estimates
    (pytest-pinned), and estimates carry HLL's standard ~1.6%/sqrt(2^
    (lg_k-12)) relative error versus the true distinct count."""
    keys = [F.col(k) for k in (by or [])]
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("sketch")
    )


def merged_distinct_estimate(
    sketches: DataFrame, *, by: list[str] | None = None
) -> DataFrame:
    """Union previously-stored sketches (per group if ``by`` given) and
    return the distinct estimate — rows never re-read."""
    keys = [F.col(k) for k in (by or [])]
    return (
        sketches.groupBy(*keys)
        .agg(F.hll_union_agg("sketch").alias("_u"))
        .select(
            *(by or []),
            F.hll_sketch_estimate("_u").alias("n_distinct_est"),
        )
    )
