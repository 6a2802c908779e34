"""Deterministic hash-based sampling — the reproducible sampling idiom
for large training-data pipelines.

Extension layer (no reference counterpart). ``df.sample``/``sampleBy``
draw from per-partition RNG streams, so their output changes with
partitioning, task retries, and cluster size — unacceptable for a
pipeline that must be re-runnable bit-for-bit over 100 TB. Hash
sampling instead keys the keep/drop decision on a salted hash of a
stable id: partition-independent, retry-safe, join-stable (the same id
is sampled identically everywhere), and trivially auditable in any
engine that has md5.

The hash is the first 8 hex chars of md5(salt || id) taken mod 10^4 —
i.e. a uniform draw over 10,000 buckets; a row is kept when its bucket
falls below fraction × 10,000. Changing the salt produces a fresh
independent sample (the salt is the "seed").
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "hash_sample",
    "stratified_hash_sample",
    "mixture_weighted_sample",
]

_BUCKETS = 10_000


def hash_bucket(id_col: Column | str, salt: str = "") -> Column:
    """Uniform bucket in [0, 10000) from a salted md5 of the id.
    JVM-side only (md5 + substring + base-16 conv) — whole-stage
    codegen, no RNG state, no Python."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hexpart = F.substring(
        F.md5(F.concat(F.lit(salt), c.cast("string")).cast("binary")), 1, 8
    )
    return F.conv(hexpart, 16, 10).cast("long") % _BUCKETS


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, *, salt: str = ""
) -> DataFrame:
    """Keep ~fraction of rows, deterministically by id hash. A pure
    narrow filter: pushes to the scan, no shuffle, no RNG."""
    thr = int(round(fraction * _BUCKETS))
    return df.filter(hash_bucket(id_col, salt) < F.lit(thr))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: Mapping[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its
    own keep-fraction (e.g. downsample dominant languages, keep all of
    rare ones). Strata not listed fall back to ``default_fraction``.
    Still a narrow filter — the threshold is a CASE over the stratum
    column, so no shuffle and no per-stratum passes."""
    thr: Column = F.lit(int(round(default_fraction * _BUCKETS)))
    col = F.col(stratum_col)
    for value, frac in sorted(fractions.items()):
        thr = F.when(col == value, F.lit(int(round(frac * _BUCKETS)))).otherwise(thr)
    return df.filter(hash_bucket(id_col, salt) < thr)


def mixture_weighted_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    weights: Mapping[str, float],
    *,
    target_fraction: float,
    default_weight: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Resample a corpus toward a target source MIXTURE — the standard
    pretraining data-mixing step (e.g. The Pile / LLaMA mixture tables:
    "web 60%, books 20%, code 20%" — public methodology).

    Given per-stratum weights w_s and a target size of
    ``target_fraction × N`` rows, the classic solver sets each
    stratum's keep-fraction to

        f_s = min(1, w_s · target_fraction · N / n_s)

    (strata too small to fill their quota are kept whole — capped at 1;
    weights are used as given and need not sum to 1). The solve happens
    IN-PLAN: per-stratum counts are one tiny aggregate (a column-pruned
    scan), the unpartitioned window that totals them runs over
    #strata rows, and the resulting thresholds broadcast back into the
    corpus scan — so the big side stays a narrow filter, no collect, no
    RNG, and the same ``hash_bucket`` determinism as every sampler
    here: partition-, retry-, and cluster-layout-independent.
    """
    w: Column = F.lit(float(default_weight))
    scol = F.col(stratum_col)
    for value, wt in sorted(weights.items()):
        w = F.when(scol == value, F.lit(float(wt))).otherwise(w)
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    # NB: "_N" would silently REPLACE "_n" — Spark resolves column
    # names case-insensitively by default.
    counts = counts.withColumn("_tot", F.sum("_n").over(Window.partitionBy()))
    thresholds = counts.select(
        stratum_col,
        F.round(
            F.least(
                F.lit(1.0),
                w * F.lit(float(target_fraction)) * F.col("_tot") / F.col("_n"),
            )
            * _BUCKETS,
            0,
        )
        .cast("long")
        .alias("_thr"),
    )
    return (
        df.join(F.broadcast(thresholds), stratum_col)
        .filter(hash_bucket(id_col, salt) < F.col("_thr"))
        .drop("_thr")
    )
