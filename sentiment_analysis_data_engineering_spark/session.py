"""SparkSession factory.

Single place where engine-level Spark configuration lives, so every
entry point (tests, bench, driver contract) runs with the same stance:

- **AQE on** — runtime coalescing of shuffle partitions, skew-join
  splitting and dynamic broadcast decisions. At 100 TB this is what
  turns a statically mis-sized shuffle into a usable plan.
- **Dynamic partition overwrite** — the reference's delete+insert
  upsert (``weekly_dag.py:131-147``) becomes an atomic-per-partition
  ``INSERT OVERWRITE`` of only the touched (year, month) partitions.
- **UTC session timezone** — Spark timestamps are session-tz; the
  DuckDB oracle is UTC-naive. Pinning UTC makes them agree.
- **Arrow on** — every pandas_udf / mapInPandas / toPandas crossing
  is Arrow-batched, never per-row pickled.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_SHUFFLE_PARTITIONS"]

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "sentiment_analysis_data_engineering_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster, ``master`` comes from spark-submit and the
    shuffle-partition count should be sized to ~2-3x total cores (or
    left to AQE's initial value); locally we default to ``local[N]``
    with N from ``$SPARK_GRAFT_CPUS``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Adaptive execution: coalesce small shuffle partitions, split skewed
        # ones, and convert to broadcast joins at runtime.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Replace only the partitions present in the incoming frame on
        # INSERT OVERWRITE — the engine's replace_partition writer relies
        # on this (sources/io.py).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Deterministic timestamp semantics vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for all pandas interchange (pandas_udf, mapInPandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The events fixture stores TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read as long and convert (plans.registry).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def recommend_shuffle_partitions(
    input_bytes: int,
    *,
    total_cores: int = 32,
    target_partition_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Shuffle-partition count for a given input size — the sizing rule
    the 100 TB stance calls for, as code instead of folklore.

    Two constraints, take the max:
    - **memory fit**: input_bytes / target (default 128 MiB, the same
      default as spark.sql.files.maxPartitionBytes) so one shuffle
      partition's build side fits comfortably in an executor's task
      memory without spilling;
    - **parallelism floor**: 2x total cores so every core gets work
      even with stragglers.

    At 100 TB and 128 MiB targets this says ~800k partitions — far
    above the 200 default that would OOM, and the reason AQE coalesce
    (enabled in get_spark) is the complement: overshoot statically,
    let AQE merge at runtime. Round to the next power of two so
    repeated runs with similar inputs reuse the same partitioning.
    """
    by_size = -(-input_bytes // target_partition_bytes)
    floor = 2 * total_cores
    n = max(by_size, floor, 1)
    p = 1
    while p < n:
        p <<= 1
    return p
