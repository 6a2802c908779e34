"""Query registry backing the driver contract (__spark_entry__.py).

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable
plus (optionally) the ANSI-SQL oracle string DuckDB runs over the same
parquet tables. Registration happens at import time of the
``plans.parity_queries`` / ``plans.extension_queries`` modules.

Determinism rules enforced across the registry (SURVEY.md §5.2):
- every computed column is aliased identically in Spark and SQL;
- double aggregates are ``round``-ed in BOTH engines so summation-order
  differences (Spark partition order vs DuckDB hash order) vanish;
- no raw TIMESTAMP columns in outputs — formatted strings or integer
  date parts instead (session tz is UTC, oracle is tz-naive);
- DuckDB ``sum(BIGINT)`` returns INT128 — always ``CAST(... AS BIGINT)``
  in the oracle to match Spark's long.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (the driver then records a weaker rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Read driver fixture parquet tables (TESTDATA.md).

    ``events.parquet`` has shipped in two encodings across driver
    rounds: TIMESTAMP(NANOS) (which Spark's parquet reader rejects
    unless the legacy nanosAsLong escape hatch is on, yielding a
    bigint of epoch-nanos) and plain ``timestamp[us]`` (read natively
    as TIMESTAMP_NTZ). We flip the conf — a no-op for the micros
    encoding — then rebuild a microsecond timestamp only when the read
    dtype is the nanos long. Either way the result matches DuckDB's
    TIMESTAMP view of the same file bit-for-bit (sub-microsecond
    digits in the nanos fixture are all zero).
    """
    # Self-defend against a non-UTC caller session: the DuckDB oracle is
    # tz-naive, so timestamp-derived year/month must be computed in UTC.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: list[DataFrame] = []
    for n in names:
        if n == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            from pyspark.sql import functions as F

            df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
            ts_type = dict(df.dtypes).get("ts")
            if ts_type == "bigint":
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif ts_type == "timestamp_ntz":
                # canonical engine type for event time is TIMESTAMP
                # (downstream uses unix_micros etc., which reject NTZ);
                # under the UTC session this cast is value-preserving
                # and matches DuckDB's naive reading of the same file
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        else:
            df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        out.append(df)
    return out
