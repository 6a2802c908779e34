"""Catalog / DDL surface (SURVEY.md §2.1 S7-S8).

The reference creates one BigQuery dataset + table per pipeline with
``BigQueryCreateEmptyDatasetOperator`` / ``BigQueryCreateEmptyTableOperator``
(``daily_dag.py:119-151``, ``weekly_dag.py:500-608``). Here the same
surface is Spark SQL DDL over parquet tables partitioned on
(year, month), which upgrades the reference's ubiquitous
``WHERE year= AND month=`` probes to partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .schemas import WAREHOUSE_SCHEMAS

__all__ = [
    "create_database",
    "create_table",
    "create_warehouse",
    "register_parquet_views",
]

#: Driver fixture tables (TESTDATA.md) registerable as views.
TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def create_database(spark: SparkSession, name: str) -> None:
    """S7 — idempotent namespace creation."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def _ddl_of(schema: T.StructType) -> str:
    return ", ".join(
        f"{f.name} {f.dataType.simpleString().upper()}"
        + ("" if f.nullable else " NOT NULL")
        for f in schema.fields
    )


def create_table(
    spark: SparkSession,
    name: str,
    schema: T.StructType,
    partition_by: list[str] | None = None,
    location: str | None = None,
) -> None:
    """S8 — create an empty managed/external parquet table with a fixed
    schema and REQUIRED→NOT NULL modes, mirroring the reference's DDL."""
    parts = f" PARTITIONED BY ({', '.join(partition_by)})" if partition_by else ""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({_ddl_of(schema)}) "
        f"USING parquet{parts}{loc}"
    )


def create_warehouse(spark: SparkSession, database: str = "warehouse") -> None:
    """Create the full 8-table reference star schema (§1.1)."""
    create_database(spark, database)
    for table, (schema, part_cols) in WAREHOUSE_SCHEMAS.items():
        create_table(spark, f"{database}.{table}", schema, part_cols)


def register_parquet_views(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Register the driver's parquet fixtures as temp views so both the
    DataFrame API and ``spark.sql`` can reach them by name."""
    out: dict[str, DataFrame] = {}
    for t in tables or TESTDATA_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.createOrReplaceTempView(t)
        out[t] = df
    return out
