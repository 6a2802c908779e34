"""REST-shaped JSON ingestion (SURVEY.md §2.1 S3/S4, §2.2 P7).

The reference pulls JSON over HTTP and picks at it row-wise in Python
(``daily_dag.py:48-60``, ``weekly_dag.py:367-391``). The engine's
equivalent takes the payload *strings* (transport is out of engine
scope) and turns them into typed DataFrames with ``from_json`` +
``explode`` — one lazy plan, schema declared, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["scalar_json_lookup", "timeseries_json"]


def scalar_json_lookup(
    spark: SparkSession, payloads: dict[str, tuple[str, str]]
) -> DataFrame:
    """S3 — scalar JSON-path extraction from single-object payloads.

    ``payloads``: name -> (json_string, json_path). Returns one row per
    payload: (name, value double). The reference's
    ``json['data']['price']`` / ``json['rates']['SGD']``
    (``daily_dag.py:59-60``) becomes ``get_json_object``.
    """
    rows = [(name, payload, path) for name, (payload, path) in payloads.items()]
    df = spark.createDataFrame(rows, "name string, payload string, path string")
    # get_json_object needs a foldable path → one branch per DISTINCT
    # path (iterating payload entries would select every row sharing a
    # path once per sharer, duplicating output rows).
    out = None
    for path in dict.fromkeys(p for _, p in payloads.values()):
        part = df.filter(F.col("path") == path).select(
            "name",
            F.get_json_object(F.col("payload"), path).try_cast("double").alias("value"),
        )
        out = part if out is None else out.unionByName(part)
    return out


#: Alpha Vantage-shaped payload schema (``weekly_dag.py:367-391``).
TIMESERIES_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField(
            "data",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("date", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def timeseries_json(
    spark: SparkSession,
    payloads: list[str],
    *,
    value_type: str | dict[str, str] = "double",
) -> list[DataFrame]:
    """S4+P7 — unnest each time-series payload into a two-column frame
    ``(date string, value_<NAME> <type>)``, the exact input shape of the
    reference's 9-way join (``weekly_dag.py:382-394``).

    The explicit Python loop of the reference collapses to
    ``from_json`` + ``explode`` per payload — the array never touches
    the driver row-by-row.
    """
    out: list[DataFrame] = []
    for payload in payloads:
        df = (
            spark.createDataFrame([(payload,)], "payload string")
            .select(F.from_json("payload", TIMESERIES_SCHEMA).alias("p"))
            .select(F.col("p.name").alias("name"), F.explode("p.data").alias("e"))
        )
        # one collectable scalar: the indicator name (tiny, driver-side OK)
        name = df.select("name").first()["name"]
        vt = value_type.get(name, "double") if isinstance(value_type, dict) else value_type
        out.append(
            df.select(
                F.col("e.date").alias("date"),
                F.col("e.value").try_cast(vt).alias(f"value_{name}"),
            )
        )
    return out
