"""One-pass table profiling: per-column null / distinct / range /
central-moment statistics as a long-format frame.

The data-engineering "what is in this table" primitive (the reference
eyeballs frames ad hoc after each load, daily_dag.py:117's printout
culture; warehouse engines expose it as ``ANALYZE``/``SUMMARIZE``). A
profile is the input to schema drift alarms, ingest QA gates, and CBO
statistics — so it must cost ONE scan regardless of how many columns
and metrics are requested, and its output must be engine-portable.

Portability design: every metric value is emitted as a STRING with an
explicit cross-engine formatting rule — integers via plain cast,
doubles via ``printf('%.6f')`` (NOT a bare double→string cast: Spark
renders 1e7 as ``1.0E7`` where DuckDB renders ``10000000.0`` — printf
is pinned C semantics in both), timestamps via an explicit pattern.
min/max/count metrics are exact values, never summation-ordered, so
the string forms are bit-stable; ``mean``/``avg_len`` carry the usual
round-to-6dp cross-engine convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"


def _fmt_double(c: Column) -> Column:
    return F.format_string("%.6f", c.cast("double"))


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in ONE scan —
    (col_name, metric, value string), plus a single ('_table',
    'n_rows') row.

    Per-column metrics: ``n_null``, ``n_distinct`` always; ``min``,
    ``max``, ``mean`` for numeric columns; ``min``, ``max``,
    ``avg_len`` for strings; ``min``, ``max`` (formatted
    ``yyyy-MM-dd HH:mm:ss``) for date/timestamp columns.

    Scale shape: every metric is an aggregate expression in a single
    ``agg`` — one parquet scan, map-side partial aggregation, a 1-row
    result that is then exploded into the long format (the explode is
    driver-free: 1 row × |metrics|). ``exact_distinct=True`` uses
    ``count(DISTINCT col)`` — Spark compiles N distinct aggregates
    into one scan with an Expand (rows replicated N ways into the
    aggregate), exact but shuffle ∝ N·rows; at 100 TB set
    ``exact_distinct=False`` for ``approx_count_distinct`` (HLL±5%,
    no Expand, pure map-side) — the same trade the
    exact/approx-distinct query pair documents.
    """
    dtypes = dict(df.dtypes)
    if columns is None:
        columns = [c for c, _ in df.dtypes]
    unknown = [c for c in columns if c not in dtypes]
    if unknown:
        raise ValueError(f"columns not in frame: {unknown}")

    n_rows = F.count(F.lit(1))
    n_distinct = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c))
    )

    # (col_name, metric, aggregate-expression) triples — all stringly
    specs: list[tuple[str, str, Column]] = [
        ("_table", "n_rows", n_rows.cast("string")),
    ]
    for c in columns:
        t = dtypes[c]
        specs.append((c, "n_null", (n_rows - F.count(c)).cast("string")))
        specs.append((c, "n_distinct", n_distinct(c).cast("string")))
        if t in _NUMERIC:
            is_float = t in ("float", "double")
            conv = _fmt_double if is_float else (lambda x: x.cast("string"))
            specs.append((c, "min", conv(F.min(c))))
            specs.append((c, "max", conv(F.max(c))))
            specs.append((c, "mean", _fmt_double(F.round(F.avg(c), 6))))
        elif t == "string":
            specs.append((c, "min", F.min(c)))
            specs.append((c, "max", F.max(c)))
            specs.append(
                (c, "avg_len", _fmt_double(F.round(F.avg(F.length(c)), 6)))
            )
        elif t in ("date", "timestamp", "timestamp_ntz"):
            specs.append((c, "min", F.date_format(F.min(c), _TS_FMT_SPARK)))
            specs.append((c, "max", F.date_format(F.max(c), _TS_FMT_SPARK)))
        # other types (arrays, maps, binary): null/distinct only

    one = df.agg(
        *[expr.alias(f"_m{i}") for i, (_, _, expr) in enumerate(specs)]
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(col).alias("col_name"),
                    F.lit(metric).alias("metric"),
                    F.col(f"_m{i}").alias("value"),
                )
                for i, (col, metric, _) in enumerate(specs)
            ]
        )
    ).alias("_r")
    return one.select(rows).select("_r.col_name", "_r.metric", "_r.value")
