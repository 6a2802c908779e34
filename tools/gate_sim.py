"""Simulate the driver's correctness gate under DRIVER conditions.

The engine's own sweeps (tools/check_oracle.py) run inside the tuned
session (sentiment_analysis_data_engineering_spark.session.get_spark: 32 shuffle
partitions, AQE knobs, UTC). The driver does not: it builds a VANILLA
SparkSession — default 200 shuffle partitions, default configs — and
runs the FIRST 50 entries of ``queries()``. A query that silently
depends on an engine-session config passes every engine-side sweep and
still fails the gate; this tool exists to catch exactly that class
(standing round checklist item — one config-dependent regression was
caught this way in round 5).

Usage:
    python tools/gate_sim.py [sf_dir] [n_prefix]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(1, "/root/repo/tools")
# Python WORKERS must import the package too (pandas UDF closures are
# pickled by reference); the driver harness runs from /root/repo so
# cwd covers it there — pin PYTHONPATH so this tool is
# launch-directory-independent.
os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + os.environ.get(
    "PYTHONPATH", ""
)

from check_oracle import TABLES, compare  # noqa: E402


def main() -> int:
    from pyspark.sql import SparkSession

    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_prefix = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    # VANILLA session: master only — no shuffle-partition tuning, no
    # AQE overrides, no timezone pin. Mirrors the driver harness.
    # GATE_SIM_DRIVER_MEM optionally raises the heap WITHOUT touching
    # any SQL config: at the gated sf0.01 the default (1g) suffices,
    # but full-registry sweeps at sf0.1 exhaust a 1g local-mode heap
    # (driver + all 32 executor threads share it) around query ~135 —
    # an environment limit, not a query property; SQL-config
    # independence is the axis this tool tests.
    builder = SparkSession.builder.master("local[32]").appName("gate-sim")
    mem = os.environ.get("GATE_SIM_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    prefix = list(qs)[:n_prefix]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    from sentiment_analysis_data_engineering_spark.operators.dedup import release_pinned

    ok = fail = rows_only = 0
    for name in prefix:
        t0 = time.time()
        try:
            try:
                spark_pdf = qs[name](spark, sf_dir).toPandas()
            finally:
                release_pinned()
            sql = oracles.get(name)
            if sql is None:
                rows_only += 1
                print(f"rows  {name}: {len(spark_pdf)} rows (no oracle)")
                continue
            duck_pdf = con.execute(sql).fetchdf()
            problems = compare(name, spark_pdf, duck_pdf)
        except Exception as exc:  # noqa: BLE001 — report and continue
            problems = [f"exception: {exc!r}"]
        dt = time.time() - t0
        if problems:
            fail += 1
            print(f"FAIL  {name} [{dt:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            ok += 1
            print(f"ok    {name} [{dt:.1f}s]", flush=True)
    print(f"\n{ok} ok, {fail} fail, {rows_only} rows-only of {len(prefix)}")
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
