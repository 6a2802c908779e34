"""Every registered query vs its DuckDB oracle at sf0.001.

Mirrors the driver's correctness gate (row count + columns +
order-insensitive values); the driver runs the same comparison at
sf0.01 — tools/check_oracle.py runs it there locally.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracle import TABLES, compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if name not in ORACLES:
        # rows-only contract: runs, stable schema, non-negative rows
        assert spark_pdf is not None
        assert len(sdf.columns) > 0
        return
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"nation", "year", "revenue", "n_lineitems"}
