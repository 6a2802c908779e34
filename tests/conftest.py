from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, "/root/repo")

from sentiment_analysis_data_engineering_spark.session import get_spark  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"
TMP = Path("/root/repo/.tmp/tests")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4)
    yield s


@pytest.fixture()
def tmp_table_dir():
    TMP.mkdir(parents=True, exist_ok=True)
    yield TMP
    shutil.rmtree(TMP, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF0001
