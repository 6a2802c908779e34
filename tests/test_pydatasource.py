"""sources/pydatasource.py: the Spark 4 Python DataSource connector."""

from __future__ import annotations

import json
import os

import pytest

from sentiment_analysis_data_engineering_spark.sources.pydatasource import (
    JsonPayloadDataSource,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(JsonPayloadDataSource)
    return spark


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_reads_files_as_partitions(registered, tmp_path):
    _write(tmp_path / "a.jsonl", [{"k": 1, "v": 1.5}, {"k": 2, "v": 2.0}])
    _write(tmp_path / "b.json", [{"k": 3, "v": 0.25}])
    df = (
        registered.read.format("json_payload")
        .schema("k long, v double")
        .option("path", str(tmp_path))
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    assert sorted((r.k, r.v) for r in df.collect()) == [
        (1, 1.5), (2, 2.0), (3, 0.25),
    ]


def test_tolerant_reader_and_coercion(registered, tmp_path):
    # missing key -> NULL; extra key ignored; JSON int coerced to the
    # declared double; explicit null preserved; blank lines skipped
    _write(
        tmp_path / "a.jsonl",
        [
            {"k": 1, "v": 2, "junk": "x"},
            {"k": 2},
            {"k": 3, "v": None},
        ],
    )
    (tmp_path / "a.jsonl").write_text(
        (tmp_path / "a.jsonl").read_text() + "\n\n"
    )
    df = (
        registered.read.format("json_payload")
        .schema("k long, v double")
        .option("path", str(tmp_path))
        .load()
    )
    got = {r.k: r.v for r in df.collect()}
    assert got == {1: 2.0, 2: None, 3: None}
    assert dict(df.dtypes)["v"] == "double"


def test_requires_explicit_schema(registered, tmp_path):
    _write(tmp_path / "a.jsonl", [{"k": 1}])
    with pytest.raises(Exception, match="explicit .schema"):
        (
            registered.read.format("json_payload")
            .option("path", str(tmp_path))
            .load()
        )


def test_empty_dir_is_loud(registered, tmp_path):
    df = (
        registered.read.format("json_payload")
        .schema("k long")
        .option("path", str(tmp_path / "nothing"))
        .load()
    )
    with pytest.raises(Exception, match="no .*json"):
        df.collect()


def test_unsupported_column_type_rejected(registered, tmp_path):
    _write(tmp_path / "a.jsonl", [{"k": 1}])
    with pytest.raises(Exception, match="long/double/string/boolean"):
        (
            registered.read.format("json_payload")
            .schema("k array<long>")
            .option("path", str(tmp_path))
            .load()
        ).collect()


def test_streaming_picks_up_new_files(registered, tmp_path, spark):
    # micro-batch 1 sees the initial payload; a file dropped between
    # triggers arrives in a later batch — the append-only drop-zone
    # contract
    d = tmp_path / "drop"
    d.mkdir()
    _write(d / "0001.jsonl", [{"k": 1, "v": 1.0}, {"k": 2, "v": 2.0}])
    stream = (
        spark.readStream.format("json_payload")
        .schema("k long, v double")
        .option("path", str(d))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_payload_stream")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("SELECT count(*) n FROM t_payload_stream").first().n == 2:
                break
            time.sleep(0.5)
        _write(d / "0002.jsonl", [{"k": 3, "v": 0.5}])
        while time.time() < deadline:
            if spark.sql("SELECT count(*) n FROM t_payload_stream").first().n == 3:
                break
            time.sleep(0.5)
        got = sorted(
            (r.k, r.v)
            for r in spark.sql("SELECT * FROM t_payload_stream").collect()
        )
        assert got == [(1, 1.0), (2, 2.0), (3, 0.5)]
    finally:
        q.stop()


def test_streaming_checkpoint_restart_consumes_only_new_files(
    registered, tmp_path, spark
):
    # run 1 consumes the initial payload under a checkpoint; run 2 with
    # the SAME checkpoint must resume from the stored offset and emit
    # only the file dropped in between — no re-emission of run 1's rows
    d = tmp_path / "drop"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write(d / "0001.jsonl", [{"k": 1, "v": 1.0}, {"k": 2, "v": 2.0}])

    def run_once():
        # memory sink can't recover from a checkpoint; foreachBatch can
        rows = []
        stream = (
            spark.readStream.format("json_payload")
            .schema("k long, v double")
            .option("path", str(d))
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda batch_df, batch_id: rows.extend(batch_df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return rows

    first = run_once()
    assert sorted((r.k, r.v) for r in first) == [(1, 1.0), (2, 2.0)]
    _write(d / "0002.jsonl", [{"k": 3, "v": 0.5}])
    second = run_once()
    assert sorted((r.k, r.v) for r in second) == [(3, 0.5)]
