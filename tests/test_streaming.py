"""Structured Streaming: windowed aggs + dedup driven to completion
with Trigger.AvailableNow, cross-checked against the batch plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sentiment_analysis_data_engineering_spark.plans.registry import load_tables
from sentiment_analysis_data_engineering_spark.streaming import events as st


@pytest.fixture(scope="module")
def events_dir(sf_dir):
    return f"{sf_dir}/events.parquet"


def test_tumbling_window_matches_batch(spark, sf_dir, events_dir):
    stream = st.read_events_stream(spark, events_dir)
    out = st.run_available_now(
        st.tumbling_window_agg(stream), "t_tumble", output_mode="complete"
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in out.collect()
    }
    (events,) = load_tables(spark, sf_dir, "events")
    batch = (
        events.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd HH:mm:ss").alias("d"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    want = {(r.d, r.event_type): (r.n, r.v) for r in batch.collect()}
    assert got == want


def test_sliding_window_counts(spark, events_dir):
    stream = st.read_events_stream(spark, events_dir)
    out = st.run_available_now(
        st.sliding_window_agg(stream, window="2 hours", slide="1 hour"),
        "t_slide",
        output_mode="complete",
    )
    rows = out.collect()
    assert len(rows) > 0
    # every event lands in exactly window/slide = 2 sliding windows
    total = sum(r.n_events for r in rows)
    n_events = out.sparkSession.read.parquet(events_dir.replace("/events.parquet", "") + "/events.parquet").count()
    assert total == 2 * n_events


def test_session_window_agg(spark, sf_dir, events_dir):
    stream = st.read_events_stream(spark, events_dir)
    out = st.run_available_now(
        st.session_window_agg(stream, gap="30 minutes"), "t_sess",
        output_mode="complete",
    )
    rows = out.collect()
    assert len(rows) > 0
    # session event counts must sum to the total event count
    (events,) = load_tables(spark, sf_dir, "events")
    assert sum(r.n_events for r in rows) == events.count()
    # and per-user session counts must match the batch sessionizer
    import __spark_entry__ as entrymod

    batch = {
        r.user_id: r.n_sessions
        for r in entrymod.queries()["sessionize_events"](spark, sf_dir).collect()
    }
    got = {}
    for r in rows:
        got[r.user_id] = got.get(r.user_id, 0) + 1
    assert got == batch


def test_idempotent_append_stream_survives_replay(spark, sf_dir, events_dir, tmp_path):
    target = str(tmp_path / "events_sink")
    n_events = spark.read.parquet(events_dir).count()

    # two runs with SEPARATE checkpoints: the second replays the whole
    # input (worst-case at-least-once) — the anti-join sink must not
    # duplicate a single row
    for i in range(2):
        stream = st.read_events_stream(spark, events_dir)
        st.run_idempotent_append_stream(
            stream.select("event_id", "ts", "user_id", "event_type", "value"),
            target,
            ["event_id"],
            checkpoint=str(tmp_path / f"ckpt{i}"),
        )
    assert spark.read.parquet(target).count() == n_events


def test_stateful_running_totals_match_batch(spark, sf_dir, events_dir):
    from sentiment_analysis_data_engineering_spark.streaming import stateful

    stream = st.read_events_stream(spark, events_dir)
    out = st.run_available_now(
        stateful.running_user_stats(stream), "t_stateful", output_mode="update"
    )
    # the memory sink keeps every update; the LAST row per user is the
    # final running total — must equal the batch aggregate
    import pandas as pd

    pdf = out.toPandas()
    final = pdf.groupby("user_id").tail(1).set_index("user_id")
    (events,) = load_tables(spark, sf_dir, "events")
    batch = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    for uid, row in batch.iterrows():
        assert final.loc[uid, "n_events"] == row["n"]
        assert abs(final.loc[uid, "total_value"] - row["v"]) < 1e-3


def test_stream_dedup_drops_duplicate_ids(spark, events_dir):
    stream = st.read_events_stream(spark, events_dir)
    # duplicate the stream by unioning it with itself: same event_ids twice
    doubled = stream.union(stream)
    out = st.run_available_now(
        st.stream_dedup(doubled), "t_dedup", output_mode="append"
    )
    n_unique = spark.read.parquet(events_dir).count()
    assert out.count() == n_unique


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_dir):
    stream = st.read_events_stream(spark, events_dir)
    out = st.run_available_now(
        st.error_click_interval_join(stream), "t_ssjoin", output_mode="append"
    )
    got = {(r.error_id, r.click_id) for r in out.collect()}

    (events,) = load_tables(spark, sf_dir, "events")
    errs = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("u"), F.col("ts").alias("e_ts"),
        F.col("event_id").alias("error_id"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    batch = errs.join(
        clicks,
        (errs.u == clicks.u)
        & (F.col("c_ts") >= F.col("e_ts"))
        & (F.col("c_ts") <= F.col("e_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    want = {(r.error_id, r.click_id) for r in batch.collect()}
    assert got  # non-degenerate
    assert got == want


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): batch 1 advances the
    watermark past the 10:00 window; batch 2 carries a LATE 10:05 row,
    which must be dropped from the already-closed window."""
    import glob
    import os
    import shutil
    from datetime import datetime

    from pyspark.sql import types as T
    from sentiment_analysis_data_engineering_spark.streaming.events import (
        tumbling_window_agg,
    )

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    indir = tmp_path / "in"
    indir.mkdir()

    def emit(name, rows, mtime):
        stage = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        part = glob.glob(str(stage / "part-*.parquet"))[0]
        dst = indir / name
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))

    t = lambda h, m: datetime(2024, 1, 1, h, m, 0)
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(indir))
        agg = tumbling_window_agg(stream, window="1 hour", watermark="10 minutes")
        rows = []

        def sink(batch_df, batch_id):
            rows.extend(batch_df.collect())

        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r.window_start: r.n_events for r in rows}

    # run 1: two in the 10:00 window, one at 12:00 → watermark 11:50,
    # 10:00 window closes and emits with 2
    emit("a.parquet", [(1, t(10, 10), "click", 1.0),
                       (2, t(10, 40), "click", 1.0),
                       (3, t(12, 0), "click", 1.0)], 1_700_000_000)
    first = run_once()
    assert first.get("2024-01-01 10:00:00") == 2

    # run 2 (same checkpoint → watermark persisted): a LATE 10:05 row
    # must be dropped; the closed window must NOT re-emit or grow
    emit("b.parquet", [(4, t(10, 5), "click", 1.0),
                       (5, t(12, 30), "click", 1.0)], 1_700_000_100)
    second = run_once()
    assert second.get("2024-01-01 10:00:00", 0) in (0, 2)  # never 3
    total_10 = first.get("2024-01-01 10:00:00", 0) + second.get(
        "2024-01-01 10:00:00", 0
    )
    assert total_10 == 2  # the late row contributed nowhere


def test_checkpointed_restart_exactly_once_across_crash(spark, tmp_path):
    """Simulated crash BETWEEN micro-batches: run 1 commits one batch
    then dies; run 2 resumes from the SAME checkpoint. The combination
    of checkpoint offsets + anti-join sink must deliver exactly-once:
    every source row lands in the target exactly one time."""
    import pytest
    from pyspark.sql import functions as F
    from sentiment_analysis_data_engineering_spark.sources.io import idempotent_append

    # 4 source files → 4 micro-batches at maxFilesPerTrigger=1
    src = str(tmp_path / "src")
    rows = spark.range(40).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).alias("user_id")
    )
    rows.repartition(4).write.parquet(src)

    target = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    seen_batches: list[int] = []

    def crashing_batch(batch_df, batch_id):
        if len(seen_batches) == 1:
            raise RuntimeError("injected crash between micro-batches")
        seen_batches.append(batch_id)
        idempotent_append(batch_df.sparkSession, batch_df, target, ["event_id"])

    def start(batch_fn):
        stream = (
            spark.readStream.schema("event_id long, user_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(Exception, match="injected crash"):
        start(crashing_batch)
    committed = spark.read.parquet(target).count()
    assert 0 < committed < 40  # partial progress really happened

    def clean_batch(batch_df, batch_id):
        idempotent_append(batch_df.sparkSession, batch_df, target, ["event_id"])

    start(clean_batch)  # resume from the same checkpoint
    got = spark.read.parquet(target)
    assert got.count() == 40
    assert got.select("event_id").distinct().count() == 40


def test_merge_upsert_stream_updates_and_inserts_across_restart(spark, tmp_path):
    """Streaming MERGE sink: run 1 seeds the table from a first source
    batch; run 2 (same checkpoint) merges a second batch that UPDATES
    half the keys and INSERTS new ones. Final table must equal the
    batch-merge of the two generations: every key once, updated rows
    superseding seeds."""
    from pyspark.sql import functions as F

    from sentiment_analysis_data_engineering_spark.streaming.events import run_merge_upsert_stream

    src = str(tmp_path / "src")
    target = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, part long, val string"

    def start():
        stream = spark.readStream.schema(schema).parquet(src)
        run_merge_upsert_stream(
            stream, target, ["k"], partition_by=["part"], checkpoint=ckpt
        )

    # generation 1: keys 0-9
    spark.createDataFrame(
        [(i, i % 2, f"v1-{i}") for i in range(10)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    start()
    assert spark.read.parquet(target).count() == 10

    # generation 2 (new file, resumed checkpoint): update 0-4, insert 10-12
    spark.createDataFrame(
        [(i, i % 2, f"v2-{i}") for i in range(5)]
        + [(i, i % 2, f"v2-{i}") for i in range(10, 13)],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    start()

    got = {r.k: r.val for r in spark.read.parquet(target).collect()}
    assert len(got) == 13  # every key exactly once
    assert all(got[i] == f"v2-{i}" for i in range(5))          # updated
    assert all(got[i] == f"v1-{i}" for i in range(5, 10))      # untouched
    assert all(got[i] == f"v2-{i}" for i in range(10, 13))     # inserted


def test_streaming_ewma_matches_batch(spark, sf_dir, events_dir):
    from sentiment_analysis_data_engineering_spark.operators.temporal import ewma_last
    from sentiment_analysis_data_engineering_spark.streaming import stateful

    stream = st.read_events_stream(spark, events_dir)
    out = st.run_available_now(
        stateful.streaming_ewma(stream, alpha=0.3), "t_sewma", output_mode="update"
    )
    pdf = out.toPandas()
    final = pdf.groupby("user_id").tail(1).set_index("user_id")

    (events,) = load_tables(spark, sf_dir, "events")
    batch = ewma_last(
        events, key_col="user_id", ts_col="ts", value_col="value",
        tiebreak_col="event_id", alpha=0.3,
    ).toPandas().set_index("user_id")

    assert len(final) == len(batch)
    for uid, row in batch.iterrows():
        assert final.loc[uid, "n_events"] == row["n_events"]
        assert abs(final.loc[uid, "ewma"] - row["ewma"]) < 1e-9


def test_quarantine_stream_splits_and_keeps_everything(spark, events_dir, tmp_path):
    stream = st.read_events_stream(spark, events_dir)
    target = str(tmp_path / "q_sink")
    st.run_quarantine_stream(
        stream,
        target,
        {"value_under_100": F.col("value") < 100.0},
        checkpoint=str(tmp_path / "q_ckpt"),
    )
    back = spark.read.parquet(target)
    n_total = spark.read.parquet(events_dir).count()
    assert back.count() == n_total  # nothing dropped
    n_bad_expected = (
        spark.read.parquet(events_dir).filter(~(F.col("value") < 100.0)).count()
    )
    n_bad = back.filter(F.col("_quarantined") == "true").count()
    assert n_bad == n_bad_expected and n_bad > 0


def test_scd2_stream_versions_replay_and_collapse(spark, tmp_path):
    """Streaming SCD2 sink: gen-1 seeds the history; gen-2 carries a
    value change, an identical re-delivery, a brand-new key, AND two
    updates for one key in the same micro-batch (must collapse to the
    latest by order_col). A full replay from a fresh checkpoint must
    leave the history unchanged (batch-id-derived timestamps)."""
    from sentiment_analysis_data_engineering_spark.streaming.events import run_scd2_stream

    src = str(tmp_path / "src")
    hist = str(tmp_path / "hist")
    schema = "k long, seg string, bal long, seq long"

    def start(ckpt):
        stream = spark.readStream.schema(schema).parquet(src)
        run_scd2_stream(
            stream, hist, ["k"], ["seg", "bal"],
            order_col="seq", checkpoint=str(tmp_path / ckpt),
        )

    # generation 1: three keys seed the history
    spark.createDataFrame(
        [(1, "A", 100, 1), (2, "B", 200, 1), (3, "C", 300, 1)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    start("ckpt")
    h1 = {(r.k, r.valid_from): r for r in spark.read.parquet(hist).collect()}
    assert len(h1) == 3 and all(r.is_current for r in h1.values())

    # generation 2: key1 changes twice in-batch (seq 2 then 3 wins),
    # key2 re-delivered identically (no-op), key4 is new
    spark.createDataFrame(
        [(1, "A", 150, 2), (1, "A", 175, 3), (2, "B", 200, 2), (4, "D", 400, 2)],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    start("ckpt")
    rows = spark.read.parquet(hist).collect()
    byk = {(r.k, r.is_current): r for r in rows}
    # k1 closed seed + k1 open + k2 open + k3 open + k4 open
    assert len(rows) == 5
    # key 1: closed seed + open v175 (the in-batch intermediate 150 is
    # never recorded)
    assert byk[(1, False)].bal == 100 and byk[(1, False)].valid_to is not None
    assert byk[(1, True)].bal == 175
    # key 2: single untouched open version
    assert byk[(2, True)].bal == 200
    assert (2, False) not in byk
    # key 4: new open version
    assert byk[(4, True)].bal == 400

    # full replay, fresh checkpoint: batch-ids regenerate identically, so
    # every apply is a no-op — history must be byte-identical
    before = sorted(map(tuple, rows))
    start("ckpt_replay")
    after = sorted(map(tuple, spark.read.parquet(hist).collect()))
    assert after == before


def test_stream_static_enrichment_matches_batch(spark, sf_dir, events_dir, tmp_path):
    """Stream-static broadcast enrichment must produce exactly the rows
    of the equivalent batch join, and reject join types that are
    ill-defined against an unbounded stream."""
    import pytest as _pytest

    from sentiment_analysis_data_engineering_spark.streaming.events import enrich_stream_with_dim

    # dimension: user_id -> tier (derived deterministically; some users
    # are deliberately absent so the LEFT semantics are exercised)
    (events,) = load_tables(spark, sf_dir, "events")
    dim = (
        events.select("user_id").distinct()
        .filter(F.col("user_id") % 3 != 0)  # 1/3 of users missing
        .withColumn("tier", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd"))
    )
    stream = st.read_events_stream(spark, events_dir)
    enriched = enrich_stream_with_dim(
        stream.select("event_id", "user_id"), dim, ["user_id"]
    )
    got = st.run_available_now(enriched, "t_enrich").toPandas()

    batch = (
        events.select("event_id", "user_id")
        .join(F.broadcast(dim), ["user_id"], "left")
        .toPandas()
    )
    assert len(got) == len(batch)
    got_s = got.sort_values("event_id").reset_index(drop=True)
    batch_s = batch[got.columns].sort_values("event_id").reset_index(drop=True)
    assert got_s.equals(batch_s)
    # absent dimension keys must still stream through (left semantics)
    assert got["tier"].isna().any()

    with _pytest.raises(ValueError, match="inner/left"):
        enrich_stream_with_dim(stream, dim, ["user_id"], how="full")


def test_streaming_cms_maintenance_matches_batch_and_replays(
    spark, sf_dir, events_dir, tmp_path
):
    from sentiment_analysis_data_engineering_spark.operators.sketches import cms_build

    target = str(tmp_path / "cms_store")

    stream = st.read_events_stream(spark, events_dir)
    st.run_cms_maintenance_stream(
        stream, "user_id", target,
        checkpoint=str(tmp_path / "ckpt1"), depth=3, width=256,
    )
    merged = {
        (r.row_i, r.cell): r.cnt
        for r in st.read_cms_sketch(spark, target).collect()
    }

    (events,) = load_tables(spark, sf_dir, "events")
    whole = {
        (r.row_i, r.cell): r.cnt
        for r in cms_build(events, "user_id", depth=3, width=256).collect()
    }
    assert merged == whole  # streamed partials merge to the one-shot sketch

    # Replay: a fresh checkpoint re-delivers every batch with the same
    # batch ids; partition replacement must leave the store unchanged.
    stream2 = st.read_events_stream(spark, events_dir)
    st.run_cms_maintenance_stream(
        stream2, "user_id", target,
        checkpoint=str(tmp_path / "ckpt2"), depth=3, width=256,
    )
    replayed = {
        (r.row_i, r.cell): r.cnt
        for r in st.read_cms_sketch(spark, target).collect()
    }
    assert replayed == whole


def test_streaming_zscore_matches_batch_query(spark, sf_dir, events_dir):
    from sentiment_analysis_data_engineering_spark.streaming import stateful

    stream = st.read_events_stream(spark, events_dir)
    out = st.run_available_now(
        stateful.streaming_zscore(stream), "t_szscore", output_mode="append"
    ).toPandas()
    got = {
        (r.user_id, r.event_id): (r.value, r.zscore)
        for r in out.itertuples()
    }

    from sentiment_analysis_data_engineering_spark.plans import behavior_queries

    batch = behavior_queries.rolling_zscore_anomalies(spark, sf_dir).toPandas()
    want = {
        (r.user_id, r.event_id): (r.value, r.zscore)
        for r in batch.itertuples()
    }
    assert got.keys() == want.keys() and want
    for k in want:
        assert abs(got[k][0] - want[k][0]) < 1e-9
        assert abs(got[k][1] - want[k][1]) < 1e-9


def test_streaming_zscore_null_values_match_batch_semantics(spark, tmp_path):
    """Null values count toward the warm-up ROW count (like the batch
    count(*)) but are skipped by the moments (like Spark avg/stddev)."""
    import datetime as dt

    from pyspark.sql import Window
    from sentiment_analysis_data_engineering_spark.streaming import stateful

    base = dt.datetime(2024, 1, 1)
    rows = []
    vals = [10.0, None, 10.2, 9.9, None, 10.1, 9.8, 10.0, 10.2, 9.9,
            10.1, 10.0, 50.0]  # the 50 is the anomaly
    for i, v in enumerate(vals):
        rows.append((i + 1, base + dt.timedelta(minutes=i), 7, "view", v, "{}"))
    pdir = str(tmp_path / "nullev")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string"
    ).coalesce(1).write.parquet(pdir)

    stream = st.read_events_stream(spark, pdir)
    out = st.run_available_now(
        stateful.streaming_zscore(stream, min_obs=10), "t_sznull",
        output_mode="append",
    ).toPandas()
    got = {(r.user_id, r.event_id): r.zscore for r in out.itertuples()}

    batch = spark.read.parquet(pdir)
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    z = F.round((F.col("value") - F.avg("value").over(w))
                / F.stddev_samp("value").over(w), 4)
    want_df = (
        batch.select(
            "user_id", "event_id",
            F.count("*").over(w).alias("n_prev"), z.alias("z"),
            F.stddev_samp("value").over(w).alias("sd"),
        )
        .filter((F.col("n_prev") >= 10) & (F.col("sd") > 0)
                & (F.abs(F.col("z")) > 2.5))
    )
    want = {(r.user_id, r.event_id): r.z for r in want_df.collect()}
    assert got.keys() == want.keys() and want  # anomaly found both ways
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_ohlc_stream_matches_batch_query(spark, sf_dir, events_dir):
    from sentiment_analysis_data_engineering_spark.plans.behavior_queries import (
        daily_ohlc_bars,
    )

    stream = st.read_events_stream(spark, events_dir)
    out = st.run_available_now(
        st.ohlc_window_agg(stream), "t_ohlc", output_mode="complete"
    )
    got = {
        (r.day, r.user_id): (r.open, r.high, r.low, r.close, r.n_events)
        for r in out.collect()
    }
    batch = daily_ohlc_bars(spark, sf_dir)
    want = {
        (r.day, r.user_id): (r.open, r.high, r.low, r.close, r.n_events)
        for r in batch.collect()
    }
    assert got == want


def test_transform_with_state_matches_groupstate_api(spark, sf_dir, events_dir):
    # the Spark 4 StatefulProcessor surface must produce the SAME final
    # running totals as the applyInPandasWithState twin and the batch agg
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state protocol rides protobuf, "
        "absent in this container (present on standard cluster images)",
    )
    from sentiment_analysis_data_engineering_spark.streaming import stateful

    stream = st.read_events_stream(spark, events_dir)
    out = st.run_available_now(
        stateful.running_user_stats_tws(stream),
        "t_stateful_tws",
        output_mode="update",
    )
    pdf = out.toPandas()
    final = pdf.groupby("user_id").tail(1).set_index("user_id")
    (events,) = load_tables(spark, sf_dir, "events")
    batch = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    for uid, row in batch.iterrows():
        assert final.loc[uid, "n_events"] == row["n"]
        assert abs(final.loc[uid, "total_value"] - row["v"]) < 1e-3


def test_streaming_transitions_match_batch(spark, sf_dir, events_dir, tmp_path):
    """Per-user transition increments with the last event type carried
    across micro-batch boundaries: events split into 3 time-ordered
    files, streamed one file per micro-batch, summed increments must
    equal the batch lag-window transition counts — including the pairs
    that STRADDLE a batch boundary (the whole point of the state)."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pyspark.sql import Window as W
    from sentiment_analysis_data_engineering_spark.streaming import stateful

    t = pq.read_table(events_dir)
    idx = pc.sort_indices(
        t, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
    )
    t = t.take(idx)
    src = str(tmp_path / "src")
    os.makedirs(src)
    n = t.num_rows
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        path = f"{src}/{i}.parquet"
        pq.write_table(t.slice(cuts[i], cuts[i + 1] - cuts[i]), path)
        os.utime(path, (1_000_000_000 + i, 1_000_000_000 + i))

    stream = st.read_events_stream(spark, src, max_files_per_trigger=1)
    out = st.run_available_now(
        stateful.streaming_transitions(stream), "t_trans", output_mode="append"
    )
    pdf = out.toPandas()
    got = (
        pdf.groupby(["prev_type", "event_type"])["n"].sum().to_dict()
    )

    (events,) = load_tables(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    want = {
        (r.prev_type, r.event_type): r.n
        for r in seq.groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    # the split genuinely exercised the boundary: some user emitted
    # increments in more than one micro-batch run
    per_user_rows = pdf.groupby("user_id").size()
    assert (per_user_rows > 1).any()


def test_streaming_ivfpq_merge_matches_batch_and_replays(spark, sf_dir, tmp_path):
    from sentiment_analysis_data_engineering_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "idx")
    sim.ivfpq_write_index(base, path)

    # land the delta as two files -> two micro-batches under
    # maxFilesPerTrigger=1, so the merge crosses a batch boundary
    stream_dir = str(tmp_path / "landing")
    delta.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(
        stream_dir, mode="append"
    )
    delta.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(
        stream_dir, mode="append"
    )
    schema = emb.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    stats = st.run_ivfpq_merge_stream(
        stream, path, checkpoint=str(tmp_path / "ckpt1")
    )
    assert len(stats) == 2
    assert sum(s["n_added"] for s in stats) == delta.count()
    assert all(s["n_already"] == 0 for s in stats)

    # streamed merges == the batch merge: index complete, ids unique
    codes = spark.read.parquet(f"{path}/codes")
    agg = codes.agg(
        F.count("*").alias("n"), F.countDistinct("neighbor_id").alias("nd")
    ).first()
    assert agg.n == agg.nd == emb.count()

    # replay from a fresh checkpoint: every batch re-delivered, the
    # insert-idempotent merge adds nothing
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    stats2 = st.run_ivfpq_merge_stream(
        stream2, path, checkpoint=str(tmp_path / "ckpt2")
    )
    assert sum(s["n_added"] for s in stats2) == 0
    assert sum(s["n_already"] for s in stats2) == delta.count()

    # and the maintained index still answers exactly when both
    # approximations are removed (merged vectors fully reachable)
    queries = emb.filter(F.col("vec_id") < 3)
    n = emb.count()
    exact = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in sim.cosine_topk(
            queries, emb, vec_col="embedding", id_col="vec_id", k=3
        ).collect()
    )
    probe = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in sim.ivfpq_probe_index(
            spark, path, queries, emb, k=3, n_probe=16, n_rerank=n
        ).collect()
    )
    assert probe == exact


def test_streaming_ivfpq_merge_auto_compacts(spark, sf_dir, tmp_path):
    """With auto_compact_max_files armed, the streaming maintainer
    bounds per-cell file count forever: four single-file micro-batches
    would fragment every touched cell to ~5 files, but the trigger
    compacts whenever the metadata listing sees a cell at the
    threshold — and the compacted index stays complete and exact."""
    from sentiment_analysis_data_engineering_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 5 == 1)
    delta = emb.filter(F.col("vec_id") % 5 != 1)
    path = str(tmp_path / "idx")
    sim.ivfpq_write_index(base, path)

    stream_dir = str(tmp_path / "landing")
    for k in (0, 2, 3, 4):
        delta.filter(F.col("vec_id") % 5 == k).coalesce(1).write.parquet(
            stream_dir, mode="append"
        )
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    stats = st.run_ivfpq_merge_stream(
        stream, path, checkpoint=str(tmp_path / "ckpt"),
        auto_compact_max_files=3,
    )
    assert len(stats) == 4
    assert sum(s["n_added"] for s in stats) == delta.count()
    # the trigger actually fired at least once...
    assert sum(s["n_cells_compacted"] for s in stats) > 0
    # ...and every batch observed bounded fragmentation
    assert all(s["max_files_per_cell"] <= 3 for s in stats)
    # post-stream: no cell above the threshold, listing agrees
    frag = sim.ivfpq_cell_file_counts(spark, path)
    assert max(frag.values()) <= 3
    # completeness + exactness survive compaction
    codes = spark.read.parquet(f"{path}/codes")
    agg = codes.agg(
        F.count("*").alias("n"), F.countDistinct("neighbor_id").alias("nd")
    ).first()
    assert agg.n == agg.nd == emb.count()
    queries = emb.filter(F.col("vec_id") < 3)
    n = emb.count()
    exact = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in sim.cosine_topk(
            queries, emb, vec_col="embedding", id_col="vec_id", k=3
        ).collect()
    )
    probe = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in sim.ivfpq_probe_index(
            spark, path, queries, emb, k=3, n_probe=16, n_rerank=n
        ).collect()
    )
    assert probe == exact


def test_autoretrain_arm_fails_loudly_on_zero_baseline(
    spark, sf_dir, tmp_path
):
    """A baseline audit that matches ZERO index vectors would make the
    cross-multiplied drift trigger 0 > 0 forever — silently-dead drift
    detection (r10 advice item 2). Arming must raise instead, for both
    dead-baseline causes: a corpus that explains no index row, and an
    audit_sample_mod that samples the index to nothing."""
    from sentiment_analysis_data_engineering_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "idx")
    sim.ivfpq_write_index(emb, path)
    landing = str(tmp_path / "landing")
    emb.limit(1).coalesce(1).write.parquet(landing, mode="append")

    def stream():
        return (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )

    # corpus of record explains no index row (disjoint ids)
    wrong_corpus = emb.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    with pytest.raises(ValueError, match="ZERO index vectors"):
        st.run_ivfpq_merge_stream(
            stream(), path, checkpoint=str(tmp_path / "c1"),
            auto_retrain_drift_ratio=2.0, retrain_corpus=wrong_corpus,
        )
    # sample_mod so large the deterministic id sample is empty
    with pytest.raises(ValueError, match="ZERO index vectors"):
        st.run_ivfpq_merge_stream(
            stream(), path, checkpoint=str(tmp_path / "c2"),
            auto_retrain_drift_ratio=2.0, retrain_corpus=emb,
            audit_sample_mod=10**9,
        )


def test_autoretrain_sampled_miss_falls_back_to_exact_batch_audit(
    spark, sf_dir, tmp_path
):
    """With audit_sample_mod armed, a micro-batch whose ids ALL hash
    outside the 1/mod sample must not silently no-op the drift check
    (r10 advice item 3): the maintainer falls back to an exact audit
    of that batch, so audit_n_vectors covers every batch row and the
    stats row is marked audit_sample_fallback."""
    from sentiment_analysis_data_engineering_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.filter(F.col("vec_id") % 5 != 0)
    path = str(tmp_path / "idx")
    sim.ivfpq_write_index(base, path)

    # pick (mod, batch id) deterministically: the batch's single id
    # hashes OUTSIDE the sample while the index sample stays non-empty
    delta_ids = [
        r.vec_id
        for r in emb.filter(F.col("vec_id") % 5 == 0)
        .select(
            "vec_id", F.pmod(F.xxhash64("vec_id"), F.lit(7)).alias("_h")
        )
        .filter(F.col("_h") != 0)
        .limit(1)
        .collect()
    ]
    assert delta_ids, "fixture has no id hashing outside the mod-7 sample"
    batch = emb.filter(F.col("vec_id") == delta_ids[0])
    n_base_sampled = base.filter(
        F.pmod(F.xxhash64("vec_id"), F.lit(7)) == 0
    ).count()
    assert n_base_sampled > 0  # baseline sample non-empty — arming valid

    landing = str(tmp_path / "landing")
    batch.coalesce(1).write.parquet(landing, mode="append")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    stats = st.run_ivfpq_merge_stream(
        stream, path, checkpoint=str(tmp_path / "ckpt"),
        auto_retrain_drift_ratio=10**6,  # never fires — isolate the audit
        retrain_corpus=emb, audit_sample_mod=7,
    )
    (s,) = stats
    assert s["audit_checked"] is True
    assert s.get("audit_sample_fallback") is True
    assert s["audit_n_vectors"] == 1  # the exact fallback saw the batch
