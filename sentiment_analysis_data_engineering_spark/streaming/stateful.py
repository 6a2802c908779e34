"""Custom stateful streaming operator via ``applyInPandasWithState``.

Extension layer (SURVEY.md §2.9: the reference has no streaming; its
incremental loads are the batch twin). This is the escape hatch for
state machines the native window/dedup operators can't express —
arbitrary per-key state carried across micro-batches, with Arrow-batch
(not per-row) Python transfer.

Scale shape: state is partitioned by the group key across executors
and checkpointed by the streaming engine; each micro-batch touches only
the groups present in that batch. The Python worker sees one key's
rows as pandas frames — vectorized within the batch.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

__all__ = [
    "running_user_stats",
    "running_user_stats_tws",
    "streaming_ewma",
    "streaming_transitions",
    "streaming_zscore",
]

#: (n_events, total_value) carried per user across micro-batches.
_STATE = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])

_OUTPUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])


def _update_user(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into running totals
    and emit the updated snapshot (output mode: update)."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    # carry the UNROUNDED total (rounding state every micro-batch
    # compounds drift vs the batch sum); round only what's emitted
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained as explicit
    group state — the ``applyInPandasWithState`` form of a cumulative
    aggregate. After draining all input (Trigger.AvailableNow), each
    user's latest emitted row equals the batch
    ``groupBy(user_id).agg(count, sum)`` — the invariant the tests pin.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=_OUTPUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: (ewma, n_events) carried per user across micro-batches.
_EWMA_STATE = T.StructType([
    T.StructField("ewma", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
])

_EWMA_OUTPUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("ewma", T.DoubleType()),
])


def streaming_ewma(events: DataFrame, *, alpha: float = 0.3) -> DataFrame:
    """Streaming twin of ``operators/temporal.py::ewma_last`` — per-key
    exponential smoothing maintained as explicit group state
    (s_1 = x_1; s_i = α·x_i + (1-α)·s_{i-1}).

    Each micro-batch's rows are sorted by (ts, event_id) and folded
    into the carried level with the vectorized closed form
    ``s' = (1-α)^k·s + Σ α·(1-α)^(k-i)·x_i`` — one numpy pass per
    (key, batch), no Python row loop. EWMA is order-sensitive, so
    cross-batch correctness requires keys' rows to arrive in event
    order across batches (file/Kafka-partition append order); within a
    batch any order is fine. After draining in-order input, each key's
    last emitted row equals the batch ``ewma_last`` — the invariant
    the tests pin.
    """
    import numpy as np

    def _update(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        xs = rows["value"].to_numpy(dtype=float)
        if state.exists:
            s, n = state.get
        else:
            s, n = float(xs[0]), 1
            xs = xs[1:]
        k = len(xs)
        if k:
            w = alpha * (1.0 - alpha) ** np.arange(k - 1, -1, -1)
            s = (1.0 - alpha) ** k * s + float(w @ xs)
            n += k
        state.update((s, n))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "ewma": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_EWMA_OUTPUT,
        stateStructType=_EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: last seen event_type carried per user across micro-batches.
_TRANS_STATE = T.StructType([
    T.StructField("last_type", T.StringType()),
])

_TRANS_OUTPUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("prev_type", T.StringType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("n", T.LongType()),
])


def streaming_transitions(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``markov_event_transitions`` counts:
    per-user (previous, next) event-type transition increments
    maintained with ONE string of state per user — the carried last
    event type bridges the micro-batch boundary, so a view→click pair
    split across batches still counts.

    Each micro-batch's rows for a key are sorted by (ts, event_id)
    (the batch query's window order), shifted against themselves plus
    the carried boundary type, and aggregated to per-(prev, next)
    increments BEFORE emission — output is O(types²) rows per (key,
    batch), not O(events), and summing all emitted increments
    reproduces the batch window+aggregate exactly. Same cross-batch
    ordering contract as streaming_ewma: keys' rows must arrive in
    event order across batches (file/Kafka-partition append order);
    within a batch any order is fine. Append output mode — increments
    are facts, never revised."""

    def _update(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        types = rows["event_type"].tolist()
        if not types:
            return
        (last,) = state.get if state.exists else (None,)
        prevs = ([last] if last is not None else [None]) + types[:-1]
        pairs = pd.DataFrame({"prev_type": prevs, "event_type": types})
        pairs = pairs[pairs["prev_type"].notna()]
        state.update((types[-1],))
        if pairs.empty:
            return
        counts = (
            pairs.groupby(["prev_type", "event_type"], sort=True)
            .size()
            .reset_index(name="n")
        )
        counts.insert(0, "user_id", key[0])
        yield counts

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_TRANS_OUTPUT,
        stateStructType=_TRANS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: last-N value window carried per user across micro-batches.
_Z_STATE = T.StructType([
    T.StructField("window", T.ArrayType(T.DoubleType())),
])

_Z_OUTPUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("zscore", T.DoubleType()),
])


def streaming_zscore(
    events: DataFrame,
    *,
    lookback: int = 20,
    min_obs: int = 10,
    threshold: float = 2.5,
) -> DataFrame:
    """Streaming twin of the batch ``rolling_zscore_anomalies`` query:
    each event's value scored against the mean/stddev of the user's
    preceding ``lookback`` events (strictly exclusive of itself),
    emitting only the anomalies (|z| > threshold after rounding, with
    ≥ ``min_obs`` priors and positive variance).

    State per key is just the last ``lookback`` values (an
    array<double> — bounded, watermark-free). Rounding matches Spark's
    ``F.round`` exactly (HALF_UP over the shortest decimal repr, via
    ``decimal`` on the emitted rows) — numpy's half-to-even would
    diverge from the batch twin on .xxxx5 boundaries, flipping both
    emitted values and threshold inclusion. Batch rows are sorted by
    (ts, event_id) and scored with one vectorized pandas rolling pass
    over [carried window ‖ batch values] — no Python row loop. Like
    the EWMA twin, cross-batch equivalence to the batch query requires
    per-key event-order delivery across micro-batches.
    """
    import decimal

    import numpy as np

    def _r4(x: float) -> float:
        # Spark F.round semantics: BigDecimal.valueOf(double) == the
        # double's SHORTEST decimal repr, then setScale(4, HALF_UP)
        return float(
            decimal.Decimal(repr(float(x))).quantize(
                decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    def _update(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        prev = list(state.get[0]) if state.exists else []
        xs = rows["value"].to_numpy(dtype=float)
        s = pd.Series(np.concatenate([np.array(prev, dtype=float), xs]))

        # Null parity with the batch query: Spark's windowed avg/stddev
        # SKIP null values while count(*) counts ROWS. pandas rolling
        # mean/std instead poison any window containing NaN, so build
        # the moments from null-aware sums: row count from a ones
        # series, value count/sum/sum-of-squares from NaN-masked ones.
        def roll(t: pd.Series) -> pd.Series:
            return t.shift(1).rolling(lookback, min_periods=1).sum()

        nn = s.notna().astype(float)
        xf = s.fillna(0.0)
        n_rows = roll(pd.Series(1.0, index=s.index))
        n_vals = roll(nn)
        sx = roll(xf)
        sxx = roll(xf * xf)
        with np.errstate(invalid="ignore", divide="ignore"):
            mu = (sx / n_vals).to_numpy()
            var = ((sxx - n_vals * (sx / n_vals) ** 2)
                   / (n_vals - 1)).to_numpy()
            var = np.where(var < 0, 0.0, var)  # fp cancellation guard
            sd = np.sqrt(var)

        k = len(prev)
        mu_b, sd_b, nr_b = mu[k:], sd[k:], n_rows.to_numpy()[k:]
        with np.errstate(invalid="ignore", divide="ignore"):
            z_raw = (xs - mu_b) / sd_b
        finite = ~np.isnan(z_raw) & ~np.isinf(z_raw)
        z = np.full_like(z_raw, np.nan)
        z[finite] = [_r4(v) for v in z_raw[finite]]
        ok = (nr_b >= min_obs) & (sd_b > 0) & finite
        ok &= np.abs(np.where(np.isnan(z), 0.0, z)) > threshold

        # plain Python floats: the state pickler rejects numpy scalars
        # (NaN survives the round-trip and keeps null slots as rows)
        new_window = [float(v) for v in s.to_numpy()[-lookback:]]
        state.update((new_window,))
        out = rows.loc[ok, ["user_id", "event_id"]].copy()
        out["value"] = [_r4(v) for v in xs[ok]]
        out["zscore"] = z[ok]
        yield out.astype(
            {"user_id": "int64", "event_id": "int64"}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_Z_OUTPUT,
        stateStructType=_Z_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 StatefulProcessor API)
# --------------------------------------------------------------------------


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value) on the Spark 4
    ``transformWithStateInPandas`` API — the same semantics as
    :func:`running_user_stats`, pytest-pinned equal, so the repo
    carries BOTH stateful surfaces: ``applyInPandasWithState`` (the
    2.x-lineage GroupState escape hatch) and the ``StatefulProcessor``
    replacement Spark 4 positions as its successor (typed, composable
    state handles; per-state TTL; timers). State here is one
    ValueState struct per user — same scale stance as the old API:
    partitioned by key, checkpointed by the engine, only batch-present
    keys touched per micro-batch.

    Runtime dependency: the StatefulProcessor state protocol rides
    protobuf (``google.protobuf``) — absent in this container, so the
    equivalence test skips unless it is importable; on any standard
    Spark 4 cluster image (protobuf ships with the distribution's
    Python env) the path runs as written."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            # carry the UNROUNDED total; round only the emitted row
            # (same drift stance as the GroupState twin)
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            _RunningStats(),
            outputStructType=_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )
