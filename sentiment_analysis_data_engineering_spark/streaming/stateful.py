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

__all__ = ["running_user_stats"]

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
    state.update((n, round(total, 6)))
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
