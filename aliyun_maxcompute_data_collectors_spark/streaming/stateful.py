"""Custom stateful streaming operators via applyInPandasWithState.

The reference's streaming is stateless routing (partition assigners, batch
queues); its only state is open-writer maps (ST3).  These operators cover
the genuinely stateful pipeline needs Structured Streaming can express with
per-key state - the 'custom operator' escape hatch of SURVEY's build plan:

- streaming_dedup: drop events whose key was already seen (with TTL) -
  at-most-once emission per key across micro-batches;
- running_counter: per-key running aggregates that survive across batches.

State is per-key, stored in the state store (checkpointed, recoverable) -
scales horizontally with the shuffle partition count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    stream_df: DataFrame,
    key_cols: list[str],
    ttl_ms: int | None = None,
) -> DataFrame:
    """Exactly-one-emission per key: the first event for a key passes, later
    ones are dropped while its state lives (forever, or for ttl_ms)."""
    out_schema = stream_df.schema
    state_schema = "seen boolean"
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
               else GroupStateTimeout.NoTimeout)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first_batch = True
        for pdf in pdfs:
            if state.exists:
                continue  # key already emitted in an earlier batch
            if first_batch and len(pdf) > 0:
                yield pdf.head(1)
                state.update((True,))
                if ttl_ms:
                    state.setTimeoutDuration(ttl_ms)
                first_batch = False

    return stream_df.groupBy(*key_cols).applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=timeout,
    )


def running_counter(
    stream_df: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches; emits
    one updated row per key per batch."""
    key_fields = ", ".join(f"{c} {_spark_type_name(stream_df, c)}" for c in key_cols)
    out_schema = f"{key_fields}, n_events long, total double"
    state_schema = "n long, s double"

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        seen = 0
        for pdf in pdfs:
            seen += len(pdf)
            s += float(pdf[value_col].fillna(0.0).sum())
        if seen:
            n += seen
            state.update((n, s))
            yield pd.DataFrame(
                [list(key) + [n, s]],
                columns=key_cols + ["n_events", "total"],
            )

    return stream_df.groupBy(*key_cols).applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_ewma(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-key EWMA maintained across micro-batches — the streaming twin of
    ``operators.timeseries.ewma``.  State is one (initialized, ewma) pair
    per key; each batch folds its rows in event order through the same
    ``a*x + (1-a)*prev`` recurrence as the batch operator, and one updated
    row per key per batch is emitted.  Within-batch order is enforced by
    sorting the (small) batch on ``ts_col``; CROSS-batch order is the
    stream's delivery order, the usual applyInPandasWithState contract
    (watermark + sorted sources where replay order matters)."""
    key_fields = ", ".join(f"{c} {_spark_type_name(stream_df, c)}" for c in key_cols)
    out_schema = f"{key_fields}, n_events long, ewma_value double"
    state_schema = "n long, initialized boolean, e double"
    a = float(alpha)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n, init, e = state.get if state.exists else (0, False, 0.0)
        seen = 0
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for x in pdf[value_col].astype("float64"):
                e = x if not init else a * x + (1.0 - a) * e
                init = True
            seen += len(pdf)
        if seen:
            n += seen
            state.update((n, init, e))
            yield pd.DataFrame(
                [list(key) + [n, e]],
                columns=key_cols + ["n_events", "ewma_value"],
            )

    return stream_df.groupBy(*key_cols).applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _spark_type_name(df: DataFrame, col: str) -> str:
    return df.schema[col].dataType.simpleString()


def make_counter_processor(key_names: list[str], value_col: str):
    """The transformWithStateInPandas running-counter PROCESSOR, exposed
    at module level so its logic is testable WITHOUT the state-server
    wire: the StatefulProcessor API itself imports cleanly; only the
    executor-side runtime needs the ``protobuf`` package.  The unit test
    (test_bucket_incremental_stateful.py) drives init/handleInputRows
    through a fake handle/ValueState and pins exact parity with
    ``running_counter``'s applyInPandasWithState semantics - the
    documented migration contract between the two APIs."""
    from pyspark.sql import types as T
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    state_schema = T.StructType([
        T.StructField("n", T.LongType()), T.StructField("tot", T.DoubleType()),
    ])

    class Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", state_schema)

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            n, tot = 0, 0.0
            if self._state.exists():
                n, tot = self._state.get()
            for pdf in rows:
                n += len(pdf)
                tot += float(pdf[value_col].sum())
            self._state.update((n, tot))
            yield pd.DataFrame([{**dict(zip(key_names, key)),
                                 "n_events": n, "total": tot}])

        def handleExpiredTimer(self, key, timerValues: TimerValues,
                               expiredTimerInfo: ExpiredTimerInfo):
            return iter(())

        def close(self) -> None:
            pass

    return Counter()


def running_counter_tws(
    stream_df: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """``running_counter`` on Spark 4's transformWithStateInPandas API
    (StatefulProcessor + typed ValueState) — the successor to
    applyInPandasWithState with composable state variables and timers.
    Emits one updated (keys..., n_events, total) row per key per batch.

    Kept alongside the applyInPandasWithState variant: same semantics, so
    pipelines can migrate APIs without output changes.

    DOCUMENTED LIMITATION (r9, carried from r6): the executor runtime
    for this API needs the RocksDB state store provider plus the
    ``protobuf`` python package (the state-server wire format), which
    this container does not ship and cannot install.  Coverage here is
    therefore split: the processor LOGIC is unit-tested in-process via
    :func:`make_counter_processor` (no wire needed), semantic parity
    with the fully-e2e-tested ``running_counter`` is pinned by the same
    test, and the e2e path self-skips until a protobuf-equipped cluster
    runs it."""
    from pyspark.sql import types as T

    key_fields = [stream_df.schema[k] for k in key_cols]
    out_schema = T.StructType(
        list(key_fields)
        + [T.StructField("n_events", T.LongType()),
           T.StructField("total", T.DoubleType())]
    )
    return stream_df.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=make_counter_processor(
            [f.name for f in key_fields], value_col),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
