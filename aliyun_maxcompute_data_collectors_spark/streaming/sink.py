"""Structured Streaming sinks with the reference's delivery semantics.

Parity map (SURVEY.md 2.11):
- ST1 checkpoint-coordinated flush (``OdpsSinkFunction.java:140-146,193-231``):
  Structured Streaming's checkpointed ``foreachBatch`` - each micro-batch is
  an epoch; the checkpoint commits after the batch function returns, giving
  the same flush-on-snapshot contract without hand-rolled timers.
- ST2 processing-time partition windows (``DateTimePartitionAssigner``):
  streaming.assigner.with_time_partition.
- ST3 per-partition writer state (``DynamicOdpsPartitionStreamWrite``):
  ``partitionBy`` on the batch write - Spark manages one file writer per
  partition value per task.
- ST5 at-least-once batching w/ bounded queue (``RecordBatchQueue``, batch
  1000): micro-batch trigger + ``maxFilesPerTrigger``/``maxOffsetsPerTrigger``.
- ST6 dirty-record side channel: sources.ingest.split_dirty + write_dirty.
- ST8 block commit with retry: Spark task retries + atomic per-batch commit.

Beyond the reference (it has no event-time support at all): watermarked
event-time windows and late-data handling come free - see
``windowed_aggregate``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

from aliyun_maxcompute_data_collectors_spark.streaming.assigner import (
    DEFAULT_PATTERN, with_time_partition)

DEFAULT_BATCH_SIZE = 1000  # reference Flume/OGG batch default


def partitioned_stream_writer(
    stream_df: DataFrame,
    catalog,
    table: str,
    checkpoint_dir: str,
    time_col: str | None = None,
    pattern: str = DEFAULT_PATTERN,
    partition_col: str = "dt",
    mode: str = "dynamic",              # 'dynamic' | 'static' | 'grouped' (W10)
    static_value: str | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> DataStreamWriter:
    """Streaming write into a catalog table with time-partition assignment.

    - dynamic: partition value per row from its (event or processing) time;
    - static: one fixed partition value for the whole stream;
    - grouped: like dynamic but each micro-batch sorts by the partition value
      first, so each task keeps ONE open writer at a time
      (GroupedOdpsPartitionStreamWrite's memory bound).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        df = transform(batch_df) if transform else batch_df
        if mode == "static":
            if static_value is None:
                raise ValueError("static mode needs static_value")
            catalog.insert(table, df, static_partition={partition_col: static_value})
            return
        df = with_time_partition(df, time_col, pattern, partition_col)
        if mode == "grouped":
            df = df.sortWithinPartitions(partition_col)
        catalog.insert(table, df)

    return (
        stream_df.writeStream
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def cdc_stream_writer(
    ops_stream: DataFrame,
    catalog,
    table: str,
    checkpoint_dir: str,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
) -> DataStreamWriter:
    """ST4: checkpointed CDC apply - each micro-batch MERGEs its net effect
    into the target table (idempotent per batch: replaying a batch after a
    failure converges to the same snapshot)."""
    from aliyun_maxcompute_data_collectors_spark.streaming.cdc import cdc_foreach_batch_writer
    return (
        ops_stream.writeStream
        .foreachBatch(cdc_foreach_batch_writer(catalog, table, key_cols, order_cols, op_col))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def scd2_stream_writer(
    changelog_stream: DataFrame,
    catalog,
    table: str,
    checkpoint_dir: str,
    keys: list[str],
    time_col: str,
    attr_cols: list[str] | None = None,
) -> DataStreamWriter:
    """Streaming SCD2 maintenance: each micro-batch of changelog rows is
    merged into the versioned dimension ``table`` (touched keys rebuilt —
    late rows splice correctly; see operators/scd.scd2_apply_batch).  The
    stream checkpoint gives per-batch exactly-once coordination."""
    from aliyun_maxcompute_data_collectors_spark.streaming.cdc import scd2_foreach_batch_writer
    return (
        changelog_stream.writeStream
        .foreachBatch(scd2_foreach_batch_writer(catalog, table, keys, time_col, attr_cols))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


def windowed_aggregate(
    stream_df: DataFrame,
    time_col: str,
    window_duration: str = "1 hour",
    watermark: str = "10 minutes",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Event-time tumbling-window aggregation with a watermark (late rows
    beyond the watermark are dropped deterministically).  The reference has
    no event-time handling - this is the Spark-native upgrade of its
    processing-time-only partitioning."""
    gcols = [F.window(F.col(time_col), window_duration)] + [
        F.col(c) for c in (group_cols or [])
    ]
    exprs = aggs or [F.count(F.lit(1)).alias("cnt")]
    return (
        stream_df.withWatermark(time_col, watermark)
        .groupBy(*gcols)
        .agg(*exprs)
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    watermark: str = "10 minutes",
    max_lag: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with bounded state: each side
    buffers only rows within its watermark, and the time-range condition
    (|left.t - right.t| <= max_lag) lets Spark evict matched state - the
    pattern for joining two live streams (e.g. clicks x impressions) without
    unbounded memory.  The reference has no stream-stream join at all."""
    l = left.withWatermark(left_time, watermark).alias("l")
    r = right.withWatermark(right_time, watermark).alias("r")
    cond = None
    for k in on:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    lag = F.expr(f"INTERVAL {max_lag}")
    cond = cond & (F.col(f"r.{right_time}") >= F.col(f"l.{left_time}") - lag) \
                & (F.col(f"r.{right_time}") <= F.col(f"l.{left_time}") + lag)
    return l.join(r, cond, how)


def session_windowed_aggregate(
    stream_df: DataFrame,
    time_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    group_cols: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Event-time session windows (dynamic gap-based windows closed by the
    watermark) - the streaming twin of operators.relational.sessionize."""
    gcols = [F.session_window(F.col(time_col), gap)] + [
        F.col(c) for c in (group_cols or [])
    ]
    exprs = aggs or [F.count(F.lit(1)).alias("cnt")]
    return (
        stream_df.withWatermark(time_col, watermark)
        .groupBy(*gcols)
        .agg(*exprs)
    )


def dedup_within_watermark(
    stream_df: DataFrame,
    key_cols: list[str],
    time_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup with bounded state: duplicates arriving within the
    watermark horizon are dropped, state older than the watermark is evicted
    (dropDuplicatesWithinWatermark) - the scalable alternative to the
    unbounded applyInPandasWithState dedup in streaming.stateful."""
    return (
        stream_df.withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )


def run_to_completion(writer: DataStreamWriter, timeout_sec: float = 120.0) -> None:
    """Start with availableNow (drain everything queued, then stop) - the
    batch-like test/backfill harness for any of the writers above."""
    q: StreamingQuery = writer.trigger(availableNow=True).start()
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
