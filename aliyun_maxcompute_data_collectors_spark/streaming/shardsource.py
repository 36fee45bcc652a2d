"""Broker-style sharded streaming source with per-shard cursors (S16/ST7).

Parity: the reference polls a sharded broker with one cursor per shard and
strict in-shard ordering — ``flume-plugin/.../DatahubSource.java:20-186``
(shard list → per-shard cursor → getRecords loop) and
``ogg-plugin/.../ShardWriter.java`` (per-shard ordered writes).  This module
re-expresses that contract as a first-class Structured Streaming source via
PySpark's Python Data Source API, so the standard machinery — offset
checkpointing, exactly-once micro-batch planning, availableNow backfill —
replaces the reference's hand-rolled cursor persistence.

The "broker" is a directory tree (the in-container stand-in for a real
broker SDK; the cursor/ordering semantics are the point):

    <root>/<shard>/<seq>.jsonl     # one segment file = one record batch,
                                   # seq-numbered, append-only per shard

- an OFFSET is ``{shard_name: number_of_segments_consumed}`` — exactly a
  per-shard cursor;
- each micro-batch plans ONE InputPartition PER SHARD covering the segment
  range (start, end] — shards are read in parallel, records within a shard
  strictly in (segment, line) order, so per-shard ordering is preserved
  end-to-end (the consumer sees shard-local order, never cross-shard order,
  the same guarantee the broker gives);
- restart resumes from the checkpointed offsets: segments consumed before a
  restart are never re-read (at-least-once delivery with the batch replay
  bounded by the last unplanned batch, like any Structured Streaming
  source);
- shards may APPEAR over time (broker resharding): a shard unknown to the
  start offset begins at cursor 0.

Usage::

    from aliyun_maxcompute_data_collectors_spark.streaming.shardsource import ShardLogDataSource
    spark.dataSource.register(ShardLogDataSource)
    stream = spark.readStream.format("shardlog").option("path", root).load()
    # schema: shard string, seq long, offset long, value string
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA = "shard string, seq long, offset long, value string"


def list_shards(root: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    return sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )


def shard_segments(root: str, shard: str) -> list[str]:
    """Segment files of one shard in sequence order (append-only names)."""
    d = os.path.join(root, shard)
    if not os.path.isdir(d):
        return []
    return sorted(f for f in os.listdir(d) if f.endswith(".jsonl"))


def append_records(root: str, shard: str, records: list[dict]) -> str:
    """Test/producer helper: append one segment (= one record batch) to a
    shard, mimicking the broker's per-shard append.  Returns the segment
    path.  Writes are atomic (tmp + rename) so a concurrent poll never sees
    a half-written segment."""
    d = os.path.join(root, shard)
    os.makedirs(d, exist_ok=True)
    seq = len(shard_segments(root, shard))
    path = os.path.join(d, f"{seq:08d}.jsonl")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, path)
    return path


class _ShardRange(InputPartition):
    def __init__(self, root: str, shard: str, start: int, end: int):
        self.root, self.shard, self.start, self.end = root, shard, start, end


def _read_range(part: _ShardRange):
    """Yield rows of segments (start, end] of one shard, strictly in
    (segment, line) order — the per-shard ordering guarantee."""
    segs = shard_segments(part.root, part.shard)[part.start: part.end]
    offset = part.start
    for seg in segs:
        with open(os.path.join(part.root, part.shard, seg)) as f:
            for line_no, line in enumerate(f):
                rec = json.loads(line)
                yield (
                    part.shard,
                    int(rec.get("seq", offset * 1_000_000 + line_no)),
                    offset,
                    str(rec.get("value", "")),
                )
        offset += 1


class ShardLogStreamReader(DataSourceStreamReader):
    def __init__(self, root: str):
        self.root = root

    def initialOffset(self) -> dict:
        # start BEFORE any existing data (cursor 0 per known shard) — the
        # reference's OLDEST-cursor mode; an empty dict degrades gracefully
        # because partitions() treats missing shards as cursor 0
        return {s: 0 for s in list_shards(self.root)}

    def latestOffset(self) -> dict:
        return {s: len(shard_segments(self.root, s))
                for s in list_shards(self.root)}

    def partitions(self, start: dict, end: dict):
        parts = [
            _ShardRange(self.root, shard, int(start.get(shard, 0)), int(hi))
            for shard, hi in sorted(end.items())
            if int(hi) > int(start.get(shard, 0))
        ]
        # Structured Streaming requires >=1 partition per planned batch
        return parts or [_ShardRange(self.root, "__empty__", 0, 0)]

    def read(self, partition: _ShardRange):
        return _read_range(partition)

    def commit(self, end: dict) -> None:
        # cursors live in the stream checkpoint; nothing broker-side to ack
        pass


class ShardLogBatchReader(DataSourceReader):
    """Batch twin: one full scan of every shard (backfill / reprocessing)."""

    def __init__(self, root: str):
        self.root = root

    def partitions(self):
        return [
            _ShardRange(self.root, s, 0, len(shard_segments(self.root, s)))
            for s in list_shards(self.root)
        ] or [_ShardRange(self.root, "__empty__", 0, 0)]

    def read(self, partition: _ShardRange):
        return _read_range(partition)


class ShardLogDataSource(DataSource):
    """``spark.readStream.format("shardlog").option("path", root)``."""

    @classmethod
    def name(cls) -> str:
        return "shardlog"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema: StructType) -> ShardLogStreamReader:
        return ShardLogStreamReader(self.options["path"])

    def reader(self, schema: StructType) -> ShardLogBatchReader:
        return ShardLogBatchReader(self.options["path"])
