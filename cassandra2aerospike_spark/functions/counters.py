"""Cassandra counter-context decode + reconciliation.

The reference decodes counter cells only far enough to skip them
correctly: COUNTER_MASK pulls a counter timestamp
(/root/reference/SSTable.cpp:433-437 -> ColumnInfo.extra_data.
counter_timestamp, CassandraParser.hpp:62-66) and the VALUE — the
serialized counter context — is carried as an opaque blob like every
other cell.  This module goes further and implements the actual counter
semantics from the public Cassandra counter design (the context layout
of o.a.c.db.context.CounterContext):

  context := n_header(be16) header_index(be16) * n_header
             shard* where shard := counter_id(16B) clock(be64) count(be64)

  Each shard is one replica's view: (id, logical clock, CUMULATIVE
  count).  Reconciling N contexts for the same counter column keeps,
  per shard id, the state with the highest clock (count breaks clock
  ties), and the counter's value is the SUM of the surviving shard
  counts.  Header indexes only mark local/global shards for write-path
  bookkeeping — read reconciliation ignores them (they are skipped, not
  trusted, so corrupt headers fail the length check).

Scale shape: decode is an Arrow-batched pandas UDF (one struct.unpack
pass per cell, no row-at-a-time Python), shard expansion is an in-row
explode, and reconciliation is ONE hash aggregation on
(key, col, shard id) — `max(struct(clock, count))` gives the per-shard
argmax with map-side partial combine, no window, no self-join — followed
by the (strictly smaller) per-column sum.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SHARD = struct.Struct(">16sqq")


def encode_counter_context(
    shards: list[tuple[bytes, int, int]], header: tuple[int, ...] = ()
) -> bytes:
    """Serialize one counter context (fixture-side tooling; the product
    path is the decode below).  `shards` = (counter_id 16B, clock,
    count), stored sorted by id like the real layout."""
    out = bytearray(struct.pack(">h", len(header)))
    for h in header:
        out += struct.pack(">h", h)
    for cid, clock, count in sorted(shards):
        if len(cid) != 16:
            raise ValueError("counter_id must be 16 bytes")
        out += _SHARD.pack(cid, clock, count)
    return bytes(out)


def decode_counter_context_py(b: bytes) -> list[tuple[bytes, int, int]]:
    """One context -> [(id, clock, count)].  Uniform ValueError on any
    truncation (the codec discipline shared by every binary decoder in
    sources/sstable)."""
    if len(b) < 2:
        raise ValueError("counter: truncated header count")
    (n_header,) = struct.unpack_from(">h", b, 0)
    if n_header < 0:
        raise ValueError("counter: negative header count")
    off = 2 + 2 * n_header
    if off > len(b) or (len(b) - off) % _SHARD.size:
        raise ValueError("counter: truncated context")
    return [
        _SHARD.unpack_from(b, o) for o in range(off, len(b), _SHARD.size)
    ]


def decode_counter_context(value: Column) -> Column:
    """Column of context blobs -> array<struct<id, clock, count>>
    (Arrow-batched; NULL in -> NULL out)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no annotations: `from __future__ import annotations` stringifies
    # them and pandas_udf cannot resolve 'pd.Series' from here — the
    # return-type string carries the schema instead
    @pandas_udf("array<struct<id: binary, clock: bigint, count: bigint>>")
    def _decode(v):
        return v.map(
            lambda b: None if b is None else decode_counter_context_py(bytes(b))
        )

    return _decode(value)


def counter_reconcile(cells: DataFrame) -> DataFrame:
    """Reconcile counter cells (key, col_name, value=context blob) into
    per-column counter totals: per (key, col, shard id) keep the
    max-(clock, count) shard state, then sum the surviving counts.
    Returns (key, col_name, total, n_shards)."""
    shards = cells.select(
        "key",
        "col_name",
        F.explode(decode_counter_context(F.col("value"))).alias("sh"),
    ).select(
        "key",
        "col_name",
        F.col("sh.id").alias("id"),
        F.col("sh.clock").alias("clock"),
        F.col("sh.count").alias("cnt"),
    )
    latest = shards.groupBy("key", "col_name", "id").agg(
        F.max(F.struct("clock", "cnt"))["cnt"].alias("cnt")
    )
    return latest.groupBy("key", "col_name").agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_shards")
    )
