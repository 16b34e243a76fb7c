"""cassandra2aerospike_spark — a PySpark-native engine with the query and
data-processing capabilities of ThreatMetrix/Cassandra2Aerospike.

The reference (surveyed in SURVEY.md) is a single continuous query over
sorted key-value runs: k-way merge, last-write-wins conflict resolution,
point/row/range tombstone reconciliation, TTL expiry folding, token-order
iteration, and a create-only KV sink.  This package re-expresses that query
— and the full relational / text / similarity surface around it — as
idiomatic Spark DataFrame/SQL plans that Catalyst optimizes, designed for
a 1000-executor cluster reading 100 TB even though tests run on local[*].

Layout:
    session.py    — tuned SparkSession builder
    sources/      — fixture table loaders (nanos-timestamp handling), raw readers
    operators/    — merge semantics (LWW, tombstones, expiry), relational surface
    functions/    — token partitioners, text analysis, dedup, similarity search
    streaming/    — Structured Streaming track (watermark, windows, dedup)
    sinks/        — create-only KV sink, dry-run sink
    plans/        — plan inspection / optimization helpers
"""

__version__ = "0.1.0"
