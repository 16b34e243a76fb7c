"""Token-range partitioned table layout (SURVEY.md §2.6 O1/O2 at scale).

The reference's global (token, key) iteration order and Summary/Index
seek-to-key (CassandraParser.cpp:38-46, 196-216; SSTable.cpp:122-180)
map to a *storage layout* on Spark: partition the table by a coarse
token range (directory-level), range-partition + sort within files by
(token, key).  Then

  * a resume scan (`token >= T`) prunes whole DIRECTORIES via partition
    pruning (the analog of dropping runs entirely before EOF) and whole
    ROW GROUPS via parquet min/max stats (the analog of the Summary.db
    binary search) — before any row is read;
  * downstream merges shuffle less: files arrive already clustered by
    the key the merge groups on.

At 100 TB this is the difference between "scan everything and filter"
and "open only the ~1/n_ranges of files past the resume point".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokens import md5_token


def token_range_of(token: Column, n_ranges: int = 32) -> Column:
    """Coarse ring range id from the first token byte (hex md5 token):
    0..n_ranges-1, contiguous in token order so range pruning composes
    with token predicates."""
    first_byte = F.conv(F.substring(token, 1, 2), 16, 10).cast("int")
    return (first_byte * n_ranges / 256).cast("int")


def write_token_layout(
    df: DataFrame,
    key_col: str,
    out_dir: str,
    n_ranges: int = 32,
) -> None:
    """Materialize a token-ordered layout: directory per token_range,
    files range-partitioned and sorted by (token, key) within.

    repartitionByRange gives globally contiguous files (the 'sorted run'
    property); partitionBy(token_range) makes the coarse ring range a
    directory column Spark prunes without reading footers.
    """
    toked = df.withColumn("token", md5_token(F.col(key_col))).withColumn(
        "token_range", token_range_of(F.col("token"), n_ranges)
    )
    (
        toked.repartitionByRange(n_ranges, "token_range", "token")
        .sortWithinPartitions("token_range", "token", key_col)
        .write.mode("overwrite")
        .partitionBy("token_range")
        .parquet(out_dir)
    )


def read_resume(
    spark: SparkSession, out_dir: str, start_token: str, n_ranges: int = 32
) -> DataFrame:
    """Resume-from-token over a token layout (O2): the token_range
    predicate prunes directories, the token predicate prunes row groups;
    both are derived from the same start token, so callers pass one value
    (the reference's `-S` hex key hint, Cassandra2Aerospike.cpp:126-150).
    """
    start_range = int(start_token[:2], 16) * n_ranges // 256
    df = spark.read.parquet(out_dir)
    return df.filter(
        (F.col("token_range") >= F.lit(start_range))
        & (F.col("token") >= F.lit(start_token))
    )
