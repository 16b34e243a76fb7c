"""UDx-surface queries (SURVEY.md §2.9): UDAF, grouped-map, UDTF, and
custom stateful streaming — each oracle-checked against plain SQL, proving
the Python extension path and the declarative form agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import udx
from ..operators import merge
from ..sources import load_table
from ..streaming import stream_stateful_lww


def q_udaf_expiry_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 expiry fold as a grouped-agg pandas UDF over the live-cell
    stream; must equal the built-in fold_expiry expression (whose oracle
    this reuses, minus n_cols)."""
    latest = merge.merged_latest_cells(load_table(spark, sf_dir, "events"))
    return latest.groupBy("key").agg(
        udx.expiry_fold_udaf(F.col("expiration")).alias("expiry")
    )


def q_gm_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user session stats (30-min gap)."""
    return udx.sessionize(load_table(spark, sf_dir, "events"))


def q_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF via LATERAL join: positioned tokens of the 50
    lowest doc_ids (bounded so the row explosion stays oracle-sized)."""
    udx.register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.token
        FROM udtf_docs, LATERAL tokenize_udtf(doc_id, text) t
        """
    )


def q_stream_stateful_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_stateful_lww(spark, sf_dir)


QUERIES = {
    "udaf_expiry_fold": q_udaf_expiry_fold,
    "gm_sessionize": q_gm_sessionize,
    "udtf_tokenize": q_udtf_tokenize,
    "stream_stateful_lww": q_stream_stateful_lww,
}

ORACLES = {
    # same CTE chain as merge_q's records, but keyed output only
    "udaf_expiry_fold": None,  # filled below from merge_q._CTE
    "gm_sessionize": """
        WITH gaps AS (
          SELECT user_id, epoch_us(ts) AS ts_us,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                          OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                          > 1800000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        )
        SELECT user_id,
               CAST(1 + sum(new_session) AS BIGINT) AS n_sessions,
               count(*) AS n_events,
               min(ts_us) AS first_ts_us,
               max(ts_us) AS last_ts_us
        FROM gaps GROUP BY user_id
    """,
    "udtf_tokenize": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x != '') AS t
          FROM documents WHERE doc_id < 50
        )
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, t[i] AS token
        FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i)
    """,
    "stream_stateful_lww": """
        SELECT user_id, event_type,
               arg_max(value, epoch_us(ts)) AS latest_value,
               max(epoch_us(ts)) AS latest_ts_us
        FROM events GROUP BY user_id, event_type
    """,
}

from .merge_q import _CTE  # noqa: E402

ORACLES["udaf_expiry_fold"] = _CTE + "SELECT key, expiry FROM records"
