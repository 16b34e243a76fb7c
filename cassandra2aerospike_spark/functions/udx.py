"""User-defined-function surface (SURVEY.md §2.9): the engine's extension
points, mirroring the reference's two plug-in interfaces — the
DatabaseRow sink visitor (/root/reference/CassandraParser.hpp:46-52) and
the Partitioner scalar hook (/root/reference/Partitioners.hpp:23-32) —
generalized to Spark's full UDx family:

  * scalar pandas UDF      — functions/tokens.py::murmur3_token (P1)
  * grouped-agg pandas UDF — expiry_fold_udaf (A4 as a UDAF)
  * grouped-map            — sessionize (applyInPandas)
  * table function (UDTF)  — TokenizeUDTF (Spark 4 @udtf)
  * stateful streaming     — streaming/stream_queries.py stateful LWW
                             (applyInPandasWithState)

Everything here is Arrow-batched — the row-at-a-time Python UDF path
(BatchEvalPython) is banned by tests/test_plans.py.  UDx is the slow
path by design; each of these has a built-in-expression twin elsewhere
in the repo (A4: operators/merge.py::fold_expiry; sessions:
F.session_window; tokenize: functions/text.py::tokens) — the point is
the extension surface, with oracle checks proving the UDx and built-in
forms agree.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    LongType,
    Row,
    StructField,
    StructType,
)

from ..operators.merge import ETERNAL

# ------------------------------------------------------------- UDAF (A4)


@pandas_udf(LongType())
def expiry_fold_udaf(expiration: pd.Series) -> int:
    """A4 last-expiring fold as a grouped-agg pandas UDF: any non-TTL cell
    (NULL expiration) forces ETERNAL, else max expiration
    (AerospikeWriter.cpp:40-78)."""
    if expiration.isna().any() or len(expiration) == 0:
        return ETERNAL
    return int(expiration.max())


# ------------------------------------------------- grouped map (sessions)

SESSION_GAP_US = 30 * 60 * 1_000_000

_SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
        StructField("first_ts_us", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _sessionize_group(pdf: pd.DataFrame) -> pd.DataFrame:
    ts = pdf["ts_us"].sort_values().to_numpy()
    gaps = (ts[1:] - ts[:-1]) > SESSION_GAP_US if len(ts) > 1 else []
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_sessions": [1 + int(sum(gaps))],
            "n_events": [len(ts)],
            "first_ts_us": [int(ts[0])],
            "last_ts_us": [int(ts[-1])],
        }
    )


def sessionize(events: DataFrame) -> DataFrame:
    """Grouped-map applyInPandas: per-user session statistics with a
    30-minute gap rule.  Integer-exact (oracle-comparable); the built-in
    twin is F.session_window (streaming track)."""
    return events.select("user_id", "ts_us").groupBy("user_id").applyInPandas(
        _sessionize_group, schema=_SESSION_SCHEMA
    )


# ----------------------------------------------------------------- UDTF


@udtf(returnType="doc_id: bigint, pos: int, token: string")
class TokenizeUDTF:
    """Spark 4 Python UDTF: lateral-explode a document into positioned
    tokens (whitespace tokenization identical to functions/text.py::tokens,
    which is the codegen'd fast twin)."""

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        for pos, tok in enumerate(t for t in text.lower().strip().split() if t):
            yield doc_id, pos, tok


def register_udtfs(spark) -> None:
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
