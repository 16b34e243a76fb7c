"""Streaming queries (SURVEY.md §2.8): each callable drives a real
Structured Streaming query to completion and returns the result, oracle-
checked against batch SQL (streaming/stream_queries.py for semantics)."""

from __future__ import annotations

from ..streaming import (
    stream_aerospike_wire_sink,
    stream_asb_backup_rebase,
    stream_asb_incremental_backup,
    stream_cdc_incremental,
    stream_cdc_batch_apply,
    stream_cdc_cluster_apply,
    stream_cdc_wire_apply,
    stream_snapshot_cdc,
    stream_corpus_dedup,
    stream_late_data,
    stream_lww_tws,
    stream_session_windows,
    stream_real_sstable_ingest,
    stream_sstable_ingest,
    stream_cms_hot_keys,
    stream_stream_join,
    stream_window_counts,
    stream_wire_batch_enrich,
    streaming_dedup_keys,
)
from .merge_q import _CTE

QUERIES = {
    "stream_aerospike_wire_sink": stream_aerospike_wire_sink,
    "stream_cdc_wire_apply": stream_cdc_wire_apply,
    "stream_cdc_cluster_apply": stream_cdc_cluster_apply,
    "stream_cdc_batch_apply": stream_cdc_batch_apply,
    "stream_asb_incremental_backup": stream_asb_incremental_backup,
    "stream_asb_backup_rebase": stream_asb_backup_rebase,
    "stream_snapshot_cdc": stream_snapshot_cdc,
    "stream_cdc_incremental": stream_cdc_incremental,
    "stream_window_counts": stream_window_counts,
    "stream_late_data": stream_late_data,
    "stream_session_windows": stream_session_windows,
    "stream_dedup_keys": streaming_dedup_keys,
    "stream_stream_join": stream_stream_join,
    "stream_sstable_ingest": stream_sstable_ingest,
    "stream_real_sstable_ingest": stream_real_sstable_ingest,
    "stream_corpus_dedup": stream_corpus_dedup,
    "stream_wire_batch_enrich": stream_wire_batch_enrich,
    "stream_cms_hot_keys": stream_cms_hot_keys,
}

# transformWithStateInPandas needs the protobuf wire between the JVM and
# the Python state server; register its query only where the dependency
# exists (this container ships a broken google.protobuf — the
# applyInPandasWithState twin stream_stateful_lww covers the semantics).
try:
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    QUERIES["stream_lww_tws"] = stream_lww_tws
    _HAS_TWS = True
except ImportError:
    _HAS_TWS = False

# per-generation live-cell counts: shared by the SGR-run stream and the
# real-format stream — the ma kind mapping leaves 'cell' rows identical
_CELLS_PER_RUN_SQL = """
        WITH cls AS (
          SELECT epoch_us(ts) % 3 AS run0,
                 CASE WHEN event_id % 97 = 0 THEN 'row'
                      WHEN event_id % 13 = 0 THEN 'range'
                      WHEN event_id % 10 = 0 THEN 'point'
                      ELSE 'cell' END AS kind
          FROM events
        )
        SELECT CAST(run0 + 1 AS INT) AS run, count(*) AS n_cells
        FROM cls WHERE kind = 'cell'
        GROUP BY 1
    """

ORACLES = {
    "stream_window_counts": """
        WITH starts AS (
          SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS s0,
                 CAST(ts AS TIMESTAMP) AS ts
          FROM events
        ), expanded AS (
          SELECT unnest([s0, s0 - INTERVAL '30 minutes']) AS window_start, ts
          FROM starts
        )
        SELECT 'tumbling' AS op,
               epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS window_start_us,
               epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour')
                   AS window_end_us,
               event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 2, 3, 4
        UNION ALL
        SELECT 'sliding' AS op,
               epoch_us(window_start) AS window_start_us,
               epoch_us(window_start + INTERVAL '1 hour') AS window_end_us,
               CAST(NULL AS VARCHAR) AS event_type,
               count(*) AS n,
               CAST(NULL AS DOUBLE) AS sum_value
        FROM expanded
        WHERE ts >= window_start AND ts < window_start + INTERVAL '1 hour'
        GROUP BY 2, 3
    """,
    # late-data semantics as pure SQL: runs arrive in gen order (ts%3+1),
    # ONE RUN PER MICROBATCH (source admission control).  Spark publishes
    # a new watermark with one full batch of lag — the value applied
    # while processing batch k was computed from data through batch k-2
    # (measured: the k-1 model undercounts, this one hash-matches) — so
    # a row is DROPPED iff its window end <= max ts of runs <= k-2 minus
    # the 10-minute delay, and a window is EMITTED (append mode) once
    # the final watermark (global max - delay, published by the trailing
    # no-data batch) passes its end
    "stream_late_data": """
        WITH cls AS (
          SELECT CAST(ts AS TIMESTAMP) AS ts,
                 CAST(epoch_us(ts) % 3 + 1 AS INT) AS run
          FROM events
          WHERE NOT (event_id % 97 = 0 OR event_id % 13 = 0 OR event_id % 10 = 0)
        ),
        maxes AS (SELECT run, max(ts) AS m FROM cls GROUP BY run),
        wm AS (
          SELECT r.run,
                 (SELECT max(m.m) FROM maxes m WHERE m.run < r.run - 1)
                   - INTERVAL '10 minutes' AS wm_before
          FROM (SELECT DISTINCT run FROM cls) r
        ),
        kept AS (
          SELECT e.ts
          FROM cls e JOIN wm ON wm.run = e.run
          WHERE wm.wm_before IS NULL
             OR date_trunc('hour', e.ts) + INTERVAL '1 hour' > wm.wm_before
        ),
        final_wm AS (
          SELECT max(m) - INTERVAL '10 minutes' AS fw FROM maxes
        )
        SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
               epoch_us(date_trunc('hour', ts) + INTERVAL '1 hour') AS window_end_us,
               count(*) AS n_on_time
        FROM kept
        GROUP BY 1, 2
        HAVING window_end_us <= (SELECT epoch_us(fw) FROM final_wm)
    """,
    "stream_session_windows": """
        WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        m AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                      THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        g AS (
          SELECT user_id, ts,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM m
        )
        SELECT user_id, epoch_us(min(ts)) AS session_start_us,
               epoch_us(max(ts) + INTERVAL '30 minutes') AS session_end_us,
               count(*) AS n_events
        FROM g GROUP BY user_id, sid
    """,
    "stream_dedup_keys": "SELECT DISTINCT user_id, event_type FROM events",
    # stream-static corpus dedup: same fingerprints as dedup_incremental,
    # minus the in-batch window (out of scope for the stream-static row)
    "stream_corpus_dedup": """
        WITH toks AS (
          SELECT doc_id, text,
                 list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x != '') AS t
          FROM documents
        ), fps AS (
          SELECT doc_id, md5(array_to_string(t, ' ')) AS fp FROM toks
        ), old AS (
          SELECT fp, min(doc_id) AS old_rep FROM fps
          WHERE doc_id % 2 = 0 GROUP BY fp
        )
        SELECT f.doc_id, f.fp,
               CASE WHEN old.old_rep IS NOT NULL THEN 'dup_of_corpus'
                    ELSE 'keep' END AS decision,
               old.old_rep AS dup_of
        FROM fps f LEFT JOIN old ON f.fp = old.fp
        WHERE f.doc_id % 2 = 1
    """,

    "stream_real_sstable_ingest": _CELLS_PER_RUN_SQL,
    "stream_sstable_ingest": _CELLS_PER_RUN_SQL,
    "stream_stream_join": """
        SELECT p.event_id, p.user_id, count(*) AS n_prior_views
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS pts
              FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT user_id AS v_user, CAST(ts AS TIMESTAMP) AS vts
              FROM events WHERE event_type = 'view') v
          ON p.user_id = v.v_user
         AND v.vts >= p.pts - INTERVAL '1 hour' AND v.vts <= p.pts
        GROUP BY 1, 2
    """,
}

if _HAS_TWS:
    ORACLES["stream_lww_tws"] = """
        SELECT user_id, event_type,
               arg_max(value, epoch_us(ts)) AS latest_value,
               max(epoch_us(ts)) AS latest_ts_us
        FROM events GROUP BY user_id, event_type
    """


# stream_aerospike_wire_sink oracle: three per-generation merges (the
# _CTE_MA semantics restricted to epoch_us(ts) % 3 = g — generation
# g+1's content), each reduced to (key, cols_str, ttl) live records,
# then a GENERATION-PRIORITY coalesce: create-only means the first
# generation that produced a live record for a key wins and later
# generations draw KEY_EXISTS.
import re as _re

from .merge_q import _CTE_MA as _S_CTE_MA


def _gen_merge_cte(g: int) -> str:
    sql = _S_CTE_MA
    sql = sql.replace("FROM events", f"FROM events WHERE epoch_us(ts) % 3 = {g}")
    for name in ("cls", "cells", "colsd", "cover", "live", "latest_f",
                 "latest", "records"):
        sql = _re.sub(rf"\b{name}\b", f"{name}_{g}", sql)
    body = sql.strip()
    assert body.startswith("WITH "), body[:30]
    body = body[len("WITH "):]
    return body + f"""
    , rec_{g} AS (
      SELECT r.key, a.cols_str,
             CASE WHEN r.expiry = 4294967295 THEN 4294967295
                  ELSE r.expiry - 1719792000 END AS ttl
      FROM records_{g} r
      JOIN (SELECT key,
                   string_agg(col_name || '=' || printf('%.2f', value), ','
                              ORDER BY col_name || '=' || printf('%.2f', value)
                              ) AS cols_str
            FROM latest_f_{g} GROUP BY key) a ON a.key = r.key
      WHERE r.expiry = 4294967295 OR r.expiry >= 1719792001
    )"""


# stream_snapshot_cdc oracle: three CUMULATIVE merges (generations
# 0..b, i.e. epoch_us(ts) % 3 <= b — the state the streaming fold holds
# after batch b), reduced to live (key, cols_str, expiry) records, then
# batch 0 emits everything as 'created' and batches 1/2 emit the
# full-outer diff of consecutive states — exactly what foreachBatch
# appends to the changes dir.
def _cum_merge_cte(b: int) -> str:
    sql = _S_CTE_MA
    sql = sql.replace("FROM events", f"FROM events WHERE epoch_us(ts) % 3 <= {b}")
    for name in ("cls", "cells", "colsd", "cover", "live", "latest_f",
                 "latest", "records"):
        sql = _re.sub(rf"\b{name}\b", f"{name}_c{b}", sql)
    body = sql.strip()
    assert body.startswith("WITH "), body[:30]
    body = body[len("WITH "):]
    return body + f"""
    , rec_c{b} AS (
      SELECT r.key, a.cols_str, r.expiry
      FROM records_c{b} r
      JOIN (SELECT key,
                   string_agg(col_name || '=' || printf('%.2f', value), ','
                              ORDER BY col_name || '=' || printf('%.2f', value)
                              ) AS cols_str
            FROM latest_f_c{b} GROUP BY key) a ON a.key = r.key
      WHERE r.expiry = 4294967295 OR r.expiry >= 1719792001
    )"""


def _cdc_diff_sql(batch: int, prev: int, cur: int) -> str:
    return f"""
    SELECT {batch} AS batch_id, coalesce(a.key, d.key) AS key,
           CASE WHEN a.key IS NULL THEN 'created'
                WHEN d.key IS NULL THEN 'deleted'
                ELSE 'updated' END AS status,
           a.cols_str AS cols_before, d.cols_str AS cols_after,
           a.expiry AS expiry_before, d.expiry AS expiry_after
    FROM rec_c{prev} a FULL JOIN rec_c{cur} d ON a.key = d.key
    WHERE a.key IS NULL OR d.key IS NULL
       OR a.cols_str <> d.cols_str OR a.expiry <> d.expiry"""


ORACLES["stream_snapshot_cdc"] = (
    "WITH "
    + ", ".join(_cum_merge_cte(b) for b in (0, 1, 2))
    + """
    SELECT 0 AS batch_id, key, 'created' AS status,
           CAST(NULL AS VARCHAR) AS cols_before, cols_str AS cols_after,
           CAST(NULL AS BIGINT) AS expiry_before, expiry AS expiry_after
    FROM rec_c0
    UNION ALL"""
    + _cdc_diff_sql(1, 0, 1)
    + "\n    UNION ALL"
    + _cdc_diff_sql(2, 1, 2)
)


# stream_cdc_incremental oracle: the emission log of the stateful
# operator — per key, the generations that CONTAIN it (any row kind),
# ordered -> version; each emission's record is the cumulative merge
# after that generation (NULL columns when the record is dead there)
ORACLES["stream_cdc_incremental"] = (
    "WITH "
    + ", ".join(_cum_merge_cte(b) for b in (0, 1, 2))
    + """
    , pres AS (
      SELECT DISTINCT user_id AS key, CAST(epoch_us(ts) % 3 AS INT) AS g
      FROM events
    ), vers AS (
      SELECT key, g,
             CAST(row_number() OVER (PARTITION BY key ORDER BY g) AS INT)
                 AS version
      FROM pres
    )
    SELECT v.key, v.version, r.cols_str, r.expiry
    FROM vers v LEFT JOIN rec_c0 r ON r.key = v.key WHERE v.g = 0
    UNION ALL
    SELECT v.key, v.version, r.cols_str, r.expiry
    FROM vers v LEFT JOIN rec_c1 r ON r.key = v.key WHERE v.g = 1
    UNION ALL
    SELECT v.key, v.version, r.cols_str, r.expiry
    FROM vers v LEFT JOIN rec_c2 r ON r.key = v.key WHERE v.g = 2
"""
)


# stream_cdc_wire_apply: after the last generation drains, the server's
# store (REPLACE puts + real wire deletes applied batch-by-batch) must
# equal the FULL cumulative merge's live records with the engine's
# expiry -> write-ttl mapping — the continuous-sync quiesce contract
ORACLES["stream_cdc_wire_apply"] = (
    "WITH "
    + _cum_merge_cte(2)
    + """
    SELECT key, cols_str,
           CASE WHEN expiry = 4294967295 THEN 4294967295
                ELSE expiry - 1719792000 END AS ttl
    FROM rec_c2
"""
)


# stream_asb_incremental_backup: per key, the live cumulative-merge
# state at the LARGEST generation that touched the key and left it
# live — latest-segment-wins replay of backups that cannot carry
# deletes; keys never live in any emitted batch are absent
ORACLES["stream_asb_incremental_backup"] = (
    "WITH "
    + ", ".join(_cum_merge_cte(b) for b in (0, 1, 2))
    + """
    , pres AS (
      SELECT DISTINCT user_id AS key, CAST(epoch_us(ts) % 3 AS INT) AS g
      FROM events
    ), em AS (
      SELECT p.key, p.g, r.cols_str, r.expiry
      FROM pres p JOIN rec_c0 r ON r.key = p.key
      WHERE p.g = 0 AND r.cols_str IS NOT NULL
      UNION ALL
      SELECT p.key, p.g, r.cols_str, r.expiry
      FROM pres p JOIN rec_c1 r ON r.key = p.key
      WHERE p.g = 1 AND r.cols_str IS NOT NULL
      UNION ALL
      SELECT p.key, p.g, r.cols_str, r.expiry
      FROM pres p JOIN rec_c2 r ON r.key = p.key
      WHERE p.g = 2 AND r.cols_str IS NOT NULL
    ), last AS (
      SELECT key, max(g) AS g FROM em GROUP BY key
    )
    SELECT em.key, em.cols_str,
           CASE WHEN em.expiry = 4294967295 THEN 4294967295
                ELSE em.expiry - 1719792000 END AS ttl
    FROM em JOIN last ON em.key = last.key AND em.g = last.g
"""
)


# stream_cdc_cluster_apply: identical quiesce contract — the cluster,
# the mid-stream handoff and the re-tends are invisible at quiesce
ORACLES["stream_cdc_cluster_apply"] = ORACLES["stream_cdc_wire_apply"]
# the batch-write applier must be invisible at quiesce — same contract
ORACLES["stream_cdc_batch_apply"] = ORACLES["stream_cdc_wire_apply"]


# stream_asb_backup_rebase: compaction must be INVISIBLE — base + tail
# restores to exactly what the full chain restores to (the equivalence
# and the chain-shortening are in-query asserts)
ORACLES["stream_asb_backup_rebase"] = ORACLES["stream_asb_incremental_backup"]


# the windowed streaming CMS is the SAME integer sketch a batch rebuild
# produces — per (1h window, hash row, bucket) counts, exact
ORACLES["stream_cms_hot_keys"] = """
    WITH b AS (
      SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)))
                 AS window_start_us,
             user_id
      FROM events
    ), buck AS (
      SELECT window_start_us, d.d,
             list_reduce(list_transform(range(1, 16),
                 j -> strpos('0123456789abcdef',
                             substr(md5('scms' || CAST(d.d AS VARCHAR) || '|'
                                        || CAST(user_id AS VARCHAR)), j, 1)) - 1),
                 (a, b) -> a * 16 + b) % 64 AS bucket
      FROM b, (SELECT unnest(range(0, 2)) AS d) d
    )
    SELECT window_start_us, CAST(d AS INT) AS d,
           CAST(bucket AS INT) AS bucket, count(*) AS cnt
    FROM buck GROUP BY 1, 2, 3
"""


# stream_wire_batch_enrich: every event tagged with its key's live
# cluster state — found / live-column count / the expiry -> write-ttl
# rule; keys with no live record (fully tombstoned or expired) come
# back 0 / 0 / -1.  The batch-read mechanics (batch-node split, zero
# single gets) are in-query asserts.
ORACLES["stream_wire_batch_enrich"] = _CTE + """
    , live_records AS (
      SELECT key, expiry, n_cols FROM records
      WHERE expiry = 4294967295 OR expiry >= 1719792001
    )
    SELECT e.event_id, e.user_id AS key,
           CASE WHEN lr.key IS NULL THEN CAST(0 AS INT)
                ELSE CAST(1 AS INT) END AS found,
           COALESCE(CAST(lr.n_cols AS INT), CAST(0 AS INT)) AS n_cols,
           CASE WHEN lr.key IS NULL THEN CAST(-1 AS BIGINT)
                WHEN lr.expiry = 4294967295 THEN 4294967295
                ELSE lr.expiry - 1719792000 END AS ttl
    FROM events e LEFT JOIN live_records lr ON lr.key = e.user_id
"""


ORACLES["stream_aerospike_wire_sink"] = (
    "WITH "
    + ", ".join(_gen_merge_cte(g) for g in (0, 1, 2))
    + """
    SELECT k.key,
           coalesce(r0.cols_str, r1.cols_str, r2.cols_str) AS cols_str,
           coalesce(r0.ttl, r1.ttl, r2.ttl) AS ttl
    FROM (SELECT key FROM rec_0 UNION SELECT key FROM rec_1
          UNION SELECT key FROM rec_2) k
    LEFT JOIN rec_0 r0 ON r0.key = k.key
    LEFT JOIN rec_1 r1 ON r1.key = k.key
    LEFT JOIN rec_2 r2 ON r2.key = k.key
"""
)
