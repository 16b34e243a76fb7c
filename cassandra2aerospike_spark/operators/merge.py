"""The reference's one query, decomposed into Spark operators.

The reference (ThreatMetrix/Cassandra2Aerospike) continuously evaluates:

    for every partition key across N sorted runs, merge all versions of
    every column, keep the newest value per column (last-write-wins),
    discard values covered by point/row/range tombstones, fold a record
    TTL from column expirations, drop expired records, emit key -> map.

Its execution is a k-way sort-merge iterator over SSTable cursors
(/root/reference/CassandraParser.cpp:375-529).  Here the same semantics are
declared as DataFrame ops and Catalyst plans them: scan classification ->
tombstone cover via key-windows -> groupBy LWW argmax -> groupBy record
assembly.  ONE scan and ONE shuffle end-to-end (the hash(key) exchange
serves the windows and both grouping levels); no custom iterator.  The
decomposed join pipeline (covering_tombstone_ts) is kept as the didactic
J3 surface.

Cell model (EAV long form, SURVEY.md §1.3): the fixture ``events`` table
stands in for the cell stream: user_id ≡ partition key, event_type ≡ column
name, value ≡ cell value, ts ≡ write timestamp (epoch µs).

Because the fixtures carry no tombstone flags, we derive a deterministic
cell classification from ``event_id`` (documented here, replicated in the
DuckDB oracles; precedence top to bottom):

    event_id % 97 == 0 -> row tombstone    (deletes the whole key at ts)
    event_id % 13 == 0 -> range tombstone  (deletes cols <= event_type at ts)
    event_id % 10 == 0 -> point tombstone  (deletes (key, event_type) at ts)
    event_id %  7 == 0 -> expiring cell    (ttl 3600 s)
    otherwise          -> normal cell

Liveness follows the reference exactly: a cell survives iff its ts is
strictly greater than every covering tombstone's ts
(CassandraParser.cpp:481 — emit iff ts > minTime).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic "now" so expiry queries are reproducible and oracle-checkable
# (the reference uses wall-clock `time(0)`, AerospikeWriter.cpp:240).
NOW_EPOCH_S = 1_719_792_000  # 2024-07-01T00:00:00Z
# Reference sentinel: expiry == UINT32_MAX means "never expires"
# (AerospikeWriter.cpp:27-29).
ETERNAL = 4_294_967_295
TTL_S = 3600
MIN_TTL_S = 1  # reference -L default (AerospikeWriter.cpp:29)


def _is_row_tomb(c: Column) -> Column:
    return c % 97 == 0


def _is_range_tomb(c: Column) -> Column:
    return (c % 97 != 0) & (c % 13 == 0)


def _is_point_tomb(c: Column) -> Column:
    return (c % 97 != 0) & (c % 13 != 0) & (c % 10 == 0)


def _is_cell(c: Column) -> Column:
    return (c % 97 != 0) & (c % 13 != 0) & (c % 10 != 0)


def derive_cells(events: DataFrame) -> DataFrame:
    """Value cells: (key, col_name, value, ts, ttl?, expiration?).

    Mirrors the decoded cell of the reference's scan (ColumnInfo,
    CassandraParser.hpp:54-72): expiring cells carry (ttl, expiration).
    """
    eid = F.col("event_id")
    expiring = _is_cell(eid) & (eid % 7 == 0)
    return events.filter(_is_cell(eid)).select(
        F.col("user_id").alias("key"),
        F.col("event_type").alias("col_name"),
        F.col("value"),
        F.col("ts_us").alias("ts"),
        F.when(expiring, F.lit(TTL_S)).alias("ttl"),
        F.when(expiring, F.expr(f"ts_us div 1000000 + {TTL_S}")).alias("expiration"),
    )


def derive_row_tombstones(events: DataFrame) -> DataFrame:
    """Row tombstones: (key, ts) — whole-partition deletions (the reference's
    `marked_for_deletion`, SSTable.cpp:354)."""
    return events.filter(_is_row_tomb(F.col("event_id"))).select(
        F.col("user_id").alias("key"), F.col("ts_us").alias("ts")
    )


def derive_range_tombstones(events: DataFrame) -> DataFrame:
    """Range tombstones: (key, col_end, ts) — delete cols <= col_end
    (reference keeps a running end-key -> ts map, CassandraParser.cpp:337-372)."""
    return events.filter(_is_range_tomb(F.col("event_id"))).select(
        F.col("user_id").alias("key"),
        F.col("event_type").alias("col_end"),
        F.col("ts_us").alias("ts"),
    )


def derive_point_tombstones(events: DataFrame) -> DataFrame:
    """Point tombstones: (key, col_name, ts) — single-cell deletions
    (the `deleted` cell flag, SSTable.hpp:86-94)."""
    return events.filter(_is_point_tomb(F.col("event_id"))).select(
        F.col("user_id").alias("key"),
        F.col("event_type").alias("col_name"),
        F.col("ts_us").alias("ts"),
    )


def covering_tombstone_ts(
    cells: DataFrame,
    row_tombs: DataFrame,
    range_tombs: DataFrame,
    point_tombs: DataFrame,
) -> DataFrame:
    """Max covering-tombstone ts per (key, col_name) present in `cells`.

    Scale design: all three tombstone kinds are reduced to per-(key, col)
    maxima BEFORE joining the (much larger) cell stream, so the cell-side
    join is a plain equi-join — never a θ-join fan-out.  The range
    tombstone's `col <= col_end` condition is resolved against the distinct
    column-name dimension (tiny — broadcast) instead of against the cells.
    """
    cols = cells.select("col_name").distinct()  # small dimension
    point_max = point_tombs.groupBy("key", "col_name").agg(F.max("ts").alias("tomb_ts"))
    row_max = (
        row_tombs.groupBy("key")
        .agg(F.max("ts").alias("tomb_ts"))
        .crossJoin(F.broadcast(cols))
        .select("key", "col_name", "tomb_ts")
    )
    range_max = (
        range_tombs.join(F.broadcast(cols), F.col("col_name") <= F.col("col_end"))
        .groupBy("key", "col_name")
        .agg(F.max("ts").alias("tomb_ts"))
    )
    return (
        point_max.unionByName(row_max)
        .unionByName(range_max)
        .groupBy("key", "col_name")
        .agg(F.max("tomb_ts").alias("tomb_ts"))
    )


def classify_cells(events: DataFrame) -> DataFrame:
    """Shared scan projection: every event classified as cell / row- /
    range- / point-tombstone, with TTL fields populated on expiring cells
    (the decoded ColumnInfo of the reference's scan,
    CassandraParser.hpp:54-72)."""
    eid = F.col("event_id")
    expiring = _is_cell(eid) & (eid % 7 == 0)
    return events.select(
        F.col("user_id").alias("key"),
        F.col("event_type").alias("col_name"),
        F.col("value"),
        F.col("ts_us").alias("ts"),
        F.when(expiring, F.lit(TTL_S)).alias("ttl"),
        F.when(expiring, F.expr(f"ts_us div 1000000 + {TTL_S}")).alias("expiration"),
        F.when(_is_cell(eid), F.lit("cell"))
        .when(_is_row_tomb(eid), F.lit("row"))
        .when(_is_range_tomb(eid), F.lit("range"))
        .otherwise(F.lit("point"))
        .alias("kind"),
    )


def _with_tombstone_cover(classified: DataFrame):
    """Attach per-row covering-tombstone state via windows keyed by the
    partition key — the Spark form of the reference's running tombstone
    map (CassandraParser.cpp:337-372).  hash(key) satisfies BOTH window
    specs (key) and (key, col_name), so this costs one exchange total;
    range cover resolves in-row against the key's (tiny) range list
    instead of a θ-join.  Returns (cells+points frame, covering-ts col).
    """
    from pyspark.sql import Window

    kind = F.col("kind")
    w = Window.partitionBy("key")
    wc = Window.partitionBy("key", "col_name")
    enriched = (
        classified.withColumn(
            "row_tomb_ts", F.max(F.when(kind == "row", F.col("ts"))).over(w)
        )
        .withColumn(
            "ranges",
            F.collect_list(
                F.when(
                    kind == "range",
                    F.struct(F.col("col_name").alias("col_end"), F.col("ts")),
                )
            ).over(w),
        )
        .withColumn(
            "point_tomb_ts", F.max(F.when(kind == "point", F.col("ts"))).over(wc)
        )
    )
    range_cover = F.array_max(
        F.transform(
            F.filter(F.col("ranges"), lambda r: r["col_end"] >= F.col("col_name")),
            lambda r: r["ts"],
        )
    )
    cover = F.greatest(F.col("row_tomb_ts"), F.col("point_tomb_ts"), range_cover)
    return enriched, cover


def live_cells_from_classified(classified: DataFrame) -> DataFrame:
    """F1 over an already-classified cell stream (any source: the parquet
    fixture via classify_cells, or the raw SSTable-run source via
    sources.sstable.fixtures.classified_from_runs)."""
    enriched, cover = _with_tombstone_cover(classified)
    return (
        enriched.filter(F.col("kind") == "cell")
        .withColumn("_cover", cover)
        .filter(F.col("_cover").isNull() | (F.col("ts") > F.col("_cover")))
        .select("key", "col_name", "value", "ts", "ttl", "expiration")
    )


def clustered_live_cells(raw: DataFrame) -> DataFrame:
    """F1/J3 over a REAL CLUSTERED table read (sstable_run layout=ma raw
    frame): tombstone cover scoped by the clustering key, the semantics
    the reference widens away (its read_marker folds EVERY marker into
    row_marked_for_deletion, SSTable.cpp:553).

    Cover kinds, all resolved against a cell at (key, ck, col, ts):
      * partition tombstones — row_tomb_ts on any of the key's rows;
      * ck-bounded range tombstones — rows with range_tomb=true and NULL
        col_name: cover decided on the TYPED clustering sort keys
        (ck_key/ck_end_key — ma_format.make_ck_key_fn memcomparable
        transforms), so signed numeric clustering columns order
        numerically and a SHORTER bound covers every extension of its
        prefix (compare the cell key truncated to the bound's length);
        bounds per incl_mask (bit0 start-inclusive, bit1 end-inclusive;
        NULL bound = unbounded), and tomb ts >= cell ts;
      * clustered-row deletions — emitted by the source as the
        degenerate inclusive [ck, ck] range;
      * STATIC-row deletions — range_tomb rows with incl_mask=4: cover
        only the key's static (ck NULL) cells;
      * point tombstones — deleted cells at the same (key, ck, col).

    Scale shape (the merge_full discipline): ONE hash(key) exchange
    feeds every window — the per-key range list is collected in-row
    (tiny by contract: tombstones are rare relative to cells) so range
    cover is an array_max over a filtered array, never a θ-join."""
    from pyspark.sql import Window

    w = Window.partitionBy("key")
    wc = Window.partitionBy("key", "ck", "col_name")
    is_rt = F.col("range_tomb") & F.col("col_name").isNull()
    is_static_rt = is_rt & (F.col("incl_mask") == 4)
    is_cell = F.col("col_name").isNotNull() & ~F.col("range_tomb")
    enriched = (
        raw.withColumn("part_tomb", F.max("row_tomb_ts").over(w))
        .withColumn(
            "ck_ranges",
            F.collect_list(
                F.when(
                    is_rt & ~is_static_rt,
                    F.struct(
                        F.col("ck_key").alias("s"),
                        F.col("ck_end_key").alias("e"),
                        F.col("incl_mask").alias("m"),
                        F.col("ts").alias("tts"),
                    ),
                )
            ).over(w),
        )
        .withColumn(
            "static_tomb", F.max(F.when(is_static_rt, F.col("ts"))).over(w)
        )
        .withColumn(
            "point_tomb",
            F.max(F.when(is_cell & F.col("deleted"), F.col("ts"))).over(wc),
        )
    )
    k = F.col("ck_key")
    # prefix-aware typed comparison: truncate the cell's sort key to the
    # bound's byte length — the memcomparable encoding makes byte order
    # on that truncation equal typed prefix-tuple order, and equality
    # equal prefix-tuple equality (the encoding is prefix-free per
    # component), so one substring+compare decides any bound length
    def _pfx(bound):
        return F.substring(k, F.lit(1), F.octet_length(bound))

    range_cover = F.array_max(
        F.transform(
            F.filter(
                F.col("ck_ranges"),
                lambda r: (
                    r["s"].isNull()
                    | (_pfx(r["s"]) > r["s"])
                    | ((r["m"].bitwiseAND(F.lit(1)) != 0) & (_pfx(r["s"]) == r["s"]))
                )
                & (
                    r["e"].isNull()
                    | (_pfx(r["e"]) < r["e"])
                    | ((r["m"].bitwiseAND(F.lit(2)) != 0) & (_pfx(r["e"]) == r["e"]))
                ),
            ),
            lambda r: r["tts"],
        )
    )
    cover = F.greatest(
        F.col("part_tomb"),
        F.col("point_tomb"),
        F.when(F.col("ck").isNotNull(), range_cover),
        F.when(F.col("ck").isNull(), F.col("static_tomb")),
    )
    return (
        enriched.filter(is_cell & ~F.col("deleted"))
        .withColumn("_cover", cover)
        .filter(F.col("_cover").isNull() | (F.col("ts") > F.col("_cover")))
        .select("key", "ck", "col_name", "value", "ts", "ttl", "expiration")
    )


def collection_live_cells(raw: DataFrame) -> DataFrame:
    """F1/J3 over a table with COMPLEX (multi-cell collection) columns
    (sstable_run layout=ma raw frame carrying `path`): the merge the
    reference cannot run at all — it declares HAS_COMPLEX_DELETION
    (SSTable.hpp:120) but never reads the complex-cell block, so a 3.x
    table with a map/set/list column misparses there.

    Cover kinds, resolved against a cell at (key, ck, col, path, ts):
      * partition tombstones — row_tomb_ts on any of the key's rows;
      * COMPLEX-COLUMN deletions — rows with range_tomb=true, a
        col_name, and incl_mask=5: the collection-clear DeletionTime,
        covering every path of that column in its row;
      * point tombstones — deleted cells at the same (key, ck, col,
        path) (a single map-entry / set-element removal).
    Survival is the strict `ts > cover` rule shared by every merge
    path.  Simple cells (path NULL) flow through the same windows —
    their point scope is just (key, ck, col, NULL).

    Scale shape: ONE hash(key) exchange feeds all three windows
    (partitionBy key / key,ck,col / key,ck,col,path are all satisfied
    by hash(key) partitioning), same as merge_full.  ck RANGE
    tombstones are out of scope here — compose with
    clustered_live_cells for tables that mix both."""
    from pyspark.sql import Window

    w = Window.partitionBy("key")
    wcx = Window.partitionBy("key", "ck", "col_name")
    wp = Window.partitionBy("key", "ck", "col_name", "path")
    is_cxd = (
        F.col("range_tomb")
        & F.col("col_name").isNotNull()
        & (F.col("incl_mask") == 5)
    )
    is_cell = F.col("col_name").isNotNull() & ~F.col("range_tomb")
    enriched = (
        raw.withColumn("part_tomb", F.max("row_tomb_ts").over(w))
        .withColumn("cx_tomb", F.max(F.when(is_cxd, F.col("ts"))).over(wcx))
        .withColumn(
            "point_tomb",
            F.max(F.when(is_cell & F.col("deleted"), F.col("ts"))).over(wp),
        )
    )
    cover = F.greatest(
        F.col("part_tomb"), F.col("cx_tomb"), F.col("point_tomb")
    )
    return (
        enriched.filter(is_cell & ~F.col("deleted"))
        .withColumn("_cover", cover)
        .filter(F.col("_cover").isNull() | (F.col("ts") > F.col("_cover")))
        .select("key", "ck", "col_name", "path", "value", "ts", "ttl", "expiration")
    )


def live_cells(events: DataFrame) -> DataFrame:
    """F1: a cell survives iff no covering tombstone has ts >= cell ts
    (strict `ts > minTime` survival, CassandraParser.cpp:481).

    Single scan, single shuffle: tombstone cover comes from key-windows,
    not joins (see _with_tombstone_cover).  The decomposed join pipeline
    (covering_tombstone_ts) remains as the didactic J3 surface.
    """
    return live_cells_from_classified(classify_cells(events))


def lww_latest(cells: DataFrame) -> DataFrame:
    """A1: last-write-wins argmax per (key, col_name)
    (choose_latest_match, CassandraParser.cpp:316-333).

    One hash aggregation with map-side partial combine — max_by carries the
    whole surviving cell struct, so no self-join / window pass is needed.
    """
    packed = F.struct("value", "ttl", "expiration")
    # tie-break: the reference keeps the FIRST-matched run on equal ts
    # (strict >, CassandraParser.cpp:325) — order-dependent.  We define a
    # deterministic, partitioning-independent rule instead (documented
    # divergence, SURVEY.md §7): among equal ts, the greatest packed cell
    # struct wins.
    return (
        cells.groupBy("key", "col_name")
        .agg(
            F.max_by(packed, F.struct(F.col("ts"), packed)).alias("c"),
            F.max("ts").alias("ts"),
        )
        .select(
            "key",
            "col_name",
            F.col("c.value").alias("value"),
            "ts",
            F.col("c.ttl").alias("ttl"),
            F.col("c.expiration").alias("expiration"),
        )
    )


def _record_expiry(first_expiring: bool) -> Column:
    """A4 fold expression shared by fold_expiry and assemble_records:
    last-expiring (default — any non-TTL cell forces ETERNAL, else max
    expiration) or first-expiring (`-f` — min expiration, ETERNAL only if
    nothing expires)."""
    if first_expiring:
        return F.coalesce(F.min("expiration"), F.lit(ETERNAL))
    return F.when(
        F.max(F.col("expiration").isNull().cast("int")) == 1, F.lit(ETERNAL)
    ).otherwise(F.max("expiration"))


def fold_expiry(latest: DataFrame, first_expiring: bool = False) -> DataFrame:
    """A4: fold per-key record expiry from the surviving cells' expirations
    (AerospikeDatabaseRow::new_column/new_column_with_ttl,
    AerospikeWriter.cpp:40-78).

    last-expiring mode (default): any non-TTL cell forces ETERNAL, else the
    max expiration wins.  first-expiring mode (`-f`): min expiration over
    expiring cells, ETERNAL only if no cell expires.
    """
    return latest.groupBy("key").agg(
        _record_expiry(first_expiring).cast("long").alias("expiry"),
        F.count("*").alias("n_cols"),
    )


def assemble_records(latest: DataFrame, first_expiring: bool = False) -> DataFrame:
    """A5 + A4 + F2: one pass assembles the record — sorted column map
    (deterministic; map ordering is col_name), folded expiry, live-column
    count.  Ghost rows (zero live cells) never appear because grouping only
    sees surviving cells (CassandraParser.cpp:524-529).
    """
    return latest.groupBy("key").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("col_name", "value")))
        ).alias("columns"),
        _record_expiry(first_expiring).cast("long").alias("expiry"),
        F.count("*").alias("n_cols"),
    )


def filter_expired(records: DataFrame, now_s: int = NOW_EPOCH_S, min_ttl_s: int = MIN_TTL_S) -> DataFrame:
    """F3/F4: drop records whose expiry precedes now + minimum TTL
    (AerospikeWriter.cpp:238-249); ETERNAL records always survive."""
    return records.filter(
        (F.col("expiry") == ETERNAL) | (F.col("expiry") >= F.lit(now_s + min_ttl_s))
    )


# Sink write-TTL sentinels (public Aerospike client semantics: -1 = record
# never expires, 0 = use the namespace's default TTL — the reference's
# AS_RECORD_NO_EXPIRE_TTL / AS_RECORD_DEFAULT_TTL pair).
TTL_NO_EXPIRE = -1
TTL_NAMESPACE_DEFAULT = 0


def apply_ttl_policy(
    records: DataFrame, now_s: int = NOW_EPOCH_S, prohibit_eternal: bool = False
) -> DataFrame:
    """F4: map each surviving record's folded expiry to the sink
    write-TTL (AerospikeWriter.cpp:232-241: eternal records write
    s_ttl_for_eternal_records, others write expiry - now).  The `-x`
    flag (prohibit eternal records, Cassandra2Aerospike.cpp:165-167 ->
    set_prohibit_eternal_records, AerospikeWriter.cpp:398-401) switches
    the eternal sentinel from never-expire to the namespace-default TTL.

    Expects records already passed through filter_expired, so
    expiry - now is never below the minimum TTL."""
    eternal_ttl = TTL_NAMESPACE_DEFAULT if prohibit_eternal else TTL_NO_EXPIRE
    return records.withColumn(
        "write_ttl",
        F.when(F.col("expiry") == ETERNAL, F.lit(eternal_ttl).cast("long"))
        .otherwise((F.col("expiry") - F.lit(now_s)).cast("long")),
    )


def merged_latest_cells(events: DataFrame) -> DataFrame:
    """Tombstone-aware LWW, optimal plan: ONE parquet scan, ONE shuffle,
    zero joins (enforced by tests/test_plans.py).

    Now that live_cells resolves tombstone cover with key-windows, the
    didactic composition IS the 100 TB plan: the hash(key) exchange feeds
    the windows, the (key, col_name) LWW aggregation, and record assembly
    downstream — Catalyst inserts no further exchange anywhere.
    """
    return lww_latest(live_cells(events))


def merge_records(events: DataFrame, first_expiring: bool = False, now_s: int = NOW_EPOCH_S) -> DataFrame:
    """The reference's end-to-end query: cells -> tombstone reconciliation ->
    LWW -> record assembly -> expiry filter.  Single scan, two shuffles
    (both keyed by the partition key the data naturally groups on)."""
    return filter_expired(
        assemble_records(merged_latest_cells(events), first_expiring), now_s
    )
