"""Relational-surface queries (SURVEY.md §2.3 joins, §2.4 aggregations,
§2.5 windows, §2.6 sort/limit/top-k, §2.7 set ops, §2.8 scalar families)
over the TPC-H-ish fixtures, each with a DuckDB oracle.

Engine-portability conventions (see operators/relational.py): double sums
go through exact DECIMAL; window orderings always carry a unique tiebreak
column; half-dependent rounding and libm-dependent functions are avoided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import asof_join, dsum, range_join, topk_per_group
from ..sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------------------------------------------- joins

def q_join_inner(spark, sf_dir):
    """J-surface: plain inner equi-join (Catalyst picks broadcast vs SMJ)."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


def q_join_left(spark, sf_dir):
    """Left outer join + per-customer order count (nulls counted as 0)."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def q_join_right(spark, sf_dir):
    """Right outer join preserving customers without orders."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


def q_join_full_outer(spark, sf_dir):
    """Full outer join of two aggregates (per-nation customers vs suppliers)."""
    c = _t(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust")
    )
    s = _t(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(
        F.count("*").alias("n_supp")
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full_outer").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        "n_cust",
        "n_supp",
    )


def q_join_semi(spark, sf_dir):
    """Left semi join: customers having at least one order (EXISTS)."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


def q_join_anti(spark, sf_dir):
    """Left anti join: customers with no orders (NOT EXISTS) — also the
    create-only sink predicate (S11, AerospikeWriter.cpp:244-247)."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def q_join_broadcast_star(spark, sf_dir):
    """Star join: fact lineitem ⋈ broadcast dims; revenue per brand/nation.

    The dims are explicitly broadcast — at 100 TB the fact side never
    shuffles for the join, only for the final aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("p_brand", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )


def q_join_range_theta(spark, sf_dir):
    """θ/range join: parts matched to size buckets via BETWEEN (broadcast
    nested-loop on the tiny bucket dim — J3's pattern, never a cartesian)."""
    p = _t(spark, sf_dir, "part")
    buckets = (
        p.select((F.col("p_size") - F.col("p_size") % 10).alias("lo"))
        .distinct()
        .withColumn("hi", F.col("lo") + 9)
        .withColumn("bucket", (F.col("lo") / 10).cast("int"))
    )
    joined = range_join(
        p, buckets, (F.col("p_size") >= F.col("lo")) & (F.col("p_size") <= F.col("hi"))
    )
    return joined.groupBy("bucket").agg(
        F.count("*").alias("n_parts"),
        dsum("p_retailprice").alias("sum_price"),
    )


def q_join_asof(spark, sf_dir):
    """As-of join: for each purchase event, the user's latest prior view
    (union + ordered window — the scalable as-of pattern)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts_us").alias("p_ts"), F.col("value").alias("amount")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts_us").alias("v_ts")
    )
    return asof_join(
        purchases, views, on="user_id", left_ts="p_ts", right_ts="v_ts",
        value_cols=["v_ts"],
    ).select("event_id", "user_id", "p_ts", "amount", F.col("v_ts").alias("last_view_ts"))


def q_join_bucketed_colocated(spark, sf_dir):
    """Co-located big-big join over BUCKETED tables: lineitem and orders
    are both hash-clustered into 16 buckets on the order key (one
    write-time shuffle each, staged once), so the join AND the following
    per-order aggregation run with ZERO runtime exchanges — the plan
    audit asserts it.  The 100 TB shape: fact-fact joins repeated across
    a pipeline shuffle once at layout time, not once per query.  The
    merge hint pins SortMergeJoin so the demo doesn't degrade to a
    broadcast at toy scale (at 100 TB neither side broadcasts anyway)."""
    from ..sources.bucketed import bucketed_table

    li = bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    o = bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
            F.min("o_totalprice").alias("totalprice"),
        )
    )


# ------------------------------------------------------------- aggregations

def q_agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the canonical multi-agg scan (A-family surface)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(3,2)")
    tax = F.col("l_tax").cast("decimal(3,2)")
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
             / F.count("l_quantity")).alias("avg_qty"),
            (F.sum(disc).cast("double") / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_agg_distinct(spark, sf_dir):
    """COUNT(DISTINCT) — expands to two-phase aggregate in Catalyst."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.countDistinct("l_suppkey", "l_partkey").alias("n_supp_part"),
    )


def q_agg_rollup(spark, sf_dir):
    """ROLLUP region -> nation with GROUPING markers (A-surface)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    base = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return base.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_cust"),
        dsum("c_acctbal").alias("sum_bal"),
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
    )


def q_agg_cube(spark, sf_dir):
    """CUBE over order status × priority with GROUPING markers."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
    )


def q_agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via SQL (distinct from rollup/cube lattices)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_prio
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_agg_minmax_stats(spark, sf_dir):
    """min/max/count over doubles and strings per group."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.min("c_name").alias("first_name"),
        F.max("c_name").alias("last_name"),
        F.count("*").alias("n"),
    )


def q_agg_collect(spark, sf_dir):
    """collect_list/collect_set made deterministic: sorted + joined."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
        F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations_set"),
        F.count("*").alias("n"),
    )


def q_agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HLL++) made oracle-checkable: sketch values
    are engine-specific, so each engine emits the EXACT distinct count
    plus a boolean asserting its own sketch landed within the documented
    error bound (HLL++ default rsd 5% -> check at 3x rsd).  Both sides
    hash-match because both sketches are deterministic and in-bound; the
    mergeable sketch is still what runs at 100 TB (exact distinct is the
    verification twin)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey") - F.countDistinct("l_partkey")
            )
            <= 0.15 * F.countDistinct("l_partkey")
        )
        .cast("int")
        .alias("approx_in_bound"),
    )



# Shared moment formulas (stats family): both the Spark query and the
# DuckDB oracle compute sample stddev/variance/correlation/covariance
# from EXACT DECIMAL power sums (n, Σx, Σx², Σxy — all integer-exact at
# scale 2/4) with these literally-identical double expressions, so the
# only floating-point ops are the same IEEE-deterministic sequence on
# the same inputs.  Engine-native stddev/corr/covar use different update
# formulas + summation orders and are NOT hash-stable across engines.
_MOMENT_SUMS = """
    COUNT(*) AS n,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS spp,
    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sqq,
    SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sqp,
    SUM(CAST(l_discount AS DECIMAL(18,2))) AS sdisc,
    SUM(CAST(l_tax AS DECIMAL(18,2))) AS stax,
    SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2))) AS sdt
"""

def _dd(s: str) -> str:
    """Deterministic DECIMAL -> DOUBLE: a direct CAST of a >16-significant-
    digit decimal is NOT correctly rounded identically across engines
    (measured: DuckDB differs from Java BigDecimal by 1 ulp on
    7096786968835.8685).  Split into FLOOR (exact BIGINT; int64->double
    conversion is correctly rounded everywhere) and a 4-decimal fraction
    scaled to an exact integer, then rebuild with the same IEEE op
    sequence on both engines — bit-identical by construction."""
    return (
        f"(CAST(CAST(FLOOR({s}) AS BIGINT) AS DOUBLE)"
        f" + CAST(CAST(({s} - FLOOR({s})) * 10000 AS BIGINT) AS DOUBLE) / 10000.0)"
    )


_MOMENT_EXPRS = {
    "sd_price": f"sqrt(({_dd('spp')} - {_dd('sp')} * {_dd('sp')} / n) / (n - 1))",
    "var_qty": f"({_dd('sqq')} - {_dd('sq')} * {_dd('sq')} / n) / (n - 1)",
    "corr_qty_price": (
        f"({_dd('sqp')} - {_dd('sq')} * {_dd('sp')} / n)"
        f" / sqrt(({_dd('sqq')} - {_dd('sq')} * {_dd('sq')} / n)"
        f" * ({_dd('spp')} - {_dd('sp')} * {_dd('sp')} / n))"
    ),
    "cov_disc_tax": f"({_dd('sdt')} - {_dd('sdisc')} * {_dd('stax')} / n) / (n - 1)",
}


def q_agg_stats_moments(spark, sf_dir):
    """Statistical aggregate family: sample stddev / variance / correlation
    / covariance, derived from exact DECIMAL power sums via the shared
    _MOMENT_EXPRS formulas (identical text on the oracle side) — the
    hash-stable convention this project uses for all double aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    sums = [e.strip() for e in _MOMENT_SUMS.strip().split(",\n")]
    agg_exprs = [F.expr(s) for s in sums]
    return (
        li.groupBy("l_returnflag")
        .agg(*agg_exprs)
        .selectExpr(
            "l_returnflag",
            *[f"{expr} AS {name}" for name, expr in _MOMENT_EXPRS.items()],
            "n",
        )
    )


def q_agg_bitwise(spark, sf_dir):
    """Bitwise aggregate family: AND/OR/XOR folds of event ids per user —
    integer-exact across engines."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.bit_and("event_id").alias("ids_and"),
        F.bit_or("event_id").alias("ids_or"),
        F.bit_xor("event_id").alias("ids_xor"),
        F.count("*").alias("n"),
    )


def q_agg_session_windows_batch(spark, sf_dir):
    """Native F.session_window in BATCH (30-min gap): per-user sessions
    with bounds and event counts — the batch twin of the streaming
    session-window query and of the grouped-map sessionize UDx.  Oracle:
    classic gaps-and-islands SQL."""
    ev = _t(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts"), "30 minutes")
    return (
        ev.groupBy("user_id", sw)
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            # NTZ-to-NTZ diff: session-timezone-independent epoch µs
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                " session_window.start)"
            ).alias("session_start_us"),
            "n_events",
        )
    )


def q_agg_salted_skew(spark, sf_dir):
    """Skew-immune salted aggregation (SURVEY.md §4): event_type has only
    5 values — an unsalted groupBy funnels 1/5 of the table through each
    of 5 reducers.  Salting on hash(event_id) distributes the first pass
    across 32×5 sub-groups; the finish pass moves 160 rows."""
    from ..operators.relational import salted_agg

    ev = _t(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        F.col("event_id"),
        {
            "n_events": (F.col("event_id"), "count"),
            "sum_value": (F.col("value").cast("decimal(18,2)"), "sum"),
            "max_ts_us": (F.col("ts_us"), "max"),
        },
        n_salts=32,
    )
    return out.select(
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        "max_ts_us",
    )


# ------------------------------------------------------------------ windows

def q_win_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer (row_number ranking window; unique
    tiebreak keeps it deterministic across engines)."""
    o = _t(spark, sf_dir, "orders")
    return topk_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )


def q_win_rank(spark, sf_dir):
    """rank / dense_rank with ties (same ordering both engines)."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


def q_win_lag_lead(spark, sf_dir):
    """lag/lead over per-user event time (analytic window family)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    )


def q_win_running_sum(spark, sf_dir):
    """Running aggregate over a rows frame.  Decimal accumulation: window
    sums are NOT a plain left fold in every engine (DuckDB uses a segment
    tree), so double running sums are not portable — decimal is exact."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).alias("order_seq"),
    )


def q_win_distribution(spark, sf_dir):
    """ntile / percent_rank / cume_dist distribution windows."""
    c = _t(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


def q_win_frame_analytics(spark, sf_dir):
    """first_value / last_value / IGNORE NULLS frames (SURVEY.md §2.5):
    per-user running forward-fill of the last purchase value (the classic
    `last_value ignore nulls` training-pipeline op), plus whole-partition
    first/last frames."""
    ev = _t(spark, sf_dir, "events")
    order = [F.col("ts_us").asc(), F.col("event_id").asc()]
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        F.last(purchase_val, ignorenulls=True).over(w_run).alias("ffill_purchase"),
        F.first("value").over(w_run).alias("first_value_seen"),
        F.last("value").over(w_all).alias("final_value"),
    )


def q_win_range_frame(spark, sf_dir):
    """RANGE-framed window (value-based frame, vs win_running_sum's
    ROWS frame): per order, the customer's order count and exact-decimal
    spend over the preceding 30 days (inclusive)."""
    o = _t(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        day.alias("day_no"),
        F.count("*").over(w).alias("n_orders_30d"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


def q_series_gap_fill(spark, sf_dir):
    """Time-series densification: month spine via sequence+explode, left
    join of monthly order counts — empty months appear with zero counts
    (the gap-fill shape every time-series rollup needs)."""
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 month)")).alias("month")
    )
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(F.count("*").alias("n_orders"))
    return (
        spine.join(monthly, "month", "left")
        .select(
            F.date_format("month", "yyyy-MM").alias("month"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )


def q_agg_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (median / p90 / p99) per group —
    Spark `percentile` ≡ SQL percentile_cont ≡ DuckDB quantile_cont.
    Rounded to 6 decimals: the lerp is evaluated in double on both
    engines, identical operand order."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("p99"),
        F.count("*").alias("n"),
    )


def q_agg_approx_percentiles(spark, sf_dir):
    """Sketch-based percentiles (percentile_approx) made oracle-checkable:
    the sketches differ across engines (KLL-ish vs t-digest), so each
    engine emits the EXACT interpolated percentile (rounded to 6 — the
    same convention agg_percentiles hash-passes with) plus a boolean
    asserting its own sketch is within 2% relative of exact.  The
    mergeable sketch is still the 100 TB path — map-side sketches
    combine without holding values."""
    li = _t(spark, sf_dir, "lineitem")
    exact50 = F.expr("percentile(l_extendedprice, 0.5)")
    exact90 = F.expr("percentile(l_extendedprice, 0.9)")
    return li.groupBy("l_returnflag").agg(
        F.round(exact50, 6).alias("p50_exact"),
        F.round(exact90, 6).alias("p90_exact"),
        (
            F.abs(F.percentile_approx("l_extendedprice", 0.5, 10000) - exact50)
            <= 0.02 * exact50
        )
        .cast("int")
        .alias("p50_in_bound"),
        (
            F.abs(F.percentile_approx("l_extendedprice", 0.9, 10000) - exact90)
            <= 0.02 * exact90
        )
        .cast("int")
        .alias("p90_in_bound"),
        F.count("*").alias("n"),
    )


def q_scalar_arrays(spark, sf_dir):
    """Array function family (X5 seeds): per-order sorted quantity array —
    size / min / max / fold-sum / slice / contains / distinct.  Arrays are
    emitted as joined strings (engine-portable representation)."""
    li = _t(spark, sf_dir, "lineitem")
    qs = F.col("qs")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.sort_array(F.collect_list(F.col("l_quantity").cast("int"))).alias("qs")
        )
        .select(
            "l_orderkey",
            F.size(qs).alias("n_items"),
            F.array_min(qs).alias("q_min"),
            F.array_max(qs).alias("q_max"),
            F.aggregate(qs, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
            F.array_join(F.slice(qs, 1, 3), ",").alias("first3"),
            F.array_contains(qs, 50).cast("int").alias("has_50"),
            F.size(F.array_distinct(qs)).alias("n_distinct_qty"),
        )
    )


def q_scalar_maps(spark, sf_dir):
    """Map function family (X5): per-region name->key map built with
    map_from_entries; lookups / keys / size extracted to scalars (the
    map machinery is Spark-side, the oracle checks the extracted values)."""
    n = _t(spark, sf_dir, "nation")
    m = F.col("m")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("n_name", "n_nationkey")))
            ).alias("m")
        )
        .select(
            "n_regionkey",
            F.map_entries(m)[0]["key"].alias("first_nation"),
            F.element_at(m, "CANADA").alias("canada_key"),
            F.size(m).alias("n_entries"),
            F.array_join(F.map_keys(m), ",").alias("keys_csv"),
            F.aggregate(
                F.map_values(m), F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("key_sum"),
        )
    )


# --------------------------------------------------------- sort/limit/top-k

def q_topk_global(spark, sf_dir):
    """Global ORDER BY ... LIMIT — Spark's TakeOrderedAndProject (no full
    sort materialization)."""
    o = _t(spark, sf_dir, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(100).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def q_sort_multi_limit(spark, sf_dir):
    """Multi-column sort + limit with fully deterministic key."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .limit(1000)
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
    )


# ----------------------------------------------------------------- set ops

def _set_sides(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c, s


def q_set_ops_distinct(spark, sf_dir):
    """§2.7 set-semantics family in one result: UNION / INTERSECT /
    EXCEPT over the same two sides, tagged by op.  (Formerly three
    registry entries — merged so the whole family fits inside the
    driver's checked prefix; each branch is still the distinct Catalyst
    operator.)"""
    c, s = _set_sides(spark, sf_dir)
    return (
        c.union(s).distinct().select(F.lit("union").alias("op"), "nationkey")
        .unionByName(c.intersect(s).select(F.lit("intersect").alias("op"), "nationkey"))
        .unionByName(c.subtract(s).select(F.lit("except").alias("op"), "nationkey"))
    )


def q_set_ops_all(spark, sf_dir):
    """§2.7 bag-semantics family in one result: UNION ALL / INTERSECT ALL
    (multiplicity = min of sides) / EXCEPT ALL (left minus right),
    tagged by op — multiset compare via the driver's row sort."""
    c, s = _set_sides(spark, sf_dir)
    return (
        c.union(s).select(F.lit("union_all").alias("op"), "nationkey")
        .unionByName(c.intersectAll(s).select(F.lit("intersect_all").alias("op"), "nationkey"))
        .unionByName(c.exceptAll(s).select(F.lit("except_all").alias("op"), "nationkey"))
    )


def q_unpivot_melt(spark, sf_dir):
    """UNPIVOT/melt: wide per-customer numeric columns to long
    (metric, value) form — the inverse of A5's pivot."""
    c = _t(spark, sf_dir, "customer")
    wide = c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey_d"),
    )
    return wide.unpivot("c_custkey", ["acctbal", "nationkey_d"], "metric", "value")


# ----------------------------------------------------------- scalar families

def q_scalar_strings_hex(spark, sf_dir):
    """String function family (T2/F6 analogs: case, substring, length,
    concat, replace, pattern match) PLUS the hex encode/parse round trips
    (O4: the reference's `-S` hex resume-key parsing,
    Cassandra2Aerospike.cpp:126-150, and the dry-run hex projection,
    Utilities.cpp:20-60) — one query, same table, whole T2/F6/O4
    surface."""
    p = _t(spark, sf_dir, "part")
    name_hex = F.hex(F.encode(F.col("p_name"), "UTF-8"))
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.substring("p_name", 1, 5).alias("prefix5"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("novowels"),
        F.col("p_type").rlike("^STANDARD").cast("int").alias("is_standard"),
        F.hex(F.col("p_partkey")).alias("key_hex"),
        F.conv(F.hex(F.col("p_partkey")), 16, 10).cast("bigint").alias("key_back"),
        F.lower(name_hex).alias("name_hex"),
        F.decode(F.unhex(name_hex), "UTF-8").alias("name_back"),
        (F.decode(F.unhex(name_hex), "UTF-8") == F.col("p_name"))
        .cast("int")
        .alias("roundtrip_ok"),
    )


def q_scalar_dates(spark, sf_dir):
    """Date/time family (T1 analogs): extract, trunc, diff vs fixed epoch.

    Every output is session-TZ-independent: month_start stays a DATE
    (``F.trunc``, not ``date_trunc`` which promotes to TIMESTAMP in the
    session zone) and epoch_s is pure day arithmetic from the Unix epoch
    rather than ``unix_timestamp`` (which interprets midnight in the
    session zone).  A driver running under a non-UTC TZ hashes the same
    values as the DuckDB oracle."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.trunc("o_orderdate", "month").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).alias("days_since_92"),
        (F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).cast("bigint") * 86400)
        .alias("epoch_s"),
    )


def q_scalar_math_safe(spark, sf_dir):
    """Math family (abs/ceil/floor/round/sqrt/mod — libm-stable subset)
    PLUS the error-safe cast family: try_divide / try_cast return NULL
    instead of failing the job — the semantics a 100 TB pipeline needs
    when a bad row must not kill a stage (ANSI-mode-safe).  One query,
    same table."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("abs_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.round(F.col("l_discount") * 100, 0).alias("disc_pct"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "price_per_disc"
        ),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.col("l_linenumber").cast("string").try_cast("int").alias("ln_roundtrip"),
        F.concat(F.lit("x"), F.col("l_returnflag")).try_cast("double").alias(
            "bad_double"
        ),
    )


def q_scalar_conditional(spark, sf_dir):
    """CASE / COALESCE / NULLIF / greatest / least."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_nb"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap1k"),
    )




def q_scalar_json(spark, sf_dir):
    """JSON family (X5 multimodal props): extraction + typed cast."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_mod10"),
    )


QUERIES = {
    "join_inner": q_join_inner,
    "join_left": q_join_left,
    "join_right": q_join_right,
    "join_full_outer": q_join_full_outer,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_broadcast_star": q_join_broadcast_star,
    "join_range_theta": q_join_range_theta,
    "join_asof": q_join_asof,
    "join_bucketed_colocated": q_join_bucketed_colocated,
    "agg_pricing_summary": q_agg_pricing_summary,
    "agg_distinct": q_agg_distinct,
    "agg_rollup": q_agg_rollup,
    "agg_cube": q_agg_cube,
    "agg_grouping_sets": q_agg_grouping_sets,
    "agg_minmax_stats": q_agg_minmax_stats,
    "agg_collect": q_agg_collect,
    "agg_approx_distinct": q_agg_approx_distinct,
    "agg_stats_moments": q_agg_stats_moments,
    "agg_bitwise": q_agg_bitwise,
    "agg_session_windows_batch": q_agg_session_windows_batch,
    "agg_salted_skew": q_agg_salted_skew,
    "win_topk_per_group": q_win_topk_per_group,
    "win_rank": q_win_rank,
    "win_lag_lead": q_win_lag_lead,
    "win_running_sum": q_win_running_sum,
    "win_distribution": q_win_distribution,
    "win_frame_analytics": q_win_frame_analytics,
    "win_range_frame": q_win_range_frame,
    "series_gap_fill": q_series_gap_fill,
    "agg_percentiles": q_agg_percentiles,
    "agg_approx_percentiles": q_agg_approx_percentiles,
    "scalar_arrays": q_scalar_arrays,
    "scalar_maps": q_scalar_maps,
    "topk_global": q_topk_global,
    "sort_multi_limit": q_sort_multi_limit,
    "set_ops_distinct": q_set_ops_distinct,
    "set_ops_all": q_set_ops_all,
    "unpivot_melt": q_unpivot_melt,
    "scalar_strings_hex": q_scalar_strings_hex,
    "scalar_dates": q_scalar_dates,
    "scalar_math_safe": q_scalar_math_safe,
    "scalar_conditional": q_scalar_conditional,
    "scalar_json": q_scalar_json,
}

ORACLES = {
    "join_inner": """
        SELECT o_orderkey, c_custkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    "join_left": """
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "join_right": """
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
    "join_full_outer": """
        WITH c AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
             s AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
        SELECT coalesce(c_nationkey, s_nationkey) AS nationkey, n_cust, n_supp
        FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "join_broadcast_star": """
        SELECT p_brand, n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                    AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY p_brand, n_name
    """,
    "join_range_theta": """
        WITH buckets AS (
          SELECT DISTINCT p_size - p_size % 10 AS lo, p_size - p_size % 10 + 9 AS hi,
                 CAST((p_size - p_size % 10) / 10 AS INT) AS bucket
          FROM part
        )
        SELECT bucket, count(*) AS n_parts,
               CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM part JOIN buckets ON p_size >= lo AND p_size <= hi
        GROUP BY bucket
    """,
    "join_bucketed_colocated": """
        SELECT o_orderkey, count(*) AS n_items,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               min(o_totalprice) AS totalprice
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderkey
    """,
    "join_asof": """
        SELECT p.event_id, p.user_id, p.p_ts, p.amount, v.v_ts AS last_view_ts
        FROM (SELECT event_id, user_id, epoch_us(ts) AS p_ts, value AS amount
              FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN
             (SELECT user_id, epoch_us(ts) AS v_ts
              FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id AND p.p_ts >= v.v_ts
    """,
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                    AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                        * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2))))
                    AS DOUBLE) AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
               CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "agg_distinct": """
        SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT l_partkey) AS n_part,
               count(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_approx_distinct": """
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS exact_parts,
               CAST(abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
                    <= 0.15 * count(DISTINCT l_partkey) AS INT) AS approx_in_bound
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_rollup": """
        SELECT r_name, n_name, count(*) AS n_cust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
               CAST(grouping(r_name) AS INT) AS g_region,
               CAST(grouping(n_name) AS INT) AS g_nation
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    "agg_cube": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "agg_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "agg_minmax_stats": """
        SELECT c_nationkey,
               min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
               min(c_name) AS first_name, max(c_name) AS last_name,
               count(*) AS n
        FROM customer GROUP BY c_nationkey
    """,
    "agg_collect": """
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations_set,
               count(*) AS n
        FROM nation GROUP BY n_regionkey
    """,
    "agg_stats_moments": """
        WITH s AS (
            SELECT l_returnflag, {moment_sums}
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               {sd_price} AS sd_price,
               {var_qty} AS var_qty,
               {corr_qty_price} AS corr_qty_price,
               {cov_disc_tax} AS cov_disc_tax,
               n
        FROM s
    """.format(moment_sums=_MOMENT_SUMS, **_MOMENT_EXPRS),
    "agg_bitwise": """
        SELECT user_id,
               bit_and(event_id) AS ids_and,
               bit_or(event_id) AS ids_or,
               bit_xor(event_id) AS ids_xor,
               count(*) AS n
        FROM events GROUP BY user_id
    """,
    "agg_session_windows_batch": """
        WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        m AS (
          SELECT user_id, tus,
                 CASE WHEN lag(tus) OVER w IS NULL
                        OR tus - lag(tus) OVER w > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
        ),
        s AS (
          SELECT user_id, tus,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM m
        )
        SELECT user_id, min(tus) AS session_start_us, count(*) AS n_events
        FROM s GROUP BY user_id, sid
    """,
    "agg_salted_skew": """
        SELECT event_type, count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
               max(epoch_us(ts)) AS max_ts_us
        FROM events GROUP BY event_type
    """,
    "win_topk_per_group": """
        SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3
    """,
    "win_rank": """
        SELECT p_brand, p_partkey, p_retailprice,
               rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        FROM part
        WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    """,
    "win_lag_lead": """
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
               lag(value) OVER w AS prev_value,
               lead(value) OVER w AS next_value,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
    "win_running_sum": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS order_seq
        FROM orders
    """,
    "win_distribution": """
        SELECT c_custkey, c_acctbal,
               ntile(4) OVER w AS quartile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM customer
        WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    "win_frame_analytics": """
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
               last_value(CASE WHEN event_type = 'purchase' THEN value END
                          IGNORE NULLS) OVER w_run AS ffill_purchase,
               first_value(value) OVER w_run AS first_value_seen,
               last_value(value) OVER w_all AS final_value
        FROM events
        WINDOW w_run AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS UNBOUNDED PRECEDING),
               w_all AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "win_range_frame": """
        SELECT o_orderkey, o_custkey,
               CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) AS INT) AS day_no,
               count(*) OVER w AS n_orders_30d,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
                     RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
    "series_gap_fill": """
        WITH bounds AS (
          SELECT date_trunc('month', min(o_orderdate)) AS lo,
                 date_trunc('month', max(o_orderdate)) AS hi
          FROM orders
        ),
        spine AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month FROM bounds
        ),
        monthly AS (
          SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n_orders
          FROM orders GROUP BY 1
        )
        SELECT strftime(s.month, '%Y-%m') AS month,
               coalesce(m.n_orders, 0) AS n_orders
        FROM spine s LEFT JOIN monthly m ON s.month = m.month
    """,
    "agg_percentiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
               round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
               round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "agg_approx_percentiles": """
        SELECT l_returnflag,
               round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_exact,
               round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_exact,
               CAST(abs(approx_quantile(l_extendedprice, 0.5) - quantile_cont(l_extendedprice, 0.5))
                    <= 0.02 * quantile_cont(l_extendedprice, 0.5) AS INT) AS p50_in_bound,
               CAST(abs(approx_quantile(l_extendedprice, 0.9) - quantile_cont(l_extendedprice, 0.9))
                    <= 0.02 * quantile_cont(l_extendedprice, 0.9) AS INT) AS p90_in_bound,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    "scalar_arrays": """
        WITH qa AS (
          SELECT l_orderkey,
                 list_sort(list(CAST(l_quantity AS INT))) AS qs
          FROM lineitem GROUP BY l_orderkey
        )
        SELECT l_orderkey,
               len(qs) AS n_items,
               list_aggregate(qs, 'min') AS q_min,
               list_aggregate(qs, 'max') AS q_max,
               CAST(list_aggregate(qs, 'sum') AS BIGINT) AS q_sum,
               array_to_string(qs[1:3], ',') AS first3,
               CAST(list_contains(qs, 50) AS INT) AS has_50,
               len(list_distinct(qs)) AS n_distinct_qty
        FROM qa
    """,
    "scalar_maps": """
        SELECT n_regionkey,
               min(n_name) AS first_nation,
               max(CASE WHEN n_name = 'CANADA' THEN n_nationkey END) AS canada_key,
               count(*) AS n_entries,
               string_agg(n_name, ',' ORDER BY n_name) AS keys_csv,
               CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        FROM nation GROUP BY n_regionkey
    """,
    "topk_global": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "sort_multi_limit": """
        SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        FROM lineitem ORDER BY l_shipdate, l_orderkey, l_linenumber LIMIT 1000
    """,
    "set_ops_distinct": """
        SELECT 'union' AS op, nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'intersect' AS op, nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          INTERSECT SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'except' AS op, nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          EXCEPT SELECT s_nationkey FROM supplier)
    """,
    "set_ops_all": """
        SELECT 'union_all' AS op, nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION ALL SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'intersect_all' AS op, nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          INTERSECT ALL SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'except_all' AS op, nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          EXCEPT ALL SELECT s_nationkey FROM supplier)
    """,
    "unpivot_melt": """
        SELECT c_custkey, metric, value FROM (
          SELECT c_custkey, acctbal, nationkey_d FROM (
            SELECT c_custkey, c_acctbal AS acctbal,
                   CAST(c_nationkey AS DOUBLE) AS nationkey_d
            FROM customer)
        ) UNPIVOT (value FOR metric IN (acctbal, nationkey_d))
    """,
    "scalar_strings_hex": """
        SELECT p_partkey,
               upper(p_name) AS uname,
               lower(p_brand) AS lbrand,
               substring(p_name, 1, 5) AS prefix5,
               length(p_name) AS name_len,
               concat_ws('|', p_brand, p_type) AS brand_type,
               regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels,
               CAST(regexp_matches(p_type, '^STANDARD') AS INT) AS is_standard,
               upper(to_hex(p_partkey)) AS key_hex,
               CAST(p_partkey AS BIGINT) AS key_back,
               lower(hex(encode(p_name))) AS name_hex,
               decode(from_hex(hex(encode(p_name)))) AS name_back,
               CAST(decode(from_hex(hex(encode(p_name)))) = p_name AS INT) AS roundtrip_ok
        FROM part
    """,
    "scalar_dates": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               CAST(day(o_orderdate) AS INT) AS dom,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
               CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS INT)
                   AS days_since_92,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
                   * 86400 AS epoch_s
        FROM orders
    """,
    "scalar_math_safe": """
        SELECT l_orderkey, l_linenumber,
               abs(l_quantity - 25) AS abs_dev,
               CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
               CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
               round(l_discount * 100, 0) AS disc_pct,
               sqrt(l_quantity) AS qty_sqrt,
               l_orderkey % 7 AS key_mod7,
               l_quantity * l_quantity AS qty_sq,
               CASE WHEN l_discount = 0 THEN NULL
                    ELSE l_extendedprice / l_discount END AS price_per_disc,
               TRY_CAST(l_returnflag AS INT) AS flag_as_int,
               TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INT) AS ln_roundtrip,
               TRY_CAST('x' || l_returnflag AS DOUBLE) AS bad_double
        FROM lineitem
    """,
    "scalar_conditional": """
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                    WHEN c_acctbal < 5000 THEN 'standard'
                    ELSE 'premium' END AS tier,
               coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_nb,
               greatest(c_acctbal, 0.0) AS bal_floor0,
               least(c_acctbal, 1000.0) AS bal_cap1k
        FROM customer
    """,
    "scalar_json": """
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
               CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod10
        FROM events
    """,
}
