"""Generic analytics operators over the TPC-H-ish tables — the
engine-coverage demonstrations for SURVEY.md §2 operator classes that
the KG pipeline itself doesn't exercise: multi-way joins with
broadcast dimensions, windowed top-k, anti-joins, min-priority
election, pivot-style conditional aggregation.

Float outputs are rounded to 6 decimals so the DuckDB oracle
hash-matches (sum order differs between engines only below that).

Scale notes: dimension tables (region/nation, and customer at small
SF) are broadcast — `F.broadcast` hints where Catalyst's threshold
wouldn't fire on statistics alone; fact-fact joins shuffle on their
keys with AQE handling skew/coalesce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (scan + filter + wide agg;
    predicate and the 6-column projection push into the parquet scan)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-style multi-way join: fact-fact shuffle joins + broadcast
    dimension chain supplier→nation→region."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


def top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k: highest-revenue customer per nation
    (row_number over revenue desc with custkey tie-break)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("revenue").desc(), F.col("c_custkey").asc()
    )
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "c_nationkey",
            F.col("c_custkey").alias("top_custkey"),
            "revenue",
        )
    )


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (SURVEY §2.6 SO1 analog: set difference by key)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def first_lineitem_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-priority election (reference analog: lowest-priority profile
    pick, cimpy/cimexport.py:196-214): the min-linenumber lineitem per
    order via min_by — single hash agg, no window sort."""
    li = _t(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is not unique in this data — elect on
    # the full struct so the min is a total (deterministic) order.
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.min(F.struct("l_linenumber", "l_partkey", "l_quantity")).alias("s")
        )
        .select(
            "l_orderkey",
            F.col("s.l_linenumber").alias("first_line"),
            F.col("s.l_partkey").alias("first_partkey"),
            F.round(F.col("s.l_quantity"), 4).alias("first_qty"),
        )
    )


def user_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation over the events stream
    table (grouped metrics, cimpy/cimimport.py:41-66 analog)."""
    ev = _t(spark, sf_dir, "events")
    et = F.col("event_type")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(et == "purchase", 1).otherwise(0)).alias("n_purchases"),
        F.sum(F.when(et == "error", 1).otherwise(0)).alias("n_errors"),
        F.round(F.sum(F.when(et == "purchase", F.col("value")).otherwise(0.0)), 4).alias(
            "purchase_value"
        ),
    )


def event_sessions(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: a new session starts after a >gap idle period
    per user (lag + cumulative-sum window pattern). Returns per-user
    session stats."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts arrives as TIMESTAMP_NTZ; epoch via timestamp cast
    # (session tz UTC == DuckDB's NTZ epoch())
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    sessioned = marked.withColumn("session_id", F.sum("new_session").over(w))
    return (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.round(F.sum("session_value"), 4).alias("total_value"),
        )
    )


def event_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregation in ONE pass: per (event_type,
    hour-of-day), per event_type subtotal, and grand total via
    ``rollup`` (absent in the reference — SURVEY §2.4 flags it as an
    engine addition). Catalyst compiles rollup to a single Expand +
    hash aggregate, so all three levels cost one scan and one shuffle,
    not three queries. `grouping()` flags disambiguate rollup NULLs
    from data NULLs (exported as ints for the oracle)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.hour(F.col("ts").cast("timestamp")).alias("hour_of_day"),
            "value",
        )
        .rollup("event_type", "hour_of_day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("hour_of_day").cast("int").alias("g_hour"),
        )
        .select(
            "event_type",
            F.col("hour_of_day").cast("int").alias("hour_of_day"),
            "n",
            "total_value",
            "g_type",
            "g_hour",
        )
    )


def event_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts (batch analog of the streaming windowed
    aggregation; window start exported as epoch seconds so the oracle
    compares engine-neutrally)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start").cast("timestamp")).alias("hour_epoch"),
            "event_type",
            "n",
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_cols: tuple = ("event_id", "ts"),
    prefix: str = "asof_",
) -> DataFrame:
    """Generic AS-OF join — for every left row, the LATEST right row
    with right.ts <= left.ts per key (attribution, point-in-time
    feature lookup; the operator the brief names as a classic
    "Spark lacks it" custom op; DuckDB grew a native ASOF JOIN, which
    the oracle uses as an INDEPENDENT construction).

    Spark-first shape — the union-and-carry trick, no UDF and no
    range-join explosion: tag right rows 0 and left rows 1, union on
    (key, ts, tag), and one window per key ordered by (ts, tag,
    right event_id) carries the last non-null right payload forward
    (`last(..., ignorenulls)` over UNBOUNDED PRECEDING..CURRENT).
    A right row at exactly left.ts sorts BEFORE the left row (tag
    0 < 1), so ties are inclusive like ASOF's <=. Equal right ts per
    key are resolved BEFORE the union: the right side is pre-deduped
    to one row per (key, ts) — the max-`right_cols[0]` row wins — so
    the tie rule is part of the operator contract rather than
    left to engine-specific window ordering (review finding: DuckDB's
    native ASOF JOIN leaves duplicate-ts selection unspecified, so
    cross-engine parity previously relied on fixtures having no
    duplicate (key, ts) right rows). The dedupe is a map-side
    combinable max aggregate (struct comparison is field-ordered, so
    max(struct) IS max by right_cols[0] then the rest); the carry
    pass remains ONE shuffle on the key, window-sorted — the same
    cost as sessionization, vs the naive per-left-row subquery (a
    correlated range scan).

    Output: all left columns + prefix+c for each requested right
    column (null when no right row precedes)."""
    rtag = (
        right.select(key, ts, F.struct(*right_cols).alias("_p"))
        .groupBy(key, ts)
        .agg(F.max("_p").alias("_payload"))
        .select(key, ts, F.lit(0).alias("_tag"), "_payload")
    )
    ltag = left.withColumn("_tag", F.lit(1)).withColumn(
        "_payload", F.lit(None).cast(rtag.schema["_payload"].dataType)
    )
    u = ltag.select(
        *left.columns, "_tag", "_payload"
    ).unionByName(
        rtag.select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                if c not in (key, ts)
                else F.col(c)
                for c in left.columns
            ],
            "_tag",
            "_payload",
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_tag", F.col("_payload").getField(right_cols[0]))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_m", F.last("_payload", ignorenulls=True).over(w))
    return carried.filter(F.col("_tag") == 1).select(
        *left.columns,
        *[
            F.col("_m").getField(c).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )


def event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-view attribution via `asof_join`: every click joined
    to the user's most recent preceding (or simultaneous) view; gap
    in whole seconds via floor-epoch on both sides (matching
    unix_timestamp semantics in both engines)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(clicks, views, key="user_id", ts="ts")
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("click_epoch"),
        F.round("value", 4).alias("value"),
        F.col("asof_event_id").alias("view_event_id"),
        (F.unix_timestamp("ts") - F.unix_timestamp("asof_ts")).alias("gap_s"),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str = "ts",
    start: str = "start_s",
    end: str = "end_s",
    bin_seconds: int = 600,
) -> DataFrame:
    """Generic interval-containment join — every (point, interval)
    pair of the same key with start <= point.ts <= end (epoch-second
    columns), the range sibling of `asof_join`.

    Spark-first shape — bin bucketing instead of a theta join: each
    interval explodes to the time bins it covers (bounded fan-out:
    len/bin + 1 rows), each point maps to its ONE bin, and the match
    becomes an EQUI-join on (key, bin) + the exact range filter. A
    point lies in exactly one bin, so no dedup pass is needed. Pick
    bin_seconds ~ the typical interval length: shorter bins explode
    intervals wider, longer bins put unrelated rows in one bucket —
    either extreme degrades toward the naive key-only join Catalyst
    would otherwise run (BroadcastNestedLoop or a full per-key
    cross). The DuckDB oracle runs the plain inequality join — an
    independent construction."""
    ib = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.col(start) / bin_seconds).cast("long"),
                (F.col(end) / bin_seconds).cast("long"),
            )
        ),
    )
    pb = points.withColumn("_bin", (F.col(ts) / bin_seconds).cast("long"))
    return (
        pb.join(ib, [key, "_bin"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_bin")
    )


def purchase_click_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks in the 10 minutes up to each purchase (inclusive both
    ends) via `range_join` — the attribution-window query; purchases
    with no clicks report 0 through the left join back."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.unix_timestamp("ts") - 600).alias("start_s"),
        F.unix_timestamp("ts").alias("end_s"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_timestamp("ts").alias("click_s")
    )
    matched = range_join(
        clicks, purchases, key="user_id", ts="click_s"
    )
    counts = matched.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_clicks")
    )
    return purchases.join(counts, "purchase_id", "left").select(
        "purchase_id",
        "user_id",
        "end_s",
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
    )


ANALYTICS_ORACLES = {
    "purchase_click_window": """
        WITH p AS (SELECT event_id AS purchase_id, user_id,
                          CAST(floor(epoch(ts)) AS BIGINT) - 600 AS start_s,
                          CAST(floor(epoch(ts)) AS BIGINT) AS end_s
                   FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS click_s
              FROM events WHERE event_type = 'click'),
        m AS (
          SELECT p.purchase_id, count(*) AS n_clicks
          FROM p JOIN c ON c.user_id = p.user_id
                       AND c.click_s >= p.start_s AND c.click_s <= p.end_s
          GROUP BY p.purchase_id
        )
        SELECT p.purchase_id, p.user_id, p.end_s,
               coalesce(m.n_clicks, 0) AS n_clicks
        FROM p LEFT JOIN m USING (purchase_id)
    """,
    "event_attribution": """
        WITH c AS (SELECT event_id, user_id, ts, value FROM events
                   WHERE event_type = 'click'),
        -- pre-dedupe to one view per (user_id, ts), max event_id wins:
        -- the asof_join tie contract (native ASOF leaves duplicate-ts
        -- selection unspecified)
        v AS (SELECT max(event_id) AS event_id, ts, user_id FROM events
              WHERE event_type = 'view' GROUP BY user_id, ts)
        SELECT c.event_id, c.user_id,
               CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch,
               round(c.value, 4) AS value,
               v.event_id AS view_event_id,
               CAST(floor(epoch(c.ts)) AS BIGINT)
                 - CAST(floor(epoch(v.ts)) AS BIGINT) AS gap_s
        FROM c ASOF LEFT JOIN v
          ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
    "event_type_rollup": """
        SELECT event_type, hour_of_day,
               count(*) AS n,
               round(sum(value), 4) AS total_value,
               CAST(GROUPING(event_type) AS INT) AS g_type,
               CAST(GROUPING(hour_of_day) AS INT) AS g_hour
        FROM (SELECT event_type,
                     CAST(extract(hour FROM ts) AS INT) AS hour_of_day,
                     value
              FROM events)
        GROUP BY ROLLUP(event_type, hour_of_day)
    """,
    "event_sessions": """
        WITH marked AS (
          SELECT user_id, value,
                 CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session,
                 ts, event_id
          FROM events
        ),
        sessioned AS (
          SELECT user_id, value,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
          FROM marked
        ),
        per_session AS (
          SELECT user_id, session_id, count(*) AS n_events,
                 round(sum(value), 4) AS session_value
          FROM sessioned GROUP BY user_id, session_id
        )
        SELECT user_id, count(*) AS n_sessions,
               max(n_events) AS max_session_events,
               round(sum(session_value), 4) AS total_value
        FROM per_session GROUP BY user_id
    """,
    "event_hourly_counts": """
        SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS hour_epoch,
               event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "tpch_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "tpch_revenue_by_nation": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "top_customer_per_nation": """
        WITH rev AS (
          SELECT c_nationkey, c_custkey, round(sum(o_totalprice), 4) AS revenue
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_nationkey, c_custkey
        )
        SELECT c_nationkey, c_custkey AS top_custkey, revenue FROM (
          SELECT *, row_number() OVER (
            PARTITION BY c_nationkey ORDER BY revenue DESC, c_custkey ASC) AS rk
          FROM rev
        ) WHERE rk = 1
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "first_lineitem_per_order": """
        SELECT l_orderkey, first_line, first_partkey, first_qty FROM (
          SELECT l_orderkey, l_linenumber AS first_line,
                 l_partkey AS first_partkey, round(l_quantity, 4) AS first_qty,
                 row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_quantity) AS rk
          FROM lineitem
        ) WHERE rk = 1
    """,
    "user_event_profile": """
        SELECT user_id,
               count(*) AS n_events,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
               round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 4)
                 AS purchase_value
        FROM events GROUP BY user_id
    """,
}
