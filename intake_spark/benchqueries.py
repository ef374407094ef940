"""Headline query registry: Spark builder + DuckDB oracle SQL per operator.

Every relational verb of the reference's declarative dataframe surface
(intake/source/derived.py:316-478 — cols/query/assign/join/merge/concat/
groupby/accessors) and each LLM-pipeline operator gets one named query here,
run against the driver's synthetic tables (TESTDATA.md).

Determinism policy for double aggregates: per-row double arithmetic is
IEEE-identical across engines, but *summation order* is not. So sums are
taken over values cast to DECIMAL (exact, associative) and the final result
cast back to DOUBLE; averages divide that exact sum by the count in double.
Both the Spark builder and the oracle SQL apply the same policy, making the
value-hash comparison exact rather than approximate.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from intake_spark.session import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    if "\n" in name or len(name) > 80:
        raise ValueError(
            "register() name looks like SQL — the name argument was dropped: "
            + name[:60]
        )

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


def dsum(col, scale: int = 2):
    """Exact decimal sum of a double expression, returned as double."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


def davg(col, scale: int = 4):
    """Order-insensitive average: exact decimal sum / count, in double."""
    c = col if not isinstance(col, str) else F.col(col)
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double") / F.count(F.lit(1))


# ---------------------------------------------------------------------------
# Relational verbs (SURVEY §2.7 — the DataFramePipeline operator surface)
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,8))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style scan+hash-aggregate. groupby/agg verb
    (reference derived.py:316-478 delegates this to the backend; here it is
    a single Spark hash aggregate with partial map-side combine)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, 8).alias("sum_disc_price"),
            dsum(charge, 8).alias("sum_charge"),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_discount", 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q02_select_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_quantity < 10
    """,
)
def q02_select_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cols + query verbs (projection/filter pushed to the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "q03_top_orders_revenue",
    """
    SELECT l.l_orderkey AS orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS TIMESTAMP_NS) AS orderdate, o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q03_top_orders_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style join+agg+topN. merge verb ×2; customer is broadcast
    (small dim) so only the lineitem↔orders shuffle remains."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 8).alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "priority")
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


@register(
    "q04_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi join (Catalyst keeps it shuffle-side-pruned)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q05_nation_volume",
    """
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q05_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join: every dim (customer/nation/region) broadcast, so the
    fact table never shuffles before the final aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 8).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


@register(
    "q06_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,8))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 25
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style selective scan→single aggregate; all predicates push
    down to the parquet reader."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.08)
        & (F.col("l_quantity") < 25)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 8).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q07_topn_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q07_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort+limit verb — Spark executes as TakeOrderedAndProject (per-partition
    top-N then driver merge), no full sort at scale."""
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(20).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "q08_distinct_segments",
    """
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def q08_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct verb (hash aggregate with map-side partial dedup)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "q09_assign_charge",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS qty_class
    FROM lineitem
    WHERE l_returnflag = 'R'
    """,
)
def q09_assign_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """assign verb: per-row computed columns (pure codegen'd projection;
    per-row double math is IEEE-identical across engines so no rounding)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "charge"
        ),
        F.when(F.col("l_quantity") >= 25, "bulk").otherwise("small").alias("qty_class"),
    )


@register(
    "q10_window_top_orders",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q10_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window verb: per-group top-3 via row_number (single shuffle on the
    partition key; AQE handles skewed customers)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("long").alias("rn"))
    )


@register(
    "q11_date_accessors",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q11_date_accessors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dt.* accessor verbs (reference derived.py:405-409) → year()/month()."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total"))
        .orderBy("order_year", "order_month")
    )


@register(
    "q12_concat_buckets",
    """
    SELECT o_orderkey, o_totalprice, 'high' AS bucket FROM orders WHERE o_totalprice > 400000
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'low' AS bucket FROM orders WHERE o_totalprice < 20000
    """,
)
def q12_concat_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat verb (axis=0) → unionByName of two filtered lineages."""
    o = load_table(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", "o_totalprice", F.lit("high").alias("bucket")
    )
    lo = o.filter(F.col("o_totalprice") < 20000).select(
        "o_orderkey", "o_totalprice", F.lit("low").alias("bucket")
    )
    return hi.unionByName(lo)


@register(
    "q13_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    """,
)
def q13_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join. The orders side is restricted to a date
    window so the result is non-empty at every test SF (an unrestricted
    anti-join matches on an empty frame, which verifies nothing)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q14_event_type_matrix",
    """
    SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP_NS) AS day,
           COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
           COUNT(*) FILTER (WHERE event_type = 'view') AS views,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
           COUNT(*) FILTER (WHERE event_type = 'error') AS errors,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signups
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def q14_event_type_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot-style conditional aggregation over the events stream table."""
    ev = load_table(spark, sf_dir, "events")
    cnt = lambda t: F.count(F.when(F.col("event_type") == t, 1)).alias(t + "s")  # noqa: E731
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            cnt("click"),
            cnt("view"),
            cnt("purchase"),
            cnt("error"),
            cnt("signup"),
        )
        .orderBy("day")
    )


@register(
    "q15_rollup_region_nation",
    """
    SELECT r.r_name AS region, n.n_name AS nation, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def q15_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rollup (hierarchical subtotals) — Spark .rollup() ≡ SQL GROUP BY ROLLUP."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"), "c_acctbal")
        .rollup("region", "nation")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal").alias("acctbal"))
    )


@register(
    "q16_json_props",
    """
    SELECT event_type,
           CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS k_total,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def q16_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """semi-structured extraction from the JSON props column (regexp path;
    the engine also exposes get_json_object — same plan shape)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k": (\d+)', 1).cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(F.sum(k).alias("k_total"), F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@register(
    "q17_hourly_windows",
    """
    SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP_NS) AS window_start,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)
def q17_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows — batch-equivalent of the
    streaming windowed aggregation (intake_spark.streaming uses the same
    expression over readStream with a watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", 6).alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "n_users", "value_sum")
        .orderBy("window_start")
    )


@register(
    "q18_asof_join",
    """
    WITH clicks AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) rn
        FROM events WHERE event_type = 'click') WHERE rn = 1),
    purch AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP_NS) AS ts, CAST(c.ts AS TIMESTAMP_NS) AS ts_right, c.value AS click_value
    FROM purch p ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q18_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (intake_spark.operators.asof_join): each purchase
    matched to the user's latest prior click. Union+window formulation —
    one shuffle on user_id, no range explosion; oracle is DuckDB's native
    ASOF JOIN, so the exotic operator is still exact-value-checked."""
    from intake_spark.operators import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", F.col("value").alias("click_value"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    return asof_join(purch, clicks, on="ts", by="user_id")


@register(
    "q19_interval_join",
    """
    SELECT s.event_id AS signup_id, COUNT(c.event_id) AS clicks_next_day
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      ON s.user_id = c.user_id
     AND c.ts >= s.ts AND c.ts <= s.ts + INTERVAL 1 DAY
    GROUP BY s.event_id
    """,
)
def q19_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded time-range join (intake_spark.operators.interval_join):
    clicks within 24h after each signup, counted. Equi-key shuffle with a
    join-side range predicate — never a cross join."""
    from intake_spark.operators import interval_join

    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", F.col("ts").alias("s_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    joined = interval_join(
        signups,
        clicks,
        by="user_id",
        left_ts="s_ts",
        right_ts="c_ts",
        lower=F.expr("INTERVAL 0 SECOND"),
        upper=F.expr("INTERVAL 1 DAY"),
        how="left",
    )
    return joined.groupBy("signup_id").agg(F.count("click_id").alias("clicks_next_day"))


@register(
    "q34_percentiles",
    """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q34_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (Spark `percentile`
    ≡ DuckDB `quantile_cont`, verified bit-equal). At 100 TB swap for
    `approx_percentile` (t-digest) — kept exact here for oracle checking."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
            F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q36_streaming_hourly",
    """
    SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP_NS) AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1
    """,
)
def q36_streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming execution, oracle-checked: events parquet
    replayed as a file stream → watermarked tumbling windows → available-now
    trigger into a memory sink; the returned DataFrame reads the sink table.
    The oracle is plain batch SQL — watermark semantics drop nothing in a
    bounded replay, so stream results must equal the batch aggregate."""
    # nanosAsLong is needed while the TIMESTAMP(NANOS) file is planned and
    # scanned (the stream clones the session conf at .start()); save the
    # caller's value at entry and restore once the bounded stream has
    # terminated, so the legacy setting can't leak into later queries
    # sharing the session.
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    try:
        from pyspark.sql.types import LongType

        batch = load_table(spark, sf_dir, "events")
        # load_table restores the conf before returning, so set it here for
        # the schema probe AND the stream itself (which clones the session
        # conf at .start()) — without it a TIMESTAMP(NANOS) file fails to
        # plan with "Illegal Parquet type: INT64 (TIMESTAMP(NANOS,...))".
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
        ts_is_long = isinstance(raw_schema["ts"].dataType, LongType)
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        # Watermarks require LTZ; both branches normalize ts to the instant
        # whose epoch-micros equal the file's naive wall clock read as UTC.
        # Windows then tumble on epoch-aligned instants (tz-independent
        # counts) and only the *displayed* boundary converts back to the
        # naive wall clock (below).
        if ts_is_long:
            stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # µs file reads as TIMESTAMP_NTZ: naive-epoch *arithmetic*
            # via FIELD EXTRACTION (ntz_epoch_micros) — no wall-clock↔zone
            # round-trip, so there is no DST ambiguity in any session
            # timezone. (timestampdiff on NTZ is NOT safe: Spark coerces
            # it through the session zone, so a spring-forward-gap wall
            # clock like 02:30 on the transition day silently shifts an
            # hour — found by direct measurement under America/New_York.)
            from intake_spark.session import ntz_epoch_micros

            stream = stream.withColumn(
                "ts", F.timestamp_micros(ntz_epoch_micros("ts"))
            )
        _ = batch  # documents the batch-equivalence contract
        agg = (
            stream.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                dsum("value", 6).alias("value_sum"),
            )
            .select(
                # instant → naive-UTC boundary, again by pure epoch
                # arithmetic (unix_micros reads the instant; the NTZ add
                # never consults a timezone) — DST-safe display
                F.expr(
                    "timestampadd(MICROSECOND, unix_micros(w.start), "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ).alias("window_start"),
                "n_events",
                "value_sum",
            )
        )
        name = "q36_sink"
        from intake_spark.streaming import drain_stream

        drain_stream(
            lambda: (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            ),
            300,
            what="q36 stream",
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return spark.table(name)


@register(
    "q37_set_ops",
    """
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    UNION ALL
    (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
     EXCEPT
     SELECT c_nationkey FROM customer WHERE c_mktsegment = 'HOUSEHOLD')
    """,
)
def q37_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: INTERSECT / EXCEPT / UNION ALL composition."""
    c = load_table(spark, sf_dir, "customer")
    seg = lambda s: c.filter(F.col("c_mktsegment") == s).select("c_nationkey")  # noqa: E731
    inter = seg("BUILDING").intersect(seg("MACHINERY"))
    minus = seg("AUTOMOBILE").subtract(seg("HOUSEHOLD"))  # EXCEPT (distinct)
    return inter.unionAll(minus)


@register(
    "q38_string_funcs",
    """
    SELECT c_custkey,
           concat(upper(c_mktsegment), '-', CAST(c_nationkey AS VARCHAR)) AS seg_key,
           substr(c_name, 1, 8) AS name8,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           replace(lower(c_name), 'customer', 'cust') AS short_name,
           length(c_name) AS name_len
    FROM customer
    """,
)
def q38_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: concat/upper/substr/lpad/replace/length
    (the str.* accessor family, derived.py:405-409)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.upper("c_mktsegment"), F.lit("-"), F.col("c_nationkey").cast("string")).alias(
            "seg_key"
        ),
        F.substring("c_name", 1, 8).alias("name8"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.replace(F.lower("c_name"), F.lit("customer"), F.lit("cust")).alias("short_name"),
        F.length("c_name").cast("long").alias("name_len"),
    )


@register(
    "q39_math_funcs",
    """
    SELECT o_orderkey,
           abs(o_totalprice - 250000.0) AS dist_mid,
           CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS price_k_ceil,
           CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_k_floor,
           sqrt(o_totalprice) AS price_sqrt,
           o_totalprice * o_totalprice AS price_sq
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def q39_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface: abs/ceil/floor/sqrt/product — all IEEE-deterministic
    per row (ln/exp deliberately excluded: libm rounding differs across
    engines)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return o.select(
        "o_orderkey",
        F.abs(F.col("o_totalprice") - 250000.0).alias("dist_mid"),
        F.ceil(F.col("o_totalprice") / 1000.0).cast("long").alias("price_k_ceil"),
        F.floor(F.col("o_totalprice") / 1000.0).cast("long").alias("price_k_floor"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        (F.col("o_totalprice") * F.col("o_totalprice")).alias("price_sq"),
    )


@register(
    "q40_grouping_sets",
    """
    SELECT r.r_name AS region, c.c_mktsegment AS segment, COUNT(*) AS n
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r.r_name), (c.c_mktsegment), (r.r_name, c.c_mktsegment))
    """,
)
def q40_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube's fixed shapes)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    j.createOrReplaceTempView("q40_joined")
    return spark.sql(
        """
        SELECT r_name AS region, c_mktsegment AS segment, COUNT(*) AS n
        FROM q40_joined
        GROUP BY GROUPING SETS ((r_name), (c_mktsegment), (r_name, c_mktsegment))
        """
    )


@register(
    "q41_scalar_subquery",
    """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) FROM customer)
    """,
)
def q41_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (above-average filter) — expressed via
    SQL so Catalyst plans the subquery as a broadcast scalar."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("q41_customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM q41_customer
        WHERE c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
          FROM q41_customer)
        """
    )


@register(
    "q42_null_handling",
    """
    SELECT c.c_custkey,
           COALESCE(o.n_orders, 0) AS n_orders,
           CASE WHEN o.n_orders IS NULL THEN 'inactive'
                WHEN o.n_orders >= 15 THEN 'heavy' ELSE 'normal' END AS activity,
           NULLIF(COALESCE(o.n_orders, 0), 0) AS n_or_null
    FROM customer c
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q42_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics surface: left-join nulls, COALESCE, NULLIF, CASE."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.when(F.col("n_orders").isNull(), "inactive")
        .when(F.col("n_orders") >= 15, "heavy")
        .otherwise("normal")
        .alias("activity"),
        F.nullif(F.coalesce("n_orders", F.lit(0)), F.lit(0)).alias("n_or_null"),
    )


# The driver's per-round correctness gate samples the FIRST 50 entries of
# queries() in dict order. The ordering is DERIVED at load time from the
# CORRECTNESS_r*.json files the driver writes to the repo root: each query
# sorts by the round of its latest green driver row, oldest first, with
# never-driver-verified queries (new this round) at the very front. That
# makes the rotation automatic — it cannot go stale the way a hand-edited
# list can. _VERIFY_FIRST below is only the fallback used when no
# CORRECTNESS files are present (fresh checkout) and as a stable
# tie-breaker within a staleness bucket; the local oracle-gate test
# (tests/test_oracle_gate.py) still runs all queries regardless of order.
_VERIFY_FIRST: tuple[str, ...] = (
    # r7 rotation snapshot (fallback/tie-break only — see above).
    # r7 additions: never driver-verified
    "q124_ngram_diversity",
    "q125_zipf_fit",
    "q126_lsh_plan",
    # last driver-verified in r3
    "q44_simhash_pairs",
    "q45_embedding_near_dup",
    "q48_mix_sources",
    # last driver-verified in r4
    "q10_window_top_orders",
    "q11_date_accessors",
    "q12_concat_buckets",
    "q13_customers_without_orders",
    "q14_event_type_matrix",
    "q34_percentiles",
    "q35_bpe_token_stats",
    "q36_streaming_hourly",
    "q37_set_ops",
    "q38_string_funcs",
    "q39_math_funcs",
    "q40_grouping_sets",
    "q41_scalar_subquery",
    "q42_null_handling",
    "q43_array_ops",
    "q46_sessionize",
    "q47_hash_sample",
    "q49_kmv_distinct",
    "q50_hypertable_rollup",
    "q76_event_deltas",
    "q77_funnel",
    "q78_retention_cohort",
    # last driver-verified in r5
    "q01_pricing_summary",
    "q02_select_filter",
    "q03_top_orders_revenue",
    "q04_order_priority",
    "q05_nation_volume",
    "q06_forecast_revenue",
    "q07_topn_orders",
    "q08_distinct_segments",
    "q09_assign_charge",
    "q51_doc_chunking",
    "q52_repetition_stats",
    "q53_top_terms",
    "q54_decontaminate",
    "q55_pack_sequences",
    "q56_random_projection",
    "q57_column_profile",
    "q58_novel_ngram_rate",
    "q59_containment_pairs",
    "q60_length_histogram",
    "q62_topk_per_source",
    "q63_vocab_coverage",
    "q64_token_probability",
    "q65_dup_rate_by_source",
    "q66_block_dedup",
    "q67_distinctive_terms",
    "q68_char_diversity",
    "q69_source_overlap",
    "q70_sample_k_per_source",
    "q71_packing_efficiency",
    "q72_dup_pagerank",
    "q73_near_dup_first_seen",
    "q79_centroid_similarity",
    "q80_norm_profile",
    "q81_winnow_fingerprints",
    "q82_bigram_stats",
    "q83_winnow_pairs",
    "q84_semantic_dedup",
    "q85_cluster_balanced_sample",
    "q86_bigram_lm_score",
    "q87_bm25_search",
    "q89_semantic_keep_set",
    "q90_semantic_label_matrix",
    "q91_small_quantity_revenue",
    "q92_large_volume_orders",
    "q93_top_supplier",
    "q94_temperature_mix",
    "q95_token_budget_selection",
    "q96_zorder_layout",
    # last driver-verified in r6
    "q15_rollup_region_nation",
    "q16_json_props",
    "q17_hourly_windows",
    "q18_asof_join",
    "q19_interval_join",
    "q20_dedup_fingerprint",
    "q21_dedup_exact_groups",
    "q22_jaccard_pairs",
    "q23_minhash_signatures",
    "q24_simhash",
    "q25_knn_bruteforce",
    "q26_label_centroids",
    "q27_text_quality",
    "q28_lang_id",
    "q29_token_stats_by_source",
    "q30_multimodal_meta",
    "q31_lsh_ann_pairs",
    "q32_minhash_lsh_pairs",
    "q33_dup_groups",
    "q61_quantize_embeddings",
    "q74_waiting_suppliers",
    "q75_important_brands",
    "q88_bpe_learn",
    "q97_ragged_word_stats",
    "q98_zorder3_layout",
    "q99_line_dedup",
    "q100_pii_scrub",
    "q101_dup_spans",
    "q102_c4_filter",
    "q103_remove_dup_spans",
    "q104_gopher_quality",
    "q105_dsir_weights",
    "q106_gopher_repetition",
    "q107_quality_classifier",
    "q108_curation_funnel",
    "q109_pca_projection",
    "q110_hll_distinct",
    "q111_cms_term_counts",
    "q112_abtt_knn",
    "q113_quality_buckets",
    "q114_hard_negatives",
    "q115_dedup_aware_split",
    "q116_unimax_budgets",
    "q117_contamination_scores",
    "q118_keep_best_duplicate",
    "q119_kmeans_clusters",
    "q120_incremental_dedup",
    "q121_curriculum_rank",
    "q122_exact_corpus_quantiles",
    "q123_blocklist_filter",
)


def _latest_green_round(repo_root=None) -> dict[str, int]:
    """Map query name -> latest round with a green driver row.

    Reads the CORRECTNESS_r*.json files the driver leaves at the repo root.
    A row counts as green when it ran without error and the row counts
    matched (hash_match may legitimately be absent for rows-only checks).
    Queries with no green row anywhere are absent from the result.
    """
    import json
    import re
    from pathlib import Path

    root = Path(repo_root) if repo_root is not None else Path(__file__).resolve().parents[1]
    latest: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            green = rec.get("err") is None and rec.get("rows_match") is True
            # hash/schema may legitimately be ABSENT (rows-only checks),
            # but an explicit False is a partial failure — don't stamp
            # the query as freshly verified on it
            if green and (
                rec.get("hash_match") is False or rec.get("schema_match") is False
            ):
                green = False
            if green and rnd > latest.get(name, -1):
                latest[name] = rnd
    return latest


def _ordered(mapping: dict) -> dict:
    """Order queries stalest-driver-verification-first (see _VERIFY_FIRST)."""
    try:
        latest = _latest_green_round()
    except Exception:  # pragma: no cover - ordering must never break queries()
        latest = {}
    fallback_rank = {n: i for i, n in enumerate(_VERIFY_FIRST)}
    names = list(mapping)

    def key(name: str):
        # Never-driver-verified first (round -1), then oldest round first;
        # within a round, keep the fallback tuple's order, then dict order.
        return (
            latest.get(name, -1),
            fallback_rank.get(name, len(fallback_rank)),
            names.index(name),
        )

    return {n: mapping[n] for n in sorted(names, key=key)}


def get_queries() -> dict[str, QueryFn]:
    # Import registers the LLM-operator queries too (kept in their module so
    # the operator implementations and their oracle SQL live together).
    import intake_spark.llm.queries  # noqa: F401

    return _ordered(QUERIES)


def get_oracle_sql() -> dict[str, str]:
    import intake_spark.llm.queries  # noqa: F401

    return _ordered(ORACLE)


@register(
    "q46_sessionize",
    """
    WITH marks AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR ts >= LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           + INTERVAL '30 minutes'
             THEN 1 ELSE 0 END AS new_s
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marks)
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP_NS) AS session_start,
           CAST(MAX(ts) + INTERVAL '30 minutes' AS TIMESTAMP_NS) AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q46_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity) over the events
    table: mark-and-cumsum batch formulation, NTZ arithmetic throughout (no
    LTZ cast — timezone-independent), one shuffle on the user key. The
    streaming twin (native session_window) is equality-tested against this
    batch path in pytest; the oracle re-derives the same islands in SQL."""
    from intake_spark.streaming import sessionize

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return sessionize(ev, gap="30 minutes")


def _q49_sql():
    from intake_spark.llm.sketches import kmv_distinct_sql

    return kmv_distinct_sql("events", ["event_type"], "user_id", k=64)


@register("q49_kmv_distinct", _q49_sql())
def q49_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a deterministic KMV sketch —
    unlike HyperLogLog (approx_count_distinct), the k-minimum-hash set is a
    pure function of the value set, so the *approximate* estimate itself is
    engine-portable and hash-checked against the oracle. Mergeable
    (min-k under union) → map-side partial aggregation, one shuffle."""
    from intake_spark.llm.sketches import kmv_distinct

    ev = load_table(spark, sf_dir, "events")
    return kmv_distinct(ev, "event_type", "user_id", k=64)


@register(
    "q50_hypertable_rollup",
    """
    WITH b AS (SELECT DATE_TRUNC('hour', ts) AS bh, DATE_TRUNC('day', ts) AS bd,
                      value FROM events)
    SELECT 'hour' AS granularity, CAST(bh AS TIMESTAMP_NS) AS bucket_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
    FROM b GROUP BY bh
    UNION ALL
    SELECT 'day', CAST(bd AS TIMESTAMP_NS), COUNT(*),
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
    FROM b GROUP BY bd
    """,
)
def q50_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hour and day rollups of the
    events stream in ONE grouping-sets pass (single scan + single shuffle;
    Catalyst's Expand fans the finest level into both). The oracle computes
    each granularity independently — same values, two scans."""
    from intake_spark.operators import hypertable_rollup

    ev = load_table(spark, sf_dir, "events")
    return hypertable_rollup(
        ev,
        "ts",
        [
            "COUNT(*) AS n_events",
            "CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum",
        ],
        granularities=("hour", "day"),
    )


@register(
    "q74_waiting_suppliers",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
    sups AS (SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_sups
             FROM lineitem GROUP BY l_orderkey),
    lsups AS (SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_late
              FROM late GROUP BY l_orderkey),
    blamed AS (SELECT DISTINCT late.l_orderkey, late.l_suppkey
               FROM late JOIN sups USING (l_orderkey)
                         JOIN lsups USING (l_orderkey)
               WHERE sups.n_sups > 1 AND lsups.n_late = 1)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM blamed JOIN supplier s ON s.s_suppkey = blamed.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q74_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 pattern on the slim schema: suppliers solely to blame
    for late multi-supplier 'F' orders (ship > order date + 60 days). The
    textbook EXISTS / NOT EXISTS pair rewritten as two aggregate
    semi-join predicates — the formulation that scales (no correlated
    per-row subquery execution; three hash aggregates + equi-joins, and
    the supplier dimension broadcasts)."""
    from intake_spark.session import spread_small_scan

    # orders broadcasts here, so everything from the scan through the
    # expand + partial distinct-aggregate runs INSIDE the scan stage — a
    # single-row-group input executes all of it on one task without the
    # spread (2.4 s -> 1.2 s at sf0.1/32c; a no-op on pre-split inputs)
    l = spread_small_scan(load_table(spark, sf_dir, "lineitem"))
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    # ONE lineitem⋈orders join + ONE grouped pass replaces the textbook
    # three-aggregate formulation (late pairs + per-order supplier
    # counts + per-order late counts, then two re-joins): n_sups and
    # n_late are two countDistincts of the same grouping, and the blamed
    # supplier needs no pair table — when n_late = 1 it IS min(late
    # supplier). Equivalence: a blamed order must have late rows, so it
    # exists in `orders` with status F; per-order distinct counts are
    # insensitive to the join fan-out. r12: 3 shuffled aggregates + 3
    # joins -> 1 join + 1 aggregate (lineitem crosses the wire once).
    late_sup = F.when(
        (F.col("o_orderstatus") == "F")
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        F.col("l_suppkey"),
    )
    blamed = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_sups"),
            F.countDistinct(late_sup).alias("n_late"),
            F.min(late_sup).alias("l_suppkey"),
        )
        .filter((F.col("n_sups") > 1) & (F.col("n_late") == 1))
        .select("l_orderkey", "l_suppkey")
    )
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


@register(
    "q75_important_brands",
    """
    WITH rev AS (
      SELECT p.p_brand,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(28,4))) AS rev_d
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand)
    SELECT p_brand, CAST(rev_d AS DOUBLE) AS revenue FROM rev
    WHERE CAST(rev_d AS DOUBLE)
          > (SELECT CAST(SUM(rev_d) AS DOUBLE) FROM rev) / 25
    ORDER BY revenue DESC, p_brand
    """,
)
def q75_important_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 pattern: brands whose revenue exceeds the all-brand mean
    (total/25 with 25 brands in the generator) — the HAVING-against-
    scalar-subquery shape. The threshold is deliberately mid-distribution
    so BOTH branches of the filter are exercised at every tested scale
    (total/10 returned zero rows at sf0.01, which made the oracle
    comparison vacuous). One grouped aggregate (decimal-exact sum per the
    determinism policy), reused for both the per-brand rows and the
    broadcast global threshold; the part dimension broadcasts into the
    revenue join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # keep the per-brand sum in DECIMAL so the global threshold is also an
    # exact decimal sum — summing the already-cast doubles would be
    # order-dependent (per-partition association) and can flip a brand
    # sitting within an ulp of total/25 across engines/partitionings
    rev = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,4)"
                )
            ).alias("_rev_d")
        )
    )
    total = rev.agg(F.sum("_rev_d").cast("double").alias("_t"))
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("_rev_d").cast("double") > F.col("_t") / 25)
        .select("p_brand", F.col("_rev_d").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("p_brand"))
    )


@register(
    "q76_event_deltas",
    """
    WITH s AS (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events)
    SELECT user_id, COUNT(*) AS n_events,
           CAST(COUNT(prev) AS BIGINT) AS n_gaps,
           CAST(SUM(date_diff('microsecond', prev, ts)) AS BIGINT) AS sum_gap_us,
           ROUND(CAST(SUM(date_diff('microsecond', prev, ts)) AS DOUBLE)
                 / COUNT(prev) / 1000000.0, 6) AS avg_gap_s_r
    FROM s GROUP BY user_id
    """,
)
def q76_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival analysis per user: lag window over (ts, event_id)
    total order, exact microsecond gap sums (BIGINT), one rounded IEEE
    division for the mean. One exchange on the user key; the window
    ranks per-partition."""
    from intake_spark.session import ntz_epoch_micros

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap via two field-extract epoch values, NOT timestampdiff(prev, ts):
    # timestampdiff coerces NTZ through the session zone, so a gap
    # straddling a DST transition would differ from the oracle's naive
    # date_diff under any non-UTC driver session
    gaps = ev.withColumn("prev", F.lag("ts").over(w)).withColumn(
        "gap_us", ntz_epoch_micros("ts") - ntz_epoch_micros("prev")
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("prev").cast("bigint").alias("n_gaps"),
        F.sum("gap_us").cast("bigint").alias("sum_gap_us"),
        F.round(
            F.sum("gap_us").cast("double") / F.count("prev") / F.lit(1000000.0), 6
        ).alias("avg_gap_s_r"),
    )


@register(
    "q77_funnel",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS t0 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after,
           (SELECT COUNT(*) FROM p) AS n_purchase_after,
           ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                 / (SELECT COUNT(*) FROM v), 6) AS click_rate_r,
           ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / (SELECT COUNT(*) FROM c), 6) AS purchase_rate_r
    """,
)
def q77_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: each stage is the first
    qualifying event strictly AFTER the previous stage's timestamp —
    three aggregates chained by broadcast-joined stage tables, no
    correlated per-row subqueries."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    counts = [df.agg(F.count(F.lit(1)).alias(n)) for df, n in ((v, "n_view"), (c, "n_click_after"), (p, "n_purchase_after"))]
    row = counts[0].crossJoin(counts[1]).crossJoin(counts[2])
    return row.select(
        "n_view",
        "n_click_after",
        "n_purchase_after",
        F.round(F.col("n_click_after").cast("double") / F.col("n_view"), 6).alias("click_rate_r"),
        F.round(F.col("n_purchase_after").cast("double") / F.col("n_click_after"), 6).alias("purchase_rate_r"),
    )


@register(
    "q78_retention_cohort",
    """
    WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events
               GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT CAST(f.d0 AS VARCHAR) AS cohort_day,
           CAST(date_diff('day', f.d0, a.d) AS BIGINT) AS offset_days,
           COUNT(*) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY f.d0, date_diff('day', f.d0, a.d)
    ORDER BY cohort_day, offset_days
    """,
)
def q78_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users bucketed by first-activity day, counted
    per (cohort, day-offset) — the standard engagement report. Two
    aggregates (first-day, distinct active days) joined on the user key;
    the cohort day casts to string so the cross-engine compare is
    dtype-stable."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    a = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        a.join(f, "user_id")
        .groupBy("d0", F.datediff("d", "d0").alias("offset_days"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("d0").cast("string").alias("cohort_day"),
            F.col("offset_days").cast("bigint").alias("offset_days"),
            "n_users",
        )
        .orderBy("cohort_day", "offset_days")
    )


@register(
    "q91_small_quantity_revenue",
    """
    WITH avgq AS (
      SELECT l_partkey, AVG(l_quantity) AS aq
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l JOIN avgq a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.5 * a.aq
    """,
)
def q91_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 pattern: the correlated scalar subquery (per-part average
    quantity) decorrelated into a grouped aggregate + join — the rewrite
    every optimizer must do; here it is explicit, and the part-keyed
    average table (|parts| rows) BROADCASTS back onto lineitem so the
    probe side never shuffles. Decimal-exact sum, one IEEE division."""
    l = load_table(spark, sf_dir, "lineitem")
    avgq = l.groupBy("l_partkey").agg(F.avg("l_quantity").alias("aq"))
    return (
        l.join(F.broadcast(avgq), "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            (dsum("l_extendedprice", 2) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q92_large_volume_orders",
    """
    WITH s AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(28,2))) > 250)
    SELECT c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP_NS) AS orderdate,
           o.o_totalprice, s.total_qty
    FROM s JOIN orders o ON o.o_orderkey = s.l_orderkey
           JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q92_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 pattern (large-volume orders): the IN-with-HAVING
    subquery as an aggregate-then-join — the qualifying-order set is tiny
    (top ~1% by quantity at every scale factor), so it broadcasts into
    orders and the top-N lowers to TakeOrderedAndProject. Decimal-exact
    quantity sums on both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = (
        l.groupBy("l_orderkey")
        .agg(dsum("l_quantity", 2).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        o.join(F.broadcast(s), o.o_orderkey == s.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q93_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q93_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 pattern (top supplier): the revenue view computed once
    and reused for both the rows and the scalar MAX — equality against a
    broadcast one-row aggregate keeps ties (the spec's requirement, which
    a LIMIT 1 would break). Quarter filter pushes into the parquet scan.
    Decimal-exact revenue so the MAX equality is bit-stable across
    engines and partitionings."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 8).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q96_BITS = 10


def _q96_sql() -> str:
    terms = []
    for i in range(_Q96_BITS):
        terms.append(f"(((p_size >> {i}) & 1) << {2 * i})")
        terms.append(f"((((p_partkey % 1024) >> {i}) & 1) << {2 * i + 1})")
    zkey = " + ".join(terms)
    return f"""
    WITH z AS (SELECT CAST({zkey} AS BIGINT) AS zkey FROM part)
    SELECT CAST(zkey // 4096 AS BIGINT) AS zbucket,
           COUNT(*) AS n_rows,
           CAST(MIN(zkey) AS BIGINT) AS zmin,
           CAST(MAX(zkey) AS BIGINT) AS zmax
    FROM z GROUP BY zbucket ORDER BY zbucket
    """


@register("q96_zorder_layout", _q96_sql())
def q96_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout report — the lakehouse OPTIMIZE..ZORDER
    primitive: interleave p_size with a partkey residue into one
    clustering key (exact integer bit math, JVM-side, mapper-only) and
    report per-4096-key bucket occupancy — the row-group histogram a
    Z-ordered write would produce. The layout itself
    (layout.cluster_by_zorder) is repartitionByRange + in-partition sort;
    the locality win (box filters touch few buckets) is asserted in
    pytest."""
    from intake_spark.layout import zorder_key

    p = load_table(spark, sf_dir, "part")
    z = p.select(
        zorder_key(F.col("p_size"), F.col("p_partkey") % 1024, bits=_Q96_BITS).alias(
            "zkey"
        )
    )
    return (
        z.groupBy(F.floor(F.col("zkey") / 4096).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zkey").alias("zmin"),
            F.max("zkey").alias("zmax"),
        )
        .orderBy("zbucket")
    )


@register(
    "q97_ragged_word_stats",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> len(x) > 0) AS words
      FROM documents)
    SELECT doc_id,
           len(words) AS n_words,
           words[1] AS first_word,
           list_max(list_transform(words, x -> len(x))) AS max_wlen,
           CASE WHEN len(words) > 0 THEN
             CAST(list_sum(list_transform(words, x -> len(x))) AS DOUBLE)
               / len(words)
           END AS mean_wlen,
           len(list_filter(words, x -> len(x) >= 7)) AS n_long
    FROM w
    """,
)
def q97_ragged_word_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Awkward-style ragged verbs over an ArrayType column, explode-free:
    num / firsts / max / mean / predicate-count all run as JVM
    higher-order functions on the per-row word lists — row count never
    changes, no shuffle, whole-stage codegen end to end (the Spark answer
    to the reference's awkward reader family, readers.py:927-978)."""
    from intake_spark import ragged

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: F.length(x) > 0).alias("words"),
    )
    d = ragged.num(d, "words", out="n_words")
    d = ragged.firsts(d, "words", out="first_word")
    d = d.withColumn("lens", F.transform("words", F.length))
    d = ragged.max_ragged(d, "lens", out="max_wlen")
    d = ragged.mean_ragged(d, "lens", out="mean_wlen")
    d = ragged.count_matching(d, "words", "length(x) >= 7", out="n_long")
    return d.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "first_word",
        F.col("max_wlen").cast("long").alias("max_wlen"),
        "mean_wlen",
        F.col("n_long").cast("long").alias("n_long"),
    )


_Q98_BITS = 7  # 3 columns x 7 bits = 21 key bits


def _q98_sql() -> str:
    cols = ["(l_linenumber % 128)", "(l_partkey % 128)", "(l_suppkey % 128)"]
    terms = []
    for i in range(_Q98_BITS):
        for j, c in enumerate(cols):
            terms.append(f"((({c} >> {i}) & 1) << {3 * i + j})")
    zkey = " + ".join(terms)
    return f"""
    WITH z AS (SELECT CAST({zkey} AS BIGINT) AS zkey FROM lineitem)
    SELECT CAST(zkey // 4096 AS BIGINT) AS zbucket,
           COUNT(*) AS n_rows,
           CAST(MIN(zkey) AS BIGINT) AS zmin,
           CAST(MAX(zkey) AS BIGINT) AS zmax
    FROM z GROUP BY zbucket ORDER BY zbucket
    """


@register("q98_zorder3_layout", _q98_sql())
def q98_zorder3_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-column Z-order layout report (the common OPTIMIZE..ZORDER BY
    a,b,c case): column j's bit i interleaves to key bit 3i+j
    (layout.zorder_key_n), mapper-only, then the per-4096-key bucket
    histogram. 3-D box locality of the layout itself is asserted in
    tests/test_operators.py."""
    from intake_spark.layout import zorder_key_n

    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        zorder_key_n(
            [
                F.col("l_linenumber") % 128,
                F.col("l_partkey") % 128,
                F.col("l_suppkey") % 128,
            ],
            bits=_Q98_BITS,
        ).alias("zkey")
    )
    return (
        z.groupBy(F.floor(F.col("zkey") / 4096).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zkey").alias("zmin"),
            F.max("zkey").alias("zmax"),
        )
        .orderBy("zbucket")
    )
