"""Relational coverage queries (SURVEY §2D): scans, filters, multi-way
joins, aggregations, windows, sort/top-k, set ops, rollup, as-of join —
each paired with a DuckDB oracle.

Float determinism across engines: money/ratio columns are converted to
exact integer cents (via DECIMAL casts — never a raw double->int cast),
summed exactly, and divided back to DOUBLE only at the output boundary
with identical operation order on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from audit_star_spark.operators.asof import asof_join_backward
from audit_star_spark.sources.testdata import load_table


def _cents(col: str, scale: int = 2) -> F.Column:
    """Exact integer cents from a 2-decimal double: decimal cast (HALF_UP,
    identical in DuckDB) then scale shift."""
    return (F.col(col).cast("decimal(18,2)") * 100).cast("long")


def _pct(col: str) -> F.Column:
    """0.xx ratio -> exact integer percent."""
    return (F.col(col).cast("decimal(6,2)") * 100).cast("long")


# -- q1: pricing summary (TPC-H Q1 shape: scan + filter + groupBy agg) -----
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    g = f.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("__sq"),
        F.sum(_cents("l_extendedprice")).alias("__sp"),
        F.sum(_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("__sd"),
        F.sum(
            _cents("l_extendedprice")
            * (100 - _pct("l_discount"))
            * (100 + _pct("l_tax"))
        ).alias("__sc"),
        F.sum(_pct("l_discount")).alias("__sdisc"),
        F.count("*").alias("count_order"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.col("__sq").alias("sum_qty"),
        (F.col("__sp").cast("double") / 100.0).alias("sum_base_price"),
        (F.col("__sd").cast("double") / 10000.0).alias("sum_disc_price"),
        (F.col("__sc").cast("double") / 1000000.0).alias("sum_charge"),
        (F.col("__sq").cast("double") / F.col("count_order")).alias("avg_qty"),
        (F.col("__sp").cast("double") / 100.0 / F.col("count_order")).alias("avg_price"),
        (F.col("__sdisc").cast("double") / 100.0 / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(pc) AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(SUM(pc * (100 - dc)) AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(SUM(pc * (100 - dc) * (100 + tc)) AS DOUBLE) / 1000000.0 AS sum_charge,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(pc) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
  CAST(SUM(dc) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM (
  SELECT *,
    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
    CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT) AS dc,
    CAST(CAST(l_tax AS DECIMAL(6,2)) * 100 AS BIGINT) AS tc
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
GROUP BY l_returnflag, l_linestatus
"""


# -- q3: shipping priority (3-way join + agg + top-k) ----------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer is small & filtered: broadcast to avoid a shuffle
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    g = j.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("__rev")
    )
    return (
        g.select(
            "l_orderkey",
            (F.col("__rev").cast("double") / 10000.0).alias("revenue"),
            "o_orderdate",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


SQL_Q3 = """
SELECT l_orderkey,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                * (100 - CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue,
       o_orderdate
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# -- q5: local supplier volume (6-way join) --------------------------------
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in
         ["customer", "orders", "lineitem", "supplier", "nation", "region"]}
    j = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
    )
    g = j.groupBy("n_name").agg(
        F.sum(_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("__rev")
    )
    return g.select(
        "n_name", (F.col("__rev").cast("double") / 10000.0).alias("revenue")
    ).orderBy(F.col("revenue").desc(), F.col("n_name"))


SQL_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                * (100 - CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# -- top-k per group (window fn) -------------------------------------------
def q_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        j.withColumn("rank_in_segment", F.row_number().over(w))
        .filter(F.col("rank_in_segment") <= 3)
        .select(
            "c_mktsegment",
            "rank_in_segment",
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)").cast("double")).alias(
                "o_totalprice"
            ),
        )
    )


SQL_TOP_ORDERS = """
SELECT c_mktsegment, CAST(rank_in_segment AS INT) AS rank_in_segment, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_segment
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rank_in_segment <= 3
"""


# -- tumbling-window event aggregation -------------------------------------
def q_daily_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("event_type"),
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(_cents("value")).alias("__sv"),
    )
    return g.select(
        "day",
        "event_type",
        "n_events",
        "n_users",
        (F.col("__sv").cast("double") / 100.0).alias("total_value"),
    )


SQL_DAILY_EVENTS = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
         / 100.0 AS total_value
FROM events
GROUP BY 1, 2
"""


# -- set operation: EXCEPT --------------------------------------------------
def q_parts_never_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    shipped = li.select(F.col("l_partkey").alias("partkey")).distinct()
    small = part.filter(F.col("p_size") < 10).select(
        F.col("p_partkey").alias("partkey")
    )
    return shipped.subtract(small)


SQL_PARTS_EXCEPT = """
SELECT DISTINCT l_partkey AS partkey FROM lineitem
EXCEPT
SELECT p_partkey AS partkey FROM part WHERE p_size < 10
"""


# -- ROLLUP aggregation -----------------------------------------------------
def q_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    g = orders.rollup(
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.col("o_orderpriority"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(_cents("o_totalprice")).alias("__sv"),
    )
    return g.select(
        "order_year",
        "o_orderpriority",
        "n_orders",
        (F.col("__sv").cast("double") / 100.0).alias("total_price"),
    )


SQL_PRIORITY_ROLLUP = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
         / 100.0 AS total_price
FROM orders
GROUP BY ROLLUP (order_year, o_orderpriority)
"""


# -- as-of join -------------------------------------------------------------
def q_asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event: the user's latest signup at-or-before it
    (backward as-of join; union+window, no range explosion)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", (_cents("value").cast("double") / 100.0).alias("value")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts"), F.col("event_id").alias("signup_event_id")
    )
    out = asof_join_backward(
        purchases,
        signups,
        key_cols=["user_id"],
        left_ts="ts",
        right_ts="signup_ts",
        payload_cols=["signup_event_id"],
        payload_prefix="",
    )
    return out.select("event_id", "user_id", "ts", "value", "signup_ts", "signup_event_id")


SQL_ASOF = """
SELECT p.event_id, p.user_id, p.ts,
       CAST(CAST(CAST(p.value AS DECIMAL(18,2)) * 100 AS BIGINT) AS DOUBLE) / 100.0 AS value,
       s.ts AS signup_ts, s.event_id AS signup_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


# -- range (interval) join: activity within 24h after each signup ----------
def q_activity_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: for every signup event, the same user's event count
    and value inside [signup_ts, signup_ts + 24h). Equi key (user_id) +
    range predicate — Spark executes one hash join on the key with the
    band filter applied in the join, no cross product; skewed users are
    AQE's problem, not a plan rewrite."""
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"),
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("signup_ts"),
    )
    follow = ev.select("event_id", "user_id", "ts", "value")
    j = signups.join(
        follow,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("ts") >= F.col("signup_ts"))
        & (F.col("ts") < F.col("signup_ts") + F.expr("INTERVAL 24 HOURS"))
        & (F.col("event_id") != F.col("signup_event_id")),
        "left",
    )
    return j.groupBy("signup_event_id", "s_user_id", "signup_ts").agg(
        F.count("event_id").alias("n_follow_events"),
        (F.coalesce(F.sum(_cents("value")), F.lit(0)).cast("double") / 100.0).alias(
            "follow_value"
        ),
    ).withColumnRenamed("s_user_id", "user_id")


SQL_RANGE_JOIN = """
SELECT s.event_id AS signup_event_id, s.user_id, s.ts AS signup_ts,
       COUNT(e.event_id) AS n_follow_events,
       CAST(COALESCE(SUM(CAST(CAST(e.value AS DECIMAL(18,2)) * 100 AS BIGINT)), 0) AS DOUBLE)
         / 100.0 AS follow_value
FROM (SELECT * FROM events WHERE event_type = 'signup') s
LEFT JOIN events e
  ON e.user_id = s.user_id
 AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 24 HOURS
 AND e.event_id <> s.event_id
GROUP BY 1, 2, 3
"""


# -- semi join: orders having any late-shipped lineitem --------------------
def q_orders_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01").cast("timestamp")
    )
    sem = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
    return sem.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


SQL_SEMI = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '2000-01-01')
GROUP BY o_orderpriority
"""


# -- anti join: customers with no orders ------------------------------------
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    anti = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return anti.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.sum(_cents("c_acctbal")).alias("__sb"),
    ).select(
        "c_mktsegment",
        "n_customers",
        (F.col("__sb").cast("double") / 100.0).alias("total_acctbal"),
    )


SQL_ANTI = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
         / 100.0 AS total_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# -- sessionization (gaps-and-islands; 1h inactivity gap) -------------------
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream at >1h gaps,
    one row per session. One keyed shuffle; cumulative-sum window assigns
    session ids (the batch mirror of streaming session_window)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    gapped = ev.withColumn(
        "new_session",
        (
            F.col("ts").cast("timestamp").cast("long")
            - F.coalesce(
                F.lag(F.col("ts").cast("timestamp").cast("long")).over(w), F.lit(0)
            )
            > 3600
        ).cast("int"),
    )
    sess = gapped.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        (F.sum(_cents("value")).cast("double") / 100.0).alias("session_value"),
    )


SQL_SESSIONS = """
WITH gapped AS (
  SELECT *,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - coalesce(
                  LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY event_id), 0)
              > 3600 THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT *,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM gapped
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       MIN(CAST(ts AS TIMESTAMP)) AS session_start,
       MAX(CAST(ts AS TIMESTAMP)) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
         / 100.0 AS session_value
FROM sess
GROUP BY user_id, session_seq
"""


# -- date/string function coverage ------------------------------------------
def q_monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            F.upper(F.substring("o_orderpriority", 3, 20)).alias("priority_name"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            (F.max(_cents("o_totalprice")).cast("double") / 100.0).alias("max_price"),
            (F.min(_cents("o_totalprice")).cast("double") / 100.0).alias("min_price"),
        )
    )


SQL_MONTHLY = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
       upper(substring(o_orderpriority, 3, 20)) AS priority_name,
       COUNT(*) AS n_orders,
       CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0 AS max_price,
       CAST(MIN(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0 AS min_price
FROM orders
GROUP BY 1, 2
"""


# -- distinct aggregates ----------------------------------------------------
def q_priority_customer_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.countDistinct(F.year("o_orderdate")).alias("n_years"),
    )


SQL_DISTINCT_AGG = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT year(o_orderdate)) AS n_years
FROM orders
GROUP BY o_orderpriority
"""


# -- cube (multi-dimensional rollup) ----------------------------------------
def q_part_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.cube("p_brand", "p_type").agg(
        F.count("*").alias("n_parts"),
        F.avg("p_size").alias("avg_size"),
    )


SQL_CUBE = """
SELECT p_brand, p_type, COUNT(*) AS n_parts, AVG(p_size) AS avg_size
FROM part
GROUP BY CUBE (p_brand, p_type)
"""


# -- set op: INTERSECT ------------------------------------------------------
def q_nations_with_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp).orderBy("nationkey")


SQL_INTERSECT = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


# -- exact percentiles ------------------------------------------------------
def q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # one percentile(..., array(...)) aggregate, not three scalar ones:
    # each scalar percentile buffers and sorts the group's values
    # independently, tripling the dominant cost (3 groups -> 3 tasks own
    # all rows, so per-group work is the whole query)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").alias("__p")
        )
        .select(
            "l_returnflag",
            F.col("__p")[0].alias("p50"),
            F.col("__p")[1].alias("p90"),
            F.col("__p")[2].alias("p99"),
        )
    )


SQL_PERCENTILES = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       quantile_cont(l_extendedprice, 0.99) AS p99
FROM lineitem
GROUP BY l_returnflag
"""


# -- approx percentiles (the 100 TB scale path) -----------------------------
_APPROX_ACCURACY = 10_000  # rank error <= n / accuracy (GK summary bound)


def q_price_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path twin of ``price_percentiles``: ``approx_percentile``
    (Greenwald-Khanna summaries, fixed memory per group) instead of the
    exact sort-based ``percentile``, whose per-group value buffer is a
    memory hazard once one return flag spans billions of rows.

    Approximate algorithms differ across engines (Spark: GK; DuckDB:
    t-digest), so the raw quantile values cannot hash-match an oracle.
    What CAN be gated exactly is the algorithm's own contract: the value
    GK returns for quantile q must occupy a rank within n/accuracy of
    q*n in the group's true CDF. This query computes the approx values,
    then re-scans the group counting strictly-below / at-or-below rows
    per value (one broadcast join + one aggregate — both scale), and
    emits per-quantile booleans that are deterministically TRUE whenever
    the implementation honors its bound; the oracle emits TRUE constants.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("price")
    )
    approx = li.groupBy("l_returnflag").agg(
        F.expr(
            f"approx_percentile(price, array(0.5, 0.9, 0.99), {_APPROX_ACCURACY})"
        ).alias("__p")
    ).select(
        "l_returnflag",
        F.col("__p")[0].alias("a50"),
        F.col("__p")[1].alias("a90"),
        F.col("__p")[2].alias("a99"),
    )
    j = li.join(F.broadcast(approx), "l_returnflag")
    agg = j.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        *[
            c
            for q in ("50", "90", "99")
            for c in (
                F.sum((F.col("price") < F.col(f"a{q}")).cast("long")).alias(f"lt{q}"),
                F.sum((F.col("price") <= F.col(f"a{q}")).cast("long")).alias(f"le{q}"),
            )
        ],
    )

    def ok(q: str, frac: float):
        # returned value occupies ranks (lt+1 .. le); GK guarantees that
        # interval intersects [ (frac - eps) * n, (frac + eps) * n ]
        eps = 1.0 / _APPROX_ACCURACY
        lo_bound = (F.lit(frac) - F.lit(eps)) * F.col("n") - F.lit(1.0)
        hi_bound = (F.lit(frac) + F.lit(eps)) * F.col("n") + F.lit(1.0)
        return (
            (F.col(f"lt{q}") + F.lit(1) <= hi_bound)
            & (F.col(f"le{q}") >= lo_bound)
        ).alias(f"p{q}_ok")

    return agg.select("l_returnflag", ok("50", 0.5), ok("90", 0.9), ok("99", 0.99))


SQL_PERCENTILES_APPROX = """
SELECT l_returnflag,
       TRUE AS p50_ok,
       TRUE AS p90_ok,
       TRUE AS p99_ok
FROM lineitem
GROUP BY l_returnflag
"""


# -- correlated scalar subquery, decorrelated (TPC-H Q17 shape) -------------
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems whose quantity is below 50% of their part's
    average quantity. The correlated per-part scalar subquery decorrelates
    into one aggregate + one join — the rewrite PG's planner does with a
    rescan, expressed as a plan here (and broadcast: the per-part averages
    table is small)."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_q = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        F.avg(F.col("l_quantity").cast("double")).alias("avg_qty")
    )
    j = li.join(F.broadcast(avg_q), li.l_partkey == F.col("p_key")).filter(
        F.col("l_quantity").cast("double") < F.lit(0.5) * F.col("avg_qty")
    )
    return j.agg(
        (F.sum(_cents("l_extendedprice")).cast("double") / 100.0).alias("revenue"),
        F.count("*").alias("n_items"),
    )


SQL_Q17 = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
         / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN (SELECT l_partkey AS p_key, AVG(CAST(l_quantity AS DOUBLE)) AS avg_qty
      FROM lineitem GROUP BY 1) a
  ON l.l_partkey = a.p_key
WHERE CAST(l_quantity AS DOUBLE) < 0.5 * avg_qty
"""


# -- pivot (priority columns per order year) --------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIO_ALIASES = ["urgent", "high", "medium", "not_specified", "low"]


def q_orders_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    p = (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .groupBy("order_year")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    renamed = p.select(
        "order_year",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(a)
            for v, a in zip(_PRIORITIES, _PRIO_ALIASES)
        ],
    )
    return renamed


SQL_PIVOT = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
       COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS high,
       COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
       COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS not_specified,
       COUNT(*) FILTER (o_orderpriority = '5-LOW') AS low
FROM orders
GROUP BY 1
"""


# -- conditional-aggregation ratio (TPC-H Q14 shape) ------------------------
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    rev = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    g = j.groupBy(F.date_trunc("month", "l_shipdate").alias("month")).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias("__promo"),
        F.sum(rev).alias("__total"),
    )
    return g.select(
        "month",
        (F.lit(100.0) * F.col("__promo") / F.col("__total")).alias("promo_share_pct"),
    )


SQL_Q14 = """
SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
       100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) / SUM(rev)
         AS promo_share_pct
FROM (
  SELECT l_shipdate, p_type,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           * (100 - CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT)) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
GROUP BY 1
"""


# -- pure filter+agg, no join (TPC-H Q6 shape) ------------------------------
def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-table scan with range predicates and one global aggregate.
    The whole WHERE clause must reach the parquet scan as PushedFilters;
    the agg is a two-stage partial/final with no shuffle of raw rows."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24.0)
    )
    return f.agg(
        (
            F.sum(_cents("l_extendedprice") * _pct("l_discount")).cast("double")
            / 10000.0
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


SQL_Q6 = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               * CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT)) AS DOUBLE)
         / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24.0
"""


# -- outer-join count distribution (TPC-H Q13 shape) ------------------------
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers by how many non-urgent orders they placed, including the
    zero bucket (LEFT JOIN with a join-side filter, then a re-aggregation).
    Two shuffles: one by custkey, one tiny one by the count."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


SQL_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# -- distinct-agg + NOT IN anti join (TPC-H Q16 shape) ----------------------
def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct suppliers ship each (brand, type, size) part
    variety, excluding one brand and suppliers in arrears. The reference
    dataset has no partsupp table, so distinct (l_partkey, l_suppkey)
    pairs from lineitem stand in. NOT IN over a never-NULL key column is
    a left-anti join (broadcast: the exclusion list is tiny)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    ok = pairs.join(
        F.broadcast(bad_supp), pairs.l_suppkey == F.col("s_suppkey"), "left_anti"
    )
    j = ok.join(F.broadcast(part), ok.l_partkey == part.p_partkey)
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


SQL_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# -- OR-of-ANDs predicate join (TPC-H Q19 shape) ----------------------------
def q_branded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive brand/size/quantity predicate across a join. Catalyst
    extracts the per-side conjuncts common to all branches (partkey
    equality, quantity/size bounds) and pushes them below the join; the
    residual OR evaluates post-join on the broadcast hash probe."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    qty = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & qty.between(1.0, 11.0)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & qty.between(10.0, 20.0)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 35)
            & qty.between(20.0, 30.0)
        )
    )
    f = j.filter(branch)
    return f.agg(
        (
            F.sum(_cents("l_extendedprice") * (100 - _pct("l_discount"))).cast("double")
            / 10000.0
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


SQL_Q19 = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               * (100 - CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT)))
         AS DOUBLE) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         AND l_quantity BETWEEN 1.0 AND 11.0)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         AND l_quantity BETWEEN 10.0 AND 20.0)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
         AND l_quantity BETWEEN 20.0 AND 30.0)
"""


# -- correlated scalar subquery + anti join (TPC-H Q22 shape) ---------------
def q_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average balance but no orders, per nation.
    The scalar 'average positive balance' subquery becomes a 1-row
    aggregate broadcast under every row; the comparison is done in exact
    integer math (cents*count > total_cents) so both engines agree on
    boundary rows without float division."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "__cents", _cents("c_acctbal")
    )
    pos = cust.filter(F.col("__cents") > 0).agg(
        F.sum("__cents").alias("__tot"), F.count("*").alias("__n")
    )
    rich = cust.crossJoin(F.broadcast(pos)).filter(
        F.col("__cents") * F.col("__n") > F.col("__tot")
    )
    orders = load_table(spark, sf_dir, "orders")
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        (F.sum("__cents").cast("double") / 100.0).alias("totacctbal"),
    )


SQL_Q22 = """
WITH c AS (
  SELECT *, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM customer
),
avg_pos AS (
  SELECT SUM(cents) AS tot, COUNT(*) AS n FROM c WHERE cents > 0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(cents) AS DOUBLE) / 100.0 AS totacctbal
FROM c, avg_pos
WHERE cents * n > tot
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


# -- global top-k (TakeOrderedAndProject shape) -----------------------------
def q_top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 10 orders by price with a deterministic tie-break, then a
    broadcast join for the customer name. orderBy().limit() compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    top = orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(10)
    return top.join(
        F.broadcast(cust), top.o_custkey == cust.c_custkey, "left"
    ).select("o_orderkey", "c_name", "o_totalprice", "o_orderpriority")


SQL_TOPK_GLOBAL = """
SELECT o_orderkey, c_name, o_totalprice, o_orderpriority
FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10) t
LEFT JOIN customer ON o_custkey = c_custkey
"""


# -- Q15 shape: aggregate view + scalar-max equality ------------------------
def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (reference has no partsupp; revenue view over
    lineitem): per-supplier revenue for one quarter, keep the supplier(s)
    hitting the global max. The max is a 1-row aggregate broadcast back —
    no second scan of lineitem, no window over a single partition."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("__rev")
    )
    best = rev.agg(F.max("__rev").alias("__best"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(best), F.col("__rev") == F.col("__best"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("__rev").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


SQL_Q15 = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             * (100 - CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT))) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) / 10000.0 AS total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE r = (SELECT MAX(r) FROM rev)
ORDER BY s_suppkey
"""


# -- Q18 shape: IN over a grouped HAVING (large-volume customers) ------------
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape. The classic form aggregates lineitem twice (once in
    the IN subquery, once for the output sum); here the grouped totals are
    computed once and reused as both the semi-filter and the output column."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


SQL_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


# -- Q11 shape: HAVING against a global scalar aggregate ---------------------
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (part value over lineitem instead of partsupp):
    per-part value kept only when above 1.5x the mean part value. The global
    scalar is a 1-row broadcast joined on an inequality — Catalyst turns it
    into a BroadcastNestedLoopJoin over one row, not a cartesian blowup."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.groupBy("l_partkey").agg(F.sum(_cents("l_extendedprice")).alias("__val"))
    thr = v.agg((F.avg("__val") * 1.5).alias("__thr"))
    return (
        v.join(F.broadcast(thr), F.col("__val") > F.col("__thr"))
        .select(
            "l_partkey", (F.col("__val").cast("double") / 100.0).alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), F.col("l_partkey"))
    )


SQL_Q11 = """
WITH v AS (
  SELECT l_partkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS val
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) / 100.0 AS part_value
FROM v
WHERE val > (SELECT AVG(val) * 1.5 FROM v)
ORDER BY part_value DESC, l_partkey
"""


# -- Q2 shape: correlated min subquery, ties preserved -----------------------
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp: cheapest lineitem price stands in for
    supply cost): for each size-15 part, the supplier(s) that sold it at the
    per-part minimum price. The oracle's correlated MIN rescans lineitem per
    row; here it is one min-window over the part-filtered rows — the filter
    runs BEFORE the window, so the shuffle carries only size-15 parts."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "__pc", _cents("l_extendedprice")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_partkey")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return (
        j.withColumn("__min", F.min("__pc").over(w))
        .filter(F.col("__pc") == F.col("__min"))
        .select("p_partkey", "l_suppkey", "__min")
        .distinct()
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            (F.col("__min").cast("double") / 100.0).alias("min_price"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


SQL_Q2 = """
SELECT DISTINCT p_partkey, l_suppkey AS s_suppkey, s_name,
       CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DOUBLE)
         / 100.0 AS min_price
FROM lineitem l
JOIN part ON p_partkey = l.l_partkey AND p_size = 15
JOIN supplier ON s_suppkey = l.l_suppkey
WHERE CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) =
  (SELECT MIN(CAST(CAST(l2.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
   FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
ORDER BY p_partkey, s_suppkey
"""


# -- Q21 shape: semi + anti self-correlation (suppliers who kept waiting) ----
def q_blamed_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape ("late" = shipped >60 days after the order date;
    the schema has no commit/receipt dates). The EXISTS / NOT EXISTS pair
    over the same lineitem table collapses into a two-level aggregation —
    per (order, supplier) late-row counts, then per order: >= 2 suppliers
    with exactly one of them late, blaming that supplier for its late rows.
    ONE scan of lineitem, both levels map-side combinable, no Expand node
    (countDistinct would double the shuffled rows) and no join back to the
    event rows; the oracle keeps the textbook correlated form."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    base = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderstatus"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn(
        "__late",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).cast("int"),
    )
    per_os = base.groupBy("l_orderkey", "o_orderstatus", "l_suppkey").agg(
        F.sum("__late").alias("__n_late_rows")
    )
    late_flag = (F.col("__n_late_rows") > 0).cast("int")
    per_order = per_os.groupBy("l_orderkey", "o_orderstatus").agg(
        F.count("*").alias("__n_supp"),
        F.sum(late_flag).alias("__n_late_supp"),
        F.max(F.when(late_flag == 1, F.col("l_suppkey"))).alias("__blamed"),
        F.sum(F.when(late_flag == 1, F.col("__n_late_rows"))).alias("__late_rows"),
    )
    return (
        per_order.filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("__n_supp") >= 2)
            & (F.col("__n_late_supp") == 1)
        )
        .join(F.broadcast(supp), F.col("__blamed") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("__late_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


SQL_Q21 = """
WITH li AS (
  SELECT l.*, o_orderdate, o_orderstatus
  FROM lineitem l JOIN orders o ON l_orderkey = o_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM li l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.o_orderstatus = 'F'
  AND l1.l_shipdate > l1.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# -- Q7 shape: disjunctive cross-nation join predicate -----------------------
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue between two nations in either direction,
    by (supplier nation, customer nation, ship year). The OR-of-nation-
    pairs predicate cannot become a join key; it is applied AFTER the two
    broadcast nation joins, while the two big joins (lineitem-orders,
    orders-customer) stay pure equi-joins."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    g = j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
    ).agg(F.sum(_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("__rev"))
    return g.select(
        "supp_nation",
        "cust_nation",
        "ship_year",
        (F.col("__rev").cast("double") / 10000.0).alias("revenue"),
    ).orderBy("supp_nation", "cust_nation", "ship_year")


SQL_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                * (100 - CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


# -- Q8 shape: market-share ratio (conditional agg over a wide join) ---------
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of ASIA-region revenue per order
    year — a conditional numerator inside an exact integer-cents sum, the
    division deferred to the output boundary. Six joins, four of them
    broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # customer nation must be in ASIA; supplier nation feeds the share test
    cn = (
        nation.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    g = j.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(F.lit(0))).alias(
            "__nat"
        ),
        F.sum(rev).alias("__all"),
    )
    return g.select(
        "order_year",
        (F.col("__nat").cast("double") / F.col("__all")).alias("mkt_share"),
    ).orderBy("order_year")


SQL_Q8 = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_2' THEN pc * (100 - dc) ELSE 0 END)
            AS DOUBLE)
         / SUM(pc * (100 - dc)) AS mkt_share
FROM (
  SELECT *,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
         CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT) AS dc
  FROM lineitem
) l
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY order_year
ORDER BY order_year
"""


# -- Q9 shape: LIKE-filtered dimension + profit rollup ----------------------
def q_part_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'red' parts by (supplier nation, ship
    year). The substring predicate pushes into the part scan as a
    StringContains parquet filter (locked by a plan test) and the filtered
    dimension broadcasts; profit = revenue - 90% of retail as a stand-in
    for supplycost (no partsupp table), in exact integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    amount = _cents("l_extendedprice") * (100 - _pct("l_discount")) - (
        F.col("p_retailprice").cast("decimal(18,2)") * 100
    ).cast("long") * 90 * F.col("l_quantity").cast("long")
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    g = j.groupBy(
        F.col("n_name").alias("nation"), F.year("l_shipdate").alias("ship_year")
    ).agg(F.sum(amount).alias("__profit"))
    return g.select(
        "nation",
        "ship_year",
        (F.col("__profit").cast("double") / 10000.0).alias("profit"),
    ).orderBy("nation", F.col("ship_year").desc())


SQL_Q9 = """
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  * (100 - CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT))
                - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  * 90 * CAST(l_quantity AS BIGINT))
            AS DOUBLE) / 10000.0 AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, ship_year
ORDER BY n_name, ship_year DESC
"""


# -- Q20 shape: hierarchical re-aggregation + share threshold ---------------
def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (correlated availability threshold, decorrelated):
    suppliers shipping more than 20% of a part's total volume. The
    part-level totals RE-AGGREGATE the (supplier, part) rollup instead of
    rescanning lineitem — one scan, two pipelined aggregations, and the
    share test is an integer cross-multiplication (no division, no
    floats)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    # persisted: Spark does not share subplans between the two consumers
    # (unlike a SQL CTE), so without this the rollup and the lineitem scan
    # both run twice (at real scale: stage the rollup to storage)
    sp = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("supp_qty"))
        .persist()
    )
    totals = sp.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    dom = sp.join(totals, sp.l_partkey == F.col("__pk")).filter(
        F.col("supp_qty") * 5 > F.col("part_qty")
    )
    return (
        dom.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_dominated_parts"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_dominated_parts")
        .orderBy(F.col("n_dominated_parts").desc(), F.col("s_suppkey"))
    )


SQL_Q20 = """
WITH sp AS (
  SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS supp_qty
  FROM lineitem GROUP BY l_suppkey, l_partkey
),
totals AS (
  SELECT l_partkey, SUM(supp_qty) AS part_qty FROM sp GROUP BY l_partkey
)
SELECT s_suppkey, s_name, COUNT(*) AS n_dominated_parts
FROM sp JOIN totals USING (l_partkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE supp_qty * 5 > part_qty
GROUP BY s_suppkey, s_name
ORDER BY n_dominated_parts DESC, s_suppkey
"""


# -- Q10 shape: returned-item reporting (4-way join + grouped top-k) --------
def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue attributable to returned items per customer
    over one quarter, top 20. The returnflag filter lands on the lineitem
    scan (pushed down), the date filter on the orders scan; customer and
    nation broadcast, so the only shuffles are the fact-fact join and the
    final groupBy on c_custkey."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    g = j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.sum(_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias("__rev")
    )
    return (
        g.select(
            "c_custkey",
            "c_name",
            (F.col("__rev").cast("double") / 10000.0).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


SQL_Q10 = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                * (100 - CAST(CAST(l_discount AS DECIMAL(6,2)) * 100 AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue,
       c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# -- Q12 shape: two-sided conditional aggregation over a fact-fact join -----
def q_ship_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape. The synthetic schema has no l_shipmode /
    l_commitdate / l_receiptdate (TESTDATA.md), so the grouping key is a
    ship-latency bucket (days between order and ship date) instead of
    shipmode — the plan shape is identical: orders⋈lineitem with CASE-WHEN
    counts of high- vs low-priority orders per bucket, date range pushed to
    the lineitem scan."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    lat = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(lat < 0, "EARLY").when(lat <= 90, "ON_TIME").otherwise("LATE")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(bucket.alias("latency_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SQL_Q12 = """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 0
            THEN 'EARLY'
            WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90
            THEN 'ON_TIME'
            ELSE 'LATE' END AS latency_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


# -- grouping sets (explicit multi-granularity aggregation) -----------------
def q_priority_year_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with three explicit granularities — unlike cube (all
    2^n combos) or rollup (prefix hierarchy), the set list is arbitrary.
    Physically a single scan + Expand (one output row per matching set per
    input row) + one hash aggregation; grouping_id disambiguates the NULLs
    produced by Expand from real NULL keys."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.year("o_orderdate").alias("o_year"),
        _cents("o_totalprice").alias("__tp"),
    )
    return (
        orders.groupingSets(
            [["o_orderpriority", "o_year"], ["o_orderpriority"], []],
            "o_orderpriority",
            "o_year",
        )
        .agg(
            F.grouping_id().cast("long").alias("grouping_level"),
            F.count("*").alias("n_orders"),
            (F.sum("__tp").cast("double") / 100.0).alias("total_price"),
        )
        .select(
            "o_orderpriority", "o_year", "grouping_level", "n_orders", "total_price"
        )
    )


SQL_GROUPING_SETS = """
SELECT o_orderpriority,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(GROUPING(o_orderpriority, year(o_orderdate)) AS BIGINT) AS grouping_level,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
         / 100.0 AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, year(o_orderdate)), (o_orderpriority), ())
"""


# -- unpivot (wide -> long, the inverse of orders_pivot) --------------------
def q_quantity_discount_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot: melt two measure columns into (measure, value) rows —
    a pure per-row Expand (2 output rows per input), no shuffle until the
    summarizing groupBy. The inverse reshaping of the pivot query."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_discount").cast("double").alias("discount"),
    )
    long = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "discount"],
        "measure",
        "value",
    )
    return long.groupBy("measure").agg(
        F.count("*").alias("n_values"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


SQL_UNPIVOT = """
SELECT measure, COUNT(*) AS n_values,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM (
  SELECT l_orderkey, l_linenumber, measure, value
  FROM (SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS DOUBLE) AS quantity,
               CAST(l_discount AS DOUBLE) AS discount
        FROM lineitem)
  UNPIVOT INCLUDE NULLS (value FOR measure IN (quantity, discount))
)
GROUP BY measure
"""


# -- window-function breadth: ntile / percent_rank / lead -------------------
def q_customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window coverage beyond rank/row_number: quartile bucketing
    (ntile), relative position (percent_rank), and next-value lookahead
    (lead) in ONE window spec — a single per-segment sort, three
    expressions sharing it."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("balance_pct_rank"),
        F.lead("c_acctbal").over(w).alias("next_acctbal"),
    )


SQL_WINDOW_BREADTH = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(NTILE(4) OVER w AS INT) AS balance_quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS balance_pct_rank,
       LEAD(c_acctbal) OVER w AS next_acctbal
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


# -- full outer join (the join path that can never broadcast) ---------------
def q_nation_participation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer vs supplier rollups —
    keeps nations present on either side only. Physically a sort-merge
    join by necessity (full-outer cannot build a one-sided hash table and
    is excluded from broadcast), so both pre-aggregations shrink their
    side BEFORE the join's shuffle — aggregate-then-join, never
    join-then-aggregate, which is the ordering that survives a 1000x
    scale-up."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    j = cust.join(supp, "nationkey", "full_outer")
    return j.select(
        "nationkey",
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        (F.col("n_customers").isNull() | F.col("n_suppliers").isNull()).alias(
            "one_sided"
        ),
    )


SQL_FULL_OUTER = """
WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
           FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
           FROM supplier GROUP BY 1)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers,
       (n_customers IS NULL OR n_suppliers IS NULL) AS one_sided
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
"""


# -- RANGE window frame: rolling 90-day spend per customer ------------------
def q_rolling_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN frame (value-based, vs the row-count frames used
    elsewhere): per order, the customer's total spend in the trailing 90
    days INCLUDING same-timestamp peers — semantics rowsBetween cannot
    express when order timestamps collide. One shuffle on o_custkey; the
    frame bound is integer epoch seconds so both engines agree exactly."""
    orders = load_table(spark, sf_dir, "orders")
    epoch = F.col("o_orderdate").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-90 * 86400, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.sum(_cents("o_totalprice")).over(w).cast("double") / 100.0).alias(
            "trailing_90d_spend"
        ),
    )


SQL_RANGE_FRAME = """
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
           RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / 100.0 AS trailing_90d_spend
FROM orders
"""


RELATIONAL_QUERIES = {
    # first so it lands inside the driver's 50-entry gate window (see
    # __spark_entry__.queries) — the scale-path percentile contract check
    "price_percentiles_approx": q_price_percentiles_approx,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "top_orders_per_segment": q_top_orders_per_segment,
    "daily_event_stats": q_daily_event_stats,
    "parts_never_small": q_parts_never_small,
    "priority_rollup": q_priority_rollup,
    "asof_purchase_signup": q_asof_purchase_signup,
    "activity_after_signup": q_activity_after_signup,
    "orders_with_late_items": q_orders_with_late_items,
    "customers_without_orders": q_customers_without_orders,
    "user_sessions": q_user_sessions,
    "monthly_order_stats": q_monthly_order_stats,
    "priority_customer_reach": q_priority_customer_reach,
    "part_cube": q_part_cube,
    "nations_with_both": q_nations_with_both,
    "price_percentiles": q_price_percentiles,
    "small_quantity_revenue": q_small_quantity_revenue,
    "orders_pivot": q_orders_pivot,
    "promo_revenue_share": q_promo_revenue_share,
    "revenue_forecast": q_revenue_forecast,
    "customer_order_distribution": q_customer_order_distribution,
    "supplier_part_variety": q_supplier_part_variety,
    "branded_revenue": q_branded_revenue,
    "idle_customer_balance": q_idle_customer_balance,
    "top_orders_global": q_top_orders_global,
    "top_revenue_supplier": q_top_revenue_supplier,
    "large_volume_customers": q_large_volume_customers,
    "important_parts": q_important_parts,
    "min_cost_supplier": q_min_cost_supplier,
    "blamed_suppliers": q_blamed_suppliers,
    "nation_trade_volume": q_nation_trade_volume,
    "nation_market_share": q_nation_market_share,
    "part_type_profit": q_part_type_profit,
    "dominant_suppliers": q_dominant_suppliers,
    "returned_item_customers": q_returned_item_customers,
    "ship_latency_priority": q_ship_latency_priority,
    "priority_year_sets": q_priority_year_sets,
    "quantity_discount_long": q_quantity_discount_long,
    "customer_balance_quartiles": q_customer_balance_quartiles,
    "nation_participation": q_nation_participation,
    "rolling_customer_spend": q_rolling_customer_spend,
}

RELATIONAL_ORACLES = {
    "q1_pricing_summary": SQL_Q1,
    "q3_shipping_priority": SQL_Q3,
    "q5_local_supplier": SQL_Q5,
    "top_orders_per_segment": SQL_TOP_ORDERS,
    "daily_event_stats": SQL_DAILY_EVENTS,
    "parts_never_small": SQL_PARTS_EXCEPT,
    "priority_rollup": SQL_PRIORITY_ROLLUP,
    "asof_purchase_signup": SQL_ASOF,
    "activity_after_signup": SQL_RANGE_JOIN,
    "orders_with_late_items": SQL_SEMI,
    "customers_without_orders": SQL_ANTI,
    "user_sessions": SQL_SESSIONS,
    "monthly_order_stats": SQL_MONTHLY,
    "priority_customer_reach": SQL_DISTINCT_AGG,
    "part_cube": SQL_CUBE,
    "nations_with_both": SQL_INTERSECT,
    "price_percentiles": SQL_PERCENTILES,
    "price_percentiles_approx": SQL_PERCENTILES_APPROX,
    "small_quantity_revenue": SQL_Q17,
    "orders_pivot": SQL_PIVOT,
    "promo_revenue_share": SQL_Q14,
    "revenue_forecast": SQL_Q6,
    "customer_order_distribution": SQL_Q13,
    "supplier_part_variety": SQL_Q16,
    "branded_revenue": SQL_Q19,
    "idle_customer_balance": SQL_Q22,
    "top_orders_global": SQL_TOPK_GLOBAL,
    "top_revenue_supplier": SQL_Q15,
    "large_volume_customers": SQL_Q18,
    "important_parts": SQL_Q11,
    "min_cost_supplier": SQL_Q2,
    "blamed_suppliers": SQL_Q21,
    "nation_trade_volume": SQL_Q7,
    "nation_market_share": SQL_Q8,
    "part_type_profit": SQL_Q9,
    "dominant_suppliers": SQL_Q20,
    "returned_item_customers": SQL_Q10,
    "ship_latency_priority": SQL_Q12,
    "priority_year_sets": SQL_GROUPING_SETS,
    "quantity_discount_long": SQL_UNPIVOT,
    "customer_balance_quartiles": SQL_WINDOW_BREADTH,
    "nation_participation": SQL_FULL_OUTER,
    "rolling_customer_spend": SQL_RANGE_FRAME,
}
