"""Analytics operator coverage (SURVEY.md §2.2-2.4, §2.6-2.9 plus the
"available for free in Spark" rows the reference lacks: semi/anti joins,
set operations, ranking windows, rollup, pivot/unpivot).

Cross-engine numeric rules (see registry.py): decimal-cast before any
double aggregation; averages as decimal-sum / count in one double
division; never round() a double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openstack_billing_from_db_spark.registry import register
from openstack_billing_from_db_spark.sources.tables import load_table


def _dec(col, prec: int = 18, scale: int = 4):
    return col.cast(f"decimal({prec},{scale})")


def _disc_price_dec():
    """extendedprice × (1 − discount) computed entirely in decimal.

    Raw columns are short-decimal-valued doubles (2-dp prices, 2-dp
    discounts), so casting the RAW columns is cross-engine exact, while
    casting a double PRODUCT is not (Spark casts via the shortest decimal
    repr; DuckDB rounds the exact binary value — they disagree in the
    last digit for long mantissas)."""
    return _dec(F.col("l_extendedprice"), 18, 2) * (1 - _dec(F.col("l_discount"), 8, 2))


_DISC_PRICE_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))"


# --- q10: grouped aggregation (TPC-H Q1 shape; A2 at scale) ----------------

_Q10_CUTOFF = "1998-09-02 00:00:00"


@register(
    "q10_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum({_DISC_PRICE_SQL}) AS DOUBLE) AS sum_disc_price,
       CAST(sum({_DISC_PRICE_SQL} * (1 + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q10_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
)
def q10_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _disc_price_dec()
    charge = disc_price * (1 + _dec(F.col("l_tax"), 8, 2))
    sum_qty = F.sum(_dec(F.col("l_quantity"), 18, 2))
    sum_price = F.sum(_dec(F.col("l_extendedprice"), 18, 2))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q10_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty.cast("double").alias("sum_qty"),
            sum_price.cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (sum_qty.cast("double") / n).alias("avg_qty"),
            (sum_price.cast("double") / n).alias("avg_price"),
            (F.sum(_dec(F.col("l_discount"), 18, 6)).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# --- q11: multi-way join with broadcast dims (TPC-H Q5 shape; J1) ----------


@register(
    "q11_regional_revenue",
    oracle="""
SELECT r.r_name, n.n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
GROUP BY r.r_name, n.n_name
""",
)
def q11_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join on orderkey plus three broadcast dimension joins.
    At 100 TB: lineitem⋈orders shuffles on orderkey once; nation/region/
    supplier are explicit broadcasts (no shuffle)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(_disc_price_dec()).cast("double").alias("revenue"))
    )


# --- q12: join + group + global sort + limit (TPC-H Q3 shape; O1, top-k) ---

_Q12_DATE = "1998-01-01 00:00:00"


@register(
    "q12_top_unshipped_orders",
    oracle=f"""
SELECT l.l_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_Q12_DATE}'
  AND l.l_shipdate > TIMESTAMP '{_Q12_DATE}'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q12_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q12_DATE).cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q12_DATE).cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price_dec()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --- q13: semi join / EXISTS (TPC-H Q4 shape) -------------------------------


@register(
    "q13_late_shipment_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
GROUP BY o_orderpriority
""",
)
def q13_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --- q14: anti join / NOT EXISTS --------------------------------------------


@register(
    "q14_customers_without_orders",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
""",
)
def q14_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --- q15: distinct (A1) ------------------------------------------------------


@register(
    "q15_distinct_brand_sizes",
    oracle="SELECT DISTINCT p_brand, p_size FROM part",
)
def q15_distinct_brand_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").select("p_brand", "p_size").distinct()


# --- q16: set operations (§2.7 — absent in reference, native in Spark) ------


@register(
    "q16_set_operations",
    oracle="""
SELECT 'union' AS op, id FROM (SELECT user_id AS id FROM events UNION SELECT c_custkey FROM customer)
UNION ALL
SELECT 'intersect' AS op, id FROM (SELECT user_id AS id FROM events INTERSECT SELECT c_custkey FROM customer)
UNION ALL
SELECT 'except' AS op, id FROM (SELECT c_custkey AS id FROM customer EXCEPT SELECT user_id FROM events)
""",
)
def q16_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("id"))
    cu = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "id")  # noqa: E731
    return (
        tag(ev.union(cu).distinct(), "union")
        .unionByName(tag(ev.intersect(cu), "intersect"))
        .unionByName(tag(cu.exceptAll(ev).distinct(), "except"))
    )


@register(
    "q16b_bag_set_operations",
    oracle="""
SELECT 'intersect_all' AS op, v FROM (
  SELECT l_suppkey AS v FROM lineitem WHERE l_returnflag = 'R'
  INTERSECT ALL
  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
)
UNION ALL
SELECT 'except_all' AS op, v FROM (
  SELECT l_suppkey AS v FROM lineitem WHERE l_returnflag = 'R'
  EXCEPT ALL
  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
)
""",
)
def q16b_bag_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) semantics: intersectAll / exceptAll preserve
    duplicate multiplicities — distinct from q16's set semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("v"))
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("v"))
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "v")  # noqa: E731
    return tag(r.intersectAll(a), "intersect_all").unionByName(
        tag(r.exceptAll(a), "except_all")
    )


# --- q17: ranking window (top-k per group) -----------------------------------


@register(
    "q17_top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def q17_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- q18: rollup (grouping sets) ---------------------------------------------


@register(
    "q18_order_rollup",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""",
)
def q18_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("o_totalprice"), 18, 2)).cast("double").alias("total"),
    )


# --- q19/q20: pivot and unpivot (U1) -----------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_ALIASES = ["urgent", "high", "medium", "not_specified", "low"]

_PIVOT_ORACLE = """
SELECT o_orderstatus,
""" + ",\n".join(
    f"       CAST(sum(CASE WHEN o_orderpriority = '{p}' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS {a}"
    for p, a in zip(_PRIORITIES, _PRIORITY_ALIASES)
) + """
FROM orders GROUP BY o_orderstatus
"""


@register("q19_priority_pivot", oracle=_PIVOT_ORACLE)
def q19_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    df = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.sum(_dec(F.col("o_totalprice"), 18, 2)).cast("double"))
    )
    for p, a in zip(_PRIORITIES, _PRIORITY_ALIASES):
        df = df.withColumnRenamed(p, a)
    return df


_UNPIVOT_ORACLE = f"WITH wide AS ({_PIVOT_ORACLE})\n" + "\nUNION ALL\n".join(
    f"SELECT o_orderstatus, '{a}' AS priority, {a} AS total FROM wide"
    for a in _PRIORITY_ALIASES
)


@register("q20_priority_unpivot", oracle=_UNPIVOT_ORACLE)
def q20_priority_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (reference billing.py:188-224 writes six SU-type
    rows per invoice from six wide accumulators; U1)."""
    wide = q19_priority_pivot(spark, sf_dir)
    return wide.unpivot(
        ["o_orderstatus"], _PRIORITY_ALIASES, "priority", "total"
    )


# --- q21: JSON extraction + grouped stats (F1, F6) ---------------------------


@register(
    "q21_event_props_stats",
    oracle="""
SELECT event_type,
       count(*) AS n,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
""",
)
def q21_event_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(k).alias("sum_k"),
        F.sum(_dec(F.col("value"), 18, 2)).cast("double").alias("sum_value"),
    )


# --- q22: scalar string/date function coverage (F3, F5, F8-F10, F14) --------


@register(
    "q22_scalar_functions",
    oracle="""
SELECT c_custkey,
       lower(c_name) AS name_lower,
       upper(c_mktsegment) AS seg_upper,
       substr(c_name, 1, 8) AS name_prefix,
       replace(c_name, 'Customer#', 'C-') AS name_short,
       regexp_replace(c_name, '[0-9]', '', 'g') AS name_nodigits,
       length(c_name) AS name_len,
       concat('seg:', c_mktsegment) AS seg_tag,
       CAST(c_custkey % 97 AS BIGINT) AS key_mod
FROM customer
""",
)
def q22_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_replace(F.col("c_name"), "Customer#", "C-").alias("name_short"),
        F.regexp_replace(F.col("c_name"), "[0-9]", "").alias("name_nodigits"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat(F.lit("seg:"), F.col("c_mktsegment")).alias("seg_tag"),
        (F.col("c_custkey") % 97).alias("key_mod"),
    )


# --- q24: exact distribution statistics (beyond-reference aggregates) --------


@register(
    "q24_distribution_stats",
    oracle="""
SELECT l_returnflag,
       median(l_extendedprice) AS med_price,
       quantile_cont(l_extendedprice, 0.9) AS p90_price,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price,
       count(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem GROUP BY l_returnflag
""",
)
def q24_distribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / interpolated percentile (both engines use linear
    interpolation on the sorted values — verified bit-identical).

    Scale shape: a bare ``percentile(col, p)`` buffers EVERY group value
    in its reducer — with 3 return-flag groups that is a third of the
    column per task at 100 TB. Instead the values are pre-aggregated to
    ``(group, value) → count`` (map-side partial aggregation shrinks
    each partition to its distinct values) and the weighted form
    ``percentile(value, p, count)`` interpolates over distinct values —
    reducer memory is bounded by per-group distinct cardinality, not
    row count, and the result is identical (repeat-count semantics)."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    pct = F.expr("percentile(l_extendedprice, array(0.5, 0.9), cnt)")
    per_flag = vals.groupBy("l_returnflag").agg(
        pct.alias("pcts"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    # countDistinct(suppkey) can't ride the (flag, price) rollup; keep it
    # as its own partial-agged aggregation and join the 3-row results
    nsup = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers")
    )
    return per_flag.join(nsup, "l_returnflag").select(
        "l_returnflag",
        F.col("pcts")[0].alias("med_price"),
        F.col("pcts")[1].alias("p90_price"),
        "min_price",
        "max_price",
        "n_suppliers",
    )


# --- q25: as-of join (custom operator — composed, not pandas) ---------------


@register(
    "q25_asof_join",
    oracle="""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, c.click_id,
       epoch_us(p.ts) - epoch_us(c.click_ts) AS gap_us
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.click_ts
""",
)
def q25_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the most recent preceding click by the same
    user (point-in-time attribution). Spark side: the union+window as-of
    composition (operators/asof.py); oracle: DuckDB native ASOF JOIN."""
    from openstack_billing_from_db_spark.operators.asof import as_of_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    out = as_of_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_value_cols=["click_id", "click_ts"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_click_id").alias("click_id"),
        (F.unix_micros("ts") - F.unix_micros("asof_click_ts")).alias("gap_us"),
    )


# --- q26: range (interval-overlap) join --------------------------------------


@register(
    "q26_range_join",
    oracle="""
SELECT o.outage_id, count(e.event_id) AS n_events,
       count(DISTINCT e.user_id) AS n_users
FROM (VALUES (0, TIMESTAMP '2024-01-05 06:00:00', TIMESTAMP '2024-01-05 18:00:00'),
             (1, TIMESTAMP '2024-01-10 00:00:00', TIMESTAMP '2024-01-12 00:00:00'),
             (2, TIMESTAMP '2024-01-20 12:00:00', TIMESTAMP '2024-01-21 00:00:00'))
     AS o(outage_id, o_start, o_end)
LEFT JOIN events e ON e.ts >= o.o_start AND e.ts < o.o_end
GROUP BY o.outage_id
""",
)
def q26_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: events falling inside each outage window
    (the J5 shape as a standalone operator). The tiny interval side is
    broadcast, so the fact table never shuffles for the join."""
    from datetime import datetime

    ev = load_table(spark, sf_dir, "events")
    outages = spark.createDataFrame(
        [
            (0, datetime(2024, 1, 5, 6), datetime(2024, 1, 5, 18)),
            (1, datetime(2024, 1, 10), datetime(2024, 1, 12)),
            (2, datetime(2024, 1, 20, 12), datetime(2024, 1, 21)),
        ],
        "outage_id int, o_start timestamp, o_end timestamp",
    )
    joined = F.broadcast(outages).join(
        ev, (ev.ts >= outages.o_start) & (ev.ts < outages.o_end), "left"
    )
    return joined.groupBy("outage_id").agg(
        F.count("event_id").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --- q27: cube (multi-dimensional grouping sets) -----------------------------


@register(
    "q27_status_priority_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def q27_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("o_totalprice"), 18, 2)).cast("double").alias("total"),
    )


# --- q28: gap-based sessionization (session_window vs SQL gap-and-islands) ---

_GAP = "30 minutes"
_GAP_US = 30 * 60 * 1_000_000


# gap-and-islands session CTEs, shared by q28 and the q125 overlap join
_SESSIONS_CTES = f"""marked AS (
  SELECT user_id, ts, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > {_GAP_US}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts_us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)"""


@register(
    "q28_gap_sessions",
    oracle=f"""
WITH {_SESSIONS_CTES}
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       min(ts_us) AS session_start_us,
       max(ts_us) + {_GAP_US} AS session_end_us,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_id
""",
)
def q28_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization with Spark's native session_window
    (30-minute inactivity gap). The oracle derives identical sessions via
    the classic gap-and-islands SQL — pinning that ``session_window``'s
    semantics (close = last event + gap) match the textbook formulation.
    """
    ev = load_table(spark, sf_dir, "events")
    sw = ev.groupBy(
        F.session_window("ts", _GAP).alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    flat = sw.select(
        "user_id",
        F.unix_micros(F.col("w.start")).alias("session_start_us"),
        F.unix_micros(F.col("w.end")).alias("session_end_us"),
        "n_events",
    )
    w = Window.partitionBy("user_id").orderBy("session_start_us")
    return flat.select(
        "user_id",
        (F.row_number().over(w).cast("long") - 1).alias("session_id"),
        "session_start_us",
        "session_end_us",
        "n_events",
    )


# --- q125: big-big interval overlap join (bucket decomposition) --------------

# fallback/hand-picked width (1h ≈ the typical session length); the
# registered query now derives W from the data via joins.auto_bucket_us
# — W affects only cost, never output, so the oracle is untouched.
# tests/test_overlap_join.py pins auto-W inside this width's measured
# cost envelope (replication + candidate-pair proxies).
_CONC_BUCKET_US = 3_600_000_000


@register(
    "q125_concurrent_sessions",
    oracle=f"""
WITH {_SESSIONS_CTES},
s AS (
  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         min(ts_us) AS s_us, max(ts_us) + {_GAP_US} AS e_us
  FROM numbered GROUP BY user_id, session_id
)
SELECT a.user_id, a.session_id,
       CAST(count(b.user_id) AS BIGINT) AS n_concurrent,
       -- least/greatest SKIP nulls (both engines), so an unmatched left
       -- row would otherwise contribute its own length; gate on the
       -- partner's key instead
       CAST(coalesce(sum(CASE WHEN b.user_id IS NULL THEN NULL
                         ELSE least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us)
                         END), 0)
            AS BIGINT) AS overlap_us
FROM s a LEFT JOIN s b
  ON a.s_us < b.e_us AND b.s_us < a.e_us
  AND (a.user_id != b.user_id OR a.session_id != b.session_id)
GROUP BY a.user_id, a.session_id
""",
)
def q125_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session concurrency: how many OTHER sessions overlap each
    gap-session, and for how long in total — the big-big interval
    overlap join q26's broadcast path cannot express (both sides here
    are the full 95k-session table at sf0.1; at 100 TB, billions).
    Runs on operators/joins.bucketed_overlap_join: intervals explode
    onto fixed-width buckets — the width auto-tuned from the session-
    length distribution (joins.auto_bucket_us; W affects cost only,
    never output) — pairs meet on a bucket EQUI-key, and the
    first-common-bucket rule emits each directed pair exactly once (no
    distinct). The oracle is DuckDB's native inequality join over the
    same gap-and-islands sessions — brute force vs bucketed, so parity
    proves the decomposition emits every overlap exactly once."""
    from openstack_billing_from_db_spark.operators.caching import tracked_persist
    from openstack_billing_from_db_spark.operators.joins import (
        auto_bucket_us,
        bucketed_overlap_join,
    )

    ev = load_table(spark, sf_dir, "events")
    sw = ev.groupBy(F.session_window("ts", _GAP).alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    flat = sw.select(
        "user_id",
        F.unix_micros(F.col("w.start")).alias("s_us"),
        F.unix_micros(F.col("w.end")).alias("e_us"),
    )
    w = Window.partitionBy("user_id").orderBy("s_us")
    # persisted: feeds both sides of the overlap join AND the final
    # keep-zero-overlap-sessions left join
    s = tracked_persist(
        flat.select(
            "user_id",
            (F.row_number().over(w).cast("long") - 1).alias("session_id"),
            "s_us",
            "e_us",
        )
    )
    # W from the interval-length distribution (median, rounded up to a
    # whole minute bin) — the persisted session table materializes here
    pairs = bucketed_overlap_join(s, s, bucket_us=auto_bucket_us(s)).filter(
        (F.col("a_user_id") != F.col("b_user_id"))
        | (F.col("a_session_id") != F.col("b_session_id"))
    )
    agg = pairs.groupBy(
        F.col("a_user_id").alias("user_id"),
        F.col("a_session_id").alias("session_id"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_concurrent"),
        F.sum("overlap_us").cast("long").alias("overlap_us"),
    )
    return (
        s.select("user_id", "session_id")
        .join(agg, ["user_id", "session_id"], "left")
        .select(
            "user_id",
            "session_id",
            F.coalesce(F.col("n_concurrent"), F.lit(0)).cast("long").alias(
                "n_concurrent"
            ),
            F.coalesce(F.col("overlap_us"), F.lit(0)).cast("long").alias(
                "overlap_us"
            ),
        )
    )


# --- q29: analytic frames + ordered string aggregation -----------------------


@register(
    "q29_running_totals",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3,
       CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS seq
FROM orders
""",
)
def q29_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frames: running total (unbounded preceding) and 3-row moving
    average per customer — in decimal so every prefix sum is exact."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    price = _dec(F.col("o_totalprice"), 18, 2)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price).over(run).cast("double").alias("running_total"),
        # decimal-sum ÷ count, not avg(decimal): Spark's decimal avg
        # truncates to scale+4 while DuckDB promotes to double
        (F.sum(price).over(mov).cast("double") / F.count(F.lit(1)).over(mov)).alias(
            "moving_avg3"
        ),
        F.row_number().over(w).cast("long").alias("seq"),
    )


@register(
    "q29b_order_digest",
    oracle="""
SELECT o_custkey,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
       count(*) AS n_orders
FROM orders GROUP BY o_custkey
""",
)
def q29b_order_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation: collect_list → array_sort → concat_ws
    (the portable twin of SQL string_agg ... ORDER BY)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list("o_orderkey")),
                lambda x: x.cast("string"),
            ),
        ).alias("order_keys"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- q47: data-quality report (P5 generalized) -------------------------------


@register(
    "q47_data_quality",
    oracle="""
SELECT 'not_null_o_custkey' AS rule,
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'range_o_totalprice',
       CAST(sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'unique_o_orderkey',
       CAST(coalesce((SELECT count(*) FROM (
         SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)), 0) AS BIGINT)
UNION ALL
SELECT 'orders_customer_fk',
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
""",
)
def q47_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite over orders: null/range checks in one
    aggregation pass, uniqueness, and referential integrity to customer —
    the reference's assert (billing.py:146) as a reusable operator."""
    from openstack_billing_from_db_spark.operators import quality

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    report = quality.violations(
        o,
        quality.not_null("o_custkey"),
        quality.in_range("o_totalprice", 0, 1_000_000),
    )
    report = report.unionByName(
        quality.unique_violations(o, ["o_orderkey"], "unique_o_orderkey")
    ).unionByName(
        quality.referential_violations(o, "o_custkey", c, "c_custkey", "orders_customer_fk")
    )
    return report


# --- q48: analytic function coverage (ntile, percent_rank, lag/lead, firsts) -


@register(
    "q48_customer_order_analytics",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(ntile(4) OVER w AS BIGINT) AS price_quartile,
       percent_rank() OVER w AS pr,
       lag(o_orderkey) OVER w AS prev_order,
       lead(o_orderkey) OVER w AS next_order,
       first_value(o_orderkey) OVER w AS cheapest_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
)
def q48_customer_order_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
    )


# --- q49: array function coverage over tokenized documents -------------------


@register(
    "q49_array_functions",
    oracle="""
WITH wrd AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w != '') AS w
             FROM documents)
SELECT doc_id,
       CAST(len(w) AS INTEGER) AS n_words,
       w[1] AS first_word,
       w[len(w)] AS last_word,
       array_to_string(w[1:3], ' ') AS first_three,
       CAST(list_contains(w, 'the') AS BOOLEAN) AS has_the,
       CAST(list_position(w, 'the') AS INTEGER) AS the_pos,
       CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct_words
FROM wrd
""",
)
def q49_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array operator surface: size, indexing, slice, contains, position,
    distinct — Spark array_* ≡ DuckDB list_* (1-based in both)."""
    from openstack_billing_from_db_spark.operators.text import words

    docs = load_table(spark, sf_dir, "documents")
    w = words(F.col("text"))
    df = docs.select("doc_id", w.alias("w"))
    return df.select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.col("w")[0].alias("first_word"),
        F.element_at("w", -1).alias("last_word"),
        F.concat_ws(" ", F.slice("w", 1, 3)).alias("first_three"),
        F.array_contains("w", "the").alias("has_the"),
        F.array_position("w", "the").cast("int").alias("the_pos"),
        F.size(F.array_distinct("w")).alias("n_distinct_words"),
    )


# --- q43: correlated scalar subquery (Catalyst decorrelation; SQL API) -------

_Q43_SQL = """
SELECT l.l_partkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
       count(*) AS n_lines
FROM lineitem l
WHERE l.l_quantity < (
  SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l.l_partkey
"""


@register("q43_small_quantity_parts", oracle=_Q43_SQL)
def q43_small_quantity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL API — Catalyst
    decorrelates it into an aggregate + join (the reference's N+1
    correlated loops, §2.2 P3, expressed declaratively and planned as ONE
    pass). avg(l_quantity) is exact: quantities are integral doubles."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q43_SQL)


# --- q54: funnel analysis (ordered event sequences per user) -----------------


@register(
    "q54_signup_purchase_funnel",
    oracle="""
WITH stages AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
         min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage_signup,
       CAST(sum(CASE WHEN first_signup IS NOT NULL AND first_click > first_signup
                THEN 1 ELSE 0 END) AS BIGINT) AS stage_click_after_signup,
       CAST(sum(CASE WHEN first_signup IS NOT NULL AND first_click > first_signup
                     AND first_purchase > first_click
                THEN 1 ELSE 0 END) AS BIGINT) AS stage_full_funnel
FROM stages
""",
)
def q54_signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: signup → later click → later purchase, one
    aggregation pass over first-occurrence times per user (no self-joins
    — the scale-right funnel formulation)."""
    ev = load_table(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    stages = ev.groupBy("user_id").agg(
        first("signup").alias("s"),
        first("click").alias("c"),
        first("purchase").alias("p"),
    )
    reached_signup = F.col("s").isNotNull()
    reached_click = reached_signup & (F.col("c") > F.col("s"))
    reached_full = reached_click & (F.col("p") > F.col("c"))
    one = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")  # noqa: E731
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        one(reached_signup).alias("stage_signup"),
        one(reached_click).alias("stage_click_after_signup"),
        one(reached_full).alias("stage_full_funnel"),
    )


# --- q55: cohort retention ----------------------------------------------------


@register(
    "q55_weekly_cohort_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_trunc('week', e.ts) AS TIMESTAMP) AS activity_week
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, activity_week) // 7 AS BIGINT) AS week_offset,
       count(*) AS n_active_users
FROM activity
GROUP BY cohort_week, week_offset
""",
)
def q55_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week,
    counted in each subsequent active week (ISO-Monday week truncation is
    cross-engine identical)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).alias("activity_week"),
        )
        .distinct()
    )
    offset = F.floor(
        F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7
    ).cast("long")
    return activity.groupBy("cohort_week", offset.alias("week_offset")).agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


# --- q56: hopping (sliding) window aggregation --------------------------------


@register(
    "q56_hopping_window_counts",
    oracle="""
WITH contrib AS (
  SELECT event_type,
         unnest([CAST(date_trunc('hour', ts) AS TIMESTAMP),
                 CAST(date_trunc('hour', ts) AS TIMESTAMP) - INTERVAL 1 HOUR]) AS window_start
  FROM events
)
SELECT window_start, event_type, count(*) AS n
FROM contrib GROUP BY window_start, event_type
""",
)
def q56_hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows hopping every hour via F.window — each event lands
    in exactly two windows (oracle: explicit two-bucket contribution)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


# --- q58: ratio-to-report (percent of total via unpartitioned window) --------


@register(
    "q58_nation_revenue_share",
    oracle="""
WITH rev AS (
  SELECT n.n_name,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS r
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT n_name,
       CAST(r AS DOUBLE) AS revenue,
       CAST(r AS DOUBLE) / CAST(sum(r) OVER () AS DOUBLE) AS revenue_share
FROM rev
""",
)
def q58_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total: a global (unpartitioned) window over the grouped
    decimal sums — one extra single-partition exchange over ~25 rows, not
    over the fact table."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price_dec()).alias("r"))
    )
    total = F.sum("r").over(Window.partitionBy())
    return rev.select(
        "n_name",
        F.col("r").cast("double").alias("revenue"),
        (F.col("r").cast("double") / total.cast("double")).alias("revenue_share"),
    )


# --- q61: NULL semantics (aggregation skip, null-safe equality, coalesce) ----


@register(
    "q61_null_semantics",
    oracle="""
WITH e AS (
  SELECT event_type,
         CASE WHEN value < 50 THEN NULL ELSE value END AS v,
         CASE WHEN user_id % 3 = 0 THEN NULL ELSE user_id END AS maybe_user
  FROM events
)
SELECT event_type,
       count(*) AS n_rows,
       count(v) AS n_nonnull,
       CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(sum(CASE WHEN maybe_user IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nullsafe_null,
       CAST(sum(CAST(coalesce(v, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_coalesced,
       CAST(sum(CASE WHEN nullif(event_type, 'error') IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_error_via_nullif
FROM e GROUP BY event_type
""",
)
def q61_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL behavior pinned cross-engine: count(col) skips nulls, sum
    ignores nulls, null-safe equality (eqNullSafe ≡ IS NOT DISTINCT FROM),
    coalesce/nullif — the semantics the nullable deleted_at path relies on."""
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("value") < 50, F.lit(None)).otherwise(F.col("value"))
    maybe_user = F.when(F.col("user_id") % 3 == 0, F.lit(None)).otherwise(
        F.col("user_id")
    )
    e = ev.select("event_type", v.alias("v"), maybe_user.alias("maybe_user"))
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_nonnull"),
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("sum_v"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
        F.sum(
            F.when(F.col("maybe_user").eqNullSafe(F.lit(None)), 1).otherwise(0)
        ).cast("long").alias("n_nullsafe_null"),
        F.sum(F.coalesce(F.col("v"), F.lit(0.0)).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_coalesced"),
        F.sum(
            F.when(F.nullif(F.col("event_type"), F.lit("error")).isNull(), 1).otherwise(0)
        ).cast("long").alias("n_error_via_nullif"),
    )


# --- q62: map-type round trip (collect → map → explode entries) --------------


@register(
    "q62_map_functions",
    oracle="""
SELECT user_id, event_type AS k, count(*) AS v
FROM events GROUP BY user_id, event_type
""",
)
def q62_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per-user event counts packed into a map column
    (map_from_entries over collected structs) and exploded back to rows —
    relational output is the oracle, the map round trip is the operator
    under test (maps themselves don't hash portably across engines)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("counts")
    )
    exploded = as_map.select("user_id", F.explode(F.col("counts")).alias("k", "v"))
    return exploded.select("user_id", "k", F.col("v").alias("v"))


# --- q23: date/time function coverage (F8-F10, F14) --------------------------


@register(
    "q23_date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(day(o_orderdate) AS INTEGER) AS order_day,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       o_orderdate + INTERVAL 90 DAY AS due_date,
       o_orderdate - INTERVAL 1 SECOND AS just_before,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
FROM orders
""",
)
def q23_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic parity, incl. the reference's end−1s daily-key
    trick (billing.py:277-278) and ISO formatting (F9/F14)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 1 SECONDS")).alias("just_before"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    )


# --- q83: VARIANT semi-structured path (Spark 4 native) ----------------------


@register(
    "q83_variant_json",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(sum(CASE WHEN json_extract(props, '$.missing') IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing
FROM events GROUP BY event_type
""",
)
def q83_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of the semi-structured props column:
    ``parse_json`` once into a variant, then typed ``variant_get`` path
    extraction — the open-type path Spark 4 adds over from_json's rigid
    schema (binary-encoded variant, no per-row schema inference; the
    shredded columnar encoding is the 100 TB story). The q21/q05 JSON
    paths keep from_json coverage; this pins the variant API against a
    DuckDB json_extract oracle."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.try_variant_get("v", "$.k", "long")).alias("sum_k"),
        F.sum(
            F.when(
                F.try_variant_get("v", "$.missing", "string").isNull(), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("n_missing"),
    )


# --- q84: event-time RANGE-frame trailing aggregation ------------------------


@register(
    "q84_trailing_window",
    oracle="""
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trailing_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
)
""",
)
def q84_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-1-hour RANGE frame (count + decimal sum) — the
    event-time sliding aggregate q29's ROWS frames can't express (a
    RANGE frame bounds by ORDER-BY VALUE distance, so ties and gaps
    behave correctly). Spark needs a numeric order column for
    rangeBetween: unix_micros(ts) with a ±3.6e9 µs frame — one exchange
    on user_id, sort within, zero joins."""
    ev = load_table(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-hour_us, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("sum_trailing_1h"),
    )


# --- q85: full outer join ----------------------------------------------------


@register(
    "q85_full_outer_join",
    oracle="""
WITH p AS (
  SELECT user_id, count(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
c AS (
  SELECT user_id, count(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY user_id
)
SELECT coalesce(p.user_id, c.user_id) AS user_id,
       CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases,
       CAST(coalesce(c.n_clicks, 0) AS BIGINT) AS n_clicks
FROM p FULL OUTER JOIN c ON p.user_id = c.user_id
""",
)
def q85_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two per-user aggregates (users with only
    purchases, only clicks, or both survive) — the one join type the
    registry didn't exercise. Both sides shuffle once on user_id and the
    join reuses that partitioning (no extra exchange)."""
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    j = p.withColumnRenamed("user_id", "p_user").join(
        c.withColumnRenamed("user_id", "c_user"),
        F.col("p_user") == F.col("c_user"),
        "full_outer",
    )
    return j.select(
        F.coalesce(F.col("p_user"), F.col("c_user")).alias("user_id"),
        F.coalesce(F.col("n_purchases"), F.lit(0)).cast("long").alias("n_purchases"),
        F.coalesce(F.col("n_clicks"), F.lit(0)).cast("long").alias("n_clicks"),
    )
