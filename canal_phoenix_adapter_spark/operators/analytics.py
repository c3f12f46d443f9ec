"""Showcase analytics over the TPC-H-ish tables — *extensions* beyond
the reference surface (it has no joins/aggregates/windows at all,
SURVEY.md §2e), demonstrating the engine's scale idioms:

  * dimension joins are broadcast (region/nation/customer never
    shuffle the fact table);
  * aggregations are partial (map-side combine) by construction of
    groupBy.agg;
  * money math is done in DECIMAL so sums are exact and associative —
    double sums would be IEEE-order-nondeterministic across engines
    AND across Spark partition counts;
  * windows partition by the natural key, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from canal_phoenix_adapter_spark.sources.tables import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary by returnflag/linestatus.
    Decimal sums (exact); averages as double(exact_sum)/count."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    tax = F.col("l_tax").cast("decimal(12,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price).alias("sum_base_price"),
            F.sum(price * (F.lit(1).cast("decimal(12,2)") - disc)).alias("sum_disc_price"),
            F.sum(price * (F.lit(1).cast("decimal(12,2)") - disc) * (F.lit(1).cast("decimal(12,2)") + tax)).alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: revenue per order for one market segment.

    No forced broadcast: customer and orders scale linearly with the
    fact table, so a baked-in hint would OOM executors at 1000x scale.
    Catalyst/AQE picks broadcast when runtime stats fit the threshold
    (they do at test SFs) and degrades to shuffle joins on o_orderkey /
    o_custkey when they don't — the plan that survives a scale-up."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("2000-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01")
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(price * (F.lit(1).cast("decimal(12,2)") - disc)).alias("revenue"))
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation for one region.

    Broadcast is FORCED only for the genuinely bounded dims (region: 5
    rows, nation: 25 rows — fixed regardless of SF). supplier / orders
    / customer scale with the data, so their join strategy is left to
    Catalyst/AQE runtime stats: broadcast at test SFs, shuffle joins on
    the equi-keys at cluster scale. Baking F.broadcast on a table that
    grows 1000x is the classic plan that dies on the scale-up."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    dims = (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(dims), sup.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(price * (F.lit(1).cast("decimal(12,2)") - disc)).alias("revenue"))
    )


def topk_orders_per_customer(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Window top-k per group: the k largest orders per customer."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal/JSON column handling: extract typed values from the
    events.props JSON string (P5 coercion applied on top)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return ev.select(
        "event_id",
        k.try_cast("int").alias("k"),
        (k.try_cast("int") % 10).alias("k_bucket"),
    )


def sessionize_events(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 60
) -> DataFrame:
    """Sessionization: per-user session count + span, sessions split on
    gaps > ``gap_minutes``. One window over (user_id, ts) — the
    classic lag/cumsum formulation, all JVM-side."""
    ev = load_table(spark, sf_dir, "events")
    gap_us = gap_minutes * 60_000_000
    w = Window.partitionBy("user_id").orderBy("ts_us")
    with_prev = ev.select("user_id", "ts_us").withColumn(
        "prev_us", F.lag("ts_us").over(w)
    )
    new_sess = F.when(
        F.col("prev_us").isNull() | (F.col("ts_us") - F.col("prev_us") > gap_us), 1
    ).otherwise(0)
    sess = with_prev.withColumn("sess_start", new_sess).withColumn(
        "sess_id", F.sum("sess_start").over(w)
    )
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max(F.col("end_us") - F.col("start_us")).alias("longest_session_us"),
        )
    )


def time_window_rollup(spark: SparkSession, sf_dir: str, bucket_hours: int = 24) -> DataFrame:
    """Hypertable-style event-time rollup: tumbling windows over the
    event stream, one agg row per (window, event_type).

    The bucket is pure epoch-microsecond integer arithmetic — timezone-
    and engine-independent, and exactly what Structured Streaming's
    window() compiles to for a tumbling window. The streaming variant
    (streaming/stream.py) applies the same agg with a watermark; this
    batch form is the backfill path a hypertable rollup runs at 100 TB:
    scan -> map-side partial agg -> one shuffle on (bucket, type)."""
    ev = load_table(spark, sf_dir, "events")
    bucket_us = bucket_hours * 3_600_000_000
    win = (F.col("ts_us") - (F.col("ts_us") % F.lit(bucket_us))).alias("win_start_us")
    return (
        ev.groupBy(win, F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("string").alias("sum_value"),
        )
    )


def q4_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order counts by priority for orders with at
    least one late-shipped lineitem — an EXISTS, expressed as a
    left_semi join so each order is counted once no matter how many
    lineitems match. The semi join ships only o_orderkey/priority
    through the probe side and short-circuits on first match; a plain
    inner join + distinct would shuffle every matching lineitem."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1998-01-01"))
        & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    late = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-01")
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q22_no_orders_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with no RECENT order (none since
    2000-01-01), counted per nation — a NOT EXISTS as a left_anti
    join. The anti join is the set-difference plan that scales: the
    orders side is filtered at the scan (pushed predicate) and reduced
    to distinct custkeys by the join itself, never collected or
    broadcast by force (AQE broadcasts when stats allow)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).alias("sum_acctbal"),
        )
    )


def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (returnflag -> linestatus ->
    grand total) — one pass, Spark expands the grouping sets in the
    aggregate instead of unioning three scans. Decimal sums, exact."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"), F.sum(qty).alias("sum_qty"))
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of their part's average — the correlated-AVG subquery as a
    per-key aggregate joined back to the fact table.

    The comparison q < 0.2 * avg is algebraized to 5*q*cnt < sum_qty
    (all positive), so the whole predicate is exact integer/decimal
    math — no double division whose IEEE rounding could disagree
    between engines or across partition counts. The per-part aggregate
    is one row per partkey (bounded by the part dimension, not the
    fact table) and joins back on the partition key AQE already
    shuffled on — a classic re-usable partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(12,2)")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty).alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    return (
        li.join(per_part, li.l_partkey == per_part.pk)
        .where(
            (F.lit(5).cast("decimal(12,2)") * qty * F.col("cnt"))
            < F.col("sum_qty")
        )
        .groupBy("l_partkey")
        .agg(F.sum(price).alias("small_qty_revenue"), F.count(F.lit(1)).alias("n_small"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer in
    one quarter. Same broadcast policy as Q5: nation (25 rows) is the
    only forced broadcast; customer/orders scale with the data and are
    left to AQE (broadcast at test SFs, shuffle equi-joins at 100 TB)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(price * (F.lit(1).cast("decimal(12,2)") - disc)).alias("revenue")
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    predicate branches. The point of this query is the PLAN: the
    disjunction must stay a single scan + single join with the
    partial per-table conjuncts (l_quantity ranges, p_brand/p_size
    sets) pushed below the join — not a 3-way union of scans."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return joined.where(cond).agg(
        F.sum(price * (F.lit(1).cast("decimal(12,2)") - disc)).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def session_window_rollup(
    spark: SparkSession, sf_dir: str, gap: str = "60 minutes"
) -> DataFrame:
    """Per-user sessions via Spark's NATIVE session window (the
    built-in twin of sessionize_events' hand-rolled lag/cumsum
    islands): events within ``gap`` of each other merge; session end
    is last event + gap. Identical semantics to the islands
    formulation for a constant gap, but the operator is the engine's
    own UpdatingSessionsExec — and the same expression runs unchanged
    in Structured Streaming with a watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
        )
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.
    The nation pair disjunction stays one join (partial pushdown);
    only the bounded nation dim is broadcast twice (supplier-side and
    customer-side roles)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(price * (F.lit(1).cast("decimal(12,2)") - disc)).alias("revenue"))
    )


def event_funnel(
    spark: SparkSession, sf_dir: str, steps: list[str] | None = None
) -> DataFrame:
    """Ordered first-occurrence funnel: how many users reached step k
    having done steps 1..k-1 in timestamp order (view -> click ->
    purchase by default). One conditional-min aggregate per step over
    a single groupBy(user) — no joins, no window, one shuffle; the
    funnel depth is a column count, not a plan cost."""
    steps = steps or ["view", "click", "purchase"]
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts_us"))).alias(f"t{i}")
            for i, s in enumerate(steps)
        ]
    )
    reached = []
    cond = None
    for i in range(len(steps)):
        c = F.col(f"t{i}").isNotNull()
        if i > 0:
            c = c & (F.col(f"t{i}") > F.col(f"t{i-1}"))
        cond = c if cond is None else cond & c
        reached.append(F.sum(cond.cast("long")).alias(f"n_step{i + 1}"))
    return firsts.agg(*reached)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from a discount/quantity band in
    one year — the pure scan-filter-aggregate benchmark: every
    predicate must reach the parquet scan, the agg is a single
    map-side-combined sum (no grouping keys at all)."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(price * disc).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo parts' share of one month's revenue —
    conditional aggregation over a join (CASE inside sum), the
    numerator/denominator pattern every mix-monitoring dashboard
    runs."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = load_table(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    rev = price * (F.lit(1).cast("decimal(12,2)") - disc)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast("decimal(14,4)")
                )
            ).alias("promo_revenue"),
            F.sum(rev).alias("total_revenue"),
        )
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer including
    zero-order customers — LEFT OUTER join + two stacked aggregations
    (per-customer count, then histogram of counts). The outer join is
    what distinguishes this from a plain groupBy: customers with no
    orders must surface in the c_count=0 bucket."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count(col): nulls excluded
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q18_large_volume_customers(
    spark: SparkSession, sf_dir: str, threshold: int = 300
) -> DataFrame:
    """TPC-H Q18 shape: customers with any order whose total quantity
    exceeds the threshold. The HAVING subquery becomes an aggregate +
    semi-filter join: per-order quantity sums (map-side combined),
    filter, then join back to orders/customer — never a correlated
    per-row subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("total_qty"))
        .where(F.col("total_qty") > threshold)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            F.col("total_qty").cast("decimal(18,2)").cast("string").alias("total_qty"),
        )
    )
