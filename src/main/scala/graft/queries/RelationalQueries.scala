package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The relational operator surface (SURVEY.md §2.2): scans, projection/filter
  * pushdown, joins of every flavor, aggregation (hash/distinct/rollup),
  * windows, sorts/top-k, set ops, scalar functions, subqueries, as-of join.
  *
  * Each query is declarative DataFrame/SQL so Catalyst plans it: filters and
  * projections reach the parquet scan, small dimensions broadcast, partial
  * aggregation is map-side. Built to hold shape at 100 TB: no collect(), no
  * driver-side loops, joins keyed on the natural shuffle keys.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact decimal view of a 2-dp price/rate column (see QueryDef.floatContract). */
  private def dec2(c: Column): Column = c.cast("decimal(18,2)")
  private def sumDec2(c: Column): Column = sum(dec2(c)).cast("double")
  /** l_extendedprice * (1 - l_discount) — true value has 4 dp. */
  private val discPrice: Column =
    (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")
  private val charge: Column =
    (col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
      .cast("decimal(18,6)")

  // ---------------------------------------------------------------- q01
  // Full-scan hash aggregation, TPC-H Q1 shape (reference surface: §2.2
  // "Aggregations"). Map-side partial agg on 2 low-cardinality keys.
  private val q01 = QueryDef(
    "q01_pricing_summary",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sumDec2(col("l_extendedprice")).as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          sum(charge).cast("double").as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (sumDec2(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (sumDec2(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order")),
    Some("""
      SELECT l_returnflag, l_linestatus,
             sum(l_quantity) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
             sum(l_quantity) / count(*) AS avg_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
             CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus"""))

  // ---------------------------------------------------------------- q02
  // Projection + filter pushdown (reference §2.1 #5/#6): both must reach the
  // parquet scan (PushedFilters / 4-column ReadSchema).
  private val q02 = QueryDef(
    "q02_filter_project",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp")
          && col("l_discount") >= 0.05 && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice")),
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_discount >= 0.05 AND l_quantity < 10"""))

  // ---------------------------------------------------------------- q03
  // 3-way join + agg + top-k, TPC-H Q3 shape. customer is the small side;
  // orders⋈lineitem shuffles on orderkey. Top-k via TakeOrderedAndProject.
  private val q03 = QueryDef(
    "q03_top_revenue",
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(discPrice).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""))

  // ---------------------------------------------------------------- q04
  // Semi join (EXISTS) + agg, TPC-H Q4 shape. left_semi avoids materializing
  // the join — at scale this is a shuffle on orderkey then early-out probe.
  private val q04 = QueryDef(
    "q04_order_priority",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val bigLines = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
        .select(col("l_orderkey"))
      o.join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },
    Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      GROUP BY o_orderpriority"""))

  // ---------------------------------------------------------------- q05
  // 6-way snowflake join, TPC-H Q5 shape. region/nation broadcast; the
  // customer-nation = supplier-nation predicate forces the classic co-located
  // join on nationkey.
  private val q05 = QueryDef(
    "q05_region_revenue",
    (s, dir) => {
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(discPrice).cast("double").as("revenue"))
    },
    Some("""
      SELECT n_name,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey AND l_suppkey = s_suppkey
        AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name"""))

  // ---------------------------------------------------------------- q06
  // Single-pass filtered scan agg, TPC-H Q6 shape — the purest pushdown test:
  // all three predicates reach the parquet row-group stats.
  private val q06 = QueryDef(
    "q06_revenue_delta",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
          && col("l_discount") >= 0.03 && col("l_discount") <= 0.07
          && col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)"))
          .cast("double").as("revenue")),
    Some("""
      SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24"""))

  // ---------------------------------------------------------------- q07
  // Broadcast dimension join (reference §2.2 "Joins"): nation⋈region is tiny
  // and explicitly broadcast — zero shuffle on the fact side's build.
  private val q07 = QueryDef(
    "q07_region_customers",
    (s, dir) => {
      val dim = t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      t(s, dir, "customer")
        .join(broadcast(dim), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          sumDec2(col("c_acctbal")).as("total_acctbal"))
    },
    Some("""
      SELECT r_name, count(*) AS n_customers,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
      FROM customer, nation, region
      WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      GROUP BY r_name"""))

  // ---------------------------------------------------------------- q08
  // Ranking window: top-3 orders per customer. row_number cast to BIGINT on
  // both sides (Spark emits INT, DuckDB INT64).
  private val q08 = QueryDef(
    "q08_window_topn",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
            FROM orders) ranked
      WHERE rn <= 3"""))

  // ---------------------------------------------------------------- q09
  // Running-total window; prefix sums of integral quantities are exact.
  // (shipdate, orderkey, linenumber) is NOT a total order in this corpus —
  // the generator duplicates (orderkey, linenumber), and sf0.1 carries one
  // full-key tie whose members differ in quantity (found by the sf1 stress
  // oracle gate: engine-specific ROWS-frame tie order swapped two prefix
  // sums). l_quantity as the final key makes any remaining tie
  // value-identical in every output column, so the result multiset is
  // deterministic in both engines without assuming a unique key the data
  // doesn't have.
  private val q09 = QueryDef(
    "q09_running_total",
    (s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity")).over(w).as("running_qty"))
    },
    Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             sum(l_quantity) OVER (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
      FROM lineitem"""))

  // ---------------------------------------------------------------- q10
  // lag/lead over event streams; timestamps compared as epoch micros (BIGINT)
  // so the ns→µs truncation is identical on both sides.
  private val q10 = QueryDef(
    "q10_events_lag",
    (s, dir) => {
      val e = t(s, dir, "events").withColumn("ts_us", unix_micros(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      e.select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("delta_us"))
    },
    Some("""
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
             lag(event_type, 1) OVER w AS prev_type,
             epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS delta_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)"""))

  // ---------------------------------------------------------------- q11
  // Distinct aggregation (expand + two-phase distinct agg in Spark).
  private val q11 = QueryDef(
    "q11_distinct_agg",
    (s, dir) =>
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        countDistinct(concat_ws("|", col("l_returnflag"), col("l_linestatus")))
          .as("flag_status_combos"),
        count(lit(1)).as("n_rows")),
    Some("""
      SELECT count(DISTINCT l_partkey) AS distinct_parts,
             count(DISTINCT l_suppkey) AS distinct_supps,
             count(DISTINCT concat_ws('|', l_returnflag, l_linestatus)) AS flag_status_combos,
             count(*) AS n_rows
      FROM lineitem"""))

  // ---------------------------------------------------------------- q12
  // ROLLUP grouping sets (reference §2.2 inherits via pushdown; Spark native).
  private val q12 = QueryDef(
    "q12_rollup_agg",
    (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows")),
    Some("""
      SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n_rows
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)"""))

  // ---------------------------------------------------------------- q13
  // GROUP BY + HAVING.
  private val q13 = QueryDef(
    "q13_having",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sumDec2(col("o_totalprice")).as("total_spent"))
        .filter(col("n_orders") >= 8),
    Some("""
      SELECT o_custkey, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
      FROM orders
      GROUP BY o_custkey
      HAVING count(*) >= 8"""))

  // ---------------------------------------------------------------- q14
  // Conditional aggregation over a fact⋈dim join, TPC-H Q14 shape.
  private val q14 = QueryDef(
    "q14_promo_share",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", discPrice)
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("promo_revenue"),
          sum(discPrice).cast("double").as("total_revenue"))
    },
    Some("""
      SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey"""))

  // ---------------------------------------------------------------- q15
  // Set operations; identical SQL text runs on both engines (standard
  // precedence: INTERSECT binds tighter; parenthesized to be explicit).
  private val q15Sql = """
      SELECT custkey FROM (
        (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
         INTERSECT
         SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
        UNION
        (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < -500
         EXCEPT
         SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      ) u"""
  private val q15 = QueryDef(
    "q15_set_ops",
    (s, dir) => { Tables.register(s, dir, Seq("customer", "orders")); s.sql(q15Sql) },
    Some(q15Sql))

  // ---------------------------------------------------------------- q16
  // Scalar function surface: string/date/conditional kernels, all
  // whole-stage-codegen'd in Spark (reference §2.2 "Scalar functions").
  private val q16 = QueryDef(
    "q16_scalar_funcs",
    (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_upper"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        length(col("o_orderpriority")).cast("long").as("pri_len"),
        date_trunc("month", col("o_orderdate")).as("order_month"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_pri"),
        when(col("o_totalprice") > 250000, "big").otherwise("small").as("size_class"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_or_open")),
    Some("""
      SELECT o_orderkey,
             upper(o_orderpriority) AS pri_upper,
             substr(o_orderpriority, 1, 1) AS pri_code,
             CAST(length(o_orderpriority) AS BIGINT) AS pri_len,
             date_trunc('month', o_orderdate) AS order_month,
             CAST(year(o_orderdate) AS BIGINT) AS order_year,
             concat_ws('-', o_orderstatus, o_orderpriority) AS status_pri,
             CASE WHEN o_totalprice > 250000 THEN 'big' ELSE 'small' END AS size_class,
             coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open
      FROM orders"""))

  // ---------------------------------------------------------------- q17
  // Correlated-style scalar subquery (decorrelated to agg+join), TPC-H Q17
  // shape: lines whose quantity is below 20% of their part's average.
  private val q17 = QueryDef(
    "q17_small_qty_revenue",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val avgQty = l.groupBy(col("l_partkey").as("pk"))
        .agg((lit(0.2) * (sum(col("l_quantity")) / count(lit(1)))).as("qty_lim"))
      l.join(avgQty, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("qty_lim"))
        .agg((sumDec2(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    },
    Some("""
      SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      FROM lineitem,
           (SELECT l_partkey AS pk, 0.2 * (sum(l_quantity) / count(*)) AS qty_lim
            FROM lineitem GROUP BY l_partkey) t
      WHERE l_partkey = pk AND l_quantity < qty_lim"""))

  // ---------------------------------------------------------------- q18
  // Anti join (NOT EXISTS): customers who never ordered.
  private val q18 = QueryDef(
    "q18_cust_no_orders",
    (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal")),
    Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""))

  // ---------------------------------------------------------------- q19
  // Semi-structured: JSON path extraction from the events.props string column
  // (reference pins struct/list→JSON behavior, tests/tests/json.rs:272-393).
  private val q19 = QueryDef(
    "q19_json_extract",
    (s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k")),
    Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events"""))

  // ---------------------------------------------------------------- q20
  // Time bucketing + multi-agg on the event stream (daily rollup).
  private val q20 = QueryDef(
    "q20_daily_events",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"),
          sumDec2(col("value")).as("total_value"),
          countDistinct(col("user_id")).as("n_users")),
    Some("""
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             count(DISTINCT user_id) AS n_users
      FROM events
      GROUP BY 1"""))

  // ---------------------------------------------------------------- q21
  // ORDER BY + LIMIT top-k → TakeOrderedAndProject (no global sort at scale).
  private val q21 = QueryDef(
    "q21_topk_orders",
    (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(15),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 15"""))

  // ---------------------------------------------------------------- q22
  // AS-OF join — an operator Spark lacks natively (SURVEY §2 mapping:
  // compose built-ins). Implemented shuffle-once: tag both streams, union,
  // and carry the last click timestamp forward with an ignoreNulls last()
  // window — O(n log n) per user partition, no range cross-join. DuckDB's
  // native ASOF JOIN is the oracle.
  private val q22 = QueryDef(
    "q22_asof_join",
    (s, dir) => {
      val e = t(s, dir, "events").withColumn("ts_us", unix_micros(col("ts")))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), lit(0).as("kind"),
          col("event_id"), col("ts_us").as("click_ts_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), lit(1).as("kind"),
          col("event_id"), lit(null).cast("long").as("click_ts_us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("last_click_us", last(col("click_ts_us"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("last_click_us").as("click_ts_us"))
    },
    Some("""
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, epoch_us(c.ts) AS click_ts_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts"""))

  // ---------------------------------------------------------------- q23
  // CUBE grouping sets with grouping_id — both engines put the leftmost
  // grouping column in the most-significant bit.
  private val q23 = QueryDef(
    "q23_cube_agg",
    (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows")),
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             sum(l_quantity) AS sum_qty, count(*) AS n_rows
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)"""))

  // ---------------------------------------------------------------- q24
  // RANGE frame (value-based window): sum of quantities within 5 units below
  // the current row's quantity per supplier. RANGE includes all peers, so the
  // result is deterministic under ties.
  private val q24 = QueryDef(
    "q24_range_frame",
    (s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("qty", col("l_quantity").cast("long"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("qty"))
        .rangeBetween(-5, Window.currentRow)
      li.select(col("l_orderkey"), col("l_linenumber"), col("qty"),
        sum(col("qty")).over(w).as("qty_near_sum"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
             CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_suppkey ORDER BY CAST(l_quantity AS BIGINT)
               RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS qty_near_sum
      FROM lineitem"""))

  // ---------------------------------------------------------------- q25
  // Distribution windows: ntile / dense_rank / percent_rank / cume_dist.
  // Tie-broken by the unique orderkey so every rank is deterministic;
  // percent_rank and cume_dist are exact integer ratios in both engines.
  private val q25 = QueryDef(
    "q25_ntile_ranks",
    (s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        ntile(4).over(w).cast("long").as("quartile"),
        dense_rank().over(w).cast("long").as("drank"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))
    },
    Some("""
      SELECT o_orderkey, o_orderstatus,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             CAST(dense_rank() OVER w AS BIGINT) AS drank,
             percent_rank() OVER w AS prank,
             cume_dist() OVER w AS cdist
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)"""))

  // ---------------------------------------------------------------- q26
  // first_value / last_value over an explicit full-partition frame (DuckDB's
  // default frame stops at CURRENT ROW, so the frame is spelled out in both).
  private val q26 = QueryDef(
    "q26_first_last",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("last_order"),
        first(col("o_orderdate")).over(w).as("first_date"))
    },
    Some("""
      SELECT o_orderkey, o_custkey,
             first_value(o_orderkey) OVER w AS first_order,
             last_value(o_orderkey) OVER w AS last_order,
             first_value(o_orderdate) OVER w AS first_date
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""))

  // ---------------------------------------------------------------- q27
  // Array kernel surface: split / size / element_at (1-based + negative) /
  // slice + array_join — Spark list semantics line up with DuckDB's.
  private val q27 = QueryDef(
    "q27_array_ops",
    (s, dir) => {
      val toks = split(col("text"), " ")
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_tok"),
        element_at(toks, 1).as("first_tok"),
        element_at(toks, -1).as("last_tok"),
        array_join(slice(toks, 1, 3), "_").as("head3"))
    },
    Some("""
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             string_split(text, ' ')[1] AS first_tok,
             string_split(text, ' ')[-1] AS last_tok,
             array_to_string(string_split(text, ' ')[1:3], '_') AS head3
      FROM documents"""))

  // ---------------------------------------------------------------- q28
  // Generator (explode/unnest) + re-aggregation: token frequencies. The
  // explode is map-side; the count shuffles on token — at 100 TB this is the
  // canonical word-count shape with partial aggregation.
  private val q28 = QueryDef(
    "q28_explode_tokens",
    (s, dir) =>
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 50),
    Some("""
      SELECT tok, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) u
      GROUP BY tok
      HAVING count(*) >= 50"""))

  // ---------------------------------------------------------------- q29
  // String kernel surface: regexp_replace (global), pad, reverse, instr,
  // repeat, replace — all whole-stage-codegen'd in Spark.
  private val q29 = QueryDef(
    "q29_string_kernels",
    (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        lpad(col("p_brand"), 12, "#").as("brand_pad"),
        reverse(col("p_type")).as("type_rev"),
        instr(col("p_type"), "ED").cast("long").as("ed_pos"),
        repeat(substring(col("p_brand"), 1, 2), 2).as("b2x2"),
        regexp_replace(col("p_type"), " ", "_").as("type_us")),
    Some("""
      SELECT p_partkey,
             regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
             lpad(p_brand, 12, '#') AS brand_pad,
             reverse(p_type) AS type_rev,
             CAST(instr(p_type, 'ED') AS BIGINT) AS ed_pos,
             repeat(substr(p_brand, 1, 2), 2) AS b2x2,
             replace(p_type, ' ', '_') AS type_us
      FROM part"""))

  // ---------------------------------------------------------------- q30
  // Math kernel surface, restricted to IEEE-exact ops (abs/floor/ceil/sqrt,
  // integer mod, greatest/least) so both engines agree bit-for-bit.
  private val q30 = QueryDef(
    "q30_math_kernels",
    (s, dir) =>
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_quantity")).as("qty_ceil"),
        (col("l_orderkey") % 7).as("ok_mod7"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"),
        sqrt(col("l_extendedprice")).as("price_sqrt")),
    Some("""
      SELECT l_orderkey, l_linenumber,
             abs(l_discount - 0.05) AS disc_dev,
             CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
             l_orderkey % 7 AS ok_mod7,
             greatest(l_tax, l_discount) AS max_rate,
             least(l_tax, l_discount) AS min_rate,
             sqrt(l_extendedprice) AS price_sqrt
      FROM lineitem"""))

  // ---------------------------------------------------------------- q31
  // IN-subquery → left-semi join (Catalyst rewrites the SQL form the same
  // way; the DataFrame form is explicit).
  private val q31 = QueryDef(
    "q31_in_subquery",
    (s, dir) => {
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"))
      t(s, dir, "orders")
        .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)"""))

  // ---------------------------------------------------------------- q32
  // Cross join (tiny × tiny — broadcast nested loop; never do this on facts).
  private val q32 = QueryDef(
    "q32_cross_join",
    (s, dir) =>
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select(col("r_name"), col("n_name"),
          concat_ws("/", col("r_name"), col("n_name")).as("pair")),
    Some("""
      SELECT r_name, n_name, concat_ws('/', r_name, n_name) AS pair
      FROM region CROSS JOIN nation"""))

  // ---------------------------------------------------------------- q33
  // Sessionization: 30-minute inactivity gap → session id via a prefix sum of
  // boundary flags, then per-session aggregates. Single shuffle on user_id;
  // both window passes reuse the same partitioning.
  private val q33 = QueryDef(
    "q33_sessionization",
    (s, dir) => {
      val gapUs = 1800000000L // 30 min
      val e = t(s, dir, "events").withColumn("ts_us", unix_micros(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val flagged = e
        .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
            .otherwise(0L))
      flagged
        .withColumn("sess_n", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_n"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("sess_start_us"),
          max(col("ts_us")).as("sess_end_us"))
    },
    Some("""
      WITH g AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id) AS prev_us
        FROM events
      ), s AS (
        SELECT user_id, event_id, ts_us,
               CAST(sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
                             THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_n
        FROM g
      )
      SELECT user_id, sess_n, count(*) AS n_events,
             min(ts_us) AS sess_start_us, max(ts_us) AS sess_end_us
      FROM s
      GROUP BY user_id, sess_n"""))

  // ---------------------------------------------------------------- q34
  // Correlated NOT EXISTS → left-anti join (§2.2 joins: anti). The anti
  // join shuffles on custkey — the natural key — and nothing else.
  private val q34 = QueryDef(
    "q34_not_exists",
    (s, dir) => {
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      t(s, dir, "customer")
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)"""))

  // ---------------------------------------------------------------- q35
  // GROUPING SETS with grouping_id (§2.2 aggregations beyond rollup/cube).
  private val q35 = QueryDef(
    "q35_grouping_sets",
    (s, dir) => {
      Tables.register(s, dir, Seq("lineitem"))
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id() AS BIGINT) AS gid,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             sum(l_quantity) AS sum_qty, count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())"""))

  // ---------------------------------------------------------------- q36
  // Ordered string aggregation (listagg shape): deterministic via sort
  // before join — order-insensitive to partial-agg arrival order.
  private val q36 = QueryDef(
    "q36_string_agg",
    (s, dir) =>
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("names"),
          count(lit(1)).as("n")),
    Some("""
      SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names, count(*) AS n
      FROM nation GROUP BY n_regionkey"""))

  // ---------------------------------------------------------------- q37
  // Interpolated percentiles (both engines: linear interpolation over the
  // sorted values; l_quantity is integral so the arithmetic is exact).
  // Scalar p25/p50/p75 columns (not an array) so the driver's pandas-based
  // oracle harness can sort/hash the result frame.
  private val q37 = QueryDef(
    "q37_percentiles",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25D)").as("p25"),
          expr("percentile(l_quantity, 0.5D)").as("p50"),
          expr("percentile(l_quantity, 0.75D)").as("p75"),
          max(col("l_quantity")).as("max_qty")),
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.25) AS p25,
             quantile_cont(l_quantity, 0.5)  AS p50,
             quantile_cont(l_quantity, 0.75) AS p75,
             max(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_returnflag"""))

  // ---------------------------------------------------------------- q38
  // Correlated scalar subquery → Catalyst decorrelates to an aggregate +
  // left outer join (RewriteCorrelatedScalarSubquery); no per-row re-execution.
  private val q38 = QueryDef(
    "q38_scalar_subquery",
    (s, dir) => {
      Tables.register(s, dir, Seq("customer", "orders"))
      s.sql("""
        SELECT c_custkey, c_name,
               (SELECT CAST(max(o_totalprice) AS DOUBLE) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS max_order
        FROM customer c
        WHERE c_mktsegment = 'BUILDING'""")
    },
    Some("""
      SELECT c_custkey, c_name,
             (SELECT CAST(max(o_totalprice) AS DOUBLE) FROM orders o
              WHERE o.o_custkey = c.c_custkey) AS max_order
      FROM customer c
      WHERE c_mktsegment = 'BUILDING'"""))

  // ---------------------------------------------------------------- q39
  // Pivot with explicit values (deterministic columns); the oracle is the
  // equivalent conditional aggregation.
  private val q39 = QueryDef(
    "q39_pivot",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity")))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o"),
    Some("""
      SELECT l_returnflag,
             sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f,
             sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o
      FROM lineitem GROUP BY l_returnflag"""))

  // ---------------------------------------------------------------- q40
  // Date/interval arithmetic (reference pins date_trunc via datetime.rs;
  // this pins interval add, day diffs, and field extraction).
  private val q40 = QueryDef(
    "q40_date_arith",
    (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL '30' DAY")).as("ship_by"),
        datediff(lit("1998-01-01").cast("timestamp"), col("o_orderdate"))
          .cast("long").as("days_to_98"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mth"),
        dayofweek(col("o_orderdate")).cast("long").as("dow")),
    Some("""
      SELECT o_orderkey,
             o_orderdate + INTERVAL 30 DAY AS ship_by,
             CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-01-01') AS BIGINT) AS days_to_98,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(month(o_orderdate) AS BIGINT) AS mth,
             CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow
      FROM orders"""))

  // ---------------------------------------------------------------- q41
  // TIME-SERIES RESAMPLE + GAP-FILL (pandas resample().ffill() /
  // TimescaleDB time_bucket_gapfill): hourly grid per event type over each
  // type's observed span, empty buckets carry n_events=0 and forward-fill
  // the last observed hourly average. Grid steps materialize via
  // sequence+explode in executors — no driver loop; fill is a per-key
  // window, never a global sort. Decimal-cast bucket sums keep the
  // averages bit-deterministic vs the oracle.
  private val q41 = QueryDef(
    "q41_resample_gapfill",
    (s, dir) => graft.operators.TimeSeries.resampleFill(
      t(s, dir, "events"), "event_type", "ts", "value"),
    Some(graft.operators.TimeSeries.resampleFillSql(
      "SELECT event_type, ts, value FROM events", "event_type", "ts", "value")))

  // ---------------------------------------------------------------- q42
  // RECURSIVE CTE (Spark 4.x WITH RECURSIVE): a recursive month calendar
  // spanning the order history, LEFT-joined to monthly order counts and
  // decimal-exact revenue — the gap-surfacing calendar shape (months with
  // no orders appear with NULL revenue). The recursion runs through
  // spark.sql verbatim; the oracle is DuckDB's own recursive CTE over the
  // same span, so the two engines' recursion must agree month-for-month.
  //
  // Plan shape (the r7 verdict's scale-killer, fixed): the span's min/max
  // are aggregated ONCE in a non-recursive `bounds` CTE and the max rides
  // THROUGH the recursion as a column, so each of the ~80 iterations is a
  // one-row projection — not the former per-iteration scalar subquery that
  // re-scanned the whole orders table every UnionLoop step.
  private val q42 = QueryDef(
    "q42_recursive_months",
    (s, dir) => {
      Seq("orders").foreach(n => t(s, dir, n).createOrReplaceTempView(s"q42_$n"))
      s.sql("""
        WITH RECURSIVE bounds AS (
          SELECT min(trunc(o_orderdate, 'MM')) AS mn,
                 max(trunc(o_orderdate, 'MM')) AS mx
          FROM q42_orders
        ),
        months(m, mx) AS (
          SELECT mn, mx FROM bounds
          UNION ALL
          SELECT add_months(m, 1), mx FROM months WHERE m < mx
        )
        SELECT m AS month_start,
               count(o_orderkey) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM months LEFT JOIN q42_orders ON trunc(o_orderdate, 'MM') = m
        GROUP BY m""")
    },
    Some("""
      WITH RECURSIVE bounds AS (
        SELECT min(date_trunc('month', o_orderdate))::DATE AS mn,
               max(date_trunc('month', o_orderdate))::DATE AS mx
        FROM orders
      ),
      months(m, mx) AS (
        SELECT mn, mx FROM bounds
        UNION ALL
        SELECT (m + INTERVAL 1 MONTH)::DATE, mx FROM months WHERE m < mx
      )
      SELECT m AS month_start,
             count(o_orderkey) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate)::DATE = m
      GROUP BY m"""))

  // ---------------------------------------------------------------- q43
  // VARIANT (Spark 4's native semi-structured type): each event's columns
  // fold into one JSON document, parse_json lifts it to VARIANT (binary
  // encoded, shredded access — no per-row string re-parse downstream), and
  // variant_get extracts TYPED paths: a string, a double, a long through a
  // NESTED object, and a conditionally-present key whose absence must read
  // as SQL NULL (not an error, not zero). The oracle recomputes from the
  // raw columns; a reader that mis-typed a path, defaulted a missing key,
  // or lost the nested object fails the hash. DuckDB has no variant type —
  // the replay proves the SEMANTICS, not the encoding.
  private val q43 = QueryDef(
    "q43_variant_extract",
    (s, dir) => {
      val js = concat(
        lit("{\"type\":\""), col("event_type"), lit("\",\"v\":"),
        col("value").cast("string"),
        when(col("event_id") % 7 === 0, lit(",\"m\":1")).otherwise(lit("")),
        lit(",\"props\":"), col("props"), lit("}"))
      t(s, dir, "events")
        .select(col("event_id"), parse_json(js).as("var"))
        .select(
          variant_get(col("var"), "$.type", "string").as("etype"),
          variant_get(col("var"), "$.v", "double").as("v"),
          variant_get(col("var"), "$.props.k", "long").as("k"),
          variant_get(col("var"), "$.m", "long").as("m"))
        .groupBy("etype")
        .agg(count(lit(1)).as("n"),
          sumDec2(col("v")).as("sum_v"),
          sum(col("k")).as("sum_k"),
          count(col("m")).as("n_m"))
    },
    Some("""
      SELECT event_type AS etype, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             CAST(sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_m
      FROM events GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22,
    q23, q24, q25, q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36, q37,
    q38, q39, q40, q41, q42, q43)
}
