package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Common._

/** The standard relational query surface (SURVEY §2.6): joins,
  * aggregations, windows, sorts, set ops, grouping sets — implemented
  * directly on Spark built-ins so Catalyst supplies pushdown, pruning,
  * join selection, whole-stage codegen and AQE for free (SURVEY §4).
  *
  * Scale notes (the local[32] run is a stand-in for a 1000-executor
  * cluster):
  *  - only genuinely bounded dimension tables (region=5, nation=25 rows
  *    at every SF, and constant-size derived frames like a global
  *    average) are marked `broadcast(...)`; customer/supplier/orders
  *    grow linearly with the data, so their join strategy is left to
  *    `autoBroadcastJoinThreshold` + AQE — a forced hint would OOM the
  *    driver at 100× scale;
  *  - fact-fact joins (lineitem ⋈ orders) shuffle on the join key once
  *    and AQE coalesces/skew-splits partitions at runtime;
  *  - every ORDER BY exists for oracle determinism; Catalyst's
  *    EliminateSorts drops them under count-only actions (bench path).
  */
object Relational {

  private def li(s: SparkSession, d: String) = table(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = table(s, d, "orders")
  private def cust(s: SparkSession, d: String) = table(s, d, "customer")
  private def supp(s: SparkSession, d: String) = table(s, d, "supplier")
  private def nat(s: SparkSession, d: String) = table(s, d, "nation")
  private def reg(s: SparkSession, d: String) = table(s, d, "region")
  private def part(s: SparkSession, d: String) = table(s, d, "part")

  val qs: Seq[Q] = Seq(
    Q("q01_pricing_summary",
      "TPC-H Q1-style grouped aggregation over lineitem",
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity", 2)} AS sum_qty,
        ${sqlDsum("l_extendedprice", 6)} AS sum_base_price,
        ${sqlDsum("l_extendedprice*(1-l_discount)", 6)} AS sum_disc_price,
        ${sqlDsum("l_extendedprice*(1-l_discount)*(1+l_tax)", 6)} AS sum_charge,
        ${sqlDavg("l_quantity")} AS avg_qty,
        ${sqlDavg("l_extendedprice")} AS avg_price,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      (s, d) => li(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 6).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    Q("q02_filter_project",
      "selective filter + narrow projection (parquet pushdown showcase)",
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        ORDER BY l_orderkey, l_linenumber"""),
      (s, d) => li(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")),

    Q("q03_revenue_by_nation",
      "5-table star join, revenue per region/nation (broadcast dims)",
      Some(s"""SELECT r_name, n_name,
        ${sqlDsum("l_extendedprice*(1-l_discount)", 6)} AS revenue,
        COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name"""),
      (s, d) => li(s, d)
        .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        // customer grows with the data — no forced broadcast; AQE /
        // autoBroadcastJoinThreshold decide at runtime. Only genuinely
        // bounded dims (nation=25, region=5 rows at every SF) get hints.
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")),

    Q("q04_top_customers",
      "join + aggregate + global top-k with unique tie-break",
      Some(s"""SELECT c_custkey, c_name,
        ${sqlDsum("o_totalprice", 6)} AS revenue, COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey LIMIT 10"""),
      (s, d) => ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(dsum(col("o_totalprice"), 6).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)),

    Q("q05_priority_semi_join",
      "left-semi join (EXISTS) + aggregation",
      Some("""SELECT o_orderpriority, COUNT(*) AS n
        FROM orders WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      (s, d) => ord(s, d)
        .join(li(s, d).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")),

    Q("q06_forecast_revenue",
      "TPC-H Q6-style single-row selective aggregate",
      Some(s"""SELECT ${sqlDsum("l_extendedprice*l_discount", 6)} AS revenue,
        COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""),
      (s, d) => li(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"),
          count(lit(1)).as("n"))),

    Q("q07_window_rank",
      "row_number window: top-3 line items per supplier by price",
      Some("""SELECT * FROM (
          SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
            ROW_NUMBER() OVER (PARTITION BY l_suppkey
              ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
          FROM lineitem) t
        WHERE rn <= 3 ORDER BY l_suppkey, rn"""),
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        li(s, d)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .orderBy("l_suppkey", "rn")
      }),

    Q("q08_window_running",
      "running (cumulative) sum per supplier over ship time",
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
          CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) OVER (
            PARTITION BY l_suppkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS running_qty
        FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber"""),
      (s, d) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        li(s, d)
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
            dsumOver(col("l_quantity"), 2, w).as("running_qty"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
      }),

    Q("q09_market_share",
      "two-level aggregate + ratio: nation share of region revenue",
      Some(s"""WITH nrev AS (
          SELECT r_name, n_name,
            ${sqlDsum("l_extendedprice*(1-l_discount)", 6)} AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name, n_name)
        SELECT r_name, n_name, revenue,
          revenue / CAST(SUM(CAST(revenue AS DECIMAL(30,6))) OVER
            (PARTITION BY r_name) AS DOUBLE) AS share
        FROM nrev ORDER BY r_name, n_name"""),
      (s, d) => {
        val nrev = li(s, d)
          .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(cust(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
        val w = Window.partitionBy(col("r_name"))
        nrev
          .withColumn("share", col("revenue") / dsumOver(col("revenue"), 6, w))
          .orderBy("r_name", "n_name")
      }),

    Q("q10_rollup",
      "ROLLUP grouping sets over returnflag × linestatus",
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity", 2)} AS sum_qty, COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
      (s, d) => li(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    Q("q11_semi_join_customers",
      "customers having at least one order (left-semi)",
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey"""),
      (s, d) => cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    Q("q12_anti_join_customers",
      "customers with no orders (left-anti / NOT EXISTS)",
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey"""),
      (s, d) => cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    Q("q13_union_distinct",
      "UNION (distinct) of customer and supplier nation keys",
      Some("""SELECT DISTINCT nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION ALL SELECT s_nationkey FROM supplier) t
        ORDER BY nationkey"""),
      (s, d) => cust(s, d).select(col("c_nationkey").as("nationkey"))
        .union(supp(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")),

    Q("q14_except",
      "EXCEPT: nations with customers but no suppliers",
      Some("""SELECT c_nationkey AS nationkey FROM customer
        EXCEPT SELECT s_nationkey FROM supplier
        ORDER BY nationkey"""),
      (s, d) => cust(s, d).select(col("c_nationkey").as("nationkey"))
        .except(supp(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy("nationkey")),

    Q("q15_scalar_subquery",
      "orders priced above 1.5× the global average",
      Some(s"""SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.5 * (
          SELECT ${sqlDavg("o_totalprice")} FROM orders)
        ORDER BY o_orderkey"""),
      (s, d) => {
        val o = ord(s, d)
        val avgDf = o.agg(davg(col("o_totalprice")).as("avg_price"))
        o.join(broadcast(avgDf))
          .filter(col("o_totalprice") > lit(1.5) * col("avg_price"))
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      }),

    Q("q16_corr_subquery",
      "suppliers richer than their nation's average customer",
      Some(s"""SELECT s_suppkey, s_name, s_acctbal FROM supplier
        JOIN (SELECT c_nationkey, ${sqlDavg("c_acctbal")} AS nation_avg
              FROM customer GROUP BY c_nationkey) n
          ON s_nationkey = c_nationkey
        WHERE s_acctbal > nation_avg ORDER BY s_suppkey"""),
      (s, d) => {
        val nAvg = cust(s, d).groupBy(col("c_nationkey"))
          .agg(davg(col("c_acctbal")).as("nation_avg"))
        supp(s, d)
          .join(broadcast(nAvg), col("s_nationkey") === col("c_nationkey"))
          .filter(col("s_acctbal") > col("nation_avg"))
          .select("s_suppkey", "s_name", "s_acctbal")
          .orderBy("s_suppkey")
      }),

    Q("q17_distinct_agg",
      "multiple exact COUNT(DISTINCT) per group",
      Some("""SELECT l_returnflag,
          COUNT(DISTINCT l_partkey) AS n_parts,
          COUNT(DISTINCT l_suppkey) AS n_supps,
          COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, d) => li(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    Q("q18_conditional_agg",
      "FILTER-style conditional counts per order month",
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
          COUNT(*) AS n_orders,
          COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 END) AS n_high,
          COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished
        FROM orders GROUP BY 1 ORDER BY month"""),
      (s, d) => ord(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit(1))).as("n_high"),
          count(when(col("o_orderstatus") === "F", lit(1))).as("n_finished"))
        .orderBy("month")),

    Q("q19_monthly_revenue",
      "date_trunc bucketing + exact-decimal revenue per month",
      Some(s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
          ${sqlDsum("o_totalprice", 6)} AS revenue, COUNT(*) AS n
        FROM orders GROUP BY 1 ORDER BY month"""),
      (s, d) => ord(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(dsum(col("o_totalprice"), 6).as("revenue"), count(lit(1)).as("n"))
        .orderBy("month")),

    Q("q20_string_ops",
      "string functions: split/upper/length + group per type prefix",
      Some(s"""SELECT string_split(p_type, ' ')[1] AS type_prefix,
          COUNT(*) AS n,
          ${sqlDavg("p_retailprice")} AS avg_price,
          MAX(length(p_name)) AS max_name_len,
          COUNT(DISTINCT upper(p_brand)) AS n_brands
        FROM part GROUP BY 1 ORDER BY type_prefix"""),
      (s, d) => part(s, d)
        .groupBy(element_at(split(col("p_type"), " "), 1).as("type_prefix"))
        .agg(count(lit(1)).as("n"),
          davg(col("p_retailprice")).as("avg_price"),
          max(length(col("p_name"))).as("max_name_len"),
          countDistinct(upper(col("p_brand"))).as("n_brands"))
        .orderBy("type_prefix"))
  )
}
