package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det

/** The declared relational query contract (SURVEY.md §2B, OSM-Q1..Q12).
  *
  * Each query mirrors a SQL shape the reference executes through its
  * warehouse passthrough (`core/sql_operations.py:60-71`, demo project
  * models under `demo_duckdb/models/`), re-expressed with the
  * DataFrame API so Catalyst owns planning (pushdown, pruning, join
  * selection, AQE). Column names are aligned 1:1 with the DuckDB
  * oracle SQL in [[oracles]] — the driver sorts columns by name before
  * hashing.
  *
  * Determinism: every floating aggregate goes through [[Det]] (exact
  * decimal accumulation + arithmetic rounding) and every query ends in
  * a total ORDER BY over a unique key prefix.
  */
object Relational {
  import Det.{avg2, round2, sum2}

  /** OSM-Q1 — scan + filter + projection (predicate/column pushdown). */
  def q01(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** OSM-Q2 — scalar projection / rename (stg_payments cents→dollars shape). */
  def q02(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey").as("order_key"),
        col("l_linenumber").as("line_no"),
        round2(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("net_price"))
      .orderBy("order_key", "line_no")

  /** OSM-Q3 — group-by aggregation (customer_orders shape: min/max/count). */
  def q03(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        min("o_orderdate").as("first_order"),
        max("o_orderdate").as("most_recent_order"),
        count("o_orderkey").as("number_of_orders"))
      .orderBy("o_custkey")

  /** OSM-Q4 — equi inner join + sum/avg (customer_payments shape).
    * Shuffle analysis: lineitem⋈orders on orderkey then re-agg by
    * custkey — at 100 TB this is a sort-merge join on l_orderkey
    * followed by a shuffle on o_custkey; both aggregations are
    * partial-aggregated map-side. No broadcast (orders is not a dim).
    */
  def q04(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("o_custkey")
      .agg(
        sum2(col("l_extendedprice")).as("total_amount"),
        avg2(col("l_extendedprice")).as("average_amount"))
      .orderBy("o_custkey")
  }

  /** OSM-Q5 — multi-CTE + multi left join + cast (customers model shape).
    * Both aggregates share the orders scan and the o_custkey shuffle;
    * the two small aggregated sides are broadcast-joined onto customer
    * by AQE at test scale (and co-partitioned on the shuffle key at
    * cluster scale).
    */
  def q05(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customerOrders = orders.groupBy("o_custkey")
      .agg(min("o_orderdate").as("first_order"), count(lit(1)).as("n_orders"))
    val customerTotals = orders.groupBy("o_custkey")
      .agg(sum2(col("o_totalprice")).as("lifetime_value"))
    Tables.customer(spark, dir)
      .join(customerOrders, col("c_custkey") === customerOrders("o_custkey"), "left")
      .drop(customerOrders("o_custkey"))
      .join(customerTotals, col("c_custkey") === customerTotals("o_custkey"), "left")
      .select(
        col("c_custkey"),
        col("c_name").cast("string").as("name"),
        col("first_order"), col("n_orders"), col("lifetime_value"))
      .orderBy("c_custkey")
  }

  /** OSM-Q6 — conditional pivot agg (orders model jinja-for shape). */
  def q06(spark: SparkSession, dir: String): DataFrame = {
    def statusAmt(s: String): Column =
      sum2(when(col("o_orderstatus") === s, col("o_totalprice")).otherwise(lit(0.0)))
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        statusAmt("F").as("f_amount"),
        statusAmt("O").as("o_amount"),
        statusAmt("P").as("p_amount"),
        sum2(col("o_totalprice")).as("total_amount"))
      .orderBy("o_custkey")
  }

  /** OSM-Q7 — distinct aggregation. */
  def q07(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy("o_orderstatus")

  /** OSM-Q8 — set op (UNION = union + distinct in Spark terms). */
  def q08(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nk"))
      .union(Tables.supplier(spark, dir).select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")

  /** OSM-Q9 — window ranking with per-partition top-k. */
  def q09(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** OSM-Q10 — top-k (TakeOrderedAndProject: no global sort at scale). */
  def q10(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), round2(col("o_totalprice")).as("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(50)

  /** OSM-Q11 — string functions (normalize_column_name analogs, A6). */
  def q11(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        trim(col("c_name")).as("tr"),
        length(col("c_name")).cast("long").as("len"))
      .orderBy("c_custkey")

  /** OSM-Q12 — date functions + IN-subquery as a left-semi join. */
  def q12(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    Tables.orders(spark, dir)
      .join(building, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .orderBy("o_orderkey")
  }

  /** Query registry: name → impl. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_filter_scan" -> q01 _,
    "q02_project_arith" -> q02 _,
    "q03_groupby_agg" -> q03 _,
    "q04_join_agg" -> q04 _,
    "q05_cte_multijoin" -> q05 _,
    "q06_conditional_pivot" -> q06 _,
    "q07_count_distinct" -> q07 _,
    "q08_union" -> q08 _,
    "q09_window_rank" -> q09 _,
    "q10_topk" -> q10 _,
    "q11_string_fns" -> q11 _,
    "q12_date_semijoin" -> q12 _,
  )

  /** DuckDB oracle SQL, column-name-aligned with [[queries]]. */
  val oracles: Map[String, String] = {
    import Det.Sql
    Map(
      "q01_filter_scan" ->
        """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_quantity < 10
          |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      "q02_project_arith" ->
        s"""SELECT l_orderkey AS order_key, l_linenumber AS line_no,
           |  ${Sql.round2("l_extendedprice * (1 - l_discount)")} AS net_price
           |FROM lineitem ORDER BY order_key, line_no""".stripMargin,
      "q03_groupby_agg" ->
        """SELECT o_custkey, MIN(o_orderdate) AS first_order,
          |  MAX(o_orderdate) AS most_recent_order,
          |  COUNT(o_orderkey) AS number_of_orders
          |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
      "q04_join_agg" ->
        s"""SELECT o.o_custkey,
           |  ${Sql.sum2("l.l_extendedprice")} AS total_amount,
           |  ${Sql.avg2("l.l_extendedprice")} AS average_amount
           |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           |GROUP BY o.o_custkey ORDER BY o.o_custkey""".stripMargin,
      "q05_cte_multijoin" ->
        s"""WITH customer_orders AS (
           |  SELECT o_custkey, MIN(o_orderdate) AS first_order, COUNT(*) AS n_orders
           |  FROM orders GROUP BY o_custkey
           |), customer_totals AS (
           |  SELECT o_custkey, ${Sql.sum2("o_totalprice")} AS lifetime_value
           |  FROM orders GROUP BY o_custkey
           |)
           |SELECT c.c_custkey, CAST(c.c_name AS VARCHAR) AS name,
           |  co.first_order, co.n_orders, ct.lifetime_value
           |FROM customer c
           |LEFT JOIN customer_orders co ON c.c_custkey = co.o_custkey
           |LEFT JOIN customer_totals ct ON c.c_custkey = ct.o_custkey
           |ORDER BY c.c_custkey""".stripMargin,
      "q06_conditional_pivot" -> {
        def amt(s: String) =
          Sql.sum2(s"CASE WHEN o_orderstatus = '$s' THEN o_totalprice ELSE 0.0 END")
        s"""SELECT o_custkey,
           |  ${amt("F")} AS f_amount,
           |  ${amt("O")} AS o_amount,
           |  ${amt("P")} AS p_amount,
           |  ${Sql.sum2("o_totalprice")} AS total_amount
           |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
      },
      "q07_count_distinct" ->
        """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      "q08_union" ->
        """SELECT c_nationkey AS nk FROM customer
          |UNION
          |SELECT s_nationkey AS nk FROM supplier
          |ORDER BY nk""".stripMargin,
      "q09_window_rank" ->
        """SELECT * FROM (
          |  SELECT o_custkey, o_orderkey, o_orderdate,
          |    ROW_NUMBER() OVER (PARTITION BY o_custkey
          |                       ORDER BY o_orderdate, o_orderkey) AS rn
          |  FROM orders
          |) t WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
      "q10_topk" ->
        s"""SELECT o_orderkey, ${Sql.round2("o_totalprice")} AS o_totalprice
           |FROM orders ORDER BY 2 DESC, 1 LIMIT 50""".stripMargin,
      "q11_string_fns" ->
        """SELECT c_custkey, UPPER(c_name) AS up, LOWER(c_mktsegment) AS lo,
          |  TRIM(c_name) AS tr, LENGTH(c_name) AS len
          |FROM customer ORDER BY c_custkey""".stripMargin,
      "q12_date_semijoin" ->
        """SELECT o_orderkey, YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m
          |FROM orders
          |WHERE o_custkey IN (SELECT c_custkey FROM customer
          |                    WHERE c_mktsegment = 'BUILDING')
          |ORDER BY o_orderkey""".stripMargin,
    )
  }
}
