package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det

/** Third relational tranche: the remaining SQL surface a warehouse
  * passthrough user exercises that q01–q32 did not yet cover —
  * FULL OUTER JOIN, explicit GROUPING SETS, relational PIVOT,
  * recursive CTEs (Spark 4 UnionLoop), and LATERAL correlated
  * subqueries (SURVEY §2B passthrough contract; the reference
  * delegates all of these to the warehouse adapter,
  * core/sql_operations.py:27-71).
  */
object RelationalExt2 {
  import Det.{round2, sum2}

  /** q33 — FULL OUTER JOIN with genuine mismatches on both sides:
    * customers with key <= 100 against per-customer order aggregates
    * for keys 60–200 (left-only = low keys without in-range orders,
    * right-only = 101–200, both = 60–100; ranges chosen inside the
    * sf0.001 key space so every arm is non-empty at every SF).
    */
  def q33(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 100)
      .select(col("c_custkey"), col("c_name"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_custkey").between(60, 200))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum2(col("o_totalprice")).as("spend"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("n_orders"), col("spend"))
      .orderBy("custkey")
  }

  /** q34 — explicit GROUPING SETS: per-status, per-year, and grand
    * total — but NOT the (status, year) cross that ROLLUP/CUBE
    * (q17/q23) would include. gid is built from grouping() bits so
    * both engines agree regardless of internal conventions.
    */
  def q34(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderstatus"), year(col("o_orderdate")).cast("long").as("y"),
        col("o_totalprice"))
    base.groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("y")), Seq()),
        col("o_orderstatus"), col("y"))
      .agg(count(lit(1)).as("n"), sum2(col("o_totalprice")).as("total"),
        (grouping(col("o_orderstatus")) * 2 + grouping(col("y")))
          .cast("long").as("gid"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first, col("y").asc_nulls_first)
  }

  /** q35 — relational PIVOT: yearly order totals spread across the
    * three order statuses as columns. The value list is pinned
    * (F/O/P) so the output schema is static — the form that survives
    * at scale because it avoids the extra distinct-values job a
    * dynamic pivot needs, and the aggregate under the pivot is still
    * a map-side-combinable decimal sum.
    */
  def q35(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).cast("long").as("y"),
        col("o_orderstatus"), col("o_totalprice"))
      .groupBy("y")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum2(col("o_totalprice")))
      .orderBy("y")

  /** q36 — recursive CTE (Spark 4 UnionLoop): a generated month
    * calendar 1995-01..1996-12 LEFT JOINed to monthly order
    * aggregates. The recursion itself is driver-cheap (24 rows); the
    * aggregation underneath is the usual map-side-partial hash agg, so
    * the shape scales — the calendar is the broadcast side.
    */
  def q36(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_g36")
    spark.sql(
      s"""WITH RECURSIVE months(m) AS (
         |  SELECT DATE '1995-01-01'
         |  UNION ALL
         |  SELECT add_months(m, 1) FROM months WHERE m < DATE '1996-12-01'
         |),
         |monthly AS (
         |  SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS om,
         |    COUNT(*) AS n_orders,
         |    ${SqlSpark.sum2("o_totalprice")} AS spend
         |  FROM orders_g36
         |  GROUP BY 1
         |)
         |SELECT m, COALESCE(n_orders, 0L) AS n_orders,
         |  COALESCE(spend, 0.0D) AS spend
         |FROM months LEFT JOIN monthly ON m = om
         |ORDER BY m""".stripMargin)
  }

  /** q37 — LATERAL correlated subquery with ORDER BY + LIMIT: the
    * top-2 customers by account balance per nation. Catalyst
    * decorrelates the limit into a partitioned window (one shuffle on
    * the correlation key) — asserted scale-safe in PlanShapeSpec.
    */
  def q37(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("nation_g37")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_g37")
    spark.sql(
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation_g37 n
        |JOIN LATERAL (
        |  SELECT c_custkey, c_acctbal
        |  FROM customer_g37 c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey
        |  LIMIT 2
        |) t
        |ORDER BY n.n_name, t.c_custkey""".stripMargin)
  }

  /** q38 — array aggregation and complex-type functions: per-customer
    * sorted DISTINCT order-year arrays (`collect_set` + `sort_array` —
    * deterministic despite unordered aggregation), with array length
    * and membership predicates. The collect_set is a hash aggregate
    * whose state is the small distinct-year set, not the row stream —
    * bounded per group, map-side combinable. The final projection
    * serializes the array as a comma-joined string because the
    * driver's comparator row-sorts by every column and pandas cannot
    * sort array cells; `collect_set`/`sort_array`/`array_contains`
    * stay the operators under test.
    */
  def q38(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("y"))
      .groupBy("o_custkey")
      .agg(sort_array(collect_set(col("y"))).as("years_arr"))
      .select(col("o_custkey"),
        concat_ws(",", col("years_arr").cast("array<string>")).as("years"),
        size(col("years_arr")).cast("long").as("n_years"),
        array_contains(col("years_arr"), lit(1995L)).as("active_1995"))
      .orderBy("o_custkey")

  /** q39 — time-series resampling: gap-fill to a dense monthly
    * calendar + last-observation-carried-forward. Monthly revenue per
    * customer (keys <= 50 to bound the demo grid) is left-joined onto
    * the cross of distinct customers × the corpus month span
    * (`sequence` + explode — the calendar is a broadcast of ~80 rows,
    * NEVER a shuffle), then LOCF fills the gaps with
    * `last(_, ignoreNulls)` over an unbounded-preceding frame. The
    * window partitions per customer, so at scale each partition is
    * one entity's months — bounded and parallel; the dense grid is
    * |entities| × |months| rows of three longs/doubles, which is the
    * product any resample materializes.
    */
  def q39(spark: SparkSession, dir: String): DataFrame = {
    val f = Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 50)
      .select(col("o_custkey"),
        to_date(date_trunc("month", col("o_orderdate"))).as("m"),
        col("o_totalprice"))
    val monthly = f.groupBy(col("o_custkey").as("ck"), col("m"))
      .agg(sum2(col("o_totalprice")).as("rev"))
    val months = f.agg(min("m").as("lo"), max("m").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 month"))).as("month"))
    val custs = f.select("o_custkey").distinct()
    val w = Window.partitionBy("o_custkey").orderBy("month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    custs.crossJoin(broadcast(months))
      .join(monthly,
        col("o_custkey") === col("ck") && col("month") === col("m"), "left")
      .select(col("o_custkey"), col("month"), col("rev"),
        last(col("rev"), ignoreNulls = true).over(w).as("rev_locf"),
        col("rev").isNotNull.as("has_order"))
      .orderBy("o_custkey", "month")
  }

  /** q40 — INTERSECT ALL (multiset semantics): (custkey, order-year)
    * pairs occurring under status 'O' intersected with the pairs from
    * high-value orders, KEEPING duplicate multiplicity
    * min(count_left, count_right) — the semantics `intersect`
    * (q13) erases. Catalyst plans this as one aggregate counting both
    * sides behind a single shuffle — no join, no distinct.
    */
  def q40(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("y"),
        col("o_orderstatus"), col("o_totalprice"))
    o.filter(col("o_orderstatus") === "O").select("o_custkey", "y")
      .intersectAll(o.filter(col("o_totalprice") > 150000).select("o_custkey", "y"))
      .orderBy("o_custkey", "y")
  }

  /** q41 — EXCEPT ALL: the multiset difference of the same two pair
    * streams (each copy on the right cancels ONE copy on the left).
    * Same single-shuffle counting aggregate shape as q40.
    */
  def q41(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).cast("long").as("y"),
        col("o_orderstatus"), col("o_totalprice"))
    o.filter(col("o_orderstatus") === "O").select("o_custkey", "y")
      .exceptAll(o.filter(col("o_totalprice") > 150000).select("o_custkey", "y"))
      .orderBy("o_custkey", "y")
  }

  /** q42 — Z-order (Morton) clustering key over (customer, order
    * day): the multi-dimensional layout key
    * ([[graft.operators.Layout.zOrderKey2]]) that makes range
    * predicates on EITHER dimension prune files at 100 TB. Pure
    * BIGINT bit arithmetic — the oracle replays every mask/shift/or.
    */
  def q42(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("d"))
      .select(col("o_orderkey"), col("o_custkey"), col("d"),
        graft.operators.Layout.zOrderKey2(col("o_custkey"), col("d"), 16)
          .as("zkey"))
      .orderBy("o_orderkey")

  /** q43 — ONE-PASS approximate quantiles via a fixed-width
    * histogram sketch: the bounded-state scale path next to q24's
    * exact two-pass percentiles. State per group is the bin histogram
    * (≤ ~2000 longs at width 250 over the price domain), built by a
    * map-side-combinable count — no per-group value buffering, no
    * per-group sort of the raw rows; the window runs over BINS, not
    * rows. Estimate = linear interpolation inside the straddling bin,
    * error bound = bin width. Every arithmetic step is a fixed IEEE
    * sequence on exact integers, so the oracle replays the sketch AND
    * the estimates bit-for-bit.
    */
  def q43(spark: SparkSession, dir: String): DataFrame = {
    val width = 250.0
    val hist = Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        floor(col("o_totalprice") / width).as("b"))
      .groupBy("o_orderstatus", "b").agg(count(lit(1)).as("cnt"))
    val wcum = Window.partitionBy("o_orderstatus").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grp = Window.partitionBy("o_orderstatus")
    val c = hist
      .withColumn("cum", sum("cnt").over(wcum))
      .withColumn("n", sum("cnt").over(grp))
    // the straddling bin is unique per group: the sum mixes one
    // non-zero double with exact zeros (order-independent, as q24)
    def est(p: Double): Column = {
      val t = lit(p) * col("n").cast("double")
      val prev = (col("cum") - col("cnt")).cast("double")
      when(col("cum").cast("double") >= t && prev < t,
        col("b").cast("double") * lit(width) +
          lit(width) * ((t - prev) / col("cnt").cast("double")))
        .otherwise(lit(0.0))
    }
    c.groupBy("o_orderstatus")
      .agg(max("n").as("n"),
        sum(est(0.5)).as("p50_est"), sum(est(0.9)).as("p90_est"))
      .orderBy("o_orderstatus")
  }

  /** q44 — relation profiling: per-column stats for a numeric column
    * set in ONE pass (count / nulls / min / max / exact-decimal mean),
    * unpivoted to a row per column. The single aggregate computes
    * every column's stats map-side-combinably — profiling a 100 TB
    * table costs one scan regardless of how many columns are
    * profiled; the unpivot of the 1-row aggregate is driver-free
    * restructuring of a constant-size result.
    */
  def q44(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val li = Tables.lineitem(spark, dir)
    val agg = li.agg(count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"),
        Det.avg2(col(c)).as(s"${c}__avg"))): _*)
    val perCol = cols.map(c => struct(lit(c).as("column"),
      col("n_rows"), col(s"${c}__nulls").as("n_nulls"),
      col(s"${c}__min").as("min_v"), col(s"${c}__max").as("max_v"),
      col(s"${c}__avg").as("avg_v")))
    agg.select(explode(array(perCol: _*)).as("s"))
      .select(col("s.column"), col("s.n_rows"), col("s.n_nulls"),
        col("s.min_v"), col("s.max_v"), col("s.avg_v"))
      .orderBy("column")
  }

  /** q45 — string aggregation (LISTAGG/STRING_AGG): per order
    * priority, the DISTINCT order years joined into one sorted
    * comma string. `collect_set` keeps bounded per-group state (the
    * year set, not the row stream) and `sort_array` makes the
    * unordered aggregation deterministic — the classic way to make
    * listagg engine-stable.
    */
  def q45(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), year(col("o_orderdate")).cast("long").as("y"))
      .groupBy("o_orderpriority")
      .agg(concat_ws(",", sort_array(collect_set(col("y")))).as("years_csv"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** q46 — correlated scalar subquery in the SELECT list: each
    * nation's max customer balance. Catalyst decorrelates the
    * subquery into an aggregate + ONE left outer join on the
    * correlation key — never a per-row re-execution — asserted in
    * PlanShapeSpec.
    */
  def q46(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("nation_g46")
    Tables.customer(spark, dir).createOrReplaceTempView("customer_g46")
    spark.sql(
      """SELECT n.n_nationkey, n.n_name,
        |  (SELECT MAX(c.c_acctbal) FROM customer_g46 c
        |   WHERE c.c_nationkey = n.n_nationkey) AS max_acctbal
        |FROM nation_g46 n
        |ORDER BY n.n_nationkey""".stripMargin)
  }

  /** q47 — time-RANGE window frame: each order's rolling 30-day
    * customer spend (RANGE BETWEEN INTERVAL ... PRECEDING — value-
    * based framing over timestamps, which q18's ROWS frames cannot
    * express: ties and gaps in time change the frame, not the row
    * count). Partitioned per customer so every frame scan is one
    * entity's bounded history; the sum accumulates in DECIMAL
    * (order-independent) and rounds via the Det formula, so the
    * oracle hash-matches.
    */
  def q47(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_g47")
    spark.sql(
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) * 100 + 0.5) / 100 AS rolling_30d
        |FROM orders_g47
        |WHERE o_custkey <= 200
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)
  }

  /** Spark-SQL-dialect renderings of the Det helpers (q36 builds its
    * plan via spark.sql, so the deterministic-sum formula has to be
    * emitted as Spark SQL text — same formula as [[Det.sum2]]).
    */
  private object SqlSpark {
    def sum2(x: String): String =
      s"FLOOR(CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE) * 100 + 0.5) / 100"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_full_outer" -> q33 _,
    "q34_grouping_sets" -> q34 _,
    "q35_pivot" -> q35 _,
    "q36_recursive_cte" -> q36 _,
    "q37_lateral_topk" -> q37 _,
    "q38_array_agg" -> q38 _,
    "q39_gapfill_locf" -> q39 _,
    "q40_intersect_all" -> q40 _,
    "q41_except_all" -> q41 _,
    "q42_zorder_key" -> q42 _,
    "q43_hist_quantiles" -> q43 _,
    "q44_profile" -> q44 _,
    "q45_string_agg" -> q45 _,
    "q46_correlated_scalar" -> q46 _,
    "q47_range_frame" -> q47 _,
  )

  val oracles: Map[String, String] = {
    import Det.{Sql => S}
    Map(
      "q33_full_outer" ->
        s"""WITH c AS (
           |  SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 100
           |), o AS (
           |  SELECT o_custkey, COUNT(*) AS n_orders,
           |    ${S.sum2("o_totalprice")} AS spend
           |  FROM orders WHERE o_custkey BETWEEN 60 AND 200
           |  GROUP BY o_custkey
           |)
           |SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           |  c.c_name, o.n_orders, o.spend
           |FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
           |ORDER BY custkey""".stripMargin,
      "q34_grouping_sets" ->
        s"""SELECT o_orderstatus, CAST(YEAR(o_orderdate) AS BIGINT) AS y,
           |  COUNT(*) AS n, ${S.sum2("o_totalprice")} AS total,
           |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(YEAR(o_orderdate)) AS BIGINT) AS gid
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderstatus), (YEAR(o_orderdate)), ())
           |ORDER BY gid, o_orderstatus ASC NULLS FIRST, y ASC NULLS FIRST""".stripMargin,
      "q35_pivot" ->
        s"""SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS y,
           |  ${S.round2("CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)")} AS "F",
           |  ${S.round2("CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)")} AS "O",
           |  ${S.round2("CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE)")} AS "P"
           |FROM orders GROUP BY 1 ORDER BY y""".stripMargin,
      "q36_recursive_cte" ->
        s"""WITH RECURSIVE months(m) AS (
           |  SELECT DATE '1995-01-01'
           |  UNION ALL
           |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
           |  WHERE m < DATE '1996-12-01'
           |),
           |monthly AS (
           |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS om,
           |    COUNT(*) AS n_orders,
           |    ${S.sum2("o_totalprice")} AS spend
           |  FROM orders
           |  GROUP BY 1
           |)
           |SELECT m, COALESCE(n_orders, 0) AS n_orders,
           |  COALESCE(spend, 0.0) AS spend
           |FROM months LEFT JOIN monthly ON m = om
           |ORDER BY m""".stripMargin,
      "q38_array_agg" ->
        """SELECT o_custkey,
          |  array_to_string(
          |    list_sort(list(DISTINCT CAST(YEAR(o_orderdate) AS BIGINT))), ',')
          |    AS years,
          |  CAST(len(list(DISTINCT YEAR(o_orderdate))) AS BIGINT) AS n_years,
          |  list_contains(list(DISTINCT CAST(YEAR(o_orderdate) AS BIGINT)), 1995)
          |    AS active_1995
          |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
      "q39_gapfill_locf" ->
        s"""WITH f AS (
           |  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
           |    o_totalprice
           |  FROM orders WHERE o_custkey <= 50
           |), monthly AS (
           |  SELECT o_custkey AS ck, m, ${S.sum2("o_totalprice")} AS rev
           |  FROM f GROUP BY 1, 2
           |), span AS (
           |  SELECT MIN(m) AS lo, MAX(m) AS hi FROM f
           |), months AS (
           |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE)
           |    AS month
           |  FROM span
           |), custs AS (
           |  SELECT DISTINCT o_custkey FROM f
           |)
           |SELECT c.o_custkey, months.month, monthly.rev,
           |  LAST_VALUE(monthly.rev IGNORE NULLS) OVER (
           |    PARTITION BY c.o_custkey ORDER BY months.month
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev_locf,
           |  monthly.rev IS NOT NULL AS has_order
           |FROM custs c CROSS JOIN months
           |LEFT JOIN monthly ON monthly.ck = c.o_custkey AND monthly.m = months.month
           |ORDER BY c.o_custkey, months.month""".stripMargin,
      "q40_intersect_all" ->
        """SELECT o_custkey, CAST(YEAR(o_orderdate) AS BIGINT) AS y
          |FROM orders WHERE o_orderstatus = 'O'
          |INTERSECT ALL
          |SELECT o_custkey, CAST(YEAR(o_orderdate) AS BIGINT) AS y
          |FROM orders WHERE o_totalprice > 150000
          |ORDER BY o_custkey, y""".stripMargin,
      "q41_except_all" ->
        """SELECT o_custkey, CAST(YEAR(o_orderdate) AS BIGINT) AS y
          |FROM orders WHERE o_orderstatus = 'O'
          |EXCEPT ALL
          |SELECT o_custkey, CAST(YEAR(o_orderdate) AS BIGINT) AS y
          |FROM orders WHERE o_totalprice > 150000
          |ORDER BY o_custkey, y""".stripMargin,
      "q42_zorder_key" ->
        s"""WITH base AS (
           |  SELECT o_orderkey, o_custkey,
           |    CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
           |      AS BIGINT) AS d
           |  FROM orders
           |)
           |SELECT o_orderkey, o_custkey, d,
           |  ${graft.operators.Layout.zOrderKey2Sql("o_custkey", "d", 16)} AS zkey
           |FROM base ORDER BY o_orderkey""".stripMargin,
      "q43_hist_quantiles" -> {
        def est(p: String): String =
          s"""SUM(CASE WHEN CAST(cum AS DOUBLE) >= ($p * CAST(n AS DOUBLE))
             |      AND CAST(cum - cnt AS DOUBLE) < ($p * CAST(n AS DOUBLE))
             |    THEN ((CAST(b AS DOUBLE) * 250.0) +
             |      (250.0 * ((($p * CAST(n AS DOUBLE)) - CAST(cum - cnt AS DOUBLE))
             |        / CAST(cnt AS DOUBLE))))
             |    ELSE 0.0 END)""".stripMargin
        s"""WITH h AS (
           |  SELECT o_orderstatus, CAST(FLOOR(o_totalprice / 250.0) AS BIGINT) AS b,
           |    COUNT(*) AS cnt
           |  FROM orders GROUP BY 1, 2
           |), c AS (
           |  SELECT o_orderstatus, b, cnt,
           |    CAST(SUM(cnt) OVER (PARTITION BY o_orderstatus ORDER BY b
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           |    CAST(SUM(cnt) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS n
           |  FROM h
           |)
           |SELECT o_orderstatus, MAX(n) AS n,
           |  ${est("0.5")} AS p50_est,
           |  ${est("0.9")} AS p90_est
           |FROM c GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
      },
      "q44_profile" -> {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val aggs = cols.map(c =>
          s"""CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |      AS ${c}__nulls,
             |    MIN($c) AS ${c}__min, MAX($c) AS ${c}__max,
             |    ${S.avg2(c)} AS ${c}__avg""".stripMargin).mkString(",\n    ")
        val rows = cols.map(c =>
          s"""SELECT '$c' AS "column", n_rows, ${c}__nulls AS n_nulls,
             |  ${c}__min AS min_v, ${c}__max AS max_v, ${c}__avg AS avg_v
             |FROM a""".stripMargin).mkString("\nUNION ALL\n")
        s"""WITH a AS (
           |  SELECT COUNT(*) AS n_rows,
           |    $aggs
           |  FROM lineitem
           |)
           |$rows
           |ORDER BY "column"""".stripMargin
      },
      "q45_string_agg" ->
        """SELECT o_orderpriority,
          |  array_to_string(list_sort(list(DISTINCT CAST(YEAR(o_orderdate) AS BIGINT))), ',')
          |    AS years_csv,
          |  COUNT(*) AS n
          |FROM orders GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin,
      "q46_correlated_scalar" ->
        """SELECT n.n_nationkey, n.n_name,
          |  (SELECT MAX(c.c_acctbal) FROM customer c
          |   WHERE c.c_nationkey = n.n_nationkey) AS max_acctbal
          |FROM nation n
          |ORDER BY n.n_nationkey""".stripMargin,
      "q47_range_frame" ->
        """SELECT o_custkey, o_orderkey, o_orderdate,
          |  FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
          |    PARTITION BY o_custkey ORDER BY o_orderdate
          |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
          |    AS DOUBLE) * 100 + 0.5) / 100 AS rolling_30d
          |FROM orders
          |WHERE o_custkey <= 200
          |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
      "q37_lateral_topk" ->
        """SELECT n.n_name, t.c_custkey, t.c_acctbal
          |FROM nation n
          |JOIN LATERAL (
          |  SELECT c_custkey, c_acctbal
          |  FROM customer c
          |  WHERE c.c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_custkey
          |  LIMIT 2
          |) t ON TRUE
          |ORDER BY n.n_name, t.c_custkey""".stripMargin,
    )
  }
}
