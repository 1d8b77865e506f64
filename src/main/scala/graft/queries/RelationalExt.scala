package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det

/** Extended relational operator coverage beyond OSM-Q1..Q12: the rest
  * of the linter/passthrough keyword surface (SURVEY §2B —
  * INTERSECT/EXCEPT, NOT EXISTS, HAVING, ROLLUP, window frames,
  * scalar subqueries, BETWEEN/LIKE) plus a broadcast star join.
  */
object RelationalExt {
  import Det.{round2, sum2}

  /** q13 — INTERSECT (nation keys present in both relations). */
  def q13(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nk"))
      .intersect(Tables.supplier(spark, dir).select(col("s_nationkey").as("nk")))
      .orderBy("nk")

  /** q14 — EXCEPT over overlapping key ranges: customer keys ≤ 800
    * minus ordering-customer keys ≤ 400. The ranges are chosen so the
    * result is non-empty at every SF (the fixture gives every customer
    * orders, so an unfiltered EXCEPT would be an empty — and therefore
    * vacuous — correctness gate).
    */
  def q14(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") <= 800)
      .select(col("c_custkey").as("k"))
      .except(Tables.orders(spark, dir)
        .filter(col("o_custkey") <= 400)
        .select(col("o_custkey").as("k")))
      .orderBy("k")

  /** q15 — NOT EXISTS as a left-anti join: customers with no order in
    * Q1-1995 (a date window keeps the result non-empty — every
    * customer has *some* order in the fixture).
    */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) === 1995 && month(col("o_orderdate")) <= 3)
      .select("o_custkey")
    Tables.customer(spark, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** q16 — HAVING: high-volume customers only. */
  def q16(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum2(col("o_totalprice")).as("total_spend"))
      .filter(col("n_orders") > 15)
      .orderBy("o_custkey")

  /** q17 — ROLLUP subtotals over (status, year). Grouping NULLs mark
    * subtotal rows; grouping_id disambiguates them deterministically.
    */
  def q17(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), year(col("o_orderdate")).cast("long").as("y"),
        col("o_totalprice"))
      .rollup("o_orderstatus", "y")
      .agg(count(lit(1)).as("n"), sum2(col("o_totalprice")).as("total"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first, col("y").asc_nulls_first)

  /** q18 — window frames: per-customer running order total (exact
    * decimal accumulation inside the frame — segment-tree vs
    * incremental summation would otherwise drift between engines).
    */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("running_total",
        round2(sum(col("o_totalprice").cast(Det.Money)).over(w).cast("double")))
      .select("o_custkey", "o_orderkey", "running_total")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q19 — scalar subquery predicate: orders above the global mean
    * price (mean computed in exact decimal space).
    */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val stats = o.agg(
      (sum(col("o_totalprice").cast(Det.Money)).cast("double") /
        count(lit(1))).as("mean_price"))
    o.crossJoin(broadcast(stats))
      .filter(col("o_totalprice") > col("mean_price"))
      .select(col("o_orderkey"), round2(col("o_totalprice")).as("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** q20 — BETWEEN + LIKE + IN predicate combination. */
  def q20(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_size").between(10, 20) &&
        col("p_type").like("%AR%") &&
        col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
      .orderBy("p_partkey")

  /** q21 — star-schema join: revenue per region. nation/region are
    * broadcast (dim tables); the fact scan aggregates map-side first.
    */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    Tables.orders(spark, dir).select("o_custkey", "o_totalprice")
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"), sum2(col("o_totalprice")).as("revenue"))
      .orderBy("r_name")
  }

  /** q22 — CASE/COALESCE null handling over a left join. */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    val totals = Tables.orders(spark, dir).groupBy("o_custkey")
      .agg(sum2(col("o_totalprice")).as("spend"))
    Tables.customer(spark, dir)
      .join(totals, col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"),
        coalesce(col("spend"), lit(0.0)).as("spend"),
        when(col("spend").isNull, "none")
          .when(col("spend") > 200000, "high")
          .otherwise("normal").as("tier"))
      .orderBy("c_custkey")
  }

  /** q23 — CUBE over (status, year): all four grouping combinations.
    * gid is built EXPLICITLY from grouping() bits so both engines
    * agree regardless of their internal grouping_id conventions.
    */
  def q23(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), year(col("o_orderdate")).cast("long").as("y"),
        col("o_totalprice"))
      .cube("o_orderstatus", "y")
      .agg(count(lit(1)).as("n"), sum2(col("o_totalprice")).as("total"),
        (grouping(col("o_orderstatus")) * 2 + grouping(col("y")))
          .cast("long").as("gid"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first, col("y").asc_nulls_first)

  /** q24 — exact percentiles per group: median and p90 of order
    * totals, computed SORT-BASED rather than with Spark's built-in
    * `percentile` aggregate. The built-in is a
    * TypedImperativeAggregate that buffers EVERY group value in one
    * reducer's memory — with 3 status groups at 100 TB that is an OOM
    * with parallelism 3. Here the heavy step is a per-group window
    * sort (UnsafeExternalSorter: spills to disk, never OOMs), each row
    * then contributes `(crn-rn)·v` / `(rn-frn)·v` weights for the rank
    * positions it occupies, and a plain hash aggregate sums them —
    * map-side partial, constant memory per group.
    *
    * Interpolation matches both Spark's `percentile` and DuckDB's
    * `quantile_cont` bit-for-bit: pos = p·(n-1) over the sorted exact
    * doubles; result = (ceil(pos)-pos)·v[floor] + (pos-floor(pos))·v[ceil]
    * (the value itself when pos is integral). The additions below mix
    * only one or two non-zero doubles with exact 0.0 terms, so the
    * sum is order-independent.
    */
  def q24(spark: SparkSession, dir: String): DataFrame = {
    val grp = Window.partitionBy("o_orderstatus")
    val byValue = grp.orderBy("v")
    val ranked = Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_totalprice").as("v"))
      .withColumn("rn0", (row_number().over(byValue) - 1).cast("double"))
      .withColumn("n", count(lit(1)).over(grp))

    // weight of this row in the exact percentile p (0 for all but the
    // one or two rows straddling pos = p·(n-1))
    def contrib(p: Double): Column = {
      val pos = lit(p) * (col("n") - lit(1L)).cast("double")
      val frn = floor(pos)
      val crn = ceil(pos)
      when(col("rn0") === frn && frn === crn, col("v"))
        .when(col("rn0") === frn, (crn - pos) * col("v"))
        .when(col("rn0") === crn, (pos - frn) * col("v"))
        .otherwise(lit(0.0))
    }

    ranked
      .groupBy("o_orderstatus")
      .agg(
        sum(contrib(0.5)).as("median_total"),
        sum(contrib(0.9)).as("p90_total"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  /** q25 — correlated EXISTS with an extra predicate: customers with
    * at least one big finished order (semi-join carrying a non-key
    * condition).
    */
  def q25(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 300000)
      .select("o_custkey")
    Tables.customer(spark, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** q26 — lateral expansion: posexplode of the tokenized part type
    * (one row per word with its position — the SQL UNNEST WITH
    * ORDINALITY shape).
    */
  def q26(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") <= 500)
      .select(col("p_partkey"),
        posexplode(split(col("p_type"), " ")).as(Seq("pos", "word")))
      .select(col("p_partkey"), col("pos").cast("long").as("pos"), col("word"))
      .orderBy("p_partkey", "pos")

  /** q27 — as-of join: each click event picks the latest preceding
    * (or simultaneous) view by the same user
    * ([[graft.operators.TimeJoins.asOf]] — union + keyed running
    * window, ONE shuffle, no inequality join). Oracle: DuckDB's
    * native ASOF LEFT JOIN — same semantics, independently
    * implemented engine.
    */
  def q27(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
    graft.operators.TimeJoins.asOf(clicks, views, "user_id", "ts", "ts",
        payload = Seq("view_id"), tieBreak = "view_id")
      .select("click_id", "user_id", "view_id")
      .orderBy("click_id")
  }

  /** q28 — range join: clicks by the same user within the 24 h
    * before each error event
    * ([[graft.operators.TimeJoins.rangeCountPreceding]] — banded
    * equi-join on (user, time-bucket) + residual filter; the oracle
    * states the same window as a plain inequality join).
    */
  def q28(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsNanos(spark, dir)
    val dayNanos = 86400L * 1000000000L
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    graft.operators.TimeJoins.rangeCountPreceding(errors, clicks, "user_id",
        "ts", "ts", window = dayNanos, leftId = "event_id",
        countName = "n_clicks")
      .select("event_id", "user_id", "n_clicks")
      .orderBy("event_id")
  }

  /** q29 — batch sessionization (gaps-and-islands): split each user's
    * event stream into sessions at >30 min silences. Two windows over
    * the SAME (user_id, ts) sort — Catalyst reuses one shuffle+sort —
    * then a hash aggregate per session. `ts` is raw nanos (see
    * [[graft.Tables.eventsNanos]]); it is truncated to MICROS first
    * because DuckDB reads TIMESTAMP(NANOS) parquet at µs precision
    * (truncating — verified empirically), and all arithmetic stays in
    * long µs space so the oracle replays it exactly via `epoch_us`.
    *
    * Tied timestamps are safe: only the first row of a tie group can
    * carry the new-session flag (the rest see gap 0), and the running
    * sum assigns every tied row the same session id regardless of
    * which engine's sort puts which row first.
    */
  def q29(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 1800L * 1000000L // 30 minutes
    val w = Window.partitionBy("user_id").orderBy("tsu")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.eventsNanos(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("tsu"))
      .withColumn("new_s",
        when(lag(col("tsu"), 1).over(w).isNull ||
          col("tsu") - lag(col("tsu"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), (max(col("tsu")) - min(col("tsu"))).as("dur_us"))
      .orderBy("user_id", "session_id")
  }

  /** q30 — unpivot/melt: part's numeric measures to (metric, value)
    * rows. Map-only (Expand node — no shuffle, no join against a
    * metric dimension).
    */
  def q30(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "metric", "value")
      .orderBy("p_partkey", "metric")

  /** q31 — lag/lead/ntile over one per-customer sort: previous and
    * next order price plus the in-customer price-date quartile. All
    * three functions share a single window sort (one shuffle).
    */
  def q31(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .select("o_custkey", "o_orderkey", "prev_price", "next_price", "quartile")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q32 — blocked fuzzy self-join: near-identical part names within
    * the same size class (edit distance ≤ 2). Two scale levers, both
    * the shape a 100 TB entity-resolution pass needs:
    *
    *   1. the `p_size` block key turns all-pairs into an equi-join —
    *      distance is never computed across blocks; and
    *   2. the Levenshtein residual is evaluated once per DISTINCT
    *      (size, name) pair, not once per row pair (the same
    *      distinct-value compression as the simhash banding): at sf1
    *      that is ~2·10⁵ distance calls instead of 4·10⁸ (measured
    *      138 s → see BENCH), and the accepted name pairs — a tiny
    *      relation — are broadcast and expanded back to row pairs by
    *      two equi-joins.
    */
  def q32(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select("p_partkey", "p_name", "p_size")
    val names = p.select(col("p_size").as("sz"), col("p_name").as("nm")).distinct()
    // ordered distinct-name candidates (self-pairs included): each row
    // pair (key_a < key_b) later matches exactly one ordered name pair
    val cand = names.select(col("sz"), col("nm").as("name_a"))
      .join(names.select(col("sz").as("szb"), col("nm").as("name_b")),
        col("sz") === col("szb"))
      // bounded variant: the DP early-exits once the distance exceeds
      // the threshold (returns -1), O(m·k) instead of O(m·n) per pair
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), 2).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= 2)
      .select("sz", "name_a", "name_b", "dist")
    val a = p.select(col("p_partkey").as("key_a"), col("p_name").as("name_a"),
      col("p_size").as("sz"))
    val b = p.select(col("p_partkey").as("key_b"), col("p_name").as("nm_b"),
      col("p_size").as("sz_b"))
    a.join(broadcast(cand), Seq("sz", "name_a"))
      .join(b, col("sz") === col("sz_b") && col("name_b") === col("nm_b"))
      .filter(col("key_a") < col("key_b"))
      .select("key_a", "key_b", "name_a", "name_b", "dist")
      .orderBy("key_a", "key_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_intersect" -> q13 _,
    "q14_except" -> q14 _,
    "q15_anti_join" -> q15 _,
    "q16_having" -> q16 _,
    "q17_rollup" -> q17 _,
    "q18_window_frames" -> q18 _,
    "q19_scalar_subquery" -> q19 _,
    "q20_predicates" -> q20 _,
    "q21_star_broadcast" -> q21 _,
    "q22_case_coalesce" -> q22 _,
    "q23_cube" -> q23 _,
    "q24_percentiles" -> q24 _,
    "q25_exists_predicate" -> q25 _,
    "q26_posexplode" -> q26 _,
    "q27_asof_join" -> q27 _,
    "q28_range_join" -> q28 _,
    "q29_sessionize" -> q29 _,
    "q30_unpivot" -> q30 _,
    "q31_lag_lead_ntile" -> q31 _,
    "q32_fuzzy_join" -> q32 _,
  )

  val oracles: Map[String, String] = {
    import Det.{Sql => S}
    Map(
      "q13_intersect" ->
        """SELECT c_nationkey AS nk FROM customer
          |INTERSECT
          |SELECT s_nationkey AS nk FROM supplier
          |ORDER BY nk""".stripMargin,
      "q14_except" ->
        """SELECT c_custkey AS k FROM customer WHERE c_custkey <= 800
          |EXCEPT
          |SELECT o_custkey AS k FROM orders WHERE o_custkey <= 400
          |ORDER BY k""".stripMargin,
      "q15_anti_join" ->
        """SELECT c_custkey, c_name, c_mktsegment FROM customer c
          |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          |                  AND YEAR(o.o_orderdate) = 1995 AND MONTH(o.o_orderdate) <= 3)
          |ORDER BY c_custkey""".stripMargin,
      "q16_having" ->
        s"""SELECT o_custkey, COUNT(*) AS n_orders, ${S.sum2("o_totalprice")} AS total_spend
           |FROM orders GROUP BY o_custkey HAVING COUNT(*) > 15
           |ORDER BY o_custkey""".stripMargin,
      "q17_rollup" ->
        s"""SELECT o_orderstatus, CAST(YEAR(o_orderdate) AS BIGINT) AS y,
           |  COUNT(*) AS n, ${S.sum2("o_totalprice")} AS total,
           |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(YEAR(o_orderdate)) AS BIGINT) AS gid
           |FROM orders GROUP BY ROLLUP (o_orderstatus, YEAR(o_orderdate))
           |ORDER BY gid, o_orderstatus ASC NULLS FIRST, y ASC NULLS FIRST""".stripMargin,
      "q18_window_frames" ->
        s"""SELECT o_custkey, o_orderkey,
           |  ${S.round2("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER " +
             "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
             "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)")} AS running_total
           |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
      "q19_scalar_subquery" ->
        s"""SELECT o_orderkey, ${S.round2("o_totalprice")} AS o_totalprice
           |FROM orders
           |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
           |                             / COUNT(*) FROM orders)
           |ORDER BY o_orderkey""".stripMargin,
      "q20_predicates" ->
        """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
          |WHERE p_size BETWEEN 10 AND 20 AND p_type LIKE '%AR%'
          |  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
          |ORDER BY p_partkey""".stripMargin,
      "q21_star_broadcast" ->
        s"""SELECT r.r_name, COUNT(*) AS n_orders, ${S.sum2("o.o_totalprice")} AS revenue
           |FROM orders o
           |JOIN customer c ON o.o_custkey = c.c_custkey
           |JOIN nation n ON c.c_nationkey = n.n_nationkey
           |JOIN region r ON n.n_regionkey = r.r_regionkey
           |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin,
      "q22_case_coalesce" ->
        s"""WITH totals AS (
           |  SELECT o_custkey, ${S.sum2("o_totalprice")} AS spend
           |  FROM orders GROUP BY o_custkey
           |)
           |SELECT c.c_custkey, COALESCE(t.spend, 0.0) AS spend,
           |  CASE WHEN t.spend IS NULL THEN 'none'
           |       WHEN t.spend > 200000 THEN 'high'
           |       ELSE 'normal' END AS tier
           |FROM customer c LEFT JOIN totals t ON c.c_custkey = t.o_custkey
           |ORDER BY c.c_custkey""".stripMargin,
      "q23_cube" ->
        s"""SELECT o_orderstatus, CAST(YEAR(o_orderdate) AS BIGINT) AS y,
           |  COUNT(*) AS n, ${S.sum2("o_totalprice")} AS total,
           |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(YEAR(o_orderdate)) AS BIGINT) AS gid
           |FROM orders GROUP BY CUBE (o_orderstatus, YEAR(o_orderdate))
           |ORDER BY gid, o_orderstatus ASC NULLS FIRST, y ASC NULLS FIRST""".stripMargin,
      "q24_percentiles" ->
        """SELECT o_orderstatus,
          |  quantile_cont(o_totalprice, 0.5) AS median_total,
          |  quantile_cont(o_totalprice, 0.9) AS p90_total,
          |  COUNT(*) AS n
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      "q25_exists_predicate" ->
        """SELECT c_custkey, c_name FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          |              AND o.o_orderstatus = 'F' AND o.o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin,
      "q27_asof_join" ->
        """SELECT c.event_id AS click_id, c.user_id, v.event_id AS view_id
          |FROM (SELECT * FROM events WHERE event_type = 'click') c
          |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          |  ON c.user_id = v.user_id AND v.ts <= c.ts
          |ORDER BY click_id""".stripMargin,
      "q28_range_join" ->
        """SELECT e.event_id, e.user_id, COUNT(c.user_id) AS n_clicks
          |FROM (SELECT * FROM events WHERE event_type = 'error') e
          |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          |  ON e.user_id = c.user_id
          |  AND c.ts >= e.ts - INTERVAL 24 HOUR AND c.ts < e.ts
          |GROUP BY 1, 2 ORDER BY e.event_id""".stripMargin,
      "q29_sessionize" ->
        """WITH ord AS (
          |  SELECT user_id, epoch_us(ts) AS tsu,
          |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
          |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
          |         THEN 1 ELSE 0 END AS new_s
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
          |), s AS (
          |  SELECT user_id, tsu,
          |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu
          |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          |  FROM ord
          |)
          |SELECT user_id, CAST(sid AS BIGINT) AS session_id, COUNT(*) AS n_events,
          |  CAST(MAX(tsu) - MIN(tsu) AS BIGINT) AS dur_us
          |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,
      "q30_unpivot" ->
        """SELECT p_partkey, metric, value FROM (
          |  SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice FROM part
          |) UNPIVOT (value FOR metric IN (p_size, p_retailprice))
          |ORDER BY p_partkey, metric""".stripMargin,
      "q31_lag_lead_ntile" ->
        """SELECT o_custkey, o_orderkey,
          |  LAG(o_totalprice) OVER w AS prev_price,
          |  LEAD(o_totalprice) OVER w AS next_price,
          |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile
          |FROM orders
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
          |ORDER BY o_custkey, o_orderkey""".stripMargin,
      "q32_fuzzy_join" ->
        """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
          |  a.p_name AS name_a, b.p_name AS name_b,
          |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
          |FROM part a JOIN part b
          |  ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey
          |WHERE levenshtein(a.p_name, b.p_name) <= 2
          |ORDER BY key_a, key_b""".stripMargin,
      "q26_posexplode" ->
        """WITH t AS (
          |  SELECT p_partkey, string_split(p_type, ' ') AS parts
          |  FROM part WHERE p_partkey <= 500
          |)
          |SELECT p_partkey,
          |  CAST(unnest(range(0, len(parts))) AS BIGINT) AS pos,
          |  unnest(parts) AS word
          |FROM t ORDER BY p_partkey, pos""".stripMargin,
    )
  }
}
