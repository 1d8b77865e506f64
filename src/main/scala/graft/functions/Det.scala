package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic numeric helpers for oracle (DuckDB) hash-parity.
  *
  * Floating-point aggregates are the classic source of cross-engine
  * drift (SURVEY §7 risk 6): partial-aggregation order changes the
  * last ulp of a double sum, and each engine's ROUND() has its own
  * tie-breaking (JVM BigDecimal HALF_UP on the shortest decimal
  * rendering vs C++ rounding on the binary value). Strategy:
  *
  *  1. Sum doubles in DECIMAL(18,4) — exact, order-independent, and
  *     still map-side-combinable (decimal sum stays a partial agg, so
  *     no extra shuffle vs a double sum).
  *  2. Convert the exact decimal back to double (nearest-double is a
  *     deterministic function of the value in both engines).
  *  3. Round with pure IEEE arithmetic — FLOOR(x*100 + 0.5)/100 —
  *     which both engines evaluate bit-identically, instead of each
  *     engine's library ROUND.
  *
  * The same formulas are emitted in the DuckDB oracle SQL (see
  * [[graft.queries.Relational.Sql]]).
  */
object Det {
  /** Exact accumulation type for money-scale doubles (TPC-H prices). */
  val Money: DecimalType = DecimalType(18, 4)

  /** Round half-up to 2 decimals via pure double arithmetic.
    * Spark floor() on double yields LongType; the /100 promotes back
    * to double. Exact for |x| < 2^53/100.
    */
  def round2(c: Column): Column = floor(c * 100 + lit(0.5)) / 100

  /** SUM(double) with exact decimal accumulation, rounded to 2dp. */
  def sum2(c: Column): Column = round2(sum(c.cast(Money)).cast("double"))

  /** AVG(double) = exact decimal sum / count, rounded to 2dp. */
  def avg2(c: Column): Column =
    round2(sum(c.cast(Money)).cast("double") / count(c))

  /** Oracle-side (DuckDB SQL) renderings of the same formulas. */
  object Sql {
    def round2(x: String): String = s"FLOOR(($x) * 100 + 0.5) / 100"
    def sum2(x: String): String =
      round2(s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)")
    def avg2(x: String): String =
      round2(s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE) / COUNT($x)")
  }
}
