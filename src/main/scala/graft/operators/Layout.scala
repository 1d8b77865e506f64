package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout utilities for scan pruning at scale.
  *
  * Z-ordering (Morton interleave) clusters rows so that a range
  * predicate on ANY of the interleaved dimensions touches a small
  * fraction of files — the standard multi-dimensional layout for
  * 100 TB tables where min/max footer statistics drive file skipping
  * (single-column sort gives perfect pruning on one dimension and
  * none on the others; the interleave spends the ordering budget
  * across all of them). No reference counterpart — the reference
  * delegates storage layout to the warehouse.
  *
  * Everything here is pure BIGINT bit arithmetic inside whole-stage
  * codegen, and the same expressions are replayable verbatim in
  * DuckDB SQL for the oracle gate (q42).
  */
object Layout {

  /** Morton/Z key of two non-negative dimensions: bit i of `a` lands
    * at position 2i, bit i of `b` at 2i+1, over the low `bits` bits
    * of each (values are masked first, so out-of-range inputs wrap
    * into the grid instead of corrupting high bits). A static fold of
    * shift/and/or ops — codegen-friendly, no UDF.
    */
  def zOrderKey2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val am = a.bitwiseAND(lit((1L << bits) - 1))
    val bm = b.bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** DuckDB rendering of [[zOrderKey2]] — identical masks, shifts and
    * ors, for oracle parity. Every term is FULLY parenthesized:
    * DuckDB gives `&`, `|`, `<<` equal precedence left-to-right, so
    * an unparenthesized `x | y << k` is `(x | y) << k`.
    */
  def zOrderKey2Sql(a: String, b: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { i =>
      Seq(s"(((((${a}) & $mask) >> $i) & 1) << ${2 * i})",
        s"(((((${b}) & $mask) >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }

  /** Write `df` z-ordered on two dimension columns: range-partition
    * by the z-key into `numFiles` output files, sort within each
    * partition by the key, and write parquet. Each file then covers a
    * compact Z-curve segment, so its footer min/max on BOTH
    * dimensions span ~1/√numFiles of the domain — a range filter on
    * either dimension prunes most files. One range shuffle (sampled
    * bounds), the same cost any clustering write pays.
    */
  def writeZOrdered(df: DataFrame, dimA: String, dimB: String,
      numFiles: Int, path: String, bits: Int = 16): Unit =
    df.withColumn("__z", zOrderKey2(col(dimA), col(dimB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
