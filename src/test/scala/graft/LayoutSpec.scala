package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Z-order layout: key correctness against hand-interleaved bits, and
  * the property that actually matters at 100 TB — per-file min/max
  * footer spans on BOTH dimensions shrink, so range predicates on
  * either dimension prune most files.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("zOrderKey2: hand-computed Morton interleave and masking") {
    val df = Seq((3L, 1L), (1L, 3L), (0L, 0L), (2L, 2L)).toDF("a", "b")
    val got = df.select(Layout.zOrderKey2(col("a"), col("b"), 2))
      .collect().map(_.getLong(0)).toSeq
    // a-bits at even positions, b-bits at odd:
    // (3,1)=a11,b01 -> 0111=7; (1,3) -> 1011=11; (0,0) -> 0; (2,2) -> 1100=12
    assert(got == Seq(7L, 11L, 0L, 12L))
    // masking: values beyond `bits` wrap into the grid, high bits clean
    val wrapped = Seq((4L + 3L, 4L + 1L)).toDF("a", "b")
      .select(Layout.zOrderKey2(col("a"), col("b"), 2))
      .collect().head.getLong(0)
    assert(wrapped == 7L, "out-of-range bits must be masked off")
  }

  test("zOrderKey2 agrees with a driver-side reference interleave") {
    def ref(a: Long, b: Long, bits: Int): Long = {
      val mask = (1L << bits) - 1
      val (am, bm) = (a & mask, b & mask)
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((am >> i) & 1L) << (2 * i)) | (((bm >> i) & 1L) << (2 * i + 1))
      }
    }
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextLong().abs % 70000, rnd.nextLong().abs % 70000))
    val got = pts.toDF("a", "b")
      .select(Layout.zOrderKey2(col("a"), col("b"), 16)).collect().map(_.getLong(0))
    val want = pts.map { case (a, b) => ref(a, b, 16) }
    assert(got.toSeq == want)
  }

  test("writeZOrdered: per-file spans compress on BOTH dimensions") {
    // a uniform 64x64 grid -> 16 z-range files should each cover a
    // compact curve segment: ~16/64 of the domain per dimension,
    // where a single-column sort would give 64/64 on the other dim
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val out = Files.createTempDirectory("graft_zorder").toString
    Layout.writeZOrdered(df, "x", "y", numFiles = 16, path = out, bits = 6)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    assert(files.size == 16, s"expected 16 z-range files, got ${files.size}")
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).collect().head
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    val avgX = spans.map(_._1).sum.toDouble / spans.size
    val avgY = spans.map(_._2).sum.toDouble / spans.size
    // perfect 16-segment z-curve on a 64x64 grid gives 15 on each
    // dimension; allow boundary slack but require BOTH far below the
    // global span of 63 (a 1-D sort leaves one of these at ~63)
    assert(avgX < 32, s"x spans did not compress: avg $avgX of 63")
    assert(avgY < 32, s"y spans did not compress: avg $avgY of 63")
  }
}
