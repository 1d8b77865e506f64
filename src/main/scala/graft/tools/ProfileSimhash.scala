package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Scratch probe: candidate-pair volume of simhash banding schemes
  * (4 x 16-bit chunks vs 56 x 40-bit 5-of-8-chunk keys) at a given
  * SF. Not part of the shipped API.
  */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1_bench")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val fp = docs.select(col("doc_id").as("id"),
      graft.operators.Dedup.simhash64(col("text")).as("f"))
      .repartition(32).persist()
    println(s"[probe] docs=${fp.count()} distinct_fp=${fp.select("f").distinct().count()}")

    // scheme A: 4 x 16-bit chunks
    val a = fp.select(col("id"), explode(array((0 until 4).map(b =>
      struct(lit(b).as("band"), (shiftrightunsigned(col("f"), b * 16) % 65536).as("key"))): _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    val aVol = a.groupBy("band", "key").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1) / 2)).collect()(0).getAs[Any](0)
    println(s"[probe] 4x16 candidate pairs (with dup pairs across bands): $aVol")

    // scheme A on DISTINCT fingerprints (compression variant)
    val dfp = fp.select("f").distinct()
    val a2 = dfp.select(col("f"), explode(array((0 until 4).map(b =>
      struct(lit(b).as("band"), (shiftrightunsigned(col("f"), b * 16) % 65536).as("key"))): _*)).as("bk"))
      .select(col("f"), col("bk.band"), col("bk.key"))
    val a2Vol = a2.groupBy("band", "key").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1) / 2)).collect()(0).getAs[Any](0)
    println(s"[probe] 4x16 on distinct fps: $a2Vol")
    val intra = fp.groupBy("f").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1) / 2)).collect()(0).getAs[Any](0)
    println(s"[probe] intra-cluster (identical-fp) pairs: $intra")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    time("fingerprints")(docs.select(
      graft.operators.Dedup.simhash64(col("text"))).count())
    time("candidates (band join + hamming + distinct)")(
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
    time("full t07")(
      graft.operators.Dedup.simhashNearDups(docs, "doc_id", "text", 3, 3, 0.5).count())
    // size-prefilter selectivity
    val withSim = docs.select(col("doc_id").as("id"),
      array_sort(graft.operators.Dedup.shingles(col("text"), 3)).as("sh"),
      graft.operators.Dedup.simhash64(col("text")).as("sim")).repartition(32)
    val cands = graft.operators.Dedup.simhashPairsFromFingerprints(
      withSim.select("id", "sim"), 3)
    val sizes = withSim.select(col("id"), size(col("sh")).as("sz"))
    time("size-filtered pairs")(cands
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(0.5) * greatest(col("sz_a"), col("sz_b")).cast("double")).count())
    spark.stop()
  }
}
