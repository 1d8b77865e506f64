package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-data scaler: replicate a fixture SF directory `copies`×,
  * shifting every key column by a copy-stride so referential
  * integrity holds per copy (copy c's lineitem joins copy c's orders,
  * parts, suppliers). Dimension tables (region, nation) stay
  * unreplicated, exactly like TPC-H scaling.
  *
  * Text and embeddings are PERTURBED per copy rather than cloned:
  * cloned documents/vectors would put every row in a 10-member
  * near-duplicate cluster, turning the dedup/ANN benchmarks into
  * quadratic clone-pair enumeration that measures fixture artifacts,
  * not scaling. `translate` remaps common letters per copy (shingle
  * sets diverge, so near-dup rates stay fixture-like) and embeddings
  * are rotated per copy (norm preserved, direction changed).
  *
  *   runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1_bench 10
  *
  * Output is for BENCHMARKING only — oracle correctness stays on the
  * driver-provided fixtures.
  */
object ScaleUp {
  private val Stride = 100000000L

  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def base(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name -> $out/$name.parquet")
    }

    def replicate(name: String)(shift: (DataFrame, Int) => DataFrame): Unit =
      write(name, (0 until copies).map(c => shift(base(name), c)).reduce(_ unionByName _))

    def shiftKeys(df: DataFrame, c: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(c * Stride)))

    // letters rotated per copy: most tokens change, so cross-copy
    // shingle overlap collapses instead of forming clone clusters
    def perturbText(df: DataFrame, c: Int, textCol: String): DataFrame =
      if (c == 0) df
      else {
        val alphabet = "abcdefghijklmnop"
        val rotated = alphabet.drop(c % alphabet.length) + alphabet.take(c % alphabet.length)
        df.withColumn(textCol, translate(col(textCol), alphabet, rotated))
      }

    def rotateArray(df: DataFrame, c: Int, colName: String): DataFrame =
      if (c == 0) df
      else df.withColumn(colName,
        concat(slice(col(colName), c + 1, 1 << 20), slice(col(colName), 1, c)))

    // dims pass through once
    write("region", base("region"))
    write("nation", base("nation"))

    replicate("customer")(shiftKeys(_, _, "c_custkey"))
    replicate("supplier")(shiftKeys(_, _, "s_suppkey"))
    replicate("part")(shiftKeys(_, _, "p_partkey"))
    replicate("orders")(shiftKeys(_, _, "o_orderkey", "o_custkey"))
    replicate("lineitem")(shiftKeys(_, _, "l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events")(shiftKeys(_, _, "event_id", "user_id"))
    replicate("documents")((df, c) =>
      perturbText(shiftKeys(df, c, "doc_id"), c, "text"))
    replicate("embeddings")((df, c) =>
      rotateArray(shiftKeys(df, c, "vec_id"), c, "embedding"))

    println(s"[scaleup] done: $copies copies of $src at $out")
    spark.stop()
  }
}
