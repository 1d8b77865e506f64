package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixture tables
  * (see TESTDATA.md / FIXTURES.md §2). Each table is one parquet
  * file under the scale-factor directory.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * access path stays the same: a DataFrame per table, with filters and
  * projections pushed to the scan by Catalyst.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoize the DataFrame handle per (session, path): file listing +
  // schema inference (footer reads) otherwise repeat on every query
  // that touches the table. Plans are still derived fresh per query —
  // only the relation metadata is reused.
  private val handles =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    handles.computeIfAbsent((spark, s"$dir/$name.parquet"),
      key => key._1.read.parquet(key._2))

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")

  /** events with `ts` as a proper timestamp. Under
    * `spark.sql.legacy.parquet.nanosAsLong` the TIMESTAMP(NANOS)
    * column arrives as nanos-since-epoch; integer-divide to micros
    * (plain double division would lose precision above 2^53).
    */
  def eventsWithTs(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
    import org.apache.spark.sql.functions._
    if (e.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      e.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else e
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Register all fixture tables as temp views so `spark.sql` text
    * (the Plane-B passthrough surface, SURVEY §2B) can reference them
    * by name exactly like the reference's warehouse relations.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
