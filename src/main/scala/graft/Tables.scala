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

  /** events with `ts` as a proper TIMESTAMP (with local time zone —
    * the type watermarks and time windows require; sessions all run
    * UTC so the instant is unchanged). Normalizes whichever physical
    * type the fixture generation produced:
    *  - TIMESTAMP(NANOS) + `nanosAsLong` → nanos-since-epoch LONG:
    *    integer-divide to micros (double division would lose
    *    precision above 2^53) and rebuild the timestamp;
    *  - TIMESTAMP(MICROS) → TIMESTAMP_NTZ: cast to LTZ;
    *  - already LTZ: pass through.
    */
  def eventsWithTs(spark: SparkSession, dir: String): DataFrame =
    withTsTimestamp(events(spark, dir))

  /** events with `ts` as nanos-since-epoch LONG — the fixed-point
    * representation the time-join/sessionization operators do their
    * bucket and gap arithmetic in (exact, overflow-free to year
    * 2262, and identical on both engines; the DuckDB oracles replay
    * it via `epoch_us(ts) * 1000`-style arithmetic). Inverse of
    * [[eventsWithTs]] modulo the sub-microsecond digits the µs
    * fixtures never had.
    */
  def eventsNanos(spark: SparkSession, dir: String): DataFrame =
    withTsNanos(events(spark, dir))

  private def withTsTimestamp(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  private def withTsNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df
      case _ => df.withColumn("ts",
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
    }
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
