package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.streaming.EventStreams

/** Live streaming walkthrough: stage the events fixture as a
  * streaming source, run windowed aggregations through the real
  * micro-batch engine into memory sinks, print results.
  * Run: sbt "runMain graft.tools.StreamingDemo [sfDir]"
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stage = Files.createTempDirectory("graft_events_demo")
    Files.copy(Paths.get(s"$sfDir/events.parquet"), stage.resolve("events.parquet"))

    val stream = EventStreams.readEventStream(spark, stage.toString)
    val tumbling = EventStreams.runToMemory(
      EventStreams.tumblingCounts(stream), "demo_tumbling", "complete")
    println(s"tumbling windows: ${tumbling.count()}")
    tumbling.orderBy("window_start", "event_type").show(6, truncate = false)

    val sessions = EventStreams.runToMemory(
      EventStreams.sessionCounts(stream), "demo_sessions", "complete")
    println(s"user sessions: ${sessions.count()}")
    sessions.orderBy("session_start", "user_id").show(4, truncate = false)
    spark.stop()
  }
}
