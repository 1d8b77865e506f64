package graft

import org.apache.spark.sql.SparkSession

/** Execution-layer session config shared by every graft face (Bench,
  * Verify, Cli/serve plane) — ONE definition site so a measured
  * execution-layer choice reaches all of them (the r15 shuffle-writer
  * finding only landed in Bench/Verify and the serve plane missed it).
  * Nothing here is result-visible; per-face knobs (master, appName,
  * shuffle partitions) stay with the caller.
  */
object SessionDefaults {
  def apply(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS); read as nanos-long
      // (converted explicitly where timestamps are needed)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // sort-based shuffle writer for small-width shuffles too — the
      // r15 A/B finding: the bypass-merge writer opens R partition
      // files per MAP task (R × M tiny files + a concat per task at
      // local partition counts) and measured 25–40% slower on the
      // checkpoint/store-heavy queries; at production partition
      // counts (>200 reducers) the sort writer runs anyway, so this
      // aligns small-width shuffles with the production path. Purely
      // an execution-layer choice, never visible in results;
      // env-overridable for A/B.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_BYPASS", "2"))
}
