package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table plumbing for co-located joins — the standard way to
  * make a repeated big-big equi-join shuffle-free at warehouse scale.
  *
  * Writing both sides bucketed (and sorted) by the join key with the
  * SAME bucket count gives every scan a `HashPartitioning` output
  * that `EnsureRequirements` accepts as-is: the sort-merge join plans
  * with NO Exchange on either side (BucketingSpec asserts this), so
  * a 100 TB fact-to-fact join pays zero network shuffle every time it
  * runs — the shuffle cost is paid once, at write time. This is the
  * persisted-table counterpart of the in-query `repartition` barriers
  * used by the dedup operators ([[graft.operators.Dedup.barrier]]).
  *
  * Rules that keep the plan exchange-free:
  *   - both tables bucketed by the SAME key with the SAME bucket count;
  *   - bucket count sized so one bucket of the larger table fits an
  *     executor core's working set (at 100 TB: thousands of buckets);
  *   - `sortBy` on the bucket key lets the merge join skip re-sorting
  *     when each bucket holds one file (one writer task per bucket —
  *     repartition before write to guarantee it).
  */
object Bucketing {

  /** Write `df` as a parquet-backed managed table bucketed and sorted
    * by `key`. Repartitions on the key first so each bucket is one
    * file (single writer per bucket), which preserves the sorted-scan
    * property readers rely on.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two same-bucketed tables on `key`. With aligned bucket
    * layouts this plans shuffle-free (no Exchange under the join).
    */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
