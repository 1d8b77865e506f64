package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Guard against UNSPLITTABLE scans feeding heavy per-row work
  * (guide §2.5: "one huge unsplittable file … repartition immediately
  * after the read"): parquet splits only at row-group boundaries, so
  * a table that arrives as one (or a few) huge row groups runs its
  * whole scan stage — and every tokenize/shingle/contains pass
  * Catalyst fuses into it — in that many tasks, whatever the core
  * count. The r15 profile measured 1.2–2.0 s single-threaded
  * tokenize stages under t30/t69/t77 and a 2 s single-task
  * probe-contains pass under t98 on a 32-core session.
  *
  * `lowSplit` redistributes ONCE, by a deterministic hash of the
  * caller's id column (stable under task retries — never
  * rand/round-robin, SPARK-38388), and ONLY when the scan yields
  * fewer splits than min(defaultParallelism, 8): at production
  * layouts (many files / row groups) it is the identity, so nothing
  * here is tuned to local mode. Column pruning and filter pushdown
  * pass through a RepartitionByExpression, so the exchange carries
  * only the columns the query reads.
  *
  * Applied ONLY where the r15 profile showed the heavy work actually
  * riding a low-split scan stage — operators whose first move is a
  * shuffle (exploded-token aggregations, barriers) already
  * parallelize and measured SLOWER with a blanket table-level guard
  * (the extra full-text exchange is pure cost there).
  */
private[graft] object ScanGuard {
  /** Estimated scan splits from the LOGICAL file sources only — never
    * `df.rdd` (materializing an RDD from a plan that carries
    * `observe()` nodes claims their Observation registration, and the
    * caller's real action then reports zero counts — found the hard
    * way by CurationSpec). Non-file leaves (checkpointed RDDs,
    * in-memory relations) count as already-parallel: they carry the
    * partitioning of the job that built them.
    */
  private def estimatedSplits(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    val session = df.sparkSession
    val maxSplit = math.max(1L,
      session.sessionState.conf.filesMaxPartitionBytes)
    // parquet files split at row-group boundaries; estimate row groups
    // per file from bytes / parquet.block.size (the writer's row-group
    // target, default 128 MB) rather than a fixed per-file cap — a
    // single 10 GB multi-row-group file really does yield ~80 splits,
    // and capping the estimate at 4 would trigger a pointless
    // full-text exchange on exactly that production layout
    val blockSize = math.max(1L,
      session.sessionState.newHadoopConf()
        .getLong("parquet.block.size", 128L * 1024 * 1024))
    // the ANALYZED plan, not `.logical`: Spark 4's `read.parquet`
    // keeps an UnresolvedDataSource leaf in the raw logical plan, so
    // a raw table handle would estimate Int.MaxValue splits and the
    // guard would silently never fire (exactly what happened to the
    // r15 queryTf/shingleFps sites — their plans never contained the
    // guard exchange). Analysis resolves the relation without running
    // any job (and without claiming observe() registrations).
    df.queryExecution.analyzed.collectLeaves().map {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          val files = math.max(1, fs.location.inputFiles.length)
          val bySize = (fs.location.sizeInBytes + maxSplit - 1) / maxSplit
          val byRowGroups =
            (fs.location.sizeInBytes + blockSize - 1) / blockSize
          // a small file is at most one row group — take the file
          // count unless total bytes prove more row groups (and hence
          // scan splits) exist; never claim more splits than the
          // read-side split size allows
          math.max(files.toLong, math.min(bySize, byRowGroups)).toInt
        case _ => Int.MaxValue
      }
      case _ => Int.MaxValue
    }.foldLeft(Int.MaxValue)(math.min)
  }

  /** A/B switch: `SPARK_GRAFT_SCANGUARD=off` makes the guard the
    * identity everywhere (measurement aid — the guard's default
    * behavior is unchanged and self-adapting, this is not a tuning
    * knob).
    */
  private val enabled =
    !sys.env.get("SPARK_GRAFT_SCANGUARD").exists(_.equalsIgnoreCase("off"))

  def lowSplit(df: DataFrame, keyCol: String): DataFrame = {
    if (!enabled) return df
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (estimatedSplits(df) >= math.min(parallelism, 8)) df
    else df.repartition(parallelism, col(keyCol))
  }
}
