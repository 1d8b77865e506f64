package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 snapshot dataflow — the dbt `snapshot` materialization's
  * merge, expressed as pure DataFrame algebra so the SAME logic serves
  * the build plane ([[graft.exec.ModelExecutor]] dispatches
  * `materialized: snapshot` here) and the oracle gate (t160 replays
  * this merge in DuckDB SQL over two fixture batches).
  *
  * Reference semantics (dbt snapshots; the reference project consumes
  * them through its manifest — core/osmosis.py treats snapshot nodes
  * as first-class models): each run compares the freshly-selected
  * batch against the CURRENT rows (dbt_valid_to IS NULL) of the
  * snapshot table and
  *  - closes rows whose key has a newer version (valid_to := the new
  *    version stamp),
  *  - inserts the new versions (valid_from := the stamp, open-ended),
  *  - inserts never-seen keys,
  *  - leaves unchanged current rows and ALL history rows untouched,
  *  - optionally closes rows whose key vanished from the source
  *    (`invalidate_hard_deletes`).
  *
  * Strategies:
  *  - `timestamp`: a row changed iff batch.updated_at > current
  *    dbt_updated_at; the version stamp is the row's own updated_at.
  *  - `check`: a row changed iff any check column differs (null-safe
  *    `<=>` negation); the version stamp is the RUN's stamp (passed
  *    in — deterministic replays pass a fixed literal).
  *
  * `dbt_scd_id` is md5(key || '|' || stamp) on the STRING casts —
  * both engines produce identical hex, so the id is oracle-checkable.
  *
  * Scale shape: ONE equi-join of the batch against the current slice
  * on the unique key (both sides shuffle on the key once; AQE
  * broadcast-flips small batches), an anti-join falls out of the same
  * left join's null side, and history rows ride a union without being
  * touched — no window over the snapshot, no global sort. At 100 TB
  * the snapshot table is key-bucketed so the merge join co-locates;
  * the history partition (valid_to IS NOT NULL) is filter-pruned out
  * of the join entirely.
  */
object Scd2 {

  val MetaCols: Seq[String] =
    Seq("dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to")

  private def scdId(keyCol: String, stamp: Column): Column =
    md5(concat(col(keyCol).cast("string"), lit("|"), stamp.cast("string")))

  /** Batch rows stamped as open snapshot rows (first run, or the
    * insert side of a merge): meta columns appended in canonical
    * order, valid_to open (null, typed as the stamp).
    */
  private def stampRows(batch: DataFrame, keyCol: String,
      stamp: Column): DataFrame = {
    val stampType = batch.select(stamp.as("__s")).schema.head.dataType
    batch.select(col("*"),
      scdId(keyCol, stamp).as("dbt_scd_id"),
      stamp.as("dbt_updated_at"),
      stamp.as("dbt_valid_from"),
      lit(null).cast(stampType).as("dbt_valid_to"))
  }

  /** First snapshot run — timestamp strategy (stamp = the row's own
    * updated-at column). */
  def firstSnapshotTimestamp(batch: DataFrame, keyCol: String,
      updatedAtCol: String): DataFrame =
    stampRows(guardStamp(guardUnique(batch, keyCol), updatedAtCol),
      keyCol, col(updatedAtCol))

  /** First snapshot run — check strategy (stamp = the run stamp). */
  def firstSnapshotCheck(batch: DataFrame, keyCol: String,
      runStamp: Column): DataFrame =
    stampRows(guardUnique(batch, keyCol), keyCol, runStamp)

  /** dbt refuses duplicate scd_ids; fail at the source the same way —
    * a batch carrying the same unique_key twice would close one
    * version with two successors. Folded into a consumed column (the
    * key itself) so pruning can't drop the guard; the window rides
    * the key shuffle the merge join needs anyway.
    */
  private def guardUnique(batch: DataFrame, keyCol: String): DataFrame = {
    val wk = Window.partitionBy(keyCol)
    batch
      .withColumn("__kc", count(lit(1)).over(wk))
      .withColumn(keyCol,
        when(expr("assert_true(__kc = 1, 'duplicate unique_key in " +
          "snapshot batch')").isNull, col(keyCol)))
      .drop("__kc")
  }

  /** A NULL version stamp would poison the merge silently: the stored
    * open row gets a NULL dbt_updated_at and the `>` change predicate
    * drops every later update of that key. Reject at the source, the
    * [[guardUnique]] discipline — folded into the consumed stamp
    * column so pruning can't drop the guard.
    */
  private def guardStamp(batch: DataFrame, updatedAtCol: String): DataFrame =
    batch.withColumn(updatedAtCol,
      when(expr(s"assert_true(`$updatedAtCol` IS NOT NULL, " +
        "'NULL updated_at in snapshot batch — the timestamp strategy " +
        "needs a non-null stamp on every row')").isNull,
        col(updatedAtCol)))

  /** Timestamp-strategy merge of a new batch into an existing
    * snapshot table. `deleteStamp` closes hard-deleted keys when
    * `invalidateHardDeletes` (dbt stamps them with the run time;
    * deterministic replays pass a literal).
    */
  def snapshotMergeTimestamp(snap: DataFrame, batch: DataFrame,
      keyCol: String, updatedAtCol: String,
      invalidateHardDeletes: Boolean = false,
      deleteStamp: Option[Column] = None): DataFrame =
    merge(snap, batch, keyCol,
      changed = col(updatedAtCol) > col("__cur_updated_at"),
      stamp = col(updatedAtCol),
      invalidateHardDeletes, deleteStamp,
      stampGuardCol = Some(updatedAtCol))

  /** Check-strategy merge: changed iff any check column differs
    * null-safely; every new version carries the run stamp.
    */
  def snapshotMergeCheck(snap: DataFrame, batch: DataFrame,
      keyCol: String, checkCols: Seq[String], runStamp: Column,
      invalidateHardDeletes: Boolean = false): DataFrame = {
    require(checkCols.nonEmpty, "check strategy needs check_cols")
    val changed = checkCols.map(c => !(col(c) <=> col(s"__cur_$c")))
      .reduce(_ || _)
    merge(snap, batch, keyCol, changed, runStamp,
      invalidateHardDeletes, Some(runStamp), curCols = checkCols)
  }

  /** The shared merge. `changed` sees the batch row's columns plus the
    * current row's comparison columns prefixed `__cur_`; `stamp` is
    * the version value stamped onto closed rows' valid_to and the new
    * versions' valid_from.
    */
  private def merge(snap: DataFrame, batch0: DataFrame, keyCol: String,
      changed: Column, stamp: Column, invalidateHardDeletes: Boolean,
      deleteStamp: Option[Column],
      curCols: Seq[String] = Nil,
      stampGuardCol: Option[String] = None): DataFrame = {
    val outCols = snap.columns.toSeq
    val dataCols = outCols.filterNot(MetaCols.contains)
    val guarded = guardUnique(batch0.select(dataCols.map(col): _*), keyCol)
    val batch = stampGuardCol.fold(guarded)(guardStamp(guarded, _))
    val cur = snap.filter(col("dbt_valid_to").isNull)
    val hist = snap.filter(col("dbt_valid_to").isNotNull)

    // ONE key-keyed left join decides new-key vs existing-key vs
    // changed, carrying exactly the current columns the change
    // predicate needs (updated_at for timestamp, check cols for check).
    // Key existence rides an EXPLICIT marker, never a data column's
    // nullness: a stored open row can legitimately carry a NULL
    // dbt_updated_at (a historical bad stamp), and inferring "new key"
    // from it would silently insert a second open row per key forever.
    val curSide = cur.select(
      (col(keyCol) +: lit(true).as("__cur_exists") +:
        col("dbt_updated_at").as("__cur_updated_at") +:
        curCols.map(c => col(c).as(s"__cur_$c"))): _*)
    val probed = batch.join(curSide, Seq(keyCol), "left")
      .localCheckpoint() // three consumers: new keys, changed, closing
    val newKeys = probed.filter(col("__cur_exists").isNull)
      .select(dataCols.map(col): _*)
    val changedRows = probed.filter(col("__cur_exists").isNotNull && changed)
    val inserts = stampRows(
      changedRows.select(dataCols.map(col): _*).unionByName(newKeys),
      keyCol, stamp)

    // close the superseded current rows with each key's new stamp
    val closing = changedRows.select(col(keyCol), stamp.as("__new_stamp"))
    val curProbed = cur.join(closing, Seq(keyCol), "left")
      .localCheckpoint() // two consumers: closed + still-open
    val closed = curProbed.filter(col("__new_stamp").isNotNull)
      .withColumn("dbt_valid_to", col("__new_stamp")).drop("__new_stamp")
    val stillOpen0 = curProbed.filter(col("__new_stamp").isNull)
      .drop("__new_stamp")

    val stillOpen =
      if (!invalidateHardDeletes) stillOpen0
      else {
        val ds = deleteStamp.getOrElse(throw new IllegalArgumentException(
          "invalidate_hard_deletes requires a delete stamp"))
        val live = stillOpen0.join(
            batch.select(col(keyCol)), Seq(keyCol), "left_semi")
        val gone = stillOpen0.join(
            batch.select(col(keyCol)), Seq(keyCol), "left_anti")
          .withColumn("dbt_valid_to", ds.cast(
            snap.schema("dbt_valid_from").dataType))
        live.unionByName(gone)
      }

    hist.unionByName(closed.select(outCols.map(col): _*))
      .unionByName(stillOpen.select(outCols.map(col): _*))
      .unionByName(inserts.select(outCols.map(col): _*))
  }
}
