package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.exec.ModelExecutor
import graft.project.ProjectLoader

/** dbt snapshot (SCD2) materialization end-to-end: first run opens
  * every row, a re-run with changed rows closes the superseded
  * validity windows and inserts the new versions, unchanged rows are
  * untouched, hard-deleted keys close when asked, and duplicate keys
  * fail loudly. Timestamp and check strategies both covered; the
  * merge dataflow itself is oracle-gated as t160.
  */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private def writeProject(root: java.nio.file.Path, modelSql: String,
      seedRows: Seq[String], header: String = "id,val,upd"): Unit = {
    Files.createDirectories(root.resolve("models"))
    Files.createDirectories(root.resolve("seeds"))
    Files.writeString(root.resolve("dbt_project.yml"),
      "name: snapdemo\nversion: '1.0'\n")
    Files.writeString(root.resolve("seeds/src_seed.csv"),
      (header +: seedRows).mkString("\n") + "\n")
    Files.writeString(root.resolve("models/snap_model.sql"), modelSql)
  }

  private def rows(name: String): Seq[(Int, String, Any, Any)] =
    spark.table(name).orderBy("id", "dbt_valid_from").collect().toSeq
      .map(r => (r.getAs[Any]("id").toString.toInt, r.getAs[String]("val"),
        r.getAs[Any]("dbt_valid_from"), r.getAs[Any]("dbt_valid_to")))

  test("timestamp strategy: changed rows close old windows, open new ones") {
    val root = Files.createTempDirectory("graft_snap_ts")
    val work = Files.createTempDirectory("graft_snap_ts_tbl").toString
    val sql =
      """{{ config(materialized='snapshot', strategy='timestamp',
        |          unique_key='id', updated_at='upd') }}
        |select id, val, upd from {{ ref('src_seed') }}
        |""".stripMargin
    writeProject(root, sql, Seq("1,a,100", "2,b,100", "3,c,100"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    val first = rows("snap_model")
    assert(first.size == 3 && first.forall(_._4 == null))

    // id=2 updated (newer upd), id=1/3 unchanged, id=4 brand new
    writeProject(root, sql,
      Seq("1,a,100", "2,B,130", "3,c,100", "4,d,120"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    val got = rows("snap_model")
    assert(got.size == 5)
    val byId = got.groupBy(_._1)
    // closed old version of id=2 at the new stamp, open new version
    assert(byId(2).map(t => (t._2, t._3, t._4)).toSet ==
      Set(("b", 100, 130), ("B", 130, null)))
    // unchanged rows still open with their original windows
    assert(byId(1) == Seq((1, "a", 100, null)))
    assert(byId(3) == Seq((3, "c", 100, null)))
    // new key opens at its own stamp
    assert(byId(4) == Seq((4, "d", 120, null)))

    // idempotent re-run: same source, no new versions
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    assert(rows("snap_model").size == 5)

    // scd ids are distinct across versions of the same key
    val ids = spark.table("snap_model").select("dbt_scd_id")
      .collect().map(_.getString(0)).toSeq
    assert(ids.distinct.size == ids.size)
  }

  test("timestamp strategy: older or equal stamps never reopen history") {
    val root = Files.createTempDirectory("graft_snap_old")
    val work = Files.createTempDirectory("graft_snap_old_tbl").toString
    val sql =
      """{{ config(materialized='snapshot', strategy='timestamp',
        |          unique_key='id', updated_at='upd') }}
        |select id, val, upd from {{ ref('src_seed') }}
        |""".stripMargin
    writeProject(root, sql, Seq("1,a,100"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    // a LATE-arriving extract with an older stamp and different val:
    // timestamp strategy ignores it (upd not newer)
    writeProject(root, sql, Seq("1,z,90"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    assert(rows("snap_model") == Seq((1, "a", 100, null)))
  }

  test("check strategy: value changes version at the run stamp; " +
      "hard deletes close") {
    val root = Files.createTempDirectory("graft_snap_chk")
    val work = Files.createTempDirectory("graft_snap_chk_tbl").toString
    def sql(stamp: Int) =
      s"""{{ config(materialized='snapshot', strategy='check',
         |          unique_key='id', check_cols=['val'],
         |          invalidate_hard_deletes=true,
         |          snapshot_at='CAST($stamp AS BIGINT)') }}
         |select id, val from {{ ref('src_seed') }}
         |""".stripMargin
    writeProject(root, sql(100), Seq("1,a,0", "2,b,0", "3,c,0"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    assert(rows("snap_model").forall(t => t._3 == 100L && t._4 == null))

    // id=1 value flips, id=3 hard-deleted, id=2 unchanged
    writeProject(root, sql(200), Seq("1,A,0", "2,b,0"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    val got = rows("snap_model").groupBy(_._1)
    assert(got(1).map(t => (t._2, t._3, t._4)).toSet ==
      Set(("a", 100L, 200L), ("A", 200L, null)))
    assert(got(2) == Seq((2, "b", 100L, null)))
    assert(got(3) == Seq((3, "c", 100L, 200L))) // closed, not removed
  }

  test("NULL updated_at in a timestamp-strategy batch fails loudly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val batch = Seq((1L, "a", Some(100L)), (2L, "b", None))
      .toDF("id", "val", "upd")
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    // first run and merge run both reject a NULL stamp at the source:
    // it would poison the stored dbt_updated_at and silently drop
    // every later update of that key (the `>` predicate is never true
    // against NULL)
    val ex1 = intercept[Exception] {
      graft.operators.Scd2.firstSnapshotTimestamp(batch, "id", "upd")
        .collect()
    }
    assert(messages(ex1).exists(_.contains("NULL updated_at")))
    val snap = graft.operators.Scd2.firstSnapshotTimestamp(
      batch.filter(col("upd").isNotNull), "id", "upd").localCheckpoint()
    val ex2 = intercept[Exception] {
      graft.operators.Scd2.snapshotMergeTimestamp(snap, batch, "id", "upd")
        .collect()
    }
    assert(messages(ex2).exists(_.contains("NULL updated_at")))
  }

  test("key existence rides the explicit marker, not dbt_updated_at " +
      "nullness: a NULL-stamped stored row never duplicates its key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val b1 = Seq((1L, "a", 100L), (2L, "b", 100L)).toDF("id", "val", "upd")
    // a historical bad stamp: id=1's stored open row carries NULL
    // dbt_updated_at (e.g. written by a legacy tool) — the key still
    // EXISTS, so a merge must not insert a second open row for it
    val snap = graft.operators.Scd2.firstSnapshotTimestamp(b1, "id", "upd")
      .withColumn("dbt_updated_at",
        when(col("id") === 1L, lit(null).cast("long"))
          .otherwise(col("dbt_updated_at")))
      .localCheckpoint()
    val b2 = Seq((1L, "a2", 130L), (2L, "b", 100L)).toDF("id", "val", "upd")
    val merged = graft.operators.Scd2.snapshotMergeTimestamp(
      snap, b2, "id", "upd").localCheckpoint()
    val open = merged.filter(col("dbt_valid_to").isNull)
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(open == Map(1L -> 1L, 2L -> 1L),
      s"every key must keep exactly ONE open row, got $open")
    // the NULL-stamped row is treated as existing-but-not-provably-
    // changed (NULL comparison), dbt's fail-safe: no spurious version
    assert(merged.count() == 2L)
  }

  test("default run stamp is ONE driver-side literal: closed.valid_to " +
      "equals the successor's valid_from exactly") {
    val root = Files.createTempDirectory("graft_snap_stamp")
    val work = Files.createTempDirectory("graft_snap_stamp_tbl").toString
    // check strategy with NO snapshot_at override — the
    // current_timestamp() default must resolve once per run, or the
    // closed side (checkpointed first) and the inserts (written later)
    // carry different stamps and as-of queries between them see no row
    val sql =
      """{{ config(materialized='snapshot', strategy='check',
        |          unique_key='id', check_cols=['val']) }}
        |select id, val from {{ ref('src_seed') }}
        |""".stripMargin
    writeProject(root, sql, Seq("1,a,0", "2,b,0"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    writeProject(root, sql, Seq("1,A,0", "2,B,0"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    val got = spark.table("snap_model")
      .select("id", "dbt_valid_from", "dbt_valid_to").collect()
    val closedTo = got.filter(_.get(2) != null).map(_.get(2)).toSet
    val openedFrom = got.filter(_.get(2) == null)
      .map(_.get(1)).toSet -- got.filter(_.get(2) != null).map(_.get(1)).toSet
    assert(closedTo.size == 1, s"one run stamp for all closures: $closedTo")
    assert(openedFrom == closedTo,
      s"successor valid_from $openedFrom must equal closed valid_to $closedTo")
  }

  test("duplicate unique_key in a snapshot batch fails loudly") {
    val root = Files.createTempDirectory("graft_snap_dup")
    val work = Files.createTempDirectory("graft_snap_dup_tbl").toString
    val sql =
      """{{ config(materialized='snapshot', strategy='timestamp',
        |          unique_key='id', updated_at='upd') }}
        |select id, val, upd from {{ ref('src_seed') }}
        |""".stripMargin
    writeProject(root, sql, Seq("1,a,100", "1,b,110"))
    val ex = intercept[Exception] {
      new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("duplicate unique_key")))
  }
}
