package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.exec.ModelExecutor
import graft.project.ProjectLoader

/** Incremental materialization end-to-end: first run full-refreshes,
  * later runs compile with `is_incremental() = true` / `{{ this }}`
  * bound and apply the append or unique_key-merge strategy.
  */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private def writeProject(root: java.nio.file.Path, modelSql: String,
      seedRows: Seq[String]): Unit = {
    Files.createDirectories(root.resolve("models"))
    Files.createDirectories(root.resolve("seeds"))
    Files.writeString(root.resolve("dbt_project.yml"),
      "name: incdemo\nversion: '1.0'\n")
    Files.writeString(root.resolve("seeds/events_seed.csv"),
      ("id,val" +: seedRows).mkString("\n") + "\n")
    Files.writeString(root.resolve("models/inc_model.sql"), modelSql)
  }

  test("append strategy: only rows past the high-water mark are added") {
    val root = Files.createTempDirectory("graft_inc")
    val work = Files.createTempDirectory("graft_inc_tbl").toString
    val sql =
      """{{ config(materialized='incremental') }}
        |select id, val from {{ ref('events_seed') }}
        |{% if is_incremental() %}
        |where id > (select max(id) from {{ this }})
        |{% endif %}
        |""".stripMargin
    writeProject(root, sql, Seq("1,a", "2,b", "3,c"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    assert(spark.table("inc_model").count() == 3)

    // new seed rows arrive; same relation dir, fresh run
    writeProject(root, sql, Seq("1,a", "2,b", "3,c", "4,d", "5,e"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    val got = spark.table("inc_model").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq(1 -> "a", 2 -> "b", 3 -> "c", 4 -> "d", 5 -> "e"))

    // idempotent third run: nothing past the high-water mark
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    assert(spark.table("inc_model").count() == 5)
  }

  test("merge swap is crash-recoverable: no lost-relation window") {
    val root = Files.createTempDirectory("graft_inc_crash")
    val work = Files.createTempDirectory("graft_inc_crash_tbl").toString
    val sql =
      """{{ config(materialized='incremental', unique_key='id') }}
        |select id, val from {{ ref('events_seed') }}
        |""".stripMargin
    writeProject(root, sql, Seq("1,a", "2,b"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    val rel = java.nio.file.Paths.get(s"$work/inc_model")
    val retired = java.nio.file.Paths.get(s"$work/inc_model__retired")
    val staging = java.nio.file.Paths.get(s"$work/inc_model__staging")

    // a normal merge cycle leaves no intermediate dirs behind
    writeProject(root, sql, Seq("1,a", "2,b2"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    assert(Files.isDirectory(rel))
    assert(!Files.exists(retired) && !Files.exists(staging),
      "swap must clean up its intermediate directories")

    // simulate a crash between "move old aside" and "move staging in":
    // the old relation must still exist on disk (at __retired) — the
    // swap never deletes the only copy before the new one is in place
    Files.move(rel, retired)
    assert(Files.exists(retired), "old data recoverable after simulated crash")
    // rebuilding from the crash state full-refreshes, and the next
    // merge cycle clears the leftover __retired copy
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    assert(spark.table("inc_model").count() == 2)
    writeProject(root, sql, Seq("1,a", "2,b2", "3,c"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    assert(spark.table("inc_model").count() == 3)
    assert(!Files.exists(retired) && !Files.exists(staging))
  }

  test("unique_key merge: updated rows replace their old versions") {
    val root = Files.createTempDirectory("graft_inc_mk")
    val work = Files.createTempDirectory("graft_inc_mk_tbl").toString
    val sql =
      """{{ config(materialized='incremental', unique_key='id') }}
        |select id, val from {{ ref('events_seed') }}
        |""".stripMargin
    writeProject(root, sql, Seq("1,a", "2,b", "3,c"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    assert(spark.table("inc_model").count() == 3)

    // id 3 updated, ids 4-5 new: merge keeps ONE row per key with the
    // fresh value
    writeProject(root, sql, Seq("1,a", "2,b", "3,c2", "4,d", "5,e"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    val got = spark.table("inc_model").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq(1 -> "a", 2 -> "b", 3 -> "c2", 4 -> "d", 5 -> "e"))
  }

  test("full_refresh rebuilds from scratch with is_incremental() false") {
    val root = Files.createTempDirectory("graft_inc_fr")
    val work = Files.createTempDirectory("graft_inc_fr_tbl").toString
    val incSql =
      """{{ config(materialized='incremental') }}
        |select id, val from {{ ref('events_seed') }}
        |{% if is_incremental() %}
        |where id > (select max(id) from {{ this }})
        |{% endif %}
        |""".stripMargin
    writeProject(root, incSql, Seq("1,a", "2,b", "3,c"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    assert(spark.table("inc_model").count() == 3)
    // the seed SHRINKS; full_refresh must rebuild to exactly the new
    // seed (append/merge would have kept the stale rows)
    val frSql = incSql.replace("materialized='incremental'",
      "materialized='incremental', full_refresh=true")
    writeProject(root, frSql, Seq("1,a", "2,b"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    val got = spark.table("inc_model").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq(1 -> "a", 2 -> "b"), s"stale rows survived: $got")
  }

  test("append strategy rejects unique_key instead of silently merging") {
    val root = Files.createTempDirectory("graft_inc_ak")
    val work = Files.createTempDirectory("graft_inc_ak_tbl").toString
    val sql =
      """{{ config(materialized='incremental', incremental_strategy='append', unique_key='id') }}
        |select id, val from {{ ref('events_seed') }}
        |""".stripMargin
    writeProject(root, sql, Seq("1,a", "2,b"))
    // first build creates the relation (no strategy dispatch yet)
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    // the incremental run must fail loudly — append never reads the
    // target, so a unique_key would silently change semantics
    val e = intercept[Exception] {
      new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("append") &&
        c.getMessage.contains("unique_key")), e.getMessage)
  }

  test("full_refresh keeps the live relation when the rebuild fails") {
    val root = Files.createTempDirectory("graft_inc_frx")
    val work = Files.createTempDirectory("graft_inc_frx_tbl").toString
    val sql =
      """{{ config(materialized='incremental') }}
        |select id, val from {{ ref('events_seed') }}
        |""".stripMargin
    writeProject(root, sql, Seq("1,a", "2,b"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()

    // the refresh batch is broken (unknown column): the rebuild fails
    // BEFORE the swap, so the live relation must survive untouched —
    // the old delete-then-write path would have destroyed it first
    val bad =
      """{{ config(materialized='incremental', full_refresh=true) }}
        |select id, no_such_column from {{ ref('events_seed') }}
        |""".stripMargin
    writeProject(root, bad, Seq("1,a", "2,b"))
    intercept[Exception] {
      new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    }
    val survived = spark.read.parquet(s"$work/inc_model").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(survived == Seq(1 -> "a", 2 -> "b"),
      s"relation lost or corrupted by failed full_refresh: $survived")
  }

  test("on_schema_change: ignore drops new columns, append_new_columns keeps them") {
    def run(root: java.nio.file.Path, work: String, sql: String,
        rows: Seq[String]): Unit = {
      writeProject(root, sql, rows)
      new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    }
    def base(cfg: String, extraCol: String): String =
      """{{ config(materialized='incremental'CFG) }}
        |select id, valEXTRA from {{ ref('events_seed') }}
        |{% if is_incremental() %}
        |where id > (select max(id) from {{ this }})
        |{% endif %}
        |""".stripMargin.replace("CFG", cfg).replace("EXTRA", extraCol)

    // ignore (default): the evolved batch projects onto the old schema
    val r1 = Files.createTempDirectory("graft_osc_ig")
    val w1 = Files.createTempDirectory("graft_osc_ig_tbl").toString
    run(r1, w1, base("", ""), Seq("1,a"))
    run(r1, w1, base("", ", upper(val) as uval"), Seq("1,a", "2,b"))
    assert(spark.table("inc_model").columns.toSeq == Seq("id", "val"),
      "ignore must not add the new column")
    assert(spark.table("inc_model").count() == 2)

    // append_new_columns: new column appears, null for pre-existing rows
    val r2 = Files.createTempDirectory("graft_osc_ap")
    val w2 = Files.createTempDirectory("graft_osc_ap_tbl").toString
    run(r2, w2, base(", on_schema_change='append_new_columns'", ""),
      Seq("1,a"))
    run(r2, w2, base(", on_schema_change='append_new_columns'",
      ", upper(val) as uval"), Seq("1,a", "2,b"))
    val t2 = spark.table("inc_model").orderBy("id")
      .collect().map(r => (r.getInt(0), Option(r.getString(2)))).toSeq
    assert(spark.table("inc_model").columns.toSeq == Seq("id", "val", "uval"))
    assert(t2 == Seq(1 -> None, 2 -> Some("B")),
      s"old rows must be null in the new column: $t2")

    // fail: refuse the run on any schema change
    val r3 = Files.createTempDirectory("graft_osc_f")
    val w3 = Files.createTempDirectory("graft_osc_f_tbl").toString
    run(r3, w3, base(", on_schema_change='fail'", ""), Seq("1,a"))
    val e = intercept[IllegalStateException] {
      run(r3, w3, base(", on_schema_change='fail'",
        ", upper(val) as uval"), Seq("1,a", "2,b"))
    }
    assert(e.getMessage.contains("schema changed"), e.getMessage)
  }

  test("insert_overwrite replaces only the batch's partitions") {
    val root = Files.createTempDirectory("graft_inc_io")
    val work = Files.createTempDirectory("graft_inc_io_tbl").toString
    // partition column = day; model passes the seed through
    val sql =
      """{{ config(materialized='incremental',
        |          incremental_strategy='insert_overwrite',
        |          partition_by='day') }}
        |select id, val, day from {{ ref('events_seed') }}
        |{% if is_incremental() %}
        |where day >= 2
        |{% endif %}
        |""".stripMargin
    def writeP(rows: Seq[String]): Unit = {
      Files.createDirectories(root.resolve("models"))
      Files.createDirectories(root.resolve("seeds"))
      Files.writeString(root.resolve("dbt_project.yml"), "name: iodemo\n")
      Files.writeString(root.resolve("seeds/events_seed.csv"),
        ("id,val,day" +: rows).mkString("\n") + "\n")
      Files.writeString(root.resolve("models/inc_model.sql"), sql)
    }
    writeP(Seq("1,a,1", "2,b,1", "3,c,2"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    assert(spark.table("inc_model").count() == 3)
    // day-2 data is REVISED (3 dropped, 4-5 added) and day 3 appears;
    // day 1 must survive untouched, day 2 must be fully replaced
    writeP(Seq("1,zzz,1", "4,d,2", "5,e,2", "6,f,3"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    val got = spark.table("inc_model").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq(1 -> "a", 2 -> "b", 4 -> "d", 5 -> "e", 6 -> "f"),
      s"day-1 rows must keep their ORIGINAL values, day-2 fully replaced: $got")
  }

  test("file_format json: incremental relation lives as JSON across runs") {
    val root = Files.createTempDirectory("graft_inc_json")
    val work = Files.createTempDirectory("graft_inc_json_tbl").toString
    val sql =
      """{{ config(materialized='incremental', file_format='json') }}
        |select id, val from {{ ref('events_seed') }}
        |{% if is_incremental() %}
        |where id > (select max(id) from {{ this }})
        |{% endif %}
        |""".stripMargin
    writeProject(root, sql, Seq("1,a", "2,b"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    assert(spark.table("inc_model").count() == 2)
    val files = new java.io.File(s"$work/inc_model").listFiles()
      .map(_.getName).filter(_.startsWith("part-"))
    assert(files.nonEmpty && files.forall(_.contains(".json")),
      s"expected JSON part files, got ${files.toSeq}")
    // second run appends THROUGH the json relation ({{ this }} reads it)
    writeProject(root, sql, Seq("1,a", "2,b", "3,c"))
    new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    val got = spark.table("inc_model").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("unsupported file_format fails closed with a clear error") {
    val root = Files.createTempDirectory("graft_inc_badfmt")
    val work = Files.createTempDirectory("graft_inc_badfmt_tbl").toString
    val sql =
      """{{ config(materialized='table', file_format='avro') }}
        |select id, val from {{ ref('events_seed') }}
        |""".stripMargin
    writeProject(root, sql, Seq("1,a"))
    val e = intercept[IllegalArgumentException] {
      new ModelExecutor(spark, ProjectLoader.load(root.toString), Some(work)).buildAll()
    }
    assert(e.getMessage.contains("file_format"), e.getMessage)
  }
}
