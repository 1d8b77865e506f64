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
