package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Relational, RelationalExt, RelationalExt2, TrainingData}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory the driver verifies against a
  * DuckDB oracle (sf0.01); `oracleSql` carries the oracle text.
  * Column names are aligned between the two (driver hashes values
  * after sorting columns by name).
  */
object SparkEntry {
  /** Flagship query (OSM-Q5 customers-model shape) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q05(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RelationalExt.queries ++ RelationalExt2.queries ++
      TrainingData.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ RelationalExt.oracles ++ RelationalExt2.oracles ++
      TrainingData.oracles
}
