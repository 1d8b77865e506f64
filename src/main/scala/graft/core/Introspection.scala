package graft.core

import java.util.concurrent.ConcurrentHashMap

import scala.collection.immutable.ListMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Warehouse-side column introspection (A4–A7) backed by the Spark
  * catalog / schema. The "warehouse" of the reference architecture IS
  * the Spark session here, so introspection is an in-process schema
  * walk instead of a network call; the cache mirrors the reference's
  * per-relation cache (core/introspection.py:99-140).
  */
object Introspection {

  /** Introspected column (reference ColumnMetadata:
    * core/introspection.py:1444-1449).
    */
  final case class IntrospectedColumn(
      name: String, dataType: String, index: Int, comment: Option[String] = None)

  private val cache = new ConcurrentHashMap[String, ListMap[String, IntrospectedColumn]]()

  def invalidate(): Unit = cache.clear()

  /** Adapter-aware case/quote normalization
    * (core/introspection.py:1250-1256): Snowflake-mode uppercases
    * unless double-quoted; otherwise strip quoting characters.
    */
  def normalizeColumnName(column: String, credentialsType: String): String =
    if (credentialsType == "snowflake" && column.startsWith("\"") && column.endsWith("\""))
      column
    else if (credentialsType == "snowflake")
      column.toUpperCase
    else
      column.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("`").stripSuffix("`")
        .stripPrefix("[").stripSuffix("]")

  /** Precise vs base dtype (core/introspection.py:1259-1291): keep
    * DECIMAL(p,s)/VARCHAR(n) only when the corresponding setting is
    * on, else the base type name.
    */
  def maybePreciseDtype(dt: DataType, settings: EngineSettings,
      node: Option[NodeMeta] = None, column: Option[String] = None): String = {
    val numPrec = SettingsResolver.resolveBool("numeric-precision-and-scale",
      settings.numericPrecisionAndScale, settings, node, column)
    val strLen = SettingsResolver.resolveBool("string-length",
      settings.stringLength, settings, node, column)
    dt match {
      case d: DecimalType => if (numPrec) s"DECIMAL(${d.precision},${d.scale})" else "DECIMAL"
      case v: VarcharType => if (strLen) s"VARCHAR(${v.length})" else "VARCHAR"
      case _: StringType => "VARCHAR"
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case DoubleType => "DOUBLE"
      case FloatType => "FLOAT"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case _: TimestampType => "TIMESTAMP"
      case _: TimestampNTZType => "TIMESTAMP"
      case BinaryType => "BINARY"
      case other => other.sql
    }
  }

  /** Flatten nested struct/array/map leaves into dotted column names,
    * mirroring the adapter `column.flatten()` path for BigQuery
    * RECORDs (core/introspection.py:1412-1418).
    */
  private[core] def flattenField(field: StructField, prefix: String): Seq[(String, DataType)] = {
    val name = if (prefix.isEmpty) field.name else s"$prefix.${field.name}"
    field.dataType match {
      case s: StructType =>
        (name -> (s: DataType)) +: s.fields.toSeq.flatMap(f => flattenField(f, name))
      case other => Seq(name -> other)
    }
  }

  /** Ordered columns for a relation, from a registered table/view
    * (A4). Honors regex ignore patterns and nested flattening; cached
    * per (table, settings-invariant) key.
    */
  def getColumns(spark: SparkSession, table: String, settings: EngineSettings,
      node: Option[NodeMeta] = None,
      ignorePatterns: Seq[String] = Nil,
      flattenNested: Boolean = false): ListMap[String, IntrospectedColumn] = {
    val key = s"$table|$flattenNested|${ignorePatterns.mkString(",")}|" +
      s"${settings.numericPrecisionAndScale}|${settings.stringLength}"
    Option(cache.get(key)).getOrElse {
      val schema = spark.table(table).schema
      val leaves: Seq[(String, DataType)] =
        if (flattenNested) schema.fields.toSeq.flatMap(f => flattenField(f, ""))
        else schema.fields.toSeq.map(f => f.name -> f.dataType)
      val compiled = ignorePatterns.map(_.r)
      val cols = leaves.zipWithIndex.collect {
        case ((name, dt), idx) if !compiled.exists(_.pattern.matcher(name).matches()) =>
          name -> IntrospectedColumn(name, maybePreciseDtype(dt, settings, node, Some(name)), idx)
      }
      val result = ListMap(cols: _*)
      cache.put(key, result)
      result
    }
  }

  /** Catalog snapshot (A5): table → ordered columns for every
    * registered table in the current database, as a plain map ready
    * for JSON serialization.
    */
  def generateCatalog(spark: SparkSession, tables: Seq[String],
      settings: EngineSettings): Map[String, Seq[IntrospectedColumn]] =
    tables.map(t => t -> getColumns(spark, t, settings).values.toSeq).toMap

  /** Per-column profile of a relation in ONE pass: row count, null
    * count, approximate distinct count (HLL), and min/max rendered as
    * strings (type-uniform output; q44 is the exact-oracle numeric
    * variant). All metrics are map-side-combinable aggregates of a
    * single scan — profiling cost is one read of the table no matter
    * how many columns it has.
    */
  final case class ColumnProfile(column: String, dtype: String,
      nRows: Long, nNulls: Long, approxDistinct: Long,
      min: Option[String], max: Option[String])

  def profileRelation(spark: SparkSession,
      relation: String): Seq[ColumnProfile] = {
    import org.apache.spark.sql.functions._
    val df = spark.table(relation)
    val fields = df.schema.fields.toSeq
    if (fields.isEmpty) return Nil
    val aggs = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        approx_count_distinct(c).as(s"${f.name}__dist"),
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    fields.map { f =>
      ColumnProfile(f.name, f.dataType.simpleString,
        nRows = r.getAs[Long]("__n"),
        nNulls = r.getAs[Long](s"${f.name}__nulls"),
        approxDistinct = r.getAs[Long](s"${f.name}__dist"),
        min = Option(r.getAs[String](s"${f.name}__min")),
        max = Option(r.getAs[String](s"${f.name}__max")))
    }
  }
}
