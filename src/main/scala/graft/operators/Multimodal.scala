package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with a typed metadata struct, processed partition-wise.
  *
  * The image/audio codecs are NOT in this container, so the decode
  * step is a clearly-marked deterministic fake ([[fakeDecode]]); the
  * Spark-side contract — schema, batch iteration, partition-local
  * processing, metadata struct shape — is real and tested. Swapping
  * in a JNI/FFI codec changes only the function body.
  */
object Multimodal {

  /** Metadata struct carried beside every binary payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Feature row produced by the decode/extract stage. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Attach a binary payload column + metadata struct to a table.
    * The fixture corpus has no real media, so the payload is the
    * UTF-8 encoding of the text column — a stand-in with the same
    * plumbing (binary type, per-row sizes, checksums).
    */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    docs.select(
      col(idCol),
      payload.as("payload"),
      struct(
        lit("text/plain").as("media_type"),
        octet_length(payload).cast("long").as("n_bytes"),
        crc32(payload).as("checksum")).as("meta"))
  }

  /** STUB decoder — stands in for an image/audio codec. Deterministic:
    * "dimensions" and an 8-dim "feature" vector derived from payload
    * bytes. Real implementation would call the codec here, one
    * partition at a time (mapPartitions = one codec init per task,
    * amortized over the batch — the same shape a Pandas-UDF/Arrow
    * batch pipeline has).
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Array[Double]) = {
    // ??? <- real codec goes here; deterministic fake below.
    val w = 16 + (if (payload.isEmpty) 0 else (payload.head & 0x3f))
    val h = 16 + (if (payload.isEmpty) 0 else (payload.last & 0x3f))
    val feat = Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < payload.length) { acc += (payload(j) & 0xff).toLong; j += 8 }
      acc.toDouble
    }
    (w, h, feat)
  }

  /** Decode/feature-extract stage: partition-wise over the payload
    * column, emitting [[FeatureSchema]] rows. No shuffle — map-only,
    * embarrassingly parallel over the corpus.
    */
  def extractFeatures(withPayloads: DataFrame, idCol: String): DataFrame = {
    val spark = withPayloads.sparkSession
    val encoder = ExpressionEncoder(FeatureSchema)
    val input = withPayloads.select(
      col(idCol).cast("long"), col("payload"),
      col("meta.media_type"), col("meta.n_bytes"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, feat) = fakeDecode(payload)
        Row(id, r.getString(2), r.getLong(3), w, h, feat.toSeq)
      }
    }(encoder)
  }
}
