package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: media as
  * opaque BINARY columns with a typed metadata struct, batched
  * feature-extraction / resize / frame-sampling over `mapPartitions`.
  *
  * The decode step is a STUB — real image/audio codecs are not available
  * in this environment — implemented as a deterministic fake (byte
  * histogram) so the Spark-side contract is fully real and testable:
  * schema, null passthrough, batch iteration shape, partition
  * independence, and the explode/window pattern for frame sampling.
  * Swapping in a real codec changes only the body of [[decodeBytes]].
  *
  * Scale notes: payloads never hit the driver; extraction is a narrow
  * mapPartitions (no shuffle) processing rows in bounded batches, the
  * same shape an Arrow-batched UDF has — executor memory is bounded by
  * batchSize × payload size regardless of partition size.
  */
object Multimodal {

  val FeatureDim = 8

  val metaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Attach a synthetic binary payload + typed metadata to a text table:
    * payload = utf-8 bytes of the text, metadata derived deterministically
    * from the id. Stands in for a real (path, bytes, exif) ingest.
    */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("meta", struct(
        when(pmod(col(idCol), lit(2)) === 0, "image/fake").otherwise("audio/fake").as("media_type"),
        (lit(16) + pmod(xxhash64(col(idCol)), lit(64))).cast("int").as("width"),
        (lit(16) + pmod(xxhash64(col(idCol), lit(1)), lit(64))).cast("int").as("height")))

  /** STUB decode: normalized 8-bucket byte histogram as the "embedding".
    * Replace with a real codec + model for production use.
    */
  private[graft] def decodeBytes(bytes: Array[Byte]): Array[Float] = {
    val h = new Array[Float](FeatureDim)
    if (bytes != null && bytes.nonEmpty) {
      var i = 0
      while (i < bytes.length) { h((bytes(i) & 0xFF) >> 5) += 1f; i += 1 }
      var b = 0
      while (b < FeatureDim) { h(b) /= bytes.length; b += 1 }
    }
    h
  }

  /** Batched feature extraction: adds `features array<float>`. Rows are
    * processed in batches of `batchSize` (the Arrow-batch shape); null
    * payloads yield null features.
    */
  def extractFeatures(df: DataFrame, payloadCol: String,
                      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = true))
    implicit val enc: ExpressionEncoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real implementation would build one
        // Arrow RecordBatch / model-inference batch
        batch.iterator.map { row =>
          val bytes = row.get(idx).asInstanceOf[Array[Byte]]
          val feats = if (bytes == null) null else decodeBytes(bytes).toSeq
          Row.fromSeq(row.toSeq :+ feats)
        }
      }
    }
  }

  /** Frame sampling: k evenly-spaced fixed-width byte windows per payload
    * (video keyframe analog), exploded to one row per frame. Pure column
    * expressions — substring on BINARY — no UDF.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, k: Int,
                   frameBytes: Int): DataFrame = {
    val n = octet_length(col(payloadCol))
    // floor division (Column `/` is double division; oracle uses `//`)
    val step = greatest(floor((n - frameBytes) / (k - 1)).cast("int"), lit(1))
    df.withColumn("frame_no", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("frame_off", least(col("frame_no") * step + 1, greatest(n - frameBytes + 1, lit(1))))
      .withColumn("frame", expr(s"substring($payloadCol, frame_off, $frameBytes)"))
  }

  /** STUB resize: declares the real signature (target w×h) but only
    * truncates the fake payload proportionally — a real implementation
    * decodes, resamples, re-encodes.
    */
  def resize(df: DataFrame, payloadCol: String, w: Int, h: Int): DataFrame =
    df.withColumn("payload_resized",
        expr(s"substring($payloadCol, 1, greatest(octet_length($payloadCol) div 4, 1))"))
      .withColumn("meta_resized", struct(lit("image/fake").as("media_type"),
        lit(w).as("width"), lit(h).as("height")))
}
