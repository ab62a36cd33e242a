package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private def docs = df(
    """SELECT * FROM VALUES
      |  (CAST(0 AS BIGINT), 'hello world this is a document'),
      |  (CAST(1 AS BIGINT), 'another one with different bytes'),
      |  (CAST(2 AS BIGINT), CAST(NULL AS STRING))
      |  t(doc_id, text)""".stripMargin)

  test("withPayload: binary column + typed metadata struct") {
    val p = Multimodal.withPayload(docs, "doc_id", "text")
    assert(p.schema("payload").dataType.typeName == "binary")
    assert(p.schema("meta").dataType.simpleString == Multimodal.metaType.simpleString)
    val r = p.filter(col("doc_id") === 0).select("meta.media_type", "meta.width").head()
    assert(r.getString(0) == "image/fake")
    assert(r.getInt(1) >= 16 && r.getInt(1) < 80)
  }

  test("extractFeatures: dim, normalization, null passthrough, determinism") {
    val p = Multimodal.withPayload(docs, "doc_id", "text")
    val f = Multimodal.extractFeatures(p, "payload", batchSize = 2)
    val byId = f.select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Float](1))).toMap
    assert(byId(0L).get.length == Multimodal.FeatureDim)
    assert(math.abs(byId(0L).get.sum - 1.0f) < 1e-5, "histogram must be normalized")
    assert(byId(2L).isEmpty, "null payload → null features")
    // partition-count independent
    val f1 = Multimodal.extractFeatures(p.repartition(1), "payload")
    val f7 = Multimodal.extractFeatures(p.repartition(7), "payload")
    assert(rows(f1.select(col("doc_id"), col("features"))) ==
      rows(f7.select(col("doc_id"), col("features"))))
  }

  test("extractFeatures: batch grouping covers every row exactly once") {
    val many = spark.range(257).select(col("id").as("doc_id"),
      concat(lit("text"), col("id")).cast("string").as("text"))
    val p = Multimodal.withPayload(many, "doc_id", "text")
    val f = Multimodal.extractFeatures(p, "payload", batchSize = 64)
    assert(f.count() == 257)
    assert(f.filter(col("features").isNull).count() == 0)
  }

  test("sampleFrames: k frames, fixed width, offsets clamped to payload") {
    val p = Multimodal.withPayload(docs.filter(col("doc_id") === 0), "doc_id", "text")
    val fr = Multimodal.sampleFrames(p, "payload", k = 4, frameBytes = 8)
    val got = fr.select("frame_no", "frame_off", "frame").collect()
    assert(got.length == 4)
    got.foreach { r =>
      assert(r.getAs[Array[Byte]]("frame").length == 8)
      assert(r.getAs[Number]("frame_off").longValue >= 1)
    }
  }

  test("resize stub keeps schema contract") {
    val p = Multimodal.withPayload(docs.filter(col("doc_id") === 0), "doc_id", "text")
    val r = Multimodal.resize(p, "payload", 32, 32)
    assert(r.schema("payload_resized").dataType.typeName == "binary")
    assert(r.select("meta_resized.width").head().getInt(0) == 32)
  }
}
