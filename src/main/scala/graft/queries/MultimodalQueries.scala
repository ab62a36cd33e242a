package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Query, Tables}
import graft.operators.Multimodal

/** Multimodal binary-column queries over synthesized payloads (documents
  * text as bytes). The pure-SQL plumbing (payload length, content hash,
  * frame windows) is oracle-checked; the batched stub-decode path is
  * rows-only here with its contracts in MultimodalSpec.
  */
object MultimodalQueries {

  val queries: Seq[Query] = Seq(

    // ---- M1: binary payload + hash (ingest plumbing) ----------------------
    Query("m01_binary_meta",
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       md5(text) AS payload_md5
        |FROM documents""".stripMargin) {
      (s, d) => Multimodal.withPayload(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"))
    },

    // ---- M2: batched stub-decode feature extraction -------------------------
    // The feature vector itself stays array<float> inside the pipeline
    // (MultimodalSpec pins its values); the registry row serializes it so the
    // driver's pandas sort has a scalar to order.
    Query.noOracle("m02_feature_extract") { (s, d) =>
      val withP = Multimodal.withPayload(Tables.documents(s, d), "doc_id", "text")
      Multimodal.extractFeatures(withP, "payload")
        .select(col("doc_id"), col("meta.media_type").as("media_type"),
          to_json(col("features")).as("features_json"))
    },

    // ---- M3: frame sampling (binary windows, no UDF) -------------------------
    Query("m03_frame_sample",
      """SELECT doc_id, frame_no, md5(frame) AS frame_md5 FROM (
        |  SELECT doc_id, u.frame_no,
        |         substring(text,
        |           CAST(least(u.frame_no * greatest((octet_length(encode(text)) - 32) // 3, 1) + 1,
        |                      greatest(octet_length(encode(text)) - 32 + 1, 1)) AS INT),
        |           32) AS frame
        |  FROM documents,
        |       (SELECT unnest(generate_series(0, 3)) AS frame_no) u)""".stripMargin) {
      (s, d) => Multimodal.sampleFrames(
          Multimodal.withPayload(Tables.documents(s, d), "doc_id", "text"),
          "payload", k = 4, frameBytes = 32)
        .select(col("doc_id"), col("frame_no"), md5(col("frame")).as("frame_md5"))
    }
  )
}
