package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Query, Tables}
import graft.operators.Multimodal

/** Multimodal binary-column queries over synthesized payloads (documents
  * text as bytes). All three are oracle-checked, including the batched
  * stub-decode path (its float features de-normalize to exact integer
  * counts); value contracts live in MultimodalSpec.
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
    // The feature vector stays array<float> inside the pipeline
    // (MultimodalSpec pins its values); the registry row de-normalizes it
    // back to the exact integer byte-histogram counts (round(f*n) is exact:
    // float32 relative error 2^-24 × payload bytes ≪ 0.5), which DuckDB
    // recomputes byte-by-byte — bucket = high 3 bits = first hex nibbles/2.
    Query("m02_feature_extract",
      """WITH base AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 2 = 0 THEN 'image/fake' ELSE 'audio/fake' END AS media_type,
        |         hex(encode(text)) AS h, octet_length(encode(text)) AS n
        |  FROM documents),
        |by_byte AS (
        |  SELECT doc_id, (strpos('0123456789ABCDEF', substr(h, CAST(2*u.i+1 AS INT), 1)) - 1) // 2 AS bucket
        |  FROM base, LATERAL (SELECT unnest(range(n)) AS i) u),
        |c AS (SELECT doc_id, bucket, count(*) AS cnt FROM by_byte GROUP BY 1, 2)
        |SELECT b.doc_id, b.media_type,
        |       coalesce(max(CASE WHEN bucket = 0 THEN cnt END), 0) AS b0,
        |       coalesce(max(CASE WHEN bucket = 1 THEN cnt END), 0) AS b1,
        |       coalesce(max(CASE WHEN bucket = 2 THEN cnt END), 0) AS b2,
        |       coalesce(max(CASE WHEN bucket = 3 THEN cnt END), 0) AS b3,
        |       coalesce(max(CASE WHEN bucket = 4 THEN cnt END), 0) AS b4,
        |       coalesce(max(CASE WHEN bucket = 5 THEN cnt END), 0) AS b5,
        |       coalesce(max(CASE WHEN bucket = 6 THEN cnt END), 0) AS b6,
        |       coalesce(max(CASE WHEN bucket = 7 THEN cnt END), 0) AS b7
        |FROM base b LEFT JOIN c USING (doc_id)
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val withP = Multimodal.withPayload(Tables.documents(s, d), "doc_id", "text")
      val n = octet_length(col("payload"))
      val counts = (0 until Multimodal.FeatureDim).map(b =>
        round(element_at(col("features"), b + 1) * n).cast("long").as(s"b$b"))
      Multimodal.extractFeatures(withP, "payload")
        .select(col("doc_id") +: col("meta.media_type").as("media_type") +: counts: _*)
    },

    // ---- M4: resize stub (proportional binary truncation) --------------------
    // The oracle slices VARCHAR where Spark slices BINARY — equivalent on
    // this ASCII corpus (m03 precedent); md5 of the prefix pins the exact
    // byte range on both engines.
    Query("m04_resize",
      """SELECT doc_id,
        |       md5(substring(text, 1, CAST(greatest(octet_length(encode(text)) // 4, 1) AS INT)))
        |         AS resized_md5,
        |       greatest(octet_length(encode(text)) // 4, 1) AS n_bytes_resized
        |FROM documents""".stripMargin) { (s, d) =>
      val withP = Multimodal.withPayload(Tables.documents(s, d), "doc_id", "text")
      Multimodal.resize(withP, "payload", 64, 64)
        .select(col("doc_id"), md5(col("payload_resized")).as("resized_md5"),
          octet_length(col("payload_resized")).cast("long").as("n_bytes_resized"))
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
