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

  test("resize keeps schema contract; non-PNG payloads resize to null") {
    val p = Multimodal.withPayload(docs.filter(col("doc_id") === 0), "doc_id", "text")
    val r = Multimodal.resize(p, "payload", 32, 32)
    assert(r.schema("payload_resized").dataType.typeName == "binary")
    assert(r.select("payload_resized").head().isNullAt(0),
      "text payload is not an image; real resize must not invent bytes")
    assert(r.select("meta_resized").head().isNullAt(0),
      "failed decode must not carry image metadata for a missing payload")
    // a real PNG payload gets both the bytes and the metadata
    val png = Multimodal.withImagePayload(
      docs.filter(col("doc_id") === 0).select("doc_id"), "doc_id", 8, 8)
    val ok = Multimodal.resize(png, "payload", 32, 32)
    assert(!ok.select("payload_resized").head().isNullAt(0))
    assert(ok.select("meta_resized.width").head().getInt(0) == 32)
  }

  test("PNG encode/decode round-trips the synthesized pixels exactly") {
    val px = Multimodal.synthPixels(7L, 32, 32)
    val (w, h, back) = Multimodal.decodePng(Multimodal.encodePng(px, 32, 32))
    assert((w, h) == (32, 32))
    assert(back.sameElements(px), "PNG is lossless; decode(encode(px)) must equal px")
    // and the formula itself where it's easy to eyeball: id=7, x=1, y=2
    val p = px(2 * 32 + 1)
    assert(((p >> 16) & 0xFF) == (7 * 7 + 3 * 1 + 5 * 2) % 256)
    assert(((p >> 8) & 0xFF) == (7 * 11 + 1 + 2 * 2) % 256)
    assert((p & 0xFF) == (7 * 13 + 4 * 1 + 2) % 256)
  }

  test("decodePixels validates schema up front and widens integral ids") {
    import org.apache.spark.sql.functions._
    // non-binary payload: analysis-time require, not a task ClassCastException
    val bad = df("SELECT 1 AS doc_id, 'not bytes' AS payload")
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodePixels(bad, "doc_id", "payload")
    }
    assert(e.getMessage.contains("must be BINARY"), e.getMessage)
    // an INT id decodes fine (cast up front, no getLong crash)
    val png = Multimodal.encodePng(Multimodal.synthPixels(3L, 2, 2), 2, 2)
    val ok = df("SELECT CAST(3 AS INT) AS doc_id")
      .withColumn("payload", lit(png))
    assert(Multimodal.decodePixels(ok, "doc_id", "payload").count() == 4L)
  }

  test("boxResize floor-means each block") {
    // 2x2 -> 1x1: means (r,g,b) = floor of channel sums / 4
    val px = Array(0x010203, 0x050607, 0x090A0B, 0x0D0E0F)
    val out = Multimodal.boxResize(px, 2, 2, 1, 1)
    assert(out.length == 1)
    assert(out(0) == (((1 + 5 + 9 + 13) / 4) << 16 |
      ((2 + 6 + 10 + 14) / 4) << 8 | (3 + 7 + 11 + 15) / 4))
    // non-divisible shape: 3x1 -> 2x1 blocks are [0,1) and [1,3)
    val px3 = Array(0x0A0000, 0x140000, 0x1E0000)
    val out3 = Multimodal.boxResize(px3, 3, 1, 2, 1)
    assert(((out3(0) >> 16) & 0xFF) == 10)
    assert(((out3(1) >> 16) & 0xFF) == (20 + 30) / 2)
    // upscale: 2x1 -> 4x1 must not divide by an empty block — it
    // degrades to nearest-neighbor (pixels 0,0,1,1)
    val up = Multimodal.boxResize(Array(0x0A0000, 0x140000), 2, 1, 4, 1)
    assert(up.map(p => (p >> 16) & 0xFF).toSeq == Seq(10, 10, 20, 20))
  }

  test("real decode features match direct pixel statistics") {
    val ids = spark.range(5).select(col("id").as("doc_id"))
    val p = Multimodal.withImagePayload(ids, "doc_id")
    val f = Multimodal.extractFeatures(p, "payload", batchSize = 2)
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    (0L until 5L).foreach { id =>
      val px = Multimodal.synthPixels(id, 32, 32)
      val rs = px.map(p => (p >> 16) & 0xFF)
      assert(f(id) == Seq[Float](32f, 32f, rs.map(_.toLong).sum.toFloat,
        px.map(p => ((p >> 8) & 0xFF).toLong).sum.toFloat,
        px.map(p => (p & 0xFF).toLong).sum.toFloat,
        rs.min.toFloat, rs.max.toFloat, 1024f), s"feature mismatch for id $id")
    }
  }

  test("corrupt PNG payloads yield null features/resize/hex, not task failure") {
    // PNG magic followed by garbage: ImageIO must not kill the task —
    // at corpus scale some rows are always broken
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10,
      42, 42, 42, 42, 42, 42, 42, 42)
    assert(Multimodal.isPng(corrupt), "fixture must look like a PNG")
    assert(Multimodal.decodePngSafe(corrupt).isEmpty)
    val s = spark
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val good = Multimodal.encodePng(Multimodal.synthPixels(1L, 32, 32), 32, 32)
    val d = s.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(0L, corrupt),
        org.apache.spark.sql.Row(1L, good)), schema)
    val feats = Multimodal.extractFeatures(d, "payload")
      .select("doc_id", "features").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(feats(0L).isEmpty, "corrupt image -> null features")
    assert(feats(1L).isDefined, "good image decodes")
    val rz = Multimodal.pixelHex(Multimodal.resize(d, "payload", 8, 8),
        "payload_resized")
      .select("doc_id", "payload_resized", "px_hex").collect()
      .map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(rz(0L) == ((true, true)), "corrupt image -> null resize + hex")
    assert(rz(1L) == ((false, false)))
  }

  test("resize + pixelHex: engine digest equals formula-side block means") {
    val ids = spark.range(3).select(col("id").as("doc_id"))
    val p = Multimodal.withImagePayload(ids, "doc_id")
    val got = Multimodal.pixelHex(
        Multimodal.resize(p, "payload", 8, 8), "payload_resized")
      .select("doc_id", "px_hex").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 3L).foreach { id =>
      val px = Multimodal.synthPixels(id, 32, 32)
      val expect = (0 until 8).flatMap { j =>
        (0 until 8).map { i =>
          var rs = 0; var gs = 0; var bs = 0
          for (y <- j * 4 until j * 4 + 4; x <- i * 4 until i * 4 + 4) {
            val v = px(y * 32 + x)
            rs += (v >> 16) & 0xFF; gs += (v >> 8) & 0xFF; bs += v & 0xFF
          }
          f"${rs / 16}%02x${gs / 16}%02x${bs / 16}%02x"
        }
      }.mkString
      assert(got(id) == expect, s"resized digest mismatch for id $id")
    }
  }

  test("decodeStats equals the decodePixels-derived sums (one-pass fusion)") {
    val ids = spark.range(5).select(col("id").as("doc_id"))
    val p = Multimodal.withImagePayload(ids, "doc_id")
    val st = Multimodal.decodeStats(p, "doc_id", "payload")
    val px = Multimodal.decodePixels(p, "doc_id", "payload")
      .select(col("id"), col("r").cast("long").as("r"),
        col("g").cast("long").as("g"), col("b").cast("long").as("b"))
    val want = px.groupBy("id").agg(count(lit(1)).as("n_px"),
      sum("r").as("sr"), sum(col("r") * col("r")).as("srr"),
      sum(col("r") * col("g")).as("srg"), sum("b").as("sb"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val got = st.select("id", "n_px", "sr", "srr", "srg", "sb").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == want)
    // histogram: bin counts sum to n_px and reproduce the per-value counts
    val hist = st.select(col("id"), col("hist")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val rCounts = px.groupBy("id", "r").count().collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
    hist.foreach { case (id, h) =>
      assert(h.length == 256 && h.sum == 1024L)
      h.zipWithIndex.foreach { case (c, r) =>
        assert(c == rCounts.getOrElse((id, r), 0L), s"hist($r) of doc $id")
      }
    }
  }

  test("reconcileStats decodes only the (id, content-hash) delta") {
    val store = graft.core.TempDirs.scratch("m12spec_").toString
    val all = spark.range(6).select(col("id").as("doc_id"))
    def present(df: org.apache.spark.sql.DataFrame) =
      Multimodal.withImagePayload(df, "doc_id")
    // run 1: half the corpus
    val r1 = Multimodal.reconcileStats(
      spark, present(all.filter(col("doc_id") < 3)), "doc_id", "payload", store)
    assert((r1.decoded, r1.total) == ((3L, 3L)) && r1.path.endsWith("stats_v1"))
    // run 2: full corpus — only the new half decodes
    val r2 = Multimodal.reconcileStats(
      spark, present(all), "doc_id", "payload", store)
    assert((r2.decoded, r2.total) == ((3L, 6L)) && r2.path.endsWith("stats_v2"))
    // run 3: no-op re-run — nothing decodes, content served from the store
    val r3 = Multimodal.reconcileStats(
      spark, present(all), "doc_id", "payload", store)
    assert((r3.decoded, r3.total) == ((0L, 6L)))
    // run 4: one payload's CONTENT changes (id 2 now carries id 99's
    // image) — the changed hash re-decodes exactly that image, and the
    // stored stats row is replaced, not served stale
    val changed = present(all.filter(col("doc_id") =!= 2)).unionByName(
      present(spark.range(99, 100).select(col("id").as("doc_id")))
        .withColumn("doc_id", lit(2L)))
    val r4 = Multimodal.reconcileStats(
      spark, changed, "doc_id", "payload", store)
    assert((r4.decoded, r4.total) == ((1L, 6L)))
    val sr2 = spark.read.parquet(r4.path).filter(col("id") === 2)
      .select("sr").head().getLong(0)
    val sr99 = Multimodal.decodeStats(
      present(spark.range(99, 100).select(col("id").as("doc_id"))),
      "doc_id", "payload").select("sr").head().getLong(0)
    assert(sr2 == sr99, "changed content must serve re-decoded stats")
    // run 5: an id REMOVED from the corpus drops from the table
    val r5 = Multimodal.reconcileStats(
      spark, present(all.filter(col("doc_id") < 5)), "doc_id", "payload", store)
    assert((r5.decoded, r5.total) == ((1L, 5L))) // id 2 reverts: 1 decode
  }

  test("mixed-codec corpus: BMP rows decode to the exact formula pixels") {
    val ids = spark.range(8).select(col("id").as("doc_id"))
    val p = Multimodal.withImagePayload(ids, "doc_id")
    // ids 3 and 7 carry BMP, the rest PNG — assert the split is real
    val kinds = p.select(col("doc_id"), col("meta.media_type")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 8L).foreach { id =>
      val want = if (id % 4 == 3) "image/bmp" else "image/png"
      assert(kinds(id) == want, s"id $id codec")
    }
    // magic bytes match the declared codec and BOTH decode losslessly
    p.select("doc_id", "payload").collect().foreach { r =>
      val (id, bytes) = (r.getLong(0), r.getAs[Array[Byte]](1))
      if (id % 4 == 3) assert(Multimodal.isBmp(bytes) && !Multimodal.isPng(bytes))
      else assert(Multimodal.isPng(bytes))
      val Some((w, h, px)) = Multimodal.decodeImageSafe(bytes)
      assert((w, h) == ((32, 32)))
      assert(px.toSeq == Multimodal.synthPixels(id, 32, 32).toSeq,
        s"id $id: decoded pixels diverge from the formula")
    }
  }

  test("JPEG arm: deterministic decode, right dims, bounded mean error") {
    val ids = spark.range(6).select(col("id").as("doc_id"))
    val j = Multimodal.withJpegPayload(ids, "doc_id")
    val rows = j.select("doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    (0L until 6L).foreach { id =>
      val bytes = rows(id)
      assert(Multimodal.isJpeg(bytes))
      val Some((w, h, px)) = Multimodal.decodeImageSafe(bytes)
      assert((w, h) == ((32, 32)))
      // decode is deterministic (same bytes -> same pixels)
      val Some((_, _, px2)) = Multimodal.decodeImageSafe(bytes)
      assert(px.toSeq == px2.toSeq, "JPEG decode must be deterministic")
      // lossy but bounded: per-channel MEAN within 8/255 of the formula
      // (the wrapping-gradient fixture is JPEG-hostile — sharp 255->0
      // edges ring locally — but the image mean stays tight)
      val truth = Multimodal.synthPixels(id, 32, 32)
      def mean(a: Array[Int], shift: Int) =
        a.map(p => (p >> shift) & 0xFF).sum.toDouble / a.length
      for (shift <- Seq(16, 8, 0)) {
        val err = math.abs(mean(px, shift) - mean(truth, shift))
        assert(err <= 8.0, s"id $id shift $shift: mean error $err")
      }
    }
  }

  test("reconcileStats records failures once and skips known-bad content") {
    val store = graft.core.TempDirs.scratch("m12fail_").toString
    val ids = spark.range(4).select(col("id").as("doc_id"))
    // ids 0-2 carry real PNGs; id 3 carries undecodable bytes
    def present(sub: org.apache.spark.sql.DataFrame) =
      Multimodal.withImagePayload(sub, "doc_id")
        .withColumn("payload",
          when(col("doc_id") === 3, lit("not a png".getBytes))
            .otherwise(col("payload")))
    val r1 = Multimodal.reconcileStatsBy(
      spark, ids, "doc_id", present, "payload", store)
    assert((r1.decoded, r1.total, r1.failed) == ((3L, 3L, 1L)),
      s"run 1: $r1")
    // re-run: the known-bad (id, hash) must NOT be re-attempted — zero
    // decodes AND zero new failures
    val r2 = Multimodal.reconcileStatsBy(
      spark, ids, "doc_id", present, "payload", store)
    assert((r2.decoded, r2.total, r2.failed) == ((0L, 3L, 0L)),
      s"run 2: $r2")
    // id 3's content changes to a real PNG: the new hash re-attempts,
    // decodes, and joins the stats table
    val r3 = Multimodal.reconcileStatsBy(
      spark, ids, "doc_id",
      sub => Multimodal.withImagePayload(sub, "doc_id"), "payload", store)
    assert((r3.decoded, r3.total, r3.failed) == ((1L, 4L, 0L)),
      s"run 3: $r3")
  }
}
