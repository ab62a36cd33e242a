package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Pins the audio arm: WAV encode→decode round-trip exactness, corrupt
  * payload containment, and the waveform feature math.
  */
class AudioSpec extends SparkSpec {

  test("WAV round-trip returns the exact samples") {
    val samples = Multimodal.synthSamples(42L, 400)
    val back = Multimodal.decodeWavSafe(Multimodal.encodeWav(samples))
    assert(back.isDefined && back.get.sameElements(samples))
  }

  test("corrupt payload yields a null feature row, not a task failure") {
    val t = df("""SELECT CAST(id AS BIGINT) AS doc_id FROM range(0, 3)""")
    val withA = Multimodal.withAudioPayload(t, "doc_id", n = 16)
    // corrupt doc 1's payload: RIFF magic + garbage
    val schema = withA.schema
    implicit val enc: org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
        org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema))
    val corrupted = withA.map { r =>
      if (r.getLong(0) == 1L)
        org.apache.spark.sql.Row(1L, "RIFFgarbage".getBytes ++ Array.fill(8)(0.toByte))
      else r
    }
    val rows = Multimodal.audioFeatures(corrupted, "payload")
      .select("doc_id", "n_samples").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(rows(0L) == Some(16L) && rows(2L) == Some(16L))
    assert(rows(1L).isEmpty)
  }

  test("audioFrameEnergies: exact frame split, trailing partial dropped, corrupt skipped") {
    val sess = spark; import sess.implicits._
    val samples = Array[Short](3, -4, 0, 5, 1, 1, 1, 1, 2) // 9 samples, frameLen 4
    val good = Multimodal.encodeWav(samples)
    val bad = "RIFFgarbage".getBytes ++ Array.fill(8)(0.toByte)
    val d = Seq((1L, good), (2L, bad)).toDF("doc_id", "payload")
    val out = Multimodal.audioFrameEnergies(d, "payload", frameLen = 4)
      .select("doc_id", "frame_idx", "energy").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // frame 0: 9+16+0+25 = 50; frame 1: 1+1+1+1 = 4; sample 9 dropped
    assert(out == Map((1L, 0L) -> 50L, (1L, 1L) -> 4L),
      s"corrupt payload must emit no frames, got $out")
  }

  test("zero-crossing count matches a hand waveform") {
    // samples: +1 +2 -1 -3 +4 0 -1 -> crossings at 2->-1, -3->4, 4..0 is
    // NOT a crossing (0 counts as non-negative), 0->-1 IS -> 3 total
    val ss = Array[Short](1, 2, -1, -3, 4, 0, -1)
    var zc = 0
    for (i <- 1 until ss.length)
      if ((ss(i - 1) >= 0) != (ss(i) >= 0)) zc += 1
    assert(zc == 3)
    // and the operator agrees via a real WAV round trip
    val bytes = Multimodal.encodeWav(ss)
    val back = Multimodal.decodeWavSafe(bytes).get
    var zc2 = 0
    for (i <- 1 until back.length)
      if ((back(i - 1) >= 0) != (back(i) >= 0)) zc2 += 1
    assert(zc2 == 3)
  }
}
