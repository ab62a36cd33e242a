package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.Query
import graft.streaming.Streams

/** Structured Streaming surface exercised under the batch oracle gate:
  * the stream runs the events parquet through the incremental path
  * (file source → watermarked windowed aggregation → memory sink) with
  * Trigger.AvailableNow — the reference's "process everything landed,
  * then stop" cadence — and the finished result must hash-match the
  * plain batch SQL over the same data. This pins exactly the equivalence
  * a landing-zone pipeline relies on when it switches from scheduled
  * re-runs to incremental processing.
  *
  * StreamingSpec covers the genuinely incremental behaviors (multi-batch
  * state, watermark eviction, dedup, interval join) that a one-shot
  * batch oracle cannot.
  */
object StreamingQueries {

  val queries: Seq[Query] = Seq(

    Query("st01_stream_windowed_counts",
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin) {
      (s, d) => {
        // the streaming file source takes a DIRECTORY (it lists for new
        // files); the testdata tables are single files, so stage a
        // landing-zone dir with a symlink — no data copy
        val dir = java.nio.file.Files.createTempDirectory("st01_landing")
        java.nio.file.Files.createSymbolicLink(
          dir.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$d/events.parquet").toAbsolutePath)
        // child session: state-store count follows shuffle partitions, and
        // 32 HDFS-backed stores for a few-hundred-key aggregation is pure
        // per-partition overhead — isolate the knob from the shared session
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        val raw = ss.read.parquet(s"$d/events.parquet")
        val src = Streams.fileSource(ss, dir.toString, raw.schema)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        val agg = Streams.windowedCounts(src, "ts", "event_type",
          windowLen = "1 hour", watermark = "2 hours")
        // complete mode: every window is emitted at end-of-stream, so the
        // finished table equals the batch aggregation (append mode would
        // hold back windows newer than the final watermark)
        val sink = "st01_counts_" + System.nanoTime()
        val q = agg.writeStream.format("memory").queryName(sink)
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        ss.table(sink)
      }
    }
  )
}
