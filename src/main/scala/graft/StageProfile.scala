package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Optimization-round measurement tool (guide §1): runs named queries
  * with a stage listener and prints, per stage, the wall time, task
  * count, input bytes, shuffle read/write bytes and records — the
  * empirical loop's "which stage, and is it compute or exchange"
  * question without the (disabled) UI.
  *
  * Usage: runMain graft.StageProfile <name>[,<name>...] [reps]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 1
    val spark = graft.core.Sessions.local(cpus, "graft-stage-profile")
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(id: Int, name: String, ms: Long, tasks: Int,
                        inMb: Double, srMb: Double, swMb: Double,
                        srRec: Long, swRec: Long, spillMb: Double)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val ms = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(60), ms,
            si.numTasks, m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.remoteBytesRead / 1e6 +
              m.shuffleReadMetrics.localBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.recordsWritten,
            (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6)
        }
      }
    })

    // warmup (JIT, codegen cache, parquet footers) — same as Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .write.format("noop").mode("overwrite").save()

    names.foreach { n =>
      var r = 0
      while (r < reps) {
        stages.synchronized(stages.clear())
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        // listener events drain asynchronously; block until the bus is
        // actually empty instead of sleeping (ADVICE r15 — a slow bus at
        // bench scale can drop late stage completions from the report)
        try org.apache.spark.GraftListenerShim
          .waitUntilListenerBusEmpty(spark.sparkContext, 10000)
        catch { case _: Throwable => Thread.sleep(300) }
        println(f"%n== $n rep$r wall=$wall%.2fs stages=${stages.size}")
        val top = stages.synchronized(stages.sortBy(-_.ms).take(18))
        top.foreach { s =>
          println(f"  [${s.id}%4d] ${s.ms}%6dms t=${s.tasks}%3d in=${s.inMb}%8.1fMB sr=${s.srMb}%8.2fMB(${s.srRec}%9d) sw=${s.swMb}%8.2fMB(${s.swRec}%9d) spill=${s.spillMb}%6.1fMB ${s.name}")
        }
        val sumMs = stages.synchronized(stages.map(_.ms).sum)
        println(f"  stage-ms sum=$sumMs (wall covers driver/plan gaps)")
        r += 1
      }
    }
    spark.stop()
  }
}
