package graft

import graft.operators.Ingest

/** Manifest-ingest pins: exactly-once pickup, no-op re-runs, late files,
  * and restart resume from the persisted manifest version.
  */
class IngestSpec extends SparkSpec {
  import java.nio.file.{Files, Paths}

  private def land(dir: java.nio.file.Path, name: String): Unit = {
    val tmp = graft.core.TempDirs.scratch("ingspec_b_").toString
    spark.range(3).toDF("v").coalesce(1).write.mode("overwrite").parquet(tmp)
    val f = graft.core.Fs.listDir(Paths.get(tmp)).map(_.toString)
      .filter(_.endsWith(".parquet")).head
    Files.copy(Paths.get(f), dir.resolve(name))
  }

  test("each file is picked up exactly once; empty runs are no-ops") {
    val landing = graft.core.TempDirs.scratch("ingspec_l_")
    val manifest = graft.core.TempDirs.scratch("ingspec_m_").toString
    val ing = new Ingest(spark, landing.toString, manifest)
    land(landing, "a.parquet"); land(landing, "b.parquet")
    val b1 = ing.nextBatch()
    assert(b1 == Seq("a.parquet", "b.parquet"))
    ing.commit(b1)
    assert(ing.nextBatch().isEmpty, "re-run with nothing new must be a no-op")
    ing.commit(Nil) // committing an empty batch is legal and changes nothing
    land(landing, "c.parquet") // late file
    val b3 = ing.nextBatch()
    assert(b3 == Seq("c.parquet"), "late file picked up exactly once")
    ing.commit(b3)
    assert(ing.nextBatch().isEmpty)
  }

  test("a new Ingest instance resumes from the persisted manifest") {
    val landing = graft.core.TempDirs.scratch("ingspec_l2_")
    val manifest = graft.core.TempDirs.scratch("ingspec_m2_").toString
    val ing = new Ingest(spark, landing.toString, manifest)
    land(landing, "a.parquet")
    ing.commit(ing.nextBatch())
    // restart: fresh instance over the same dirs must not re-process
    val resumed = new Ingest(spark, landing.toString, manifest)
    assert(resumed.nextBatch().isEmpty, "restart must resume, not reprocess")
    land(landing, "b.parquet")
    assert(resumed.nextBatch() == Seq("b.parquet"))
  }
}
