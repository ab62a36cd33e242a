package graft

import java.io.File

import org.apache.spark.sql.functions._
import graft.operators.ZipSink

/** S10 pins: archives exist on disk, one entry per group, and the
  * round-trip audit recovers exact row counts and key digests.
  */
class ZipSinkSpec extends SparkSpec {

  private def export(): (String, org.apache.spark.sql.DataFrame) = {
    val d = df(
      """SELECT * FROM VALUES
        |  (1L, 10.5, 'alpha'), (2L, -3.0, 'alpha'), (3L, 0.0, 'beta'),
        |  (7L, 1.25, 'alpha'), (9L, 4.0, 'beta')
        |t(id, bal, form)""".stripMargin)
    val dir = graft.core.TempDirs.scratch("ziptest_").toString
    (dir, ZipSink.zipPartitioned(spark, d, "form", dir))
  }

  test("zipPartitioned writes one .zip per group with one CSV entry each") {
    val (dir, out) = export()
    val got = out.collect().map(r =>
      r.getString(0) -> ((r.getString(1), r.getInt(2), r.getLong(3)))).toMap
    assert(got.keySet == Set("alpha", "beta"))
    got.foreach { case (g, (path, entries, bytes)) =>
      assert(new File(path).isFile, s"$g archive missing on disk")
      assert(path.endsWith(s"$g.zip"))
      assert(entries == 1, "repartition-by-group write = one part file per folder")
      assert(bytes > 0)
    }
  }

  test("auditZips round-trips row counts and key digests through the archives") {
    val (dir, out) = export()
    out.collect() // drive packaging
    val audit = ZipSink.auditZips(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(audit("alpha") == ((1, 3L, 1L + 2L + 7L)))
    assert(audit("beta") == ((1, 2L, 3L + 9L)))
  }

  test("a group whose rows all filter away yields no folder and no archive") {
    val d = df("SELECT * FROM VALUES (1L, 1.0, 'only') t(id, bal, form)")
    val dir = graft.core.TempDirs.scratch("ziptest_one_").toString
    val out = ZipSink.zipPartitioned(spark, d, "form", dir)
    assert(out.collect().map(_.getString(0)).toSeq == Seq("only"))
    assert(new File(dir).listFiles().count(_.getName.endsWith(".zip")) == 1)
  }
}
