package graft.operators

import java.io.{BufferedInputStream, File, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S10 (zip packaging sink): write a table as per-group CSV folders and
  * package each group folder into one .zip archive for download.
  * Ref: pipeline-cleaning/R/01.run_form_cleaning.R:181-192 (zip each
  * cleaned form folder).
  *
  * The data path stays distributed (repartition-by-group + partitionBy
  * CSV write: one file per group, written by executors); only the
  * packaging loop is driver-side BY DESIGN, like the reference — a zip
  * is a download/interchange container for group-sized curated exports,
  * not an analytics format, and each archive streams file-by-file with
  * a fixed 64 KiB buffer, so driver memory is bounded regardless of
  * export size. At 100 TB the analytics path never goes through here;
  * this is the last-mile artifact step.
  */
object ZipSink {

  /** Writes `df` partitioned by `groupCol` as headered CSV under
    * `dir/export/`, zips each group folder to `dir/<group>.zip`, and
    * returns one row per archive: (group, zip_path, n_entries,
    * csv_bytes). Deterministic layout: the pre-write repartition on the
    * group column makes each group folder exactly one part file.
    */
  def zipPartitioned(spark: SparkSession, df: DataFrame, groupCol: String,
                     dir: String): DataFrame = {
    val exportDir = new File(dir, "export")
    df.repartition(col(groupCol))
      .write.mode("overwrite").partitionBy(groupCol)
      .option("header", "true").csv(exportDir.toString)
    val buf = new Array[Byte](64 * 1024)
    val out = ArrayBuffer.empty[(String, String, Int, Long)]
    val groupDirs = exportDir.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith(groupCol + "="))
      .sortBy(_.getName)
    for (g <- groupDirs) {
      val group = g.getName.stripPrefix(groupCol + "=")
      val zipPath = new File(dir, s"$group.zip")
      val zos = new ZipOutputStream(new FileOutputStream(zipPath))
      var entries = 0
      var bytes = 0L
      try {
        for (f <- g.listFiles().filter(_.getName.endsWith(".csv")).sortBy(_.getName)) {
          zos.putNextEntry(new ZipEntry(f.getName))
          val in = new BufferedInputStream(new FileInputStream(f))
          try {
            var n = in.read(buf)
            while (n >= 0) {
              if (n > 0) { zos.write(buf, 0, n); bytes += n }
              n = in.read(buf)
            }
          } finally in.close()
          zos.closeEntry()
          entries += 1
        }
      } finally zos.close()
      out += ((group, zipPath.toString, entries, bytes))
    }
    import spark.implicits._
    out.toSeq.toDF("group", "zip_path", "n_entries", "csv_bytes")
  }

  /** Re-opens each archive produced by [[zipPartitioned]] and audits its
    * contents: per group, the number of entries, data rows (lines minus
    * one header per entry), and the sum of the first CSV field parsed
    * as a long — a content digest that breaks if packaging lost,
    * duplicated, or corrupted rows. Driver-side like the packaging.
    */
  def auditZips(spark: SparkSession, dir: String): DataFrame = {
    val zips = new File(dir).listFiles()
      .filter(_.getName.endsWith(".zip")).sortBy(_.getName)
    val out = zips.map { z =>
      val group = z.getName.stripSuffix(".zip")
      val zf = new ZipFile(z)
      var nEntries = 0
      var nRows = 0L
      var digest = 0L
      try {
        val en = zf.entries()
        while (en.hasMoreElements) {
          val e = en.nextElement()
          nEntries += 1
          val src = scala.io.Source.fromInputStream(zf.getInputStream(e), "UTF-8")
          try {
            src.getLines().drop(1).foreach { line =>
              nRows += 1
              digest += line.takeWhile(_ != ',').toLong
            }
          } finally src.close()
        }
      } finally zf.close()
      (group, nEntries, nRows, digest)
    }
    import spark.implicits._
    out.toSeq.toDF("group", "n_entries", "n_rows", "key_digest")
  }
}
