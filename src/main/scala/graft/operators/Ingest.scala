package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-tracked incremental landing-zone ingest (the batch cadence:
  * a scheduled job processes each landed file exactly once).
  *
  * The manifest is a versioned parquet table of processed file names
  * (read v, write v+1 — never overwrite what might be read). Each
  * `nextBatch` call lists the landing dir, anti-joins the manifest, and
  * returns the new files; `commit` appends them. The file-name
  * anti-join runs as DataFrames so the manifest can be arbitrarily
  * large, but the returned batch is collected — callers process a
  * bounded number of new files per run (the scheduler contract).
  */
final class Ingest(spark: SparkSession, landingDir: String,
                   manifestDir: String) {
  import java.nio.file.{Files, Paths}
  import scala.jdk.CollectionConverters._

  private var version: Int = {
    // resume from the highest existing manifest version (restart-safe)
    val d = Paths.get(manifestDir)
    if (!Files.isDirectory(d)) -1
    else graft.core.Fs.listDir(d).map(_.getFileName.toString)
      .filter(_.startsWith("v")).map(_.drop(1).toInt)
      .foldLeft(-1)(math.max)
  }

  private def manifest(): DataFrame =
    if (version < 0)
      spark.createDataFrame(Seq.empty[Tuple1[String]]).toDF("fname")
    else spark.read.parquet(s"$manifestDir/v$version")

  private def landed(): Seq[String] =
    graft.core.Fs.listDir(Paths.get(landingDir))
      .map(_.getFileName.toString).filter(_.endsWith(".parquet"))
      .sorted

  /** File names landed but not yet in the manifest, sorted. */
  def nextBatch(): Seq[String] = {
    val landedDf = spark.createDataFrame(landed().map(Tuple1(_))).toDF("fname")
    landedDf.join(manifest(), Seq("fname"), "left_anti")
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Absolute paths for a batch returned by nextBatch. */
  def paths(batch: Seq[String]): Seq[String] = batch.map(n => s"$landingDir/$n")

  /** Record a processed batch: manifest version+1 = old ∪ batch. */
  def commit(batch: Seq[String]): Unit = {
    manifest().unionAll(
        spark.createDataFrame(batch.map(Tuple1(_))).toDF("fname"))
      .write.parquet(s"$manifestDir/v${version + 1}")
    version += 1
  }
}
