package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for date-partitioned sinks — the operational
  * counterpart of the S6 history sink (io01): every daily append adds
  * task-count files per partition, and a year of appends makes the
  * reader's file listing (and the NameNode/object-store metadata) the
  * bottleneck long before the bytes do.
  *
  * The rewrite is SIDE-BY-SIDE (src root → dst root), never in place:
  * reading and overwriting the same root is a read-own-input cycle
  * that would need the whole dataset checkpointed (fine for a fixture,
  * impossible at 100 TB); a fresh root plus an atomic swap
  * (rename/metastore repoint) is the scale-correct pattern and keeps
  * the source readable during the rewrite.
  *
  * Scale notes: one shuffle keyed by the partition column (hash
  * placement sends every row of a date to ONE task → exactly one file
  * per partition; pass `buckets > 1` to spread a hot date over that
  * many files via a deterministic xxhash64 bucket). Partition pruning
  * on the compacted output is identical to the source — the layout
  * column set is preserved.
  */
object Compaction {

  /** Rewrite `srcRoot` (parquet, partitioned by `partitionCol`) into
    * `dstRoot` with one file per partition value, or — when
    * `maxRecordsPerFile > 0` — deterministic ceil(rows/max) files per
    * partition (the writer splits at the record cap; this is the
    * production file-size knob, deterministic where a hash-bucket
    * column is at the mercy of AQE partition coalescing).
    */
  def compact(spark: SparkSession, srcRoot: String, dstRoot: String,
              partitionCol: String, maxRecordsPerFile: Long = 0L): Unit = {
    val df = spark.read.parquet(srcRoot)
    val writer = df.repartition(col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol)
    (if (maxRecordsPerFile > 0)
       writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer)
      .parquet(dstRoot)
  }

  /** Per-partition file counts of a partitioned parquet root:
    * (partition value string, n_files). Listing only — no data read.
    */
  def partitionFileCounts(spark: SparkSession, root: String,
                          partitionCol: String): Seq[(String, Int)] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$partitionCol="))
      .map { st =>
        val v = st.getPath.getName.stripPrefix(s"$partitionCol=")
        val files = fs.listStatus(st.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        (v, files)
      }.toSeq.sortBy(_._1)
  }
}
