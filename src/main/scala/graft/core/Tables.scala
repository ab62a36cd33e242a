package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Parquet scans: Catalyst pushes filters/column pruning into these reads,
  * so callers should NOT pre-materialize — compose lazily and let the scan
  * read only what the query needs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Canonical TimestampType(µs) `ts` whatever the parquet encoding of the
    * events file. TIMESTAMP(NANOS) files (earlier testdata drops) cannot be
    * read natively; sessions set spark.sql.legacy.parquet.nanosAsLong=true so
    * the column arrives as an ns-epoch long, and we integer-truncate to µs —
    * exactly what DuckDB's parquet reader does with the same file, so oracle
    * comparisons agree (`div`, not `/`: ns epoch exceeds 2^53, double
    * division would corrupt the low bits). TIMESTAMP(µs) files arrive
    * natively — as TIMESTAMP_NTZ when not UTC-adjusted; the session TZ is
    * pinned UTC, so the cast to TimestampType is instant-preserving and the
    * downstream column is identical across both encodings.
    */
  def canonTs(schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.Column =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
      case org.apache.spark.sql.types.TimestampNTZType =>
        org.apache.spark.sql.functions.col("ts").cast("timestamp")
      case _ => org.apache.spark.sql.functions.col("ts")
    }

  /** µs-epoch long for the same column under the same encoding rules. */
  def tsMicros(schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.Column =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.functions.expr("ts div 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        org.apache.spark.sql.functions.expr("unix_micros(cast(ts as timestamp))")
      case _ => org.apache.spark.sql.functions.expr("unix_micros(ts)")
    }

  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.withColumn("ts", canonTs(raw.schema))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
