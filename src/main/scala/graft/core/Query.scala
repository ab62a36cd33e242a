package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query with an optional DuckDB oracle (driver contract).
  *
  * `fn` runs against the parquet tables under `sfDir`; `oracle` is ANSI SQL
  * over the same tables (bare table names) producing the SAME column names —
  * the driver sorts columns by name and hash-compares values.
  */
final case class Query(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Query {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Query =
    Query(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Query =
    Query(name, fn, None)
}
