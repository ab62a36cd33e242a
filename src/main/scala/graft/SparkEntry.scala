package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Query

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over the driver testdata, with a DuckDB oracle where the
  * semantics are SQL-expressible (driver hash-compares the results).
  */
object SparkEntry {

  /** All query packs, in SURVEY §2 order. */
  def packs: Seq[Query] =
    graft.queries.Relational.queries ++
    graft.queries.Cleaning.queries ++
    graft.queries.Temporal.queries ++
    graft.queries.TextAnalysis.queries ++
    graft.queries.SimilaritySearch.queries ++
    graft.queries.GeoQueries.queries ++
    graft.queries.MultimodalQueries.queries ++
    graft.queries.Analytics.queries ++
    graft.queries.Composite.queries ++
    graft.queries.Ento.queries ++
    graft.queries.Goals.queries ++
    graft.queries.Reporting.queries ++
    graft.queries.LabReports.queries ++
    graft.queries.Keys.queries ++
    graft.queries.SinkQueries.queries ++
    graft.queries.StreamingQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a08_multi_metric")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
