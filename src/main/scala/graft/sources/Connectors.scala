package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** External-connector surface (SURVEY.md §2.1 S1/S9/S11). The reference
  * talks to ODK Central (REST form export) and Google Sheets (resolution
  * tracker); both are out-of-engine I/O whose SEMANTICS are "a table
  * lands as files / a table is published". These connectors model that
  * contract: the landed-file half is real (schema-explicit reads of a
  * landing directory, the same shape the REST export produces), the
  * network half is a documented stub the deployment wires to its HTTP
  * client.
  */
object Connectors {

  /** S1: ODK form landing zone — one directory per (project, form) of
    * exported CSVs (`{form}.csv` + `{form}-{repeat}.csv`). Reads the
    * parent or a repeat table with an explicit schema; inferSchema is
    * deliberately not offered (SURVEY §1.3).
    */
  def odkFormTable(spark: SparkSession, landingDir: String, formId: String,
                   schema: StructType, repeatName: Option[String] = None): DataFrame = {
    val file = repeatName.fold(s"$formId.csv")(r => s"$formId-$r.csv")
    spark.read.option("header", "true").schema(schema).csv(s"$landingDir/$file")
  }

  /** S1 (network half): fetch a form export from ODK Central into the
    * landing zone. STUB — deployments implement the REST call
    * (submission_export → unzip); the engine only consumes the landed
    * files via [[odkFormTable]].
    */
  def fetchOdkExport(project: String, formId: String, landingDir: String): Unit =
    throw new UnsupportedOperationException(
      "stub: wire to ODK Central REST submission_export in deployment")

  /** S9: resolution tracker table (the human SET/DELETE loop). The
    * engine contract is a plain table with (key, column, setTo,
    * operation) — read it from wherever the tracker syncs to.
    */
  def resolutionTracker(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true")
      .schema("key STRING, column STRING, setTo STRING, operation STRING")
      .csv(path)

  /** S9/S11 (network half): publish a table back to the tracker / ODK
    * metadata attachment. STUB — deployments implement the upload; the
    * engine's deliverable is the DataFrame (written to `stagingPath`).
    */
  def publishTable(df: DataFrame, stagingPath: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(stagingPath)
}
