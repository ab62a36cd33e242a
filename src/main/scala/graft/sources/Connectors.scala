package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.time.Duration
import java.util.zip.ZipInputStream

import scala.jdk.CollectionConverters._

/** Minimal HTTP seam for the external connectors (SURVEY.md §2.1
  * S1/S9/S11). The engine's connector logic — export URL construction,
  * zip unpacking, landing-zone layout, CSV staging — is real and tested
  * against a local fixture server; only the transport is injected, so a
  * deployment swaps in [[JdkHttpTransport]] (or its own authenticated
  * client) without touching connector code.
  */
trait HttpTransport {

  /** GET `url`, return the response body; throw on non-2xx. */
  def get(url: String, headers: Map[String, String] = Map.empty): Array[Byte]

  /** POST `body` to `url`, return the response body; throw on non-2xx. */
  def post(url: String, body: Array[Byte],
           headers: Map[String, String] = Map.empty): Array[Byte]
}

/** Production transport over the JDK 11+ `java.net.http` client (no
  * extra dependency). Deployments needing OAuth/etc. wrap or replace it.
  */
final class JdkHttpTransport(timeout: Duration = Duration.ofSeconds(60))
    extends HttpTransport {
  private val client =
    HttpClient.newBuilder().connectTimeout(timeout)
      .followRedirects(HttpClient.Redirect.NORMAL).build()

  private def send(b: HttpRequest.Builder, headers: Map[String, String]): Array[Byte] = {
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.timeout(timeout).build(),
      HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() / 100 == 2,
      s"HTTP ${resp.statusCode()} from ${resp.uri()}")
    resp.body()
  }

  def get(url: String, headers: Map[String, String]): Array[Byte] =
    send(HttpRequest.newBuilder(URI.create(url)).GET(), headers)

  def post(url: String, body: Array[Byte], headers: Map[String, String]): Array[Byte] =
    send(HttpRequest.newBuilder(URI.create(url))
      .POST(HttpRequest.BodyPublishers.ofByteArray(body)), headers)
}

/** External-connector surface (SURVEY.md §2.1 S1/S9/S11). The reference
  * talks to ODK Central (REST form export → zip of CSVs) and Google
  * Sheets (resolution tracker); the engine owns everything up to and
  * after the socket: endpoint/layout conventions, unzip, landing-zone
  * manifest, schema-explicit reads, CSV staging for publish. All network
  * calls go through the injected [[HttpTransport]].
  */
object Connectors {

  /** S1 landing layout: one directory per form under the landing root,
    * holding the parent `{form}.csv`, any `{form}-{repeat}.csv` repeat
    * tables, and the raw export zip kept alongside for audit.
    * Ref: odk-form-extraction/R/utils.R:70-83 (unzip to
    * `raw-form/{form_id}` + keep the zip).
    */
  def formDir(landingRoot: String, formId: String): Path =
    Paths.get(landingRoot, formId)

  /** S1 (network half): fetch a form's submission export from ODK
    * Central and unpack it into the landing zone. The export endpoint is
    * ODK Central's published REST surface
    * (`/v1/projects/{pid}/forms/{fid}/submissions.csv.zip`, bearer
    * token, media skipped) — the same call the reference issues through
    * its client library (utils.R:28-42: `submission_export(pid, fid,
    * media = FALSE)`). Returns the manifest of extracted file names,
    * mirroring utils.R:76-83's per-zip file listing.
    */
  def fetchOdkExport(http: HttpTransport, baseUrl: String, token: String,
                     projectId: Int, formId: String,
                     landingRoot: String): Seq[String] = {
    val url = s"$baseUrl/v1/projects/$projectId/forms/$formId/submissions.csv.zip?attachments=false"
    val zipBytes = http.get(url, Map("Authorization" -> s"Bearer $token"))
    val dir = formDir(landingRoot, formId)
    Files.createDirectories(dir)
    Files.write(dir.resolve(s"$formId.zip"), zipBytes)
    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    val names = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .filterNot(_.isDirectory).map { entry =>
        // zip entries are attacker-controlled names: keep basenames only,
        // never let `../` escape the landing dir
        val name = Paths.get(entry.getName).getFileName.toString
        val out = new ByteArrayOutputStream()
        zin.transferTo(out)
        Files.write(dir.resolve(name), out.toByteArray)
        name
      }.toList
    zin.close()
    names
  }

  /** S1 (network half): list a project's non-archived form ids —
    * `/v1/projects/{pid}/forms` returns a JSON array of form objects;
    * the connector needs only `xmlFormId` (+ the `state` flag to skip
    * closed forms), extracted positionally per object so no JSON
    * dependency is added. Ref: utils.R:56-66 (`form_list(pid)`).
    */
  def odkFormList(http: HttpTransport, baseUrl: String, token: String,
                  projectId: Int): Seq[String] = {
    val body = new String(http.get(s"$baseUrl/v1/projects/$projectId/forms",
      Map("Authorization" -> s"Bearer $token")), StandardCharsets.UTF_8)
    val obj = "\\{[^{}]*\\}".r
    val id = "\"xmlFormId\"\\s*:\\s*\"([^\"]+)\"".r
    val closed = "\"state\"\\s*:\\s*\"(closed|closing)\"".r
    obj.findAllIn(body).toSeq.flatMap { o =>
      if (closed.findFirstIn(o).isDefined) None
      else id.findFirstMatchIn(o).map(_.group(1))
    }
  }

  /** S1: read a landed form table (parent or repeat) with an explicit
    * schema; inferSchema is deliberately not offered (SURVEY §1.3).
    */
  def odkFormTable(spark: SparkSession, landingRoot: String, formId: String,
                   schema: StructType, repeatName: Option[String] = None): DataFrame = {
    val file = repeatName.fold(s"$formId.csv")(r => s"$formId-$r.csv")
    spark.read.option("header", "true").schema(schema)
      .csv(formDir(landingRoot, formId).resolve(file).toString)
  }

  /** S9 (network half): fetch the resolution-tracker worksheet as CSV
    * into the landing zone. Sheets' CSV export surface
    * (`.../export?format=csv&gid={gid}`) carries the whole worksheet;
    * the reference reads the same worksheet through its sheets client
    * (pipeline-gsheets/gsheets_src/anomalies_update.py:14-18). Returns
    * the landed path for [[resolutionTracker]].
    */
  def fetchTrackerSheet(http: HttpTransport, exportUrl: String,
                        landingPath: String): String = {
    val bytes = http.get(exportUrl)
    val p = Paths.get(landingPath)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, bytes)
    landingPath
  }

  /** S9: resolution tracker table (the human SET/DELETE loop). The
    * engine contract is a plain table with (key, column, setTo,
    * operation) — read it from wherever the tracker syncs to.
    */
  def resolutionTracker(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true")
      .schema("key STRING, column STRING, setTo STRING, operation STRING")
      .csv(path)

  /** S9/S11: stage a table for publish — single CSV with header, the
    * shape both the tracker update and the ODK metadata attachment
    * upload consume. Ref: anomalies_update.py:40-41 (to_csv),
    * pipeline-metadata/R/03.store_metadata_to_odk.R (csv attachment).
    */
  def publishTable(df: DataFrame, stagingPath: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(stagingPath)

  /** S9: the ento-labs sheet update loop
    * (pipeline-gsheets/gsheets_src/ento_update.py:242-256): iterate the
    * spreadsheet's worksheets SKIPPING hidden ones, derive each
    * landed filename from the title (lowercased words joined by '_'),
    * drop the first data row positionally (`get_as_df().iloc[1:]` — the
    * sheets' units subheader), REPLACE the column names wholesale with
    * the per-form variable list (`data.columns = VARNAME_DICT[title]`,
    * ibid:255 — positional, the exported junk headers never survive),
    * and land one CSV per form. The worksheet manifest is
    * `{sheetDir}/worksheets.csv` (title, file, hidden) — driver-side
    * like the reference's `sh.worksheets()` listing, bounded by the
    * spreadsheet's worksheet count. The positional drop reads the
    * export as ONE file (sheets are ≤20k rows — BASELINE.md's tracker
    * bound), where the single partition's monotonically_increasing_id
    * IS file order. Returns (title, landed path) per visible sheet.
    */
  def entoSheetUpdate(spark: SparkSession, sheetDir: String,
                      varnames: Map[String, Seq[String]],
                      outDir: String): Seq[(String, String)] = {
    val manifest = spark.read.option("header", "true")
      .schema("title STRING, file STRING, hidden STRING")
      .csv(s"$sheetDir/worksheets.csv")
      .collect().toSeq.sortBy(_.getString(0))
    manifest.filter(_.getString(2) != "true").map { r =>
      val title = r.getString(0)
      val outname =
        title.split("\\s+").map(_.toLowerCase).mkString("_") + ".csv"
      val df = spark.read.option("header", "true")
        .csv(s"$sheetDir/${r.getString(1)}")
        .coalesce(1)
        .withColumn("_i", org.apache.spark.sql.functions
          .monotonically_increasing_id())
        .filter(org.apache.spark.sql.functions.col("_i") > 0).drop("_i")
      val renamed = df.toDF(varnames(title): _*)
      val out = s"$outDir/$outname"
      publishTable(renamed, out)
      (title, out)
    }
  }

  /** S10: zip packaging sink — package a staged form folder for
    * download as `{dir}/{basename(dir)}.zip`, holding the folder's
    * top-level files by basename (the reference zips with `-j`,
    * junking paths, and R's non-recursive `dir()` listing). Entries
    * are written in sorted-name order so the archive is byte-stable
    * across runs; pre-existing `.zip` files are skipped so a re-run
    * never swallows its own previous output. Returns the entry names.
    * Ref: pipeline-cleaning/R/01.run_form_cleaning.R:181-192.
    */
  def zipFormDir(dir: String): Seq[String] = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val d = Paths.get(dir)
    val files = graft.core.Fs.listDir(d)
      .filter(p => Files.isRegularFile(p) &&
        !p.getFileName.toString.endsWith(".zip"))
      .sortBy(_.getFileName.toString)
    val zipPath = d.resolve(s"${d.getFileName}.zip")
    val zout = new ZipOutputStream(Files.newOutputStream(zipPath))
    try files.map { p =>
      val name = p.getFileName.toString
      val entry = new ZipEntry(name)
      // pin the timestamp too: archives must not differ run-to-run
      entry.setTime(0L)
      zout.putNextEntry(entry)
      zout.write(Files.readAllBytes(p))
      zout.closeEntry()
      name
    } finally zout.close()
  }

  /** S11 (network half): upload a staged CSV to its destination (ODK
    * form-attachment endpoint or tracker ingest). Picks the part-file
    * out of the staging directory and POSTs its bytes.
    */
  def uploadStaged(http: HttpTransport, stagingPath: String, url: String,
                   headers: Map[String, String] = Map.empty): Int = {
    val part = graft.core.Fs.listDir(Paths.get(stagingPath))
      .find(p =>
        p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".csv"))
      .getOrElse(throw
        new IllegalStateException(s"no staged part CSV under $stagingPath"))
    val bytes = Files.readAllBytes(part)
    http.post(url, bytes, headers + ("Content-Type" -> "text/csv"))
    bytes.length
  }
}
