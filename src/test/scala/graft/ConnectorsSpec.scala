package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Connectors

class ConnectorsSpec extends SparkSpec {

  test("ODK landing zone: parent and repeat tables with explicit schemas") {
    val dir = Files.createTempDirectory("graft_odk").toString
    df("SELECT 'uuid:1' AS KEY, '00007' AS hhid")
      .write.option("header", "true").mode("overwrite").csv(s"$dir/safety.csv")
    df("SELECT 'uuid:1/r[1]' AS KEY, 'uuid:1' AS PARENT_KEY, '00007-01' AS extid")
      .write.option("header", "true").mode("overwrite").csv(s"$dir/safety-repeat_individual.csv")
    val parent = Connectors.odkFormTable(spark, dir, "safety",
      StructType(Seq(StructField("KEY", StringType), StructField("hhid", StringType))))
    val child = Connectors.odkFormTable(spark, dir, "safety",
      StructType(Seq(StructField("KEY", StringType), StructField("PARENT_KEY", StringType),
        StructField("extid", StringType))),
      repeatName = Some("repeat_individual"))
    // canonical J1 parent↔repeat join
    val joined = child.join(parent.withColumnRenamed("KEY", "PKEY"),
      col("PARENT_KEY") === col("PKEY"))
    assert(joined.count() == 1)
    assert(joined.head().getAs[String]("hhid") == "00007")
  }

  test("resolution tracker round-trips through publishTable") {
    val staging = Files.createTempDirectory("graft_tracker").toString + "/out"
    val res = df("""SELECT 'uuid:9' AS key, 'visit' AS column, 'V2' AS setTo, 'SET' AS operation""")
    Connectors.publishTable(res, staging)
    val back = Connectors.resolutionTracker(spark, staging)
    assert(rows(back) == rows(res))
  }

  test("network stubs are explicit about being stubs") {
    intercept[UnsupportedOperationException] {
      Connectors.fetchOdkExport("p", "f", "/tmp/x")
    }
  }
}
