package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Query, Tables}
import graft.operators.Anomalies

/** Sink-path queries: the partitioned-history write → partition-discovery
  * read → pruned aggregate roundtrip (SURVEY §2.1 S6/S7) INSIDE the
  * oracle gate, not just a spec. The query derives a deterministic
  * snapshot per day from orders, appends each day with the idempotent
  * dynamic-partition overwrite (one day written twice — the re-run case),
  * reads the root back through partition discovery with a pruning
  * filter, and aggregates; the oracle recomputes the same result
  * straight from the source table, so any write/read/pruning defect
  * (lost partition, double-write duplication, wrong partition values)
  * breaks the hash match.
  */
object SinkQueries {

  val queries: Seq[Query] = Seq(

    // ---- S4: CSV export/import roundtrip ------------------------------------
    // The reference's CSV export surface: write a cleaned slice as CSV
    // (header, explicit schema on the way back in — CSV carries no
    // types), re-read it, aggregate. Doubles survive because Spark
    // writes the shortest round-trip representation; the oracle
    // recomputes from the source table, so any codec defect (quoting,
    // header, type parse) breaks the hash.
    Query("io02_csv_roundtrip",
      """SELECT c_mktsegment, count(*) AS n,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
        |FROM customer WHERE c_acctbal > 0
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_csv_").toString
      Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .write.mode("overwrite").option("header", "true").csv(dir)
      s.read.option("header", "true")
        .schema("c_custkey LONG, c_mktsegment STRING, c_acctbal DOUBLE")
        .csv(dir)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast("decimal(18,4)")).cast("double").as("bal"))
    },

    // ---- S6/S7: partitioned history write + pruned read ---------------------
    Query("io01_history_roundtrip",
      """SELECT CAST(DATE '2026-01-01' + CAST(o_orderkey % 3 AS INT) AS VARCHAR) AS pd,
        |       o_orderstatus, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_totalprice > 100000 AND o_orderkey % 3 >= 1
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val src = Tables.orders(s, d)
        .filter(col("o_totalprice") > 100000)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          (col("o_orderkey") % 3).as("day_off"))
      val root = java.nio.file.Files.createTempDirectory("graft_hist_").toString
      val day0 = java.time.LocalDate.of(2026, 1, 1)
      for (off <- 0 to 2)
        Anomalies.writeHistory(
          src.filter(col("day_off") === off).drop("day_off"), root,
          day0.plusDays(off))
      // re-run of day 1: dynamic overwrite must replace, not duplicate
      Anomalies.writeHistory(
        src.filter(col("day_off") === 1).drop("day_off"), root,
        day0.plusDays(1))
      s.read.parquet(root)
        .filter(col("partition_date") >= lit(java.sql.Date.valueOf("2026-01-02")))
        .groupBy(col("partition_date").cast("string").as("pd"),
          col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total"))
    }
  )
}
