package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("8", "plan-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args(0).split(",")) {
      val p = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      def c(m: String) = m.r.findAllIn(p).size
      println(s"[probe] $n expand=${c("Expand")} sortAgg=${c("SortAggregate")} scans=${c("FileScan|BatchScan|Scan parquet")} exch=${c("Exchange")}")
    }
    spark.stop()
  }
}
