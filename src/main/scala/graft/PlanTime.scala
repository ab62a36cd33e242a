package graft

/** Optimization-round measurement tool: splits a query's wall time into
  * PLAN (DataFrame construction + executedPlan materialization, pure
  * driver/Catalyst work) vs EXECUTE (the noop write re-using the same
  * Dataset). Usage: runMain graft.PlanTime <name>[,<name>...] [reps]
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-plantime")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .write.format("noop").mode("overwrite").save()
    val reps = if (args.length > 1) args(1).toInt else 2
    args(0).split(",").foreach { n =>
      var r = 0
      while (r < reps) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analyze + optimize + plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        println(f"[plantime] $n rep$r build=${(t1 - t0) / 1e9}%.2f plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f")
        r += 1
      }
    }
    spark.stop()
  }
}
