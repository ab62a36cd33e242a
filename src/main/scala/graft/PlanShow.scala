package graft

/** Plan inspector: executes one registry query on the smoke slice and
  * prints its FINAL adaptive physical plan (post-execution, so
  * ReusedExchange / runtime join strategy decisions are visible).
  *
  *   sbt "runMain graft.PlanShow t18_unigram_logprob"
  */
object PlanShow {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("8", "plan-show")
    val q = SparkEntry.packs.find(_.name == args(0))
      .getOrElse(sys.error(s"no such query: ${args(0)}"))
    val df = q.fn(spark, "/root/testdata/sf0.001")
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
