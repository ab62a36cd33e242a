package graft

/** Regenerates the per-query exchange-count golden that PlanBudgetSpec
  * asserts against (src/test/resources/plan_exchanges.golden). Run after
  * deliberately changing a query's plan shape:
  *
  *   sbt "runMain graft.PlanGolden" > src/test/resources/plan_exchanges.golden
  *
  * Streaming queries (st*) are excluded: their fn launches a stream
  * rather than returning a lazy plan.
  */
object PlanGolden {
  val sfDir = "/root/testdata/sf0.001"

  def exchangeCount(plan: String): Int =
    "Exchange".r.findAllIn(plan).size

  def counts(spark: org.apache.spark.sql.SparkSession): Seq[(String, Int)] =
    SparkEntry.packs
      .filterNot(_.name.startsWith("st"))
      .map { q =>
        // queries persist() intermediates and the CacheManager is
        // JVM-shared: a subtree already cached by an earlier query (or
        // an earlier suite) substitutes InMemoryRelations whose stored
        // build plans re-count their inner exchanges — clear per query
        // so the count only reflects THIS query's plan
        spark.sqlContext.clearCache()
        q.name ->
          exchangeCount(q.fn(spark, sfDir).queryExecution.executedPlan.toString)
      }

  def main(args: Array[String]): Unit = {
    // "4" to MATCH TestSession exactly: Par.fanOut's identity-vs-
    // repartition choice reads defaultParallelism, so a golden generated
    // at a different core count records different exchange counts than
    // PlanBudgetSpec observes live (ADVICE r15 — the round-15 tests_ok
    // failure). Regenerate only under local[4].
    val spark = graft.core.Sessions.local("4", "graft-plangolden")
    counts(spark).sortBy(_._1).foreach { case (n, c) => println(s"$n $c") }
    spark.stop()
  }
}
