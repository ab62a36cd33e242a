package graft

/** Engine-wide plan lint: every registry query's physical plan must be
  * free of the two silent performance killers —
  *  - CartesianProduct (a non-broadcast cross join: all-pairs shuffle;
  *    the intended cross joins in the registry all broadcast one side,
  *    which plans as BroadcastNestedLoopJoin instead), and
  *  - CodegenFallback (an expression janino could not compile, silently
  *    interpreted — the round-1 PointInPolygon regression class).
  * Catches regressions the per-query specs and oracles cannot see.
  */
class PlanLintSpec extends SparkSpec {

  test("no registry query plans a CartesianProduct or falls back from codegen") {
    val d = "/root/testdata/sf0.001"
    val offenders = SparkEntry.packs.flatMap { q =>
      val plan = q.fn(spark, d).queryExecution.executedPlan.toString
      Seq("CartesianProduct", "CodegenFallback").collect {
        case marker if plan.contains(marker) => s"${q.name}: $marker"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("j06 resolution prep plans no SortAggregate (hash-agg argmax form)") {
    val plan = SparkEntry.queries("j06_resolution_set_delete")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"), plan)
  }
}
