package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-SHAPE assertions for the two heaviest composites at posture
  * scale (VERDICT r12 item 6): g31/g32's 100x standing depends on AQE
  * keeping the small-dim hops broadcast and never falling into a
  * nested-loop/cartesian shape, but the committed exchange golden pins
  * sf0.001 only. This suite executes both rows against a 10x key-shifted
  * replica (ScaleReplica.ensureReplica of sf0.01 — sf0.1 volume, cached
  * in /tmp across runs) with AQE on, then asserts on the FINAL adaptive
  * plan — so an AQE flip at scale fails the suite instead of surfacing
  * as a silent 100x regression.
  */
class EntoScalePlanSpec extends SparkSpec {

  private lazy val replica =
    ScaleReplica.ensureReplica(spark, "/root/testdata/sf0.01", 10)

  /** Execute and return the final adaptive physical plan string.
    * The action must run THIS QueryExecution's own plan tree: df.write
    * plans a SEPARATE QueryExecution, and even df.foreach goes through
    * Dataset.rdd's separate rddQueryExecution — either way this df's
    * AdaptiveSparkPlanExec never executes and executedPlan returns the
    * INITIAL plan, so the assertions could never see a runtime AQE
    * join-strategy flip (the round-13 review catch). Running an RDD
    * count on a.execute() finalizes the adaptive plan in place, and
    * the isFinalPlan assert keeps this helper honest if Spark's
    * execution wiring ever changes again. */
  private def finalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec =>
        a.execute().count()
        assert(a.toString.contains("isFinalPlan=true"),
          "adaptive plan did not finalize — the action must run THIS plan")
        a.executedPlan.toString
      case p =>
        p.execute().count()
        p.toString
    }

  test("g32 at 10x: assignment join stays broadcast, no loop joins") {
    val plan = finalPlan(
      SparkEntry.queries("g32_ento_lab_template")(spark, replica))
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      s"loop join appeared in g32's 10x plan:\n$plan")
    // the 25-row assignment dim must come in as a broadcast hash join —
    // an SMJ here would range-sort the whole mosquito table against 25 rows
    val asgJoin = plan.linesIterator
      .filter(l => l.contains("Join") && l.contains("cluster_number")).toSeq
    assert(asgJoin.nonEmpty, s"assignment join not found in plan:\n$plan")
    assert(asgJoin.forall(_.contains("BroadcastHashJoin")),
      s"assignment join is not broadcast at 10x: ${asgJoin.mkString("; ")}")
  }

  test("g31 at 10x: tube hop is a partition-clean equi join, dims don't loop") {
    val plan = finalPlan(
      SparkEntry.queries("g31_ento_sponsor_tubes")(spark, replica))
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      s"loop join appeared in g31's 10x plan:\n$plan")
    // the tube-key hop is data-sized on BOTH sides: it must be an equi
    // join (hash or sort-merge — partition-clean either way), never a
    // broadcast of a data-sized side
    val tubeJoin = plan.linesIterator
      .filter(l => l.contains("Join") && l.contains("tube_key")).toSeq
    assert(tubeJoin.nonEmpty, s"tube-key join not found in plan:\n$plan")
    assert(tubeJoin.forall(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")
        || l.contains("BroadcastHashJoin")),
      s"tube join shape unexpected: ${tubeJoin.mkString("; ")}")
  }
}
