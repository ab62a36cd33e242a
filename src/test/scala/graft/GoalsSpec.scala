package graft

import org.apache.spark.sql.functions._
import graft.queries.Goals

/** g03's oracle proves Spark == DuckDB; this spec proves the fixture is
  * actually exercising every branch of the reference state machine
  * (00.store_se_goals.R:374-392) — a vacuous fixture would pass the
  * gate while pinning nothing.
  */
class GoalsSpec extends SparkSpec {

  private lazy val curated = Goals.efficacyCurated(spark, "/root/testdata/sf0.01")
    .persist()

  test("every enrollment state occurs in the g03 fixture") {
    val states = curated.select("enrollment").distinct().collect()
      .map(_.getString(0)).toSet
    assert(states == Set("enrollment", "not yet enrolled", "follow up"))
  }

  test("every removal cause occurs independently") {
    def n(c: org.apache.spark.sql.Column) = curated.filter(c).count()
    assert(n(col("mig") === 1) > 0, "migration EOS")
    assert(n(col("unm") === 1) > 0, "unenrolled migrated")
    assert(n(col("und") === 1) > 0, "unenrolled died")
    assert(n(col("status") === "refusal") > 0, "refusal")
    assert(n(col("status") === "eos") > 0, "eos")
    assert(n(col("enrollment") === "not yet enrolled" && col("vn") >= 3) > 0,
      "never enrolled by V3")
    // and rows that survive: removal false
    assert(n(!col("removal")) > 0)
  }

  test("the skeleton has genuine gaps (forward fill is load-bearing)") {
    // presence hash < 'c0' leaves ~25% of (person, visit) slots empty:
    // those placeholder rows join nothing and take filled attributes
    val people = curated.select("extid").distinct().count()
    val slots = curated.count()
    assert(slots < people * 4, s"fixture is dense ($slots rows for $people people)")
  }

  test("removal is never directly derivable from the same visit only") {
    // at least one person is removed at visit v (removal=true) but still
    // counted at visit v+1's goals... the inverse: a removal at v must
    // exclude v+2 goals via the next_visit shift. Pin the shift by
    // checking a removed person's next visit is filtered in the query.
    val removedAtV1 = curated.filter(col("vn") === 1 && col("removal"))
      .select("extid").distinct()
    assert(removedAtV1.count() > 0)
  }
}
