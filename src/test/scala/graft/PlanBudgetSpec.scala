package graft

/** Shuffle-budget regression guard: every batch registry query's
  * physical plan must not contain MORE Exchange nodes than the committed
  * golden (src/test/resources/plan_exchanges.golden). An extra exchange
  * is the classic silent regression — results stay correct, the oracle
  * stays green, and the query quietly doubles its shuffle volume at
  * scale. Fewer exchanges than golden passes (improvements are free;
  * re-tighten with `sbt "runMain graft.PlanGolden"`).
  */
class PlanBudgetSpec extends SparkSpec {

  private def golden: Map[String, Int] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/plan_exchanges.golden"))
    try src.getLines().filter(_.nonEmpty).map { l =>
      val Array(n, c) = l.split(" "); n -> c.toInt
    }.toMap
    finally src.close()
  }

  test("no batch registry query gained an exchange vs the golden") {
    val g = golden
    val offenders = PlanGolden.counts(spark).flatMap { case (name, n) =>
      g.get(name) match {
        case None => Some(s"$name: not in golden — regenerate with runMain graft.PlanGolden")
        case Some(budget) if n > budget => Some(s"$name: $n exchanges > golden $budget")
        case _ => None
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
