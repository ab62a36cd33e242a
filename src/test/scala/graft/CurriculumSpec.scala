package graft

import org.apache.spark.sql.functions._
import graft.operators.Curriculum

/** Pins the curriculum operators' properties the t30/t31 oracles can't
  * see: keep-rule edge cases (singleton domains, threshold ties) and
  * coverage bounds.
  */
class CurriculumSpec extends SparkSpec {

  private val stop = Seq("the", "a", "of", "and", "in")

  private def scored = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L),
      (5L, "b", 7L),                      // singleton domain
      (6L, "c", 5L), (7L, "c", 5L), (8L, "c", 5L) // all tied
    ).toDF("doc_id", "domain", "score")
  }

  test("every domain keeps at least its best doc; singleton always kept") {
    val out = Curriculum.domainPercentileKeep(scored, "doc_id", "domain",
        "score", p = 0.75)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(4)))
    val keptByDomain = out.groupBy(_._2).map { case (d, rs) =>
      d -> rs.count(_._3) }
    assert(keptByDomain.values.forall(_ >= 1),
      s"every domain must keep >= 1 doc: $keptByDomain")
    assert(out.find(_._1 == 5L).exists(_._3), "singleton domain doc kept")
  }

  test("threshold ties: >= keeps every doc at the cut") {
    val out = Curriculum.domainPercentileKeep(scored, "doc_id", "domain",
        "score", p = 0.75)
      .filter(col("domain") === "c").collect()
    assert(out.forall(_.getBoolean(4)), "all-tied domain keeps everything")
  }

  test("integer quality score matches its definition on a known doc") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "the cat sat, on a mat!")).toDF("doc_id", "text")
    val sc = df.select(Curriculum.integerQualityScore(col("text"), stop))
      .head().getLong(0)
    // 6 tokens + 3*2 stopword hits ("the","a") - 2 punct chars (",","!")
    assert(sc == 6 + 6 - 2, s"got $sc")
  }

  test("coverage is bounded and high minDf zeroes it") {
    val s = spark; import s.implicits._
    val docs = (1L to 20L)
      .map(i => (i, if (i <= 10) "common boiler plate line here"
                    else s"unique text $i with words $i"))
      .toDF("doc_id", "text")
    val cov = Curriculum.dupNgramCoverage(docs, "doc_id", "text",
        n = 3, minDf = 5L)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(cov.values.forall(c => c >= 0.0 && c <= 1.0))
    assert((1L to 10L).forall(cov(_) == 1.0),
      "repeated boilerplate docs read fully covered")
    assert((11L to 20L).forall(cov(_) == 0.0),
      "unique docs read uncovered")
    val none = Curriculum.dupNgramCoverage(docs, "doc_id", "text",
        n = 3, minDf = 1000L)
      .collect().map(_.getDouble(3))
    assert(none.forall(_ == 0.0), "minDf above any df zeroes coverage")
  }

  test("docs with fewer than n tokens produce no coverage row") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "two words"), (2L, "three word doc")).toDF("doc_id", "text")
    val ids = Curriculum.dupNgramCoverage(docs, "doc_id", "text", n = 3,
        minDf = 0L)
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L))
  }

  test("null score is never kept (null-safe keep flag)") {
    val s = spark; import s.implicits._
    val sc = Seq((1L, "d", java.lang.Long.valueOf(5L)),
        (2L, "d", null.asInstanceOf[java.lang.Long]))
      .toDF("doc_id", "domain", "score")
    val out = Curriculum.domainPercentileKeep(sc, "doc_id", "domain",
        "score", 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(1L) && !out(2L))
  }

  test("null text drops cleanly from coverage (no crash, no row)") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, null: String))
      .toDF("doc_id", "text")
    val ids = Curriculum.dupNgramCoverage(docs, "doc_id", "text", 3, 0L)
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }
}
