package graft

import org.apache.spark.sql.functions._
import graft.operators.Winnowing

/** Pins for t43 (Schleimer et al. winnowing). The oracle row proves
  * Spark == DuckDB on the real corpus; these pin the algorithm's two
  * published properties on controlled fixtures: the DETECTION GUARANTEE
  * (a shared substring of length >= w+k-1 always yields a common
  * fingerprint) and the ~2/(w+1) selection density. */
class WinnowingSpec extends SparkSpec {

  private def docs(rows: (Int, String)*) =
    spark.createDataFrame(rows.map { case (i, t) => (i.toLong, t) })
      .toDF("doc_id", "text")

  private val rng = new scala.util.Random(7)
  private def randText(n: Int): String =
    (1 to n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  test("detection guarantee: shared substring of w+k-1 chars is caught") {
    // k=8, w=16 -> any shared run of >= 23 chars must share a fingerprint
    val shared = randText(23)
    val a = randText(100) + shared + randText(100)
    val b = randText(90) + shared + randText(110)
    val fp = Winnowing.fingerprints(docs(1 -> a, 2 -> b))
    val common = fp.filter(col("doc_id") === 1)
      .join(fp.filter(col("doc_id") === 2), "h")
    assert(common.count() >= 1, "guaranteed detection failed")
  }

  test("disjoint random docs share (almost) nothing") {
    val fp = Winnowing.fingerprints(docs(1 -> randText(300), 2 -> randText(300)))
    val common = fp.filter(col("doc_id") === 1)
      .join(fp.filter(col("doc_id") === 2), "h")
    assert(common.count() == 0, "random 26^8 k-gram collision is ~impossible")
  }

  test("selection density is near 2/(w+1)") {
    val n = 2000
    val t = randText(n)
    val fp = Winnowing.fingerprints(docs(1 -> t)).count().toDouble
    val hashes = (n - 8 + 1).toDouble
    val density = fp / hashes
    // expectation 2/17 = 0.1176 for random hashes; distinct-dedup and
    // boundary effects push it slightly under
    assert(density > 0.06 && density < 0.18, s"density $density")
  }

  test("short docs (< w+k-1) produce no fingerprints, not an error") {
    assert(Winnowing.fingerprints(docs(1 -> "tiny text")).isEmpty)
  }

  test("overlap pairs: near-duplicate docs dominate the pair list") {
    val core = randText(400)
    val d = docs(
      1 -> (randText(20) + core),
      2 -> (core + randText(25)),
      3 -> randText(420))
    val pairs = Winnowing.overlapPairs(d, maxDocs = 10, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (a, b, _) => a == 1L && b == 2L },
      s"near-dup pair missing: ${pairs.mkString(",")}")
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L },
      "random doc paired with near-dups")
  }
}
