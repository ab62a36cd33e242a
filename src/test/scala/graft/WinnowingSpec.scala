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

  test("kernel: selected set matches a brute-force reference (both paths)") {
    // independent O(n*w) reimplementation of the selection rule:
    // per window min by (unsigned hash, rightmost pos), distinct
    import org.apache.spark.unsafe.types.UTF8String
    def ref(t: String, k: Int, w: Int): Set[Long] = {
      val u = UTF8String.fromString(t)
      val n = u.numBytes - k + 1
      val h = (0 until n).map(p =>
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset + p, k, 42L))
      (0 to n - w).map { s =>
        (s until s + w).reduceLeft { (a, b) =>
          val c = java.lang.Long.compareUnsigned(h(a), h(b))
          if (c < 0) a else if (c > 0) b else b // rightmost on ties
        }
      }.map(h).toSet
    }
    val texts = Seq(randText(200), randText(50), "ab" * 40, randText(23))
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = Winnowing.fingerprintsHashed(docs(i -> t))
        .collect().map(_.getLong(1)).toSet
      assert(got == ref(t, 8, 16), s"text $i mismatch")
    }
    // interpreted eval agrees with the codegen'd path exercised above
    val e = graft.plans.WinnowingHashes(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(texts.head),
        org.apache.spark.sql.types.StringType), 8, 16)
    val ev = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(ev.toLongArray().toSet == ref(texts.head, 8, 16))
  }

  test("kernel path keeps the detection guarantee and density") {
    val shared = randText(23)
    val a = randText(150) + shared + randText(150)
    val b = randText(140) + shared + randText(160)
    val fp = Winnowing.fingerprintsHashed(docs(1 -> a, 2 -> b))
    assert(fp.filter(col("doc_id") === 1)
      .join(fp.filter(col("doc_id") === 2), "h").count() >= 1)
    val n = 2000
    val dens = Winnowing.fingerprintsHashed(docs(1 -> randText(n)))
      .count().toDouble / (n - 8 + 1)
    assert(dens > 0.06 && dens < 0.18, s"density $dens")
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
