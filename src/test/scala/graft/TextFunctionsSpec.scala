package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Edge cases the synthetic corpus never produces: empty and single-token
  * texts, sub-n-gram documents, punctuation-free ratio denominators.
  */
class TextFunctionsSpec extends SparkSpec {

  private def one(expr: org.apache.spark.sql.Column, text: String) =
    spark.sql(s"SELECT '${text}' AS t").select(expr).head()

  test("tokenCount: single token and multi token") {
    assert(one(tokenCount(col("t")), "hello").getInt(0) == 1)
    assert(one(tokenCount(col("t")), "a b c").getInt(0) == 3)
  }

  test("regexTokenCount counts words and symbols separately") {
    val d = df("SELECT 'ab, cd! 12' AS t")
      .select(regexTokenCount(col("t")).as("n")).head()
    assert(d.getInt(0) == 5) // ab , cd ! 12
  }

  test("shingles: fewer tokens than n yields empty, exactly n yields one") {
    assert(one(shingles(col("t"), 3), "a b").getSeq[String](0).isEmpty)
    assert(one(shingles(col("t"), 2), "a b").getSeq[String](0) == Seq("a b"))
    // duplicates collapse
    assert(one(shingles(col("t"), 2), "x y x y x").getSeq[String](0).sorted ==
      Seq("x y", "y x"))
  }

  test("fingerprint: stable, order-sensitive, single-token defined") {
    val f1 = one(fingerprint(col("t")), "a b c").getLong(0)
    val f2 = one(fingerprint(col("t")), "a b c").getLong(0)
    val f3 = one(fingerprint(col("t")), "c b a").getLong(0)
    assert(f1 == f2)
    assert(f1 != f3, "rolling hash must be order-sensitive")
    assert(one(fingerprint(col("t")), "solo").getLong(0) >= 0)
  }

  test("stopwordRatio and meanWordLen on boundary inputs") {
    val r = one(stopwordRatio(col("t"), Seq("the")), "the").getDouble(0)
    assert(r == 1.0)
    assert(one(meanWordLen(col("t")), "ab cdef").getDouble(0) == 3.0)
  }

  test("langId tie breaks to the first language in marker order") {
    val markers = Seq("en" -> Seq("the"), "es" -> Seq("el"))
    // no markers at all → all scores 0 → first language wins
    assert(one(langId(col("t"), markers), "xyz abc").getString(0) == "en")
    assert(one(langId(col("t"), markers), "el gato").getString(0) == "es")
  }

  test("punctRatio zero when no punctuation") {
    assert(one(punctRatio(col("t")), "abc def").getDouble(0) == 0.0)
  }

  test("scrubPii replaces emails, IPs, and phone runs; leaves clean text") {
    val s = one(scrubPii(col("t")),
      "mail a.b-c_1@ex-1.co.uk ip 192.168.0.1 ph +44 (0) 20-7946 0958 end")
      .getString(0)
    assert(s == "mail <EMAIL> ip <IP> ph <PHONE> end", s)
    assert(one(scrubPii(col("t")), "no pii here 12 34").getString(0) ==
      "no pii here 12 34")
    // short digit runs (< 8 chars total) are not phones
    assert(one(scrubPii(col("t")), "year 2026 room 4-12").getString(0) ==
      "year 2026 room 4-12")
  }

  test("benchmarkOverlap flags exact copy of a bench doc, skips low overlap") {
    val bench = df(
      "SELECT * FROM (VALUES (CAST(0 AS BIGINT), 'alpha beta gamma delta epsilon zeta')) AS t(doc_id, text)")
    // doc 1: 4 shared trigrams, doc 2: 1 shared, doc 3: 0 shared
    val corpus = df(
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'alpha beta gamma delta epsilon zeta'),
        |  (CAST(2 AS BIGINT), 'alpha beta gamma nothing else here'),
        |  (CAST(3 AS BIGINT), 'totally unrelated words only now')) AS t(doc_id, text)""".stripMargin)
    val out = graft.operators.Decontaminate
      .benchmarkOverlap(corpus, bench, "doc_id", "text", n = 3, minOverlap = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 4L), out.toString)
  }

  test("benchmarkOverlapBloom is bit-identical to the exact operator") {
    // 400-doc corpus vs 40-doc bench built from overlapping token pools —
    // plenty of shared and unshared bigrams on both sides
    val docs = spark.range(440).selectExpr("id AS doc_id",
      """concat_ws(' ', transform(sequence(0, 25),
        |  i -> concat('w', pmod(id * 31 + i * 7, 90)))) AS text""".stripMargin)
    val corpus = docs.filter(col("doc_id") >= 40)
    val bench = docs.filter(col("doc_id") < 40)
    val exact = rows(graft.operators.Decontaminate
      .benchmarkOverlap(corpus, bench, "doc_id", "text", n = 2, minOverlap = 2))
    val bloom = rows(graft.operators.Decontaminate
      .benchmarkOverlapBloom(corpus, bench, "doc_id", "text", n = 2, minOverlap = 2))
    assert(exact == bloom, "bloom prefilter must not change the result")
    assert(exact.nonEmpty, "fixture must actually produce overlaps")
    // an undersized, high-fpp sketch floods the prefilter with false
    // positives; the verify join must still strip every one of them
    val noisy = rows(graft.operators.Decontaminate
      .benchmarkOverlapBloom(corpus, bench, "doc_id", "text", n = 2,
        minOverlap = 2, expectedShingles = 8, fpp = 0.5))
    assert(noisy == exact, "false positives must not survive the exact join")
  }

  test("contextChunks: stride/overlap arithmetic and short-doc guard") {
    val sess = spark; import sess.implicits._
    def chunksOf(text: String): Seq[Seq[String]] =
      Seq(Tuple1(text)).toDF("t")
        .select(contextChunks(col("t"), window = 4, stride = 3))
        .head().getSeq[String](0).map(_.split(" ").toSeq)
    // 10 tokens, window 4, stride 3, overlap 1 -> ceil(9/3) = 3 chunks
    val c = chunksOf((1 to 10).map("w" + _).mkString(" "))
    assert(c.map(_.length) == Seq(4, 4, 4))
    assert(c(0) == Seq("w1", "w2", "w3", "w4"))
    assert(c(1) == Seq("w4", "w5", "w6", "w7"))   // 1-token overlap
    assert(c(2) == Seq("w7", "w8", "w9", "w10"))
    // 5 tokens -> ceil(4/3) = 2, short final window kept
    val c5 = chunksOf("a b c d e")
    assert(c5 == Seq(Seq("a", "b", "c", "d"), Seq("d", "e")))
    // exactly window tokens -> one chunk
    assert(chunksOf("a b c d") == Seq(Seq("a", "b", "c", "d")))
    // at/below overlap tokens -> EMPTY (len > overlap gate), and never
    // a descending-sequence blowup from sequence(0, n-1) with n <= 0
    assert(chunksOf("a").isEmpty)
    // just above the overlap -> one short chunk
    assert(chunksOf("a b") == Seq(Seq("a", "b")))
  }

  test("contextChunks: null text yields empty, never a task failure") {
    val sess = spark; import sess.implicits._
    val out = Seq((1L, null: String), (2L, "a b c d e f"))
      .toDF("id", "t")
      .select(col("id"), contextChunks(col("t"), window = 4, stride = 3).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(out(2L).get.nonEmpty)
    assert(out(1L).isEmpty || out(1L).get.isEmpty)
  }
}
