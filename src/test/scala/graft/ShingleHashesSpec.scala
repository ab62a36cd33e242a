package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.plans.ShingleHashes

class ShingleHashesSpec extends SparkSpec {

  // edge cases: consecutive/leading/trailing spaces, too-short docs,
  // exactly-n tokens, repeated shingles, multibyte UTF-8
  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a a a a a",                      // every shingle identical
    "one two",                        // exactly n tokens
    "single",                         // fewer than n tokens
    "",                               // empty doc
    "  leading and  double  spaces ", // empty tokens
    "naïve café über schön naïve café") // multibyte, repeated shingle

  private def fixture = {
    val s = spark; import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("bit-identical to xxhash64 over string shingles, distinct, in order") {
    val viaStrings = fixture.select(col("id"),
      transform(TextFunctions.shingles(col("text"), 2), s => xxhash64(s)).as("hs"))
    val viaKernel = fixture.select(col("id"), ShingleHashes(col("text"), 2).as("hs"))
    assert(sortedRows(viaKernel) == sortedRows(viaStrings))
  }

  test("trigram shingles also match the string pipeline") {
    val viaStrings = fixture.select(col("id"),
      transform(TextFunctions.shingles(col("text"), 3), s => xxhash64(s)).as("hs"))
    val viaKernel = fixture.select(col("id"), ShingleHashes(col("text"), 3).as("hs"))
    assert(sortedRows(viaKernel) == sortedRows(viaStrings))
  }

  test("null text yields null, not a crash") {
    val d = df("SELECT CAST(NULL AS STRING) AS text")
      .select(ShingleHashes(col("text"), 2).as("hs"))
    assert(d.collect().head.isNullAt(0))
  }

  test("generated code compiles (no interpreter fallback)") {
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // spark.range source: VALUES fixtures constant-fold to LocalTableScan
      val src = spark.range(500).select(
        concat_ws(" ", lit("tok"), col("id"), lit("tok"), col("id") % 7).as("text"))
      val n = src.select(explode(ShingleHashes(col("text"), 2)).as("h"))
        .groupBy("h").count().count()
      assert(n > 0)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", prevMode.getOrElse("FALLBACK"))
      spark.conf.set("spark.sql.codegen.fallback", prevFb.getOrElse("true"))
    }
  }

  test("char-window hashes: doc-frequency profile identical to raw-text windows") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val raw = docs.select(explode(array_distinct(transform(
        sequence(lit(1), greatest(length(col("text")) - 39, lit(1))),
        i => col("text").substr(i, lit(40))))).as("win"))
      .groupBy("win").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
    val hashed = graft.operators.Dedup.dupSubstringsHashed(
      docs, "doc_id", "text", width = 40, minDocs = 2)
    // same number of duplicated windows and the same doc-frequency
    // multiset — any hash collision would merge rows and break both
    def profile(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("n_docs").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(profile(hashed) == profile(raw))
    // per-doc distinct window counts agree (collision inside one doc
    // would shrink the hashed count)
    val perDoc = docs.select(
      size(graft.plans.CharWindowHashes(col("text"), 40)).as("h"),
      size(array_distinct(transform(
        sequence(lit(1), greatest(length(col("text")) - 39, lit(1))),
        i => col("text").substr(i, lit(40))))).as("r"))
    assert(perDoc.filter(col("h") =!= col("r")).count() == 0)
    // short text clamps to one whole-text window in both forms
    val s = spark; import s.implicits._
    val short = Seq((1L, "tiny"), (2L, "tiny")).toDF("doc_id", "text")
    val sh = graft.operators.Dedup.dupSubstringsHashed(short, "doc_id", "text", 40, 2)
    assert(sh.count() == 1 && sh.head.getLong(1) == 2L)
  }

  test("LSH bucket cap skips degenerate buckets, keeps normal recall") {
    val s = spark; import s.implicits._
    // 60 identical boilerplate docs (one degenerate bucket per band) plus
    // one genuine near-dup pair of distinct docs
    val boiler = (0 until 60).map(i => (i.toLong, "lorem ipsum dolor sit amet boilerplate"))
    val pair = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "alpha beta gamma delta epsilon eta"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")
    val capped = graft.operators.Dedup.minhashLshPairs(
      docs, "doc_id", "text", n = 2, k = 32, bands = 8, threshold = 0.3,
      maxBucketSize = 10)
    val got = rows(capped.select("doc_a", "doc_b"))
    // degenerate bucket (60 members > cap) contributes no pairs;
    // the genuine pair still collides in its own small bucket
    assert(got == Set(Seq(100L, 101L)))
    // uncapped finds the boilerplate clique too (sanity that the cap
    // is what removed it)
    val uncapped = graft.operators.Dedup.minhashLshPairs(
      docs, "doc_id", "text", n = 2, k = 32, bands = 8, threshold = 0.3)
    assert(rows(uncapped.select("doc_a", "doc_b")).size == 60 * 59 / 2 + 1)
  }
}
