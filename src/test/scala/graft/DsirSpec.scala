package graft

import org.apache.spark.sql.functions._

/** Pins t38's DSIR importance-weight chain on a hand corpus: target-like
  * documents must outscore off-target ones, and degenerate docs (0/1
  * token, null text) surface with weight 0 instead of vanishing.
  */
class DsirSpec extends SparkSpec {

  private def weights(docs: org.apache.spark.sql.DataFrame) = {
    val bigrams = graft.functions.TextFunctions.bind1(
      split(col("text"), " ")) { w =>
      when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => concat(element_at(w, i), lit("_"), element_at(w, i + 1))))
        .otherwise(array().cast("array<string>"))
    }
    val tb = docs.select(col("doc_id"), col("lang"), explode(bigrams).as("g"))
      .select(col("doc_id"), col("lang"), substring(md5(col("g")), 1, 3).as("bucket"))
    val db = tb.groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
    val bs = tb.groupBy("bucket").agg(
      count(when(col("lang") === "en", 1)).as("ct"), count(lit(1)).as("cr"))
    val tot = bs.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    val term = bs.crossJoin(broadcast(tot)).select(col("bucket"),
      round(log((col("ct") + 0.5) / (col("nt") + 2048.0))
        - log((col("cr") + 0.5) / (col("nr") + 2048.0)), 6)
        .cast("decimal(18,6)").as("term"))
    val ws = db.join(broadcast(term), "bucket")
      .groupBy("doc_id").agg(sum(col("cnt") * col("term")).as("wsum"))
    docs.select(col("doc_id")).join(ws, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("wsum"), lit(0)).cast("double").as("weight"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("target-phrased doc outscores off-target doc; degenerate docs get 0") {
    val docs = df(
      """SELECT CAST(id AS BIGINT) AS doc_id, lang, text FROM VALUES
        |  (1, 'en', 'the quick brown fox jumps over the lazy dog'),
        |  (2, 'en', 'the quick brown fox runs through the green field'),
        |  (3, 'de', 'der schnelle braune fuchs springt ueber den faulen hund'),
        |  (4, 'de', 'the quick brown fox jumps over the lazy dog'),
        |  (5, 'de', 'zzz'),
        |  (6, 'de', CAST(NULL AS STRING)) v(id, lang, text)""".stripMargin)
    val w = weights(docs)
    // the weight is a RANKING signal: doc 4 shares every bigram with
    // the target slice, doc 3 shares none — 4 must outrank 3 (absolute
    // sign is smoothing-dependent on small corpora: the +0.5/bucket
    // mass dwarfs tiny counts, and cr >= ct always, so tiny-corpus
    // weights skew negative — the t38 cut at 0 only bites at scale)
    assert(w(4L) > w(3L),
      s"target-phrased ${w(4L)} must outrank off-target ${w(3L)}")
    assert(Seq(1L, 2L, 4L).map(w).min > w(3L),
      "every target-phrased doc outranks the off-target one")
    // degenerate docs: no bigrams, weight exactly 0, still present
    assert(w(5L) == 0.0 && w(6L) == 0.0)
    assert(w.size == 6)
  }
}
