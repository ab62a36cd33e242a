package graft

import org.apache.spark.sql.functions._
import graft.plans.GreedyPieceEncode

class GreedyPieceEncodeSpec extends SparkSpec {

  private val vocab = Seq("wind", "ow", "dow", "cust", "omer", "st", "re", "am")

  /** Naive reference: per word, scan all vocab pieces at each cursor and
    * take the longest match (>= 2), else one char. */
  private def reference(text: String): String =
    text.split(" ", -1).map { w =>
      val sb = new StringBuilder
      var i = 0
      while (i < w.length) {
        val m = vocab.filter(p => w.regionMatches(i, p, 0, p.length))
          .map(_.length).sorted.lastOption.getOrElse(1)
        if (sb.nonEmpty) sb.append('|')
        sb.append(w.substring(i, i + m))
        i += m
      }
      sb.toString
    }.mkString(" ")

  test("matches the naive longest-match reference") {
    val inputs = Seq(
      "window stream customer",
      "windowdow",          // greedy chains: wind|ow|dow
      "w wi win windo",     // partial prefixes fall back per char
      "ststst",             // repeated 2-piece
      "x", "", "a b", "restream")
    val out = spark.createDataFrame(
        spark.sparkContext.parallelize(inputs.map(Tuple1(_))))
      .toDF("text")
      .select(col("text"), GreedyPieceEncode(col("text"), vocab).as("enc"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    inputs.foreach { t =>
      assert(out(t) == reference(t), s"input '$t'")
    }
  }

  test("null in, null out; non-ASCII falls back one character at a time") {
    val out = df("SELECT * FROM VALUES (CAST(NULL AS STRING)), ('é½wind') t(text)")
      .select(GreedyPieceEncode(col("text"), vocab).as("enc"))
      .collect().map(r => Option(r.getString(0))).toSet
    assert(out == Set(None, Some("é|½|wind")))
  }

  test("greedy prefers the longest piece, not the first or shortest") {
    // at 'w': "wind" (4) beats nothing shorter; at 'o' after wind: "ow"
    // wins over 1-char; "dow" then matches where "ow" alone would
    // misalign — a first-match or shortest-match bug changes the split
    val out = df("SELECT 'windowdow' AS text")
      .select(GreedyPieceEncode(col("text"), vocab).as("enc"))
      .head().getString(0)
    assert(out == "wind|ow|dow")
  }

  test("participates in whole-stage codegen and compiles under CODEGEN_ONLY") {
    val src = spark.range(100).select(
      concat(lit("window stream x"), col("id").cast("string")).as("text"))
    val q = src.select(GreedyPieceEncode(col("text"), vocab).as("enc"))
      .filter(length(col("enc")) > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("greedy_piece_encode") && !plan.contains("CodegenFallback"),
      s"expected codegen participation:\n$plan")
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      spark.conf.set("spark.sql.codegen.fallback", "false")
      assert(q.count() == 100)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
  }
}
