package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-curation operators that decide WHAT a training run reads:
  * per-domain quality curriculum filtering (CCNet/RefinedWeb practice:
  * quality thresholds are set per source, not globally — a p75 doc on a
  * low-quality domain and a p75 doc on a high-quality domain both make
  * the cut, preserving domain diversity while dropping each domain's
  * worst tail) and corpus-frequency boilerplate coverage (the Gopher
  * repetition family at corpus granularity: a doc whose n-grams are
  * mostly corpus-frequent is boilerplate even if nothing repeats
  * WITHIN the doc — the within-doc rules are t15/t25's job).
  *
  * Scale shapes: the percentile filter aggregates per DOMAIN (bounded
  * by the crawl's registrable-domain count, ~10^7 worst case — a
  * shuffle of small rows, then a broadcast back), never sorts the
  * corpus; the coverage operator's frequent-gram list is the df > K
  * tail of the gram distribution, which K makes broadcast-small. At
  * 100 TB swap the exact percentile for percentile_approx (a25's
  * pattern) — the two-pass plan is unchanged.
  */
object Curriculum {

  /** Integer quality score: tokens + 3*stopword hits - punctuation chars.
    * Integer so per-domain percentile interpolation is the ONLY float
    * step — reproducible on any engine (the a18 percentile contract).
    */
  def integerQualityScore(text: Column, stopwords: Seq[String]): Column =
    (TextFunctions.tokenCount(text)
      + lit(3L) * size(filter(TextFunctions.tokens(text),
          t => t.isin(stopwords.map(lit): _*)))
      - length(regexp_replace(text, "[A-Za-z0-9 ]", ""))).cast("long")

  /** Keep docs scoring at or above their domain's p-th percentile.
    * Input must carry (idCol, domainCol, scoreCol); output adds the
    * domain threshold and the keep flag for every row (the reporting
    * form — a drop filter is `.filter(col("kept"))`).
    *
    * Plan: one hash aggregate keyed by domain (percentile buffers are
    * per-domain, never a global sort) + a broadcast join of the
    * #domains-row threshold table back onto the corpus — the corpus
    * itself shuffles once (the aggregate's exchange) and scans twice.
    */
  def domainPercentileKeep(scored: DataFrame, idCol: String,
                           domainCol: String, scoreCol: String,
                           p: Double): DataFrame = {
    val thr = scored.groupBy(domainCol)
      .agg(expr(s"percentile($scoreCol, $p)").as("p_thr"))
    // null-safe keep: a row with no score is NOT kept (three-valued
    // `null >= thr` would leak a null flag into downstream filters)
    scored.join(broadcast(thr), Seq(domainCol))
      .select(col(idCol), col(domainCol), col(scoreCol), col("p_thr"),
        coalesce(col(scoreCol).cast("double") >= col("p_thr"), lit(false))
          .as("kept"))
  }

  /** Per-doc fraction of distinct n-grams that are corpus-frequent
    * (document frequency > minDf). Docs with fewer than n tokens have
    * no grams and no output row. Output: (idCol, n_grams, n_freq,
    * coverage: double).
    *
    * Two aggregates over the exploded gram rows: df per gram (map-side
    * combinable), then per-doc counting after marking frequent grams.
    * The frequent list is the df distribution's tail — small by
    * construction (boilerplate is concentrated); the left join lets
    * AQE broadcast it when it is.
    */
  def dupNgramCoverage(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, minDf: Long): DataFrame = {
    val sh = docs.select(col(idCol),
      explode(TextFunctions.shingles(col(textCol), n)).as("__s"))
    val freq = sh.groupBy("__s").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > minDf)
      .select(col("__s"), lit(1).as("__f"))
    sh.join(freq, Seq("__s"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), count(col("__f")).as("n_freq"))
      .select(col(idCol), col("n_grams"), col("n_freq"),
        (col("n_freq").cast("double") / col("n_grams").cast("double"))
          .as("coverage"))
  }
}
