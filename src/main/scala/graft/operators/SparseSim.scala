package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sparse TF-IDF cosine similarity via an inverted-index join — the
  * no-dense-vectors document-similarity path: weights live as (doc,
  * term, w) triples, the pair dot products come from joining the
  * posting lists term by term, and terms above a document-frequency
  * cutoff are dropped (their IDF ≈ 0 contribution never justifies the
  * df² join rows they'd generate — the standard stop-term guard that
  * keeps the join subquadratic).
  *
  * Cross-engine determinism: IDF is ln(N/df) scaled by 1000 and rounded
  * to a LONG (the t18 trick — libm lns differ in the last ulp, integers
  * after rounding do not), so weights, squared norms, and dots are all
  * exact integer arithmetic well under 2^53; the only floating point is
  * the final sqrt/divide, which IEEE defines exactly.
  *
  * Terms are word bigrams (TextFunctions.adjacentPairs, counted not
  * distinct — tf is a real term frequency).
  */
object SparseSim {

  /** All pairs with tf-idf cosine ≥ minCos among docs: (doc_a, doc_b,
    * cos). `maxDf` drops terms appearing in more documents than that.
    */
  def tfidfCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                       maxDf: Long, minCos: Double): DataFrame = {
    val n = docs.count()
    val tf = docs.select(col(idCol),
        explode(TextFunctions.adjacentPairs(col(textCol))).as("__t"))
      .groupBy(idCol, "__t").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("__t").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("__t"),
        round(log(lit(n.toDouble) / col("df")) * 1000).cast("long").as("idf"))
    val w = tf.join(idf, "__t")
      .select(col(idCol), col("__t"), (col("tf") * col("idf")).as("w"))
    val norms = w.groupBy(idCol).agg(sum(col("w") * col("w")).as("n2"))
    val dots = w.select(col(idCol).as("doc_a"), col("__t"), col("w").as("wa"))
      .join(w.select(col(idCol).as("doc_b"), col("__t"), col("w").as("wb")),
        Seq("__t"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(sum(col("wa") * col("wb")).as("dot"))
    val cos = col("dot").cast("double") /
      (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double")))
    dots
      .join(norms.toDF("doc_a", "na2"), "doc_a")
      .join(norms.toDF("doc_b", "nb2"), "doc_b")
      .select(col("doc_a"), col("doc_b"), cos.as("cos"))
      .filter(col("cos") >= minCos)
  }
}
