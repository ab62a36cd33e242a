package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.Similarity
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local("32", "recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables.embeddings(spark, d)
      val c = e.select(col("vec_id"), col("embedding"),
        Similarity.l2norm(col("embedding")).as("c_norm"))
      val qn = c.filter(col("vec_id") < 10).select(
        col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("c_norm").as("q_norm"))
      val cos = Similarity.dot(col("q_emb"), col("embedding")) /
        (col("q_norm") * col("c_norm"))
      def exactK(k: Int) = c.crossJoin(broadcast(qn))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
        .filter(col("rn") <= k).select("query_id", "neighbor_id")
      def recall(name: String, k: Int): Unit = {
        val ann = SparkEntry.queries(name)(spark, d)
          .select("query_id", "neighbor_id").dropDuplicates("query_id", "neighbor_id")
        val hits = exactK(k).join(ann, Seq("query_id", "neighbor_id")).count()
        val nq = qn.count()
        println(f"[recall] $d $name ${hits.toDouble / (k * nq)}%.3f")
      }
      recall("s05_ann_lsh", 3); recall("s06_ann_ivf", 3)
      recall("s09_ann_ivf_trained", 3); recall("s11_ann_pq", 5)
      recall("s14_ann_ivfpq", 5)
      // pair families
      val tb1 = graft.operators.Dedup.exactJaccardPairsFrom(
        Tables.documents(spark, d), "doc_id", "text", 2, 0.9, _ % 5 === 0)
        .select(col("doc_a"), col("doc_b"))
      val f1 = SparkEntry.queries("s03_minhash_lsh_neardup")(spark, d)
        .select("doc_a", "doc_b").dropDuplicates()
      val n1 = tb1.count(); val h1 = tb1.join(f1, Seq("doc_a", "doc_b")).count()
      println(f"[recall] $d s03_pairs ${h1.toDouble / n1}%.3f (n=$n1)")
      val b = c.select(col("vec_id").as("vb"), col("embedding").as("b_emb"), col("c_norm").as("b_nrm"))
      val cos2 = Similarity.dot(col("embedding"), col("b_emb")) / (col("c_norm") * col("b_nrm"))
      val tb2 = c.join(broadcast(b), col("vec_id") < col("vb")).filter(cos2 >= 0.35)
        .select(col("vec_id").as("vec_a"), col("vb").as("vec_b"))
      val f2 = SparkEntry.queries("s07_embedding_neardup_lsh")(spark, d)
        .select("vec_a", "vec_b").dropDuplicates()
      val n2 = tb2.count(); val h2 = tb2.join(f2, Seq("vec_a", "vec_b")).count()
      println(f"[recall] $d s07_pairs ${h2.toDouble / n2}%.3f (n=$n2)")
      // s47: radius-search directed-pair recall at cos >= 0.35
      val qr = c.filter(col("vec_id") % 50 === 0).select(
        col("vec_id").as("qa"), col("embedding").as("q_emb"), col("c_norm").as("q_nrm"))
      val cos3 = Similarity.dot(col("q_emb"), col("embedding")) /
        (col("q_nrm") * col("c_norm"))
      val tb3 = c.crossJoin(broadcast(qr))
        .filter(col("qa") =!= col("vec_id") && cos3 >= 0.35)
        .select(col("qa").as("query_id"), col("vec_id").as("match_id"))
      val f3 = SparkEntry.queries("s44_radius_search")(spark, d)
        .select("query_id", "match_id").dropDuplicates()
      val n3 = tb3.count(); val h3 = tb3.join(f3, Seq("query_id", "match_id")).count()
      println(f"[recall] $d s44_radius ${h3.toDouble / n3}%.3f (n=$n3)")
      // s48: MMR relevance retention vs exact top-5 (min over queries)
      val e105 = e.filter(col("vec_id") < 105).select(col("vec_id"), col("embedding"),
        Similarity.l2norm(col("embedding")).as("nrm"))
      val q5 = e105.filter(col("vec_id") < 5).select(col("vec_id").as("qid"),
        col("embedding").as("q_emb"), col("nrm").as("q_norm"))
      val c5 = e105.filter(col("vec_id") >= 5).select(col("vec_id").as("cid"),
        col("embedding").as("c_emb"), col("nrm").as("cn"))
      val rel = c5.crossJoin(broadcast(q5)).select(col("qid"), col("cid"),
        (Similarity.dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("cn"))).as("rel"))
      val top5 = rel.withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("rel").desc, col("cid"))))
        .filter(col("rn") <= 5).groupBy("qid").agg(sum("rel").as("exact_rel"))
      val picked = SparkEntry.queries("s42_mmr_rerank")(spark, d)
        .select("qid", "cid").join(rel, Seq("qid", "cid"))
        .groupBy("qid").agg(sum("rel").as("pick_rel"))
      val minRet = top5.join(picked, Seq("qid"))
        .select(min(col("pick_rel") / col("exact_rel"))).head().getDouble(0)
      println(f"[recall] $d s42_mmr_retention_min $minRet%.3f")
    }
    spark.stop()
  }
}
