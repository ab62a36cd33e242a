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
    }
    spark.stop()
  }
}
