package graft

import org.apache.spark.sql.functions._
import graft.functions.{Similarity, TextFunctions}

class SimilaritySpec extends SparkSpec {

  test("dot/cosine: strict fold matches hand computation") {
    val d = df("SELECT array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS a, " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS b")
    val r = d.select(
      Similarity.dot(col("a"), col("b")).as("dp"),
      Similarity.cosine(col("a"), col("a")).as("self")).head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("simhash locality: near-identical docs close, unrelated docs far") {
    val d = df(
      """SELECT * FROM VALUES
        |  (1, 'the quick brown fox jumps over the lazy dog again and again today'),
        |  (2, 'the quick brown fox jumps over the lazy cat again and again today'),
        |  (3, 'completely different words about spark shuffles partitions executors memory')
        |  t(id, text)""".stripMargin)
    val h = d.select(col("id"),
      Similarity.simhash64(TextFunctions.tokens(col("text"))).as("sh"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1), h(2)) < ham(h(1), h(3)),
      s"near-dup hamming ${ham(h(1), h(2))} should be < unrelated ${ham(h(1), h(3))}")
    assert(ham(h(1), h(2)) <= 12)
  }

  test("simhash agg variant equals the scalar variant") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val scalarH = docs.select(col("doc_id"),
      Similarity.simhash64(TextFunctions.tokens(col("text"))).as("simhash"))
    val aggH = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("doc_id").agg(Similarity.simhashVoteAggs(col("tok")).head,
        Similarity.simhashVoteAggs(col("tok")).tail: _*)
      .select(col("doc_id"), Similarity.packSimhashVotes.as("simhash"))
    assert(rows(scalarH) == rows(aggH))
  }

  test("simhash is deterministic across partitionings") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = docs.repartition(1).select(col("doc_id"),
      Similarity.simhash64(TextFunctions.tokens(col("text"))).as("sh"))
    val b = docs.repartition(7).select(col("doc_id"),
      Similarity.simhash64(TextFunctions.tokens(col("text"))).as("sh"))
    assert(rows(a) == rows(b))
  }

  test("minhash LSH finds all exact near-dup pairs at sf0.001 (recall = 1)") {
    val d = "/root/testdata/sf0.001"
    // exact pairs with jaccard >= 0.3 over word bigrams (brute force)
    val docs = graft.core.Tables.documents(spark, d)
    val sh = docs.select(col("doc_id"), explode(TextFunctions.shingles(col("text"), 2)).as("s"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val exact = sh.toDF("a", "s").join(sh.toDF("b", "s2"),
        col("s") === col("s2") && col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("i"))
      .join(sizes.toDF("a", "na"), "a").join(sizes.toDF("b", "nb"), "b")
      .withColumn("jac", col("i") * lit(1.0) / (col("na") + col("nb") - col("i")))
      .filter(col("jac") >= 0.3)
      .select("a", "b")
    val exactPairs = rows(exact)
    // LSH query output
    val lsh = SparkEntryHelper.run("s03_minhash_lsh_neardup", spark, d)
    val lshPairs = rows(lsh.select("doc_a", "doc_b"))
    assert(exactPairs.nonEmpty, "fixture should contain at least one near-dup pair")
    assert(exactPairs.subsetOf(lshPairs),
      s"LSH missed pairs: ${exactPairs -- lshPairs}")
    // verification step guarantees no false positives above threshold
    assert(lshPairs.subsetOf(exactPairs))
  }

  test("hyperplane LSH ANN achieves high recall on clustered vectors") {
    import scala.util.Random
    val rnd = new Random(42)
    val dims = 16
    // 10 well-separated centroids, 30 points each, tight noise
    val data = (0 until 300).map { i =>
      val c = i % 10
      val centroid = Array.tabulate(dims)(j =>
        if (j % 10 == c % 10 || j % 7 == c % 7) 1.0f else -1.0f)
      (i.toLong, centroid.map(v => v + (rnd.nextFloat() - 0.5f) * 0.2f).toSeq)
    }
    val e = spark.createDataFrame(data).toDF("vec_id", "embedding")
    // brute-force top-3 per query
    val q = e.filter(col("vec_id") < 10).toDF("query_id", "q_emb")
    val cos = Similarity.cosine(col("q_emb"), col("embedding"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    val exact = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("query_id", "neighbor_id")
    // LSH: same pipeline as s05 but on the synthetic set
    val (tables, bits) = (6, 6)
    val bucketed = e.select(col("vec_id"), col("embedding"),
        posexplode(Similarity.hyperplaneBuckets(col("embedding"), tables, bits, dims))
          .as(Seq("t", "b")))
      .select("vec_id", "embedding", "t", "b")
    val ql = bucketed.filter(col("vec_id") < 10).toDF("query_id", "q_emb", "t", "b")
    val cand = bucketed.join(broadcast(ql), Seq("t", "b"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q_emb"), col("vec_id").as("neighbor_id"), col("embedding"))
      .distinct()
    val approx = cand.withColumn("cos", Similarity.cosine(col("q_emb"), col("embedding")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("query_id", "neighbor_id")
    val exactSet = rows(exact)
    val recall = exactSet.intersect(rows(approx)).size.toDouble / exactSet.size
    assert(recall >= 0.8, s"ANN recall $recall below 0.8")

    // IVF on the same clustered set: probing a third of 12 cells
    val ivfQ = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val ivf = graft.operators.Ivf.search(e, ivfQ, "vec_id", "embedding",
      nCells = 12, nProbe = 4, k = 3)
    val ivfRecall = exactSet.intersect(rows(ivf.select("query_id", "neighbor_id"))).size.toDouble /
      exactSet.size
    assert(ivfRecall >= 0.6, s"IVF recall $ivfRecall below 0.6")
    // determinism across partitionings
    val ivf2 = graft.operators.Ivf.search(e.repartition(7), ivfQ, "vec_id", "embedding", 12, 4, 3)
    assert(rows(ivf.select("query_id", "neighbor_id")) ==
      rows(ivf2.select("query_id", "neighbor_id")))

    // Lloyd training: decimal-summed means make refined centroids exactly
    // partitioning-independent, and refinement must not lose the cluster
    // structure (inertia non-increasing, recall at least as good)
    def inertia(cents: org.apache.spark.sql.DataFrame): Double = {
      val d2 = org.apache.spark.sql.functions.aggregate(
        zip_with(col("embedding"), col("c_vec"),
          (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
      e.crossJoin(broadcast(cents)).groupBy("vec_id").agg(min(d2).as("d2"))
        .agg(sum("d2")).head.getDouble(0)
    }
    val sampled = graft.operators.Ivf.centroids(e, "vec_id", "embedding", 12, 42L)
    val trained = graft.operators.Ivf.trainCentroids(e, "vec_id", "embedding", 12, 3, 42L)
    assert(inertia(trained) <= inertia(sampled),
      "Lloyd refinement must not increase inertia")
    val trained2 = graft.operators.Ivf.trainCentroids(
      e.repartition(7), "vec_id", "embedding", 12, 3, 42L)
    assert(trained.orderBy("cell_id").collect().map(_.getSeq[Float](1)).toSeq ==
      trained2.orderBy("cell_id").collect().map(_.getSeq[Float](1)).toSeq,
      "trained centroids must be bit-identical under repartitioning")
    val ivfT = graft.operators.Ivf.search(e, ivfQ, "vec_id", "embedding",
      nCells = 12, nProbe = 4, k = 3, trainIters = 3)
    val trainedRecall = exactSet.intersect(
      rows(ivfT.select("query_id", "neighbor_id"))).size.toDouble / exactSet.size
    assert(trainedRecall >= ivfRecall,
      s"trained IVF recall $trainedRecall worse than sampled $ivfRecall")
  }

  test("embedding LSH near-dup: near-total recall on clustered vectors, no false positives") {
    import scala.util.Random
    val rnd = new Random(7)
    val dims = 16
    val data = (0 until 300).map { i =>
      val c = i % 10
      val centroid = Array.tabulate(dims)(j =>
        if (j % 10 == c % 10 || j % 7 == c % 7) 1.0f else -1.0f)
      (i.toLong, centroid.map(v => v + (rnd.nextFloat() - 0.5f) * 0.2f).toSeq)
    }
    val e = spark.createDataFrame(data).toDF("vec_id", "embedding")
    // exact near-dup pairs at cos >= 0.8 (intra-cluster pairs)
    val b = e.toDF("vec_b", "emb_b")
    val exact = e.join(broadcast(b), col("vec_id") < col("vec_b"))
      .withColumn("cos", Similarity.cosine(col("embedding"), col("emb_b")))
      .filter(col("cos") >= 0.8)
      .select(col("vec_id").as("vec_a"), col("vec_b"))
    val exactSet = rows(exact)
    assert(exactSet.nonEmpty)
    val lsh = graft.operators.Dedup.embeddingNearDupLsh(e, "vec_id", "embedding",
      tables = 12, bits = 6, dims = dims, threshold = 0.8, maxBucketSize = 500)
    val lshSet = rows(lsh.select("vec_a", "vec_b"))
    // exact-cosine verification ⇒ every returned pair is a true pair
    assert(lshSet.subsetOf(exactSet), s"false positives: ${lshSet -- exactSet}")
    val recall = lshSet.intersect(exactSet).size.toDouble / exactSet.size
    assert(recall >= 0.95, s"embedding near-dup recall $recall below 0.95")
    // deterministic across partitionings
    val lsh2 = graft.operators.Dedup.embeddingNearDupLsh(e.repartition(7),
      "vec_id", "embedding", 12, 6, dims, 0.8, 500)
    assert(rows(lsh2.select("vec_a", "vec_b")) == lshSet)
  }

  test("embedding LSH near-dup: oversized buckets are capped out") {
    // 100 identical vectors all land in the same bucket in every table;
    // a cap below the bucket size suppresses the quadratic pair-off
    val e = spark.range(100).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 15), j -> CAST(1.0 AS FLOAT))").as("embedding"))
    val capped = graft.operators.Dedup.embeddingNearDupLsh(e, "vec_id", "embedding",
      tables = 4, bits = 4, dims = 16, threshold = 0.9, maxBucketSize = 50)
    assert(capped.count() == 0L)
    val uncapped = graft.operators.Dedup.embeddingNearDupLsh(e, "vec_id", "embedding",
      tables = 4, bits = 4, dims = 16, threshold = 0.9, maxBucketSize = 0)
    assert(uncapped.count() == 100L * 99 / 2)
  }

  test("s41 hard negatives: label always differs, exactly the top-3 mismatched cosines") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntryHelper.run("s41_hard_negatives", spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val vecs = graft.core.Tables.embeddings(spark, d).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.get(2))).toSeq
    val byId = vecs.map(v => v._1 -> v).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.length == 3, s"query $qid must emit 3 negatives")
      val (_, qv, qlab) = byId(qid)
      rows.foreach { case (_, nid, _) =>
        assert(byId(nid)._3 != qlab, s"neighbor $nid shares label $qlab")
      }
      // the driver-side best mismatched cosine must be the row's rank-1
      val best = vecs.filter(_._3 != qlab)
        .map(v => (cos(qv, v._2), v._1)).sortBy(p => (-p._1, p._2)).head
      val top = rows.maxBy(_._3)
      assert(top._2 == best._2 && math.abs(top._3 - best._1) < 1e-9,
        s"query $qid top negative ${top._2} vs recompute ${best._2}")
    }
  }
}

/** Test access to SparkEntry query functions by name. */
object SparkEntryHelper {
  def run(name: String, s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SparkEntry.queries(name)(s, d)
}
