package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.operators.Pq
import graft.plans.{NearestCell, PqEncode}

/** Product-quantization contracts: the fused PqEncode kernel must match
  * the per-subspace slice+NearestCell composition exactly; codebooks and
  * search results must be partitioning-independent; ADC shortlist +
  * exact re-rank must recover the exact top-k on clustered vectors.
  */
class PqSpec extends SparkSpec {

  private val dims = 16
  private def clustered(n: Int) = {
    import scala.util.Random
    val rnd = new Random(7)
    val data = (0 until n).map { i =>
      val c = i % 10
      val centroid = Array.tabulate(dims)(j =>
        if (j % 10 == c % 10 || j % 7 == c % 7) 1.0f else -1.0f)
      (i.toLong, centroid.map(v => v + (rnd.nextFloat() - 0.5f) * 0.2f).toSeq)
    }
    spark.createDataFrame(data).toDF("vec_id", "embedding")
  }

  private def books2x4 = Seq(
    Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(-1.0, 1.0), Seq(2.0, -2.0)),
    Seq(Seq(0.5, 0.5), Seq(-0.5, -0.5), Seq(3.0, 0.0), Seq(0.0, 3.0)))

  test("PqEncode matches the slice+NearestCell composition per subspace") {
    val e = clustered(120).select(col("vec_id"),
      slice(col("embedding"), 1, 4).as("v")) // 4 dims -> m=2, subDim=2
    val books = books2x4
    val composed = e.select(col("vec_id"),
      array((0 until 2).map(s =>
        NearestCell(slice(col("v"), s * 2 + 1, 2),
          ids = Seq(0L, 1L, 2L, 3L), mat = books(s))): _*).as("codes"))
    val fused = e.select(col("vec_id"), PqEncode(col("v"), books).as("codes"))
    assert(rows(composed) == rows(fused))
  }

  test("PqEncode null propagation: length mismatch and null element") {
    val d = df("""SELECT array(CAST(1 AS FLOAT), CAST(2 AS FLOAT),
                 |             CAST(3 AS FLOAT)) AS short,
                 |       array(CAST(1 AS FLOAT), NULL, CAST(3 AS FLOAT),
                 |             CAST(4 AS FLOAT)) AS withNull,
                 |       CAST(NULL AS ARRAY<FLOAT>) AS nil""".stripMargin)
    val r = d.select(PqEncode(col("short"), books2x4),
      PqEncode(col("withNull"), books2x4),
      PqEncode(col("nil"), books2x4)).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("PqEncode all-NaN vector returns null, not code -1") {
    // NaN < best is always false, so no subspace argmin exists — the
    // kernel must null-propagate like NearestCell, or downstream ADC
    // would element_at(dtable, 0) and error under ANSI
    val r = df("""SELECT array(CAST('NaN' AS FLOAT), CAST('NaN' AS FLOAT),
                 |             CAST('NaN' AS FLOAT), CAST('NaN' AS FLOAT)) AS v""".stripMargin)
      .select(PqEncode(col("v"), books2x4)).head()
    assert(r.isNullAt(0))
  }

  test("PqEncode ties break to the lowest code, like NearestCell") {
    // both codewords of subspace 0 equidistant from (0,0): code must be 0
    val books = Seq(
      Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0)),
      Seq(Seq(0.0, 0.0), Seq(9.0, 9.0)))
    val r = df("""SELECT array(CAST(0 AS FLOAT), CAST(0 AS FLOAT),
                 |             CAST(0 AS FLOAT), CAST(0 AS FLOAT)) AS v""".stripMargin)
      .select(PqEncode(col("v"), books)).head().getSeq[Long](0)
    assert(r == Seq(0L, 0L))
  }

  test("PqEncode generated code compiles (CODEGEN_ONLY)") {
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val e = clustered(50)
      val books = Pq.trainCodebooks(e, "vec_id", "embedding", m = 4, k = 4,
        iters = 1)
      val n = e.select(PqEncode(col("embedding"), books).as("c"))
        .filter(size(col("c")) === 4).count()
      assert(n == 50)
    } finally {
      prevMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("fused one-scan training is bit-identical to the per-subspace form") {
    val e = clustered(300)
    val fused = Pq.trainCodebooks(e, "vec_id", "embedding", m = 4, k = 8,
      iters = 2)
    val ref = Pq.trainCodebooksPerSubspace(e, "vec_id", "embedding", m = 4,
      k = 8, iters = 2)
    assert(fused == ref)
  }

  test("codebooks are partitioning-independent") {
    val e = clustered(300)
    val b1 = Pq.trainCodebooks(e, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val b2 = Pq.trainCodebooks(e.repartition(7), "vec_id", "embedding",
      m = 4, k = 8, iters = 2)
    assert(b1 == b2)
  }

  test("ADC shortlist + exact re-rank recovers exact top-3 on clustered vectors") {
    val e = clustered(300)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    // exact baseline
    val qe = e.filter(col("vec_id") < 10).toDF("query_id", "q_emb")
    val cos = Similarity.cosine(col("q_emb"), col("embedding"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    val exact = e.crossJoin(broadcast(qe)).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("query_id", "neighbor_id")
    val exactSet = rows(exact)
    val pq = Pq.search(e, q, "vec_id", "embedding", m = 4, k = 8, iters = 2,
      shortlist = 30, topK = 3)
    val recall = exactSet.intersect(rows(pq.select("query_id", "neighbor_id")))
      .size.toDouble / exactSet.size
    assert(recall >= 0.8, s"PQ recall $recall below 0.8")
    // determinism across partitionings
    val pq2 = Pq.search(e.repartition(5), q, "vec_id", "embedding",
      m = 4, k = 8, iters = 2, shortlist = 30, topK = 3)
    assert(rows(pq.select("query_id", "neighbor_id")) ==
      rows(pq2.select("query_id", "neighbor_id")))
  }

  test("residual IVF-PQ: high recall while probing a third of the cells") {
    val e = clustered(300)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
    val qe = e.filter(col("vec_id") < 10).toDF("query_id", "q_emb")
    val cos = Similarity.cosine(col("q_emb"), col("embedding"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    val exact = e.crossJoin(broadcast(qe)).filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("query_id", "neighbor_id")
    val exactSet = rows(exact)
    val ivfpq = Pq.searchIvf(e, q, "vec_id", "embedding", nCells = 12,
      nProbe = 4, m = 4, k = 8, itersCoarse = 2, itersPq = 2,
      shortlist = 30, topK = 3)
    val recall = exactSet
      .intersect(rows(ivfpq.select("query_id", "neighbor_id")))
      .size.toDouble / exactSet.size
    assert(recall >= 0.7, s"IVF-PQ recall $recall below 0.7")
    val ivfpq2 = Pq.searchIvf(e.repartition(5), q, "vec_id", "embedding",
      nCells = 12, nProbe = 4, m = 4, k = 8, itersCoarse = 2, itersPq = 2,
      shortlist = 30, topK = 3)
    assert(rows(ivfpq.select("query_id", "neighbor_id")) ==
      rows(ivfpq2.select("query_id", "neighbor_id")))
  }
}
