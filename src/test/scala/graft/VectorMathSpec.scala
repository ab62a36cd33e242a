package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.plans.DotProduct

/** plans.DotProduct must be a drop-in for the aggregate(zip_with) fold:
  * bit-identical doubles, identical null propagation, and it must
  * actually compile under whole-stage codegen (no interpreter fallback).
  */
class VectorMathSpec extends SparkSpec {

  private def vecs = {
    // deterministic float vectors incl. negatives and magnitude spread
    val v = (i: String) =>
      s"""transform(sequence(0, 63), j ->
          |  CAST(sin($i * 131 + j) * (1 + j % 7) AS FLOAT))""".stripMargin
    df(s"""SELECT id, ${v("id")} AS a, ${v("(id + 17)")} AS b
          |FROM range(200) t(id)""".stripMargin)
  }

  test("bit-identical to the higher-order fold on float vectors") {
    val out = vecs.select(
      DotProduct(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("fold"))
    val mismatch = out.filter(
      col("native") =!= col("fold") ||
        col("native").isNull =!= col("fold").isNull).count()
    assert(mismatch == 0)
  }

  test("null propagation: null array, null element, length mismatch") {
    val d = df("""SELECT CAST(NULL AS ARRAY<FLOAT>) AS nil,
                 |       array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)) AS ab,
                 |       array(CAST(1 AS FLOAT), NULL) AS withNull,
                 |       array(CAST(3 AS FLOAT)) AS short""".stripMargin)
    val r = d.select(
      DotProduct(col("nil"), col("ab")),
      DotProduct(col("ab"), col("withNull")),
      DotProduct(col("ab"), col("short")),
      DotProduct(col("ab"), col("ab"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    assert(r.getDouble(3) == 5.0)
    // matches the fold's behavior on the same inputs
    val f = d.select(
      Similarity.dotHof(col("nil"), col("ab")),
      Similarity.dotHof(col("ab"), col("withNull")),
      Similarity.dotHof(col("ab"), col("short"))).head()
    assert(f.isNullAt(0) && f.isNullAt(1) && f.isNullAt(2))
  }

  test("empty arrays dot to 0.0 like the fold") {
    val r = df("SELECT CAST(array() AS ARRAY<FLOAT>) AS e")
      .select(DotProduct(col("e"), col("e")),
              Similarity.dotHof(col("e"), col("e"))).head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }

  test("hyperplane buckets: native expression bit-identical to the HOF fold") {
    val dims = 64
    val v = """transform(sequence(0, 63), j ->
              |  CAST(sin(id * 131 + j) * (1 + j % 7) AS FLOAT))""".stripMargin
    val d = df(s"SELECT id, $v AS vec FROM range(300) t(id)")
    val out = d.select(col("id"),
      Similarity.hyperplaneBuckets(col("vec"), 6, 10, dims).as("native"),
      Similarity.hyperplaneBucketsHof(col("vec"), 6, 10, dims).as("hof"))
    assert(out.filter(col("native") =!= col("hof")).count() == 0)
    // short vector: every bit unset in both formulations
    val short = df("SELECT array(CAST(1 AS FLOAT)) AS vec").select(
      Similarity.hyperplaneBuckets(col("vec"), 2, 4, dims).as("native"),
      Similarity.hyperplaneBucketsHof(col("vec"), 2, 4, dims).as("hof")).head()
    assert(short.getSeq[Long](0) == Seq(0L, 0L))
    assert(short.getSeq[Long](0) == short.getSeq[Long](1))
  }

  test("nearest cell: native argmin bit-identical to the HOF formulation") {
    val cents: Seq[Seq[Double]] = (0 until 12).map(c =>
      (0 until 64).map(j => math.sin(c * 997 + j) * 3))
    val ids = (0 until 12).map(c => (c * 10 + 1).toLong)
    val native = vecs.select(col("id"),
      graft.plans.NearestCell(col("a"), ids, cents).as("cell"))
    val hof = graft.operators.Ivf.assignMatHof(
      vecs.select(col("id"), col("a")), "id", "a", ids, cents)
      .select(col("id"), col("cell_id"))
    assert(native.join(hof, "id")
      .filter(col("cell") =!= col("cell_id") ||
        col("cell").isNull =!= col("cell_id").isNull).count() == 0)
    // duplicate centroid forces an exact distance tie → first id wins
    val tied = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0), Seq(5.0, 5.0))
    val t = df("SELECT array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)) AS v")
      .select(graft.plans.NearestCell(col("v"), Seq(7L, 8L, 9L), tied)).head()
    assert(t.getLong(0) == 7L)
    // wrong length / null element / null vector → null id (HOF parity)
    val edge = df("""SELECT array(CAST(1 AS FLOAT)) AS short,
                    |       array(CAST(1 AS FLOAT), NULL) AS withNull,
                    |       CAST(NULL AS ARRAY<FLOAT>) AS nil""".stripMargin)
      .select(graft.plans.NearestCell(col("short"), Seq(7L), tied.take(1).map(_.take(2))),
        graft.plans.NearestCell(col("withNull"), Seq(7L), tied.take(1)),
        graft.plans.NearestCell(col("nil"), Seq(7L), tied.take(1))).head()
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
  }

  test("generated code compiles (no silent interpreter fallback)") {
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = vecs.select(DotProduct(col("a"), col("b")).as("d"))
        .filter(col("d").isNotNull).count()
      assert(n == 200L)
      val nb = vecs.select(
          Similarity.hyperplaneBuckets(col("a"), 4, 8, 64).as("bk"))
        .filter(size(col("bk")) === 4).count()
      assert(nb == 200L)
      val cents = (0 until 4).map(c => (0 until 64).map(j => c * 1.0 + j))
      val nc = vecs.select(
          graft.plans.NearestCell(col("a"), Seq(1L, 2L, 3L, 4L), cents).as("c"))
        .filter(col("c").isNotNull).count()
      assert(nc == 200L)
    } finally {
      prevMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("sq8: codes stay in [-127, 127] and reconstruct within scale/2 per element") {
    val q = vecs
      .withColumn("sc", Similarity.sq8Scale(col("a")))
      .withColumn("qv", Similarity.sq8Quantize(col("a"), col("sc")))
    assert(q.filter(exists(col("qv"), c => abs(c) > 127)).count() == 0)
    val badRecon = q.filter(exists(
      zip_with(col("a"), col("qv"), (x, c) => abs(x.cast("double") - c * col("sc"))),
      e => e > col("sc") * 0.5 + lit(1e-12))).count()
    assert(badRecon == 0, "floor(x/sc + .5) quantization error must be <= sc/2")
  }

  test("sq8: intDot is exact integer math and the scaled dot tracks the float dot") {
    val q = vecs
      .withColumn("sa", Similarity.sq8Scale(col("a")))
      .withColumn("sb", Similarity.sq8Scale(col("b")))
      .withColumn("qa", Similarity.sq8Quantize(col("a"), col("sa")))
      .withColumn("qb", Similarity.sq8Quantize(col("b"), col("sb")))
      .select(
        ((col("sa") * col("sb")) *
          Similarity.intDot(col("qa"), col("qb")).cast("double")).as("qdot"),
        Similarity.dot(col("a"), col("b")).as("fdot"),
        (col("sa") * col("sb")).as("ss"))
      .collect()
    // elementwise error <= sa/2 * sb/2 terms: |qdot - fdot| is bounded by
    // sum |x||eb| + |y||ea| <= 64 * (127.5*sa*sb/2 * 2) — use a loose
    // empirical bound that still catches a broken scale or fold
    q.foreach { r =>
      val (qd, fd, ss) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(qd - fd) <= 64 * 130 * ss,
        s"quantized dot $qd too far from float dot $fd (ss=$ss)")
    }
    assert(q.length == 200)
  }

  test("sq8: top-5 by quantized score has high overlap with float top-5") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("sc", Similarity.sq8Scale(col("embedding")))
      .withColumn("qv", Similarity.sq8Quantize(col("embedding"), col("sc")))
      .withColumn("nrm", Similarity.l2norm(col("embedding")))
      .localCheckpoint()
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"),
      col("sc").as("qsc"), col("qv").as("qqv"),
      col("embedding").as("qe"), col("nrm").as("qn"))
    val joined = e.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        ((col("qsc") * col("sc")) *
          Similarity.intDot(col("qqv"), col("qv")).cast("double")).as("qs"),
        Similarity.dot(col("qe"), col("embedding")).as("fs"))
      .localCheckpoint()
    import org.apache.spark.sql.expressions.Window
    def top(scoreCol: String) = joined.withColumn("rn",
        row_number().over(Window.partitionBy("qid")
          .orderBy(col(scoreCol).desc, col("nid"))))
      .filter(col("rn") <= 5).select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (top("qs") & top("fs")).size
    assert(overlap >= 40, s"SQ8 top-5 overlap $overlap/50 below the 0.8 recall floor")
  }
}
