package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Pins the s30 norm-augmentation reduction: augmented-cosine ranking is
  * exactly inner-product ranking (Bachrach et al.), including on vectors
  * whose norms differ wildly — the case plain cosine gets WRONG, which is
  * the whole reason MIPS needs the transform.
  */
class MipsSpec extends SparkSpec {

  // tie-free by construction: the last component injects a distinct
  // id-dependent fraction, so no two DISTINCT vectors share an exact
  // inner product against any query (an exact tie is the one case where
  // augmented and raw orderings may legitimately break differently —
  // float noise separates what the tie-break column would have ordered)
  private def fixture = df(
    """SELECT CAST(id AS BIGINT) AS vec_id,
      |  array(CAST((id * 37 % 19) - 9 AS FLOAT),
      |        CAST((id * 53 % 23) - 11 AS FLOAT),
      |        CAST((id * 71 % 17) - 8 AS FLOAT),
      |        CAST((id % 7) + 1 + id / 1024.0 AS FLOAT)) AS embedding
      |FROM range(0, 120)""".stripMargin)

  test("augmented-cosine top-5 equals brute-force inner-product top-5") {
    val e = fixture
    val withNorm = e.select(col("vec_id"), col("embedding"),
      Similarity.l2norm(col("embedding")).as("nrm"))
    val m = withNorm.agg(max(col("nrm")).as("m"))
    val aug = withNorm.crossJoin(broadcast(m)).select(
      col("vec_id"), col("embedding"),
      concat(
        transform(col("embedding"), x => x.cast("double") / col("m")),
        array(sqrt(greatest(lit(0.0),
          lit(1.0) - (col("nrm") / col("m")) * (col("nrm") / col("m"))))))
        .as("aug"))
    val q = withNorm.filter(col("vec_id") < 5).select(
      col("vec_id").as("query_id"),
      concat(transform(col("embedding"), x => x.cast("double") / col("nrm")),
        array(lit(0.0))).as("q_aug"),
      col("embedding").as("q_emb"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")

    def top5(scoreCol: org.apache.spark.sql.Column,
        joined: org.apache.spark.sql.DataFrame): Map[(Long, Long), Int] =
      joined.filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), scoreCol.as("sc"))
        .withColumn("rn", row_number().over(
          w.orderBy(col("sc").desc, col("neighbor_id"))))
        .filter(col("rn") <= 5)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap

    val viaAug = top5(Similarity.dot(col("q_aug"), col("aug")), aug.crossJoin(broadcast(q)))
    val viaIp  = top5(Similarity.dot(col("q_emb"), col("embedding")),
      withNorm.crossJoin(broadcast(q)))
    assert(viaAug == viaIp)
  }

  test("MIPS ranking differs from plain cosine when norms vary (why augment)") {
    // doubled copy of a vector has identical cosine to everything but
    // double the inner product — IP must prefer it, cosine cannot
    val e = df("""SELECT CAST(id AS BIGINT) AS vec_id,
                 |  CASE WHEN id = 1 THEN array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))
                 |       WHEN id = 2 THEN array(CAST(2.0 AS FLOAT), CAST(0.0 AS FLOAT))
                 |       ELSE array(CAST(0.9 AS FLOAT), CAST(0.1 AS FLOAT)) END AS embedding
                 |FROM range(0, 3)""".stripMargin)
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val scored = e.filter(col("vec_id") > 0).crossJoin(broadcast(q))
      .select(col("vec_id"),
        Similarity.dot(col("q_emb"), col("embedding")).as("ip"),
        Similarity.cosine(col("q_emb"), col("embedding")).as("cos"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(scored(2L)._1 > scored(1L)._1)            // IP prefers the doubled vector
    assert(math.abs(scored(2L)._2 - scored(1L)._2) < 1e-12) // cosine is blind to it
  }
}
