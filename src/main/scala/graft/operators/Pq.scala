package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Product-quantization ANN (IVF-PQ's compression half): split each
  * vector into `m` contiguous subspaces, Lloyd-train a small codebook
  * per subspace (reusing [[Ivf.trainCentroids]]'s deterministic
  * DECIMAL-sum k-means), encode every corpus vector as `m` codes, and
  * answer queries by asymmetric distance computation (ADC): a per-query
  * distance table of m×k exact subspace distances, so scoring a
  * candidate is m table lookups instead of a dims-wide float dot.
  * An ADC shortlist is then re-ranked with exact cosine.
  *
  * Scale notes (the reason PQ exists at 100 TB): a 64-dim float vector
  * is 256 bytes; its 8-subspace code is 8 small ints — a ~32× smaller
  * scan, small enough to keep entire shards in executor memory. Encoding
  * is one narrow projection (plans.PqEncode — fused loop, codebook via
  * addReferenceObj so codegen is O(1) in m×k×subDim); the ADC scan
  * broadcasts the (bounded) query side and shuffles only the shortlist;
  * the exact re-rank touches shortlist×queries rows of the full-width
  * corpus. Codebooks are trained on the full input here — at corpus
  * scale train on a deterministic sample (PQ codebooks converge on ~1e5
  * vectors) by pre-filtering the training input, e.g.
  * `vectors.orderBy(xxhash64(id), id).limit(n)`; encoding is unaffected.
  *
  * Determinism: seeded sample init + exact-decimal Lloyd means identical
  * codebooks on any partitioning; PqEncode ties break to the lowest
  * code; ADC/re-rank windows break ties on neighbor id.
  */
object Pq {

  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Per-subspace codebooks, (subspace)(codeword 0..k-1)(component).
    * Codeword order is the sorted Lloyd cell id — stable and
    * partitioning-independent, so codes are reproducible.
    */
  def trainCodebooks(vectors: DataFrame, idCol: String, vecCol: String,
                     m: Int, k: Int, iters: Int,
                     seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    val dims = vectors.select(size(col(vecCol))).head().getInt(0)
    require(dims % m == 0, s"dims=$dims not divisible by m=$m")
    val subDim = dims / m
    (0 until m).map { s =>
      val sub = vectors.select(col(idCol),
        slice(col(vecCol), s * subDim + 1, subDim).as(vecCol))
      Ivf.trainCentroids(sub, idCol, vecCol, k, iters, seed)
        .collect()
        .sortBy(_.getAs[Number]("cell_id").longValue)
        .map(_.getSeq[Number](1).map(_.doubleValue).toSeq)
        .toSeq
    }
  }

  /** (id, codes array<long>) — one fused-kernel projection, no shuffle. */
  def encode(vectors: DataFrame, idCol: String, vecCol: String,
             books: Seq[Seq[Seq[Double]]]): DataFrame =
    vectors.select(col(idCol),
      graft.plans.PqEncode(col(vecCol), books).as("codes"))

  /** Top-k neighbours per query by PQ-ADC shortlist + exact cosine
    * re-rank. Queries: (query_id, q_vec). Output: (query_id,
    * neighbor_id, cos).
    */
  def search(vectors: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, m: Int, k: Int, iters: Int, shortlist: Int,
             topK: Int, seed: Long = 42L): DataFrame = {
    val books = trainCodebooks(vectors, idCol, vecCol, m, k, iters, seed)
    val subDim = books.head.head.length
    val codes = encode(vectors, idCol, vecCol, books)
    // per-query ADC table: dtable[s][c] = ||q_sub(s) - codeword(s,c)||².
    // The codebook is a literal here (one codegen per search call — this
    // side is the bounded broadcast query set, not the corpus scan).
    val dtable = array((0 until m).map { s =>
      val qsub = slice(col("q_vec"), s * subDim + 1, subDim)
      transform(typedlit(books(s)), cw => dist2(qsub, cw))
    }: _*)
    val qdt = queries.select(col("query_id"), col("q_vec"),
      dtable.as("dtable"))
    // ADC scan: m lookups per (candidate, query) pair over the narrow
    // codes projection — the full-width corpus is never in this join
    val adc = aggregate(
      zip_with(col("codes"), col("dtable"),
        (c, t) => element_at(t, (c + 1).cast("int"))),
      lit(0.0), (acc, v) => acc + v)
    val ws = Window.partitionBy("query_id").orderBy(col("adc"), col(idCol))
    val short = codes.crossJoin(broadcast(qdt))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("adc", adc)
      .withColumn("__r", row_number().over(ws)).filter(col("__r") <= shortlist)
      .select(col("query_id"), col("q_vec"), col(idCol))
    // exact re-rank of the shortlist only
    val wk = Window.partitionBy("query_id").orderBy(col("cos").desc, col(idCol))
    short.join(vectors.select(col(idCol), col(vecCol)), idCol)
      .withColumn("cos", Similarity.cosine(col("q_vec"), col(vecCol)))
      .withColumn("__rk", row_number().over(wk)).filter(col("__rk") <= topK)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cos"))
  }
}
