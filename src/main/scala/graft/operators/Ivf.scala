package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** IVF (inverted-file) approximate nearest neighbour: partition vectors
  * into cells around seeded sample centroids, probe only the nProbe
  * nearest cells per query, re-rank candidates exactly.
  *
  * Centroids are a seeded deterministic sample (xxhash64 order), not
  * Lloyd-refined: refinement's floating-point averages depend on
  * aggregation order, which would break the engine's partition-
  * independence contract; sample centroids keep recall adequate and
  * results bit-stable.
  *
  * Scale notes: cell assignment is a broadcast of the centroid table +
  * two hash aggregates (no sort, no window over the big side); the probe
  * join touches only candidate cells — with C cells and balanced
  * assignment, candidate volume is ~ nProbe/C of the corpus per query.
  */
object Ivf {

  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Seeded sample centroids: (cell_id, c_vec). */
  def centroids(vectors: DataFrame, idCol: String, vecCol: String,
                nCells: Int, seed: Long): DataFrame =
    vectors.orderBy(xxhash64(col(idCol), lit(seed)), col(idCol)).limit(nCells)
      .select(col(idCol).as("cell_id"), col(vecCol).as("c_vec"))

  /** Assign every vector to its nearest cell. The centroid set is tiny
    * by construction, so it ships as ONE literal matrix and the argmin
    * happens in a single narrow projection — no join, no shuffle, no
    * second pass; ties break to the first (lowest-index) centroid.
    */
  def assign(vectors: DataFrame, cents: DataFrame, idCol: String,
             vecCol: String): DataFrame = {
    val collected = cents.collect()
    val ids = collected.map(_.getAs[Number]("cell_id").longValue)
    val mat: Seq[Seq[Double]] = collected.map(
      _.getSeq[Number](1).map(_.doubleValue).toSeq).toSeq
    val cdists = transform(typedlit(mat), c => dist2(col(vecCol), c))
    vectors.select(col(idCol), col(vecCol),
      element_at(typedlit(ids.toSeq),
        array_position(cdists, array_min(cdists)).cast("int")).as("cell_id"))
  }

  /** Top-k neighbours for each query vector, probing nProbe cells.
    * Queries: (query_id, q_vec). Output: (query_id, neighbor_id, cos).
    */
  def search(vectors: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, nCells: Int, nProbe: Int, k: Int,
             seed: Long = 42L): DataFrame = {
    val cents = centroids(vectors, idCol, vecCol, nCells, seed)
    val assigned = assign(vectors, cents, idCol, vecCol)
    // probe cells per query: queries × centroids is tiny — window is fine
    val wq = Window.partitionBy("query_id").orderBy(col("__d"), col("cell_id"))
    val probes = queries.crossJoin(broadcast(cents))
      .withColumn("__d", dist2(col("q_vec"), col("c_vec")))
      .withColumn("__r", row_number().over(wq)).filter(col("__r") <= nProbe)
      .select("query_id", "q_vec", "cell_id")
    val cand = probes.join(assigned, "cell_id")
      .filter(col("query_id") =!= col(idCol))
    val wk = Window.partitionBy("query_id").orderBy(col("cos").desc, col(idCol))
    cand
      .withColumn("cos", Similarity.cosine(col("q_vec"), col(vecCol)))
      .withColumn("__rk", row_number().over(wk)).filter(col("__rk") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cos"))
  }
}
