package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** Benchmark decontamination for training corpora: flag corpus documents
  * that share word n-gram shingles with a (small) held-out benchmark set,
  * so they can be dropped before training.
  *
  * Scale notes: the benchmark side is eval-set sized (thousands of docs,
  * not billions), so its distinct shingle set is collected into a
  * broadcast hash join — the corpus side is one narrow scan + explode
  * with NO shuffle before the per-doc aggregation, and that aggregation
  * is map-side combinable. At 100 TB the corpus never materializes its
  * shingles to an exchange; only matching (doc, shingle) rows reach the
  * groupBy.
  */
object Decontaminate {

  /** Corpus docs sharing >= `minOverlap` distinct word n-gram shingles
    * with ANY benchmark doc: (idCol, n_overlap). Shingles are carried as
    * 64-bit hashes end-to-end (plans.ShingleHashes: one fused byte scan,
    * distinct per doc, no string shingles materialized), so the broadcast
    * set and the join keys are longs — a false overlap needs an xxhash64
    * collision between two distinct shingles of one (doc, bench) pair,
    * ~2^-64. The per-doc count after the join IS the distinct-overlap
    * count because both sides emit distinct shingles.
    */
  def benchmarkOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
                       textCol: String, n: Int, minOverlap: Int): DataFrame = {
    val corpusShingles = corpus.select(col(idCol),
      explode(graft.plans.ShingleHashes(col(textCol), n)).as("__s"))
    val benchShingles = bench
      .select(explode(graft.plans.ShingleHashes(col(textCol), n)).as("__s"))
      .distinct()
    corpusShingles.join(broadcast(benchShingles), "__s")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Same contract as [[benchmarkOverlap]] for when the benchmark's
    * shingle set is too large to hash-join against every exploded corpus
    * shingle comfortably: a Bloom filter over the benchmark shingle
    * hashes (a few MB at any benchmark size) prefilters the corpus
    * EXPLODE map-side, so only probable matches reach the exchange; the
    * exact join after it removes the false positives, keeping the result
    * bit-identical to the exact operator. Bloom filters have no false
    * negatives, so no overlap can be lost.
    *
    * The membership probe is Spark's own codegen'd
    * `BloomFilterMightContain` over a literal sketch (the same expression
    * the runtime bloom-join optimization injects) — no UDF in the hot
    * path. The verify join is deliberately NOT broadcast: the point of
    * this variant is that it stays correct when the bench side outgrows
    * the broadcast threshold; locally AQE may still pick broadcast, at
    * scale it degrades to a shuffle join over the tiny prefiltered slice.
    */
  def benchmarkOverlapBloom(corpus: DataFrame, bench: DataFrame, idCol: String,
                            textCol: String, n: Int, minOverlap: Int,
                            expectedShingles: Long = 1L << 20,
                            fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val benchShingles = bench
      .select(explode(graft.plans.ShingleHashes(col(textCol), n)).as("__s"))
      .distinct()
    val bf = benchShingles.stat.bloomFilter("__s", expectedShingles, fpp)
    val bytes = { // sketch-sized (ln(1/fpp)·n/ln²2 bits), never data-sized
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val mightContain = GraftShims.column(BloomFilterMightContain(
      Literal.create(bytes, org.apache.spark.sql.types.BinaryType),
      GraftShims.expression(col("__s"))))
    val candidates = corpus
      .select(col(idCol), explode(graft.plans.ShingleHashes(col(textCol), n)).as("__s"))
      .filter(mightContain)
    candidates.join(benchShingles.hint("SHUFFLE_HASH"), "__s")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** Graded contamination: for EVERY corpus doc with at least one
    * shingle, the fraction of its distinct shingles found in the
    * benchmark set — (id, n_shingles, n_overlap, score). The binary
    * operators above threshold-and-drop; reporting pipelines want the
    * distribution. Same broadcast shape; clean docs survive the left
    * join with overlap 0. The per-doc denominator is the SIZE of the
    * fused distinct-shingle array — no second aggregation over the
    * corpus.
    */
  def contaminationScore(corpus: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, n: Int): DataFrame = {
    val benchShingles = bench
      .select(explode(graft.plans.ShingleHashes(col(textCol), n)).as("__s"))
      .distinct()
    val withSh = corpus.select(col(idCol),
        graft.plans.ShingleHashes(col(textCol), n).as("__shs"))
      .filter(size(col("__shs")) > 0)
    val overlap = withSh
      .select(col(idCol), explode(col("__shs")).as("__s"))
      .join(broadcast(benchShingles), "__s")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    withSh.select(col(idCol), size(col("__shs")).cast("long").as("n_shingles"))
      .join(overlap, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) * lit(1.0) / col("n_shingles"))
          .as("score"))
  }
}
