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
}
