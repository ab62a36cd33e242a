package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C4-style duplicate-span removal (Raffel et al. 2020 §2.2): discard
  * all but one occurrence of any span repeated across the corpus and
  * reconstruct the surviving text. The unit is a fixed `w`-token block
  * (the reference corpus's "sentence"); a span is 3 consecutive blocks;
  * the keeper is the first occurrence by (doc_id, block index). Removal
  * is greedy like the original implementation: a kept span can still
  * lose blocks to a DIFFERENT duplicated span overlapping it.
  *
  * Scale shape: block construction is a per-row HOF (no token-level
  * shuffle); spans are two lead()s on a doc-partitioned window; the
  * keeper pick shuffles one 16-byte md5 key per span; only duplicate
  * occurrences explode into removal rows; one anti-join + one ordered
  * per-doc re-aggregation. All shuffles are keyed by doc_id or span
  * hash — linear in corpus size, no all-pairs stage.
  */
object SpanDedup {

  /** docs: (doc_id, text) -> (doc_id, clean_text, n_removed). */
  def rewrite(docs: DataFrame, w: Int = 10): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val nUnits = ceil(size(col("t")) / (w * 1.0)).cast("long")
    val units = toks
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0L), nUnits - 1),
          u => array_join(slice(col("t"), (u * w + 1).cast("int"), lit(w)), " ")))
        .as(Seq("u", "ut")))
    val byDoc = Window.partitionBy("doc_id").orderBy("u")
    // concat null-propagates past the doc tail: the last two blocks of
    // every doc yield a NULL key and are filtered, on both engines
    val spans = units.withColumn("k",
      md5(concat(col("ut"), lit("\u0001"),
        lead(col("ut"), 1).over(byDoc), lit("\u0001"),
        lead(col("ut"), 2).over(byDoc))))
    val occ = spans.filter(col("k").isNotNull)
      .withColumn("rn",
        row_number().over(Window.partitionBy("k").orderBy("doc_id", "u")))
    val rem = occ.filter(col("rn") > 1)
      .select(col("doc_id"),
        explode(array(col("u"), col("u") + 1, col("u") + 2)).as("u"))
      .distinct()
    val keep = units.join(rem, Seq("doc_id", "u"), "left_anti")
    val agg = keep.groupBy("doc_id").agg(
      array_join(transform(array_sort(collect_list(struct(col("u"), col("ut")))),
        x => x.getField("ut")), " ").as("clean_text"),
      count(lit(1)).as("n_kept"))
    toks.select(col("doc_id"), nUnits.as("n_units"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("n_units") - coalesce(col("n_kept"), lit(0L))).cast("long")
          .as("n_removed"))
  }
}
