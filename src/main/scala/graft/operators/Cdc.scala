package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold a change feed (upserts + deletes)
  * onto a base snapshot, producing the post-feed snapshot.
  *
  * The merge-with-deletes companion to Scd2.merge (which keeps history;
  * this produces CURRENT state — the Delta/Hudi "merge into" shape).
  * Plan: the feed compacts to its latest change per key with ONE hash
  * aggregate (`max_by` over the order key — no window sort, map-side
  * combinable), then one full-outer join against the base. Both sides
  * shuffle on the key; at 100 TB the base is the big side and the
  * compacted feed is |changed keys|, so AQE broadcasts it when small.
  */
object Cdc {

  /** Apply `changes` to `base`.
    *
    * `changes` columns = keyCols ++ (opCol: 'U' upsert / 'D' delete)
    * ++ ordCol (a totally-ordered change sequence key, unique per key)
    * ++ payload columns, which must match `base`'s non-key columns by
    * name. The LATEST change per key wins: 'D' drops the key, 'U'
    * replaces the payload (inserting if the key is absent from base).
    * Untouched base rows pass through. Output adds `cdc_src`
    * ('base' | 'upsert').
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   opCol: String, ordCol: String): DataFrame = {
    val payload = changes.columns.toSeq
      .filterNot(c => keyCols.contains(c) || c == opCol || c == ordCol)
    require(payload.forall(base.columns.contains),
      s"change payload ${payload.mkString(",")} must exist in base")
    val latest = changes
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct((opCol +: payload).map(col): _*),
        col(ordCol)).as("_ch"))
      .select(keyCols.map(col) ++
        Seq(col(s"_ch.$opCol").as("_op")) ++
        payload.map(p => col(s"_ch.$p").as(s"_new_$p")): _*)
    val merged = base.join(latest, keyCols, "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
    val outCols: Seq[Column] =
      keyCols.map(col) ++
      payload.map(p =>
        when(col("_op") === "U", col(s"_new_$p")).otherwise(col(p)).as(p)) :+
      when(col("_op").isNull, lit("base")).otherwise(lit("upsert")).as("cdc_src")
    merged.select(outCols: _*)
  }

  /** Snapshot-to-snapshot diff: classify every key across two versions
    * of a table as added / removed / changed / unchanged — the audit
    * companion to applyChanges (what DID that feed do?) and the
    * time-travel "diff two versions" primitive. Output: keyCols,
    * `status`, and both payloads as `_old_<col>` / `_new_<col>`.
    *
    * Payload equality is null-safe per column (`<=>`), presence is
    * tracked with marker flags (a key whose payload is entirely NULL is
    * still present). One full-outer join, both sides shuffled on the
    * key — the canonical distributed shape; at 100 TB both sides scan
    * once and co-partition.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    val payload = oldSnap.columns.toSeq.filterNot(keyCols.contains)
    require(newSnap.columns.sorted.sameElements(oldSnap.columns.sorted),
      "snapshots must share a schema")
    val o = oldSnap.select(keyCols.map(col) ++
      payload.map(p => col(p).as(s"_old_$p")) :+ lit(true).as("_in_old"): _*)
    val n = newSnap.select(keyCols.map(col) ++
      payload.map(p => col(p).as(s"_new_$p")) :+ lit(true).as("_in_new"): _*)
    val same = payload.map(p => col(s"_old_$p") <=> col(s"_new_$p"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, keyCols, "full_outer")
      .withColumn("status",
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("changed"))
      .drop("_in_old", "_in_new")
  }

  /** Per-key append-only ledger hash chain: h_1 = md5("g:" + p_1),
    * h_i = md5(h_(i-1) + ":" + p_i) over the key's rows in
    * (orderCols) order — the tamper-evidence primitive for audit
    * ledgers (any insert, delete, reorder, or edit anywhere in a key's
    * history changes its chain head). A TRUE recurrence (each hash
    * consumes the previous), so it rides the secondary-sort scan with
    * one 32-char string of state per key; the oracle replays it as a
    * recursive CTE with DuckDB's md5. Adds a `chain` column per row;
    * callers usually keep only the head (max by order).
    *
    * The payload must be NON-NULL on every row: a SQL oracle's `||`
    * concatenation propagates NULL and nullifies the whole chain, while
    * any in-engine string encoding of NULL ("null", "", a sentinel)
    * silently diverges from it — so instead of picking an encoding the
    * operator rejects NULL payloads with a descriptive error. Callers
    * with nullable payloads choose their own encoding explicitly
    * (coalesce to a sentinel) BEFORE chaining, where the oracle can
    * replay it.
    */
  def hashChain(df: DataFrame, keyCol: String, orderCols: Seq[String],
                payloadCol: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val pIdx = df.schema.fieldIndex(payloadCol)
    def md5hex(s: String): String = graft.core.Digest.md5hex(s)
    def payload(row: org.apache.spark.sql.Row): String = {
      require(!row.isNullAt(pIdx),
        s"hashChain: NULL payload in '$payloadCol' — a null has no " +
          "cross-engine hash encoding; coalesce to an explicit sentinel " +
          "before chaining")
      String.valueOf(row.get(pIdx))
    }
    Sessionize.scanPerKey[String](df, Seq(keyCol), orderCols,
      StructType(Seq(StructField("chain", StringType, nullable = false)))) {
      case (None, row) =>
        val h = md5hex("g:" + payload(row))
        (h, Seq(h))
      case (Some(prev), row) =>
        val h = md5hex(prev + ":" + payload(row))
        (h, Seq(h))
    }
  }
}
