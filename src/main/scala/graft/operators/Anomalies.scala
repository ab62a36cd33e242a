package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Anomaly-detection operators from SURVEY.md §2.4 (A11, A12, A15) and the
  * consolidation/history sinks (R6, R7, S6) of
  * pipeline-cleaning/R/05.run_anomaly_detection.R.
  *
  * Every detector emits the uniform anomaly schema
  * (resolution_id, key, form_id, anomalies_id, anomalies_description,
  * resolution_status) — FIXTURES.md §8.
  *
  * Scale notes: both detectors are single shuffle-on-group-keys passes;
  * descriptions are built with codegen'd string expressions, not UDFs.
  */
object Anomalies {

  val schemaColumns: Seq[String] = Seq(
    "resolution_id", "key", "form_id", "anomalies_id",
    "anomalies_description", "resolution_status")

  private def uniform(formId: String, anomaliesId: String, key: Column,
                      description: Column): Seq[Column] = Seq(
    concat_ws("__", lit(formId), key, lit(anomaliesId)).as("resolution_id"),
    key.cast("string").as("key"),
    lit(formId).as("form_id"),
    lit(anomaliesId).as("anomalies_id"),
    description.as("anomalies_description"),
    lit("to_do").as("resolution_status"))

  /** A11 (duplicate detector): groups of `keys` with >= threshold rows.
    * Emits one anomaly per group with the sorted list of member ids.
    * Ref: anomalies_utils.R:2-25.
    */
  def detectDuplication(df: DataFrame, formId: String, anomaliesId: String,
                        keys: Seq[String], memberId: String,
                        threshold: Long = 2L): DataFrame = {
    val groupKey = concat_ws("|", keys.map(k => col(k).cast("string")): _*)
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"),
           concat_ws(",", array_sort(collect_list(col(memberId).cast("string")))).as("__members"))
      .filter(col("__n") >= threshold)
      .select(uniform(formId, anomaliesId, groupKey,
        concat(lit(s"$anomaliesId: "), col("__n").cast("string"),
               lit(" rows for key, ids="), col("__members"))): _*)
  }

  /** A12 (threshold detector): rows where `valueCol` exceeds (or falls
    * below) a threshold. Ref: anomalies_utils.R:28-55.
    */
  def detectThreshold(df: DataFrame, formId: String, anomaliesId: String,
                      keyCol: String, valueCol: Column, threshold: Double,
                      above: Boolean = true): DataFrame = {
    val hit = if (above) valueCol > threshold else valueCol < threshold
    df.filter(hit).select(uniform(formId, anomaliesId, col(keyCol),
      concat(lit(s"$anomaliesId: value="), valueCol.cast("string"),
             lit(s" vs threshold=$threshold"))): _*)
  }

  /** Distinct-values mismatch: groups of `keys` carrying MORE THAN ONE
    * distinct `valueCol` (the reference's "household reports multiple
    * clusters": safety.R:108-116, pk.R:111-132). One shuffle on the
    * group keys; the value list is sorted for determinism.
    */
  def detectDistinctMismatch(df: DataFrame, formId: String,
                             anomaliesId: String, keys: Seq[String],
                             valueCol: String): DataFrame = {
    val groupKey = concat_ws("|", keys.map(k => col(k).cast("string")): _*)
    df.groupBy(keys.map(col): _*)
      .agg(countDistinct(col(valueCol)).as("__n"),
           concat_ws(",", array_sort(collect_set(col(valueCol).cast("string"))))
             .as("__vals"))
      .filter(col("__n") > 1)
      .select(uniform(formId, anomaliesId, groupKey,
        concat(lit(s"$anomaliesId: "), col("__n").cast("string"),
               lit(" distinct values, values="), col("__vals"))): _*)
  }

  /** Conditional member count: groups where the number of DISTINCT
    * `memberCol` values satisfying `cond` exceeds `threshold` (the
    * reference's "more than 3 members died/migrated/absent":
    * safety.R:167-204). when(cond, member) nulls the non-matching rows
    * and both count_distinct and collect_set ignore nulls — one shuffle,
    * no pre-filter subquery.
    */
  def detectConditionalCount(df: DataFrame, formId: String,
                             anomaliesId: String, keys: Seq[String],
                             cond: Column, memberCol: String,
                             threshold: Long): DataFrame = {
    val groupKey = concat_ws("|", keys.map(k => col(k).cast("string")): _*)
    val member = when(cond, col(memberCol))
    df.groupBy(keys.map(col): _*)
      .agg(countDistinct(member).as("__n"),
           concat_ws(",", array_sort(collect_set(member.cast("string"))))
             .as("__ids"))
      .filter(col("__n") > threshold)
      .select(uniform(formId, anomaliesId, groupKey,
        concat(lit(s"$anomaliesId: "), col("__n").cast("string"),
               lit(" members, ids="), col("__ids"))): _*)
  }

  /** Invalid/missing code: rows whose `codeCol` is null or sits in the
    * hard-coded invalid list (the reference's "outside cluster by geo":
    * safety.R:212-219). Pure per-row projection, no shuffle.
    */
  def detectInvalidCode(df: DataFrame, formId: String, anomaliesId: String,
                        keyCol: String, codeCol: Column,
                        invalid: Seq[Any]): DataFrame =
    df.filter(codeCol.isNull || codeCol.isin(invalid: _*))
      .select(uniform(formId, anomaliesId, col(keyCol),
        concat(lit(s"$anomaliesId: code="),
               coalesce(codeCol.cast("string"), lit("NA")))): _*)

  /** Mapping mismatch vs a source-of-truth table: rows of `df` whose
    * `valueCol` disagrees with the truth mapping idCol -> expected (the
    * reference's "pk_id mapped to different extids": pk.R:170-186,
    * where the truth mapping is derived from the day-0 form). `truth`
    * must carry (idCol, expected). Shuffle join on idCol — when truth
    * derives from df itself both sides arrive co-partitioned; broadcast
    * applies when truth is dim-sized.
    */
  def detectMappingMismatch(df: DataFrame, formId: String,
                            anomaliesId: String, keyCol: Column,
                            idCol: String, valueCol: String,
                            truth: DataFrame): DataFrame =
    df.join(truth, idCol)
      .filter(col(valueCol) =!= col("expected"))
      .select(uniform(formId, anomaliesId, keyCol,
        concat(lit(s"$anomaliesId: $idCol="), col(idCol).cast("string"),
               lit(" got="), col(valueCol).cast("string"),
               lit(" expected="), col("expected").cast("string"))): _*)

  /** Repeat-group cardinality vs parent-declared count: the parent form
    * declares how many repeat rows should exist (`declaredCol`); the
    * actual repeat-group row count disagrees (the reference's
    * parent↔repeat_individual merge shape: safety.R:80-81 join +
    * per-household member counting, safety.R:106-130). One shuffle:
    * counts aggregate on the child fk, then join the parent on its key
    * (co-partitioned when the fk IS the parent key); missing repeat
    * groups count as 0.
    */
  def detectRepeatCountMismatch(parent: DataFrame, formId: String,
                                anomaliesId: String, parentKey: String,
                                declaredCol: Column, repeats: DataFrame,
                                fkCol: String): DataFrame = {
    val counts = repeats.groupBy(col(fkCol).as(parentKey))
      .agg(count(lit(1)).as("__actual"))
    parent.join(counts, Seq(parentKey), "left")
      .withColumn("__actual", coalesce(col("__actual"), lit(0L)))
      .withColumn("__declared", declaredCol.cast("long"))
      .filter(col("__declared") =!= col("__actual"))
      .select(uniform(formId, anomaliesId, col(parentKey),
        concat(lit(s"$anomaliesId: declared="), col("__declared").cast("string"),
               lit(" actual="), col("__actual").cast("string"))): _*)
  }

  /** Cross-form presence: child-form rows whose key has NO row in the
    * parent/anchor form (the reference's pk-day0 anchoring — follow-up
    * forms must reference a day-0 registration: pk.R:120-160, where
    * every rule resolves through the day0-derived mapping). Left anti
    * join on the fk — one shuffle, and the anti join carries only the
    * key columns of the parent side.
    */
  def detectOrphans(child: DataFrame, formId: String, anomaliesId: String,
                    keyCol: String, fkCol: String,
                    parent: DataFrame, pkCol: String): DataFrame =
    child.join(parent.select(col(pkCol).as(fkCol)).distinct(),
        Seq(fkCol), "left_anti")
      .select(uniform(formId, anomaliesId, col(keyCol),
        concat(lit(s"$anomaliesId: $fkCol="), col(fkCol).cast("string"),
               lit(" has no row in the parent form"))): _*)

  /** Multi-predicate combo: rows where EVERY (label, value, hit)
    * condition fires at once (the reference combines per-row GPS
    * accuracy and RDT time-diff filters: safetynew.R:191-198 accuracy
    * > 15, efficacy.R:86-93 rdt_time_diff < 10 — the combo form flags
    * the intersection). Pure per-row projection, no shuffle; the
    * description lists every value so the reviewer sees the whole
    * conjunction.
    */
  def detectCombo(df: DataFrame, formId: String, anomaliesId: String,
                  keyCol: String,
                  conds: Seq[(String, Column, Column)]): DataFrame = {
    val hit = conds.map(_._3).reduce(_ && _)
    val descParts = conds.flatMap { case (label, value, _) =>
      Seq(lit(s" $label="), value.cast("string"))
    }
    df.filter(hit).select(uniform(formId, anomaliesId, col(keyCol),
      concat((lit(s"$anomaliesId:") +: descParts): _*)): _*)
  }

  /** OR'd conditional member counts: groups where ANY of the labeled
    * conditions counts more than `threshold` DISTINCT members (the
    * reference's "more than 3 members died OR migrated" pair:
    * safety.R:164-180 computes both distinct counts in one pass and
    * filters on the disjunction). One shuffle; every labeled count is
    * reported in the description.
    */
  def detectConditionalCountMulti(df: DataFrame, formId: String,
                                  anomaliesId: String, keys: Seq[String],
                                  conds: Seq[(String, Column)],
                                  memberCol: String,
                                  threshold: Long): DataFrame = {
    val groupKey = concat_ws("|", keys.map(k => col(k).cast("string")): _*)
    val aggs = conds.map { case (label, cond) =>
      countDistinct(when(cond, col(memberCol))).as(s"__n_$label")
    }
    val descParts = conds.flatMap { case (label, _) =>
      Seq(lit(s" $label="), col(s"__n_$label").cast("string"))
    }
    val anyOver = conds.map { case (label, _) => col(s"__n_$label") > threshold }
      .reduce(_ || _)
    df.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(anyOver)
      .select(uniform(formId, anomaliesId, groupKey,
        concat((lit(s"$anomaliesId:") +: descParts): _*)): _*)
  }

  /** Fused stateless-rule battery (VERDICT r8 item 4): N per-row
    * predicate rules evaluated in ONE scan/projection of `df` — the
    * staged-flags pattern (g15). Each rule is (anomaliesId, description
    * WITHOUT the "id: " prefix, predicate); a row contributes one
    * conditional struct per rule to an array, nulls (non-hits) are
    * dropped row-side, and the survivors explode into the uniform
    * anomaly schema. Replaces one scan PER rule with one scan per
    * TABLE — at 100 TB the difference between k passes and one. Rules
    * that aggregate or join on their own keys stay separate detectors;
    * this fuses only the genuinely stateless ones (the reference runs
    * its per-row filters the same way: one data.frame pass per form,
    * the pipeline-cleaning anomalies_detector scripts).
    */
  def detectRowBattery(df: DataFrame, formId: String, keyCol: Column,
                       rules: Seq[(String, Column, Column)]): DataFrame = {
    val slots = array(rules.map { case (aid, desc, pred) =>
      when(pred, struct(lit(aid).as("a"),
        concat(lit(s"$aid: "), desc).as("d")))
    }: _*)
    // prune FIRST on the predicate disjunction — a plain pushable filter
    // that drops the (vast) non-anomalous majority before the per-row
    // struct array + generate run; building the slot array for every
    // source row measured +70% on the joined-rules leg
    val anyHit = rules.map(_._3).reduce(_ || _)
    df.filter(anyHit)
      .select(keyCol.cast("string").as("__key"),
        explode(filter(slots, x => x.isNotNull)).as("__r"))
      .select(
        concat_ws("__", lit(formId), col("__key"), col("__r").getField("a"))
          .as("resolution_id"),
        col("__key").as("key"),
        lit(formId).as("form_id"),
        col("__r").getField("a").as("anomalies_id"),
        col("__r").getField("d").as("anomalies_description"),
        lit("to_do").as("resolution_status"))
  }

  /** Shared substrate for conditional distinct-member rules over ONE
    * group key: per group, for every labeled condition, the DISTINCT
    * count of members matching it and the sorted member list — computed
    * two-level (level 1 groups by (keys..., member) with one boolean
    * flag per condition; level 2 folds counts and lists), so k
    * conditions cost ONE scan and NO Expand, where k independent
    * countDistinct aggregates would Expand the scan x(k+1) (the g14
    * cliff). Downstream rules (r3/r13-style) read this one frame as
    * per-row predicates — feed it to detectRowBattery.
    * Output: keys..., n_<label> (long), ids_<label> (sorted comma list).
    */
  def memberStats(df: DataFrame, keys: Seq[String],
                  conds: Seq[(String, Column)], memberCol: String): DataFrame =
    memberStats(df, keys, conds, memberCol, rowCount = false)

  /** As above; `rowCount = true` additionally emits `n_rows` — the
    * group's plain row count (sum of the level-1 per-member counts, so
    * it rides the same two-level pass) — letting a repeat-count rule
    * share this scan instead of running its own groupBy over the same
    * key (round-16: a24's r10 re-aggregated lineitem a second time).
    */
  def memberStats(df: DataFrame, keys: Seq[String],
                  conds: Seq[(String, Column)], memberCol: String,
                  rowCount: Boolean): DataFrame = {
    val flags = conds.map { case (label, cond) =>
      max(when(cond, lit(1)).otherwise(lit(0))).as(s"__f_$label")
    } ++ (if (rowCount) Seq(count(lit(1)).as("__n_rows_l1")) else Nil)
    val l1 = df.groupBy((keys :+ memberCol).map(col): _*)
      .agg(flags.head, flags.tail: _*)
    val l2aggs = conds.flatMap { case (label, _) => Seq(
      count(when(col(s"__f_$label") === 1 && col(memberCol).isNotNull, 1))
        .as(s"n_$label"),
      concat_ws(",", array_sort(collect_list(
        when(col(s"__f_$label") === 1, col(memberCol).cast("string")))))
        .as(s"ids_$label"))
    } ++ (if (rowCount) Seq(sum("__n_rows_l1").as("n_rows")) else Nil)
    l1.groupBy(keys.map(col): _*).agg(l2aggs.head, l2aggs.tail: _*)
  }

  /** R6+R7 (consolidate): union detector outputs with bind_rows semantics —
    * align by name, missing columns null, everything cast to string, nulls
    * as ''. Ref: 05.run_anomaly_detection.R:52-56.
    */
  def consolidate(detections: Seq[DataFrame]): DataFrame = {
    val unioned = detections.reduce(_.unionByName(_, allowMissingColumns = true))
    unioned.select(unioned.columns.map(c => col(c).cast("string").as(c)).toIndexedSeq: _*)
      .na.fill("")
  }

  /** S6 (partitioned history write): append today's snapshot under
    * partition_date=. Idempotent per (partition_date, resolution_id) when
    * re-run with overwrite of the day's partition.
    * Ref: 05.run_anomaly_detection.R:82-86.
    */
  def writeHistory(df: DataFrame, root: String,
                   partitionDate: java.time.LocalDate): Unit =
    df.withColumn("partition_date", lit(java.sql.Date.valueOf(partitionDate)))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("partition_date").parquet(root)

  /** A15 (summary snapshot): counts by (form_id, anomalies_id).
    * Ref: 05.run_anomaly_detection.R:91-96.
    */
  def summarize(df: DataFrame, snapshotDate: Column): DataFrame =
    df.groupBy("form_id", "anomalies_id").agg(count(lit(1)).as("n"))
      .withColumn("snapshot_date", snapshotDate)
}
