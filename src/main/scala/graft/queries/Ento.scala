package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Query, Tables}

/** The reference's ento report family — its flagship external
  * deliverables — re-expressed as three oracle-gated composites over the
  * TPC-H testdata:
  *
  *  - g31: the sponsor-dataset light-trap chain
  *    (pipeline-reporting/R/ento/ento_dataset_for_sponsors.Rmd:246-318):
  *    wide repeat-count columns pivoted long, species extracted by regex,
  *    `{instanceID}/group_anopheles_{species}/{name}` KEY synthesis, the
  *    num_samp row explosion (`:250-262`, rep(seq(nrow), num_samp)),
  *    per-KEY `KEY[n]` indexing, the tube-metadata lookup, then the
  *    field-form and parity/wing hops with the `nchar==4 → '0'+id` key
  *    normalization (`:346-348`, `:540-544`) and a terminal dedup.
  *  - g32: the lab-template individual-mosquito sheet
  *    (ento_lab_templates.Rmd:324-407): the same chain plus the storage
  *    -box wide→long reshape (`:257-269`), the CDCD tube filter, the
  *    HH/LE conditional identity columns, cluster re-derivation from the
  *    ID STRING (regex strip for LE ids, first-2-chars for HH ids,
  *    `:385-389`), assignment lookup, uppercase + NA→'' cosmetics and
  *    the keep-first-per-tube dedup (`:403-407`).
  *  - g33: the monitoring recruitment/withdrawal report
  *    (ento_monitoring_reports.Rmd:80-165, 284-293): LE/HH slice split +
  *    union, withdrawal detection from orig_* backreferences, the
  *    anti-join that classifies every other submission of a withdrawn id
  *    as active, and the excluded-cluster override from the
  *    pk_individuals cluster list.
  *
  * Fixture mapping (deterministic, replayed verbatim by the oracles):
  * orders = the morph/screening form (instanceID = 'uuid:'+orderkey,
  * instance_label = custkey, four synthesized repeat-count columns with
  * a NULL lane so the is.na(value)→1 branch is exercised), lineitem =
  * the repeat-tube rows AND the parity/wing form, part = the storage-box
  * wide form, nation = the assignment table, customer = pk_individuals.
  *
  * Scale posture: every hop is an equi-join on a synthesized
  * high-cardinality key (tube key / tube id / (label, date)) — shuffle
  * joins that partition cleanly; only the 25-row assignment dim
  * broadcasts. The explosion is a narrow sequence+explode (no shuffle);
  * the per-class [n] index is one window keyed by (orderkey, class) —
  * the natural data partitioning. Nothing quadratic, nothing collected.
  */
object Ento {

  // ---- shared fixture vocabulary -------------------------------------------
  private val TubeClasses = Seq(
    "repeat_tubes_dissected_unfed_gambiae",
    "repeat_tubes_fed_funestus",
    "repeat_tubes_gravid_gambiae",
    "repeat_tubes_unfed_funestus")

  /** nchar==4 → '0'+id (ento_dataset_for_sponsors.Rmd:346-348). */
  private def pad4(c: Column): Column =
    when(length(c) === 4, concat(lit("0"), c)).otherwise(c)

  private val Pad4Sql = (e: String) =>
    s"CASE WHEN length($e) = 4 THEN '0' || $e ELSE $e END"

  /** qr code fixture keyed on (orderkey, class, idx) — the tube's OWN
    * identity, unique by construction (l_linenumber is NOT unique within
    * an order in this synthetic data, so a linenumber-based code would
    * collide and make the parity hop 1:N). CDCD- (even orderkey) /
    * CDCL- (odd) so the g32 prefix filter is load-bearing. */
  private def qrCode(ok: Column, ci: Column, idx: Column): Column =
    concat(when(ok % 2 === 0, "CDCD-").otherwise("CDCL-"),
      ok.cast("string"), lit("-"), ci.cast("string"), lit("-"), idx.cast("string"))

  // single-line on purpose: this text is interpolated into a string that
  // stripMargin later processes, and a leading `||` would be eaten
  private val QrSql = (ok: String, ci: String, idx: String) =>
    s"CASE WHEN $ok % 2 = 0 THEN 'CDCD-' ELSE 'CDCL-' END || " +
      s"CAST($ok AS VARCHAR) || '-' || CAST($ci AS VARCHAR) || '-' || CAST($idx AS VARCHAR)"

  // ---- the light-trap chain (shared by g31 + g32) ---------------------------

  /** Builds light_trap_df (ento_dataset_for_sponsors.Rmd:278-308 /
    * ento_lab_templates.Rmd:324-362): morph unpivot → KEY synthesis →
    * num_samp explosion → KEY[n] → tube-meta lookup → field form →
    * parity/wing. Raw (un-cased) columns; callers project/dedup.
    *
    * SHARED-STAGE CONTRACT (verdict r13 item 6): when g31 and g32 run
    * as one job, this chain is materialized ONCE — to PARQUET SCRATCH,
    * never localCheckpoint. Both forms were measured at 100x
    * (ScaleReplica's g3132_shared_lighttrap): the disk form runs the
    * pair at 0.55x of their independent sum (177 s vs 324.7 s), while
    * the localCheckpoint form DIES with AGGREGATE_OUT_OF_MEMORY — the
    * block-manager copy of the ~60M-row exploded chain competes with
    * g31's hash aggregate for the same unified-memory pool, and at
    * cluster scale that contention only worsens (checkpoint blocks pin
    * storage memory per executor; parquet scratch pressures nothing and
    * its re-read is a columnar pruned scan). The registry rows stay
    * independent (the gate contract is per-row); the shared disk form
    * is the posture-run entry and the documented composition for any
    * caller running both epilogues. */
  private[graft] def lightTrap(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)

    // the wide morph form: four repeat-count columns, one with a NULL
    // lane (orderkey%7==0) so num_samp = ifelse(is.na(value), 1, value)
    // takes both branches (Rmd:253)
    val morph = orders.select(
      concat(lit("uuid:"), col("o_orderkey").cast("string")).as("instance_id"),
      col("o_custkey").cast("string").as("instance_label"),
      col("o_orderdate").cast("date").as("todays_date"),
      when(col("o_orderkey") % 3 === 0, "Household")
        .otherwise("Livestock_Enclosure").as("site"),
      when(col("o_orderkey") % 7 === 0, lit(null).cast("bigint"))
        .otherwise(col("o_orderkey") % 3).as("c0"),
      (col("o_custkey") % 2).as("c1"),
      ((col("o_orderkey") + col("o_custkey")) % 2).as("c2"),
      when(col("o_orderkey") % 5 === 0, 2L).otherwise(0L).as("c3"))

    // pivot_longer (Rmd:249) — stack is a narrow projection, no shuffle
    val long = morph.select(col("instance_id"), col("instance_label"),
      col("todays_date"), col("site"),
      expr(s"""stack(4,
        '${TubeClasses(0)}_count', c0, '${TubeClasses(1)}_count', c1,
        '${TubeClasses(2)}_count', c2, '${TubeClasses(3)}_count', c3)
        AS (temp_value, value)"""))

    // species regex + KEY synthesis + num_samp (Rmd:250-253)
    val samp = long
      .withColumn("species", regexp_extract(col("temp_value"), "gambiae|funestus", 0))
      .withColumn("key_", regexp_replace(col("temp_value"), "_count", ""))
      .withColumn("num_samp", coalesce(col("value"), lit(1L)))

    // rep(seq(nrow), num_samp) (Rmd:256) — guard: Spark's sequence(1, 0)
    // is DESCENDING [1, 0], so num_samp = 0 must map to an empty array
    // (DuckDB's generate_series(1, 0) is already empty)
    val expl = samp.withColumn("n",
      explode(when(col("num_samp") >= 1, sequence(lit(1L), col("num_samp")))
        .otherwise(array().cast("array<bigint>"))))
      .withColumn("tube_key", concat(col("instance_id"), lit("/group_anopheles_"),
        col("species"), lit("/"), col("key_"),
        lit("["), col("n").cast("string"), lit("]")))

    // the repeat-tube metadata (lt_tubes_meta, Rmd:221-237): class from
    // linenumber, [idx] = row_number within (order, class) — the only
    // window, keyed on the join key's own prefix. The order is the FULL
    // unique composite (linenumber, partkey, suppkey): linenumber alone
    // ties in this data, which would make the pick engine-dependent.
    val ci = (col("l_linenumber") % 4).cast("int")
    val tubeBase = li.select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_returnflag"), ci.as("ci"))
      .withColumn("idx", row_number().over(
        Window.partitionBy(col("l_orderkey"), col("ci"))
          .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))))
      .withColumn("qr_code", qrCode(col("l_orderkey"), col("ci"), col("idx")))
    val tube = tubeBase.select(
        concat(lit("uuid:"), col("l_orderkey").cast("string"),
          lit("/group_anopheles_"),
          when(col("ci").isin(0, 2), "gambiae").otherwise("funestus"),
          lit("/"),
          when(col("ci") === 0, TubeClasses(0)).when(col("ci") === 1, TubeClasses(1))
            .when(col("ci") === 2, TubeClasses(2)).otherwise(TubeClasses(3)),
          lit("["), col("idx").cast("string"), lit("]")).as("key_t"),
        col("qr_code"),
        when(col("ci") === 0, 1L)
          .otherwise(floor(col("l_quantity")).cast("bigint") % 3 + 1).as("num_stored"))

    // left join + filter(!is.na(qr_code)) (Rmd:263-264)
    val lt = expl.join(tube, col("tube_key") === col("key_t"), "left")
      .filter(col("qr_code").isNotNull)

    // the field form (entoltfield, Rmd:279-286): per (label, date), with
    // BOTH sides pad4-normalized before the join (Rmd:540-544)
    val field = orders.groupBy(
        pad4(col("o_custkey").cast("string")).as("f_label"),
        col("o_orderdate").cast("date").as("f_date"),
        (col("o_custkey") % 25).as("cluster"))
      .agg(max(col("o_orderkey")).as("__mk"))
      .select(col("f_label"), col("f_date"), col("cluster"),
        when(col("__mk") % 5 === 0, "no").otherwise("yes").as("trap_success"),
        when(col("cluster") % 3 === 0, "MDA").when(col("cluster") % 3 === 1, "Targeted")
          .otherwise("Control").as("arm"))

    // the parity/wing form (entoltparitywing, Rmd:287-288) — derived
    // from the SAME windowed base so its tube id is the tube's identity
    val parity = tubeBase.filter(col("l_returnflag") === "R")
      .select(col("qr_code").as("tube_id_select"),
        ((col("l_partkey") % 150) / 100.0 + 2.0).as("wing_length"),
        when(col("l_suppkey") % 3 === 0, "Parous")
          .when(col("l_suppkey") % 3 === 1, "Nulliparous").as("parity_status"))

    lt.withColumn("hhid_leid", pad4(col("instance_label")))
      .join(field, col("hhid_leid") === col("f_label")
        && col("todays_date") === col("f_date"), "left")
      .join(parity, col("qr_code") === col("tube_id_select"), "left")
      .withColumn("physio", regexp_extract(col("temp_value"), "fed|unfed|gravid", 0))
      .withColumn("species_full", concat(lit("An. "), col("species")))
      .withColumn("stored_or_dissected",
        when(col("temp_value").contains("dissected"), "Dissected")
          .otherwise("Sent to Storage"))
  }

  /** The light-trap chain as DuckDB CTEs, replaying lightTrap verbatim
    * (terminal CTE `lt2` carries the same column vocabulary). */
  private lazy val LightTrapCtesSql: String =
    s"""WITH lng AS (
      |  SELECT 'uuid:' || CAST(o_orderkey AS VARCHAR) AS instance_id,
      |         CAST(o_custkey AS VARCHAR) AS instance_label,
      |         CAST(o_orderdate AS DATE) AS todays_date,
      |         CASE WHEN o_orderkey % 3 = 0 THEN 'Household'
      |              ELSE 'Livestock_Enclosure' END AS site,
      |         CASE t.ci WHEN 0 THEN '${TubeClasses(0)}_count'
      |                   WHEN 1 THEN '${TubeClasses(1)}_count'
      |                   WHEN 2 THEN '${TubeClasses(2)}_count'
      |                   ELSE '${TubeClasses(3)}_count' END AS temp_value,
      |         CAST(CASE t.ci
      |           WHEN 0 THEN CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |                            ELSE o_orderkey % 3 END
      |           WHEN 1 THEN o_custkey % 2
      |           WHEN 2 THEN (o_orderkey + o_custkey) % 2
      |           ELSE CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 0 END
      |         END AS BIGINT) AS value
      |  FROM orders CROSS JOIN (VALUES (0), (1), (2), (3)) t(ci)),
      |samp AS (
      |  SELECT *, regexp_extract(temp_value, 'gambiae|funestus') AS species,
      |         replace(temp_value, '_count', '') AS key_,
      |         coalesce(value, 1) AS num_samp
      |  FROM lng),
      |expl AS (
      |  SELECT *, unnest(generate_series(1, num_samp)) AS n FROM samp),
      |keyed AS (
      |  SELECT *, instance_id || '/group_anopheles_' || species || '/' || key_
      |           || '[' || CAST(n AS VARCHAR) || ']' AS tube_key
      |  FROM expl),
      |tubebase AS (
      |  SELECT l_orderkey, l_linenumber % 4 AS ci, l_partkey, l_suppkey,
      |         l_quantity, l_returnflag,
      |         row_number() OVER (
      |           PARTITION BY l_orderkey, l_linenumber % 4
      |           ORDER BY l_linenumber, l_partkey, l_suppkey) AS idx
      |  FROM lineitem),
      |tube AS (
      |  SELECT 'uuid:' || CAST(l_orderkey AS VARCHAR) || '/group_anopheles_'
      |           || CASE WHEN ci IN (0, 2) THEN 'gambiae' ELSE 'funestus' END
      |           || '/' || CASE ci
      |                WHEN 0 THEN '${TubeClasses(0)}'
      |                WHEN 1 THEN '${TubeClasses(1)}'
      |                WHEN 2 THEN '${TubeClasses(2)}'
      |                ELSE '${TubeClasses(3)}' END
      |           || '[' || CAST(idx AS VARCHAR) || ']' AS key_t,
      |         ${QrSql("l_orderkey", "ci", "idx")} AS qr_code,
      |         CASE WHEN ci = 0 THEN 1
      |              ELSE CAST(floor(l_quantity) AS BIGINT) % 3 + 1 END AS num_stored
      |  FROM tubebase),
      |field AS (
      |  SELECT ${Pad4Sql("CAST(o_custkey AS VARCHAR)")} AS f_label,
      |         CAST(o_orderdate AS DATE) AS f_date,
      |         o_custkey % 25 AS cluster,
      |         CASE WHEN max(o_orderkey) % 5 = 0 THEN 'no' ELSE 'yes' END AS trap_success,
      |         CASE (o_custkey % 25) % 3 WHEN 0 THEN 'MDA' WHEN 1 THEN 'Targeted'
      |              ELSE 'Control' END AS arm
      |  FROM orders GROUP BY 1, 2, 3),
      |parity AS (
      |  SELECT ${QrSql("l_orderkey", "ci", "idx")} AS tube_id_select,
      |         (l_partkey % 150) / 100.0 + 2.0 AS wing_length,
      |         CASE l_suppkey % 3 WHEN 0 THEN 'Parous' WHEN 1 THEN 'Nulliparous' END
      |           AS parity_status
      |  FROM tubebase WHERE l_returnflag = 'R'),
      |lt2 AS (
      |  SELECT k.*, t.qr_code, t.num_stored,
      |         ${Pad4Sql("k.instance_label")} AS hhid_leid,
      |         f.trap_success, f.cluster, f.arm,
      |         p.wing_length, p.parity_status,
      |         regexp_extract(k.temp_value, 'fed|unfed|gravid') AS physio,
      |         'An. ' || k.species AS species_full,
      |         CASE WHEN k.temp_value LIKE '%dissected%' THEN 'Dissected'
      |              ELSE 'Sent to Storage' END AS stored_or_dissected
      |  FROM keyed k
      |  JOIN tube t ON k.tube_key = t.key_t
      |  LEFT JOIN field f ON ${Pad4Sql("k.instance_label")} = f.f_label
      |                    AND k.todays_date = f.f_date
      |  LEFT JOIN parity p ON t.qr_code = p.tube_id_select)""".stripMargin

  // lazy: initializer order — monitoringQueries is defined below
  lazy val queries: Seq[Query] = Seq(

    // ---- G31: ento sponsor-dataset light-trap table --------------------------
    // (CTE prefix concatenated OUTSIDE stripMargin — the CTE text holds
    // `||` concatenations at line starts that stripMargin would eat.)
    Query("g31_ento_sponsor_tubes",
      LightTrapCtesSql + "\n" +
      """SELECT DISTINCT qr_code AS sample_tube_id,
        |       species_full AS species,
        |       stored_or_dissected,
        |       num_stored AS num_in_tube,
        |       todays_date AS a3_morph_id_date,
        |       todays_date AS collection_date,
        |       site AS collection_location,
        |       hhid_leid,
        |       trap_success, cluster, arm,
        |       wing_length, parity_status
        |FROM lt2""".stripMargin) {
      (s, d) => sponsorTubes(lightTrap(s, d))
    },

    // ---- G32: ento lab-template individual-mosquito sheet --------------------
    Query("g32_ento_lab_template",
      LightTrapCtesSql + ",\n" +
      """box AS (
        |  SELECT 'BOX-' || CAST(p_partkey AS VARCHAR) AS box_id,
        |         'A' || CAST(t.i AS VARCHAR) AS position_in_box,
        |         'CDCD-' || CAST(2 * ((p_partkey * 3 + t.i) % 1000) AS VARCHAR)
        |           || '-' || CAST((p_partkey + t.i) % 4 AS VARCHAR)
        |           || '-' || CAST(1 + (p_partkey + t.i) % 2 AS VARCHAR) AS tube_ids
        |  FROM part CROSS JOIN (VALUES (1), (2), (3)) t(i)),
        |cdc AS (
        |  SELECT lt2.*, b.box_id, b.position_in_box,
        |         CASE WHEN site = 'Household' THEN hhid_leid END AS household_id,
        |         CASE WHEN site = 'Livestock_Enclosure'
        |              THEN 'L' || CAST(cluster AS VARCHAR) || ' - ' || hhid_leid END AS le_id
        |  FROM lt2 JOIN box b ON lt2.qr_code = b.tube_ids
        |  WHERE qr_code LIKE 'CDCD-%'),
        |cl AS (
        |  SELECT *, CASE WHEN le_id IS NOT NULL
        |              THEN CAST(regexp_replace(le_id, '^.*L\s*|\s*-.*$', '', 'g') AS BIGINT)
        |              ELSE CAST(substr(household_id, 1, 2) AS BIGINT) END AS cluster2
        |  FROM cdc),
        |asg AS (
        |  SELECT n_nationkey AS cluster_number,
        |         CASE n_nationkey % 3 WHEN 0 THEN 'mda' WHEN 1 THEN 'targeted'
        |              ELSE 'control' END AS assignment
        |  FROM nation),
        |up AS (
        |  SELECT coalesce(upper(box_id), '') AS box_id,
        |         todays_date AS date_of_collection,
        |         coalesce(upper(qr_code), '') AS sample_tube_id,
        |         cluster2 AS cluster,
        |         coalesce(upper(assignment), '') AS arm,
        |         coalesce(upper(species_full), '') AS species,
        |         coalesce(upper(household_id), '') AS household_id,
        |         coalesce(upper(le_id), '') AS le_id,
        |         coalesce(upper(physio), '') AS physio,
        |         wing_length,
        |         coalesce(upper(parity_status), '') AS parity_status,
        |         coalesce(upper(position_in_box), '') AS position_in_box
        |  FROM cl LEFT JOIN asg ON cl.cluster2 = asg.cluster_number)
        |SELECT box_id, date_of_collection, sample_tube_id, cluster, arm, species,
        |       household_id, le_id, physio, wing_length, parity_status, position_in_box
        |FROM (SELECT *, row_number() OVER (PARTITION BY sample_tube_id
        |                                   ORDER BY box_id, position_in_box) AS rn
        |      FROM up) t
        |WHERE rn = 1""".stripMargin) {
      (s, d) => labTemplate(s, d, lightTrap(s, d))
    },
  ) ++ monitoringQueries

  /** g31's epilogue over the light-trap chain (projection + dedup) —
    * extracted so the combined-posture harness can run g31 and g32 off
    * ONE materialized chain (VERDICT r12 item 7 measurement). */
  private[graft] def sponsorTubes(lt: DataFrame): DataFrame =
    lt.select(
        col("qr_code").as("sample_tube_id"),
        col("species_full").as("species"),
        col("stored_or_dissected"),
        col("num_stored").as("num_in_tube"),
        col("todays_date").as("a3_morph_id_date"),
        col("todays_date").as("collection_date"),
        col("site").as("collection_location"),
        col("hhid_leid"),
        col("trap_success"), col("cluster"), col("arm"),
        col("wing_length"), col("parity_status"))
      .distinct()

  /** g32's epilogue: box reshape join + cluster re-derivation +
    * assignment broadcast + cosmetics + keep-first-per-tube dedup. */
  private[graft] def labTemplate(s: SparkSession, d: String,
                                 lightTrapDf: DataFrame): DataFrame = {
        val lt = lightTrapDf.filter(col("qr_code").startsWith("CDCD-"))
        // the storage-box wide form reshaped long (Rmd:257-269); the
        // (box, position) → tube map deliberately collides across boxes
        // so the keep-first-per-tube dedup (Rmd:403-407) is load-bearing
        val box = Tables.part(s, d).select(col("p_partkey"),
            explode(array(lit(1), lit(2), lit(3))).as("i"))
          .select(
            concat(lit("BOX-"), col("p_partkey").cast("string")).as("box_id"),
            concat(lit("A"), col("i").cast("string")).as("position_in_box"),
            concat(lit("CDCD-"),
              (lit(2) * ((col("p_partkey") * 3 + col("i")) % 1000)).cast("string"),
              lit("-"), ((col("p_partkey") + col("i")) % 4).cast("string"),
              lit("-"), (lit(1) + (col("p_partkey") + col("i")) % 2).cast("string"))
              .as("tube_ids"))
        val cdc = lt.join(box, col("qr_code") === col("tube_ids"))
          .withColumn("household_id",
            when(col("site") === "Household", col("hhid_leid")))
          .withColumn("le_id", when(col("site") === "Livestock_Enclosure",
            concat(lit("L"), col("cluster").cast("string"), lit(" - "), col("hhid_leid"))))
          // cluster re-derived from the ID STRING (Rmd:385-389)
          .withColumn("cluster2", when(col("le_id").isNotNull,
              regexp_replace(col("le_id"), "^.*L\\s*|\\s*-.*$", "").cast("bigint"))
            .otherwise(substring(col("household_id"), 1, 2).cast("bigint")))
        val asg = Tables.nation(s, d).select(
          col("n_nationkey").cast("bigint").as("cluster_number"),
          when(col("n_nationkey") % 3 === 0, "mda")
            .when(col("n_nationkey") % 3 === 1, "targeted")
            .otherwise("control").as("assignment"))
        def upNa(c: Column): Column = coalesce(upper(c), lit(""))
        val up = cdc.join(broadcast(asg),
            col("cluster2") === col("cluster_number"), "left")
          .select(upNa(col("box_id")).as("box_id"),
            col("todays_date").as("date_of_collection"),
            upNa(col("qr_code")).as("sample_tube_id"),
            col("cluster2").as("cluster"),
            upNa(col("assignment")).as("arm"),
            upNa(col("species_full")).as("species"),
            upNa(col("household_id")).as("household_id"),
            upNa(col("le_id")).as("le_id"),
            upNa(col("physio")).as("physio"),
            col("wing_length"),
            upNa(col("parity_status")).as("parity_status"),
            upNa(col("position_in_box")).as("position_in_box"))
        up.withColumn("rn", row_number().over(Window.partitionBy("sample_tube_id")
            .orderBy(col("box_id"), col("position_in_box"))))
          .filter(col("rn") === 1).drop("rn")
  }

  // ---- G33: ento monitoring recruitment & withdrawals ----------------------
  private val monitoringQueries: Seq[Query] = Seq(
    Query("g33_ento_monitoring",
      """WITH scr AS (
        |  SELECT o_orderkey, o_custkey,
        |         CAST(o_orderdate AS DATE) AS todays_date,
        |         CASE o_orderkey % 3 WHEN 0 THEN 'Household'
        |              WHEN 1 THEN 'Livestock_Enclosure'
        |              ELSE 'Larval Habitat' END AS site,
        |         o_custkey % 25 AS cluster_number
        |  FROM orders),
        |base AS (
        |  SELECT 'L' || CAST(cluster_number AS VARCHAR) || '-'
        |           || CAST(o_orderkey AS VARCHAR) AS id,
        |         CASE WHEN o_orderkey % 11 = 0
        |              THEN 'ORIG-' || CAST(o_orderkey AS VARCHAR) ELSE '' END AS orig,
        |         todays_date, site, cluster_number, 'livestock_enclosure' AS id_type
        |  FROM scr WHERE site = 'Livestock_Enclosure'
        |  UNION ALL
        |  SELECT CAST(o_custkey AS VARCHAR),
        |         CASE WHEN o_orderkey % 11 = 0
        |              THEN 'ORIG-' || CAST(o_orderkey AS VARCHAR) ELSE '' END,
        |         todays_date, site, cluster_number, 'household'
        |  FROM scr WHERE site = 'Household'),
        |withdrawals AS (
        |  SELECT *, 'withdrawn' AS active_or_withdrawn,
        |         todays_date AS date_of_withdrawal
        |  FROM base WHERE orig <> ''),
        |active AS (
        |  SELECT b.*, 'active' AS active_or_withdrawn,
        |         CAST(NULL AS DATE) AS date_of_withdrawal
        |  FROM base b WHERE NOT EXISTS (
        |    SELECT 1 FROM withdrawals w WHERE w.id = b.id)),
        |tbl AS (
        |  SELECT DISTINCT cluster_number, id,
        |         todays_date AS date_of_consent,
        |         site AS collection_method,
        |         active_or_withdrawn, date_of_withdrawal
        |  FROM (SELECT * FROM active UNION ALL SELECT * FROM withdrawals)
        |  WHERE cluster_number IS NOT NULL),
        |excluded AS (
        |  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS cl
        |  FROM customer WHERE c_acctbal < -900)
        |SELECT cluster_number, id, date_of_consent, collection_method,
        |       CASE WHEN cl IS NOT NULL THEN 'cluster excluded from study'
        |            ELSE active_or_withdrawn END AS active_or_withdrawn,
        |       CAST(date_of_withdrawal AS VARCHAR) AS date_of_withdrawal
        |FROM tbl LEFT JOIN excluded ON tbl.cluster_number = excluded.cl""".stripMargin) {
      (s, d) => {
        val scr = Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("todays_date"),
          when(col("o_orderkey") % 3 === 0, "Household")
            .when(col("o_orderkey") % 3 === 1, "Livestock_Enclosure")
            .otherwise("Larval Habitat").as("site"),
          (col("o_custkey") % 25).as("cluster_number"))
        val orig = when(col("o_orderkey") % 11 === 0,
          concat(lit("ORIG-"), col("o_orderkey").cast("string"))).otherwise("")
        // LE/HH slice split + union (Rmd:95-135); "Larval Habitat" rows
        // are filtered at the source exactly like the reference (:84-85)
        val le = scr.filter(col("site") === "Livestock_Enclosure").select(
          concat(lit("L"), col("cluster_number").cast("string"), lit("-"),
            col("o_orderkey").cast("string")).as("id"),
          orig.as("orig"), col("todays_date"), col("site"), col("cluster_number"),
          lit("livestock_enclosure").as("id_type"))
        val hh = scr.filter(col("site") === "Household").select(
          col("o_custkey").cast("string").as("id"),
          orig.as("orig"), col("todays_date"), col("site"), col("cluster_number"),
          lit("household").as("id_type"))
        val base = le.unionByName(hh)
        val withdrawals = base.filter(col("orig") =!= "")
          .withColumn("active_or_withdrawn", lit("withdrawn"))
          .withColumn("date_of_withdrawal", col("todays_date"))
        // anti_join(withdrawals, by='id') (Rmd:147-150): every OTHER
        // submission of a withdrawn id is dropped from the active side
        val active = base.join(withdrawals.select("id").distinct(),
            Seq("id"), "left_anti")
          .withColumn("active_or_withdrawn", lit("active"))
          .withColumn("date_of_withdrawal", lit(null).cast("date"))
        val tbl = active.unionByName(withdrawals)
          .filter(col("cluster_number").isNotNull)
          .select(col("cluster_number"), col("id"),
            col("todays_date").as("date_of_consent"),
            col("site").as("collection_method"),
            col("active_or_withdrawn"), col("date_of_withdrawal"))
          .distinct()
        // excluded-cluster override from pk_individuals (Rmd:284-287) —
        // a bounded distinct-cluster list, broadcast
        val excluded = Tables.customer(s, d).filter(col("c_acctbal") < -900)
          .select(col("c_nationkey").cast("bigint").as("cl")).distinct()
        tbl.join(broadcast(excluded), col("cluster_number") === col("cl"), "left")
          .select(col("cluster_number"), col("id"), col("date_of_consent"),
            col("collection_method"),
            when(col("cl").isNotNull, "cluster excluded from study")
              .otherwise(col("active_or_withdrawn")).as("active_or_withdrawn"),
            // nullable DATE → VARCHAR (io03 convention: the gate's
            // canonicalizer renders engine nulls differently for dates)
            col("date_of_withdrawal").cast("string").as("date_of_withdrawal"))
      }
    }
  )
}
