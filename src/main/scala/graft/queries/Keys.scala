package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Query, Tables}
import graft.operators.OdkKeys

/** Instance-key parsing and semi-structured extraction queries. */
object Keys {

  /** Shared by a53 (batch) and st23 (stream): exact view/purchase
    * marginals + overlap computed from `ev`, cross-joined with the
    * sketch-estimate row `ests` (est_a, est_b, est_u) into the single
    * verdict row both rows emit — ONE definition so the 10% contract
    * and the output columns cannot drift between the twins.
    */
  private[queries] def sketchIntersectionVerdict(
      ev: org.apache.spark.sql.DataFrame,
      ests: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val exA = ev.filter(col("event_type") === "view")
      .select("user_id").distinct().localCheckpoint()
    val exB = ev.filter(col("event_type") === "purchase")
      .select("user_id").distinct().localCheckpoint()
    val exact = exA.agg(count(lit(1)).as("exact_a")).crossJoin(
      exB.agg(count(lit(1)).as("exact_b"))).crossJoin(
      exA.join(exB, Seq("user_id")).agg(count(lit(1)).as("exact_both")))
    exact.crossJoin(ests)
      .select(col("exact_a"), col("exact_b"), col("exact_both"),
        (abs(col("est_a") + col("est_b") - col("est_u")
          - col("exact_both").cast("double"))
          <= col("exact_both").cast("double") * 0.10).as("within_10pct"))
  }

  val queries: Seq[Query] = Seq(

    // ---- ODK repeat-key parse (SURVEY §1.1) --------------------------------
    // Synthesize child keys from events ids, then recover the parts.
    Query("k01_parse_repeat_key",
      """SELECT key,
        |  regexp_extract(regexp_extract(key, '([^/]+)$', 1), '^([^\[]+)\[', 1) AS repeat_name,
        |  CAST(nullif(regexp_extract(regexp_extract(key, '([^/]+)$', 1), '\[([0-9]+)\]', 1), '')
        |       AS INT) AS repeat_key
        |FROM (
        |  SELECT CASE WHEN event_id % 3 = 0
        |              THEN 'uuid:' || CAST(event_id AS VARCHAR)
        |              ELSE 'uuid:' || CAST(event_id AS VARCHAR) || '/repeat_ind['
        |                   || CAST(event_id % 7 AS VARCHAR) || ']' END AS key
        |  FROM events)""".stripMargin) {
      (s, d) => Tables.events(s, d)
        .select(
          when(col("event_id") % 3 === 0,
            concat(lit("uuid:"), col("event_id").cast("string")))
            .otherwise(concat(lit("uuid:"), col("event_id").cast("string"),
              lit("/repeat_ind["), (col("event_id") % 7).cast("string"), lit("]")))
            .as("key"))
        .select(col("key"),
          OdkKeys.repeatName(col("key")).as("repeat_name"),
          OdkKeys.repeatKey(col("key")).as("repeat_key"))
    },

    // ---- JSON property extraction ------------------------------------------
    Query("t08_json_extract",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events""".stripMargin) {
      (s, d) => Tables.events(s, d).select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    },

    // ---- approximate distinct (the 100 TB scale knob for A2) -----------------
    // HLL sketch — no SQL oracle (estimator-specific); accuracy contract
    // in ApproxSpec.
    // HLL sketches can't hash-match across engines (different registers),
    // but the ERROR-BOUND contract can: the oracle computes the exact
    // distinct count, the engine emits the sketch estimate's relative
    // error as a boolean `within_5pct` — hash-matchable while the sketch
    // itself stays engine-side. approx_count_distinct rsd=0.02 gives
    // ~2% standard error; 5% is 2.5 sigma, deterministic-in-practice for
    // the fixed testdata (the sketch is itself deterministic per input).
    // SPARK-VERSION COUPLING: the oracle pins within_5pct = true, so a
    // Spark upgrade that changes the HLL++ register layout or hashing
    // could flip this gate with nothing wrong in the engine — if this
    // row fails right after an upgrade, diagnose as sketch drift first.
    Query("a17_approx_distinct",
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
        |       CAST(1 AS BOOLEAN) AS within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      // two-level aggregate instead of mixed exact+approx in one agg:
      // the single-agg form Expands every row x2 (1.2M rows through the
      // exchange at sf0.1); pre-distincting (flag, orderkey) map-side
      // combines to ~the distinct-pair count, and the HLL sketch over
      // the already-distinct keys is REGISTER-IDENTICAL to the raw-input
      // sketch (duplicates never change HLL registers), so the
      // within_5pct contract is unchanged
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_orderkey").agg(count(lit(1)).as("__dup"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("exact_orders"),
             approx_count_distinct(col("l_orderkey"), 0.02).as("__approx"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("__approx").cast("double") - col("exact_orders").cast("double"))
            / col("exact_orders").cast("double") <= 0.05).as("within_5pct"))
    },

    // ---- statistical aggregates ----------------------------------------------
    // corr/covar/stddev use different (both stable) accumulation orders
    // across engines — compare rounded.
    Query("a19_stats",
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS r,
        |  round(covar_samp(l_quantity, l_discount), 6) AS cv,
        |  round(stddev_samp(l_extendedprice), 4) AS sd
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) {
      (s, d) => Tables.lineitem(s, d).groupBy("l_returnflag").agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("r"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cv"),
        round(stddev_samp(col("l_extendedprice")), 4).as("sd"))
    },

    // ---- approximate percentile (the 100 TB scale knob for A18) --------------
    // Same error-bound oracle technique as a17: the sketch itself
    // (KLL/GK-style, engine-specific) can't hash-match across engines,
    // but the bound can — the oracle computes the exact interpolated
    // median (a18's pinned parity) and the engine asserts the
    // percentile_approx estimate lands within ±1 of it. l_quantity is
    // integral 1..50, so accuracy=10000 makes the bound deterministic
    // for the fixed testdata.
    Query("a25_approx_percentile",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_exact,
        |  CAST(1 AS BOOLEAN) AS within_1
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_returnflag").agg(
        expr("percentile(l_quantity, 0.5)").as("p50_exact"),
        expr("percentile_approx(l_quantity, 0.5, 10000)").as("__approx"))
        .select(col("l_returnflag"), col("p50_exact"),
          (abs(col("__approx").cast("double") - col("p50_exact")) <= 1.0)
            .as("within_1"))
    },

    // ---- mergeable distinct sketches (the 100 TB incremental knob for A2) ----
    // The warehouse pattern exact count(DISTINCT) cannot follow at
    // scale: per-shard Datasketches HLL sketches (hll_sketch_agg) are
    // STORED STATE — a new shard's sketch unions in (hll_union_agg)
    // without touching old shards, the a22 incremental-maintenance
    // pattern for the one aggregate that isn't decomposable exactly.
    // Error-bound oracle (a17/a25 technique): lgConfigK=14 gives ~0.8%
    // relative standard error; the gate asserts the merged estimate
    // lands within 5% of the exact distinct, which the oracle computes.
    Query("a26_sketch_union",
      """SELECT 16 AS n_shards,
        |       count(DISTINCT l_orderkey) AS exact_distinct,
        |       CAST(1 AS BOOLEAN) AS within_5pct
        |FROM lineitem""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val perShard = li
        .groupBy(pmod(col("l_suppkey"), lit(16)).as("__shard"))
        .agg(expr("hll_sketch_agg(l_orderkey, 14)").as("__sk"))
      val merged = perShard.agg(
        count(lit(1)).cast("int").as("n_shards"),
        expr("hll_sketch_estimate(hll_union_agg(__sk))").as("__est"))
      val exact = li.agg(count_distinct(col("l_orderkey")).as("exact_distinct"))
      merged.crossJoin(exact).select(
        col("n_shards"), col("exact_distinct"),
        (abs(col("__est").cast("double") - col("exact_distinct").cast("double"))
          <= col("exact_distinct").cast("double") * 0.05).as("within_5pct"))
    },

    // ---- A53: sketch set-intersection via inclusion-exclusion ---------------
    // The audience-overlap question ("how many users both viewed AND
    // purchased?") at sketch cost: HLL sketches support union natively,
    // so |A∩B| comes from |A| + |B| − |A∪B| — three estimates off TWO
    // stored per-segment sketches (built in ONE grouped pass over the
    // filtered events; the union re-aggregates the 2-row sketch table,
    // never the data). Exact counts ride along for the oracle, and the
    // gate asserts the estimated intersection lands within 10% of exact
    // (lgConfigK=14 ≈ 0.8% RSE per estimate; inclusion-exclusion
    // amplifies to a few % on a ~50% overlap — 10% only trips on a
    // broken sketch path). At 100 TB the sketches are the stored state:
    // per-shard segment sketches union in without rescanning history
    // (the a22/a26 incremental contract extended to set algebra).
    Query("a53_sketch_intersection",
      """WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
        |b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT (SELECT count(*) FROM a) AS exact_a,
        |       (SELECT count(*) FROM b) AS exact_b,
        |       (SELECT count(*) FROM a JOIN b USING (user_id)) AS exact_both,
        |       CAST(1 AS BOOLEAN) AS within_10pct""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val sk = ev.filter(col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      val ests = sk.agg(
        max(when(col("event_type") === "view",
          expr("hll_sketch_estimate(sk)"))).as("est_a"),
        max(when(col("event_type") === "purchase",
          expr("hll_sketch_estimate(sk)"))).as("est_b"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_u"))
      sketchIntersectionVerdict(ev, ests)
    },

    // ---- exact percentile / median ------------------------------------------
    Query("a18_percentile",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.9) AS p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) {
      (s, d) => Tables.lineitem(s, d).groupBy("l_returnflag").agg(
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"))
    },

    // ---- a27: exact heavy hitters via a Misra-Gries candidate pass ----------
    // Frequent items over the token stream WITHOUT shuffling the item
    // space: phase 1 is one Misra-Gries sketch aggregate fed the token
    // ARRAYS (no explode — update loops elements in-JVM), whose ≤ k
    // partial states merge to a single row; its keys are a PROVABLE
    // superset of every item with share > 1/(k+1). Phase 2 counts only
    // those ≤ k candidates exactly (broadcast isin filter on a narrow
    // re-scan) and applies the share > 1/30 threshold against the exact
    // token total — so the result is bit-exact, which is what lets a
    // sketch-based plan sit under a plain GROUP BY/HAVING oracle. The
    // candidate collect is bounded driver state (≤ k strings, the IVF
    // centroid precedent). The naive plan this replaces shuffles every
    // distinct token; this one's only wide op is the ≤ k-row phase-2
    // aggregate.
    Query("a27_heavy_hitters",
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |tot AS (SELECT count(*) AS n FROM w)
        |SELECT word, count(*) AS cnt FROM w, tot
        |GROUP BY word, n HAVING count(*) * 30 > n""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val cands: Seq[String] = docs
        .agg(graft.plans.MisraGriesTopK(toks, 64).as("cand"))
        .head().getSeq[String](0)
      val total = docs.agg(sum(size(toks)).as("n"))
      docs.select(explode(toks).as("word"))
        .filter(col("word").isin(cands: _*))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(total))
        .filter(col("cnt") * 30 > col("n"))
        .select("word", "cnt")
    },

    // ---- K2: join-key skew profile (the "should I salt this?" audit) -------
    // The diagnostic behind j16's salting and AQE's skew threshold:
    // distribution of per-key mass for a prospective join/agg key —
    // key count, row count, max/p50/p99 group sizes (rank-rule
    // selection, no interpolation) and skew ratio max/avg. One hash
    // agg over the data; the ranking window then runs over |keys|
    // rows, not |rows| — the profile is a diagnostic on the KEY
    // DISTRIBUTION, which is the already-reduced side.
    Query("k02_skew_profile",
      """WITH g AS (SELECT user_id, count(*) AS m FROM events GROUP BY 1),
        |r AS (SELECT m, row_number() OVER (ORDER BY m, user_id) AS rn,
        |             count(*) OVER () AS n
        |      FROM g),
        |p AS (SELECT max(CASE WHEN rn = (n + 1) // 2 THEN m END) AS p50,
        |             max(CASE WHEN rn = greatest(1, (99 * n) // 100) THEN m END) AS p99,
        |             max(m) AS mx, count(*) AS nk, sum(m) AS nr
        |      FROM r)
        |SELECT CAST(nk AS BIGINT) AS n_keys, CAST(nr AS BIGINT) AS n_rows,
        |       CAST(mx AS BIGINT) AS max_mass, CAST(p50 AS BIGINT) AS p50_mass,
        |       CAST(p99 AS BIGINT) AS p99_mass,
        |       round(CAST(mx AS DOUBLE) * nk / nr, 6) AS skew_ratio
        |FROM p""".stripMargin) {
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val g = Tables.events(s, d).groupBy("user_id")
          .agg(count(lit(1)).as("m"))
          .localCheckpoint() // ranking + totals share the one agg
        val tot = g.agg(count(lit(1)).as("n"), sum("m").as("nr"),
          max("m").as("mx"))
        val ranked = g.withColumn("rn",
          row_number().over(Window.orderBy("m", "user_id")))
        ranked.crossJoin(broadcast(tot))
          .agg(max("n").as("nk"), max("nr").as("nrr"), max("mx").as("mxx"),
            max(when(col("rn") === floor((col("n") + 1) / 2), col("m"))).as("p50"),
            max(when(col("rn") === greatest(lit(1L),
              floor(col("n") * 99 / 100)), col("m"))).as("p99"))
          .select(col("nk").cast("long").as("n_keys"),
            col("nrr").cast("long").as("n_rows"),
            col("mxx").cast("long").as("max_mass"),
            col("p50").cast("long").as("p50_mass"),
            col("p99").cast("long").as("p99_mass"),
            round(col("mxx").cast("double") * col("nk") / col("nrr"), 6)
              .as("skew_ratio"))
      }
    },

    // ---- k04: deterministic stable-key minting --------------------------------
    // Mint ODK-shaped uuid: keys from the natural key via namespaced
    // md5 (UUIDv3 by construction): re-runs produce the SAME key, so
    // landings stay idempotent — the anti-pattern this replaces is a
    // random UUID per run. The uniqueness audit rides a count-over-key
    // window (any md5 collision or namespace bug flips is_unique and
    // breaks the pinned TRUE). Narrow projection + one key-hashed
    // window; at 100 TB mint on write and store, don't re-derive.
    // ---- K5: SCD2 interval-integrity audit ------------------------------------
    // The data-quality gate in front of j29's point-in-time lookup: a
    // version dimension is only trustworthy if every key's validity
    // intervals are gap-free and non-overlapping. Fixture = the j29
    // dimension with DETERMINISTIC defects injected (%11==5 keys get a
    // 30-day gap, %13==6 keys a 30-day overlap); the audit is one lag
    // window over (key, valid_from) — date compares only, no doubles —
    // emitting one row per defective key with the defect class. At
    // scale: one exchange on the key, output is defect-cardinality.
    Query("k05_interval_integrity",
      """WITH dim AS (
        |  SELECT c_custkey, DATE '1992-01-01' AS valid_from,
        |         CASE WHEN c_custkey % 3 = 0
        |              THEN DATE '1995-01-01' + CAST(c_custkey % 1000 AS INT)
        |              ELSE DATE '9999-12-31' END AS valid_to
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey,
        |         DATE '1995-01-01' + CAST(c_custkey % 1000 AS INT)
        |           + CASE WHEN c_custkey % 11 = 5 THEN 30
        |                  WHEN c_custkey % 13 = 6 THEN -30 ELSE 0 END,
        |         DATE '9999-12-31'
        |  FROM customer WHERE c_custkey % 3 = 0),
        |lagged AS (
        |  SELECT c_custkey, valid_from,
        |         lag(valid_to) OVER (PARTITION BY c_custkey
        |                             ORDER BY valid_from) AS prev_to
        |  FROM dim),
        |defects AS (
        |  SELECT c_custkey,
        |         CASE WHEN valid_from > prev_to THEN 'gap'
        |              WHEN valid_from < prev_to THEN 'overlap' END AS defect
        |  FROM lagged WHERE prev_to IS NOT NULL AND valid_from <> prev_to)
        |SELECT c_custkey, defect FROM defects""".stripMargin) {
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val c = Tables.customer(s, d)
        val base = lit(java.sql.Date.valueOf("1995-01-01"))
        val change = date_add(base, (col("c_custkey") % 1000).cast("int"))
        val far = lit(java.sql.Date.valueOf("9999-12-31"))
        val v1 = c.select(col("c_custkey"),
          lit(java.sql.Date.valueOf("1992-01-01")).as("valid_from"),
          when(col("c_custkey") % 3 === 0, change).otherwise(far).as("valid_to"))
        val v2 = c.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"),
            date_add(change,
              when(col("c_custkey") % 11 === 5, 30)
                .when(col("c_custkey") % 13 === 6, -30)
                .otherwise(0)).as("valid_from"),
            far.as("valid_to"))
        val w = Window.partitionBy("c_custkey").orderBy("valid_from")
        v1.unionByName(v2)
          .withColumn("prev_to", lag("valid_to", 1).over(w))
          .filter(col("prev_to").isNotNull
            && col("valid_from") =!= col("prev_to"))
          .select(col("c_custkey"),
            when(col("valid_from") > col("prev_to"), "gap")
              .when(col("valid_from") < col("prev_to"), "overlap")
              .as("defect"))
      }
    },

    Query("k04_mint_stable_keys",
      """WITH m AS (
        |  SELECT o_orderkey,
        |         md5('graft:order:' || CAST(o_orderkey AS VARCHAR)) AS h
        |  FROM orders),
        |k AS (
        |  SELECT o_orderkey,
        |         'uuid:' || substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-'
        |           || substr(h, 13, 4) || '-' || substr(h, 17, 4) || '-'
        |           || substr(h, 21, 12) AS stable_key
        |  FROM m)
        |SELECT o_orderkey, stable_key,
        |       count(*) OVER (PARTITION BY stable_key) = 1 AS is_unique
        |FROM k""".stripMargin) {
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        Tables.orders(s, d)
          .select(col("o_orderkey"),
            OdkKeys.mintKey("graft:order", col("o_orderkey")).as("stable_key"))
          .withColumn("is_unique",
            count(lit(1)).over(Window.partitionBy("stable_key")) === 1)
      }
    },

    // ---- k03: dimension surrogate keys ---------------------------------------
    // The warehouse key pattern: stable dense surrogate ids for a
    // natural key, assigned on the DIMENSION (distinct natural keys),
    // then joined back to the facts. The scale shape: the global-order
    // window runs over the dim table only (group-cardinality rows —
    // here 125; a surrogate ranked over the FACTS would be a
    // single-partition sort at 100 TB), and the sk map broadcasts back.
    Query("k03_surrogate_key",
      """WITH dim AS (
        |  SELECT DISTINCT n_name AS nation, c_mktsegment AS seg
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |sk AS (
        |  SELECT nation, seg,
        |         CAST(row_number() OVER (ORDER BY nation, seg) AS INT) AS sk
        |  FROM dim)
        |SELECT s.sk, s.nation, s.seg, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN sk s ON s.nation = n_name AND s.seg = c_mktsegment
        |GROUP BY 1, 2, 3""".stripMargin) {
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val facts = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nation"), col("c_mktsegment").as("seg"))
        val sk = facts.distinct()
          .withColumn("sk", row_number().over(Window.orderBy("nation", "seg")))
        facts.join(broadcast(sk), Seq("nation", "seg"))
          .groupBy("sk", "nation", "seg").agg(count(lit(1)).as("n"))
          .select("sk", "nation", "seg", "n")
      }
    }
  )
}
