package graft

import org.apache.spark.sql.functions._
import graft.operators.Sanitize

class SanitizeSpec extends SparkSpec {

  test("dropPii drops denylist and regex matches, ignores absent") {
    val d = df("SELECT 1 AS firstname, 2 AS phone_number, 3 AS keepme")
    val out = Sanitize.dropPii(d, Seq("firstname", "notthere"), Seq(".*phone.*"))
    assert(out.columns.toSeq == Seq("keepme"))
  }

  test("hashIds sha1-hashes present id columns only") {
    val d = df("SELECT 'abc' AS extid, 'v' AS other")
    val out = Sanitize.hashIds(d, Seq("extid", "absent"))
    // known sha1("abc")
    assert(out.head().getString(0) == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(out.head().getString(1) == "v")
  }

  test("hashIds sha256 variant matches the known digest; bad algo rejected") {
    val d = df("SELECT 'abc' AS extid")
    val out = Sanitize.hashIds(d, Seq("extid"), algo = "sha256")
    assert(out.head().getString(0) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    intercept[IllegalArgumentException] {
      Sanitize.hashIds(d, Seq("extid"), algo = "crc32")
    }
  }

  test("pruneEmptyColumns drops all-null columns") {
    val d = df("SELECT * FROM VALUES (1, CAST(NULL AS STRING)), (2, CAST(NULL AS STRING)) t(a, b)")
    assert(Sanitize.pruneEmptyColumns(d).columns.toSeq == Seq("a"))
  }

  test("jitterLocation: fixed displacement per key, constant radius, deterministic") {
    val d = df(
      """SELECT hhid, CAST(lon AS DOUBLE) AS lon, CAST(lat AS DOUBLE) AS lat
        |FROM VALUES ('h1', 36.8, -1.3), ('h1', 36.9, -1.4), ('h2', 36.8, -1.3)
        |  t(hhid, lon, lat)""".stripMargin)
    val out = Sanitize.jitterLocation(d, "hhid", "lon", "lat", r = 0.01, seed = 1001L)
    val got = out.select("hhid", "lon", "lat").collect()
    val orig = d.collect()
    // radius exactly r for every row
    got.zip(orig).foreach { case (j, o) =>
      val dx = j.getDouble(1) - o.getDouble(1)
      val dy = j.getDouble(2) - o.getDouble(2)
      assert(math.abs(math.sqrt(dx * dx + dy * dy) - 0.01) < 1e-12)
    }
    // same key → same displacement vector
    val d1 = (got(0).getDouble(1) - orig(0).getDouble(1), got(0).getDouble(2) - orig(0).getDouble(2))
    val d2 = (got(1).getDouble(1) - orig(1).getDouble(1), got(1).getDouble(2) - orig(1).getDouble(2))
    assert(d1 == d2)
    // different key → (almost surely) different vector
    val d3 = (got(2).getDouble(1) - orig(2).getDouble(1), got(2).getDouble(2) - orig(2).getDouble(2))
    assert(d1 != d3)
    // rerun identical
    val again = Sanitize.jitterLocation(d, "hhid", "lon", "lat", r = 0.01, seed = 1001L)
    assert(rows(again) == rows(Sanitize.jitterLocation(d, "hhid", "lon", "lat", r = 0.01, seed = 1001L)))
  }

  test("maskExceptions nulls non-kept columns for listed keys only") {
    val d = df("SELECT * FROM VALUES ('k1', 'a', 1), ('k2', 'b', 2) t(key, secret, metric)")
    val out = Sanitize.maskExceptions(d, "key", Seq("k1"), keep = Seq("metric"))
    assert(rows(out) == Set(Seq("k1", null, 1), Seq("k2", "b", 2)))
  }

  test("kAnonymize suppresses QI cells of sub-k groups and flags them") {
    // group (10,'A') has 3 rows, (20,'B') has 1 — k=2 suppresses only the latter
    val d = df(
      """SELECT * FROM VALUES (1, 10, 'A'), (2, 10, 'A'), (3, 10, 'A'), (4, 20, 'B')
        |t(id, nation, seg)""".stripMargin)
    val out = Sanitize.kAnonymize(d, Seq("nation", "seg"), k = 2L)
      .select("id", "nation", "seg", "qi_group_n", "suppressed")
    assert(rows(out) == Set(
      Seq(1, 10, "A", 3L, false), Seq(2, 10, "A", 3L, false),
      Seq(3, 10, "A", 3L, false), Seq(4, null, null, 1L, true)))
    intercept[IllegalArgumentException] {
      Sanitize.kAnonymize(d, Seq("nope"), k = 2L)
    }
  }

  test("dpNoisyCount: seeded noise is reproducible, seed-sensitive, and bounded") {
    val d = df(
      """SELECT * FROM VALUES ('a', 'x', 100L), ('a', 'y', 50L), ('b', 'x', 7L)
        |t(g1, g2, n_true)""".stripMargin)
    def release(seed: String, eps: Double) =
      Sanitize.dpNoisyCount(d, Seq("g1", "g2"), eps, seed)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getAs[Double]("n_noisy") - r.getLong(2)))
        .toMap
    val r1 = release("s1", 0.5)
    assert(r1 == release("s1", 0.5), "same seed, same release")
    assert(r1 != release("s2", 0.5), "new seed, new draw")
    // 32-bit uniform bounds the inverse CDF: |noise| <= b * ln(2^31)
    assert(r1.values.forall(n => math.abs(n) <= 2.0 * math.log(2.147483648e9)))
    assert(r1.values.exists(n => n != 0.0), "noise actually perturbs")
    // b = 1/eps scales the draw linearly (same u): eps 1.0 halves eps 0.5
    val r2 = release("s1", 1.0)
    r1.foreach { case (k, n) => assert(math.abs(n - 2.0 * r2(k)) < 2e-6) }
  }

  test("kAnonymizeLadder: fine kept, coarse generalized, both-small suppressed") {
    // fine (nation, seg): ('a','X') has 2 rows -> fine at k=2;
    // ('b','X') and ('c','X') have 1 each but share region 'R2' -> the
    // residual coarse group ('R2','X') has 2 -> coarse;
    // ('d','Y') is alone at both levels -> suppressed
    val d = df(
      """SELECT * FROM VALUES
        |  (1, 'a', 'R1', 'X'), (2, 'a', 'R1', 'X'),
        |  (3, 'b', 'R2', 'X'), (4, 'c', 'R2', 'X'),
        |  (5, 'd', 'R3', 'Y')
        |t(id, nation, region, seg)""".stripMargin)
    val out = Sanitize.kAnonymizeLadder(d, Seq("nation", "seg"),
        Seq("region", "seg"), k = 2L)
      .select("id", "nation", "region", "seg", "anon_level")
    assert(rows(out) == Set(
      Seq(1, "a", "R1", "X", "fine"), Seq(2, "a", "R1", "X", "fine"),
      Seq(3, null, "R2", "X", "coarse"), Seq(4, null, "R2", "X", "coarse"),
      Seq(5, null, null, null, "suppressed")))
  }

  test("kAnonymizeLadder: coarse counts cover the RESIDUAL cohort only") {
    // region 'R1' has 3 rows total, but only ONE is residual (the other
    // two are fine) — a coarse count over the full population would
    // wrongly release it
    val d = df(
      """SELECT * FROM VALUES
        |  (1, 'a', 'R1', 'X'), (2, 'a', 'R1', 'X'), (3, 'b', 'R1', 'X')
        |t(id, nation, region, seg)""".stripMargin)
    val out = Sanitize.kAnonymizeLadder(d, Seq("nation", "seg"),
      Seq("region", "seg"), k = 2L)
    assert(out.filter(col("id") === 3).head().getAs[String]("anon_level")
      == "suppressed")
  }

  test("dpNoisyCount rejects non-positive epsilon") {
    val d = df("SELECT 'a' AS g, 1L AS n_true")
    intercept[IllegalArgumentException] {
      Sanitize.dpNoisyCount(d, Seq("g"), 0.0, "s")
    }
  }

  test("lDiversityAudit: homogeneous cohort fails, uniform cohort is maximal") {
    // cohort 'h': 3 rows, ONE sensitive value -> l=1, entropy_l = e^0 = 1
    // cohort 'u': 4 rows over 4 values -> l=4, entropy_l = e^{ln 4} = 4
    val d = df(
      """SELECT * FROM VALUES
        |  ('h', 's1'), ('h', 's1'), ('h', 's1'),
        |  ('u', 's1'), ('u', 's2'), ('u', 's3'), ('u', 's4')
        |t(qi, sens)""".stripMargin)
    val out = Sanitize.lDiversityAudit(d, Seq("qi"), "sens", l = 3L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out("h") == ((3L, 1L, 1.0, false)))
    val (un, ul, ue, ud) = out("u")
    assert(un == 4L && ul == 4L && ud)
    assert(math.abs(ue - 4.0) < 1e-4) // 6dp term rounding
  }

  test("randomizedResponse: bits flip only on the seeded coin and debias recovers") {
    val d = spark.range(0, 2000).toDF("id")
      .withColumn("b", (col("id") % 5 === 0).cast("int")) // true rate 0.2
    val out = Sanitize.randomizedResponse(d, "id", "b", pTruth = 0.75, "rr1")
    val agg = out.agg(sum("resp"), sum("b"), count(lit(1))).head()
    val (sr, sb, n) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    assert(sb == 400L)
    // debiased estimate within 5pp of truth at n=2000
    val piHat = (sr.toDouble / n - 0.25) / 0.5
    assert(math.abs(piHat - 0.2) < 0.05, s"piHat=$piHat")
    // same seed -> same responses; different seed -> different coins
    assert(rows(out) == rows(
      Sanitize.randomizedResponse(d, "id", "b", 0.75, "rr1")))
    assert(rows(out) != rows(
      Sanitize.randomizedResponse(d, "id", "b", 0.75, "rr2")))
    intercept[IllegalArgumentException] {
      Sanitize.randomizedResponse(d, "id", "b", 0.5, "s")
    }
  }
}
