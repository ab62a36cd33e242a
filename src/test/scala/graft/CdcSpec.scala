package graft

import graft.operators.Cdc

/** Cdc.applyChanges pins: last-write-wins compaction, delete/upsert/
  * insert/pass-through paths, and payload-name validation.
  */
class CdcSpec extends SparkSpec {

  private def base = df(
    """SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'c') t(k, v)""")

  test("latest change wins; D deletes, U upserts, absent keys insert") {
    val changes = df(
      """SELECT * FROM VALUES
        |  (1, 'U', 'x1', 10), (1, 'D', CAST(NULL AS STRING), 20),
        |  (2, 'D', CAST(NULL AS STRING), 10), (2, 'U', 'y2', 20),
        |  (4, 'U', 'z4', 10)
        |t(k, op, v, ordk)""".stripMargin)
    val out = Cdc.applyChanges(base, changes, Seq("k"), "op", "ordk")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(
      (2, "y2", "upsert"), // D then U: the later U resurrects the key
      (3, "c", "base"),    // untouched
      (4, "z4", "upsert")  // insert: key absent from base
    ), s"got $out")        // key 1: U then D => deleted
  }

  test("empty feed passes the base through unchanged") {
    val changes = df(
      """SELECT * FROM VALUES (9, 'U', 'q', 1) t(k, op, v, ordk)
        |WHERE FALSE""".stripMargin)
    val out = Cdc.applyChanges(base, changes, Seq("k"), "op", "ordk")
    assert(out.filter("cdc_src = 'base'").count() == 3L && out.count() == 3L)
  }

  test("payload columns missing from base are rejected") {
    val changes = df("SELECT 1 AS k, 'U' AS op, 'x' AS nope, 1 AS ordk")
    intercept[IllegalArgumentException] {
      Cdc.applyChanges(base, changes, Seq("k"), "op", "ordk")
    }
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, null-safe") {
    val v1 = df(
      """SELECT * FROM VALUES
        |  (1, 'a'), (2, 'b'), (3, CAST(NULL AS STRING)), (4, 'd'), (5, CAST(NULL AS STRING))
        |t(k, v)""".stripMargin)
    val v2 = df(
      """SELECT * FROM VALUES
        |  (1, 'a'), (2, 'B'), (3, CAST(NULL AS STRING)), (5, 'now'), (6, 'new')
        |t(k, v)""".stripMargin)
    val out = Cdc.snapshotDiff(v1, v2, Seq("k")).collect()
      .map(r => r.getInt(0) -> r.getAs[String]("status")).toMap
    assert(out == Map(
      1 -> "unchanged", 2 -> "changed",
      3 -> "unchanged", // NULL <=> NULL payload is present and equal
      4 -> "removed", 5 -> "changed", 6 -> "added"))
  }

  test("snapshotDiff carries both payload versions and rejects schema drift") {
    val v1 = df("SELECT 1 AS k, 'old' AS v")
    val v2 = df("SELECT 1 AS k, 'new' AS v")
    val row = Cdc.snapshotDiff(v1, v2, Seq("k")).head()
    assert(row.getAs[String]("_old_v") == "old" && row.getAs[String]("_new_v") == "new")
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(v1, df("SELECT 1 AS k, 'x' AS other"), Seq("k"))
    }
  }

  test("hashChain: heads are order-sensitive tamper evidence") {
    import org.apache.spark.sql.functions._
    val d = df(
      """SELECT * FROM VALUES
        |  (1L, 1L, 'p1'), (1L, 2L, 'p2'), (1L, 3L, 'p3'),
        |  (2L, 1L, 'p1'), (2L, 2L, 'p2'), (2L, 3L, 'p3')
        |t(k, ord, p)""".stripMargin)
    def heads(data: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Cdc.hashChain(data, "k", Seq("ord"), "p")
        .groupBy("k").agg(max_by(col("chain"), col("ord")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val h0 = heads(d)
    // identical histories chain to identical heads
    assert(h0(1L) == h0(2L))
    // the head equals a manual md5 fold of the same sequence
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(h0(1L) == md5(md5(md5("g:p1") + ":p2") + ":p3"))
    // an EDIT anywhere changes the head
    val edited = df(
      """SELECT * FROM VALUES (1L, 1L, 'p1'), (1L, 2L, 'pX'), (1L, 3L, 'p3')
        |t(k, ord, p)""".stripMargin)
    assert(heads(edited)(1L) != h0(1L))
    // a REORDER of the same payload multiset changes the head
    val reordered = df(
      """SELECT * FROM VALUES (1L, 1L, 'p2'), (1L, 2L, 'p1'), (1L, 3L, 'p3')
        |t(k, ord, p)""".stripMargin)
    assert(heads(reordered)(1L) != h0(1L))
    // a DELETION changes the head
    val truncated = df(
      """SELECT * FROM VALUES (1L, 1L, 'p1'), (1L, 2L, 'p2') t(k, ord, p)""")
    assert(heads(truncated)(1L) != h0(1L))
  }

  test("hashChain rejects NULL payloads with a descriptive error") {
    // a null payload has no cross-engine hash encoding (SQL '||'
    // nullifies the chain; any in-engine sentinel silently diverges) —
    // the operator must fail loudly, not pick one (ADVICE r10)
    val d = df(
      """SELECT * FROM VALUES (1L, 1L, 'p1'), (1L, 2L, CAST(NULL AS STRING))
        |t(k, ord, p)""".stripMargin)
    val e = intercept[Throwable] {
      Cdc.hashChain(d, "k", Seq("ord"), "p").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("hashChain: NULL payload")), e)
  }
}
