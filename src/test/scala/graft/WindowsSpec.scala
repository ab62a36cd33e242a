package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows

class WindowsSpec extends SparkSpec {

  private def orders = df(
    """SELECT cust, ok, d, CAST(price AS DOUBLE) AS price FROM VALUES
      |  ('c1', 1, DATE'2024-01-01', 10.0),
      |  ('c1', 2, DATE'2024-02-01', 20.0),
      |  ('c1', 3, DATE'2024-02-01', 30.0),
      |  ('c2', 4, DATE'2024-03-01', 40.0)
      |  t(cust, ok, d, price)""".stripMargin)

  test("latestPerGroup keeps single greatest row with tiebreak") {
    val out = Windows.latestPerGroup(orders, Seq("cust"), Seq(col("d"), col("ok")))
    assert(rows(out.select("cust", "ok")) == Set(Seq("c1", 3), Seq("c2", 4)))
  }

  test("firstPerGroup keeps single least row") {
    val out = Windows.firstPerGroup(orders, Seq("cust"), Seq(col("d"), col("ok")))
    assert(rows(out.select("cust", "ok")) == Set(Seq("c1", 1), Seq("c2", 4)))
  }

  test("topKPerGroup keeps k rows ranked desc") {
    val out = Windows.topKPerGroup(orders, Seq("cust"), Seq(col("price")), 2)
    assert(rows(out.select("cust", "ok")) == Set(Seq("c1", 3), Seq("c1", 2), Seq("c2", 4)))
  }

  test("seededShuffleRank is deterministic across partitionings") {
    val base = spark.range(1000).select(
      (col("id") % 7).cast("string").as("grp"), col("id").cast("string").as("id"))
    val a = Windows.seededShuffleRank(base.repartition(1), Seq("grp"), "id", seed = 17)
    val b = Windows.seededShuffleRank(base.repartition(13), Seq("grp"), "id", seed = 17)
    assert(rows(a) == rows(b))
    val c = Windows.seededShuffleRank(base, Seq("grp"), "id", seed = 18)
    assert(rows(a) != rows(c), "different seed must give a different permutation")
    // rank is a 1..n permutation within each group
    val perGroup = a.groupBy("grp").agg(count(lit(1)).as("n"),
      max("randomization_number").as("mx"), min("randomization_number").as("mn"),
      countDistinct("randomization_number").as("nd")).collect()
    perGroup.foreach { r =>
      val (n, mx, mn, nd) = (r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4))
      assert(mn == 1 && mx.toLong == n && nd == n)
    }
  }

  test("forwardFill fills nulls downward per key") {
    val d = df(
      """SELECT * FROM VALUES
        |  ('a', 1, 'x'), ('a', 2, CAST(NULL AS STRING)), ('a', 3, 'y'),
        |  ('b', 1, CAST(NULL AS STRING)), ('b', 2, 'z')
        |  t(k, i, v)""".stripMargin)
    val out = Windows.forwardFill(d, Seq("k"), Seq(col("i")), Seq("v"))
    assert(rows(out) == Set(
      Seq("a", 1, "x"), Seq("a", 2, "x"), Seq("a", 3, "y"),
      Seq("b", 1, null), Seq("b", 2, "z")))
  }

  test("countOver adds group size without reducing rows") {
    val out = Windows.countOver(orders, Seq("cust"))
    assert(out.count() == 4)
    assert(rows(out.select("cust", "n")) == Set(Seq("c1", 3L), Seq("c2", 1L)))
  }

  test("cumSum runs within key in order") {
    val out = Windows.cumSum(orders, Seq("cust"), Seq(col("d"), col("ok")),
      col("price"), "run")
    assert(rows(out.select("ok", "run")) ==
      Set(Seq[Any](1, 10.0), Seq[Any](2, 30.0), Seq[Any](3, 60.0), Seq[Any](4, 40.0)))
  }
}
