package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Reshape, Sanitize, Standardize}

/** Property tests (SURVEY §5.2): invariants that must hold for ANY input.
  * Drives scalacheck generators directly with fixed seeds (the
  * scalatest-scalacheck bridge isn't on the offline classpath) — same
  * coverage, reproducible cases.
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("jitter: displacement magnitude is exactly r for every key and seed") {
    val gen = for {
      keys <- Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty)).map(_.distinct)
      seed <- Gen.chooseNum(1L, 99999L)
    } yield (keys, seed)
    samples(gen, 8).foreach { case (keys, seed) =>
      import scala.jdk.CollectionConverters._
      val d = spark.createDataFrame(
        keys.map(k => org.apache.spark.sql.Row(k, 36.0, -1.0)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("lon", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("lat", org.apache.spark.sql.types.DoubleType))))
      Sanitize.jitterLocation(d, "k", "lon", "lat", r = 0.01, seed = seed)
        .collect().foreach { r =>
          val (dx, dy) = (r.getDouble(1) - 36.0, r.getDouble(2) + 1.0)
          assert(math.abs(math.sqrt(dx * dx + dy * dy) - 0.01) < 1e-12)
        }
    }
  }

  test("standardizeCase is idempotent on arbitrary printable strings") {
    val gen = Gen.listOfN(8, Gen.asciiPrintableStr)
    samples(gen, 8).foreach { strs =>
      val sp = spark; import sp.implicits._
      val d = strs.toDF("s")
      val once = d.select(Standardize.standardizeCase(col("s")).as("v"))
      val twice = once.select(Standardize.standardizeCase(col("v")).as("v"))
      assert(once.collect().toSeq == twice.collect().toSeq)
    }
  }

  test("unionAligned: column superset, null-filled, row count preserved") {
    val colsGen = Gen.someOf(Seq("a", "b", "c", "d")).suchThat(_.nonEmpty)
    val gen = for { c1 <- colsGen; c2 <- colsGen } yield (c1.toSeq, c2.toSeq)
    samples(gen, 8).foreach { case (c1, c2) =>
      def mk(cols: Seq[String]) =
        spark.sql(s"SELECT ${cols.map(c => s"1 AS $c").mkString(", ")}")
      val u = Reshape.unionAligned(Seq(mk(c1), mk(c2)))
      assert(u.columns.toSet == c1.toSet ++ c2.toSet)
      assert(u.count() == 2)
      val rowsArr = u.collect()
      u.columns.filterNot(c1.contains)
        .foreach(c => assert(rowsArr(0).isNullAt(u.columns.indexOf(c))))
      u.columns.filterNot(c2.contains)
        .foreach(c => assert(rowsArr(1).isNullAt(u.columns.indexOf(c))))
    }
  }

  test("exact dedup groups: copies sum to row count, one group per distinct text") {
    val gen = Gen.listOfN(20, Gen.oneOf("x", "y", "z", "w"))
    samples(gen, 8).foreach { texts =>
      val sp = spark; import sp.implicits._
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val groups = graft.operators.Dedup.exactGroups(d, "id", "text")
      assert(groups.agg(sum("n_copies")).head().getLong(0) == texts.length)
      assert(groups.count() == texts.distinct.length)
    }
  }
}
