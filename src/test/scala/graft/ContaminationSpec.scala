package graft

import org.apache.spark.sql.functions._

/** Pins for the wave-4 audit pair: t40's cross-split chunk leakage and
  * m06's banded-dHash near-dup completeness.
  */
class ContaminationSpec extends SparkSpec {

  test("t40 chunking: a shared 12-token passage across splits is caught") {
    val passage = (1 to 12).map(i => s"tok$i").mkString(" ")
    val t = df(s"""SELECT CAST(id AS BIGINT) AS doc_id, split, text FROM VALUES
                  |  (1, 'train', '$passage extra words here'),
                  |  (2, 'test',  '$passage'),
                  |  (3, 'test',  'completely different content body') v(id, split, text)""".stripMargin)
    val chunks = graft.functions.TextFunctions.bind1(split(col("text"), " ")) { w =>
      when(size(w) >= 1,
        transform(sequence(lit(0L), ceil(size(w) / 12.0).cast("long") - 1),
          ci => md5(array_join(slice(w, (ci * 12 + 1).cast("int"), lit(12)), " "))))
        .otherwise(array().cast("array<string>"))
    }
    val hs = t.select(col("doc_id"), col("split"), explode(chunks).as("h"))
      .groupBy("h", "split").agg(countDistinct("doc_id").as("n"))
    val b = hs.select(col("h").as("bh"), col("split").as("split_b"), col("n").as("bn"))
    val leaks = hs.join(b, col("h") === col("bh") && col("split") < col("split_b"))
      .collect()
    // exactly one leaked chunk (the shared first 12 tokens of docs 1/2)
    assert(leaks.length == 1)
    assert(leaks.head.getAs[String]("split") == "test" &&
      leaks.head.getAs[String]("split_b") == "train")
  }

  test("m06 pigeonhole: hamming <= 3 implies a shared 16-bit band") {
    // place k bit errors in the worst spread across 4 bands; for k <= 3
    // some band must be untouched, for k = 4 all bands can differ
    def bands(x: Long) = (0 until 4).map(i => (x >> (i * 16)) & 0xffffL)
    val base = 0x123456789abcdefL
    for (k <- 0 to 3) {
      val corrupted = (0 until k).foldLeft(base)((v, i) => v ^ (1L << (i * 16)))
      assert(bands(base).zip(bands(corrupted)).exists(p => p._1 == p._2),
        s"k=$k must leave a clean band")
    }
    val all4 = (0 until 4).foldLeft(base)((v, i) => v ^ (1L << (i * 16)))
    assert(!bands(base).zip(bands(all4)).exists(p => p._1 == p._2))
  }

  test("m06 band extraction round-trips the hex dhash") {
    val t = df("SELECT '0123456789abcdef' AS dhash")
    def bandVal(c: org.apache.spark.sql.Column, i: Int) =
      conv(substring(c, i * 4 + 1, 4), 16, 10).cast("long")
    val r = t.select((0 until 4).map(i => bandVal(col("dhash"), i).as(s"b$i")): _*)
      .head()
    assert(r.getLong(0) == 0x0123L && r.getLong(1) == 0x4567L &&
      r.getLong(2) == 0x89abL && r.getLong(3) == 0xcdefL)
  }
}
