package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Pins for the Morton-order layout key: bijection, quadrant locality,
  * and the physical property the 100 TB skipping argument rests on —
  * a z-ordered write gives every file a tight span in BOTH dimensions.
  */
class ZOrderSpec extends SparkSpec {

  test("interleave16 round-trips every (x, y) in a random 16-bit sample") {
    val t = df("""SELECT CAST(id AS BIGINT) AS x,
                 |       CAST((id * 48271) % 65536 AS BIGINT) AS y
                 |FROM range(0, 2000)""".stripMargin)
    val z = ZOrder.interleave16(col("x"), col("y"))
    val (dx, dy) = ZOrder.deinterleave16(col("z"))
    val bad = t.select(col("x"), col("y"), z.as("z"))
      .select(col("x"), col("y"), dx.as("rx"), dy.as("ry"))
      .filter(col("x") =!= col("rx") || col("y") =!= col("ry"))
      .count()
    assert(bad == 0L)
  }

  test("top 2k bits of z are the interleave of the top k bits (quadrants)") {
    // => a contiguous z-range bucket is a TILE: both dimensions span at
    // most 2^(16-k) inside a bucket of the top-2k-bit prefix
    val t = df("""SELECT CAST(id * 17 % 65536 AS BIGINT) AS x,
                 |       CAST((id * 25173 + 13849) % 65536 AS BIGINT) AS y
                 |FROM range(0, 4000)""".stripMargin)
    val z = ZOrder.interleave16(col("x"), col("y"))
    val k = 3 // 8 buckets per axis -> 64 tiles from the top 6 z-bits
    val byTile = t.select(col("x"), col("y"), shiftright(z, 32 - 2 * k).as("tile"))
      .groupBy("tile")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
    val worst = byTile.agg(max("sx"), max("sy")).head()
    val bound = 1L << (16 - k) // 8192
    assert(worst.getLong(0) < bound && worst.getLong(1) < bound)
  }

  test("z-ordered write yields per-file min/max tiles on both dimensions") {
    val dir = graft.core.TempDirs.scratch("graft_zorder_").toString
    val t = df("""SELECT CAST((id * 48271) % 65536 AS BIGINT) AS cust,
                 |       CAST((id * 25173 + 13849) % 65536 AS BIGINT) AS day,
                 |       id AS payload
                 |FROM range(0, 20000)""".stripMargin)
    ZOrder.writeZOrdered(t, "cust", "day", dir, numFiles = 16)
    val back = spark.read.parquet(dir)
      .select(col("cust"), col("day"), input_file_name().as("f"))
    val spans = back.groupBy("f")
      .agg((max("cust") - min("cust")).as("sc"), (max("day") - min("day")).as("sd"))
      .collect()
    // 16 z-range files over uniform data: each file covers ~1/16 of the
    // z-space, i.e. about a quarter of EACH axis (plus boundary slop).
    // An unordered or single-dimension sort would put ~full-range spans
    // (65535) in one of the dimensions for every file.
    val full = 65536L
    val loose = spans.count(r => r.getLong(1) > full * 3 / 4 && r.getLong(2) > full * 3 / 4)
    assert(spans.length >= 8, s"expected >=8 files, got ${spans.length}")
    assert(loose <= spans.length / 4,
      s"too many files span most of BOTH dimensions: $loose of ${spans.length}")
    // and on average the per-file area is a small fraction of the domain
    val avgArea = spans.map(r => (r.getLong(1).toDouble / full) * (r.getLong(2).toDouble / full))
      .sum / spans.length
    assert(avgArea < 0.25, s"avg per-file area fraction $avgArea not tile-like")
  }
}
