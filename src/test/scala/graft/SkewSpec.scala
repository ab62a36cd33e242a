package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("saltedJoin equals plain join on skewed data (inner and left)") {
    // 10k rows, 90% on one hot key
    val big = spark.range(10000).select(
      col("id").as("rid"),
      when(col("id") % 10 === 0, col("id") % 7).otherwise(lit(42L)).as("k"),
      (col("id") * 3).as("payload"))
    val small = spark.range(50).select(col("id").as("k"), (col("id") * 100).as("dim"))
    val plainInner = big.join(small, "k")
      .select("rid", "k", "payload", "dim")
    val saltedInner = Skew.saltedJoin(big, small, "k", "rid", factor = 8)
      .select("rid", "k", "payload", "dim")
    assert(rows(saltedInner) == rows(plainInner))
    val plainLeft = big.join(small, Seq("k"), "left").select("rid", "k", "payload", "dim")
    val saltedLeft = Skew.saltedJoin(big, small, "k", "rid", 8, "left")
      .select("rid", "k", "payload", "dim")
    assert(rows(saltedLeft) == rows(plainLeft))
  }

  test("salt distributes the hot key across the factor") {
    val big = spark.range(1000).select(col("id").as("rid"), lit(42L).as("k"))
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col("rid")), lit(8)).cast("int"))
    val buckets = salted.groupBy("__salt").count().collect()
    assert(buckets.length == 8, "hot key must span all salt buckets")
    buckets.foreach(r => assert(r.getLong(1) > 50, "roughly uniform spread"))
  }
}
