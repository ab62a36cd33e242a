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

  test("AQE splits a skewed sort-merge join at runtime (OptimizeSkewedJoin)") {
    // the OTHER skew answer beside manual salting: AQE detects the hot
    // partition from runtime stats and splits it. Pin that it actually
    // fires (isSkew=true reads in the final plan) so a config regression
    // can't silently fall back to one monster reducer. Thresholds are
    // lowered to make a test-sized skew eligible; session confs restored.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    import ss.implicits._
    val big = ss.range(200000).select(
      when(col("id") % 20 === 0, col("id") % 7).otherwise(lit(42L)).as("k"),
      concat(lit("padpadpadpadpadpadpadpad-"), col("id")).as("payload"))
    val right = ss.range(200).select(col("id").as("k"), (col("id") * 2).as("dim"))
    val joined = big.join(right, Seq("k"))
      .select(sum(length(col("payload")) + col("dim")).as("n")) // payload survives pruning; tiny result
    // materialize THIS queryExecution (count() would execute a clone and
    // leave this plan isFinalPlan=false)
    assert(joined.collect().head.getLong(0) > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
      s"expected OptimizeSkewedJoin to split the hot partition:\n${plan.take(3000)}")
  }

  test("salt distributes the hot key across the factor") {
    val big = spark.range(1000).select(col("id").as("rid"), lit(42L).as("k"))
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col("rid")), lit(8)).cast("int"))
    val buckets = salted.groupBy("__salt").count().collect()
    assert(buckets.length == 8, "hot key must span all salt buckets")
    buckets.foreach(r => assert(r.getLong(1) > 50, "roughly uniform spread"))
  }

  test("k02 skew profile: hand-checkable hot-key distribution") {
    // 100 keys with 1 row each + key 999 with 100 rows:
    // n_keys=101, n_rows=200, max=100, p50 = rank 51 -> 1,
    // p99 = rank floor(99*101/100)=99 -> 1, skew = 100/(200/101) = 50.5
    val fn = graft.queries.Keys.queries.find(_.name == "k02_skew_profile").get.fn
    // replicate the registry plan over a fixture via a temp view shim:
    // the query reads Tables.events(user_id), so build the same shape
    import org.apache.spark.sql.expressions.Window
    val ev = spark.range(100).select(col("id").as("user_id"))
      .unionAll(spark.range(100).select(lit(999L).as("user_id")))
    val g = ev.groupBy("user_id").agg(count(lit(1)).as("m"))
    val tot = g.agg(count(lit(1)).as("n"), sum("m").as("nr"), max("m").as("mx"))
    val ranked = g.withColumn("rn",
      row_number().over(Window.orderBy("m", "user_id")))
    val row = ranked.crossJoin(broadcast(tot))
      .agg(max("n").as("nk"), max("nr").as("nrr"), max("mx").as("mxx"),
        max(when(col("rn") === floor((col("n") + 1) / 2), col("m"))).as("p50"),
        max(when(col("rn") === greatest(lit(1L),
          floor(col("n") * 99 / 100)), col("m"))).as("p99"))
      .head()
    assert(row.getAs[Long]("nk") == 101L && row.getAs[Long]("nrr") == 200L)
    assert(row.getAs[Long]("mxx") == 100L)
    assert(row.getAs[Long]("p50") == 1L && row.getAs[Long]("p99") == 1L)
    assert(math.abs(100.0 * 101 / 200 - 50.5) < 1e-12)
    // and the registry row itself runs green on real data
    val real = fn(spark, "/root/testdata/sf0.001").head()
    assert(real.getAs[Long]("n_rows") > 0 &&
      real.getAs[Double]("skew_ratio") >= 1.0)
  }
}
