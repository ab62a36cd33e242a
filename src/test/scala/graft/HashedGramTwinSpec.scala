package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Twin equivalence for the SPARK_GRAFT_HASHED_GRAMS production
  * variants of t20/t41: hashed 8-byte gram keys must reproduce the
  * string-keyed results exactly on real data (a divergence would mean
  * a 64-bit collision — ~2^-64 per pair — or a kernel bug).
  *
  * The spec runs both forms directly (not via the env flag, which is
  * fixed at JVM start) against sf0.001 documents.
  */
class HashedGramTwinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("t20 twin: hashed window counts == string window counts") {
    val docs = Tables.documents(spark, sf)
    val str = docs
      .select(explode(array_distinct(transform(
          sequence(lit(1), greatest(length(col("text")) - 39, lit(1))),
          i => col("text").substr(i, lit(40))))).as("win"))
      .groupBy("win").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
    val hashed = graft.operators.Dedup.dupSubstringsHashed(
      docs, "doc_id", "text", 40, 2)
    // identical row count and identical multiset of n_docs values
    assert(str.count() == hashed.count())
    val sm = str.groupBy("n_docs").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hm = hashed.groupBy("n_docs").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sm == hm, s"string=$sm hashed=$hm")
  }

  test("t41 twin: hashed gram battery == string gram battery, per doc") {
    val docs = Tables.documents(spark, sf)
    def battery(hashKeys: Boolean) = {
      import graft.functions.TextFunctions.bind1
      val grams =
        if (hashKeys) bind1(split(col("text"), " ")) { w =>
          flatten(transform(sequence(lit(2), lit(8)), n =>
            when(size(w) >= n,
              transform(sequence(lit(1), size(w) - n + 1),
                i => struct(n.as("n"),
                  xxhash64(array_join(slice(w, i.cast("int"), n.cast("int")), " "))
                    .as("g"))))
              .otherwise(array().cast("array<struct<n:int,g:bigint>>"))))
        }
        else bind1(split(col("text"), " ")) { w =>
          flatten(transform(sequence(lit(2), lit(8)), n =>
            when(size(w) >= n,
              transform(sequence(lit(1), size(w) - n + 1),
                i => struct(n.as("n"),
                  array_join(slice(w, i.cast("int"), n.cast("int")), " ").as("g"))))
              .otherwise(array().cast("array<struct<n:int,g:string>>"))))
        }
      docs.select(col("doc_id"), explode(grams).as("gr"))
        .groupBy(col("doc_id"), col("gr.n").as("n"), col("gr.g").as("g"))
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id", "n").agg(
          max(col("c")).as("topc"),
          sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dupc"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
    }
    val s = battery(hashKeys = false)
    val h = battery(hashKeys = true)
    assert(s == h, s"diff keys: ${(s.keySet union h.keySet).filter(k => s.get(k) != h.get(k)).take(5)}")
  }

  test("t41 local form: fan-out-only registry default == string-gram groupBy twin, all columns") {
    // t41 (sorted-gram run-length aggregate within the row) and t46 (the
    // exchange form) must be row-identical end to end
    val local = rows(SparkEntry.queries("t41_gopher_repetition")(spark, sf))
    val twin = rows(SparkEntry.queries("t46_gopher_strgram_twin")(spark, sf))
    assert(local == twin)
    // and the plan stays a per-row projection: the ONLY exchange allowed
    // is Par.fanOut's deliberate REPARTITION_BY_NUM above the scan
    // (round-15 optimization — the battery's heavy map side would
    // otherwise run in the single-row-group scan's one task); no
    // aggregate/join shuffle may appear. (This spec asserted
    // "no Exchange at all" until round 16 — it predated the fan-out and
    // was round 15's tests_ok failure.)
    val plan = SparkEntry.queries("t41_gopher_repetition")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected at most the fan-out exchange:\n$plan")
    if (exchanges == 1)
      assert(plan.contains("REPARTITION_BY_NUM"),
        s"the single exchange must be the deliberate fan-out:\n$plan")
  }
}
