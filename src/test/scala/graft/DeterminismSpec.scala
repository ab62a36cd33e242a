package graft

/** Meta-contract: registry queries must return identical results no
  * matter how the data is partitioned — silent nondeterminism is the
  * engine's biggest failure mode (it would surface as flaky oracle
  * mismatches at a different scale or cluster layout). Runs a
  * representative slice of the registry at sf0.001 under two different
  * shuffle-partition settings and compares full result sets.
  */
class DeterminismSpec extends SparkSpec {

  private val names = Seq(
    "a08_multi_metric", "a10_latest_per_group", "a16_flagship_dup_pipeline",
    "j06_resolution_set_delete", "j10_nearest_neighbor", "w02_seeded_shuffle",
    "w07_forward_fill", "w11_sessionize", "t04_fingerprint",
    "t06_near_dup_pairs", "s01_cosine_knn", "s03_minhash_lsh_neardup",
    "t11_stratified_sample", "g01_visit_targets", "r12_status_reason_matrix",
    // round-2 additions
    "p05_gps_jitter", "w09_first_per_group", "r14_cascade_expand",
    "t13_pii_scrub", "t14_decontaminate", "t15_repetition_stats",
    "t16_domain_mix", "s07_embedding_neardup_lsh",
    "st01_stream_windowed_counts",
    // late round-2 additions
    "j15_range_bucket_join", "j16_salted_join", "j17_asof_join",
    "s08_dedup_clusters", "st02_stream_sessionize", "st03_stream_dedup",
    "st04_stream_interval_join", "t17_tfidf_stats")

  test("registry queries are invariant to shuffle partitioning") {
    val d = "/root/testdata/sf0.001"
    val original = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      names.foreach { n =>
        val fn = SparkEntry.queries(n)
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        val a = rows(fn(spark, d))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        val b = rows(fn(spark, d))
        assert(a == b, s"$n differs across shuffle settings")
        assert(a.nonEmpty, s"$n returned no rows at sf0.001")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", original)
  }
}
