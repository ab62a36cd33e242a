package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. Spark's
  * sample()/sampleBy() draw from rand(seed) evaluated in partition
  * order, so results change with partitioning and retries; these
  * operators decide membership from a content hash of the row's key —
  * the same row is always in or out, on any cluster layout, and the
  * sample is reproducible from the (key, salt) alone.
  *
  * Mechanics: the first 4 hex chars of md5(key || salt) are uniform over
  * 0x0000..0xffff; a row is kept when they fall below fraction * 0x10000
  * (lexicographic compare on lowercase hex ≡ numeric compare).
  */
object Sampling {

  private def bucket(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 4)

  private def thresholdHex(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction out of [0,1]")
    val t = math.round(fraction * 0x10000).toInt
    // 'g' sorts above every hex char, so "g" admits all buckets
    // (a 5-char "10000" would compare lexicographically BELOW "ffff")
    if (t >= 0x10000) "g" else f"$t%04x"
  }

  /** Keep ~fraction of rows, decided per key. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 salt: String = ""): DataFrame =
    df.filter(bucket(col(keyCol), salt) < lit(thresholdHex(fraction)))

  /** Keep each row with its own probability `weight` (clamped to [0,1]),
    * decided deterministically from (key, salt) — importance/quality-
    * weighted curation sampling: a row with weight 0.25 survives iff its
    * hash bucket lands in the bottom quarter of the 16-bit range. Same
    * row, same verdict, on any partitioning or retry; the whole filter
    * is one codegen'd projection (md5 + hex compare), no rand(), no
    * shuffle. Weight resolution is 1/65536 (floor), matching the
    * 4-hex-char bucket.
    */
  def weightedHashSample(df: DataFrame, keyCol: String, weight: Column,
                         salt: String = ""): DataFrame = {
    val t = floor(least(greatest(weight, lit(0.0)), lit(1.0)) * 0x10000).cast("long")
    // same 'g' sentinel as thresholdHex: weight 1.0 must admit "ffff"
    val thr = when(t >= 0x10000, lit("g"))
      .otherwise(lower(lpad(hex(t), 4, "0")))
    df.filter(bucket(col(keyCol), salt) < thr)
  }

  /** Stratified: per-stratum fractions (strata absent from the map get 0). */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           fractions: Map[String, Double],
                           salt: String = ""): DataFrame = {
    val threshold = fractions.foldLeft(lit("0000")) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit(thresholdHex(f))).otherwise(acc)
    }
    df.filter(bucket(col(keyCol), salt) < threshold)
  }

  /** Mix-to-target downsampling: deterministic per-key sample whose OUTPUT
    * domain proportions match `targets` as closely as possible without
    * upsampling — the standard corpus-mixture op (web/books/code weights).
    * The binding domain (smallest count relative to its weight) is kept
    * whole; every other domain downsamples to weight_d × N_out where
    * N_out = min_d(count_d / weight_d). Domains absent from `targets` are
    * dropped.
    *
    * Scale: two tiny per-domain aggregates + one broadcast join; the data
    * side never shuffles and membership stays (key, salt)-deterministic.
    */
  def mixToTarget(df: DataFrame, keyCol: String, domainCol: String,
                  targets: Map[String, Double], salt: String = ""): DataFrame = {
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__w", try_element_at(typedlit(targets), col(domainCol)))
      .filter(col("__w").isNotNull)
    val nOut = counts.agg(min(col("__c") / col("__w")).as("__nout"))
    val rates = counts.crossJoin(nOut)
      .select(col(domainCol),
        least(col("__w") * col("__nout") / col("__c"), lit(1.0)).as("__rate"))
    // data-dependent rate → hex threshold computed in-plan ('g' admits all,
    // matching thresholdHex's full-fraction convention)
    val threshold = when(col("__rate") >= 1.0, lit("g"))
      .otherwise(lower(lpad(hex(floor(col("__rate") * 65536).cast("int")), 4, "0")))
    df.join(broadcast(rates), domainCol)
      .filter(bucket(col(keyCol), salt) < threshold)
      .drop("__rate")
  }
}
