package graft

import org.apache.spark.sql.functions._

/** 10x scale smoke: replicates sf0.1 lineitem/orders with shifted keys
  * (~6M/1.5M rows ≈ sf1) and runs the heavy operator shapes — hash agg,
  * big join + agg, global window, exact near-dup join — to validate that
  * plans and memory behavior survive a 10x scale-up on local[32].
  * Prints one JSON line like Bench.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // replication factor (10 => ~sf1; 100 => ~sf10, 60M lineitem rows)
    // and an optional comma-separated entry-prefix filter, so the 100x
    // posture run can target the core shapes without the full battery
    val nCopies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val only: String => Boolean =
      sys.env.get("SPARK_GRAFT_ONLY") match {
        case Some(ps) => val p = ps.split(',').toSeq; n => p.exists(n.startsWith)
        case None => _ => true
      }
    val spark = graft.core.Sessions.local(cpus, "graft-scale")
    import spark.implicits._

    val li0 = graft.core.Tables.lineitem(spark, sfDir)
    val or0 = graft.core.Tables.orders(spark, sfDir)
    val maxOk = or0.agg(max("o_orderkey")).as[Long].head() + 1
    val copies = spark.range(nCopies).select(col("id").as("rep"))
    val li = li0.crossJoin(copies)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * maxOk).drop("rep")
    val or = or0.crossJoin(copies)
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * maxOk).drop("rep")

    def time(name: String)(f: => Unit): (String, Double) = {
      if (!only(name)) name -> -1.0 // filtered out below
      else {
        val t0 = System.nanoTime()
        f
        name -> (System.nanoTime() - t0) / 1e9
      }
    }

    val results = Seq(
      time("agg_multi_metric") {
        li.groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(18,4)")),
            avg("l_extendedprice"), max("l_shipdate"))
          .write.format("noop").mode("overwrite").save()
      },
      time("join_agg") {
        li.join(or, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(18,4)")))
          .write.format("noop").mode("overwrite").save()
      },
      time("window_cumsum") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("l_orderkey").orderBy("l_linenumber")
        li.withColumn("run", sum(col("l_quantity")).over(w))
          .write.format("noop").mode("overwrite").save()
      },
      time("distinct_count") {
        // mixed exact+approx Expands (2 distinct groups); measured here
        // at 10x it still beats two separate full shuffles — but at
        // 100x (60M rows) the 2x-Expanded exchange goes spill-bound
        // (370 s vs 33 s for the two-level rewrite below): the a17
        // rewrite is not an optimization, it's the scale path
        li.groupBy("l_returnflag")
          .agg(countDistinct("l_orderkey"), approx_count_distinct("l_partkey"))
          .write.format("noop").mode("overwrite").save()
      },
      time("distinct_count_twolevel") {
        // the Expand-free form of the SAME result: exact leg as
        // pre-distinct (flag, orderkey) pairs (map-side combine
        // collapses before the exchange) then a count; approx leg as a
        // pure-HLL single pass (pure approx never Expands); 3-row join.
        // Two scans, but each is an ordinary shuffle — no 2x-Expanded
        // exchange to spill
        val exact = li.select("l_returnflag", "l_orderkey").distinct()
          .groupBy("l_returnflag").agg(count(lit(1)).as("n_orders"))
        val approx = li.groupBy("l_returnflag")
          .agg(approx_count_distinct("l_partkey").as("n_parts_approx"))
        exact.join(approx, "l_returnflag")
          .write.format("noop").mode("overwrite").save()
      },
      time("expectations_battery") {
        // g14's post-rewrite shape on replicated orders (r9, VERDICT r8
        // item 3): fused per-table counters + the a17 two-level
        // uniqueness rule + broadcast-FK anti-join, stacked. The old
        // mixed distinct+plain single aggregate Expanded the scan x2
        // (453 s class at 100x); this form is plain shuffles only.
        val cust = graft.core.Tables.customer(spark, sfDir)
        // replication keeps the source file's few splits: spread the
        // per-key aggregation by ITS OWN key so the one exchange both
        // parallelizes the scan and is reused by the groupBy
        val orP = or.repartition(cpus.toInt, col("o_orderkey"))
        val perKey = orP.groupBy("o_orderkey").agg(
          count(lit(1)).as("__n"),
          count(when(col("o_custkey").isNull, 1)).as("__nullck"),
          count(when(col("o_totalprice").isNull || col("o_totalprice") <= 0, 1))
            .as("__badpr"))
        val ordersRules = perKey.agg(
          sum("__nullck").as("null_ck"),
          (sum("__n") - count(when(col("o_orderkey").isNotNull, 1))).as("dup_ok"),
          sum("__badpr").as("bad_price"))
        val fk = or.filter(col("o_custkey").isNotNull)
          .join(broadcast(cust.select(col("c_custkey").as("o_custkey"))),
            Seq("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("fk_orphans"))
        ordersRules.crossJoin(fk)
          .write.format("noop").mode("overwrite").save()
      },
      time("detector_battery_fused") {
        // a24's post-rewrite shape (r9, VERDICT r8 item 4): stateless
        // per-row rules fused into ONE staged-flag scan per table with
        // the disjunction pre-filter, plus the two-level member-stats
        // leg — instead of one full source re-scan per rule instance.
        val r1 = graft.operators.Anomalies.detectRowBattery(
          or, "orders", col("o_orderkey"), Seq(
            ("neg_price", lit("nonpositive total"), col("o_totalprice") <= 0),
            ("null_cust", lit("missing customer"), col("o_custkey").isNull),
            ("far_future", lit("date out of range"),
              col("o_orderdate") > lit("1999-01-01").cast("date"))))
        // key-aligned repartition: one exchange spreads the replicated
        // scan across all cores AND satisfies memberStats' groupBy
        // distribution, so no second shuffle is added
        val mstats = graft.operators.Anomalies.memberStats(
          li.repartition(cpus.toInt, col("l_orderkey")), Seq("l_orderkey"),
          Seq(("hiqty", col("l_quantity") > 45), ("ret", col("l_returnflag") === "R")),
          memberCol = "l_linenumber")
        val r2 = graft.operators.Anomalies.detectRowBattery(
          mstats, "lineitem", col("l_orderkey"), Seq(
            ("many_hiqty", lit("high-quantity lines"), col("n_hiqty") >= 3),
            ("many_returns", lit("returned lines"), col("n_ret") >= 4)))
        r1.unionByName(r2).groupBy("form_id", "anomalies_id")
          .agg(count(lit(1)).as("n"))
          .write.format("noop").mode("overwrite").save()
      },
      time("lsh_neardup_50k_docs") {
        // 10x documents (~50k docs, ~5M shingle hashes): the full LSH
        // pipeline — fused shingling, one-buffer signatures, capped
        // buckets, exact verification
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
        graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
            n = 2, k = 32, bands = 8, threshold = 0.3, maxBucketSize = 100)
          .write.format("noop").mode("overwrite").save()
      },
      time("embedding_neardup_50k_vecs") {
        // 10x embeddings (~50k vectors): all-pairs near-dup with bits
        // raised 10 → 13 per the log2(n) occupancy rule — candidate
        // volume stays ~constant per vector as the corpus grows
        val e0 = graft.core.Tables.embeddings(spark, sfDir)
        val maxVec = e0.agg(max("vec_id")).as[Long].head() + 1
        val e = e0.crossJoin(copies)
          .withColumn("vec_id", col("vec_id") + col("rep") * maxVec).drop("rep")
        graft.operators.Dedup.embeddingNearDupLsh(e, "vec_id", "embedding",
            tables = 12, bits = 13, dims = 64, threshold = 0.35,
            maxBucketSize = 500)
          .write.format("noop").mode("overwrite").save()
      },
      time("connected_components_1m_edges") {
        // ~1.5M-edge synthetic pair graph: 150k chains of depth 10 —
        // label propagation converges in ~10 rounds of equi-join +
        // min-agg; validates the driver loop (persist/unpersist +
        // lineage truncation) holds at a million-edge graph
        val n = 1500000L
        val pairs = spark.range(n)
          .filter(pmod(col("id"), lit(10)) =!= 9)
          .select(col("id").as("a"), (col("id") + 1).as("b"))
        graft.operators.Dedup.connectedComponents(pairs, "a", "b")
          .write.format("noop").mode("overwrite").save()
      },
      time("cc_star_fallback_1m_edge_giant") {
        // adversarial CC shape: ~1.5M edges forming ONE giant component
        // (750k-deep path welded to a 750k-degree hub) — the skewed
        // graph the label-compression loop cannot finish without
        // funneling the component through one reducer. Forced through
        // the distributed branch (1.5M edges exceed the small-graph
        // probe) with the trip-wire low so the measured path is the
        // production shape: hash-min rounds → seeded handover →
        // large-star/small-star contraction → driver union-find once
        // the contracted set shrinks under the small-graph bound
        val n = 1500000L
        val path = spark.range(n / 2)
          .select(col("id").as("a"), (col("id") + 1).as("b"))
        val hub = spark.range(n / 2, n)
          .select(lit(n / 4).as("a"), col("id").as("b"))
        graft.operators.Dedup.connectedComponents(path.union(hub), "a", "b",
            starFallbackLabelFreq = 100000L)
          .write.format("noop").mode("overwrite").save()
      },
      time("asof_join_6m_rows") {
        // as-of on the 10x orders table: union-form, one shuffle on the
        // key, no join amplification
        val snap = or.select(col("o_custkey"), col("o_orderdate").as("d"),
            col("o_totalprice"))
          .groupBy("o_custkey", "d").agg(max("o_totalprice").as("px"))
        graft.operators.AsOfJoin.asOf(
            or.select("o_orderkey", "o_custkey", "o_orderdate"), snap,
            key = "o_custkey", leftTs = "o_orderdate", rightTs = "d",
            strict = true)
          .write.format("noop").mode("overwrite").save()
      },
      time("ivf_train_50k_vecs") {
        // Lloyd training at 10x: 3 rounds over ~50k vectors, 64 cells —
        // per-round cost is one cached narrow argmin projection + one
        // 65-buffer decimal aggregate; validates the cache/collect loop
        // and that decimal component sums don't blow the agg at volume
        val e0 = graft.core.Tables.embeddings(spark, sfDir)
        val maxVec = e0.agg(max("vec_id")).as[Long].head() + 1
        val e = e0.crossJoin(copies)
          .withColumn("vec_id", col("vec_id") + col("rep") * maxVec).drop("rep")
        graft.operators.Ivf.trainCentroids(e, "vec_id", "embedding",
            nCells = 64, iters = 3)
          .write.format("noop").mode("overwrite").save()
      },
      time("dup_substrings_50k_docs") {
        // exact char-window dedup at 10x (~73M windows) in its at-scale
        // form: fused window hashing (one byte scan, distinct map-side),
        // 8-byte group keys in the exchange — the hashed substitution
        // t20's raw-text oracle row documents
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
        graft.operators.Dedup.dupSubstringsHashed(docs, "doc_id", "text",
            width = 40, minDocs = 2)
          .write.format("noop").mode("overwrite").save()
      },
      time("sequence_pack_50k_docs") {
        // t47's two-level shape at replication: prefix-sum shards bound
        // every FFD group to ~2000 tokens, so the sequential part never
        // grows with the corpus — one shuffle by shard regardless of
        // copies
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.select("doc_id", "text").crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
          .repartition(cpus.toInt)
        val shards = graft.operators.Packing.tokenShards(
          docs.select(col("doc_id"),
            graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens")),
          "doc_id", "n_tokens", budget = 2000, bucketWidth = 128)
        graft.operators.Packing.packSequences(
            shards, "doc_id", "n_tokens", "shard", seqLen = 128)
          .write.format("noop").mode("overwrite").save()
      },
      time("token_shards_50k_docs") {
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
        graft.operators.Packing.tokenShards(
            docs.select(col("doc_id"),
              graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens")),
            "doc_id", "n_tokens", budget = 2000, bucketWidth = 128)
          .write.format("noop").mode("overwrite").save()
      },
      time("pq_search_50k_vecs") {
        // IVF-PQ at 10x: fused one-scan codebook training (2 rounds over
        // ~50k vectors, all 8 subspaces per round), narrow code
        // projection, cell-probed ADC; validates that the training loop
        // and the broadcast distance-table join hold at volume
        val e0 = graft.core.Tables.embeddings(spark, sfDir)
        val maxVec = e0.agg(max("vec_id")).as[Long].head() + 1
        val e = e0.crossJoin(copies)
          .withColumn("vec_id", col("vec_id") + col("rep") * maxVec).drop("rep")
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
        graft.operators.Pq.searchIvf(e, q, "vec_id", "embedding",
            nCells = 64, nProbe = 8, m = 8, k = 16, itersCoarse = 2,
            itersPq = 2, shortlist = 100, topK = 5)
          .write.format("noop").mode("overwrite").save()
      },
      time("simhash_neardup_50k_docs") {
        // banded SimHash at 10x: one token explode + 64-buffer vote agg
        // over ~10M token rows, 4 band rows per doc, equi-join
        // candidates, Hamming verify
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
        val sims = docs
          .select(col("doc_id"),
            explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
          .groupBy("doc_id")
          .agg(graft.functions.Similarity.simhashVoteAggs(col("tok")).head,
            graft.functions.Similarity.simhashVoteAggs(col("tok")).tail: _*)
          .select(col("doc_id"),
            graft.functions.Similarity.packSimhashVotes.as("sh"))
        graft.operators.Dedup.simhashNearDups(sims, "doc_id", "sh",
            maxHamming = 6)
          .write.format("noop").mode("overwrite").save()
      },
      time("bpe_merges_50k_docs") {
        // 2 BPE rounds at 10x: each round is one map-combinable pair
        // count + TakeOrdered(1) + a zero-shuffle rewrite
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
        val (_, merged) = graft.operators.Bpe.applyMerges(docs, "toks", 2)
        merged.select(col("doc_id"), size(col("toks")).as("n"))
          .write.format("noop").mode("overwrite").save()
      },
      time("png_decode_50k_imgs") {
        // real-codec multimodal path at 10x: 50k synthesized PNGs
        // encoded + decoded + feature-extracted in one narrow
        // mapPartitions pass — no shuffle, executor memory bounded by
        // the batch, the shape an Arrow-batched decode UDF has
        val ids = spark.range(50000).select(col("id").as("doc_id"))
        graft.operators.Multimodal.extractFeatures(
            graft.operators.Multimodal.withImagePayload(ids, "doc_id"),
            "payload")
          .select(col("doc_id"), element_at(col("features"), 3).as("r_sum"))
          .write.format("noop").mode("overwrite").save()
      },
      time("histogram_quantile_6m_rows") {
        // sort-free quantiles on the 10x lineitem: two narrow passes +
        // a 100-row reduction — the a18 exact percentile alternative
        // that has no global sort to blow up
        graft.operators.Profile.histogramQuantiles(li, "l_extendedprice",
            bins = 100, qs = Seq(0.25, 0.5, 0.75, 0.95))
          .write.format("noop").mode("overwrite").save()
      },
      time("debounce_100k_events") {
        // per-key recurrence scan at 10x events volume: one repartition
        // + in-partition sort, O(1) state
        val ev0 = graft.core.Tables.events(spark, sfDir)
        val maxEv = ev0.agg(max("event_id")).as[Long].head() + 1
        val ev = ev0.crossJoin(copies)
          .withColumn("event_id", col("event_id") + col("rep") * maxEv)
          .drop("rep")
          .select("user_id", "event_id", "ts")
        graft.operators.Sessionize.debounce(ev, "user_id", "ts", "event_id",
            minGapMicros = 1800000000L)
          .write.format("noop").mode("overwrite").save()
      },
      time("stream_counts_1m_events") {
        // streaming at 10x: 1M event rows land as 10 files; the
        // watermarked windowed aggregation processes them incrementally
        // (AvailableNow) with 4 state stores and must finish in one
        // bounded run — the landing-zone throughput shape
        val dir = graft.core.TempDirs.scratch("scale_st_landing")
        for (i <- 0 until 10)
          java.nio.file.Files.createSymbolicLink(
            dir.resolve(s"events_$i.parquet"),
            java.nio.file.Paths.get(s"$sfDir/events.parquet").toAbsolutePath)
        val ss = spark.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        val raw = ss.read.parquet(s"$sfDir/events.parquet")
        val src = graft.streaming.Streams.fileSource(ss, dir.toString, raw.schema)
          .withColumn("ts", graft.core.Tables.canonTs(raw.schema))
        val agg = graft.streaming.Streams.windowedCounts(src, "ts", "event_type",
          windowLen = "1 hour", watermark = "2 hours")
        val sink = "scale_counts_" + System.nanoTime()
        val q = agg.writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
        ss.table(sink).write.format("noop").mode("overwrite").save()
      },
      time("url_canonicalize_50k_docs") {
        // URL canonicalization + canonical keep-first at 10x: the whole
        // normalization is one codegen'd narrow projection; the only
        // shuffle is the per-canonical-URL window
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
        val url = concat(lit("HtTpS://WWW."), col("source"), lit(".Example.COM:443//Docs/"),
          (col("doc_id") % 1000).cast("string"), lit("/?b=2&utm_source=feed&a=1#frag"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("url_canon")
        docs.select(col("doc_id"),
            graft.functions.Web.canonicalUrl(url).as("url_canon"),
            graft.functions.Web.urlHost(url).as("domain"))
          .withColumn("kept", col("doc_id") === min("doc_id").over(w))
          .write.format("noop").mode("overwrite").save()
      },
      time("hashed_classifier_50k_docs") {
        // hashed linear model over 10x documents with the PRODUCTION
        // bucketing (xxhash64, 65536 buckets): explode -> broadcast join
        // -> one agg; weights derive from the bucket id (integer model)
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
        val weights = spark.range(65536).select(
          col("id").cast("string").as("bucket"), (col("id") % 41 - 20).as("weight"))
        graft.operators.Classifier.scoreHashed(docs, "doc_id", "text",
            weights, "bucket", "weight",
            graft.operators.Classifier.xxBucket(65536), bias = 3L)
          .write.format("noop").mode("overwrite").save()
      },
      time("salted_skew_join_6m_rows") {
        // adversarial skew: 6M-row big side where 60% of rows share ONE
        // key, small side too big to broadcast comfortably at real scale
        // — the salted join spreads the hot key over 32 reducers; the
        // plain shuffle join would funnel 3.6M rows through one task
        val n = 6000000L
        val big = spark.range(n).select(col("id").as("row_id"),
          when(pmod(col("id"), lit(10)) < 6, lit(0L))
            .otherwise(pmod(col("id"), lit(100000L))).as("k"),
          (col("id") % 97).as("v"))
        val small = spark.range(100000L).select(col("id").as("k"),
          (col("id") % 13).as("grp"))
        graft.operators.Skew.saltedJoin(big, small, "k", "row_id", factor = 32)
          .groupBy("grp").agg(count(lit(1)), sum("v"))
          .write.format("noop").mode("overwrite").save()
      },
      time("semantic_dedup_50k_vecs") {
        // SemDeDup at 10x with k raised 8 -> 256 per the n/k-constant
        // regime: ~200 vectors per cluster keeps sum(|cluster|^2)
        // linear-ish in n; assignment is the narrow NearestCell
        // projection, the pair join is keyed by cell_id
        val e0 = graft.core.Tables.embeddings(spark, sfDir)
        val maxVec = e0.agg(max("vec_id")).as[Long].head() + 1
        val e = e0.crossJoin(copies)
          .withColumn("vec_id", col("vec_id") + col("rep") * maxVec).drop("rep")
        val cvecs = graft.functions.Similarity.hyperplanes(1, 256, 64)
        val cents = cvecs.zipWithIndex.map { case (c, r) => (r.toLong, c) }
          .toDF("cell_id", "c_vec")
        graft.operators.Dedup.semanticDedup(e, cents, "vec_id", "embedding",
            minCos = 0.4)
          .write.format("noop").mode("overwrite").save()
      },
      time("incremental_neardup_50k_docs") {
        // the continuously-growing-corpus claim at 10x: 45k-doc corpus
        // pre-sketched (signature table persisted, as in production),
        // 5k-doc batch sketches only itself — cost must track the
        // BATCH, not the corpus
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
        val newDocs = docs.filter(col("doc_id") % 10 === 0)
        val oldDocs = docs.filter(col("doc_id") % 10 =!= 0)
        val oldSigs = graft.operators.Dedup.minhashSignatures(
            oldDocs, "doc_id", "text", 2, 32)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        oldSigs.count() // corpus sketched "when it landed" — untimed store
        graft.operators.Dedup.incrementalNearDupPairs(newDocs, oldDocs,
            oldSigs, "doc_id", "text", n = 2, k = 32, bands = 8,
            threshold = 0.3, maxBucketSize = 100)
          .write.format("noop").mode("overwrite").save()
        oldSigs.unpersist(false)
      },
      time("quality_curriculum_50k_docs") {
        // per-domain percentile filter at 10x: one domain-keyed
        // aggregate + broadcast threshold join — nothing sorts the
        // corpus
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
        val scored = docs.select(col("doc_id"), col("source").as("domain"),
          graft.operators.Curriculum.integerQualityScore(col("text"),
            Seq("the", "a", "of", "and", "in")).as("score"))
        graft.operators.Curriculum.domainPercentileKeep(
            scored, "doc_id", "domain", "score", p = 0.75)
          .write.format("noop").mode("overwrite").save()
      },
      time("ngram_coverage_50k_docs") {
        // corpus-frequency coverage at 10x (minDf scaled with the
        // corpus): gram df agg + frequent-tail join back
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
        graft.operators.Curriculum.dupNgramCoverage(docs, "doc_id", "text",
            n = 3, minDf = 50L)
          .write.format("noop").mode("overwrite").save()
      },
      time("scd2_merge_150k_keys") {
        // SCD2 at 10x customer volume: one full-outer join + explode
        val c0 = graft.core.Tables.customer(spark, sfDir)
        val maxC = c0.agg(max("c_custkey")).as[Long].head() + 1
        val c = c0.crossJoin(copies)
          .withColumn("c_custkey", col("c_custkey") + col("rep") * maxC).drop("rep")
        val cur = c.filter(col("c_custkey") % 11 =!= 3)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"),
            to_date(lit("2025-06-01")).as("valid_from"),
            lit(null).cast("date").as("valid_to"))
        val inc = c.filter(col("c_custkey") % 7 === 0 || col("c_custkey") % 11 === 3)
          .select(col("c_custkey"),
            when(col("c_custkey") % 7 === 0, concat(col("c_mktsegment"), lit("_X")))
              .otherwise(col("c_mktsegment")).as("seg"))
        graft.operators.Scd2.merge(cur, inc, Seq("c_custkey"), Seq("seg"),
            lit("2026-02-01"))
          .write.format("noop").mode("overwrite").save()
      },
      time("pagerank_12m_edges") {
        // g10's shape at 10x lineitem volume (distinct trade pairs both
        // directions): 3 Pregel-style rounds, per-round motion is the
        // O(nodes) rank table against checkpointed src-partitioned edges
        val base = or.select("o_orderkey", "o_custkey")
          .join(li.select("l_orderkey", "l_suppkey"),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("c"),
            (col("l_suppkey") + 1000000L).as("s2"))
          .distinct()
        val edges = base.select(col("c").as("src"), col("s2").as("dst"))
          .unionAll(base.select(col("s2").as("src"), col("c").as("dst")))
          .repartition(col("src"))
          .localCheckpoint()
        val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
        var ranks = deg.select(col("src").as("node"), lit(1000000L).as("rank"))
        for (_ <- 1 to 3) {
          val contrib = ranks.join(deg, col("node") === col("src"))
            .select(col("node").as("cn"), expr("rank div outdeg").as("contrib"))
          ranks = edges.join(contrib, col("src") === col("cn"))
            .groupBy(col("dst").as("node"))
            .agg(expr("150000 + (17 * sum(contrib)) div 20").as("rank"))
        }
        ranks.write.format("noop").mode("overwrite").save()
      },
      time("bm25_50k_docs") {
        // s26 at 10x: two pruned text scans + 1-row stats broadcast +
        // TakeOrdered; the narrow tf projection is the whole cost
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
        val terms = Seq("spark", "vector", "window", "customer")
        val toks = split(col("text"), " ")
        val perDoc = docs.select(
          col("doc_id") +: size(toks).cast("double").as("dl") +:
            terms.zipWithIndex.map { case (t, i) =>
              size(filter(toks, x => x === lit(t))).cast("double").as(s"tf${i + 1}")
            }: _*)
        val aggCols = count(lit(1)).cast("double").as("n") +:
          avg(col("dl")).as("avgdl") +:
          terms.indices.map(i =>
            count(when(col(s"tf${i + 1}") > 0, 1)).cast("double").as(s"df${i + 1}"))
        val stats = perDoc.agg(aggCols.head, aggCols.tail: _*)
        perDoc.crossJoin(broadcast(stats))
          .select(col("doc_id"),
            (col("tf1") / (col("tf1") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
              + col("tf2") / (col("tf2") + lit(1.2))).as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(10)
          .write.format("noop").mode("overwrite").save()
      },
      time("tokenizer_encode_50k_docs") {
        // t33's codegen trie at 10x: pure narrow projection, the number
        // is the per-byte encode cost and nothing else
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val docs = docs0.crossJoin(copies).drop("rep")
        docs.select(graft.plans.GreedyPieceEncode(col("text"), Seq(
            "wind", "cust", "omer", "quer", "tabl", "valu", "filt", "colu",
            "dow", "tch", "ery", "ble", "umn", "eam", "oup", "ort",
            "ow", "er", "st", "re", "am", "ba", "sc", "an", "jo", "in"))
            .as("enc"))
          .write.format("noop").mode("overwrite").save()
      },
      time("interval_overlap_150k_intervals") {
        // j19 at 10x orders volume: bucketed equi-join with the
        // bucket-of-max-start dedup; fan-out bounded by len/30 + 1
        val o = or.filter(col("o_custkey") < 3000)
          .select(col("o_orderkey").as("k"),
            unix_date(to_date(col("o_orderdate"))).cast("bigint").as("sd"))
          .withColumn("ed", col("sd") + col("k") % 20)
        val a = o.filter(col("k") % 2 === 0)
          .select(col("k").as("ka"), col("sd").as("sa"), col("ed").as("ea"),
            explode(expr("sequence(sd div 30, ed div 30)")).as("bkt"))
        val b = o.filter(col("k") % 2 =!= 0)
          .select(col("k").as("kb"), col("sd").as("sb"), col("ed").as("eb"),
            explode(expr("sequence(sd div 30, ed div 30)")).as("bkt"))
        a.join(b, Seq("bkt"))
          .filter(col("sa") <= col("eb") && col("sb") <= col("ea") &&
            col("bkt") === expr("greatest(sa, sb) div 30"))
          .groupBy("bkt").agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      },
      time("dhash_50k_imgs") {
        // m05 at 10x: real PNG decode + 9x8 resize + gradient hash
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.select("doc_id").crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
        graft.operators.Multimodal.dHash(
            graft.operators.Multimodal.withImagePayload(docs, "doc_id"),
            "payload")
          .groupBy("dhash").agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      },
      time("heavy_hitters_3m_tokens") {
        // a27's two-phase at 10x: MG sketch pass (no item-space shuffle)
        // + exact count of <= k candidates
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val docs = docs0.crossJoin(copies).drop("rep")
        val toks = split(col("text"), " ")
        val cands = docs.agg(graft.plans.MisraGriesTopK(toks, 64).as("cand"))
          .head().getSeq[String](0)
        val total = docs.agg(sum(size(toks)).as("n"))
        docs.select(explode(toks).as("word"))
          .filter(col("word").isin(cands: _*))
          .groupBy("word").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(total))
          .filter(col("cnt") * 30 > col("n"))
          .write.format("noop").mode("overwrite").save()
      },
      time("triangles_6m_lineitem") {
        // g13's shape at 10x input: the distinct-pair self-join chews
        // 10x the lineitem volume (the dominant stage; replicated orders
        // repeat supplier combos, so the EDGE set stays sf0.1-sized —
        // wedge cost constant, scan+distinct cost 10x)
        val pair = li.select(col("l_orderkey").as("ok"), col("l_suppkey").as("x"))
          .join(li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("y")),
            col("ok") === col("ok2") && col("x") < col("y"))
          .select("x", "y").distinct()
        val e = pair.filter(substring(md5(concat(col("x").cast("string"), lit("_"),
          col("y").cast("string"), lit("g13"))), 1, 1) === "0").localCheckpoint()
        val deg = e.select(col("x").as("node")).unionAll(e.select(col("y")))
          .groupBy("node").agg(count(lit(1)).as("dg"))
        val withDeg = e
          .join(deg.toDF("nx", "dx"), col("x") === col("nx"))
          .join(deg.toDF("ny", "dy"), col("y") === col("ny"))
        val xFirst = struct(col("dx"), col("x")) < struct(col("dy"), col("y"))
        val de = withDeg.select(
          when(xFirst, col("x")).otherwise(col("y")).as("src"),
          when(xFirst, col("y")).otherwise(col("x")).as("dst")).localCheckpoint()
        val wedge = de.toDF("s1", "v")
          .join(de.toDF("s2", "w"), col("s1") === col("s2") && col("v") < col("w"))
          .select("v", "w")
        val closing = de.select(least(col("src"), col("dst")).as("cv"),
          greatest(col("src"), col("dst")).as("cw"))
        wedge.join(closing, col("v") === col("cv") && col("w") === col("cw"))
          .agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      },
      time("streaks_ohlc_1m_events") {
        // w22 + w23 shapes over 1M events (10x, users shifted so the
        // key space also grows 10x): per-user islands then the one-agg
        // OHLC — both hash on bounded keys, no global state
        val ev0 = graft.core.Tables.events(spark, sfDir)
        val maxU = ev0.agg(max("user_id")).as[Long].head() + 1
        val ev = ev0.crossJoin(copies)
          .withColumn("user_id", col("user_id") + col("rep") * maxU).drop("rep")
        val day = datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("day")
        ev.select(col("user_id"), day.as("day")).distinct()
          .select(col("user_id"), col("day"),
            (col("day") - row_number().over(w)).as("island"))
          .groupBy("user_id", "island").agg(count(lit(1)).as("len"))
          .groupBy("user_id").agg(count(lit(1)), max("len"))
          .write.format("noop").mode("overwrite").save()
        val ord = concat(lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
          lpad(col("event_id").cast("string"), 12, "0"))
        ev.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
          .agg(min_by(col("value"), ord), max("value"), min("value"),
            max_by(col("value"), ord))
          .write.format("noop").mode("overwrite").save()
      },
      time("rolling_zscore_range_1m_events") {
        // w26's direct sliding RANGE frame at 10x DENSITY (types NOT
        // shifted, so each (type, 6 h) frame holds ~10x the rows):
        // Spark re-aggregates the frame per row, so cost scales with
        // rows * frame_rows — this is the shape that cliffs
        val ev0 = graft.core.Tables.events(spark, sfDir)
        val maxE = ev0.agg(max("event_id")).as[Long].head() + 1
        val ev = ev0.crossJoin(copies)
          .withColumn("event_id", col("event_id") + col("rep") * maxE).drop("rep")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(unix_micros(col("ts")))
          .rangeBetween(-21600000000L, 0L)
        val vd = col("value").cast("decimal(18,4)")
        ev.select(col("event_id"), col("event_type"), col("value"),
            sum(vd).over(w).as("s1"), sum(vd * vd).over(w).as("s2"),
            count(lit(1)).over(w).as("n"))
          .write.format("noop").mode("overwrite").save()
      },
      time("rolling_zscore_bucketed_1m_events") {
        // the two-level escape (RollingMoments.trailingMoments): same
        // exact moments, cost O(rows) + two bucket-table exchanges —
        // frame-density independent, the 100 TB form of w26
        val ev0 = graft.core.Tables.events(spark, sfDir)
        val maxE = ev0.agg(max("event_id")).as[Long].head() + 1
        val ev = ev0.crossJoin(copies)
          .withColumn("event_id", col("event_id") + col("rep") * maxE).drop("rep")
          .select(col("event_id"), col("event_type"), col("value"),
            unix_micros(col("ts")).as("us"))
          .repartition(cpus.toInt)
        graft.operators.RollingMoments.trailingMoments(
            ev, "event_type", "us", "value", 21600000000L, 3600000000L)
          .write.format("noop").mode("overwrite").save()
      },
      time("zorder_write_1p5m_rows") {
        // the io12 write path at 10x: Morton key + range partition +
        // in-partition sort + parquet write of 1.5M orders
        val dir = graft.core.TempDirs.scratch("scale_zorder").toString
        graft.operators.ZOrder.writeZOrdered(
          or.select((col("o_custkey") % 65536).as("cust"),
            (datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long")
              % 65536).as("day"),
            col("o_orderkey"), col("o_totalprice")),
          "cust", "day", dir, numFiles = 32)
      },
      time("gopher_repetition_50k_docs") {
        // t41's 7-gram-size battery at 10x docs: the string-gram
        // exchange is the cost driver (the hashed-gram variant is the
        // 100 TB path; this measures the oracle-replayable form)
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.select("doc_id", "text").crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
          // replication multiplies ROWS, not partitions: without this the
          // per-row gram generation runs on the source file's 1-2 splits
          .repartition(cpus.toInt)
        val grams = graft.functions.TextFunctions.bind1(split(col("text"), " ")) { w =>
          flatten(transform(sequence(lit(2), lit(8)), n =>
            when(size(w) >= n,
              transform(sequence(lit(1), size(w) - n + 1),
                i => struct(n.as("n"),
                  array_join(slice(w, i.cast("int"), n.cast("int")), " ").as("g"))))
              .otherwise(array().cast("array<struct<n:int,g:string>>"))))
        }
        docs.select(col("doc_id"), size(split(col("text"), " ")).as("ntok"),
            explode(grams).as("gr"))
          .groupBy(col("doc_id"), col("ntok"), col("gr.n").as("n"), col("gr.g").as("g"))
          .agg(count(lit(1)).as("c"))
          .groupBy("doc_id", "ntok", "n")
          .agg(max("c").as("topc"),
            sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dupc"))
          .groupBy("doc_id", "ntok")
          .agg(max(when(col("n") === 2, col("topc"))).as("t2"),
            max(when(col("n") === 5, col("dupc"))).as("d5"))
          .write.format("noop").mode("overwrite").save()
      },
      time("gopher_repetition_hashed_50k_docs") {
        // the production form of t41: gram strings hash to 8-byte keys
        // BEFORE the exchange (counts are identical modulo 64-bit
        // collisions); the string form above goes super-linear at 10x —
        // this is the same two-exchange plan with ~6x less shuffle bytes
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.select("doc_id", "text").crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
          // replication multiplies ROWS, not partitions: without this the
          // per-row gram generation runs on the source file's 1-2 splits
          .repartition(cpus.toInt)
        val grams = graft.functions.TextFunctions.bind1(split(col("text"), " ")) { w =>
          flatten(transform(sequence(lit(2), lit(8)), n =>
            when(size(w) >= n,
              transform(sequence(lit(1), size(w) - n + 1),
                i => struct(n.as("n"),
                  xxhash64(array_join(slice(w, i.cast("int"), n.cast("int")), " "))
                    .as("g"))))
              .otherwise(array().cast("array<struct<n:int,g:bigint>>"))))
        }
        docs.select(col("doc_id"), size(split(col("text"), " ")).as("ntok"),
            explode(grams).as("gr"))
          .groupBy(col("doc_id"), col("ntok"), col("gr.n").as("n"), col("gr.g").as("g"))
          .agg(count(lit(1)).as("c"))
          .groupBy("doc_id", "ntok", "n")
          .agg(max("c").as("topc"),
            sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dupc"))
          .groupBy("doc_id", "ntok")
          .agg(max(when(col("n") === 2, col("topc"))).as("t2"),
            max(when(col("n") === 5, col("dupc"))).as("d5"))
          .write.format("noop").mode("overwrite").save()
      },
      time("gopher_repetition_local_50k_docs") {
        // t41's new registry default: sorted-gram run-length aggregate
        // WITHIN the row — no explode, no exchange; the whole battery is
        // a projection over the scan. 7 sorts of ~L-long arrays per doc.
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.select("doc_id", "text").crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
          .repartition(cpus.toInt)
        val zero = struct(lit(0L).as("p"), lit(0L).as("r"),
          lit(0L).as("m"), lit(0L).as("d"))
        def step(acc: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) = {
          val r = acc.getField("r"); val m = acc.getField("m"); val dd = acc.getField("d")
          when(r === 0L, struct(x.as("p"), lit(1L).as("r"), lit(0L).as("m"), lit(0L).as("d")))
            .when(x === acc.getField("p"),
              struct(x.as("p"), (r + 1L).as("r"), m.as("m"), dd.as("d")))
            .otherwise(struct(x.as("p"), lit(1L).as("r"), greatest(m, r).as("m"),
              (dd + when(r >= 2L, r).otherwise(0L)).as("d")))
        }
        def fin(acc: org.apache.spark.sql.Column) = {
          val r = acc.getField("r")
          struct(greatest(acc.getField("m"), r).as("topc"),
            (acc.getField("d") + when(r >= 2L, r).otherwise(0L)).as("dupc"))
        }
        val battery = graft.functions.TextFunctions.bind1(split(col("text"), " ")) { wb =>
          struct((2 to 8).map { n =>
            val grams = when(size(wb) >= n,
                array_sort(transform(sequence(lit(1), size(wb) - n + 1),
                  i => xxhash64(array_join(slice(wb, i.cast("int"), lit(n)), " ")))))
              .otherwise(array().cast("array<bigint>"))
            graft.functions.TextFunctions.bind1(grams)(g =>
              aggregate(g, zero, step, fin)).as(s"s$n")
          }: _*)
        }
        docs.select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("ntok"),
            battery.as("b"))
          .write.format("noop").mode("overwrite").save()
      },
      time("audio_features_50k_wavs") {
        // m07 at 10x: 50k real WAV encode+decode round trips through
        // javax.sound in bounded-batch mapPartitions
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.select("doc_id").crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
          .repartition(cpus.toInt)
        graft.operators.Multimodal.audioFeatures(
            graft.operators.Multimodal.withAudioPayload(docs, "doc_id", n = 400),
            "payload")
          .groupBy().agg(sum("sum_sq"), sum("zero_crossings"))
          .write.format("noop").mode("overwrite").save()
      },
      time("mips_50k_vecs") {
        // s30's augmentation + brute-force top-k against a 10x corpus:
        // the transform is a narrow projection; the quadratic leg is the
        // bounded 10-query baseline (the sublinear path is LSH/IVF over
        // the same augmented vectors)
        val e0 = graft.core.Tables.embeddings(spark, sfDir)
        val maxVec = e0.agg(max("vec_id")).as[Long].head() + 1
        val e = e0.crossJoin(copies)
          .withColumn("vec_id", col("vec_id") + col("rep") * maxVec).drop("rep")
        val withNorm = e.select(col("vec_id"), col("embedding"),
          graft.functions.Similarity.l2norm(col("embedding")).as("nrm"))
        val m = withNorm.agg(max(col("nrm")).as("m"))
        val aug = withNorm.crossJoin(broadcast(m)).select(
          col("vec_id"),
          concat(transform(col("embedding"), x => x.cast("double") / col("m")),
            array(sqrt(greatest(lit(0.0),
              lit(1.0) - (col("nrm") / col("m")) * (col("nrm") / col("m"))))))
            .as("aug"))
        val q = withNorm.filter(col("vec_id") < 10).select(
          col("vec_id").as("query_id"),
          concat(transform(col("embedding"), x => x.cast("double") / col("nrm")),
            array(lit(0.0))).as("q_aug"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("sc").desc, col("neighbor_id"))
        aug.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            graft.plans.DotProduct(col("q_aug"), col("aug")).as("sc"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
          .write.format("noop").mode("overwrite").save()
      },
      time("span_dedup_rewrite_50k_docs") {
        // t42's corpus rewrite at 10x: replicated docs make every span
        // a 10-way duplicate, so the removal explode runs at its WORST
        // case (~90% of spans are non-keepers) — if the greedy cut
        // survives here, real corpora (low dup rates) are strictly
        // cheaper
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
          .repartition(cpus.toInt)
        graft.operators.SpanDedup.rewrite(docs.select("doc_id", "text"), w = 10)
          .groupBy().agg(sum("n_removed"), count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      },
      time("winnowing_overlap_50k_docs") {
        // t43 at 10x: ~15M k-gram md5s, ALL inside per-row HOFs (bind1 —
        // see the operator: unbound, the inlined hash array re-evaluates
        // per window and the same entry measured 487 s) — the only
        // exchanged rows are the ~12% selected fingerprints. The
        // replicated corpus is also the pair-volume worst case: every
        // content hash sits in >= 10 replicas, so df^2 pair rows per
        // surviving hash; the stop-fingerprint cap (maxDocs=20, the
        // registry row's setting) bounds that at 190 pairs/hash — an
        // all-duplicate corpus is exactly what the cap exists for.
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
          .repartition(cpus.toInt)
        graft.operators.Winnowing.overlapPairs(
            docs.select("doc_id", "text"), maxDocs = 20, minShared = 8)
          .groupBy().agg(count(lit(1)), sum("n_shared"))
          .write.format("noop").mode("overwrite").save()
      },
      time("winnowing_hashed_50k_docs") {
        // the production kernel for the same selection: fused XXH64 +
        // O(n) monotonic-deque sliding min inside WholeStageCodegen —
        // no md5 strings, no O(n*w) slices; same downstream pairing
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val maxDoc = docs0.agg(max("doc_id")).as[Long].head() + 1
        val docs = docs0.crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("rep") * maxDoc).drop("rep")
          .repartition(cpus.toInt)
        graft.operators.Winnowing.overlapPairs(
            docs.select("doc_id", "text"), maxDocs = 20, minShared = 8,
            hashed = true)
          .groupBy().agg(count(lit(1)), sum("n_shared"))
          .write.format("noop").mode("overwrite").save()
      },
      time("holt_scan_1m_events") {
        // the secondary-sort recurrence scan (w11/w17/w18/w29 all ride
        // it) at 10x events: repartition by key + in-partition sort +
        // one streaming fold, two doubles of state per key
        val ev0 = graft.core.Tables.events(spark, sfDir)
        val maxE = ev0.agg(max("event_id")).as[Long].head() + 1
        val ev = ev0.select("user_id", "event_id", "ts", "value")
          .crossJoin(copies)
          .withColumn("event_id", col("event_id") + col("rep") * maxE)
          .drop("rep")
        graft.operators.Sessionize.holt(ev, "user_id", "ts", "event_id",
            "value", alpha = 0.5, beta = 0.25)
          .groupBy().agg(sum("level"), sum("trend"))
          .write.format("noop").mode("overwrite").save()
      },
      time("icf_aging_intervals_6m_rows") {
        // g18's interval/delta/prefix-sum shape on the 10x roster+records
        // tables: per-record work is constant (<=3 intervals), the
        // islands window keys on (extid, group) — linear in fact size,
        // never snapshot-count x fact-size
        graft.queries.Reporting.icfAging(
            or.select(col("o_orderkey"), col("o_orderpriority"),
              col("o_orderstatus"), col("o_orderdate")),
            li.select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate")))
          .groupBy().agg(sum("n"), count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      },
      time("grid_proximity_150k_pts") {
        // j24's cell join at 10x points with CONSTANT density: each
        // copy's grid shifts north by the full 40-slot span, so cells
        // keep ~the same occupancy and the pair count scales linearly —
        // the invariant that distinguishes a correctly-sized cell join
        // from a disguised cross join
        val c0 = graft.core.Tables.customer(spark, sfDir)
        val maxC = c0.agg(max("c_custkey")).as[Long].head() + 1
        val pts = c0.select("c_custkey").crossJoin(copies)
          .select((col("c_custkey") + col("rep") * maxC).as("id"),
            (lit(3400000L) + (col("c_custkey") % 40) * 2000L).as("ux"),
            (lit(-400000L) + ((col("c_custkey").cast("long") / 40).cast("long") % 40)
              * 2000L + col("rep") * 80000L).as("uy"))
          .select(col("id"), col("ux"), col("uy"),
            floor(col("ux") / 3000.0).cast("long").as("cx"),
            floor(col("uy") / 3000.0).cast("long").as("cy"))
        val r = pts.select(col("id").as("rid"), col("ux").as("rux"),
            col("uy").as("ruy"),
            explode(array(col("cx") - 1, col("cx"), col("cx") + 1)).as("cx"),
            col("cy"))
          .select(col("rid"), col("rux"), col("ruy"), col("cx"),
            explode(array(col("cy") - 1, col("cy"), col("cy") + 1)).as("cy"))
        val km = graft.functions.Geo.haversineKm(
          col("ux") / 100000.0, col("uy") / 100000.0,
          col("rux") / 100000.0, col("ruy") / 100000.0)
        pts.join(r, Seq("cx", "cy")).filter(col("id") < col("rid"))
          .withColumn("km", km).filter(col("km") <= 3.0)
          .groupBy().agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      },
      time("kcore_peel_10x_graph") {
        // g19 on 10 disjoint copies of the sparsified co-purchase graph
        // (per-copy supplier remap): nodes and edges 10x, peel rounds
        // unchanged — each round stays one degree agg + one semi-join
        val liS = li0.select("l_orderkey", "l_suppkey")
        val maxS = liS.agg(max("l_suppkey")).as[Long].head() + 1
        val li10 = liS.crossJoin(copies)
          .select((col("l_orderkey") + col("rep") * maxOk).as("ok"),
            (col("l_suppkey") + col("rep") * maxS).as("sk"))
        val pair = li10.toDF("ok", "x")
          .join(li10.toDF("ok2", "y"), col("ok") === col("ok2") && col("x") < col("y"))
          .select("x", "y").distinct()
        val e = pair.filter(substring(
          md5(concat(col("x").cast("string"), lit("_"),
            col("y").cast("string"), lit("g19"))), 1, 1) === "0")
        graft.operators.Graphs.kCorePeel(e, k = 4L, rounds = 5)
          .groupBy().agg(count(lit(1)), sum("core_deg"))
          .write.format("noop").mode("overwrite").save()
      },
      time("cdc_apply_150k_keys") {
        // io14 at 10x: compaction is one map-side-combinable max_by agg
        // over the 10x feed, the merge one full-outer shuffle join
        val c0 = graft.core.Tables.customer(spark, sfDir)
        val maxC = c0.agg(max("c_custkey")).as[Long].head() + 1
        val base = c0.select("c_custkey", "c_acctbal").crossJoin(copies)
          .select((col("c_custkey") + col("rep") * maxC).as("c_custkey"),
            col("c_acctbal").as("bal"))
        val day = datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long")
        val changes = or.select(
          when(col("o_orderkey") % 17 === 3, col("o_custkey") + 100 * maxC)
            .otherwise(col("o_custkey") + (col("o_orderkey") % nCopies) * maxC)
            .as("c_custkey"),
          when(substring(md5(concat(col("o_orderkey").cast("string"), lit("cdc"))),
            1, 1) === "0", "D").otherwise("U").as("op"),
          col("o_totalprice").as("bal"),
          (day * 100000000L + col("o_orderkey")).as("ordk"))
        graft.operators.Cdc.applyChanges(base, changes,
            Seq("c_custkey"), opCol = "op", ordCol = "ordk")
          .groupBy("cdc_src").agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      },
      time("countmin_1m_events") {
        // a39 at 10x: the sketch builds from PRE-AGGREGATED item counts
        // (one combinable shuffle over the replicated events), cells are
        // 4x the distinct items, the 256-cell sketch broadcasts back —
        // the raw-event volume only touches the first aggregate
        val ev0 = graft.core.Tables.events(spark, sfDir)
        val maxU = 100000L
        val ev = ev0.select("user_id").crossJoin(copies)
          .select((col("user_id") + col("rep") * maxU).as("item"))
        val counts = ev.groupBy(col("item").cast("string").as("item"))
          .agg(count(lit(1)).as("n_true"))
        val cells = counts.select(col("item"), col("n_true"),
            explode(array((0 to 3).map(lit(_)): _*)).as("j"))
          .withColumn("bucket",
            conv(substring(md5(concat(col("item"), lit("#"),
              col("j").cast("string"))), 1, 4), 16, 10).cast("int") % 64)
          .localCheckpoint()
        val sketch = cells.groupBy("j", "bucket").agg(sum("n_true").as("cell"))
        cells.join(broadcast(sketch), Seq("j", "bucket"))
          .groupBy("item", "n_true").agg(min("cell").as("n_cms"))
          .write.format("noop").mode("overwrite").save()
      },
      time("kneser_ney_50k_docs") {
        // t49 at 10x docs: ONE bigram-occurrence aggregate feeds the
        // w1/w2 re-aggregations and the type total; tokens never leave
        // their doc partition before the first combinable count
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val docs = docs0.select("text").crossJoin(copies).drop("rep")
          .repartition(cpus.toInt)
        val big = docs.select(explode(
            graft.functions.TextFunctions.bind1(split(col("text"), " ")) { tt =>
              when(size(tt) >= 2, transform(sequence(lit(0), size(tt) - 2),
                i => struct(element_at(tt, i + 1).as("w1"),
                  element_at(tt, i + 2).as("w2"))))
                .otherwise(array())
            }).as("bg"))
          .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        val bc = big.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val w1s = bc.groupBy("w1").agg(sum("c").as("cw1"), count(lit(1)).as("n1fwd"))
        val w2s = bc.groupBy("w2").agg(count(lit(1)).as("n1back"))
        val tot = bc.agg(count(lit(1)).as("nbt"))
        bc.filter(col("c") >= 5).join(w1s, "w1").join(w2s, "w2")
          .crossJoin(broadcast(tot))
          .select(col("w1"), col("w2"),
            (greatest(col("c").cast("double") - lit(0.75), lit(0.0))
              / col("cw1").cast("double")
              + lit(0.75) * col("n1fwd").cast("double") / col("cw1").cast("double")
              * (col("n1back").cast("double") / col("nbt").cast("double"))).as("p"))
          .write.format("noop").mode("overwrite").save()
      },
      time("mmr_rerank_5k_cands") {
        // s42 at 10x candidate depth: 20 queries x ~5k candidates, the
        // k = 5 greedy rounds stay per-query-keyed joins + aggregates —
        // round cost scales with candidates, never candidates^2
        val e0 = graft.core.Tables.embeddings(spark, sfDir)
        val maxV = e0.agg(max("vec_id")).as[Long].head() + 1
        val e = e0.crossJoin(copies)
          .select((col("vec_id") + col("rep") * maxV).as("vec_id"),
            col("embedding"))
          .withColumn("nrm", graft.functions.Similarity.l2norm(col("embedding")))
          .localCheckpoint()
        val q = e.filter(col("vec_id") < 20).select(col("vec_id").as("qid"),
          col("embedding").as("q_emb"), col("nrm").as("q_norm"))
        val c = e.filter(col("vec_id") >= 20).select(col("vec_id").as("cid"),
          col("embedding").as("c_emb"), col("nrm").as("c_norm"))
        val cand = c.crossJoin(broadcast(q))
          .withColumn("rel", graft.functions.Similarity.dot(col("q_emb"), col("c_emb")) /
            (col("q_norm") * col("c_norm")))
          .select("qid", "cid", "c_emb", "c_norm", "rel")
        graft.operators.Mmr.rerank(cand, k = 5, lam = 0.7, mu = 0.3)
          .groupBy().agg(count(lit(1)), sum("score"))
          .write.format("noop").mode("overwrite").save()
      },
      time("snapshot_diff_1p5m_rows") {
        // io18's full-outer diff at 10x orders: both versions scan once
        // and co-partition on the key — the canonical two-sided shuffle
        val v1 = or.select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
        val v2 = v1.filter(col("k") % 13 =!= 0)
          .withColumn("v", when(col("k") % 7 === 0, col("v") + 100).otherwise(col("v")))
        graft.operators.Cdc.snapshotDiff(v1, v2, Seq("k"))
          .groupBy("status").agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      },
      time("interpolate_spine_25m_rows") {
        // w40 at 10x suppliers (keys shifted per copy): ~25M spine rows
        // through the explicit-count repartition + two window passes —
        // the shape that collapsed to one task without the pinned fan-out
        val dly = li.select((col("l_suppkey") + (col("l_orderkey") % 10) * 10000L).as("s"),
            datediff(to_date(col("l_shipdate")), lit("1970-01-01")).cast("long").as("day"),
            round(col("l_extendedprice") * 100).cast("long").as("xc"))
          .groupBy("s", "day").agg(sum("xc").as("xc"))
          .localCheckpoint()
        val spine = dly.groupBy("s").agg(min("day").as("mn"), max("day").as("mx"))
          .repartition(64, col("s"))
          .select(col("s"), explode(sequence(col("mn"), col("mx"))).as("day"))
        val j = spine.join(dly.toDF("s2", "d2", "xc"),
          col("s") === col("s2") && col("day") === col("d2"), "left")
          .select("s", "day", "xc")
        val wp = org.apache.spark.sql.expressions.Window.partitionBy("s").orderBy("day")
          .rowsBetween(Long.MinValue, 0)
        val wn = org.apache.spark.sql.expressions.Window.partitionBy("s").orderBy("day")
          .rowsBetween(0, Long.MaxValue)
        j.select(col("s"), col("day"), col("xc"),
            last(col("xc"), ignoreNulls = true).over(wp).as("xp"),
            first(col("xc"), ignoreNulls = true).over(wn).as("xn"))
          .groupBy().agg(count(lit(1)), sum("xp"), sum("xn"))
          .write.format("noop").mode("overwrite").save()
      },
      time("bootstrap_ci_1p5m_orders") {
        // a47 at 10x orders: 60M 8-byte index draws, broadcast join-back
        val x = or.select((col("o_orderkey") % 5).cast("string").as("seg"),
          col("o_orderkey").as("okey"),
          round(col("o_totalprice") * 100).cast("long").as("xc"))
        val wR = org.apache.spark.sql.expressions.Window.partitionBy("seg").orderBy("okey")
        val r = x.withColumn("i", row_number().over(wR))
          .withColumn("n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("seg")))
          .select("seg", "xc", "i", "n").localCheckpoint()
        val draws = r.repartition(64).select(col("seg"), col("n"), col("i"),
            explode(sequence(lit(0), lit(39))).as("b"))
          .select(col("seg"), col("n"), col("b"),
            (lit(1) + conv(substring(md5(concat(col("seg"), lit("#"),
              col("b").cast("string"), lit("#"), col("i").cast("string"))),
              1, 8), 16, 10).cast("long") % col("n")).as("idx"))
        draws.join(broadcast(r.select(col("seg").as("s2"), col("i").as("i2"), col("xc"))),
            col("seg") === col("s2") && col("idx") === col("i2"))
          .groupBy("seg", "b", "n").agg(sum("xc").as("s"))
          .write.format("noop").mode("overwrite").save()
      },
      time("kruskal_rank_1p5m_orders") {
        // a45 at 10x orders: two-level global rank (bucket prefix +
        // partitioned within-bucket) over ~1M distinct cent values
        val u = or.select((col("o_orderkey") % 5).cast("string").as("seg"),
          round(col("o_totalprice") * 100).cast("long").as("xc"))
        val vals = u.groupBy("xc").agg(count(lit(1)).as("cnt"))
          .withColumn("bkt", expr("xc div 100000")).localCheckpoint()
        val bcnt = vals.groupBy("bkt").agg(sum("cnt").as("bn"))
        val wb = org.apache.spark.sql.expressions.Window.orderBy("bkt")
          .rowsBetween(Long.MinValue, -1)
        val bpre = bcnt.withColumn("bb", coalesce(sum("bn").over(wb), lit(0L)))
          .select("bkt", "bb")
        val ww = org.apache.spark.sql.expressions.Window.partitionBy("bkt")
          .orderBy("xc").rowsBetween(Long.MinValue, 0)
        val rk = vals.join(broadcast(bpre), "bkt")
          .withColumn("before", col("bb") + sum("cnt").over(ww) - col("cnt"))
          .select(col("xc"), (lit(2) * col("before") + col("cnt") + 1).as("avg2"))
        u.join(rk, "xc").groupBy("seg")
          .agg(count(lit(1)).as("ng"), sum("avg2").as("ss"))
          .write.format("noop").mode("overwrite").save()
      },
      time("clustering_coeff_10x_graph") {
        // g24 at 10x order volume: same degree-oriented bound, denser
        // co-purchase graph (suppliers unreplicated by design)
        val pair = li.select(col("l_orderkey").as("ok"), col("l_suppkey").as("x"))
          .join(li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("y")),
            col("ok") === col("ok2") && col("x") < col("y"))
          .select("x", "y").distinct()
        val e = pair.filter(substring(md5(concat(col("x").cast("string"), lit("_"),
          col("y").cast("string"), lit("g24"))), 1, 1) === "0").localCheckpoint()
        val deg = e.select(col("x").as("node")).unionAll(e.select(col("y")))
          .groupBy("node").agg(count(lit(1)).as("dg")).localCheckpoint()
        val withDeg = e.join(deg.toDF("nx", "dx"), col("x") === col("nx"))
          .join(deg.toDF("ny", "dy"), col("y") === col("ny"))
        val xFirst = struct(col("dx"), col("x")) < struct(col("dy"), col("y"))
        val de = withDeg.select(
          when(xFirst, col("x")).otherwise(col("y")).as("src"),
          when(xFirst, col("y")).otherwise(col("x")).as("dst")).localCheckpoint()
        val wedge = de.toDF("u", "v")
          .join(de.toDF("s2", "w"), col("u") === col("s2") && col("v") < col("w"))
          .select("u", "v", "w")
        val closing = de.select(least(col("src"), col("dst")).as("cv"),
          greatest(col("src"), col("dst")).as("cw"))
        wedge.join(closing, col("v") === col("cv") && col("w") === col("cw"))
          .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
          .groupBy("node").agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      },
      time("pixel_decode_20k_imgs") {
        // m09 at 40x images: 20k real PNG decodes -> 20M pixel rows ->
        // immediate (id, r) aggregate; decode parallelism = partitions
        val ids = spark.range(20000).select(col("id").as("doc_id"))
          .repartition(cpus.toInt)
        val withP = graft.operators.Multimodal.withImagePayload(ids, "doc_id")
        graft.operators.Multimodal.decodePixels(withP, "doc_id", "payload")
          .groupBy("id", "r").agg(count(lit(1)).as("c"))
          .groupBy("id").agg(count(lit(1)), max("c"))
          .write.format("noop").mode("overwrite").save()
      },
      time("scd2_lookup_1p5m_facts") {
        // j29 at scale: equi join on the key + residual interval filter;
        // versions per key stay bounded (<= 2), so the join is an
        // ordinary shuffle at any volume
        val c0 = graft.core.Tables.customer(spark, sfDir)
        val base = lit(java.sql.Date.valueOf("1995-01-01"))
        val v1 = c0.select(col("c_custkey"), col("c_mktsegment").as("seg"),
          lit(java.sql.Date.valueOf("1992-01-01")).as("valid_from"),
          when(col("c_custkey") % 3 === 0,
            date_add(base, (col("c_custkey") % 1000).cast("int")))
            .otherwise(lit(java.sql.Date.valueOf("9999-12-31"))).as("valid_to"))
        val v2 = c0.filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), concat(lit("M:"), col("c_mktsegment")).as("seg"),
            date_add(base, (col("c_custkey") % 1000).cast("int")).as("valid_from"),
            lit(java.sql.Date.valueOf("9999-12-31")).as("valid_to"))
        or.select(col("o_orderkey"), col("o_custkey"),
            to_date(col("o_orderdate")).as("od"))
          .join(v1.unionByName(v2), col("o_custkey") === col("c_custkey")
            && col("od") >= col("valid_from") && col("od") < col("valid_to"))
          .write.format("noop").mode("overwrite").save()
      },
      time("jw_match_20k_dirty") {
        // j30 at scale: |dirty| x |catalog| codegen'd JaroWinkler scores;
        // linear in dirty rows with the catalog broadcast
        val p0 = graft.core.Tables.part(spark, sfDir)
        val clean = p0.select(col("p_name").as("cand")).distinct()
        p0.select(col("p_partkey"),
            concat_ws(" ", split(col("p_name"), " ")(1),
              split(col("p_name"), " ")(0)).as("dn"))
          .crossJoin(broadcast(clean))
          .withColumn("s", graft.plans.JaroWinkler(col("dn"), col("cand")))
          .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")
              .orderBy(col("s").desc, col("cand"))))
          .filter(col("rn") === 1)
          .write.format("noop").mode("overwrite").save()
      },
      time("kll_sketch_6m_events") {
        // a51's sketch at raw event volume: one hash agg whose state is
        // O(k log n/k) doubles per group; merge-heavy at 32 partitions
        val ev0 = graft.core.Tables.events(spark, sfDir)
        ev0.select(col("event_type"), col("value").cast("double").as("v"))
          .crossJoin(copies)
          .groupBy("event_type")
          .agg(graft.plans.KllSketch(col("v"), 256, Seq(0.5, 0.9, 0.99)))
          .write.format("noop").mode("overwrite").save()
      },
      time("doc_novelty_50k_docs") {
        // t57's round-12 shape: copies SHARE shingles, so hot first-doc
        // blocks grow with the copy count — the round-11 WINDOW-min form
        // was superlinear here (4.3 s @10x -> 24.0 s @100x, one task per
        // hot shingle). The agg form partial-aggregates the hot key
        // map-side (one row per input partition reaches the exchange)
        // and needs no join-back: per-doc novel counts are a count over
        // the per-shingle argmin table.
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        val docs = docs0.select(col("doc_id"), col("text")).crossJoin(copies)
          .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"), col("text"))
        val perDoc = docs.select(col("doc_id"),
            size(graft.functions.TextFunctions.shingles(col("text"), 3))
              .cast("long").as("n_shingles"))
          .filter(col("n_shingles") >= 1)
        val novel = docs.select(col("doc_id"),
            explode(graft.functions.TextFunctions.shingles(col("text"), 3)).as("s"))
          .groupBy("s").agg(min("doc_id").as("first_doc"))
          .groupBy(col("first_doc").as("doc_id")).agg(count(lit(1)).as("n_novel"))
        perDoc.join(novel, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_shingles"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"))
          .write.format("noop").mode("overwrite").save()
      },
      time("keyword_tagging_50k_docs") {
        // t56 at 10x docs: tokenize once + broadcast dict join — linear
        val docs0 = graft.core.Tables.documents(spark, sfDir)
        import spark.implicits._
        val dict = Seq(("compute", "scan"), ("compute", "hash"),
          ("compute", "merge"), ("engine", "spark"), ("engine", "table"),
          ("perf", "slow"), ("perf", "fast")).toDF("cat", "kw")
        docs0.select(col("doc_id"), col("text")).crossJoin(copies)
          .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
            explode(split(col("text"), " ")).as("tok"))
          .join(broadcast(dict), col("tok") === col("kw"))
          .groupBy("doc_id", "cat").agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      },
      time("se_fanout_1p5m_orders") {
        // g29's two-level fan-out at 10x orders: the per-household agg is
        // the only data-sized stage; no count-distinct Expand anywhere
        val o = or.select(year(col("o_orderdate")).cast("long").as("visit"),
          (col("o_custkey") % 4).as("assignment"), col("o_custkey").as("hh"),
          when(col("o_orderstatus") === "O", "in")
            .when(col("o_orderstatus") === "F", "out").otherwise("eos").as("st"),
          (col("o_totalprice") < 20000).as("ref"))
        val conds = Seq[(String, org.apache.spark.sql.Column)](
          "overall" -> lit(true), "in" -> (col("st") === "in"),
          "out" -> (col("st") === "out"), "eos" -> (col("st") === "eos"),
          "refusal" -> col("ref"))
        val l1 = o.groupBy("visit", "assignment", "hh").agg(
          conds.head match { case (n, c) => count(when(c, 1)).as(s"i_$n") },
          (conds.tail.map { case (n, c) => count(when(c, 1)).as(s"i_$n") } ++
            conds.map { case (n, c) =>
              max(when(c, 1L).otherwise(0L)).as(s"h_$n") }): _*)
        l1.groupBy("visit", "assignment").agg(
            sum(s"i_${conds.head._1}").as("i0"),
            (conds.tail.map { case (n, _) => sum(s"i_$n").as(s"i_$n") } ++
              conds.map { case (n, _) => sum(s"h_$n").as(s"h_$n") }): _*)
          .write.format("noop").mode("overwrite").save()
      },
      time("absence_anti_1m_events") {
        // j27 at 10x/100x events (user keys shifted per copy): the
        // interval NOT EXISTS as a bucket-replicated (user, hour) equi
        // ANTI join — per-bucket fan-out is copy-invariant because each
        // copy gets its own user space, so cost is linear in rows
        val ev0 = graft.core.Tables.events(spark, sfDir)
        val ev = ev0.select("event_id", "user_id", "event_type", "ts")
          .crossJoin(copies)
          .select(col("event_id"), (col("user_id") + col("rep") * 100000L).as("user_id"),
            col("event_type"), expr("unix_micros(ts)").as("us"))
        val p = ev.filter(col("event_type") === "purchase")
          .withColumn("bkt", expr("us div 3600000000"))
        val e = ev.filter(col("event_type") === "error")
          .select(col("user_id").as("eu"), col("us").as("eus"))
          .withColumn("bkt", explode(array(
            expr("eus div 3600000000"), expr("eus div 3600000000") - 1)))
        p.join(e, col("user_id") === col("eu") && p("bkt") === e("bkt") &&
            col("eus") > col("us") && col("eus") <= col("us") + 3600000000L,
          "left_anti")
          .write.format("noop").mode("overwrite").save()
      },
      time("fuzzy_dupes_1m_events") {
        // j28 at scale: the 2D-blocked (user, 10-min bucket) self-join,
        // x3 probe replication; same copy-shifted user space, so block
        // sizes — and the join's quadratic term — stay constant
        val ev0 = graft.core.Tables.events(spark, sfDir)
        val p = ev0.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .crossJoin(copies)
          .select((col("event_id") + col("rep") * 10000000L).as("event_id"),
            (col("user_id") + col("rep") * 100000L).as("user_id"),
            expr("unix_micros(ts)").as("us"),
            round(col("value") * 100).cast("long").as("c"))
          .localCheckpoint()
        val a = p.toDF("id_a", "user_id", "us_a", "ca")
          .withColumn("bkt", explode(array(expr("us_a div 600000000") - 1,
            expr("us_a div 600000000"), expr("us_a div 600000000") + 1)))
        val b = p.toDF("id_b", "ub", "us_b", "cb")
          .withColumn("bkt", expr("us_b div 600000000"))
        a.join(b, col("user_id") === col("ub") && a("bkt") === b("bkt") &&
            col("id_a") < col("id_b") &&
            abs(col("us_b") - col("us_a")) <= 600000000L)
          .filter(lit(100) * abs(col("ca") - col("cb")) <= col("ca"))
          .write.format("noop").mode("overwrite").save()
      },
      time("rfm_ntile_users") {
        // w44's shape hazard made measurable: the three ntile windows are
        // GLOBAL (no partition key), i.e. one sort task over
        // |users| = copies x 100k rows. Fine while users << events; the
        // scale path past ~10M users is score-by-quantile-bounds
        // (approx_percentile broadcast), not a global sort.
        val ev0 = graft.core.Tables.events(spark, sfDir)
        val p = ev0.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value")).crossJoin(copies)
          .groupBy((col("user_id") + col("rep") * 100000L).as("user_id"))
          .agg(max(expr("unix_micros(ts) div 86400000000")).as("last_day"),
            count(lit(1)).as("f"),
            sum(round(col("value") * 100).cast("long")).as("m_cents"))
        val w = org.apache.spark.sql.expressions.Window
        p.withColumn("rs", ntile(5).over(w.orderBy(col("last_day").desc, col("user_id"))))
          .withColumn("fs", ntile(5).over(w.orderBy(col("f").desc, col("user_id"))))
          .withColumn("ms", ntile(5).over(w.orderBy(col("m_cents").desc, col("user_id"))))
          .write.format("noop").mode("overwrite").save()
      },
      time("runs_test_1m_events") {
        // a50 at scale: the only data-sized stage is the (type, day)
        // daily aggregate — ranks/signs/run-count run on day-cardinality
        // rows, copy-invariant; expect near-flat growth past the agg
        val ev0 = graft.core.Tables.events(spark, sfDir)
        val daily = ev0.select(col("event_type"), col("ts"), col("value"))
          .crossJoin(copies)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(floor(sum(col("value").cast("decimal(18,4)")).cast("double")
            * lit(1000000.0) + lit(0.5)).cast("long").as("q"))
          .localCheckpoint()
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("q", "day")
        val r = daily.withColumn("rn", row_number().over(wr))
          .withColumn("m", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
        val med = r.filter(col("rn") === floor((col("m") + 1) / 2)
            || col("rn") === floor((col("m") + 2) / 2))
          .groupBy("event_type").agg(expr("(sum(q) * 2) div count(*)").as("med2"))
        val wd = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("day")
        daily.join(broadcast(med), "event_type")
          .filter(lit(2) * col("q") =!= col("med2"))
          .select(col("event_type"), col("day"),
            when(lit(2) * col("q") > col("med2"), 1).otherwise(0).as("s"))
          .withColumn("prev", lag("s", 1).over(wd))
          .groupBy("event_type")
          .agg(sum(when(col("prev").isNull || col("prev") =!= col("s"), 1)
            .otherwise(0)).as("r"))
          .write.format("noop").mode("overwrite").save()
      },
      time("hash_chain_1m_events") {
        // io20 at scale: the md5 recurrence rides ONE secondary-sort
        // exchange; state is 32 chars/key; linear in rows, parallel in
        // (copy-shifted) users
        val ev0 = graft.core.Tables.events(spark, sfDir)
        val ev = ev0.select("user_id", "event_id", "ts").crossJoin(copies)
          .select((col("user_id") + col("rep") * 100000L).as("user_id"),
            col("event_id"), col("ts"),
            col("event_id").cast("string").as("payload"))
        graft.operators.Cdc.hashChain(ev, "user_id", Seq("ts", "event_id"),
            "payload")
          .groupBy("user_id").agg(count(lit(1)),
            max_by(col("chain"), struct(col("ts"), col("event_id"))))
          .write.format("noop").mode("overwrite").save()
      },
      time("macd_scan_1m_events") {
        // w42/st20 kernel at scale: three coupled EWMA recurrences in the
        // same one-exchange scan shape as hash_chain — the recurrence
        // family's cost is the exchange, not the fold
        val ev0 = graft.core.Tables.events(spark, sfDir)
        val ev = ev0.select("user_id", "event_id", "ts", "value").crossJoin(copies)
          .select((col("user_id") + col("rep") * 100000L).as("user_id"),
            col("event_id"), expr("unix_micros(ts)").as("us"), col("value"))
        graft.operators.Sessionize.macd(ev, "user_id", "us", "value",
            aFast = 0.25, aSlow = 0.0625, aSig = 0.125)
          .write.format("noop").mode("overwrite").save()
      },
      time("partition_audit_1p5m_rows") {
        // io19 at scale: partitioned write + read-back + per-partition
        // sorted-md5 manifest. The collect_list per partition is the
        // documented cost — each partition's rows assemble in ONE agg
        // buffer, so partition GRAIN (here priority x orderkey-bucket)
        // must bound rows/partition; the audit itself is one exchange.
        val root = graft.core.TempDirs.scratch("graft_scale_audit_").toString
        or.select(col("o_orderkey"), col("o_orderpriority"),
            (col("o_orderkey") % 16).as("bkt"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .write.partitionBy("o_orderpriority", "bkt")
          .mode("overwrite").parquet(root)
        spark.read.parquet(root)
          .select(col("o_orderpriority").as("pri"), col("bkt"),
            struct(col("o_orderkey"),
              concat_ws(":", col("o_orderkey"), col("cents")).as("s")).as("r"))
          .groupBy("pri", "bkt")
          .agg(count(lit(1)),
            md5(concat_ws("|",
              transform(sort_array(collect_list(col("r"))), e => e.getField("s")))))
          .write.format("noop").mode("overwrite").save()
      },
      time("t_closeness_1p5m_rows") {
        // p21 at scale over copy-replicated customers: cohort and band
        // tables are cardinality-bound (nations x segs x 4), so only the
        // first aggregate sees data volume
        val c0 = graft.core.Tables.customer(spark, sfDir)
        val j = c0.select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
          .crossJoin(copies)
          .select(col("c_nationkey").as("nation"), col("c_mktsegment").as("seg"),
            when(col("c_acctbal") < 0, 0).when(col("c_acctbal") < 3000, 1)
              .when(col("c_acctbal") < 7000, 2).otherwise(3).as("band"))
          .localCheckpoint()
        val g = j.groupBy("band").agg(count(lit(1)).as("pc"))
        val np = g.agg(sum("pc").as("np"))
        val coh = j.groupBy("nation", "seg").agg(count(lit(1)).as("nq"))
        val q = j.groupBy("nation", "seg", "band").agg(count(lit(1)).as("qc"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("nation", "seg").orderBy("band")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        coh.select(col("nation"), col("seg"), col("nq"),
            explode(sequence(lit(0), lit(3))).as("band"))
          .join(q, Seq("nation", "seg", "band"), "left")
          .join(broadcast(g), "band")
          .select(col("nation"), col("seg"), col("nq"), col("band"),
            sum(coalesce(col("qc"), lit(0L))).over(w).as("cq"),
            sum(col("pc")).over(w).as("cp"))
          .crossJoin(broadcast(np))
          .groupBy("nation", "seg", "nq", "np")
          .agg(sum(abs(col("cq") * col("np") - col("cp") * col("nq"))).as("num"))
          .write.format("noop").mode("overwrite").save()
      },
      time("zone_dwell_1m_events") {
        // j26 at 10x events (user keys shifted per copy): one (user)
        // exchange feeds lag + cumsum + the session aggregate
        val ev0 = graft.core.Tables.events(spark, sfDir)
        val maxU = 100000L
        val ev = ev0.select("event_id", "user_id", "ts").crossJoin(copies)
          .select(col("event_id"), (col("user_id") + col("rep") * maxU).as("user_id"),
            col("ts"))
        val h48 = expr("(unix_micros(ts) div 3600000000) % 48")
        val pos = ev.select(col("event_id"), col("user_id"), col("ts"),
          (lit(34.0) + ((col("user_id") * 7 + h48) % 70) * 0.1).as("lon"),
          (lit(-4.0) + ((col("user_id") + h48) % 70) * 0.1).as("lat"))
        val inside = graft.functions.Geo.haversineKm(col("lon"), col("lat"),
          lit(37.5), lit(-0.5)) <= 150.0
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        pos.withColumn("inside", inside)
          .withColumn("prev", lag(col("inside"), 1).over(w))
          .withColumn("grp", sum(when(col("prev").isNull
            || col("prev") =!= col("inside"), 1L).otherwise(0L)).over(w))
          .filter(col("inside"))
          .groupBy("user_id", "grp").agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      })

    val rows = li.count()
    val kept = results.filter(_._2 >= 0)
    val qs = kept.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"scale${nCopies}x","rows":$rows,"unit":"sec","queries":$qs}""")
    spark.stop()
  }
}
