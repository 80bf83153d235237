package graft

import graft.operators.Skew
import graft.sources.Tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-mechanism evidence: the partitioning machinery a 100 TB deployment
  * leans on, exercised and asserted locally — salted joins return identical
  * results, bucketing removes the join-time shuffle, writes are
  * partition-prunable. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("salted join equals plain join (inner and left)") {
    val o = Tables.orders(spark, sf).withColumnRenamed("o_custkey", "custkey")
    val c = Tables.customer(spark, sf).withColumnRenamed("c_custkey", "custkey")
    for (jt <- Seq("inner", "left")) {
      val plain = o.join(c, Seq("custkey"), jt)
        .select("o_orderkey", "custkey", "c_name")
        .collect().map(_.toString).sorted
      val salted = Skew.saltedJoin(o, c, "custkey", nSalts = 7, joinType = jt)
        .select("o_orderkey", "custkey", "c_name")
        .collect().map(_.toString).sorted
      assert(plain.sameElements(salted), s"$jt salted join diverged")
    }
  }

  test("bucketed tables co-locate: no Exchange in the join plan") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = Tables.orders(spark, sf)
      val c = Tables.customer(spark, sf)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      o.write.option("path", s"$wh/b_orders").bucketBy(8, "o_custkey")
        .sortBy("o_custkey").mode("overwrite").saveAsTable("b_orders")
      c.write.option("path", s"$wh/b_customer").bucketBy(8, "c_custkey")
        .sortBy("c_custkey").mode("overwrite").saveAsTable("b_customer")
      val joined = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == Tables.orders(spark, sf).join(
        Tables.customer(spark, sf), col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("incremental minhash index: a new batch dedups against the corpus bucket-aligned") {
    import graft.operators.Dedup
    val wh = java.nio.file.Files.createTempDirectory("graft-idx").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS ddidx_bands")
      spark.sql("DROP TABLE IF EXISTS ddidx_shingles")
      val docs = Tables.documents(spark, sf)
      Dedup.writeMinhashIndex(docs, "doc_id", "text", "ddidx", wh)
      // a new ingest batch: 50 corpus texts under shifted ids — every batch
      // doc is an exact dup of its source (identical signatures, so every
      // band matches and detection is certain)
      val batch = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      val pairs = Dedup.nearDupAgainstIndex(spark, batch, "doc_id", "text", "ddidx")
      val plan = pairs.queryExecution.executedPlan.toString
      // the corpus side is read through its buckets, never shuffled: the
      // only (band, bhash) Exchange in the plan is the batch side
      assert(plan.contains("SelectedBucketsCount"),
        s"index scan is not bucketed:\n$plan")
      val bandExchanges = "Exchange hashpartitioning\\(band".r
        .findAllIn(plan).size
      assert(bandExchanges <= 1, s"index side shuffled:\n$plan")
      val hits = pairs
        .filter(col("corpus_id") === col("new_id") - 100000L)
        .select("new_id").distinct().count()
      assert(hits == 50L, s"expected all 50 batch docs to hit their source, got $hits")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS ddidx_bands")
      spark.sql("DROP TABLE IF EXISTS ddidx_shingles")
    }
  }

  test("eval-window decontamination index: batches probe bucket-aligned and catch a planted leak") {
    import graft.operators.Dedup
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-decontam").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS dcidx_evalwins")
      // frozen eval set: every 10th corpus doc
      val docs = Tables.documents(spark, sf)
      Dedup.writeEvalWindowIndex(docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", "dcidx", wh)
      // an ingest batch with a planted leak: a verbatim copy of eval doc 0
      val batch = docs.filter(col("doc_id") === 0L)
        .select(lit(700001L).as("doc_id"), col("text"))
        .union(Seq((700002L, "totally clean ingest content here")).toDF("doc_id", "text"))
      val rep = Dedup.contaminationAgainstIndex(spark, batch, "doc_id", "text", "dcidx")
      val plan = rep.queryExecution.executedPlan.toString
      // the index side is read through its buckets, never shuffled
      assert(plan.contains("SelectedBucketsCount"), s"index scan not bucketed:\n$plan")
      val hashExchanges = "Exchange hashpartitioning\\(h1".r.findAllIn(plan).size
      assert(hashExchanges <= 1, s"index side shuffled:\n$plan")
      val got = rep.as[(Long, Long, Long)].collect()
      assert(got.exists(r => r._1 == 700001L && r._2 == 0L && r._3 >= 1L),
        s"planted leak not caught: ${got.toSeq}")
      assert(!got.exists(_._1 == 700002L), s"clean doc flagged: ${got.toSeq}")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS dcidx_evalwins")
    }
  }

  test("q03/q18 broadcast customer by size at test scale without a forced hint") {
    // customer grows with the scale factor, so the queries carry NO
    // broadcast() hint on it — the optimizer's size threshold must still
    // pick a broadcast join while the table fits (i.e. dropping the hint
    // cost nothing at test scale), and would shuffle-join at 100 TB
    for (q <- Seq(graft.operators.Relational.q03JoinAgg _,
        graft.operators.Relational.q18StarJoin _)) {
      val plan = q(spark, sf).queryExecution.sparkPlan.toString
      val bcastCustomer = plan.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("c_custkey"))
      assert(bcastCustomer,
        s"expected size-based broadcast of customer at test scale:\n$plan")
    }
  }

  test("q45 plan: no aggregation before the bucket shuffle (single-pass band kernel)") {
    val plan = graft.operators.Dedup.q45MinhashPairs(spark, sf)
      .queryExecution.executedPlan.toString
    // signature computation must be a projection, not explode+groupBy:
    // the only object-hash aggregate allowed is candidatePairs' collect_list
    val objAggs = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(objAggs <= 2, s"signature pipeline re-grew aggregations ($objAggs):\n${plan.take(2000)}")
    assert(plan.contains("minhash_bands"), "band kernel missing from the plan")
    // the corpus-wide global-window scale-killer must never come back
    assert(!plan.matches("(?s).*Window \\[.*\\].*windowspecdefinition\\(\\)."),
      "un-partitioned window reappeared")
  }

  test("salted join plan: in the non-broadcast regime the shuffle key includes the salt") {
    // q73's 5-row dim broadcasts at test scale (no join shuffle at all —
    // even better); the salted shape matters when the dim CAN'T broadcast,
    // so that's the regime this plan test pins
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ev = Tables.events(spark, sf)
      val dim = ev.select(col("event_type")).distinct()
      val plan = graft.operators.Skew.saltedJoin(ev, dim, "event_type", nSalts = 8)
        .queryExecution.executedPlan.toString
      assert("hashpartitioning\\(event_type[^)]*__salt".r.findFirstIn(plan).isDefined,
        s"join does not shuffle on (event_type, __salt):\n${plan.take(2000)}")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("gopher gate plan: one bigram shuffle, token chars stay a projection") {
    val docs = Tables.documents(spark, sf)
    val plan = graft.operators.TextAnalysis.gopherBigramGate(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // token chars must come from the per-row aggregate() over the token
    // array — no explode of raw tokens anywhere in this plan
    assert(!plan.contains("explode(filter(split"),
      s"token-level explode crept back into the gate:\n${plan.take(2000)}")
    assert(plan.contains("word_shingles"), "bigram kernel missing")
  }

  test("fixed-size sample plan: rank filter becomes a pre-shuffle WindowGroupLimit") {
    val plan = graft.operators.Sampling
      .fixedSizeSample(Tables.documents(spark, sf), "lang", "doc_id", 30)
      .queryExecution.executedPlan.toString
    // Spark pushes rn <= k below the stratum exchange: each map task emits
    // at most k rows per stratum, so the shuffle never carries the stratum
    assert(plan.contains("WindowGroupLimit"),
      s"rank limit not pushed below the shuffle:\n${plan.take(2000)}")
  }

  test("simhash multi-index buckets stay tiny at 100x test scale (cap never engages)") {
    // the old 4x16-bit single-chunk split measured a 291-doc hot bucket at
    // sf0.1 (needed a 4096 cap for exactness); the 32-bit subset keys must
    // keep every real bucket far below the 256 default cap, so exactness
    // holds with no per-corpus tuning
    val pairs = graft.operators.Dedup.q46SimhashPairs(spark, "/root/testdata/sf0.1")
    pairs.collect()
    val metric = pairs.queryExecution.observedMetrics("simhash_bucket_cap")
    assert(metric.getAs[Long]("dropped_rows") == 0L,
      s"default cap dropped candidates at sf0.1: $metric")
    assert(metric.getAs[Long]("max_bucket_size") <= 32L,
      s"hot bucket re-emerging under multi-index blocking: $metric")
  }

  test("q87 plan: chunking is explode-only — no shuffle before the presentation sort") {
    val plan = graft.operators.TextAnalysis.chunkTokens(
        Tables.documents(spark, sf), "doc_id", "text", 64, 48)
      .queryExecution.executedPlan.toString
    // the operator itself (no orderBy here) must be scan -> project ->
    // generate -> project: each input split chunks independently at 100 TB
    assert(!plan.contains("Exchange"), s"chunking grew a shuffle:\n${plan.take(2000)}")
    assert(plan.contains("Generate"), "posexplode missing from the plan")
  }

  test("q88 plan: both range-frame aggregates share one Window and one shuffle") {
    val plan = graft.operators.Relational.q88TimeRangeWindow(spark, sf)
      .queryExecution.executedPlan.toString
    val windows = "\\bWindow\\b".r.findAllIn(plan).size
    assert(windows == 1, s"expected a single collapsed Window, got $windows:\n${plan.take(2000)}")
    // one data shuffle (hash on user_id) + the presentation range sort
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"range window grew extra shuffles ($exchanges):\n${plan.take(2000)}")
  }

  test("q89 plan: packing windows are per-(stream,shard) — no global window") {
    val plan = graft.operators.TextAnalysis.packSequences(
        Tables.documents(spark, sf), "doc_id", "text", "lang", 256L, 8)
      .queryExecution.executedPlan.toString
    // an empty partition spec would serialize the whole corpus through one
    // task; the spec must carry both stream and shard
    assert(!plan.contains("windowspecdefinition(doc_id"),
      s"window lost its partition spec:\n${plan.take(2000)}")
    assert(plan.contains("windowspecdefinition(stream"),
      s"expected (stream, shard)-partitioned window:\n${plan.take(2000)}")
  }

  test("q91 plan: sequence assembly rides the packing shuffle — one data exchange") {
    val plan = graft.operators.TextAnalysis.assembleSequences(
        Tables.documents(spark, sf), "doc_id", "text", "lang", 256L, 8)
      .queryExecution.executedPlan.toString
    // grouping by (stream, shard, seq_id) is a superset of the window's
    // (stream, shard) partitioning, so the per-sequence aggregate must NOT
    // introduce a second shuffle
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"assembly grew a second shuffle ($exchanges):\n${plan.take(2000)}")
  }

  test("q90 plan: bm25 is two scans + one broadcast — no per-term shuffle") {
    val plan = graft.operators.TextAnalysis.bm25Search(
        Tables.documents(spark, sf), "doc_id", "text",
        graft.operators.TextAnalysis.Bm25QueryTerms)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"corpus stats must broadcast:\n${plan.take(2000)}")
    // only the stats aggregation may shuffle; scoring stays a projection
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 0, s"bm25 grew a hash shuffle ($shuffles):\n${plan.take(2000)}")
    assert(!plan.contains("Generate"), "bm25 must not explode tokens")
  }

  /** The FINAL adaptive plan only — AQE's toString appends the initial
    * plan, which double-counts every node for string assertions. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q97 plan: span window hashes span HASHES, not strings; no extra shuffles") {
    val plan = finalPlan(graft.operators.Dedup.spanDedup(
      Tables.documents(spark, sf), "doc_id", "text"))
    // the first-occurrence window partitions on the 128-bit span hashes —
    // the raw span strings must never be a shuffle key (they would ride
    // the wire twice)
    assert(plan.contains("xxhash64"), s"span hashes missing:\n${plan.take(2000)}")
    assert(!"hashpartitioning\\(span".r.findFirstIn(plan).isDefined,
      s"shuffle keyed on raw span strings:\n${plan.take(2000)}")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles <= 3, s"span dedup grew extra shuffles ($shuffles):\n${plan.take(2000)}")
  }

  test("q99 plan: the model materializes one corpus explode; scoring adds the only other") {
    val plan = finalPlan(graft.operators.TextAnalysis.lmPerplexity(
      Tables.documents(spark, sf), "doc_id", "text"))
    // the fit checkpoints the counts table, so the SCORING plan contains
    // exactly one corpus explode (the doc bigrams); marginals and vocab
    // read the materialized counts, never the corpus
    val corpusExplodes = "Generate explode\\(word_shingles".r.findAllIn(plan).size
    assert(corpusExplodes == 1,
      s"LM consumers re-explode the corpus ($corpusExplodes):\n${plan.take(3000)}")
  }

  test("q100 plan: resample is one span agg + one key-hashed window — no join blow-up") {
    val plan = graft.operators.AsOf.resampleLocf(
        Tables.events(spark, sf), "user_id", "ts", "value", 3600L, "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"resample must not join grid x events:\n${plan.take(2000)}")
    assert(plan.contains("windowspecdefinition(__k"),
      s"LOCF window must partition on the key:\n${plan.take(2000)}")
  }

  test("q115 plan: all-pairs tf-idf has no cartesian/BNLJ; pair space is slice-capped") {
    val plan = graft.operators.TextAnalysis.tfidfAllPairsTopK(
        Tables.documents(spark, sf), "doc_id", "text", k = 3)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // (BroadcastNestedLoopJoin appears legitimately: the 1-row broadcast
    // of the corpus count N is the standard scalar-join shape)
    assert(!plan.contains("CartesianProduct"),
      s"corpus-wide similarity must never go all-pairs:\n${plan.take(2000)}")
    // the pair explosion is the bounded slice(ps, i+2, maxPosting) kernel,
    // not a postings self-join of the weighted table
    assert(plan.contains("slice(") && plan.contains(", 4096)"),
      s"pair generation must be the capped term-at-a-time explode:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin") ||
      "SortMergeJoin".r.findAllIn(plan).size <= 2,
      s"unexpected join blow-up in the pair path:\n${plan.take(2000)}")
  }

  test("q117/q118 plan: frame explode runs over bucket SKETCHES, not raw events") {
    // the frame Generate must consume the per-bucket sketch column (events
    // reduced to one sketch per bucket BEFORE the fan-out to covering
    // frames) and never a raw value column — the property that makes
    // phase-2 volume independent of event count
    for ((name, df) <- Seq(
        "q117" -> graft.operators.SketchQueries.slidingSketchDistinct(
          Tables.events(spark, sf), "ts", "event_type", "user_id", 3600L, 6,
          algo = "lc", precision = 65536),
        "q118" -> graft.operators.SketchQueries.slidingKllQuantile(
          Tables.events(spark, sf), "ts", "event_type", "value", 3600L, 6,
          probs = Seq(0.5)),
        "q120" -> graft.operators.SketchQueries.slidingTopK(
          Tables.events(spark, sf).withColumn("user_s",
            org.apache.spark.sql.functions.col("user_id").cast("string")),
          "ts", "event_type", "user_s", 3600L, 6, k = 3, capacity = 8192),
        "q127" -> graft.operators.SketchQueries.slidingCmEstimate(
          Tables.events(spark, sf).withColumn("user_s",
            org.apache.spark.sql.functions.col("user_id").cast("string")),
          "ts", "event_type", "user_s", 3600L, 6, probe = "42"))) {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val genInputs = "(?m)^\\(\\d+\\) Generate\\s*\\nInput \\[\\d+\\]: \\[([^\\]]*)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(genInputs.nonEmpty, s"$name: no Generate in plan:\n${plan.take(2000)}")
      // the frame explode itself carries the sketch; q118 adds a second,
      // benign posexplode of the per-frame quantile ARRAY (post-merge)
      assert(genInputs.exists(_.contains("sk#")),
        s"$name: no explode consumes the bucket sketches: $genInputs")
      assert(genInputs.forall(i => !i.contains("v#")),
        s"$name: raw values cross the frame fan-out: $genInputs")
    }
  }

  test("q121 plan: the whole funnel chain rides ONE user-key exchange") {
    // every step's running-conditional-min shares the same (partition,
    // sort), so Catalyst must plan a single hash Exchange on user_id and
    // a single Sort for the entire dependent window chain — the property
    // that keeps an n-step funnel one shuffle instead of n self-joins.
    // (The final few-row step aggregate may add a SinglePartition
    // exchange; only count the hash-partitioned ones.)
    val df = graft.operators.Behavior.funnelUserSteps(
      Tables.events(spark, sf), "ts", "user_id", "event_type",
      Seq("view", "click", "purchase"), horizonSeconds = 24 * 3600L)
    val plan = df.queryExecution.executedPlan.toString
    val hashExchanges = "hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"expected one user_id exchange, got $hashExchanges:\n${plan.take(3000)}")
    // dependent steps may print as chained Window operators, but they all
    // share the one sort — a second Sort would mean a spec mismatch
    val sorts = "(?m)Sort \\[user_id".r.findAllIn(plan).size
    assert(sorts == 1,
      s"expected the window chain to share one sort, got $sorts:\n${plan.take(3000)}")
  }

  test("q143 plan: candidates come from the prefix-postings equi-join, never a cross join") {
    val df = graft.operators.Dedup.setSimilarityJoin(
      Tables.documents(spark, sf), "doc_id", "text", tNum = 3, tDen = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"set-similarity join must never go all-pairs:\n${plan.take(2000)}")
    // the prefix filter (rank vs n - ceil(t*n) + 1) must sit BELOW the
    // candidate join — i.e. appear in the plan at all
    assert(plan.contains("div"), "integer-exact prefix bound missing from plan")
  }

  test("q64 plan: bloom probe filters the fact scan before the join") {
    val plan = graft.operators.RuntimeFilter.q64BloomSemiJoin(spark, sf)
      .queryExecution.executedPlan.toString
    val probeAt = plan.indexOf("might_contain")
    val joinAt = plan.indexOf("Join")
    assert(probeAt >= 0, "bloom probe missing from the plan")
    // deeper in the tree = later in the string: the filter must sit BELOW
    // the join (closer to the scan), not above it
    assert(joinAt >= 0 && probeAt > joinAt,
      s"bloom probe not below the join (probe@$probeAt join@$joinAt)")
  }

  test("q62 plan: heavy hitters split partial/final across one exchange") {
    val plan = graft.operators.SketchQueries.q62HeavyHitters(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_top_k"), "no map-side partial summary")
    assert("ObjectHashAggregate".r.findAllIn(plan).size == 2,
      "expected exactly partial+final aggregate pair")
  }

  test("partitioned write enables partition pruning on read") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.lineitem(spark, sf)
      .withColumn("ship_year", year(col("l_shipdate")))
      .write.partitionBy("ship_year").mode("overwrite").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("ship_year") === 1998)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(ship_year"),
      s"no partition filter in scan:\n$scan")
    val expected = Tables.lineitem(spark, sf)
      .filter(year(col("l_shipdate")) === 1998).count()
    assert(pruned.count() == expected)
  }

  test("q226 plan: the 32x bootstrap fan-out is ONE single-pass typed " +
      "aggregate — no per-row replicate explode anywhere below it") {
    val plan = graft.operators.Ml.q226BootstrapCI(spark, sf)
      .queryExecution.executedPlan.toString
    // r12: the replicate cells come from bootstrap_moments_agg (one
    // B-slot buffer per group), map-side-combined below the exchange
    val partialAt = plan.indexOf("partial_bootstrap_moments_agg")
    val exchangeAt = plan.indexOf("Exchange")
    assert(partialAt >= 0 && exchangeAt >= 0 && partialAt > exchangeAt,
      s"no map-side combine below the shuffle (partial@$partialAt " +
        s"exchange@$exchangeAt)")
    // the only Generate is the B-slot posexplode of the per-group result,
    // ABOVE the aggregate (earlier in the top-down plan text) — the raw
    // rows are never multiplied
    val genAt = plan.indexOf("Generate")
    assert(genAt >= 0 && genAt < partialAt,
      s"replicate fan-out below the aggregate (generate@$genAt " +
        s"partial@$partialAt)")
  }

  test("q248 plan: item-kNN pair space comes from the basket equi-join " +
      "— no item-by-item cartesian") {
    val plan = graft.operators.Ml.q248ItemKnn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "item-kNN fell back to a cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "item-kNN fell back to a nested-loop join")
  }

  test("q235 plan: NDCG probes broadcast against the corpus — the " +
      "corpus side never shuffles for the rank window's input join") {
    val plan = graft.operators.Ml.q235Ndcg(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      "probe frame not broadcast")
  }

  test("q243 checksum plan: one scan, one partial/final aggregate pair " +
      "— the hash never shuffles row-wise") {
    val df = graft.operators.Ml.q243TableChecksum(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      "checksum read the table more than once")
    val partialAt = plan.indexOf("partial_")
    val exchangeAt = plan.indexOf("Exchange")
    assert(partialAt >= 0 && exchangeAt >= 0 && partialAt > exchangeAt,
      "checksum rows shuffled before the map-side combine")
  }
}
