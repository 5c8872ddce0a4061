package graft

/** Physical-plan quality gates: the properties that matter at 100 TB
  * (scan pruning, predicate pushdown, broadcast selection, no nested
  * loops) asserted on the executed plans of the real inventory queries
  * over the harness data. These are the checks `.explain` review would
  * do by eye, made permanent. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val q = SparkEntry.queries(name)(spark, dir)
    q.collect() // finalize AQE before inspecting
    q.queryExecution.executedPlan.toString
  }

  /** Only the final AQE plan — the adaptive toString repeats the whole
    * tree under "== Initial Plan ==", which double-counts operators
    * when a pin asserts on occurrence counts. */
  private def finalPlan(name: String): String =
    executedPlan(name).split("== Initial Plan ==").head

  test("p1: projection prunes the parquet scan to the selected columns") {
    val plan = executedPlan("p1_projection")
    assert(plan.contains("ReadSchema: struct<c_custkey:bigint,c_mktsegment:string>"), plan)
  }

  test("p10: date-range predicate reaches the parquet scan") {
    val plan = executedPlan("p10_date_predicate")
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"), plan)
  }

  test("s5: incremental-scan predicate is pushed in the raw storage unit") {
    val plan = executedPlan("s5_incremental_scan")
    assert(plan.contains("GreaterThanOrEqual(ts,"), plan)
  }

  test("j1: small dimension join broadcasts") {
    val plan = executedPlan("j1_left_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("j2: fact join chain contains no nested-loop or cartesian join") {
    val plan = executedPlan("j2_fact_join_chain")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("warehouse fact scan prunes partitions on a year predicate") {
    import org.apache.spark.sql.functions._
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_plan_wh"
    graft.etl.Pipeline.run(spark, dir, out)
    val q = spark.read.parquet(s"$out/fact_orders").filter(col("order_year") === 2000)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"), plan)
  }

  test("dd: minhash candidate generation is an equi-join, never a cartesian") {
    val plan = executedPlan("dd_minhash_pairs")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("ss: LSH ANN probes via broadcast hash join on the bucket key") {
    val plan = executedPlan("ss_knn_lsh")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dd_decontaminate_bloom: eval side probes a runtime bloom before its shuffle") {
    val plan = executedPlan("dd_decontaminate_bloom")
    assert(plan.contains("might_contain"), plan)
  }

  test("flagship pipeline: bloom front survives the composed plan; no cartesian") {
    // composing five stages into one plan must not lose the stage-level
    // plan shapes: the decontamination probe still runs through
    // might_contain, and no stage degenerates into a cartesian join.
    // Pinned via Flagship.auditPlan — the pre-checkpoint composed
    // frame (both public queries checkpoint their results to release
    // the stage persists, which hides the composed plan from
    // executedPlan).
    val (df, release) = graft.queries.Flagship.auditPlan(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    release()
    assert(plan.contains("might_contain"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("tx_mix_temperature: quotas attach by broadcast; docs never shuffle for them") {
    // the bounded cell-quota table must broadcast into the doc-side
    // join — a shuffled join here would move the whole corpus to
    // attach a handful of quota rows
    val plan = finalPlan("tx_mix_temperature")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("a22 retract maintenance: all merges are hash joins, no cartesian") {
    val plan = finalPlan("a22_incremental_agg_retract")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("new join-family ops: candidate joins are equi, nested loops only for 1-row scalars") {
    for (name <- Seq("g_triangle_count", "reco_item_item", "dd_containment")) {
      val plan =
        if (name == "reco_item_item") {
          // the kernel's served plan is the RDD wrap; the join-bearing
          // pipeline is the checkpointed purchases build (test hook)
          SparkEntry.queries(name)(spark, dir).collect()
          graft.ml.ItemItem.lastKernelQE
            .getOrElse(fail("kernel did not engage")).executedPlan.toString
        } else finalPlan(name)
      assert(!plan.contains("CartesianProduct"), s"$name:\n$plan")
      // a BroadcastNestedLoopJoin is tolerable ONLY as the explicit
      // Cross attach of a 1-row aggregate (crossJoin(broadcast(_))) —
      // if the optimizer ever falls back to a nested-loop INNER/OUTER
      // join the candidate generation went non-equi and is quadratic
      val badBnlj = "BroadcastNestedLoopJoin[^,\n]*, (?!Cross)".r
      assert(badBnlj.findFirstIn(plan).isEmpty, s"$name:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        s"$name:\n$plan")
    }
  }

  test("w11: pair self-join is hash-based; only the 1-row total attaches by broadcast") {
    val plan = finalPlan("w11_market_basket")
    assert(!plan.contains("CartesianProduct"), plan)
    // the quadratic-risk step (basket self-join on okey) must be an
    // equi-join; the single tolerated nested loop is the broadcast of
    // the one-row n_orders aggregate onto the pair relation
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).size >= 2, plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, plan)
  }

  test("w12: sweep-line plan has no self-join — one join feeds the window") {
    val plan = finalPlan("w12_peak_backlog")
    // the naive interval-overlap form would show a range self-join;
    // the sweep form has exactly the lineitem-orders equi-join, one
    // agg exchange, and a single Window over the supplier partitioning
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).size <= 1, plan)
  }

  test("t4: top-k filter becomes a map-side partial WindowGroupLimit") {
    // only ~k rows per group per partition may reach the exchange —
    // at fact-table scale the difference between shuffling 3 rows and
    // shuffling every row per group
    val plan = executedPlan("t4_topk_per_group")
    assert(plan.contains("row_number(), 3, Partial"), plan)
  }

  test("ss_knn_ivfpq: cell probe is a broadcast hash join on the cell id") {
    val plan = executedPlan("ss_knn_ivfpq")
    assert(plan.contains("BroadcastHashJoin [cid"), plan)
  }

  test("g_common_neighbors: hub cap is a partial WindowGroupLimit, no cartesian join") {
    val plan = executedPlan("g_common_neighbors")
    assert(plan.contains("row_number(), 64, Partial"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("tx_lm_score: both model joins broadcast (trigram tables are charset-bounded)") {
    val plan = executedPlan("tx_lm_score")
    assert(plan.split("BroadcastHashJoin").length - 1 >= 2, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("tx_repetition: scan prunes to (doc_id, text)") {
    val plan = executedPlan("tx_repetition")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("dd_decontaminate_overlap: candidate generation never goes cartesian") {
    val plan = executedPlan("dd_decontaminate_overlap")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("etl_scd2: both window passes share one exchange and one sort") {
    // lag → filter → row_number/lead all run on the same (o_custkey)
    // partitioning and (valid_from, o_orderkey) ordering — the plan
    // must carry exactly one shuffle and one sort, or history builds
    // pay a second full exchange at dimension scale. (Round-4's bench
    // blip on this query was steal; the plan was and is right — this
    // pins it.)
    val finalPlan = executedPlan("etl_scd2").split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).size == 1, finalPlan)
    assert("Sort \\[".r.findAllIn(finalPlan).size == 1, finalPlan)
  }

  test("st_enrich: stream-static lookup joins by broadcast, not shuffle") {
    import org.apache.spark.sql.functions._
    // inspect the equivalent batch plan shape (the streaming plan wraps
    // the same join): dimension side must broadcast
    val t = graft.core.Tables(spark, dir)
    val cust = t.customer.select(col("c_custkey"), col("c_mktsegment"))
    val q = t.events.join(broadcast(cust), col("user_id") === col("c_custkey"), "left")
      .groupBy("c_mktsegment").count()
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("t5: custom top-k aggregate runs as partial aggregation, no window sort") {
    val plan = executedPlan("t5_topk_agg")
    assert(plan.contains("partial_topk_scores"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("reco_item_item: default path is the packed-pair kernel, no pair sort") {
    // the kernel's result surface is the RowBridge RDD wrap — the
    // pair pipeline lives in the RDD lineage, so the pin here is that
    // the kernel ENGAGED (ExistingRDD scan) and that no window sort
    // or heap-agg tail leaked back into the served plan
    val plan = finalPlan("reco_item_item")
    assert(plan.contains("ExistingRDD"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("topk_tagged"), plan)
  }

  test("reco_item_item: legacy path (catalog past the driver ceiling) " +
      "keeps the heap agg + sort-free hash joins") {
    // force the legacy branch the way a >4M-item catalog would
    spark.conf.set("graft.reco.niBroadcastLimit", "-1")
    try {
      val q = SparkEntry.queries("reco_item_item")(spark, dir)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("partial_topk_tagged"), plan)
      assert(!plan.contains("Window"), plan)
      assert(plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("SortMergeJoin"), plan)
    } finally spark.conf.unset("graft.reco.niBroadcastLimit")
  }

  test("j10_interval_join: sweep-line form — broadcast lookups, no pair join") {
    // the round-10 sf1 rehearsal measured the day-bin PAIR join at
    // α=2.29 (overlap pairs grow quadratically with temporal
    // density); the count query must stay in its O(n + days)
    // sweep-line form: the two cumulative-distribution lookups reach
    // the orders as BROADCAST joins, and no shuffle-family join —
    // which would mean a pair relation — appears anywhere
    val plan = finalPlan("j10_interval_join")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("reco_item_item: kernel purchases pipeline joins are shuffled " +
      "HASH (the hints took), never sort-merge") {
    // SMJ merge-steps the many-to-many duplicate-key groups and its
    // full-frame sorts were the first thing to exhaust spill in the
    // 100× rehearsal — keep the hints pinned so an AQE demotion can't
    // quietly revert them. The kernel's served plan is the RDD wrap,
    // so the pin reads the capped-purchases QueryExecution (the
    // checkpointed fact-join → distinct → degree-cap pipeline)
    // through the ItemItem test hook.
    SparkEntry.queries("reco_item_item")(spark, dir).collect()
    val plan = graft.ml.ItemItem.lastKernelQE
      .getOrElse(fail("kernel did not engage")).executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("reco_item_item: broadcast-gate probe is memoized — one count job per JVM+dir") {
    // the gate reads parquet-metadata counts (part = kernel ceiling,
    // lineitem/customer = pair-volume estimate); on a serving path an
    // unmemoized probe is one needless job per call. Construct once to
    // populate the caches, then pin that FURTHER constructions run
    // ZERO count jobs. (The kernel path's bounded n_i collect and
    // checkpoint — the entry's model build, the ALS-family precedent —
    // DO run at construction; they are not count jobs.)
    SparkEntry.queries("reco_item_item")(spark, dir) // warm the cache
    // parquet-footer schema reads ("parquet at Tables.scala") run on
    // EVERY construction and are not the probe; only count() jobs are
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (Option(s.properties.getProperty("callSite.short"))
              .exists(_.startsWith("count")))
          jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries("reco_item_item")(spark, dir)
      SparkEntry.queries("reco_item_item")(spark, dir)
      // construction is synchronous (a gate count() would have BLOCKED
      // until its job finished); the grace period only covers listener
      // bus delivery latency for the assertion
      Thread.sleep(1500)
      assert(jobs.get() == 0,
        s"expected zero jobs constructing a cached-gate query, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("reco_item_item: kernel trusts the reported hash(user) partitioning " +
      "— no safety exchange on the normal path") {
    // encodePairBlobs requires every user's items partition-local; the
    // kernel VERIFIES the checkpoint's reported partitioning instead
    // of assuming the semi-join's plan shape (AQE's skew-join split
    // breaks it and reports Unknown). Pin both directions: the normal
    // run must NOT pay the repartition(user) fallback, and the guard
    // itself must discriminate real partitionings.
    graft.ml.ItemItem.lastPairSrcRepartitioned = None
    SparkEntry.queries("reco_item_item")(spark, dir).collect()
    assert(graft.ml.ItemItem.lastPairSrcRepartitioned.contains(false),
      "kernel took the safety exchange (or did not engage) on a " +
        "normally-partitioned corpus: " +
        graft.ml.ItemItem.lastPairSrcRepartitioned)
  }

  test("pairLocalityHolds discriminates the non-skew user-keyed SHJ " +
      "from broadcast and non-join shapes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col}
    val df = Seq((1L, 10L), (1L, 11L), (2L, 12L), (3L, 13L))
      .toDF("user", "item")
    val keep = Seq(Tuple1(1L), Tuple1(2L)).toDF("user")
    val shj = df.join(keep.hint("shuffle_hash"), Seq("user"), "left_semi")
    shj.collect()
    assert(graft.ml.ItemItem.pairLocalityHolds(shj.queryExecution))
    val bhj = df.join(broadcast(keep), Seq("user"), "left_semi")
    bhj.collect()
    assert(!graft.ml.ItemItem.pairLocalityHolds(bhj.queryExecution))
    val plain = df.select(col("user"), col("item"))
    plain.collect()
    assert(!graft.ml.ItemItem.pairLocalityHolds(plain.queryExecution))
    // keyed on item, not user → no locality claim
    val wrongKey = df.join(
      Seq(Tuple1(10L)).toDF("item").hint("shuffle_hash"),
      Seq("item"), "left_semi")
    wrongKey.collect()
    assert(!graft.ml.ItemItem.pairLocalityHolds(wrongKey.queryExecution))
  }

  test("pairLocalityHolds rejects a REAL AQE skew-split join on user") {
    // OptimizeSkewedJoin in this Spark version only matches joins with
    // BARE shuffle-stage children, so the rule cannot currently fire
    // on the kernel's semi-join (its build side carries the degree
    // agg) — but the guard must not depend on that pattern-match
    // detail surviving a Spark upgrade. Fire the real rule on a
    // bare-sided user-keyed join and pin that the guard refuses the
    // skew-marked plan.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val big = (1 to 4000).map(i => (1L, i.toLong)) ++
        (2 to 9).map(u => (u.toLong, u.toLong))
      val left = big.toDF("user", "item").repartition(8, col("item"))
      val right = (1 to 9).map(u => (u.toLong, u * 10L)).toDF("user", "x")
        .repartition(4, col("x"))
      val j = left.hint("shuffle_hash")
        .join(right.hint("shuffle_hash"), Seq("user"))
      j.collect()
      val planStr = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(planStr.contains("skew=true"),
        s"fixture failed to trigger OptimizeSkewedJoin:\n$planStr")
      assert(!graft.ml.ItemItem.pairLocalityHolds(j.queryExecution),
        "guard accepted a skew-split join")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("reco_item_item: the safety exchange keeps the kernel exact on a " +
      "skewed mega-user corpus") {
    // end-to-end pin of the repartition fallback (the path taken when
    // pairLocalityHolds refuses the materialized plan), driven through
    // the operator escape hatch: result must be bit-identical to the
    // legacy shuffle plan on the same skewed data.
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ii_skew").toString
    // user 1: items 1..400 via one order; users 2..9: two items each
    val orders = (Seq((10L, 1L)) ++ (2 to 9).map(u => (10L + u, u.toLong)))
      .toDF("o_orderkey", "o_custkey")
    orders.repartition(4)
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val items = (1 to 400).map(i => (10L, i.toLong)) ++
      (2 to 9).flatMap(u => Seq((10L + u, u.toLong), (10L + u, (u + 1).toLong)))
    items.toDF("l_orderkey", "l_partkey").repartition(8)
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    def collectSorted() =
      SparkEntry.queries("reco_item_item")(spark, d).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).sortBy(t => (t._1, t._2)).toSeq
    val (exchanged, legacy) = try {
      spark.conf.set("graft.reco.forcePairExchange", "true")
      graft.ml.ItemItem.lastPairSrcRepartitioned = None
      val exchanged = collectSorted()
      assert(graft.ml.ItemItem.lastPairSrcRepartitioned.contains(true),
        "escape hatch did not route through the safety exchange")
      spark.conf.unset("graft.reco.forcePairExchange")
      spark.conf.set("graft.reco.niBroadcastLimit", "-1") // legacy path
      (exchanged, collectSorted())
    } finally {
      spark.conf.unset("graft.reco.forcePairExchange")
      spark.conf.unset("graft.reco.niBroadcastLimit")
    }
    assert(exchanged == legacy)
  }

  test("s10: partitioned layout prunes to one partition directory") {
    val plan = executedPlan("s10_partition_prune")
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
  }

  test("s11: bucketed join has no exchange on either join side") {
    // pin the join to a shuffle-family strategy: with broadcast
    // enabled, AQE can pick BroadcastHashJoin on the tiny test data and
    // the no-exchange assertions below would pass vacuously
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = SparkEntry.queries("s11_bucketed_join")(spark, dir)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // the only exchange allowed is the one feeding the final group-by;
      // the join itself must consume the bucketed layout directly
      val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
      assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"), plan)
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("j8: runtime bloom filter prunes the probe side before its shuffle") {
    val plan = executedPlan("j8_bloom_filter_join")
    assert(plan.contains("might_contain"), plan)
  }

  test("a13: cube computes all grouping combinations in one pass (single Expand)") {
    // AQE plan strings repeat the tree under "== Initial Plan ==";
    // inspect only the final executed section
    val plan = executedPlan("a13_cube").split("== Initial Plan ==").head
    assert("Expand".r.findAllIn(plan).size >= 1, plan)
    // one scan of lineitem, not one per grouping combination
    assert("FileScan parquet".r.findAllIn(plan).size == 1, plan)
  }

  test("q1: aggregation is partial (map-side) before the exchange") {
    val plan = executedPlan("q1_agg")
    // two HashAggregate levels around the shuffle = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("Exchange hashpartitioning(l_returnflag"), plan)
  }

  test("j9: salted join shuffles on (key, salt) — no broadcast, no straggler key") {
    // the query pins autoBroadcastJoinThreshold=-1 on its child session,
    // so a shuffle-family join with the salt in the join keys is the
    // only acceptable shape
    val plan = executedPlan("j9_salted_skew_join")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("_fs") && plan.contains("_ds"), plan)
  }

  test("q5_local_supplier: dims broadcast, date pushed to the orders scan, no cartesian") {
    val plan = executedPlan("q5_local_supplier")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q5_local_supplier: no post-join re-shuffle — only the fact joins and the agg exchange") {
    // the r8 driver bench read q5 at 2.9x an isolated closing-run
    // baseline; the plan was never wrong (re-grounded in round 9, see
    // bench_baseline.json) — this pins the shape so a future real
    // regression (a dim falling out of broadcast, a post-join
    // repartition) fails loudly instead of reading as box noise.
    // Allowed exchanges: lineitem/orders fact shuffles (AQE may
    // broadcast one away) + the final groupBy(n_name) agg exchange +
    // broadcast builds for the dims.
    // NOTE "Exchange hashpartitioning", not "ShuffleExchange":
    // ShuffleExchangeExec renders as "Exchange" in plan strings, so
    // the original pin counted a string that never occurs and could
    // never fail (review finding, round 9)
    // REAL exchanges only — a ReusedExchange line repeats the
    // referenced exchange's description, so a raw substring count
    // double-counts every reuse (same filter as the sel_dsir pin)
    val plan = finalPlan("q5_local_supplier")
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(shuffles >= 1, s"q5 plan shape changed unexpectedly:\n$plan")
    assert(shuffles <= 3, s"q5 gained a shuffle: $shuffles\n$plan")
  }

  test("reco_next_item: one basket aggregation, its exchange reused by both joins") {
    val plan = finalPlan("reco_next_item")
    // the basket array agg appears on both sides of the transition
    // join; the second side must reuse the first's exchange (or its
    // broadcast), not rebuild the aggregation from the scan
    assert(plan.contains("ReusedExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("j10_interval_join: bin blocking yields an equi-join, never a nested loop") {
    val plan = executedPlan("j10_interval_join")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("w15_gaps_islands: the user_id window partitioning serves the island agg too") {
    // HashPartitioning(user_id) satisfies clustering on (user_id, grp),
    // so the groupBy adds NO second exchange — one shuffle end to end
    // (plus the distinct's own)
    val plan = executedPlan("w15_gaps_islands").split("== Initial Plan ==").head
    assert(plan.split("Exchange").length - 1 <= 2, plan)
  }

  test("dd_decontaminate: shingle overlap is an equi-join, never a cartesian") {
    val plan = executedPlan("dd_decontaminate")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("tx_corpus_mix: exactly one shuffle (the mix-cell window partition)") {
    val plan = executedPlan("tx_corpus_mix").split("== Initial Plan ==").head
    assert("Exchange hashpartitioning\\(lang".r.findAllIn(plan).size == 1, plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("tx_split: the assignment is a pure projection — zero exchanges") {
    val plan = executedPlan("tx_split").split("== Initial Plan ==").head
    assert(!plan.contains("Exchange"), plan)
  }

  test("tx_dedup_spans: scan prunes to (doc_id, text) before the explode") {
    val plan = executedPlan("tx_dedup_spans")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("g_pagerank: every iteration reuses the persisted edge relation") {
    // 5 iterations but ONE edges/nodes computation: every iteration's
    // join reads the cached relations (InMemoryTableScan / AQE
    // TableCacheQueryStage; the cache print embeds its build lineage,
    // so the orders scan TEXT still appears — what matters is that the
    // joins consume the cache, not a re-derived edge build)
    val plan = executedPlan("g_pagerank")
    assert(plan.contains("InMemoryTableScan"), plan)
    assert(plan.contains("TableCacheQueryStage"), plan)
    // iterations are shuffle-free: rank/node frames broadcast, so no
    // shuffle-family join anywhere in the iteration chain
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
  }

  test("tx_bpe_encode: tokenization is a pure narrow projection — zero exchanges") {
    // the 100 TB-relevant property: the merge rules are baked into the
    // expression, so encoding the corpus is scan → posexplode → folds,
    // with no shuffle anywhere (the learn pass runs its own bounded
    // jobs before this plan is built and does not appear in it)
    val plan = finalPlan("tx_bpe_encode")
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }

  test("sel_dsir: model and top-K cut broadcast; corpus shuffles stay bounded") {
    // served plan (round 17): the scored frame is checkpointed once
    // and feeds BOTH consumers, so the serving side holds NO corpus
    // shuffle at all — just the checkpoint read, the TakeOrdered cut
    // and the broadcast flag join
    val plan = finalPlan("sel_dsir")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("Scan ExistingRDD"), plan) // the checkpointed frame
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // count REAL exchanges only: a ReusedExchange line repeats the
    // referenced exchange's description, so a plain substring count
    // over the plan string double-counts every reuse
    def shuffles(p: String) = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(shuffles(plan) == 0, s"sel_dsir serving gained a shuffle:\n$plan")
    // the 100 TB-relevant pipeline property moved INSIDE the
    // checkpoint: the 256-row model and the 1-row denominator reach
    // the corpus as broadcasts, never shuffle joins, and the only hash
    // exchanges are the spread repartition, the shared bucket-count
    // aggregation (reused by the denominator — NOT a second pass) and
    // the per-doc aggregation
    val pd = graft.queries.Selection.dsirPerDoc(spark, dir)
    pd.collect()
    val pipe = pd.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(pipe.contains("BroadcastHashJoin"), pipe)
    assert(!pipe.contains("CartesianProduct") ||
      pipe.contains("BroadcastNestedLoopJoin"), pipe) // 1-row denom crossJoin is BNLJ
    assert(!pipe.contains("SortMergeJoin"), pipe)
    assert(shuffles(pipe) >= 1, s"sel_dsir pipeline pin went vacuous:\n$pipe")
    assert(shuffles(pipe) <= 3, s"sel_dsir pipeline gained a corpus shuffle:\n$pipe")
  }

  test("sel_nb_langid: scoring joins the model by broadcast only") {
    val plan = finalPlan("sel_nb_langid")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("sel_source_cap: thresholds broadcast; the doc table never shuffles whole") {
    // the cap's design claim: the only Exchange hashpartitioning is
    // the per-source count's PARTIAL-agg exchange (|sources| rows per
    // mapper, not corpus volume); the threshold table reaches the doc
    // scan as a broadcast, so doc rows are never redistributed
    val plan = finalPlan("sel_source_cap")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(shuffles >= 1, s"sel_source_cap pin went vacuous:\n$plan")
    assert(shuffles <= 1, s"sel_source_cap gained a doc shuffle: $shuffles\n$plan")
  }

  test("sel_drift: one corpus spread + one bucket agg; totals broadcast back") {
    // corpus-volume shuffles stay at two (the hashedWords spread
    // repartition and the groupBy(b) partial-agg exchange); the 1-row
    // totals rejoin the 256-row model as a broadcast, never a sort
    val plan = finalPlan("sel_drift")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(shuffles >= 1, s"sel_drift pin went vacuous:\n$plan")
    assert(shuffles <= 2, s"sel_drift gained a shuffle: $shuffles\n$plan")
  }

  test("s14: box predicate is pushed to the z-ordered parquet scan") {
    // the rendered PushedFilters list truncates ("LessThanOrEqual(l_sup…")
    // so assert the first pushed filter there and the second via the
    // un-truncated DataFilters list
    val plan = executedPlan("s14_zorder_layout")
    assert(plan.contains("LessThanOrEqual(l_partkey"), plan)
    assert("""\(l_suppkey#\d+L? <= \d+\)""".r.findFirstIn(plan).isDefined, plan)
  }
}
