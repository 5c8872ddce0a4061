package graft

/** Pins g_pagerank against an independent in-memory fixed-point
  * implementation on a crafted bipartite graph (3 customers share 2
  * suppliers asymmetrically, so ranks genuinely differ by node), plus
  * the conservation invariant: total rank stays within N floor-losses
  * of the scale constant. */
class PageRankSpec extends SparkSpec {

  private val Scale = 1000000000000L

  private lazy val fixtureDir: String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_pr_" +
      java.util.UUID.randomUUID().toString.take(8)
    import spark.implicits._
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.parquet(s"$dir/${name}_out")
      val p = java.nio.file.Paths.get(dir)
      val part = java.nio.file.Files.list(p.resolve(s"${name}_out"))
        .filter(f => f.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.move(part, p.resolve(s"$name.parquet"))
    }
    // o1(c1)->{s1,s2}, o2(c1)->{s1}, o3(c2)->{s2}, o4(c3)->{s2}
    writeOne(Seq((10L, 1L), (20L, 1L), (30L, 2L), (40L, 3L))
      .toDF("o_orderkey", "o_custkey"), "orders")
    writeOne(Seq((10L, 1L), (10L, 2L), (20L, 1L), (30L, 2L), (40L, 2L))
      .toDF("l_orderkey", "l_suppkey"), "lineitem")
    dir
  }

  // distinct trading pairs implied by the fixture
  private val pairs = Set((1L, 1L), (1L, 2L), (2L, 2L), (3L, 2L))

  private def reference: Map[(String, Long), Long] = {
    val edges = pairs.toSeq.flatMap { case (c, s) =>
      Seq((("c", c), ("s", s)), (("s", s), ("c", c))) }
    val outdeg = edges.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
    val n = outdeg.size
    val base = Scale / n
    val tele = 15L * base / 100L
    var rank: Map[(String, Long), Long] = outdeg.map { case (k, _) => k -> base }
    for (_ <- 1 to graft.queries.Graph.Iters) {
      val sums = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / outdeg(src) }.sum }
      rank = rank.keys.map(v => v -> (tele + 85L * sums(v) / 100L)).toMap
    }
    rank
  }

  test("g_pagerank matches the independent fixed-point reference") {
    val got = graft.queries.Graph.queries("g_pagerank")(spark, fixtureDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == reference, s"got=$got expected=$reference")
    // conservation: damping + floor can only LOSE mass, and at most a
    // few integer units per node per iteration
    val total = got.values.sum
    assert(total <= Scale && total >= Scale - 200L * got.size,
      s"total=$total")
  }

  test("g_pagerank shuffled-scale path is bit-identical to the broadcast path") {
    // fixed-point arithmetic is order-independent by construction, so
    // the post-broadcast-scale path (co-partitioned shuffled joins)
    // must reproduce the broadcast path's ranks EXACTLY — and both
    // must equal the independent reference
    def run(): Map[(String, Long), Long] =
      graft.queries.Graph.queries("g_pagerank")(spark, fixtureDir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaBroadcast = run()
    spark.conf.set("graft.pagerank.broadcastNodeLimit", "0")
    try {
      val q = graft.queries.Graph.queries("g_pagerank")(spark, fixtureDir)
      val viaShuffle = q.collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(viaShuffle == viaBroadcast)
      assert(viaShuffle == reference)
      // the scale path really took the shuffled form: walk the FINAL
      // physical tree (a tree walk, unlike the plan string, does not
      // descend into InMemoryRelation's cached edge-build lineage —
      // where the orders⋈lineitem broadcast legitimately lives) and
      // require every iteration join to be sort-merge, none broadcast
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
      def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case st: QueryStageExec => unwrap(st.plan)
        case other => other +: other.children.flatMap(unwrap)
      }
      val ops = unwrap(q.queryExecution.executedPlan)
      val smj = ops.count(_.isInstanceOf[SortMergeJoinExec])
      val bhj = ops.count(_.isInstanceOf[BroadcastHashJoinExec])
      // 2 joins × Iters iterations, all shuffled
      assert(smj == 2 * graft.queries.Graph.Iters, s"smj=$smj")
      assert(bhj == 0, s"broadcast join leaked into the scale path: $bhj")
    } finally spark.conf.unset("graft.pagerank.broadcastNodeLimit")
  }
}

/** Pins g_label_propagation against an independent in-memory
  * synchronous-LP implementation on the PageRank fixture graph, and
  * hand-checks the first round on the star node (s2 touches c1, c2,
  * c3, so its round-1 label is the smallest neighbor label). */
class LabelPropagationSpec extends SparkSpec {

  private lazy val fixtureDir: String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_lp_" +
      java.util.UUID.randomUUID().toString.take(8)
    import spark.implicits._
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.parquet(s"$dir/${name}_out")
      val p = java.nio.file.Paths.get(dir)
      val part = java.nio.file.Files.list(p.resolve(s"${name}_out"))
        .filter(f => f.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.move(part, p.resolve(s"$name.parquet"))
    }
    writeOne(Seq((10L, 1L), (20L, 1L), (30L, 2L), (40L, 3L))
      .toDF("o_orderkey", "o_custkey"), "orders")
    writeOne(Seq((10L, 1L), (10L, 2L), (20L, 1L), (30L, 2L), (40L, 2L))
      .toDF("l_orderkey", "l_suppkey"), "lineitem")
    dir
  }

  private val pairs = Set((1L, 1L), (1L, 2L), (2L, 2L), (3L, 2L))

  private def reference: Map[(String, Long), Long] = {
    val edges = pairs.toSeq.flatMap { case (c, s) =>
      Seq((("c", c), ("s", s)), (("s", s), ("c", c))) }
    var label: Map[(String, Long), Long] =
      edges.map(_._1).distinct.map { case k @ (t, id) =>
        k -> (id * 2 + (if (t == "s") 1L else 0L)) }.toMap
    for (_ <- 1 to graft.queries.Graph.Iters) {
      label = edges.groupBy(_._2).map { case (dst, es) =>
        val counts = es.groupBy { case (src, _) => label(src) }
          .map { case (l, g) => (l, g.size) }
        // most frequent, tie -> smallest label
        dst -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    label
  }

  test("synchronous LP matches the independent reference after 5 rounds") {
    val got = SparkEntry.queries("g_label_propagation")(spark, fixtureDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == reference)
  }

  test("round-1 sanity: the s2 hub adopts its smallest neighbor label") {
    // s2's neighbors are c1, c2, c3 with distinct initial labels
    // (2, 4, 6) — all count 1, so the tie-break picks 2
    val edges = pairs.toSeq.flatMap { case (c, s) =>
      Seq((("c", c), ("s", s)), (("s", s), ("c", c))) }
    val init: Map[(String, Long), Long] =
      edges.map(_._1).distinct.map { case k @ (t, id) =>
        k -> (id * 2 + (if (t == "s") 1L else 0L)) }.toMap
    val s2Neighbors = edges.collect { case (src, ("s", 2L)) => init(src) }
    assert(s2Neighbors.sorted == Seq(2L, 4L, 6L))
  }
}
