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
}
