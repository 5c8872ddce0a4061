package graft

import org.apache.spark.sql.functions._

/** Randomized adversarial checks: operators whose production path is a
  * blocked/derived computation are compared against an INDEPENDENT
  * brute-force reimplementation of the definition on small random
  * inputs (fixed seeds — deterministic, but shaped nothing like the
  * harness corpus). A blocking bug that happens to pass the crafted
  * fixtures and the harness data has five more chances to surface. */
class RandomizedOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocsDir(seed: Int): (String, Seq[(Long, String)]) = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 12).map(i => s"w$i")
    val n = 12 + rnd.nextInt(8)
    val docs = (1 to n).map { id =>
      val len = 3 + rnd.nextInt(6)
      (id.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val d = java.nio.file.Files.createTempDirectory(s"graft_rand_$seed").toString
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    (d, docs)
  }

  test("dd_cosine_pairs matches a brute-force reimplementation on random corpora") {
    for (seed <- 1 to 5) {
      val (dir, docs) = mkDocsDir(seed)
      // independent brute path: same normalization contract, computed
      // entirely on the driver over all O(n²) pairs
      val tf = docs.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").toSeq
          .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      }.toMap
      val nDocs = docs.size
      val df = tf.values.flatMap(_.keys).toSeq
        .groupBy(identity).map { case (w, xs) => w -> xs.size }
      val keepW = df.collect { case (w, d) if d * 5 <= nDocs => w }.toSet
      val kept = tf.map { case (id, m) => id -> m.filter(c => keepW(c._1)) }
      val expected = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        ma = kept(a); mb = kept(b)
        dot = ma.keys.toSeq.intersect(mb.keys.toSeq)
          .map(w => ma(w) * mb(w)).sum if dot > 0
        n2a = ma.values.map(v => v * v).sum
        n2b = mb.values.map(v => v * v).sum
        c2 = (10000L * dot * dot) / (n2a * n2b) if c2 >= 2500
      } yield (a, b, dot, n2a, n2b, c2)).toSet
      val got = SparkEntry.queries("dd_cosine_pairs")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      assert(got == expected, s"seed $seed: got ${got.size}, want ${expected.size}")
    }
  }

  test("g_common_neighbors matches a brute-force wedge count on random baskets") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val baskets = (1 to 15).map { okey =>
        okey.toLong -> Seq.fill(2 + rnd.nextInt(3))(1L + rnd.nextInt(8)).distinct
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft_cn_$seed").toString
      baskets.flatMap { case (o, ps) => ps.map(p => (o, p)) }
        .toDF("l_orderkey", "l_partkey")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      // brute: same definition, sets on the driver
      val pairCounts = baskets.flatMap { case (_, ps) =>
        for (u <- ps; v <- ps if u < v) yield (u, v)
      }.groupBy(identity).map { case (p, xs) => p -> xs.size }
      // .toSeq first: Map.collect yielding pairs would rebuild a MAP
      // keyed by u, silently collapsing each node to one edge
      val edges = pairCounts.toSeq.collect { case ((u, v), c) if c >= 2 => (u, v) }.toSet
      val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (n, es) =>
          n -> es.map(_._2).toSet } // cap = 64 never binds at 8 parts
      val expected = (for {
        a <- adj.keys; b <- adj.keys if a < b
        if !edges((a, b))
        common = (adj(a) intersect adj(b)).size if common > 0
        da = adj(a).size; db = adj(b).size
      } yield (a, b, common.toLong, da.toLong, db.toLong,
        1000000L * common / (da + db - common))).toSet
      val got = SparkEntry.queries("g_common_neighbors")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      assert(got == expected, s"seed $seed: got ${got.size}, want ${expected.size}")
    }
  }

  test("w15_gaps_islands matches a brute-force run computation on random activity") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val base = java.time.LocalDate.of(2024, 1, 1)
      val rows = for {
        u <- 1 to 5
        d <- 0 until 20 if rnd.nextBoolean()
      } yield (u.toLong, base.plusDays(d))
      val dir = java.nio.file.Files.createTempDirectory(s"graft_isl_$seed").toString
      rows.zipWithIndex.map { case ((u, day), i) =>
        (i.toLong, java.sql.Timestamp.valueOf(day.atTime(12, 0)), u, "view", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      // brute: sort each user's distinct days, split on gaps > 1 day
      val expected = rows.groupBy(_._1).flatMap { case (u, rs) =>
        val days = rs.map(_._2).distinct.sorted(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
        val runs = days.foldLeft(List.empty[List[java.time.LocalDate]]) {
          case (acc @ (run :: rest), d) if d == run.head.plusDays(1) => (d :: run) :: rest
          case (acc, d) => List(d) :: acc
        }
        runs.map(r => (u, r.last.toString, r.head.toString, r.size.toLong))
      }.toSet
      val got = SparkEntry.queries("w15_gaps_islands")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDate(1).toString,
          r.getDate(2).toString, r.getLong(3))).toSet
      assert(got == expected, s"seed $seed: got ${got.size}, want ${expected.size}")
    }
  }
}

/** packPrefix (tx_pack / llm_corpus_build's packing stage): the
  * distributed two-pass prefix sum must equal a sequential scan for
  * any token distribution and any partitioning. */
class PackPrefixProps extends SparkSpec {
  import spark.implicits._

  test("distributed prefix sum equals the sequential scan on random inputs") {
    val rnd = new scala.util.Random(8451)
    for (trial <- 1 to 3) {
      val n = 500 + rnd.nextInt(1500)
      // non-contiguous, shuffled doc ids; token counts incl. zeros
      val docs = rnd.shuffle((1 to n).map(_.toLong * 3 + 1).toVector)
        .map(id => (id, rnd.nextInt(600).toLong))
      val out = graft.queries.Text.packPrefix(spark,
          docs.toDF("doc_id", "n_tokens").repartition(7 + trial))
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, tok) =>
        assert(out(id) == ((cum, cum / 512L, cum % 512L)),
          s"trial $trial doc $id")
        cum += tok
      }
      assert(out.size == n)
    }
  }
}
