package graft

import graft.functions.FixedLog

/** Pins the data-selection operators' SEMANTICS on crafted fixtures
  * whose classes ARE lexically separable — the oracle gate only proves
  * Spark == DuckDB on the harness corpus, which draws every lang from
  * one shared vocabulary and so cannot distinguish a working
  * classifier from a majority-class one. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private val EnWords = Seq("alpha", "beta", "gamma", "delta", "epsilon")
  private val DeWords = Seq("zug", "haus", "strasse", "himmel", "wasser")

  private def doc(words: Seq[String], reps: Int): String =
    Seq.fill(reps)(words).flatten.mkString(" ")

  /** Write the docs as a SINGLE FILE named documents.parquet — the
    * streaming reader's pathGlobFilter matches leaf file names (the
    * harness tables ship as single files), so a directory-shaped
    * table would stream zero rows. */
  private def writeDocsFile(d: String,
                            rows: Seq[(Long, String, String)]): Unit =
    writeDocsFile4(d, rows.map { case (id, t, l) => (id, t, l, "web") })

  private def writeDocsFile4(
      d: String, rows: Seq[(Long, String, String, String)]): Unit = {
    import java.nio.file.{Files, Paths}
    rows.map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/_docs_tmp")
    val part = Files.list(Paths.get(s"$d/_docs_tmp")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, Paths.get(s"$d/documents.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$d/_docs_tmp"))
  }

  /** Fixture: en docs use EnWords, de docs use DeWords, disjoint.
    * Even doc_ids train the NB model, odd doc_ids evaluate it; every
    * eval token appears in training, so NB must classify perfectly. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sel_fix").toString
    writeDocsFile(d, Seq(
      (2L, doc(EnWords, 4), "en"), (4L, doc(EnWords.reverse, 4), "en"),
      (1L, doc(EnWords, 4), "en"), (3L, doc(EnWords.tail :+ "alpha", 4), "en"),
      (6L, doc(DeWords, 4), "de"), (8L, doc(DeWords.reverse, 4), "de"),
      (5L, doc(DeWords, 4), "de"), (7L, doc(DeWords.tail :+ "zug", 4), "de")))
    d
  }

  private def bucket(w: String): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h(c: Char) = "0123456789abcdef".indexOf(c)
    h(hex(0)) * 16 + h(hex(1))
  }

  test("FixedLog: 1/256-bit precision, monotone, exact on powers of two") {
    for (k <- 0 until 63) assert(FixedLog(1L << k) == 256L * k)
    var prev = -1L
    for (n <- (1L to 4096L) ++ Seq(65535L, 1000000L, Long.MaxValue)) {
      val got = FixedLog(n)
      val want = math.floor(256.0 * math.log(n.toDouble) / math.log(2.0)).toLong
      // one-sided: truncating to 8 mantissa bits loses up to
      // log2(257/256) ~ 1.44/256, the table floor up to 1/256 more
      assert(got <= want && got >= want - 2, s"n=$n got=$got want=$want")
      if (n <= 4096) { assert(got >= prev); prev = got }
    }
  }

  test("FixedLog: Spark SQL rendering equals the Scala reference") {
    import org.apache.spark.sql.functions.{col, expr}
    val ns = (1L to 600L) ++ Seq(1000L, 65536L, 1L << 40, Long.MaxValue)
    val got = ns.toDF("n")
      .select(col("n"), expr(s"CAST(${FixedLog.spark("n")} AS BIGINT)").as("l"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ns.foreach(n => assert(got(n) == FixedLog(n), s"n=$n"))
  }

  test("sel_nb_langid: perfectly separable vocab -> perfect held-out accuracy") {
    val out = SparkEntry.queries("sel_nb_langid")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getInt(3)))
      .toMap
    assert(out.keySet == Set(1L, 3L, 5L, 7L))
    out.foreach { case (id, (labeled, pred, correct)) =>
      assert(pred == labeled, s"doc $id predicted $pred, labeled $labeled")
      assert(correct == 1)
    }
  }

  test("sel_nb_langid: scores match an independent NB reference") {
    val langs = Seq("de", "en", "es", "fr", "zh")
    // reference model from the train half (even doc_ids)
    val train = Seq(("en", doc(EnWords, 4)), ("en", doc(EnWords.reverse, 4)),
      ("de", doc(DeWords, 4)), ("de", doc(DeWords.reverse, 4)))
    val counts = scala.collection.mutable.Map.empty[(String, Int), Long]
    train.foreach { case (l, t) =>
      t.split(" ").foreach(w => counts((l, bucket(w))) =
        counts.getOrElse((l, bucket(w)), 0L) + 1) }
    val tot = langs.map(c =>
      c -> counts.collect { case ((`c`, _), n) => n }.sum).toMap
    val docsC = Map("en" -> 2L, "de" -> 2L).withDefaultValue(0L)
    def score(c: String, words: Seq[String]): Long =
      FixedLog(docsC(c) + 1) +
        words.map(w => FixedLog(counts.getOrElse((c, bucket(w)), 0L) + 1)).sum -
        words.size * FixedLog(tot(c) + 256)
    val evalDocs = Map(
      1L -> doc(EnWords, 4), 3L -> doc(EnWords.tail :+ "alpha", 4),
      5L -> doc(DeWords, 4), 7L -> doc(DeWords.tail :+ "zug", 4))
    val out = SparkEntry.queries("sel_nb_langid")(spark, dir).collect()
      .map(r => r.getLong(0) -> langs.indices.map(i => r.getLong(4 + i)))
      .toMap
    evalDocs.foreach { case (id, t) =>
      val want = langs.map(c => score(c, t.split(" ").toSeq))
      assert(out(id) == want, s"doc $id: got ${out(id)}, want $want")
    }
  }

  test("sel_dsir: target-vocab docs outscore off-target docs and are selected") {
    val out = SparkEntry.queries("sel_dsir")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3), r.getInt(4)))
      .toMap
    assert(out.size == 8)
    val en = out.collect { case (_, ("en", w, _)) => w }
    val de = out.collect { case (_, ("de", w, _)) => w }
    // every doc has the same token count, so the unnormalized weights
    // compare directly: the en (target-vocab) docs must strictly
    // dominate the de docs
    assert(en.min > de.max,
      s"en weights $en should dominate de weights $de")
    // all 8 docs fit inside the top-100 cut -> all selected
    out.values.foreach { case (_, _, sel) => assert(sel == 1) }
  }

  test("sel_curriculum: epoch entry anneals from best to worst within a cell") {
    val out = SparkEntry.queries("sel_curriculum")(spark, dir).collect()
      .map(r => (r.getString(1), r.getInt(3)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // two cells of 4 docs each, E = 3: ranks 1..4 enter at epochs
    // 1 + floor(3*(rk-1)/4) = 1, 1, 2, 3 and are seen 3, 3, 2, 1 times
    for (lang <- Seq("en", "de"); (rk, (fe, seen)) <-
           Seq(1 -> (1L, 3L), 2 -> (1L, 3L), 3 -> (2L, 2L), 4 -> (3L, 1L))) {
      val (cellN, gotFe, gotSeen) = out((lang, rk))
      assert(cellN == 4L)
      assert((gotFe, gotSeen) == ((fe, seen)),
        s"cell $lang rank $rk: got ($gotFe, $gotSeen), want ($fe, $seen)")
    }
  }

  test("sel_datacard: cube rollups are consistent with the cell grid") {
    val rows = SparkEntry.queries("sel_datacard")(spark, dir).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        (r.getLong(2), r.getLong(3))).toMap
    // fixture: 2 langs × 1 source, 4 docs each
    assert(rows((Some("en"), Some("web")))._1 == 4L)
    assert(rows((Some("de"), Some("web")))._1 == 4L)
    // lang rollup = its single cell; grand total = sum of cells
    assert(rows((Some("en"), None)) == rows((Some("en"), Some("web"))))
    val (nEn, tEn) = rows((Some("en"), Some("web")))
    val (nDe, tDe) = rows((Some("de"), Some("web")))
    assert(rows((None, None)) == ((nEn + nDe, tEn + tDe)))
  }

  test("st_sel_gate: the compiled online model reproduces the batch scores") {
    val batch = SparkEntry.queries("sel_dsir")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap
    val gate = SparkEntry.queries("st_sel_gate")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(gate.keySet == batch.keySet)
    gate.foreach { case (id, (nTok, fp, kept)) =>
      assert((nTok, fp) == ((batch(id)._1, batch(id)._2)),
        s"doc $id: stream scored ($nTok, $fp), batch ${batch(id)}")
      // 8 docs < DsirK: threshold falls to the min, everything keeps,
      // matching the batch top-K cut covering the whole fixture
      assert(kept && batch(id)._3 == 1)
    }
  }

  /** Contrastive fixture: three exact-dup pairs; ids chosen so two
    * pairs share batch id_a%8 == 1 and one sits alone in batch 3. */
  private lazy val cpDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_selcp_fix").toString
    val t1 = doc(Seq("red", "green", "blue", "cyan", "teal"), 3)
    val t2 = doc(Seq("one", "two", "three", "four", "five"), 3)
    val t3 = doc(Seq("ada", "curie", "noether", "hopper", "lovelace"), 3)
    val solo = doc(Seq("unique", "words", "nobody", "else", "uses"), 3)
    writeDocsFile(d, Seq((1L, t1), (2L, t1), (3L, t2), (4L, t2),
      (9L, t3), (10L, t3), (20L, solo)).map { case (id, t) => (id, t, "en") })
    d
  }

  test("sel_softdedup: cluster members split one doc of mass; singletons keep theirs") {
    val out = SparkEntry.queries("sel_softdedup")(spark, cpDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // three exact-dup pairs -> clusters keyed by their min id, size 2,
    // weight 1/2 each; the solo doc is its own singleton at weight 1
    for ((id, cid) <- Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
                          9L -> 9L, 10L -> 9L))
      assert(out(id) == ((cid, 2L, 0.5)), s"doc $id: ${out(id)}")
    assert(out(20L) == ((20L, 1L, 1.0)))
    // total sampling mass = number of distinct contents
    assert(out.values.map(_._3).sum == 4.0)
  }

  test("sel_contrastive_pairs: in-batch negatives wrap; lone batches drop") {
    val out = SparkEntry.queries("sel_contrastive_pairs")(spark, cpDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch 1 holds pairs (1,2) and (9,10): anchor 1 takes the next
    // pair's positive 10, anchor 9 wraps to the first positive 2.
    // batch 3 holds only (3,4): its wrapped negative is its own
    // positive -> degenerate, dropped.
    assert(out == Set((1L, 2L, 10L), (9L, 10L, 2L)))
  }

  /** Source-cap fixture: one over-represented source (40 docs) and a
    * niche one (4 docs): N = 44, cap = 44 div 4 = 11 < 40. */
  private lazy val capDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_selcap_fix").toString
    writeDocsFile4(d,
      (1L to 40L).map(i => (i, doc(EnWords, 2), "en", "mega")) ++
        (101L to 104L).map(i => (i, doc(DeWords, 2), "de", "niche")))
    d
  }

  /** The doc's 16-bit hash slice, recomputed independently. */
  private def capHash(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"srccap:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h(c: Char) = "0123456789abcdef".indexOf(c).toLong
    ((h(hex(0)) * 16 + h(hex(1))) * 16 + h(hex(2))) * 16 + h(hex(3))
  }

  test("sel_source_cap: under-cap sources keep all; the mega source thins to the cap rate") {
    val out = SparkEntry.queries("sel_source_cap")(spark, capDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(out.size == 44)
    // niche sits under the cap: full-rate threshold, everything kept
    (101L to 104L).foreach(id =>
      assert(out(id) == (("niche", 4L, 65536L, 1)), s"doc $id: ${out(id)}"))
    // mega is over: threshold floor(11 * 65536 / 40), and the kept
    // set is EXACTLY the ids whose hash slice falls under it
    val thr = 11L * 65536L / 40L
    (1L to 40L).foreach { id =>
      val (src, n, t, kept) = out(id)
      assert(src == "mega" && n == 40L && t == thr, s"doc $id: ${out(id)}")
      assert(kept == (if (capHash(id) < thr) 1 else 0), s"doc $id kept=$kept")
    }
    // rate-exact sampling: some but not all of the mega source remains
    val k = (1L to 40L).count(id => out(id)._4 == 1)
    assert(k > 0 && k < 40, s"kept $k of 40 at rate 11/40")
  }

  test("st_source_cap_gate: the compiled online gate replays the batch cap decisions") {
    val batch = SparkEntry.queries("sel_source_cap")(spark, capDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    val gate = SparkEntry.queries("st_source_cap_gate")(spark, capDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(gate == batch)
  }

  /** Drift fixture: the reference half (even ids) writes EnWords, the
    * incoming half (odd ids) DeWords — disjoint vocabularies with
    * equal token totals (R = N = 40), so the smoothing denominators
    * cancel exactly and per-bucket signs are unambiguous. */
  private lazy val driftDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_seldrift_fix")
      .toString
    writeDocsFile(d, Seq(
      (2L, doc(EnWords, 4), "en"), (4L, doc(EnWords, 4), "en"),
      (1L, doc(DeWords, 4), "de"), (3L, doc(DeWords, 4), "de")))
    d
  }

  test("sel_drift: identically-distributed halves report zero drift everywhere") {
    // the main fixture's halves carry the SAME word multisets (doc 3
    // is a permutation of EnWords, doc 7 of DeWords), so every bucket
    // has n_ref = n_new and the PSI integrand vanishes exactly
    val rows = SparkEntry.queries("sel_drift")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"bucket ${r.getInt(0)}")
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L,
        s"bucket ${r.getInt(0)}: ${r.toSeq}")
    }
  }

  test("sel_drift: contributions match an independent fixed-point PSI reference") {
    val refWords = Seq.fill(2)(Seq.fill(4)(EnWords).flatten).flatten
    val newWords = Seq.fill(2)(Seq.fill(4)(DeWords).flatten).flatten
    val nRef = refWords.groupBy(bucket).map { case (b, ws) => b -> ws.size.toLong }
    val nNew = newWords.groupBy(bucket).map { case (b, ws) => b -> ws.size.toLong }
    val (rTot, nTot) = (refWords.size.toLong, newWords.size.toLong)
    val want = (nRef.keySet ++ nNew.keySet).map { b =>
      val (r, n) = (nRef.getOrElse(b, 0L), nNew.getOrElse(b, 0L))
      val lr = FixedLog(r + 1) - FixedLog(n + 1) -
        (FixedLog(rTot + 256) - FixedLog(nTot + 256))
      b -> ((r, n, lr, ((r + 1) * (nTot + 256) - (n + 1) * (rTot + 256)) * lr))
    }.toMap
    val got = SparkEntry.queries("sel_drift")(spark, driftDir).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    // every bucket's term mirrors (p-q)·log(p/q) >= 0, and the
    // disjoint single-sided buckets drift strictly
    got.values.foreach { case (r, n, _, c) =>
      assert(c >= 0L)
      if (r == 0L || n == 0L) assert(c > 0L)
    }
  }
}
