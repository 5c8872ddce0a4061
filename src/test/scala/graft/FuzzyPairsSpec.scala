package graft

/** Pins dd_fuzzy_pairs' deletion-blocking against an independent
  * in-test Levenshtein brute force on a vocabulary crafted to hit
  * every edit class: substitution, insertion, deletion (all distance
  * 1 — must pair), transposition (distance 2 — must NOT pair), and an
  * isolated name. */
class FuzzyPairsSpec extends SparkSpec {

  private val names = Seq("abc", "abd", "abcd", "ab", "acb", "xyz")

  private lazy val fixtureDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_fuzzy_fix").toString
    import spark.implicits._
    names.zipWithIndex.map { case (n, i) => (i.toLong + 1, n) }
      .toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    d
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletion blocking finds exactly the distance-1 pairs") {
    val expected = (for {
      a <- names; b <- names if a < b && lev(a, b) == 1
    } yield (a, b)).toSet
    // sanity on the fixture itself: all three edit classes present,
    // transposition excluded
    assert(expected.contains(("abc", "abd")))  // substitution
    assert(expected.contains(("abc", "abcd"))) // insertion
    assert(expected.contains(("ab", "abc")))   // deletion
    assert(!expected.contains(("abc", "acb"))) // transposition = dist 2
    val got = SparkEntry.queries("dd_fuzzy_pairs")(spark, fixtureDir)
      .collect().map(r => (r.getString(2), r.getString(3))).toSet
    assert(got == expected, s"got=$got expected=$expected")
  }
}
