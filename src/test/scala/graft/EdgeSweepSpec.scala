package graft

/** The FULL degenerate-input sweep, in CI: every `SparkEntry.queries`
  * entry against the `empty` (0-row) and `one` (1-row-per-table)
  * corpus variants, through exactly the tool's code path
  * (EdgeProbe.sweep — one definition, so this pin can never drift
  * from the hand-run probe). Through round 16 the probe was run by
  * hand once per round; the emitPartitions zero-estimate edge showed
  * this class of regression can enter between runs, so the two cheap
  * modes now gate every `sbt test`. The `nulls` and `dup` modes stay
  * hand-run (EmptyInputSpec pins their previously-found crash sites
  * individually — re-sweeping 221 entries × 2 more modes is probe
  * budget, not CI budget).
  *
  * EmptyInputSpec remains the REGRESSION ledger: each crash site the
  * round-10 sweep found, pinned by name with its fix's semantics.
  * This spec is the COVERAGE net: new entries and new plan shapes get
  * probed automatically the round they land. */
class EdgeSweepSpec extends SparkSpec {

  test("every query survives the empty and one-row corpus variants") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_edge_ci").toString
    try {
      val failures = graft.tools.EdgeProbe.sweep(
        spark, "/root/testdata/sf0.001", work, Seq("empty", "one"))
      assert(failures.isEmpty,
        failures.map { case (m, n, msg) =>
          s"$m/$n: ${msg.linesIterator.take(2).mkString(" | ")}"
        }.mkString("\n", "\n", ""))
    } finally {
      // the variant corpora + 2×221 probe outputs are a few hundred MB
      // of tiny files — reclaim them whether or not the sweep passed
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(work))
    }
  }
}
