package graft

import graft.etl.ManifestLedger
import org.apache.hadoop.conf.Configuration

/** Pins the atomic-swap claim behind etl_wap's publish step: the
  * manifest ledger's commit is compare-and-swap on the version
  * number, so two writers racing from the same base version cannot
  * both win, and an optimistic retry loop never loses a committed
  * update — the property that makes the WAP + ingest-ledger pair a
  * mini table format rather than last-writer-wins file clobbering. */
class WapConcurrencySpec extends SparkSpec {
  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_ledger").toString + "/ledger"
  private val conf = new Configuration()

  test("conflicting commit: same base version, exactly one CAS wins") {
    val root = freshRoot()
    assert(ManifestLedger.currentVersion(root, conf) == 0)
    // both writers read base = 0, stage different snapshots
    val aWins = ManifestLedger.tryCommit(root, 0, Seq("a1.parquet"), conf)
    val bWins = ManifestLedger.tryCommit(root, 0, Seq("b1.parquet"), conf)
    assert(aWins && !bWins, "second CAS from the same base must lose")
    assert(ManifestLedger.currentVersion(root, conf) == 1)
    assert(ManifestLedger.read(root, 1, conf) == Seq("a1.parquet"))
    // the loser rebases on the new head and retries — now it lands
    assert(ManifestLedger.tryCommit(root, 1, Seq("a1.parquet", "b1.parquet"), conf))
    assert(ManifestLedger.currentVersion(root, conf) == 2)
    assert(ManifestLedger.read(root, 2, conf) == Seq("a1.parquet", "b1.parquet"))
    // v1 is immutable after v2 lands: pinned readers are repeatable
    assert(ManifestLedger.read(root, 1, conf) == Seq("a1.parquet"))
  }

  test("8 threads race through the retry loop: no lost updates") {
    val root = freshRoot()
    val writers = 8
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val done = Future.sequence((1 to writers).map { i =>
      Future {
        // each writer APPENDS its file to whatever head it rebased on
        ManifestLedger.commitWithRetry(root, conf) { current =>
          current :+ s"w$i.parquet"
        }
      }
    })
    val versions = Await.result(done, 60.seconds)
    // versions are exactly 1..writers, each claimed once
    assert(versions.sorted == (1 to writers))
    assert(ManifestLedger.currentVersion(root, conf) == writers)
    // the head carries every writer's file exactly once — a lost
    // update (two winners from one base) would drop one
    val head = ManifestLedger.read(root, writers, conf)
    assert(head.sorted == (1 to writers).map(i => s"w$i.parquet").sorted)
    // and each intermediate version has exactly v files (append-only)
    (1 to writers).foreach { v =>
      assert(ManifestLedger.read(root, v, conf).size == v)
    }
  }
}
