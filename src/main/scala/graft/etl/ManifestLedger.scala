package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Optimistic-concurrency manifest ledger — the metadata kernel that
  * turns the WAP publish step (etl_wap) and the file-level ingest
  * ledger (s22_ingest_ledger) into a mini table format: the table's
  * visible state is whatever file list the HIGHEST committed version
  * file carries, and commit is COMPARE-AND-SWAP on the version number.
  *
  * A writer reads `currentVersion` (= N), stages its data files, then
  * calls `tryCommit(expected = N)`, which claims `v(N+1).txt` with an
  * atomic create-if-absent. Two writers racing from the same base
  * version both target the same name, so exactly one create succeeds;
  * the loser re-reads the ledger (sees the winner's commit), rebases
  * its snapshot, and retries against the new head — the optimistic
  * loop every log-structured table format (Iceberg/Delta-style) runs.
  * Nothing is ever overwritten, so a committed version is immutable
  * and a reader pinned to version N is repeatable forever (time
  * travel falls out for free).
  *
  * Atomicity of the claim: on HDFS `create(overwrite = false)` is an
  * atomic namespace operation; on the local filesystem Hadoop's
  * RawLocalFileSystem implements it check-then-act, so for `file:`
  * URIs the claim goes through O_EXCL (`CREATE_NEW`) instead — truly
  * atomic at the syscall. An object store would use its conditional
  * put here. The version file is tiny (a file list) and written in
  * one stream; a reader that catches a version file mid-write sees a
  * truncated list — production formats close that hole with
  * write-to-temp + rename, accepted here as out of scope for the
  * mini format.
  */
object ManifestLedger {
  // {5,}: the %05d writer pads, it does not truncate — v100000.txt is
  // a legal name and a 5-digit-exact pattern would stop seeing the
  // head at the 100,001st commit, wedging every CAS after it
  private val VersionRe = """v(\d{5,})\.txt""".r

  private def fsOf(root: String, conf: Configuration): FileSystem =
    new Path(root).getFileSystem(conf)

  private def versionPath(root: String, v: Int): Path =
    new Path(root, f"v$v%05d.txt")

  /** Highest committed version, 0 if the ledger is empty. */
  def currentVersion(root: String, conf: Configuration): Int = {
    val fs = fsOf(root, conf)
    val dir = new Path(root)
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).map(_.getPath.getName).collect {
      case VersionRe(n) => n.toInt
    }.foldLeft(0)(math.max)
  }

  /** File list of version `v` (must exist). */
  def read(root: String, v: Int, conf: Configuration): Seq[String] = {
    val fs = fsOf(root, conf)
    val in = fs.open(versionPath(root, v))
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    txt.split("\n").toSeq.filter(_.nonEmpty)
  }

  /** CAS commit: claim version expected+1 with the file list as its
    * content. Returns false when another writer committed first —
    * caller re-reads the head, rebases, retries. */
  def tryCommit(root: String, expected: Int, files: Seq[String],
                conf: Configuration): Boolean = {
    val fs = fsOf(root, conf)
    fs.mkdirs(new Path(root))
    val target = versionPath(root, expected + 1)
    val bytes = files.mkString("\n").getBytes("UTF-8")
    if (fs.getScheme == "file") {
      // local FS: Hadoop's create(overwrite=false) is check-then-act;
      // CREATE_NEW is the real O_EXCL
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(target.toUri.getPath), bytes,
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      var claimed = false
      try {
        val out = fs.create(target, false)
        claimed = true
        out.write(bytes)
        out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException =>
          if (claimed) {
            // we WON the namespace claim but failed to write the
            // content — a truncated version file must not become the
            // head other writers rebase on; release the claim and
            // report the commit as lost so the caller retries cleanly
            try fs.delete(target, false) catch { case _: Throwable => () }
            throw e
          }
          if (fs.exists(target)) false else throw e
      }
    }
  }

  /** Retry loop around tryCommit: rebase from the current head via
    * `stage` (which sees the head's file list, or Nil on an empty
    * ledger) until a CAS lands. Returns the committed version. */
  def commitWithRetry(root: String, conf: Configuration,
                      maxAttempts: Int = 64)
                     (stage: Seq[String] => Seq[String]): Int = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = currentVersion(root, conf)
      val current = if (base == 0) Nil else read(root, base, conf)
      if (tryCommit(root, base, stage(current), conf)) return base + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"manifest CAS lost $maxAttempts consecutive races under $root")
  }
}
