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
  * Atomicity of the claim AND the content: the full file list is
  * written to a uniquely-named temp file first, then published with a
  * single namespace operation that refuses an existing target — a
  * hard link (`Files.createLink`) for `file:` URIs, `rename` for
  * HDFS (whose rename to an existing file returns false). Either way
  * the publish is the CAS: exactly one of two racing writers lands,
  * and any version file that is visible at all is complete. This
  * closes the torn-read hole where a concurrent commitWithRetry could
  * observe a half-written head, rebase on a truncated file list, and
  * permanently drop ledger entries. An object store would use its
  * conditional put here.
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
    // Write the FULL content to a writer-private temp file first, then
    // publish with one namespace op that refuses an existing target —
    // so the claim and the content land together and a visible
    // vNNNNN.txt is never truncated. The temp name starts with '.'
    // so VersionRe / listStatus never mistake it for a head.
    if (fs.getScheme == "file") {
      val dir = java.nio.file.Paths.get(new Path(root).toUri.getPath)
      val targetP = java.nio.file.Paths.get(target.toUri.getPath)
      val tmp = java.nio.file.Files.createTempFile(
        dir, f".v${expected + 1}%05d-", ".tmp")
      try {
        java.nio.file.Files.write(tmp, bytes)
        // hard link = atomic publish of the already-complete content;
        // fails with FileAlreadyExistsException when another writer
        // already holds this version — the CAS-lost signal. The
        // fallback wraps ONLY the link call: a failure writing the
        // temp file must propagate, never degrade into the fallback.
        try {
          java.nio.file.Files.createLink(targetP, tmp)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: UnsupportedOperationException |
               _: java.nio.file.FileSystemException =>
            // filesystem without hard links (some NFS/FUSE/overlay
            // mounts): fall back to CREATE_NEW — the claim is still
            // atomic, but claim and content are two steps again (the
            // pre-round-9 window), accepted only where the filesystem
            // cannot do better; aborting the commit would be worse
            try {
              java.nio.file.Files.write(targetP, bytes,
                java.nio.file.StandardOpenOption.CREATE_NEW,
                java.nio.file.StandardOpenOption.WRITE)
              true
            } catch {
              case _: java.nio.file.FileAlreadyExistsException => false
              case e: java.io.IOException =>
                // CREATE_NEW succeeded (the file is exclusively ours)
                // but the content write aborted: a torn head must not
                // stay visible — later writers would rebase on the
                // truncated list and drop ledger entries. The cleanup
                // itself can fail transiently; never let that replace
                // the root cause — attach it as suppressed instead.
                try java.nio.file.Files.deleteIfExists(targetP)
                catch { case c: Throwable => e.addSuppressed(c) }
                throw e
            }
        }
      } finally {
        java.nio.file.Files.deleteIfExists(tmp)
        ()
      }
    } else {
      val tmp = new Path(root,
        f".v${expected + 1}%05d.tmp-${java.util.UUID.randomUUID}")
      try {
        val out = fs.create(tmp, true)
        out.write(bytes)
        out.close()
        // HDFS rename is atomic in the namenode and returns false when
        // the destination file already exists — claim + content in one
        if (fs.rename(tmp, target)) true
        else { fs.delete(tmp, false); false }
      } catch {
        case e: java.io.IOException =>
          try fs.delete(tmp, false) catch { case _: Throwable => () }
          throw e
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
