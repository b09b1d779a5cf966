package graft

import java.nio.file.{Files, Path, Paths}

/** Content-addressed /tmp staging for write-once derived artifacts
  * (bucketed copies, dedup indexes, sketch tables, format conversions).
  *
  * Keying the staged path on `dir.hashCode` (rounds 1–9) had two failure
  * modes the round-10 advice flagged: regenerating testdata IN PLACE
  * (which round 10's driver demonstrably did for `events.ts`) silently
  * reuses a stale artifact because the path string didn't change, and
  * `String.hashCode` collisions across different dirs are possible. Both
  * die with a content fingerprint: the staged path embeds a digest of the
  * source directory's file listing (relative path, size, mtime of every
  * file), so regenerated inputs land in a FRESH staged path and two dirs
  * can only share an artifact by having byte-dated-identical listings.
  * Stale artifacts from older fingerprints are simply never read again
  * (tmp reaper territory — nothing consults them).
  *
  * The walk reads metadata plus an 8 KB content probe per file (first and
  * last 4 KB — parquet's header and footer, which change whenever the
  * file is rewritten with different row groups, stats, or data). The
  * probe closes the round-11 advice gap: (path, size, mtime) alone can
  * collide when a regeneration rewrites same-sized files within the
  * filesystem's mtime granularity (some filesystems truncate to whole
  * seconds). Still milliseconds against the write it guards — an sf dir
  * is a handful of tables, a few hundred part files at most — so it runs
  * fresh on every lookup (a cache would defeat the point).
  */
object Staging {

  /** Digest of the source dir's recursive (path, size, mtime) listing
    * plus a first/last-4 KB content probe of every regular file. */
  private[graft] def fingerprint(srcDir: String): String = {
    val root = Paths.get(srcDir).toAbsolutePath.normalize
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(root.toString.getBytes("UTF-8"))
    if (Files.isDirectory(root)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(root)
      try walk.iterator().asScala.toArray.sortBy(_.toString).foreach {
        (f: Path) =>
          md.update(('|' + root.relativize(f).toString).getBytes("UTF-8"))
          if (Files.isRegularFile(f)) {
            val size = Files.size(f)
            md.update((":" + size + ":" +
              Files.getLastModifiedTime(f).toMillis).getBytes("UTF-8"))
            // read-FULLY loops (a single channel read may legally return
            // short) so the digest is a pure function of the bytes; an
            // unreadable file digests a marker instead of aborting every
            // Staging.path caller — determinism over completeness for a
            // cache key
            def probe(pos: Long): Unit = {
              val buf = java.nio.ByteBuffer.allocate(
                math.min(4096L, size - pos).toInt)
              val ch = java.nio.channels.FileChannel.open(f)
              var eof = false
              try {
                var p = pos
                while (!eof && buf.hasRemaining) {
                  val n = ch.read(buf, p)
                  if (n < 0) eof = true else p += n
                }
              } finally ch.close()
              if (!eof) { buf.flip(); md.update(buf) }
            }
            try {
              probe(0L)
              if (size > 4096) probe(math.max(4096L, size - 4096))
            } catch {
              case _: java.io.IOException => md.update("!unreadable".getBytes)
            }
          }
      } finally walk.close()
    }
    md.digest().take(8).map(b => f"$b%02x").mkString
  }

  /** /tmp staging path for artifact `prefix` derived from `srcDir`. */
  def path(prefix: String, srcDir: String): Path =
    Paths.get(sys.props("java.io.tmpdir"), s"${prefix}_${fingerprint(srcDir)}")
}
