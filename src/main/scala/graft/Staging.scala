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
  * The walk is metadata-only (no file reads) over the handful of parquet
  * tables in an sf dir — milliseconds against the write it guards, so it
  * runs fresh on every lookup (a cache would defeat the point).
  */
object Staging {

  /** Digest of the source dir's recursive (path, size, mtime) listing. */
  private[graft] def fingerprint(srcDir: String): String = {
    val root = Paths.get(srcDir).toAbsolutePath.normalize
    val sb = new StringBuilder(root.toString)
    if (Files.isDirectory(root)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(root)
      try walk.iterator().asScala.toArray.sortBy(_.toString).foreach {
        (f: Path) =>
          sb.append('|').append(root.relativize(f))
          if (Files.isRegularFile(f))
            sb.append(':').append(Files.size(f))
              .append(':').append(Files.getLastModifiedTime(f).toMillis)
      } finally walk.close()
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(sb.toString.getBytes("UTF-8")).take(8)
      .map(b => f"$b%02x").mkString
  }

  /** /tmp staging path for artifact `prefix` derived from `srcDir`. */
  def path(prefix: String, srcDir: String): Path =
    Paths.get(sys.props("java.io.tmpdir"), s"${prefix}_${fingerprint(srcDir)}")
}
