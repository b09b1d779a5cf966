package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured-Streaming plumbing for the judged streaming queries.
  *
  * The driver contract needs a *batch* DataFrame per query, so each
  * streaming query runs the events parquet through a real
  * `readStream` → transform → sink pipeline under
  * `Trigger.AvailableNow` (processes everything, runs the no-data batch
  * that advances the watermark and flushes evictable state, then stops),
  * and the sink contents are returned. Semantics are identical to a long-
  * running deployment; only the trigger differs — exactly how a 100 TB
  * backfill of a streaming job is run in production.
  */
object EventsStream {

  private val n = new AtomicInteger(0)

  /** Footer schema per events file, read once per path — not per query. */
  private val schemas = new ConcurrentHashMap[String, StructType]()

  /** The events table as an unbounded source (single-file glob → one
    * micro-batch at test scale; a directory of files at production scale,
    * rate-limited by maxFilesPerTrigger). Nanos→µs as in Tables.events. */
  def read(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.normalizeTs(readTable(spark, dir, "events.parquet"))

  /** Any corpus parquet table as an unbounded file-source stream — the
    * events machinery generalized (same symlink staging, same
    * single-file vs part-directory handling), minus the events-specific
    * timestamp normalization. The vector-ingest query streams
    * `embeddings.parquet` through this: at production scale the "table"
    * is the landing directory new embedding batches arrive in, rate-
    * limited by maxFilesPerTrigger. */
  private[graft] def readTable(spark: SparkSession, dir: String,
      file: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = file.stripSuffix(".parquet")
    val path = s"$dir/$file"
    val schema = schemas.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    // the file source wants a directory of FILES; stage one containing
    // symlinks to the (read-only) events data. A single-file table gets
    // one symlink; a Spark-written table (a DIRECTORY of part files —
    // the sf1 ScaleGen output) gets one symlink per part, because the
    // file stream source does not recurse into nested directories — a
    // symlinked directory would silently stream ZERO rows (the round-11
    // sf1 validation caught exactly that: 11 empty q_stream_* dumps).
    // Unlike the graft.Staging derived artifacts the symlinks hold NO
    // derived data — they always read whatever bytes currently live at
    // the source — but the PART LIST of a directory table can change on
    // regeneration, so that case keys on the content fingerprint.
    // absolutize BEFORE linking: symlink targets are stored verbatim, so
    // a relative sf dir would make links under /tmp resolve relative to
    // the staging dir and dangle — silently streaming zero rows
    val src = java.nio.file.Paths.get(path).toAbsolutePath.normalize
    // idempotent link (re)creation that REPAIRS stale state: plain
    // Files.exists() FOLLOWS links, so a dangling leftover (e.g. from a
    // pre-round-12 relative-path run) reads as absent and a bare
    // createSymbolicLink would throw FileAlreadyExists; check the link
    // itself (NOFOLLOW), and replace any symlink that no longer points
    // at the current target
    def ensureLink(l: java.nio.file.Path, target: java.nio.file.Path): Unit = {
      import java.nio.file.{Files, LinkOption}
      if (Files.exists(l, LinkOption.NOFOLLOW_LINKS)) {
        if (Files.isSymbolicLink(l) &&
            Files.readSymbolicLink(l) == target) return
        Files.delete(l)
      }
      Files.createSymbolicLink(l, target)
    }
    val staged =
      if (java.nio.file.Files.isDirectory(src)) {
        // buildOnce closes the round-12 delete-then-create race: the link
        // farm appears atomically, never half-populated
        graft.Staging.buildOnce(
            graft.Staging.path(s"graft_${base}_parts", path), "_STAGED") {
          tmp =>
            val parts = java.nio.file.Files.list(src)
            try {
              val it = parts.iterator()
              while (it.hasNext) {
                val p = it.next()
                if (p.getFileName.toString.endsWith(".parquet"))
                  ensureLink(tmp.resolve(p.getFileName.toString), p)
              }
            } finally parts.close()
        }
      } else {
        val out = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          s"graft_${base}_${dir.hashCode.toHexString}")
        java.nio.file.Files.createDirectories(out)
        ensureLink(out.resolve(file), src)
        out
      }
    spark.readStream.schema(schema).parquet(staged.toString)
  }

  /** Run a streaming DataFrame to completion into a memory sink, return
    * the sink contents as a batch DataFrame. ONLY for streams whose
    * emission is already aggregated/bounded — the memory sink lives in
    * driver memory. Unbounded emissions (raw joined pairs, per-entity
    * rows) go through [[runAggregated]] instead. The contract is
    * enforced structurally, not by convention: the plan must carry a
    * bounded-emission operator or the call throws before starting. */
  def runToTable(spark: SparkSession, df: DataFrame, mode: String): DataFrame = {
    require(hasBoundedEmission(df),
      "runToTable is for aggregated/bounded streams only (the memory sink " +
        "lives in driver memory); this plan has no aggregation/deduplication " +
        "node, so its emission is O(input rows) — use runAggregated instead")
    val name = s"graft_stream_sink_${n.incrementAndGet()}"
    scopedStateConf(spark) {
      val ckpt = ephemeralCheckpoint(name)
      val q = df.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      deleteNow(ckpt)
    }
    spark.table(name)
  }

  /** True iff the stream's emission volume is bounded by GROUPS rather
    * than input rows: walking DOWN from the root, every streaming path
    * must reach a streaming aggregation — O(windows × groups) output —
    * or a streaming deduplication — O(distinct keys) — BEFORE any
    * row-multiplying operator (Generate/Join/Expand) and before the
    * source leaf. Root-down matters: a plan that aggregates and then
    * re-expands (explode over the groups, a subsequent stream join)
    * emits O(rows) again, and a mere existence check anywhere in the
    * tree would wave it through to a driver-memory sink. Static
    * subtrees pass unconditionally: a broadcast-joined dimension bounds
    * nothing but also grows nothing over the stream's lifetime — it is
    * the streaming side's operators that decide. A CONDITIONED Join
    * recurses rather than failing outright: joining an ALREADY-BOUNDED
    * stream with a static dimension on a key (aggregate → enrich) stays
    * bounded, while any join touching a raw streaming side still fails
    * through the streaming child's own walk. A join WITHOUT a condition
    * (cross / ON TRUE) is a hard failure even over bounded children —
    * its emission is the product groups × static rows, the blowup the
    * gate exists to reject. Generate/Expand likewise stay hard failures
    * at any position above the bound: exploding a per-group
    * collect_list re-expands to O(input rows) no matter what bounded it
    * below. */
  private[graft] def hasBoundedEmission(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def bounded(p: LogicalPlan): Boolean = p match {
      case q if !q.isStreaming => true
      case _: Aggregate | _: Deduplicate | _: DeduplicateWithinWatermark => true
      case _: Generate | _: Expand => false
      case j: Join =>
        j.condition.isDefined && j.children.forall(bounded)
      case leaf if leaf.children.isEmpty => false // streaming source, unbounded
      case other => other.children.forall(bounded)
    }
    bounded(df.queryExecution.analyzed)
  }

  /** State-store partition count for the bounded-backfill helpers here.
    * Each stateful operator keeps ONE state store per shuffle partition,
    * and every store pays a fixed load+commit cost per micro-batch (a
    * stream-stream join keeps FOUR per partition), so state parallelism
    * is a capacity knob, not free parallelism: size it to state VOLUME.
    * Cluster-scale jobs with big state raise `graft.streaming.statePartitions`
    * toward the core count; the default 8 suits backfills whose state
    * fits a handful of stores — at 32 shuffle partitions the tiny-state
    * judged queries spent 48 s of cumulative wall in 128 near-empty
    * store commits. Scoped to query startup (the value is captured into
    * the query's checkpoint at first batch) and restored after.
    *
    * SINGLE-THREADED ASSUMPTION: this temporarily mutates the shared
    * session's `spark.sql.shuffle.partitions`, so any batch query or
    * second stream PLANNED concurrently on the same session during the
    * window would silently pick up the scoped value, and overlapping
    * scopes would restore stale values. All call sites in this repo are
    * sequential (Verify/Bench run the catalog one query at a time). A
    * concurrent deployment should instead pass the partition count per
    * query (writeStream option / cloned session), not via shared conf. */
  private def scopedStateConf[A](spark: SparkSession)(run: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key,
      spark.conf.getOption("graft.streaming.statePartitions").getOrElse("8"))
    try run finally spark.conf.set(key, prev)
  }

  /** Checkpoint dir for a run-to-completion backfill query: RAM-backed
    * (/dev/shm) when the OS provides it WITH headroom (≥1 GiB usable —
    * containers often cap tmpfs at 64 MB, where state deltas would hit
    * ENOSPC mid-query), tmpdir otherwise. The checkpoint of an
    * AvailableNow backfill into an ephemeral sink is itself ephemeral —
    * there is no restart to recover; a production deployment passes its
    * own durable checkpointLocation and never enters this path.
    * State-store deltas and WAL fsyncs land in memory instead of disk,
    * which halved the per-batch commit cost.
    *
    * Lifecycle contract: the CALLER deletes the dir via [[deleteNow]]
    * immediately after `awaitTermination()` — RAM-backed checkpoints
    * that linger until JVM exit compete with the page cache and executor
    * memory for the rest of the session (a two-pass bench over 10
    * streaming queries accumulated enough tmpfs pages to slow the warm
    * pass's shuffle-heavy queries measurably). The exit hook registered
    * here is only the backstop for a query that dies before cleanup. */
  private def ephemeralCheckpoint(name: String): java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    val shm = Paths.get("/dev/shm")
    val shmUsable = Files.isWritable(shm) &&
      (try Files.getFileStore(shm).getUsableSpace >= (1L << 30)
       catch { case _: Throwable => false })
    val base = if (shmUsable) shm else Paths.get(sys.props("java.io.tmpdir"))
    val dir = Files.createTempDirectory(base, s"graft_ckpt_${name}_")
    deleteOnExit(dir)
    dir
  }

  /** Recursively delete a finished query's checkpoint dir right away and
    * drop it from the exit-hook queue. Best-effort: a failure leaves the
    * dir to the backstop hook. */
  private def deleteNow(dir: java.nio.file.Path): Unit = {
    deleteRecursively(dir)
    toDelete.remove(dir)
  }

  /** Walk-and-delete with the stream CLOSED — `Files.walk` keeps
    * directory handles open until close(), and this runs once per
    * streaming query in a long-lived low-GC session, so leaking the
    * stream would accumulate fds toward the process limit. Shared by the
    * immediate path and the exit hook. Best-effort by design. */
  private def deleteRecursively(dir: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    try {
      val walk = Files.walk(dir)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    } catch { case _: Throwable => () }
  }

  /** Run a streaming DataFrame with the rollup INSIDE the stream's sink
    * path: `foreachBatch` partially aggregates every micro-batch with
    * `perBatch` (commutative partials — counts, decimal sums, maxes) and
    * appends only those partial rows to a parquet sink; the caller then
    * combines partials with one small batch aggregation. The raw stream
    * emission NEVER lands in driver memory — per batch the driver sees a
    * plan, not rows, and the sink holds O(groups × batches) partial rows,
    * not O(stream). This is the 100 TB shape for "aggregate an unbounded
    * join/session stream": executors write partials, a final reduce folds
    * them.
    *
    * A schema-only (zero-row) partial file is written BEFORE the query
    * starts, so a stream that produces no batches still yields a readable
    * empty result instead of a schema-inference failure; the staging
    * directory is deleted on JVM exit (consumers read it lazily, so
    * deletion can't happen any earlier than that). */
  def runAggregated(spark: SparkSession, df: DataFrame, mode: String)(
      perBatch: DataFrame => DataFrame): DataFrame = {
    val id = n.incrementAndGet()
    val out = java.nio.file.Files.createTempDirectory(s"graft_stream_agg_${id}_")
    deleteOnExit(out)
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), df.schema)
    perBatch(empty).write.mode("append").parquet(out.toString)
    scopedStateConf(spark) {
      val ckpt = ephemeralCheckpoint(s"agg_$id")
      val q = df.writeStream
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          perBatch(batch).write.mode("append").parquet(out.toString)
        }
        .start()
      q.awaitTermination()
      deleteNow(ckpt)
    }
    spark.read.parquet(out.toString)
  }

  /** Registered paths are recursively deleted by ONE static shutdown
    * hook (not one hook thread per directory — a long-lived session
    * registers an unbounded number of staging dirs). */
  private val toDelete = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var dir = toDelete.poll()
      while (dir != null) {
        deleteRecursively(dir)
        dir = toDelete.poll()
      }
    }))

  /** Shared with the batch-side staging writers (bucketed-join layouts
    * etc.) so the repo has exactly one exit-time cleanup path. */
  private[graft] def deleteOnExit(dir: java.nio.file.Path): Unit = {
    cleanupHook
    toDelete.add(dir)
  }
}
