package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md /
  * FIXTURES.md). Every `SparkEntry.queries` function receives the scale
  * -factor directory and goes through here, so filter pushdown and column
  * pruning reach the parquet scan uniformly.
  *
  * Scale note: at 100 TB these would be partitioned/bucketed catalog
  * tables; the loader keeps the access path behind one seam so swapping
  * `spark.read.parquet(dir)` for `spark.table(name)` is a one-line change.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.ts normalized to a session-TZ (UTC) TIMESTAMP — see
    * [[Tables.normalizeTs]] for the generator-version schemas handled. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(t("events"))
  }
  /** The document corpus, UNGUARDED (round 21). Round 20 routed every
    * read through the [[computeDense]] repartition guard; the driver's
    * full-catalog bench proved that blanket scope NET-NEGATIVE: the
    * injected 32-way exchange + 32-tiny-task stages + lost map-side
    * aggregation cost the ~30 light consumers (q_text_tokens,
    * q_dedup_exact, q_dedup_incremental, q_text_tfidf, …) 1.7–4.2×,
    * proven code-induced by the same queries running FASTER at 8 cores.
    * Only the kernel-dense scans (shingle/gram/minhash folds over every
    * document) win from the widened scan — those call sites opt in via
    * [[documentsDense]]; everyone else reads the table as laid out. */
  def documents: DataFrame  = t("documents")

  /** The document corpus with the COMPUTE-DENSE scan parallelism guard
    * (same contract as [[embeddings]]): for consumers whose cost is
    * per-row kernel work (shingle/minhash/gram folds) over every
    * document — the corpus ships as one small single-row-group parquet
    * file that byte-splitting cannot divide, so without the guard the
    * whole fold runs in ONE task (StageProf round 20: 1.5 s of
    * q_dedup_containment's 2.7 s warm wall while 31 cores idled).
    * Results are partition-independent, filters push through
    * Repartition, and a real 100 TB corpus (many files / row groups)
    * takes the no-shuffle branch. Opt-in per call site (round 21): the
    * driver bench proved the guard helps ONLY the kernel-dense scans. */
  def documentsDense: DataFrame =
    computeDense(t("documents"), "documents", "doc_id")

  /** Alias kept for the consumer whose RESULT is the plan itself
    * (q_plan_display): its oracle pins the displayed operator chain,
    * so it must never grow a guard exchange even if [[documents]]'
    * default changes again. */
  private[graft] def documentsRaw: DataFrame = t("documents")

  /** The embedding corpus, with COMPUTE-DENSE scan parallelism. The
    * vector family's cost is per-row arithmetic (cosine/JL/PQ folds,
    * Lloyd assignment), not bytes — and the corpus ships as one small
    * snappy parquet file with a single row group (106 MB even at
    * sf100), which byte-based splitting cannot divide: the sf100
    * decade run measured q_sim_ivf_ann at 572 s wall / 702 CPU-s on 32
    * cores — a 1.2-thread plan. When the scan's split count would
    * leave most of the machine idle, hash-spread the rows across the
    * session's cores (a one-off shuffle of the raw vectors, trivially
    * cheaper than the folds it parallelizes); a real 100 TB corpus
    * arrives as thousands of files and takes the no-shuffle branch, so
    * the guard costs nothing exactly where it isn't needed. Results
    * are partition-independent (per-row expressions, key-partitioned
    * aggregates, deterministic ORDER BY), and Catalyst pushes filters
    * through Repartition so scan pruning is unchanged. */
  def embeddings: DataFrame =
    computeDense(t("embeddings"), "embeddings", "vec_id")

  /** The guard behind [[embeddings]]/[[documentsDense]]: when the
    * corpus file's REAL split count (row groups, not planner
    * byte-splits) would leave most of the machine idle, hash-spread the
    * rows across the session's cores — a one-off shuffle of the raw
    * rows, trivially cheaper than the per-row kernel folds it
    * parallelizes. */
  private def computeDense(raw: DataFrame, name: String,
      key: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    // Splittability floor = real row groups, not planner byte-splits:
    // the FileScan happily "splits" a one-row-group file into 27 byte
    // ranges, 26 of which are empty (a parquet task cannot start inside
    // a row group) — counting those hides the problem the guard exists
    // to catch. Estimate actual splits as max(files, bytes / 128 MB —
    // the standard row-group target); a corpus of big multi-row-group
    // files or many files takes the no-shuffle branch. The estimate is
    // MEMOIZED per (dir, name) for the JVM (round-20 advice): the
    // corpus files are immutable test/staging inputs, and the live
    // getFileStatus+listStatus on every accessor call was ~40 metadata
    // round-trips per query construction.
    // A missing/unreadable corpus file estimates as "already splittable"
    // (round-20 advice): the guard then returns the raw frame, whose own
    // scan raises the canonical AnalysisException — the probe must never
    // turn a missing table into an accessor-time FileNotFoundException.
    // (The failure is NOT memoized: a probe error answers this call
    // only, so a corpus that appears later re-estimates fresh.)
    val splits = try Tables.splitEstimate(s"$dir/$name.parquet", () => {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val st = fs.getFileStatus(p)
      val (files, bytes) =
        if (st.isDirectory) {
          val parts = fs.listStatus(p)
            .filter(_.getPath.getName.endsWith(".parquet"))
          (parts.length.max(1), parts.map(_.getLen).sum)
        } else (1, st.getLen)
      math.max(files.toLong, bytes / (128L << 20))
    }) catch { case _: java.io.IOException => Long.MaxValue }
    // HASH-repartition on the unique row key, not round-robin (round
    // 20): a keyless repartition(n) pays sortBeforeRepartition — a
    // local sort of the FULL rows (multi-KB text) on every read, per
    // consumer, measured at ~2x the CPU of the shingle queries it was
    // meant to speed up. Hashing the unique id spreads rows evenly,
    // needs no sort, and is deterministic under task retry (the
    // guide-§2.5 rule: derive synthetic keys deterministically).
    if (splits * 4 < par)
      raw.repartition(par, org.apache.spark.sql.functions.col(key))
    else raw
  }
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** JVM-wide memo of [[Tables.computeDense]]'s split estimate, keyed by
    * the corpus file path. Metadata only (a long per corpus), never row
    * data — the corpus inputs are immutable for a process lifetime. */
  private val splitMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[graft] def splitEstimate(path: String, est: () => Long): Long =
    splitMemo.computeIfAbsent(path, _ => java.lang.Long.valueOf(est())).longValue()

  /** events.ts across generator versions, normalized to one type.
    *
    * Early generators wrote parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]); under
    * `spark.sql.legacy.parquet.nanosAsLong` it arrives as a raw-nanos
    * LONG and is floored to microseconds (DuckDB's `epoch_us` floors
    * identically, and floor is monotone, so ordering and µs-aligned
    * range predicates agree). The round-10 generator writes native
    * timestamp[us], which Spark reads as TIMESTAMP_NTZ — cast to the
    * session-TZ TIMESTAMP (session TZ is pinned UTC by Graft.builder,
    * so the instant is unchanged and the output type matches what every
    * query/oracle was written against). Both paths yield bit-identical
    * µs instants. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
