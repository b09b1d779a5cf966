package graft.tools

import org.apache.spark.sql.functions._

/** Dev main: LSH banding diagnostics at any sf — bucket-size histogram
  * and candidate-pair mass, the two numbers that decide whether the
  * banded self-join is linear or quietly quadratic at a given scale.
  *
  *   sbt "runMain graft.tools.LshDiag /tmp/graft_sf100"
  */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Graft.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir).documents
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingleHashes(col("text")).as("s"))
      .filter(size(col("s")) > 0)
    println(s"docs: ${docs.count()}")
    val banded = graft.queries.Dedup.bandKeysDiag(docs)
    banded.cache()
    println(s"banded rows: ${banded.count()}")
    val buckets = banded.groupBy("band", "key").count()
    buckets.cache()
    val top = buckets.orderBy(col("count").desc).limit(20).collect()
    println("top buckets: " + top.map(_.getLong(2)).mkString(","))
    // candidate pair mass = sum over buckets of n*(n-1)/2
    val pairMass = buckets
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")).as("pairs"))
      .head().getLong(0)
    println(s"candidate pair mass: $pairMass")
    val multi = buckets.filter(col("count") > 1).count()
    println(s"buckets with >1 doc: $multi")
    for (b <- Seq(64, 128, 256, 512)) {
      val row = buckets.filter(col("count") <= b)
        .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")),
          count(lit(1))).head()
      val dropped = buckets.filter(col("count") > b).count()
      println(s"cap $b: pair mass ${row.getLong(0)}, dropped buckets $dropped")
    }
    // incremental (base×batch) raw-candidate mass — the spill driver of
    // q_dedup_incremental_lsh's candidate distinct (round-16 item 2):
    // per (band, key), raw cross mass = base_width × batch_width over
    // buckets that survive the BASE-side cap, vs the same with a
    // symmetric BATCH-side cap — the decision number for whether the
    // batch cap bounds the distinct or the spill is intrinsic.
    if (args.lift(1).contains("inc")) {
      // buckets is done; banded must STAY cached until `joined` (whose
      // baseW side re-reads it) materializes below — unpersisting here
      // forced a full recompute of the corpus-wide minhash banding
      // (round-17 advice fix)
      buckets.unpersist()
      val (_, batch) = graft.queries.Dedup.baseBatchSplitDiag(spark, sfDir)
      val baseW = banded.withColumnRenamed("id", "doc_id")
        .join(batch.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .groupBy("band", "key").count()
        .select(col("band"), col("key"), col("count").as("bw"))
      val batchB = graft.queries.Dedup.bandKeysDiag(
        batch.select(col("doc_id"),
          graft.functions.GraftFunctions.shingleHashes(col("text")).as("s"))
          .filter(size(col("s")) > 0))
      val batchW = batchB.groupBy("band", "key").count()  // id col unused
        .select(col("band"), col("key"), col("count").as("tw"))
      val joined = baseW.join(batchW, Seq("band", "key")).cache()
      joined.count() // materialize off the cached banding, then release it
      banded.unpersist()
      def mass(cond: org.apache.spark.sql.Column): (Long, Long) = {
        val r = joined.filter(cond)
          .agg(sum(col("bw") * col("tw")).cast("long"), count(lit(1))).head()
        (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1))
      }
      val cap = graft.queries.Dedup.LshBucketCap
      val (rawAll, nAll) = mass(lit(true))
      val (rawBase, nBase) = mass(col("bw") <= cap)
      val (rawBoth, nBoth) = mass(col("bw") <= cap && col("tw") <= cap)
      println(s"inc raw mass (no caps): $rawAll over $nAll shared buckets")
      println(s"inc raw mass (base cap $cap): $rawBase over $nBase")
      println(s"inc raw mass (both caps $cap): $rawBoth over $nBoth")
      val topT = joined.filter(col("bw") <= cap)
        .orderBy((col("bw") * col("tw")).desc).limit(10)
        .select(col("bw"), col("tw")).collect()
      println("top surviving buckets (bw,tw): " +
        topT.map(r => s"(${r.getLong(0)},${r.getLong(1)})").mkString(","))
    }
    // per-band decomposition off the STAGED index — the sizing numbers
    // for q_dedup_incremental_lsh's band-sequential scale path (round-19):
    // per band, the capped incidence mass (that band's pair-join output),
    // the distinct batch/base docs among its candidates (the semi-prune
    // volume whose arrays ride the attach exchanges), all from width
    // aggregations + semi joins — the cross mass itself is never
    // materialized, so the diag runs where the query cannot.
    if (args.lift(1).contains("bands")) {
      val cap = graft.queries.Dedup.LshBucketCap
      val idx = graft.queries.Dedup.lshIndexPath(spark, sfDir)
      val baseBands = spark.read.parquet(s"$idx/bands")
        .select(col("id").as("base_doc"), col("band"), col("key"))
      val (_, batch) = graft.queries.Dedup.baseBatchSplitDiag(spark, sfDir)
      val batchBands = graft.queries.Dedup.bandKeysDiag(
        batch.select(col("doc_id"),
          graft.functions.GraftFunctions.shingleHashes(col("text")).as("s"))
          .filter(size(col("s")) > 0))
        .select(col("id").as("batch_doc"), col("band"), col("key"))
        .cache()
      println(s"batch band rows: ${batchBands.count()}")
      val baseW = baseBands.groupBy("band", "key")
        .agg(count(lit(1)).as("bw")).filter(col("bw") <= cap)
      val batchW = batchBands.groupBy("band", "key")
        .agg(count(lit(1)).as("tw"))
      val shared = baseW.join(batchW, Seq("band", "key")).cache()
      shared.groupBy("band")
        .agg(sum(col("bw") * col("tw")).cast("long").as("incidences"),
          count(lit(1)).as("buckets"),
          sum("bw").cast("long").as("base_rows"),
          sum("tw").cast("long").as("batch_rows"))
        .orderBy("band").collect()
        .foreach(r => println(s"band ${r.get(0)}: incidences=${r.get(1)} " +
          s"buckets=${r.get(2)} base_docs=${r.get(3)} batch_docs=${r.get(4)}"))
      // base_rows/batch_rows above ARE distinct docs per band: a doc
      // contributes exactly one (band,key) row per band, so summing
      // bucket widths within a band counts each candidate doc once.
      val tot = shared.agg(sum(col("bw") * col("tw")).cast("long")).head()
      println(s"total capped incidence mass: ${tot.get(0)}")
      shared.unpersist(); batchBands.unpersist()
    }
    spark.stop()
  }
}
