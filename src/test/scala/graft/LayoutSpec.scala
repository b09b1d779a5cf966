package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Output-layout management — the write-side half of the 100 TB story.
  * A corpus partitioned by a low-cardinality key (here `lang`) lets every
  * downstream query that filters on it skip whole directories before a
  * single byte is read: partition PRUNING (directory-level, exact) as
  * opposed to parquet filter PUSHDOWN (row-group stats, best-effort),
  * which PlanSpec pins on flat files. File sizing via maxRecordsPerFile
  * stands in for the real knob against small-file explosion at scale. */
class LayoutSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_layout").toString

  test("partitionBy write + filtered read prunes to one partition dir") {
    val docs = Tables(spark, sf).documents
    val p = s"$tmp/docs_by_lang"
    docs.write.mode("overwrite").partitionBy("lang").parquet(p)

    val back = spark.read.parquet(p).filter(col("lang") === "en")
    val scan = back.queryExecution.sparkPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"),
      s"no partition filter in scan:\n$scan")
    // pruning is exact: same rows as filtering the unpartitioned table
    assert(back.count() == docs.filter(col("lang") === "en").count())
    // and the pruned scan must not list non-matching partition dirs
    val dirs = new java.io.File(p).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs.contains("lang=en") && dirs.size >= 3)
  }

  test("partition column round-trips values and schema") {
    val p = s"$tmp/docs_by_src"
    val docs = Tables(spark, sf).documents
    docs.write.mode("overwrite").partitionBy("source").parquet(p)
    val back = spark.read.parquet(p)
    assert(back.count() == docs.count())
    assert(back.select(sum(col("n_chars"))).collect().head.getLong(0) ==
      docs.select(sum(col("n_chars"))).collect().head.getLong(0))
  }

  test("repartitionByRange + sortWithinPartitions yields globally-sorted shards") {
    val p = s"$tmp/orders_ranged"
    Tables(spark, sf).orders
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(p)
    // each output file is internally sorted AND files cover disjoint key
    // ranges — the layout that gives downstream scans merge-ready input
    // without any global sort (at 100 TB, the only affordable "sorted")
    val files = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 4)
    val ranges = files.map { f =>
      val keys = spark.read.parquet(f.getPath)
        .select("o_orderkey").collect().map(_.getLong(0))
      assert(keys.zip(keys.tail).forall { case (a, b) => a <= b },
        s"file ${f.getName} not internally sorted")
      (keys.min, keys.max)
    }
    val sorted = ranges.sortBy(_._1)
    assert(sorted.zip(sorted.tail).forall { case ((_, hi), (lo2, _)) => hi <= lo2 },
      s"file key ranges overlap: ${sorted.toSeq}")
  }

  test("maxRecordsPerFile bounds output file size") {
    val p = s"$tmp/li_sized"
    Tables(spark, sf).lineitem
      .repartition(2)
      .write.mode("overwrite").option("maxRecordsPerFile", 1000).parquet(p)
    val files = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length > 2, "expected file splitting beyond partition count")
    val total = spark.read.parquet(p).count()
    assert(total == Tables(spark, sf).lineitem.count())
  }
}
