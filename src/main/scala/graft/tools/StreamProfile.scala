package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming diagnostic main (SURVEY §2.A op #13, progress reporting):
  * runs one judged streaming query with a StreamingQueryListener attached
  * and prints every micro-batch's durationMs breakdown — where the wall
  * time of a streaming query actually goes (triggerExecution, state
  * commit, watermark batches), which per-query bench totals can't show.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=N
  *        sbt "runMain graft.tools.StreamProfile q_stream_join_windowed"
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_stream_join_windowed")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val shuffle = sys.env.getOrElse("GRAFT_SHUFFLE", cpus)
    // same session contract as Bench/Verify (graft.Graft.builder) — a
    // profile taken under different session semantics than the bench it
    // diagnoses would be a profile of something else
    val b = graft.Graft.builder(s"local[$cpus]", shuffle.toInt)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
    sys.env.get("GRAFT_CKPT").foreach(p =>
      b.config("spark.sql.streaming.checkpointLocation", p))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        println(s"[profile] started ${e.id}")
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[profile] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs} state=${p.stateOperators.map(s =>
            s"(rows=${s.numRowsTotal} commit=${s.commitTimeMs}ms)").mkString}")
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        println(s"[profile] terminated ${e.id}")
    })
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
    println(s"[profile] $name rows=$n total=${(System.nanoTime() - t0) / 1e9}s")
    spark.stop()
  }
}
