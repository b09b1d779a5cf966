package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming plumbing for the judged streaming queries.
  *
  * The driver contract needs a *batch* DataFrame per query, so each
  * streaming query runs the events parquet through a real
  * `readStream` → transform → memory-sink pipeline under
  * `Trigger.AvailableNow` (processes everything, runs the no-data batch
  * that advances the watermark and flushes evictable state, then stops),
  * and the sink table is returned. Semantics are identical to a long-
  * running deployment; only the trigger differs — exactly how a 100 TB
  * backfill of a streaming job is run in production.
  */
object EventsStream {

  private val n = new AtomicInteger(0)

  /** The events table as an unbounded source (single-file glob → one
    * micro-batch at test scale; a directory of files at production scale,
    * rate-limited by maxFilesPerTrigger). Nanos→µs as in Tables.events. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // the file source wants a directory; stage one containing a symlink
    // to the (read-only) events file
    val staged = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft_events_${dir.hashCode.toHexString}")
    java.nio.file.Files.createDirectories(staged)
    val link = staged.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(link, java.nio.file.Paths.get(path))
    spark.readStream.schema(schema).parquet(staged.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Run a streaming DataFrame to completion into a memory sink, return
    * the sink contents as a batch DataFrame. */
  def runToTable(spark: SparkSession, df: DataFrame, mode: String): DataFrame = {
    val name = s"graft_stream_sink_${n.incrementAndGet()}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }
}
