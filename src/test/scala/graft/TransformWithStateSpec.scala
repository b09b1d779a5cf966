package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues}
import org.apache.spark.sql.Encoders

/** The Spark 4.x transformWithState API — the modern successor of
  * flatMapGroupsWithState and the closest analog of a pyPiper node's
  * typed mutable state (named state variables instead of one blob).
  * Requires the RocksDB state store provider. */
class RunningMaxProcessor
    extends StatefulProcessor[Long, (Long, Double), (Long, Double)]
    with Serializable {
  @transient private var maxState: ListState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    maxState = getHandle.getListState[Double]("max", Encoders.scalaDouble,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timers: TimerValues): Iterator[(Long, Double)] = {
    val prev = maxState.get().toSeq.headOption.getOrElse(Double.MinValue)
    val mx = rows.foldLeft(prev)((a, r) => math.max(a, r._2))
    maxState.clear()
    maxState.appendValue(mx)
    Iterator((key, mx))
  }
}

class TransformWithStateSpec extends SparkSpec {

  test("transformWithState keeps named state across batches (RocksDB store)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Double)]
      val out = in.toDS()
        .groupByKey(_._1)
        .transformWithState(new RunningMaxProcessor, TimeMode.None(), OutputMode.Update())
        .toDF("k", "mx")
      val q = out.writeStream.format("memory").queryName("tws_test")
        .outputMode("update").start()
      try {
        in.addData((1L, 3.0), (1L, 7.0), (2L, 1.0))
        q.processAllAvailable()
        in.addData((1L, 5.0), (2L, 9.0)) // 1's max stays 7, 2's becomes 9
        q.processAllAvailable()
        val last = spark.table("tws_test").collect()
          .map(r => (r.getLong(0), r.getDouble(1)))
          .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
        assert(last(1L) == 7.0 && last(2L) == 9.0)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
