package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** `transformWithState` processors (the Spark 4.x arbitrary-state API —
  * SURVEY.md §2.B's named analog of a pyPiper node's typed mutable state:
  * named state variables instead of one opaque blob, RocksDB-backed). */

/** Per-user running (event count, max value) held in one named
  * ValueState; a snapshot row is emitted per key per batch (update
  * mode). `max` and `count` are order-independent, so parallelism or
  * batch placement can never change the converged snapshot — the
  * determinism pyPiper loses the moment n_threads > 1. */
class UserCountMaxProcessor
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)]
    with Serializable {

  @transient private var st: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Double)]("agg",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timers: TimerValues): Iterator[(Long, Long, Double)] = {
    val prev = if (st.exists()) st.get() else (0L, Double.NegativeInfinity)
    val agg = rows.foldLeft(prev)((a, r) => (a._1 + 1, math.max(a._2, r._2)))
    st.update(agg)
    Iterator((key, agg._1, agg._2))
  }
}
