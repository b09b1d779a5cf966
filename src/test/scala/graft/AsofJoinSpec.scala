package graft

import java.sql.Timestamp

import graft.queries.Joins
import org.apache.spark.sql.functions._

/** Boundary semantics for the as-of join variants on a planted fixture:
  * inclusive at-boundary matches, equal-distance ties going backward,
  * tolerance inclusivity, out-of-tolerance and no-candidate nulls — the
  * rules the oracles state, pinned on exact constructed times. */
class AsofJoinSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp(60000L * min)

  private lazy val orders = {
    import spark.implicits._
    Seq((1L, ts(100), 10.0), (1L, ts(200), 20.0))
      .toDF("k", "t", "price")
  }

  private def events(mins: Long*) = {
    import spark.implicits._
    mins.map(m => (1L, ts(m))).toDF("k", "t")
  }

  private def forward(mins: Long*): Map[Long, Option[Double]] =
    Joins.asofForwardMatched(orders, events(mins: _*)).collect()
      .map(r => r.getTimestamp(1).getTime / 60000L ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

  private def nearest(tolMin: Long, mins: Long*): Map[Long, Option[(Double, String)]] =
    Joins.asofNearestSelected(orders, events(mins: _*), tolMin * 60000000L)
      .collect()
      .map { r =>
        val sel = if (r.isNullAt(2)) None
          else { val s = r.getStruct(2); Some((s.getDouble(0), s.getString(1))) }
        r.getTimestamp(1).getTime / 60000L -> sel
      }.toMap

  test("forward as-of: inclusive boundary, earliest future order, null past the last") {
    val m = forward(100, 101, 150, 200, 201)
    assert(m(100L) == Some(10.0), "order exactly AT the event time must match (inclusive)")
    assert(m(101L) == Some(20.0), "just past an order, the NEXT order matches")
    assert(m(150L) == Some(20.0))
    assert(m(200L) == Some(20.0), "inclusive at the second order too")
    assert(m(201L) == None, "no future order -> null, never a past one")
  }

  test("nearest as-of: equal distances tie backward") {
    val m = nearest(1000, 149, 150, 151)
    assert(m(149L) == Some((10.0, "back")))
    assert(m(150L) == Some((10.0, "back")),
      "50 min both ways must pick the EARLIER order deterministically")
    assert(m(151L) == Some((20.0, "fwd")))
  }

  test("nearest as-of: tolerance is inclusive and vetoes per direction") {
    val m = nearest(60, 260, 261, 40, 39)
    assert(m(260L) == Some((20.0, "back")), "exactly AT tolerance matches")
    assert(m(261L) == None, "one minute past tolerance matches nothing")
    assert(m(40L) == Some((10.0, "fwd")), "60 ahead, exactly at tolerance")
    assert(m(39L) == None)
  }

  test("nearest as-of: an out-of-tolerance forward candidate never vetoes an in-tolerance backward one") {
    // event at 130: back dist 30 (<= 40), fwd dist 70 (> 40); the
    // nearer-but-ineligible forward order must not suppress the match
    val m = nearest(40, 130, 170)
    assert(m(130L) == Some((10.0, "back")))
    assert(m(170L) == Some((20.0, "fwd")), "symmetric case on the forward side")
  }

  test("as-of variants: a key with no orders matches nothing") {
    import spark.implicits._
    val ev = Seq((9L, ts(150))).toDF("k", "t")
    assert(Joins.asofForwardMatched(orders, ev).collect().forall(_.isNullAt(2)))
    assert(Joins.asofNearestSelected(orders, ev, 60L * 60000000L)
      .collect().forall(_.isNullAt(2)))
  }
}
