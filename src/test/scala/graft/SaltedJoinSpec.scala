package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

/** Salted join must be result-identical to the plain equi-join. */
class SaltedJoinSpec extends SparkSpec {

  test("salted join equals plain join on orders x lineitem") {
    val t = Tables(spark, sf)
    val plain = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .orderBy("o_orderpriority").collect()
    val salted = SaltedJoin.inner(t.lineitem, t.orders, "l_orderkey",
        "o_orderkey", 8, Seq(col("l_orderkey"), col("l_linenumber")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .orderBy("o_orderpriority").collect()
    assert(plain.toSeq == salted.toSeq)
  }

  test("shared key column name (salted self-join) resolves unambiguously") {
    import spark.implicits._
    val big = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val small = Seq((1L, 10), (2L, 20)).toDF("k", "w")
    val joined = SaltedJoin.inner(big, small, "k", "k", 4,
      Seq(col("k"), col("v")))
    assert(joined.count() == 3)
    // exactly one surviving key column: downstream string references work
    assert(joined.columns.count(_ == "k") == 1)
    assert(joined.filter(col("k") === 1L).count() == 2)
  }

  test("salt spreads a single hot key across partitions") {
    import spark.implicits._
    val hot = Seq.fill(1000)((42L, "x")).toDF("k", "v")
    val dim = Seq((42L, "dim")).toDF("dk", "dv")
    val joined = SaltedJoin.inner(hot, dim, "k", "dk", 8,
      Seq(col("k"), monotonically_increasing_id()))
    assert(joined.count() == 1000)
  }
}
