package graft.queries

import graft.Tables
import graft.functions.{GraftFunctions, VectorCentroid}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The user-extension surface (SURVEY.md §2.B last rows): a scalar Scala
  * UDF, the VectorCentroid Aggregator UDAF, and the codegen'd
  * graft_cosine Catalyst expression — pyPiper's whole model is "arbitrary
  * user code per record"; these are the three Spark-native tiers of that,
  * from worst (opaque UDF: no pushdown through it) to best (native
  * expression: fully fused into whole-stage codegen). */
object UdfQueries {

  /** Scalar Scala UDF parsing the order-priority rank. Deliberately the
    * worst tier — the spec point is that the same logic exists as a
    * pure-Column expression (see the oracle), and results agree. */
  val qUdfScalar: QueryDef = QueryDef.oracle(
    "q_udf_scalar",
    """SELECT prio_rank, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
      |FROM (SELECT CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_rank,
      |             o_totalprice
      |      FROM orders)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    import Num._
    val prioRank = udf((p: String) => p.split("-")(0).toInt)
    Tables(spark, dir).orders
      .select(prioRank(col("o_orderpriority")).as("prio_rank"), col("o_totalprice"))
      .groupBy("prio_rank")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy("prio_rank")
  }

  /** Custom Aggregator UDAF: exact fixed-point per-label embedding
    * centroid; first two dimensions exposed for the oracle. */
  val qUdafCentroid: QueryDef = QueryDef.oracle(
    "q_udaf_centroid",
    """SELECT label, COUNT(*) AS n,
      |  CAST(SUM(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE)
      |    / COUNT(*) AS c0,
      |  CAST(SUM(CAST(CAST(embedding[2] AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE)
      |    / COUNT(*) AS c1
      |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (spark, dir) =>
    Tables(spark, dir).embeddings
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        VectorCentroid.centroid(col("embedding")).as("c"))
      .select(col("label"), col("n"),
        element_at(col("c"), 1).as("c0"), element_at(col("c"), 2).as("c1"))
      .orderBy("label")
  }

  /** Top-k via the native codegen'd graft_cosine expression, invoked
    * through the SQL registry (SparkSessionExtensions path) — the 100 TB
    * throughput variant of q_sim_topk. ORACLE-CHECKED since round 12:
    * graft_cosine is a fixed-order double fold, so [[VecSql.cos]]
    * renders it bit-identically in DuckDB (list_reduce is the same left
    * fold; IEEE ops agree exactly) — the "approximate" float path is
    * itself deterministic and driver-compared, not just spec-bounded.
    * SimilaritySpec additionally asserts agreement with the
    * exact-decimal baseline. */
  val qSimTopkFast: QueryDef = QueryDef.oracle(
    "q_sim_topk_fast",
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |p AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
      |    ${VecSql.cos("q.embedding", "c.embedding")} AS cos
      |  FROM e q JOIN e c ON q.vec_id < 8 AND c.vec_id <> q.vec_id)
      |SELECT q_id, rn, n_id, ROUND(cos, 6) AS cos FROM (
      |  SELECT q_id, n_id, cos, ROW_NUMBER() OVER (PARTITION BY q_id
      |    ORDER BY cos DESC, n_id) AS rn FROM p)
      |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin) {
    (spark, dir) =>
      GraftFunctions.ensureRegistered(spark)
      val e = Tables(spark, dir).embeddings
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("embedding").as("eq"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          expr("graft_cosine(eq, embedding)").as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn"), col("n_id"), round(col("cos"), 6).as("cos"))
        .orderBy("q_id", "rn")
  }

  /** Per-group top-k via the bounded-heap Aggregator (functions/TopKAgg):
    * identical answer to the `row_number() <= k` window pattern — the
    * DuckDB oracle IS that window query — but as a partial+final
    * aggregate, so the shuffle moves at most k candidates per group per
    * map partition instead of every row, and nothing ever sorts more
    * than the k-bounded buffers. The scale path for top-k over a fact
    * table with few groups. */
  val qUdafTopk: QueryDef = QueryDef.oracle(
    "q_udaf_topk",
    """SELECT l_returnflag, rn, price, id FROM (
      |  SELECT l_returnflag, l_extendedprice AS price,
      |    l_orderkey * 10 + l_linenumber AS id,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice DESC, l_orderkey * 10 + l_linenumber) AS rn
      |  FROM lineitem)
      |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin,
  ) { (spark, dir) =>
    Tables(spark, dir).lineitem
      .groupBy("l_returnflag")
      .agg(graft.functions.TopKAgg.topK(3, col("l_extendedprice"),
        col("l_orderkey") * 10 + col("l_linenumber")).as("top"))
      .select(col("l_returnflag"), posexplode(col("top")))
      .select(col("l_returnflag"), (col("pos") + 1).as("rn"),
        col("col.score").as("price"), col("col.id").as("id"))
      .orderBy("l_returnflag", "rn")
  }

  val all: Seq[QueryDef] = Seq(qUdfScalar, qUdafCentroid, qSimTopkFast, qUdafTopk)
}
