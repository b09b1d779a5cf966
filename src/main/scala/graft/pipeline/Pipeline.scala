package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}

/** The pyPiper-shaped composition facade, Spark-first.
  *
  * Reference semantics reproduced (SURVEY.md §2.A): users compose `Node`s
  * with `|` (op #7), fan out with a list operand (op #8), select named
  * streams (op #9), micro-batch (op #5), and execute with
  * `Pipeline(...).run()` (ops #1/#11). Reference mechanics deliberately
  * NOT reproduced: pyPiper pushes one Python object at a time, eagerly,
  * through live node objects — here a Node is a lazy description
  * (`DataFrame => DataFrame`), composition never executes anything, and
  * `run()` just forces Spark actions, so the whole chain lands in one
  * Catalyst plan: filters still push to the scan, transforms fuse into
  * whole-stage codegen, and a 1000-executor cluster parallelizes it
  * without the facade knowing. Fan-out is the one place state appears:
  * the shared upstream is cached once so k branches scan it once, the
  * Spark analog of pyPiper feeding every successor each record.
  */
sealed trait Node {

  /** Apply this (sub)graph to one input, producing one DataFrame per leaf
    * branch, keyed by dot-joined node path. */
  def run(in: DataFrame): Map[String, DataFrame]

  /** Sequential composition — pyPiper's `a | b`. Piping into a fan-out's
    * result pipes into EVERY open branch. */
  def |(next: Node): Node = Node.Chain(this, next)

  /** Fan-out — pyPiper's `a | [b, c]`: every branch sees every record. */
  def |(branches: Seq[Node]): Node = Node.Chain(this, Node.FanOut(branches))

  /** DAG rendering, the analog of `print(pipeline)`. */
  def describe: String
}

object Node {

  /** A named 1-input/1-output operator; the `run(data)`+`emit` analog. */
  final case class Op(name: String, f: DataFrame => DataFrame) extends Node {
    def run(in: DataFrame): Map[String, DataFrame] = Map(name -> f(in))
    def describe: String = name
  }

  final case class Chain(up: Node, down: Node) extends Node {
    def run(in: DataFrame): Map[String, DataFrame] =
      up.run(in).flatMap { case (path, df) =>
        down.run(df).map { case (p2, d2) => s"$path.$p2" -> d2 }
      }
    def describe: String = s"${up.describe} | ${down.describe}"
  }

  final case class FanOut(branches: Seq[Node]) extends Node {
    def run(in: DataFrame): Map[String, DataFrame] = {
      // one materialization feeds k branches — the lazy-world equivalent
      // of pyPiper pushing each record to every successor
      val shared = in.cache()
      branches.flatMap(_.run(shared)).toMap
    }
    def describe: String = branches.map(_.describe).mkString("[", ", ", "]")
  }

  // ---- constructors mirroring the reference's node vocabulary ----

  /** Arbitrary transform (op #2 generalized). */
  def transform(name: String)(f: DataFrame => DataFrame): Node = Op(name, f)

  /** Filter node (op #4). */
  def where(name: String, cond: Column): Node = Op(name, _.filter(cond))

  /** Projection / named-stream emission (op #9, out_streams). */
  def select(name: String, cols: Column*): Node = Op(name, _.select(cols: _*))

  /** Named-stream subscription (op #9, in_streams); "*" = everything. */
  def streams(name: String, streams: String*): Node = Op(name,
    df => if (streams.contains("*")) df else df.select(streams.map(df.col): _*))

  /** 1→N transform via explode (op #3). */
  def flatten(name: String, c: Column, as: String): Node =
    Op(name, _.withColumn(as, org.apache.spark.sql.functions.explode(c)))

  /** Micro-batch (op #5): hand `f` lists of up to `k` rows. Scalable
    * deviation from the reference: batches are PER PARTITION (pyPiper's
    * global batching serializes the stream — at 100 TB that is the
    * definition of a driver bottleneck). `f` must preserve the schema. */
  def batch(name: String, k: Int)(f: Seq[Row] => Seq[Row]): Node = Op(name,
    df => df.mapPartitions(it => it.grouped(k).flatMap(f))(
      Encoders.row(df.schema)))

  /** Global batch (op #6, BATCH_SIZE_ALL) — expressed as what it really
    * is at scale: a full-input aggregation, not a driver collect. */
  def batchAll(name: String)(agg: DataFrame => DataFrame): Node = Op(name, agg)
}

/** The executable graph — `Pipeline(source, graph).run()` is the analog of
  * `pyPiper.Pipeline(graph).run()`: the only eager step. Termination/EOS
  * (op #11) is inherent: bounded inputs end. */
final case class Pipeline(source: DataFrame, graph: Node) {
  /** Execute lazily-composed graph: returns leaf-name → DataFrame. */
  def outputs: Map[String, DataFrame] = graph.run(source)

  /** Run every leaf to completion, returning row counts — the minimal
    * sink action (op #10). */
  def run(): Map[String, Long] = outputs.map { case (k, df) => k -> df.count() }

  def describe: String = s"source | ${graph.describe}"
}
