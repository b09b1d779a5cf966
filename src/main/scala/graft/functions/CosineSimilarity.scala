package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns — the hot inner loop of similarity search,
  * emitted straight into whole-stage codegen as a primitive double loop
  * (no boxing, no lambda dispatch, no decimal). One fused pass computes
  * dot, ‖a‖², ‖b‖².
  *
  * This is the 100 TB throughput path; the decimal-interior formulation
  * in graft.queries.Similarity stays the cross-engine-exact oracle
  * baseline (SimilaritySpec asserts the two agree).
  */
final case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // array<float> or array<double> per side (r18: the JL-projected
  // vectors are float64 — same fused fold, elements widened exactly)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
          ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_cosine expects two array<float|double> columns, got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val (ld, rd) = (isDouble(left), isDouble(right))
    val n = math.min(xs.numElements(), ys.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (ld) xs.getDouble(i) else xs.getFloat(i).toDouble
      val y = if (rd) ys.getDouble(i) else ys.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${if (isDouble(left)) s"$a.getDouble($i)"
                          else s"(double) $a.getFloat($i)"};
         |  double $y = ${if (isDouble(right)) s"$b.getDouble($i)"
                          else s"(double) $b.getFloat($i)"};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  /** Column-API entry point: `cosineSim($"a", $"b")`. */
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column-API entry point: `l2sq($"a", $"b")` — squared L2 distance,
    * the PQ encode/LUT inner loop. */
  def l2sq(a: Column, b: Column): Column =
    GraftColumnBridge.column(L2Squared(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column-API entry point: `pqEncode($"embedding", $"cbflat")` — the
    * 8 nearest-code ids per subspace against a flattened broadcast
    * codebook, as one fused map-side loop (see [[PqEncodeCodes]]). */
  def pqEncode(vec: Column, cbflat: Column): Column =
    GraftColumnBridge.column(PqEncodeCodes(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(cbflat)))

  /** Column-API entry point: `pqAdcNative($"codes", $"lut")` — the PQ
    * asymmetric distance (8 LUT lookups + left-fold sum) as one fused
    * codegen loop (see [[PqAdc]]). */
  def pqAdcNative(codes: Column, lut: Column): Column =
    GraftColumnBridge.column(PqAdc(
      GraftColumnBridge.expression(codes), GraftColumnBridge.expression(lut)))

  /** Column-API entry point: `ivfArgmax($"embedding", $"cids", $"ceflat")`
    * — nearest-centroid id by cosine against a flattened broadcast
    * centroid table, one fused codegen loop (see [[IvfArgmax]]). */
  def ivfArgmax(vec: Column, cids: Column, ceflat: Column): Column =
    GraftColumnBridge.column(IvfArgmax(GraftColumnBridge.expression(vec),
      GraftColumnBridge.expression(cids), GraftColumnBridge.expression(ceflat)))

  /** Column-API entry point: `lshBucket($"embedding", 6)`. */
  def lshBucket(a: Column, nBits: Int): Column =
    GraftColumnBridge.column(HyperplaneBucket(
      GraftColumnBridge.expression(a), nBits))

  /** Column-API entry point: `minhash($"shingles", 16)`. */
  def minhash(a: Column, nHashes: Int): Column =
    GraftColumnBridge.column(MinHashSignature(
      GraftColumnBridge.expression(a), nHashes))

  /** Column-API entry point: `shingleHashes($"text", 3)`. */
  def shingleHashes(a: Column, gramSize: Int = 3): Column =
    GraftColumnBridge.column(
      ShingleHashes(GraftColumnBridge.expression(a), gramSize))

  /** Column-API entry point: `gramHashes($"text", 8)` — positional,
    * duplicates kept. */
  def gramHashes(a: Column, gramSize: Int = 3): Column =
    GraftColumnBridge.column(
      GramHashes(GraftColumnBridge.expression(a), gramSize))

  /** Column-API entry point: `fingerprint($"text")`. */
  def fingerprint(a: Column): Column =
    GraftColumnBridge.column(Fingerprint(GraftColumnBridge.expression(a)))

  /** Column-API entry point: `graftTokens($"text")` — space-split,
    * empties dropped, inside codegen (the toks() twin). */
  def graftTokens(a: Column): Column =
    GraftColumnBridge.column(GraftTokens(GraftColumnBridge.expression(a)))

  /** Column-API entry point: `countIn($"ws", words)` — membership
    * count against a constant word set, inside codegen. */
  def countIn(a: Column, words: Seq[String]): Column =
    GraftColumnBridge.column(CountIn(GraftColumnBridge.expression(a), words))

  /** Column-API entry point: `jlProject($"embedding")` — the 8-dim
    * LCG-plane JL projection as one fused codegen loop. */
  def jlProject(a: Column): Column =
    GraftColumnBridge.column(JlProject(GraftColumnBridge.expression(a)))

  /** Column-API entry point: `nbDot($"ws", $"wtoks", $"wvals")` — the
    * NB integer dot product against a sorted broadcast vocabulary. */
  def nbDot(ws: Column, toks: Column, vals: Column): Column =
    GraftColumnBridge.column(NbDotProduct(GraftColumnBridge.expression(ws),
      GraftColumnBridge.expression(toks), GraftColumnBridge.expression(vals)))

  val cosineIdent: FunctionIdentifier = FunctionIdentifier("graft_cosine")

  val cosineInfo: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, null, "graft_cosine",
    "graft_cosine(a, b) - cosine similarity of two float arrays",
    "", "", "", "", "", "", "built-in")

  val cosineBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSimilarity(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_cosine expects 2 arguments, got ${other.size}")
  }

  /** Idempotent SQL registration for sessions not built with
    * [[GraftExtensions]] (e.g. a driver-owned session). */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(cosineIdent, cosineInfo, cosineBuilder)
}

/** `SparkSessionExtensions` hook — enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`;
  * makes `graft_cosine` / `graft_lsh_bucket` available to pure-SQL
  * users. */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((GraftFunctions.cosineIdent, GraftFunctions.cosineInfo,
      GraftFunctions.cosineBuilder))
    ext.injectFunction((HyperplaneBucket.ident, HyperplaneBucket.info,
      HyperplaneBucket.builder))
    ext.injectFunction((MinHashSignature.ident, MinHashSignature.info,
      MinHashSignature.builder))
    ext.injectFunction((ShingleHashes.ident, ShingleHashes.info,
      ShingleHashes.builder))
    ext.injectFunction((GramHashes.ident, GramHashes.info,
      GramHashes.builder))
    ext.injectFunction((Fingerprint.ident, Fingerprint.info,
      Fingerprint.builder))
    ext.injectFunction((L2Squared.ident, L2Squared.info, L2Squared.builder))
    ext.injectFunction((PqEncodeCodes.ident, PqEncodeCodes.info,
      PqEncodeCodes.builder))
    ext.injectFunction((PqAdc.ident, PqAdc.info, PqAdc.builder))
    ext.injectFunction((IvfArgmax.ident, IvfArgmax.info, IvfArgmax.builder))
    ext.injectFunction((NbDotProduct.ident, NbDotProduct.info,
      NbDotProduct.builder))
    ext.injectFunction((JlProject.ident, JlProject.info, JlProject.builder))
    ext.injectFunction((GraftTokens.ident, GraftTokens.info,
      GraftTokens.builder))
  }
}
