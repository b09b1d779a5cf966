package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the PQ ASYMMETRIC-DISTANCE (ADC)
  * readout: 8 lookup-table probes + 7 adds per candidate row, as one
  * fused codegen loop — the scoring inner loop of the IVF×PQ query
  * path (graft.queries.Similarity.pqAdc).
  *
  * Why native is load-bearing at scale: the Column formulation is an
  * 8-term `element_at(lut, codes[s]*8+s)` chain — 8 separate
  * element_at expressions plus 7 Add nodes evaluated per candidate.
  * Each ADC row is ~nprobe/k of the corpus per query, so at sf1000v
  * (20 M vectors × 8 queries × 1/8 of the corpus probed) the chain
  * runs ~20 M times × 15 expression-tree nodes; q_sim_ivfpq measured
  * 3,972 CPU-s warm with ~29 cores saturated in exactly this stage.
  * One fused loop reads both arrays directly — no per-term bounds
  * re-derivation, no intermediate boxing, nothing between the two
  * array reads and the running sum.
  *
  * ARITHMETIC CONTRACT (load-bearing for the ivfpq oracle): the sum is
  * the LEFT-ASSOCIATED IEEE-double chain
  * `((t0 + t1) + t2) + … + t7` with `ts = lut[codes[s]·subs + s]`
  * (0-based) — bit-identical to the `(0 until 8).map(…).reduce(_ + _)`
  * Column chain it replaces and to DuckDB's explicit
  * `qr.l[e.codes[1]*8 + 1] + …` sum. Swapping the plan shape changes
  * NOTHING about the hash-checked results (SimilaritySpec pins
  * native ≡ Column-chain equality on the live corpus).
  *
  * Inputs: `codes` is the candidate's PQ code ids (array<int>, exactly
  * [[PqEncodeCodes.Subs]] entries — the pqEncoded contract); `lut` is
  * ONE query's lookup table flattened (code, sub)-major to
  * array<double> (the pqLut contract: length = k·subs). Malformed
  * shapes fail loudly — a silent misindex would corrupt every distance
  * downstream of it. */
final case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  private val subs = PqEncodeCodes.Subs

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "graft_pq_adc expects (array<int> codes, array<double> lut), " +
          s"got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val n = lut.numElements()
    PqAdc.requireShape(codes.numElements(), n)
    // seeded from the FIRST lookup, not 0.0: `0.0 + t0` differs from
    // `t0` when t0 = -0.0, and the contract is the exact reduce chain
    var acc = 0.0
    var s = 0
    while (s < subs) {
      val idx = codes.getInt(s) * subs + s
      if (idx < 0 || idx >= n) PqAdc.badCode(codes.getInt(s), n / subs)
      if (s == 0) acc = lut.getDouble(idx) else acc += lut.getDouble(idx)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val idx = ctx.freshName("idx")
      s"""
         |int $n = $b.numElements();
         |graft.functions.PqAdc.requireShape($a.numElements(), $n);
         |double $acc = 0.0;
         |for (int $s = 0; $s < $subs; $s++) {
         |  int $idx = $a.getInt($s) * $subs + $s;
         |  if ($idx < 0 || $idx >= $n) {
         |    graft.functions.PqAdc.badCode($a.getInt($s), $n / $subs);
         |  }
         |  $acc = ($s == 0) ? $b.getDouble($idx) : $acc + $b.getDouble($idx);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {

  /** Runtime guard shared by both eval paths: exactly subs codes, and a
    * lut that is a whole positive number of (code)-major subs-blocks —
    * anything else would silently misindex (or read past the shorter
    * lut via a stale k). Two comparisons per row against an 8-lookup
    * fold. The per-element `codes[s] < k` bound is implied: pqEncoded
    * emits dense 0..k-1 codes against the SAME codebook the lut is
    * built from — but UnsafeArrayData does NOT bounds-check reads, so
    * the loop keeps an explicit (well-predicted, ~free) index guard. */
  def requireShape(codesLen: Int, lutLen: Int): Unit = {
    if (codesLen != PqEncodeCodes.Subs)
      throw new IllegalArgumentException(
        s"graft_pq_adc: codes length $codesLen != ${PqEncodeCodes.Subs}")
    if (lutLen <= 0 || lutLen % PqEncodeCodes.Subs != 0)
      throw new IllegalArgumentException(
        s"graft_pq_adc: lut length $lutLen is not a positive multiple of " +
          s"subs = ${PqEncodeCodes.Subs} — lut must be (code, sub)-major dense")
  }

  def badCode(code: Int, k: Int): Nothing =
    throw new IllegalArgumentException(
      s"graft_pq_adc: code id $code outside the lut's k = $k codes")

  val ident: FunctionIdentifier = FunctionIdentifier("graft_pq_adc")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PqAdc].getName, null, "graft_pq_adc",
    "graft_pq_adc(codes, lut) - PQ asymmetric distance: 8 LUT lookups summed",
    "", "", "", "", "", "", "built-in")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => PqAdc(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_pq_adc expects 2 arguments, got ${other.size}")
  }
}
