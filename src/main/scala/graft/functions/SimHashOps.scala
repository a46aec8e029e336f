package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Block-combination helpers for the SimHash banding in
  * [[graft.operators.Dedup.q43]].
  *
  * The canonical-combo dedup predicate ("keep a joined pair only on
  * the combo of its two lowest-indexed clean blocks") is pure bit
  * arithmetic, but expressed as nested Columns every reference to an
  * intermediate re-expands its whole subtree — Catalyst does no
  * common-subexpression elimination inside join conditions, and the
  * expanded tree cost ~10 µs per matched row (40M matches → minutes).
  * As a single fused expression it is one ~30-op loop, inlined by
  * whole-stage codegen via the static forwarder below.
  */
object SimHashOps {

  /** Block layout: 10 blocks over 64 bits (4×7 + 6×6). ≤8 differing
    * bits dirty ≤8 blocks, so every hamming≤8 pair has ≥2 clean
    * blocks — the pigeonhole base of the recall guarantee
    * (Manku/Jain/Das Sarma, WWW'07 §3). */
  val BlockSizes: Array[Int] = Array(7, 7, 7, 7, 6, 6, 6, 6, 6, 6)
  val BlockOffsets: Array[Int] = BlockSizes.scanLeft(0)(_ + _).init

  /** Lexicographic index (among the 45 ordered block pairs) of the
    * combo over the two lowest-indexed clean blocks of `xor`, or -1
    * when fewer than two blocks are clean. Called from generated
    * code — keep it static-forwardable and allocation-free. */
  def canonicalCombo(xor: Long): Int = {
    var clean = 0
    var b = 0
    while (b < 10) {
      if (((xor >>> BlockOffsets(b)) & ((1L << BlockSizes(b)) - 1)) == 0L) clean |= 1 << b
      b += 1
    }
    if (Integer.bitCount(clean) < 2) return -1
    val i1 = Integer.numberOfTrailingZeros(clean)
    val i2 = Integer.numberOfTrailingZeros(clean & (clean - 1))
    (i1 * (19 - i1)) / 2 + (i2 - i1 - 1)
  }

  def canonicalCombo(xor: Column): Column =
    GraftBridge.column(CanonicalCombo(GraftBridge.expression(xor)))

  /** SimHash(64) of a token array, fused per row (r13 optimization):
    * h = xxhash64(token) per element, per-bit +1/−1 majority vote,
    * bit set when the vote is ≥ 0. Bit-identical to the retired
    * explode + 64-column groupBy form (same XxHash64Function seed-42
    * hash, same integer vote, including the h=42 null-element case
    * the old xxhash64(NULL) row produced) — but a pure map-side
    * projection: the corpus-token-sized (doc_id, h) shuffle and the
    * 64-agg hash aggregate are gone from q43's plan. Called from
    * generated code — allocation is one 64-int vote array per row. */
  def simhash64(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) out |= 1L << b
      b += 1
    }
    out
  }

  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))
}

/** Codegen'd wrapper over [[SimHashOps.canonicalCombo]]. */
case class CanonicalCombo(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"canonical_combo expects a bigint simhash xor, got ${child.dataType}")

  override def nullSafeEval(x: Any): Any =
    SimHashOps.canonicalCombo(x.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.SimHashOps.canonicalCombo($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd wrapper over [[SimHashOps.simhash64]]. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string> tokens, got $other")
  }

  override def nullSafeEval(arr: Any): Any =
    SimHashOps.simhash64(arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.SimHashOps.simhash64($x)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
