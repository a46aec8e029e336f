package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Band-dedup predicates for the LSH candidate joins
  * ([[graft.operators.Dedup]] q42/q44 — the r12 retirement of their
  * pair-`distinct()`, the q43 canonical-combo idiom generalized).
  *
  * A near-identical pair collides in MANY bands, so the banding
  * self-join emits it once per shared band; deduping that fan-out
  * through `distinct()` shuffles the whole MULTIPLIED pair stream —
  * cost tracks collisions, which is exactly the quantity dup-heavy
  * corpora blow up. Both signatures are present in the joined row,
  * so dedup is instead one codegen'd predicate: keep the row only
  * when the matched band is the FIRST band the two signatures share
  * (a joined row shares ≥ 1 band by construction, so the first
  * shared band exists and exactly one row per pair survives). The
  * check costs a ≤ #bands loop per matched row and the distinct()
  * shuffle disappears; the carried signature costs O(#bands) bytes
  * per KEY row — linear in the corpus, not in the collisions.
  *
  * Fused expressions, not nested Columns or `zip_with`: Catalyst
  * does no CSE inside join conditions/filters referencing both
  * sides (the q43 lesson), and the higher-order builtins allocate a
  * lambda-result array per row on the match-multiplied stream.
  */
object BandOps {

  /** First index at which the two key arrays agree, or -1 (a joined
    * candidate row always has one). Allocation-free; called from
    * generated code. */
  def firstEqualIdx(x: ArrayData, y: ArrayData): Int = {
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.getInt(i) == y.getInt(i)) return i
      i += 1
    }
    -1
  }

  /** [[firstEqualIdx]] over two `array<int>` band-key columns. */
  def firstEqualIdx(x: Column, y: Column): Column =
    GraftBridge.column(FirstEqualIdx(
      GraftBridge.expression(x), GraftBridge.expression(y)))

  /** Pack per-band keys of `bits` bits each into a little-endian
    * long array — the compact signature the q44 key rows carry
    * (bands × bits bits ≈ 72-200 B vs bands × 8 B unpacked). */
  def packKeys(ks: Array[Long], bits: Int): Array[Long] = {
    require(bits > 0 && bits < 64, s"packKeys bits out of range: $bits")
    val total = ks.length.toLong * bits
    val out = new Array[Long](((total + 63) >>> 6).toInt)
    var b = 0
    while (b < ks.length) {
      val start = b.toLong * bits
      val word = (start >>> 6).toInt
      val off = (start & 63).toInt
      val v = ks(b) & ((1L << bits) - 1)
      out(word) |= v << off
      if (off + bits > 64) out(word + 1) |= v >>> (64 - off)
      b += 1
    }
    out
  }

  /** Band `b`'s key inside a [[packKeys]]-packed signature. */
  def bandKey(sig: ArrayData, bits: Int, b: Int): Long = {
    val start = b.toLong * bits
    val word = (start >>> 6).toInt
    val off = (start & 63).toInt
    var v = sig.getLong(word) >>> off
    if (off + bits > 64) v |= sig.getLong(word + 1) << (64 - off)
    v & ((1L << bits) - 1)
  }

  /** First band at which two packed signatures share a key, or -1.
    * Allocation-free; called from generated code. */
  def firstSharedBand(x: ArrayData, y: ArrayData, bits: Int, bands: Int): Int = {
    var b = 0
    while (b < bands) {
      if (bandKey(x, bits, b) == bandKey(y, bits, b)) return b
      b += 1
    }
    -1
  }

  /** [[firstSharedBand]] over two packed `array<bigint>` signature
    * columns of a (bits, bands) geometry. */
  def firstSharedBand(x: Column, y: Column, bits: Int, bands: Int): Column =
    GraftBridge.column(FirstSharedBand(
      GraftBridge.expression(x), GraftBridge.expression(y), bits, bands))
}

/** Codegen'd wrapper over [[BandOps.firstEqualIdx]]. */
case class FirstEqualIdx(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"first_equal_idx expects two array<int>, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(x: Any, y: Any): Any =
    BandOps.firstEqualIdx(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.BandOps.firstEqualIdx($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd wrapper over [[BandOps.firstSharedBand]]. */
case class FirstSharedBand(left: Expression, right: Expression,
    bits: Int, bands: Int) extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"first_shared_band expects two packed array<bigint>, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(x: Any, y: Any): Any =
    BandOps.firstSharedBand(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData], bits, bands)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.BandOps.firstSharedBand($x, $y, $bits, $bands)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
