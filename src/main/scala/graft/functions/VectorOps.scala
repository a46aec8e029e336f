package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types._

/** Codegen'd dot product over `array<float|double>` columns.
  *
  * The declarative form `aggregate(zip_with(a, b, ...), 0.0, ...)`
  * interprets two lambdas and allocates an intermediate array per
  * row — per-PAIR in the all-pairs similarity operators, which made
  * the pairwise-cosine joins the slowest queries in the suite. This
  * expression stays inside whole-stage codegen: one fused loop, no
  * allocation.
  *
  * Float elements are widened to double per element and accumulated
  * sequentially — the exact arithmetic (and IEEE result) of the HOF
  * form and of DuckDB's `list_cosine_similarity` over `DOUBLE[]`,
  * so oracle parity is unchanged. Mismatched lengths yield NULL —
  * same as `zip_with`'s null-padding propagating through the sum —
  * so a corrupt short embedding drops out of similarity filters
  * instead of passing with a silently partial dot product. Null
  * array ELEMENTS are read as 0.0 (the embedding tables never
  * contain them).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def ok(t: DataType): Boolean = t == FloatType || t == DoubleType
  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _)) if ok(lt) && ok(rt) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (lt == FloatType) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rt == FloatType) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, i: String, t: DataType): String =
        if (t == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${get(a, i, elemType(left))} * ${get(b, i, elemType(right))};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Column-level dot product of two float/double array columns. */
  def dotp(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** L2 norm of a float/double array column. */
  def l2norm(a: Column): Column = sqrt(dotp(a, a))
}
