package graft

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Sqrt}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT dot_product(a, b)")` works anywhere the plugin
  * is loaded:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (GraftSession sets this for its own sessions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def arity(name: String, n: Int)(f: Seq[Expression] => Expression)
      : Seq[Expression] => Expression = { args =>
    require(args.length == n,
      s"$name expects $n argument(s), got ${args.length}")
    f(args)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float/double arrays"),
      arity("dot_product", 2)(args => DotProduct(args(0), args(1)))))
    ext.injectFunction((
      FunctionIdentifier("l2_norm"),
      info("l2_norm", "l2_norm(a) - Euclidean norm of a float/double array"),
      arity("l2_norm", 1)(args => Sqrt(DotProduct(args(0), args(0))))))
  }
}
