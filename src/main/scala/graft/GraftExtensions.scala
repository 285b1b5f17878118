package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorExpressions.{ArrayAbsMax, ArrayDot, ArrayNorm2, QuantizeInt8}

/** Session extension registering the engine's native expressions as SQL
  * functions, so `spark.sql("... array_dot(a, b) ...")` works anywhere
  * the library's Column API does. Installed via
  * `spark.sql.extensions=graft.GraftExtensions` (set by
  * [[GraftSession.build]]) — the standard `SparkSessionExtensions`
  * injection path for Spark-native libraries. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("array_dot"),
      info("array_dot", "array_dot(a, b) - dot product of two numeric arrays (codegen'd)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "array_dot takes 2 arguments")
        ArrayDot(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("array_norm2"),
      info("array_norm2", "array_norm2(a) - sum of squares of a numeric array (codegen'd)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "array_norm2 takes 1 argument")
        ArrayNorm2(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("array_abs_max"),
      info("array_abs_max", "array_abs_max(a) - max absolute element of a numeric array (codegen'd)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "array_abs_max takes 1 argument")
        ArrayAbsMax(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("quantize_int8"),
      info("quantize_int8", "quantize_int8(a, scale) - symmetric int8 codes floor(v/scale*127+0.5) (codegen'd)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "quantize_int8 takes 2 arguments")
        QuantizeInt8(args.head, args(1))
      }))
  }
}
