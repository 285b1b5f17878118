package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.StringExpressions.{NormalizeText, PackedGrams, PolyHash, ShingleHashes}
import graft.functions.VectorExpressions.{ArrayAbsMax, ArrayDot, ArrayNorm2, QuantizeInt8, SortedIntersectCount}
import org.apache.spark.sql.catalyst.expressions.Literal

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
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - intersection size of two SORTED array<bigint> (codegen'd two-pointer merge)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sorted_intersect_count takes 2 arguments")
        SortedIntersectCount(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("poly_hash"),
      info("poly_hash", "poly_hash(s) - polynomial rolling hash (acc*31+byte) mod 1e9+7 (codegen'd)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "poly_hash takes 1 argument")
        PolyHash(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("normalize_text"),
      info("normalize_text",
        "normalize_text(s) - lower-case, non-alnum to space, collapse whitespace, trim; one fused pass"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "normalize_text takes 1 argument")
        NormalizeText(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("packed_grams"),
      info("packed_grams",
        "packed_grams(s, n) - sorted distinct byte-packed character n-grams of normalized text (codegen'd)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "packed_grams takes 2 arguments")
        PackedGrams(args.head, intLit(args(1), "packed_grams"))
      }))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes",
        "shingle_hashes(s, n) - poly_hash of every n-word shingle of normalized text (codegen'd)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hashes takes 2 arguments")
        ShingleHashes(args.head, intLit(args(1), "shingle_hashes"))
      }))
  }

  /** The n of the gram/shingle builders is a STRUCTURAL parameter
    * (baked into the generated code), so the SQL form requires a
    * foldable integer literal. */
  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn argument 2 must be an integer literal, got $other")
  }
}
