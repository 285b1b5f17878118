package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native string-hash expressions.
  *
  * The HOF form of the polynomial fingerprint
  * (`aggregate(transform(split(text, "")...))`) is CodegenFallback:
  * every character goes through an interpreted lambda with a boxed
  * Long, and on hash-per-shingle paths (MinHash, SimHash) that cost
  * dominated the query. This expression runs the same recurrence as a
  * primitive byte loop inside whole-stage codegen.
  */
object StringExpressions {

  /** Polynomial rolling hash acc = (acc*31 + byte) mod 1e9+7 over the
    * UTF-8 bytes of the input. On ASCII input this is bit-identical to
    * the per-character `ascii()` fold (the form the DuckDB oracles
    * replicate); all callers hash normalized text, which is ASCII by
    * construction. Wraparound-free: acc < 2^30, so acc*31 + 255 < 2^35. */
  case class PolyHash(child: Expression) extends UnaryExpression {
    private val P = 1000000007L
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"poly_hash argument must be string, got ${other.catalogString}")
    }
    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      var acc = 0L
      var i = 0
      while (i < bytes.length) { acc = (acc * 31L + (bytes(i) & 0xff)) % P; i += 1 }
      acc
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val (b, i, acc) = (ctx.freshName("b"), ctx.freshName("i"), ctx.freshName("acc"))
        s"""
           |byte[] $b = $a.getBytes();
           |long $acc = 0L;
           |for (int $i = 0; $i < $b.length; $i++) {
           |  $acc = ($acc * 31L + ($b[$i] & 0xff)) % ${P}L;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): PolyHash = copy(child = c)
  }

  def polyHash(text: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(text)))
}
