package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probes against pre-built sketches (e45). */
object SketchExpressions {

  /** Codegen'd `BloomFilter.mightContainLong` over a bigint column.
    * The filter rides the expression into the plan (one reference
    * object per stage — task binaries are themselves torrent-broadcast
    * by the scheduler, so executors fetch the filter once per stage,
    * not per task). Null input → null, like any unary expression: the
    * caller decides what an unhashable row means (e45 routes null
    * keys to the provably-unseen path — a null never enters a filter,
    * and can never match the exact check either). */
  case class BloomMightContainLong(child: Expression, filter: BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_long argument must be bigint, got ${other.catalogString}")
    }
    override protected def nullSafeEval(input: Any): Any =
      filter.mightContainLong(input.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.mightContainLong($x);")
    }
    override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
      copy(child = c)
  }

  def bloomMightContainLong(key: Column, filter: BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(key), filter))
}
