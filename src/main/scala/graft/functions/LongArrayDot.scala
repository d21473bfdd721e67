package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: 64-bit integer dot product of two
  * `Array[Long]` columns — `Σ a(i)·b(i)` over the common prefix length.
  *
  * Exists because Spark's higher-order array functions
  * (`aggregate(zip_with(...))`) are interpreted, not codegen'd: the
  * measured workaround so far was flattening vectors to one column per
  * dimension to stay inside whole-stage codegen
  * (DedupOps.flattened). This expression keeps the whole dot product in
  * generated code as a single tight loop over the unsafe array data —
  * no per-dimension column blow-up, no interpreted lambda dispatch —
  * so vector frames can shuffle/cache in their natural `Array[Long]`
  * shape (1 column instead of 64).
  *
  * Null contract: null if either array is null (standard
  * `BinaryExpression` null-intolerance); null ELEMENTS are not
  * expected (the quantizing `transform` never produces them) and are
  * read as 0 by the unsafe accessor — callers own that invariant.
  *
  * Deterministic and engine-portable: pure integer math, so results are
  * bit-identical across engines and partition orders (the property the
  * DuckDB oracle comparison relies on).
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // No ExpectsInputTypes: its AbstractDataType vocabulary is private[sql],
  // so the input contract is enforced here instead (no implicit casts —
  // callers quantize to bigint explicitly, which is the point).
  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType).collect { case ArrayType(LongType, _) => () } match {
      case Seq((), ()) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two array<bigint> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}
