package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Column-API surface for graft's native expressions. */
object VectorFunctions {

  /** Codegen'd integer dot product of two `Array[Long]` columns
    * ([[LongArrayDot]]). */
  def dotLong(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      LongArrayDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Exact vector-moments aggregate over an `Array[Long]` column
    * ([[VectorMomentsAgg]]): one struct of (n, Σqᵢ, Σqᵢqⱼ upper-tri). */
  def vectorMoments(qv: Column, dim: Int): Column =
    GraftSqlBridge.column(
      VectorMomentsAgg(GraftSqlBridge.expression(qv), dim).toAggregateExpression())

  /** Bounded dedup-ing top-k edge aggregate ([[TopKEdgesAgg]]): the k
    * best (dst, cosine) per group under (cosine DESC, dst ASC) with
    * duplicate dst values collapsed — DISTINCT + rank-window semantics
    * in one map-side-combinable pass. */
  def topEdges(dst: Column, cosine: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKEdgesAgg(GraftSqlBridge.expression(dst),
        GraftSqlBridge.expression(cosine), k).toAggregateExpression())
}

/** SQL registration for graft's native expressions, the
  * `SparkSessionExtensions` route: sessions built with
  * `.withExtensions(new GraftExtensions)` (Tables.session does) can call
  * `graft_dot(a, b)` from `spark.sql` / `expr` strings. The Column API
  * ([[VectorFunctions]]) works on ANY session — including one the
  * harness built without extensions — so operators use that; this hook
  * exists for SQL-string users of the library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.dotLong)
}

object GraftExtensions {
  val dotLong: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "graft_dot"),
      (children: Seq[Expression]) => LongArrayDot(children.head, children(1)))
}
