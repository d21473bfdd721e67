package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded, dedup-ing top-k edge selection per group: keeps the k best
  * (dst, cosine) entries under the ordering (cosine DESC, dst ASC),
  * dropping duplicate dst values — SELECT-DISTINCT-then-rank semantics
  * in ONE aggregate.
  *
  * Why a native `TypedImperativeAggregate` and not DISTINCT + a
  * row_number window: the k-NN descent's per-round contraction ranks a
  * candidate relation of ~10⁹ scored pairs at 200k vectors. The window
  * form costs two full shuffles of that relation (the pair DISTINCT,
  * then the rank's hashpartitioning(src)) plus a per-partition sort.
  * This aggregate is map-side combinable: every task reduces its input
  * to ≤ |src|·k bounded buffers before anything shuffles, duplicates die
  * in the buffer scan instead of a dedup exchange, and nothing is ever
  * sorted but the k-entry buffers themselves. The output is EXACTLY the
  * window form's top-k rows (same ordering, same tie-break, duplicates
  * collapsed), so the DuckDB twin — which keeps the readable
  * DISTINCT + row_number formulation — is unchanged and every
  * refined-family correctness row still proves equivalence.
  *
  * The duplicate-dst drop is sound because cosine is a pure function of
  * the (src, dst) pair: duplicates generated through different shared
  * neighbors carry the same cosine, so collapsing them is set semantics,
  * not information loss.
  *
  * Memory: one buffer holds ≤ k (long, double) pairs (k ≤ 64 in every
  * caller — ~1 KB); per-task hash state is |distinct src per task| × that.
  * `Tables.session` raises the ObjectHashAggregate sort-fallback
  * threshold so corpus-sized group counts stay in the hash regime (the
  * 128-group default would re-sort the giant input, re-creating the
  * window cost this aggregate exists to remove).
  */
case class TopKEdgesAgg(
    dst: Expression,
    cosine: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKEdgesAgg.Buf] with BinaryLike[Expression] {

  import TopKEdgesAgg._

  override def left: Expression = dst
  override def right: Expression = cosine

  override def checkInputDataTypes(): TypeCheckResult =
    (dst.dataType, cosine.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (d, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_top_edges requires (bigint, double) input, got (${d.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dst", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_edges"

  override def createAggregationBuffer(): Buf = new Buf(k)

  override def update(b: Buf, input: InternalRow): Buf = {
    val d = dst.eval(input)
    val c = cosine.eval(input)
    if (d != null && c != null)
      b.insert(d.asInstanceOf[Long], c.asInstanceOf[Double])
    b
  }

  override def merge(b: Buf, o: Buf): Buf = {
    var i = 0
    while (i < o.size) { b.insert(o.dsts(i), o.coss(i)); i += 1 }
    b
  }

  override def eval(b: Buf): Any =
    new GenericArrayData(Array.tabulate[Any](b.size)(i =>
      InternalRow(b.dsts(i), b.coss(i))))

  override def serialize(b: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 16 * b.size)
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) {
      out.writeLong(b.dsts(i)); out.writeDouble(b.coss(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Buf(k)
    var i = 0
    while (i < n) {
      val d = in.readLong(); val c = in.readDouble()
      // entries arrive already sorted and distinct — append directly
      b.dsts(b.size) = d; b.coss(b.size) = c; b.size += 1
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKEdgesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKEdgesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKEdgesAgg =
    copy(dst = newLeft, cosine = newRight)
}

object TopKEdgesAgg {

  /** Sorted bounded buffer: entries kept in (cosine DESC, dst ASC)
    * order by insertion shift (k ≤ 64 — shifts are a few cache lines).
    * Mutable by design — Spark owns each buffer single-threaded. */
  final class Buf(k: Int) {
    var size: Int = 0
    val dsts = new Array[Long](k)
    val coss = new Array[Double](k)

    /** true iff entry i orders strictly before (c, d). Uses
      * `java.lang.Double.compare` so the order is TOTAL: a NaN cosine
      * (a zero-norm vector's 0/0) sorts as the greatest value and
      * compares equal to itself — matching Spark SQL's NaN ordering and
      * the DISTINCT/row_number window form (and DuckDB), where NaN is
      * normalized. Raw `>`/`==` would make NaN incomparable: never
      * deduplicated, always inserted at slot 0, flooding the buffer. */
    @inline private def before(i: Int, d: Long, c: Double): Boolean = {
      val cmp = java.lang.Double.compare(coss(i), c)
      cmp > 0 || (cmp == 0 && dsts(i) < d)
    }

    def insert(d: Long, c: Double): Unit = {
      // fast reject: full buffer and the worst entry orders before us
      if (size == k && before(size - 1, d, c)) return
      // find insertion point; duplicates (same dst ⇒ same cosine) are
      // adjacent to the insertion point's cosine run — scan it
      var lo = 0
      while (lo < size && before(lo, d, c)) lo += 1
      // duplicate check: equal ordering position means same (cosine, dst)
      if (lo < size && java.lang.Double.compare(coss(lo), c) == 0 && dsts(lo) == d) return
      if (size < k) size += 1
      var i = size - 1
      while (i > lo) { dsts(i) = dsts(i - 1); coss(i) = coss(i - 1); i -= 1 }
      dsts(lo) = d; coss(lo) = c
    }
  }
}
