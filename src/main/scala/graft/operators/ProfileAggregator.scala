package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A typed single-pass column profiler — the custom-aggregate extension
  * point (SURVEY.md §7.3: an `Aggregator` for the A5 var_report profile).
  *
  * The buffer carries exact integer power sums (values quantized to
  * 10⁻⁴, matching the engine's decimal(·,4) discipline) so merges are
  * associative and partition-order independent; mean/sd are derived at
  * `finish` from exact operands. This is the one-object form of
  * [[Representative.columnProfile]] for `Dataset` users and for reuse
  * inside arbitrary aggregations (`ds.groupByKey(...).agg(profileAgg)`).
  *
  * A composed `agg()` of built-ins remains the default (it fuses into
  * whole-stage codegen); the Aggregator exists for typed pipelines and
  * as the template for profile variants the built-ins can't compose
  * (e.g. streaming sketches).
  */
object ProfileAggregator {

  final case class Buf(n: Long, nulls: Long, qsum: Long, qsumsq: Long,
                       min: Double, max: Double)
  final case class Profile(n: Long, nulls: Long, mean: Double, sd: Double,
                           min: Double, max: Double)

  private val Scale = 10000L

  val of: Aggregator[java.lang.Double, Buf, Profile] =
    new Aggregator[java.lang.Double, Buf, Profile] {
      override def zero: Buf = Buf(0L, 0L, 0L, 0L, Double.PositiveInfinity, Double.NegativeInfinity)

      override def reduce(b: Buf, x: java.lang.Double): Buf =
        if (x == null) b.copy(nulls = b.nulls + 1)
        else {
          val q = math.round(x * Scale)
          Buf(b.n + 1, b.nulls, b.qsum + q, b.qsumsq + q * q,
            math.min(b.min, x), math.max(b.max, x))
        }

      override def merge(a: Buf, b: Buf): Buf =
        Buf(a.n + b.n, a.nulls + b.nulls, a.qsum + b.qsum, a.qsumsq + b.qsumsq,
          math.min(a.min, b.min), math.max(a.max, b.max))

      override def finish(b: Buf): Profile = {
        val mean = if (b.n == 0) Double.NaN else (b.qsum.toDouble / Scale) / b.n
        val sd = if (b.n < 2) Double.NaN else {
          val num = b.qsumsq.toDouble / (Scale * Scale) * b.n -
            (b.qsum.toDouble / Scale) * (b.qsum.toDouble / Scale)
          math.sqrt(num / (b.n.toDouble * (b.n - 1)))
        }
        Profile(b.n, b.nulls, mean, sd, b.min, b.max)
      }

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Profile] = Encoders.product[Profile]
    }
}
