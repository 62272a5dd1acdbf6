package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF via the `Aggregator` API (the user-facing custom-aggregate
  * machinery the reference lacks — SURVEY §2.9 "UDAF registry"):
  * geometric mean as a (Σ ln x, n) buffer. Map-side partial aggregation
  * comes free from the Aggregator contract (`merge`), so it shuffles two
  * doubles per group, not the rows.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x <= 0.0) b else (b._1 + math.log(x), b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0L) 0.0 else math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
