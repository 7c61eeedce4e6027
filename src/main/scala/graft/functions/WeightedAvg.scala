package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Custom typed UDAF (SURVEY.md §2b "UDF / UDAF / UDTF"): quantity-
  * weighted average via the `Aggregator[IN, BUF, OUT]` API, registered
  * with `functions.udaf`. Spark plans it as a proper two-phase
  * aggregate — partial (sum, wsum) buffers combine map-side before the
  * exchange, exactly like built-in aggregates, so it scales identically.
  * (For sketches at 100 TB the same API carries e.g. HLL/quantile
  * buffers; here the buffer is 16 bytes.) */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) 0.0 else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
