package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (SURVEY.md §2.9: the reference's
  * `AggregateFunction[IN, ACC, OUT]` extension point).
  *
  * IncrementalAvg is the direct analog of the reference's `AverageAgg`
  * (HotItems.scala:85-101: acc = (sum, count), result = sum/count) —
  * mergeable, so Catalyst runs it partial+final like any built-in.
  * Usable typed (`ds.select(IncrementalAvg.toColumn)`) or untyped via
  * `functions.udaf(IncrementalAvg)`.
  */
object IncrementalAvg extends Aggregator[Long, (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(acc: (Long, Long), v: Long): (Long, Long) =
    (acc._1 + v, acc._2 + 1)
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(acc: (Long, Long)): Double =
    if (acc._2 == 0) Double.NaN else acc._1.toDouble / acc._2
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
