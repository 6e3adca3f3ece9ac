package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF example (SURVEY §2B "UDF/UDAF/UDTF" escape hatch):
  * geometric mean via log-sum — a real partial-aggregatable Aggregator
  * (reduce/merge are associative), so Spark runs it map-side partial +
  * final like any built-in aggregate.
  */
final case class GeoMeanBuf(sumLn: Double, n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
  type Buf = GeoMeanBuf
  private def Buf(s: Double, n: Long) = GeoMeanBuf(s, n)

  override def zero: Buf = Buf(0.0, 0L)
  override def reduce(b: Buf, x: Double): Buf = Buf(b.sumLn + math.log(x), b.n + 1)
  override def merge(a: Buf, b: Buf): Buf = Buf(a.sumLn + b.sumLn, a.n + b.n)
  override def finish(b: Buf): Double = if (b.n == 0) 0.0 else math.exp(b.sumLn / b.n)
  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
