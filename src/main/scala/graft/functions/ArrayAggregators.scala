package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise array aggregators (the engine's typed-UDAF surface,
  * `Aggregator[IN, BUF, OUT]` registered through `functions.udaf`).
  *
  * These power the sketch operators: MinHash signatures are an
  * element-wise MIN over per-shingle hash arrays; SimHash bit tallies
  * are an element-wise SUM over per-token ±1 arrays. Both are
  * associative + commutative, so Spark computes them with map-side
  * partial aggregation — one shuffled row per (group, dim) TOTAL, not
  * per input row, which is what makes sketching viable at 100 TB.
  */
object ArrayAggregators {

  private def longArrayEnc: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  private def longSeqEnc: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  class ElementwiseMin(dim: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.fill(dim)(Long.MaxValue)
    def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = {
      var i = 0
      while (i < dim) { val v = a(i); if (v < b(i)) b(i) = v; i += 1 }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < dim) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }
    def finish(r: Array[Long]): Seq[Long] = r.toSeq
    def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    def outputEncoder: Encoder[Seq[Long]] = longSeqEnc
  }

  class ElementwiseSum(dim: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.fill(dim)(0L)
    def reduce(b: Array[Long], a: Seq[Long]): Array[Long] = {
      var i = 0
      while (i < dim) { b(i) += a(i); i += 1 }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < dim) { x(i) += y(i); i += 1 }
      x
    }
    def finish(r: Array[Long]): Seq[Long] = r.toSeq
    def bufferEncoder: Encoder[Array[Long]] = longArrayEnc
    def outputEncoder: Encoder[Seq[Long]] = longSeqEnc
  }

  class ElementwiseSumDouble(dim: Int) extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    def zero: Array[Double] = Array.fill(dim)(0.0)
    def reduce(b: Array[Double], a: Seq[Double]): Array[Double] = {
      var i = 0
      while (i < dim) { b(i) += a(i); i += 1 }
      b
    }
    def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0
      while (i < dim) { x(i) += y(i); i += 1 }
      x
    }
    def finish(r: Array[Double]): Seq[Double] = r.toSeq
    def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  def elementwiseMin(dim: Int)(c: Column): Column =
    udaf(new ElementwiseMin(dim), longSeqEnc).apply(c)

  def elementwiseSum(dim: Int)(c: Column): Column =
    udaf(new ElementwiseSum(dim), longSeqEnc).apply(c)

  def elementwiseSumDouble(dim: Int)(c: Column): Column =
    udaf(new ElementwiseSumDouble(dim), ExpressionEncoder[Seq[Double]]()).apply(c)
}
