package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Accumulator-style aggregate contract.
  *
  * Mirrors the reference's `IAggregateOperator<TIn,TAgg,TOut>`
  * (FlinkDotNet.Core.Abstractions/Operators/IAggregateOperator.cs:18-50):
  * `CreateAccumulator/Add/GetResult/Merge`. `merge` is what makes the
  * aggregate distributable — Spark runs `add` map-side (partial aggregate)
  * and `merge` after the shuffle, exactly the split the reference documents
  * for its distributed combine.
  */
trait AggregateFunction[IN, ACC, OUT] extends Serializable {
  def createAccumulator(): ACC
  def add(acc: ACC, value: IN): ACC
  def getResult(acc: ACC): OUT
  def merge(a: ACC, b: ACC): ACC
}

object AggregateFunction {

  /** Adapt to Spark's native `Aggregator` (zero/reduce/merge/finish — the
    * same four-method contract). The resulting Aggregator participates in
    * whole-stage codegen'd HashAggregate with map-side partials.
    */
  def toAggregator[IN, ACC, OUT](f: AggregateFunction[IN, ACC, OUT])(
      implicit accEnc: Encoder[ACC], outEnc: Encoder[OUT]): Aggregator[IN, ACC, OUT] =
    new Aggregator[IN, ACC, OUT] {
      override def zero: ACC = f.createAccumulator()
      override def reduce(b: ACC, a: IN): ACC = f.add(b, a)
      override def merge(b1: ACC, b2: ACC): ACC = f.merge(b1, b2)
      override def finish(reduction: ACC): OUT = f.getResult(reduction)
      override def bufferEncoder: Encoder[ACC] = accEnc
      override def outputEncoder: Encoder[OUT] = outEnc
    }
}

/** Example UDAF on the reference contract: weighted average.
  * value = (measure, weight); result = sum(measure*weight)/sum(weight).
  */
class WeightedAvg extends AggregateFunction[(Double, Double), (Double, Double), Double] {
  override def createAccumulator(): (Double, Double) = (0.0, 0.0)
  override def add(acc: (Double, Double), v: (Double, Double)): (Double, Double) =
    (acc._1 + v._1 * v._2, acc._2 + v._2)
  override def getResult(acc: (Double, Double)): Double =
    if (acc._2 == 0.0) 0.0 else acc._1 / acc._2
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
}

object WeightedAvg {
  import org.apache.spark.sql.functions.udaf
  /** Column-form UDAF usable in `df.agg(...)`. */
  def columnUdaf: org.apache.spark.sql.expressions.UserDefinedFunction = {
    implicit val accEnc: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    implicit val outEnc: Encoder[Double] = Encoders.scalaDouble
    udaf(AggregateFunction.toAggregator(new WeightedAvg),
         Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
  }
}

/** Weighted average with an EXACT integer accumulator: measures are 2-dp
  * money held as cents in a Long, weights are integer-valued. Summation is
  * then order-independent (no FP drift between Spark's partial/final merge
  * tree and any other summation order), which is what lets a weighted
  * average be oracle-checked bit-for-bit. At 100 TB the Long bound holds to
  * ~9e16 cents·weight — far above any per-group total here; a production
  * variant would widen to DECIMAL the same way.
  */
class WeightedAvgExact extends AggregateFunction[(Double, Double), (Long, Long), Double] {
  override def createAccumulator(): (Long, Long) = (0L, 0L)
  override def add(acc: (Long, Long), v: (Double, Double)): (Long, Long) =
    (acc._1 + math.round(v._1 * 100) * math.round(v._2), acc._2 + math.round(v._2))
  override def getResult(acc: (Long, Long)): Double =
    if (acc._2 == 0L) 0.0 else (acc._1.toDouble / 100.0) / acc._2.toDouble
  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
}

object WeightedAvgExact {
  import org.apache.spark.sql.functions.udaf
  def columnUdaf: org.apache.spark.sql.expressions.UserDefinedFunction = {
    implicit val accEnc: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val outEnc: Encoder[Double] = Encoders.scalaDouble
    udaf(AggregateFunction.toAggregator(new WeightedAvgExact),
         Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
  }
}
