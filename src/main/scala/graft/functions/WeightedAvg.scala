package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** UDAF surface demo (SURVEY.md §2B capability matrix): a typed
  * `Aggregator[IN, BUF, OUT]` computing a weighted average, registrable via
  * `functions.udaf` for both Column and SQL use. The buffer is a pair of
  * running sums, so the merge is associative/commutative — safe under any
  * partitioning (partial aggregation + shuffle + final merge). */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) Double.NaN else b._1 / b._2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: weighted_avg(value, weight). */
  def weighted_avg(value: Column, weight: Column): Column =
    udaf(WeightedAvg).apply(value, weight)

  /** SQL registration (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("weighted_avg", udaf(WeightedAvg))
}
