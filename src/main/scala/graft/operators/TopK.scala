package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._

/** Two-phase top-k — the 100 TB replacement for `Window + row_number +
  * filter` (SURVEY.md §4.2, §7.4 item 6).
  *
  * The window form shuffles EVERY row to its key's partition and sorts the
  * whole partition; at extreme skew one hot key's rows all land on one
  * task. This utility instead keeps a bounded per-key heap inside each
  * input partition (map-side: at most k rows per key per partition
  * survive), then resolves the global top-k per key on the much smaller
  * union — the same partial/final split Spark uses for aggregates, applied
  * to ranking.
  */
object TopK {

  /** Global-or-per-key top-k by `ord` descending (ties broken by the
    * ordering itself — pass a total order for determinism). `keyCols`
    * empty → global top-k. */
  def perKey(df: DataFrame, keyCols: Seq[String], ordCol: String, k: Int): DataFrame = {
    val schema = df.schema
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(schema))
    val keyIdx = keyCols.map(schema.fieldIndex)
    val ordIdx = schema.fieldIndex(ordCol)
    // numeric-generic, null-safe: nulls sort lowest (never enter a top-k
    // unless fewer than k non-null rows exist)
    val rowOrd: Ordering[Row] = Ordering.by((r: Row) =>
      if (r.isNullAt(ordIdx)) Double.NegativeInfinity
      else r.getAs[Number](ordIdx).doubleValue())

    def partialTopK(rows: Iterator[Row]): Iterator[Row] = {
      val heaps = mutable.Map.empty[Seq[Any], mutable.PriorityQueue[Row]]
      rows.foreach { r =>
        val key = keyIdx.map(r.get)
        // min-heap of size k: keep the k largest
        val h = heaps.getOrElseUpdate(key,
          mutable.PriorityQueue.empty[Row](rowOrd.reverse))
        if (h.size < k) h.enqueue(r)
        else if (rowOrd.compare(r, h.head) > 0) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }

    // phase 1: bounded per-partition survivors; phase 2: exact resolve on
    // the shrunken set (window over <= k * numPartitions rows per key)
    val survivors = df.mapPartitions(partialTopK)(enc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol).desc)
    survivors
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
