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

  /** Global-or-per-key top-k by `ord` descending. Ties at the k-th rank
    * are resolved arbitrarily (whichever tied row a partition saw first /
    * whichever the final window emits) — callers needing reproducible
    * rows at ties must disambiguate ordCol BEFORE calling (e.g. pack a
    * tiebreaker into it). `keyCols` empty → global top-k. */
  def perKey(df: DataFrame, keyCols: Seq[String], ordCol: String, k: Int): DataFrame = {
    val schema = df.schema
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(schema))
    val keyIdx = keyCols.map(schema.fieldIndex)
    val ordIdx = schema.fieldIndex(ordCol)
    // null-safe exact ordering on the column's own type — comparing via
    // doubleValue() collapses distinct longs/decimals past 2^53 and the
    // phase-1 heap could then evict the true maximum before the exact
    // phase-2 window ever sees it; nulls sort lowest (never enter a
    // top-k unless fewer than k non-null rows exist)
    val rowOrd: Ordering[Row] = new Ordering[Row] {
      private def cmpValues(a: Any, b: Any): Int = (a, b) match {
        case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
        case (x: java.lang.Integer, y: java.lang.Integer) => x.compareTo(y)
        case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
        case (x: BigDecimal, y: BigDecimal) => x.compare(y)
        case (x: Number, y: Number) =>
          java.lang.Double.compare(x.doubleValue(), y.doubleValue())
        case (x: Comparable[_], y) =>
          x.asInstanceOf[Comparable[Any]].compareTo(y)
        case _ => throw new IllegalArgumentException(
          s"topk: unorderable ord values $a / $b")
      }
      def compare(r1: Row, r2: Row): Int = {
        val (n1, n2) = (r1.isNullAt(ordIdx), r2.isNullAt(ordIdx))
        if (n1 && n2) 0
        else if (n1) -1
        else if (n2) 1
        else cmpValues(r1.get(ordIdx), r2.get(ordIdx))
      }
    }

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
