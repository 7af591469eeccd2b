package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Watermarked stream-stream interval join (the attribution shape: join
  * each left event to right events on the same key that arrive within
  * `within` AFTER it).
  *
  * Both sides carry a watermark and the join predicate bounds the right
  * timestamp to a finite interval after the left one, which is what lets
  * Spark expire buffered state on both sides — unbounded stream-stream
  * joins would otherwise keep every row forever. State size per executor
  * is O(events inside the watermark window), independent of stream
  * length: the 100 TB/day property. Inner joins emit on match; left-outer
  * joins additionally emit (left, null) once the watermark proves no
  * match can still arrive.
  */
object StreamJoin {

  /** `left ⋈ right ON key AND rightTs ∈ [leftTs, leftTs + within]`.
    * Columns are disambiguated with `l_`/`r_` prefixes in the output. */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, within).alias("l")
    val r = right.withWatermark(rightTs, within).alias("r")
    l.join(r,
      expr(s"""l.$key = r.$key AND
               |r.$rightTs >= l.$leftTs AND
               |r.$rightTs <= l.$leftTs + interval '$within'""".stripMargin),
      joinType)
  }
}
