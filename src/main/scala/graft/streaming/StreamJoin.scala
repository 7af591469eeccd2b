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
    * Columns are disambiguated with `l_`/`r_` prefixes in the output.
    *
    * `lateness` is the allowed event-time disorder (the watermark delay)
    * and is a SEPARATE knob from the match interval: rows arriving later
    * than the watermark are dropped even when they satisfy the interval
    * predicate, so a right stream with cross-stream skew beyond `within`
    * needs a larger lateness or matches silently vanish (left-outer
    * would emit null-padded rows for them). Defaults to `within` — the
    * in-order-arrival assumption — for callers without skew. */
  def intervalJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String,
      joinType: String = "inner", lateness: Option[String] = None): DataFrame = {
    val wm = lateness.getOrElse(within)
    val l = left.withWatermark(leftTs, wm).alias("l")
    val r = right.withWatermark(rightTs, wm).alias("r")
    l.join(r,
      expr(s"""l.$key = r.$key AND
               |r.$rightTs >= l.$leftTs AND
               |r.$rightTs <= l.$leftTs + interval '$within'""".stripMargin),
      joinType)
  }
}
