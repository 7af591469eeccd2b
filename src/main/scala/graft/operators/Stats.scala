package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{sqrt, when}

/** Engine-parity-critical closed forms shared by q33 and the profiler.
  *
  * The operand ORDER in these expressions is load-bearing: every IEEE
  * step must be written identically in the oracle SQL, so the formula
  * lives in exactly one place on the Scala side (and each query's SQL
  * mirrors it verbatim). */
object Stats {

  /** Guarded Pearson r from power sums: null (not a divide-by-zero) for
    * n ≤ 1 or zero-variance series. All inputs are doubles derived from
    * exact sums; the expression is a pinned left-to-right IEEE chain. */
  def pearson(n: Column, sx: Column, sx2: Column,
      sy: Column, sy2: Column, sxy: Column): Column = {
    val dx = n * sx2 - sx * sx
    val dy = n * sy2 - sy * sy
    when(dx > 0 && dy > 0,
      (n * sxy - sx * sy) / (sqrt(dx) * sqrt(dy)))
  }

  /** Guarded OLS slope of y on x from power sums — same parity contract
    * as [[pearson]]: null for a zero-variance x (a single rank), one
    * pinned IEEE chain otherwise. */
  def olsSlope(n: Column, sx: Column, sx2: Column,
      sy: Column, sxy: Column): Column = {
    val dx = n * sx2 - sx * sx
    when(dx > 0, (n * sxy - sx * sy) / dx)
  }
}
