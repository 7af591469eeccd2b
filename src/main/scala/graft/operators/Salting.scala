package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting recipe for hot join keys (SURVEY.md §4.2 / §7.4 item 6).
  *
  * AQE's OptimizeSkewedJoin splits oversized shuffle blocks at runtime, but
  * only for sort-merge joins and only post-shuffle; pre-salting is the
  * planned fix when one key is known-hot (the Q06 shape: one customer with
  * millions of orders). The fact side gets a random salt in [0, n); the dim
  * side is exploded n× so every salted fact key finds its match. The join
  * key becomes (key, salt) — the hot key's rows spread over n tasks.
  */
object Salting {

  /** Salt the (large, skewed) fact side: adds `__salt`.
    *
    * The salt is a DETERMINISTIC hash of the whole row, not rand(): a
    * random salt is re-evaluated on task retry, so a re-run map task can
    * emit a row under a different (key, salt) than the one a reducer
    * already consumed — duplicating or dropping rows exactly in the
    * distributed setting salting targets. Row-content hashing spreads a
    * hot key just as well (its rows differ in their other columns) and is
    * stable under recomputation. */
  def saltFact(fact: DataFrame, n: Int): DataFrame =
    fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(n)))

  /** Replicate the (small) dim side across all salt values: adds `__salt`. */
  def replicateDim(dim: DataFrame, n: Int): DataFrame =
    dim.withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))

  /** Salted equi-join on `keys` (+ the salt), dropping the salt after. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      n: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would surface the n-way dim replication as spurious
    // null-padded rows — only fact-preserving join types are salt-safe
    require(Set("inner", "left", "left_outer", "leftouter")(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val f = saltFact(fact, n)
    val d = replicateDim(dim, n)
    f.join(d, keys :+ "__salt", joinType).drop("__salt")
  }
}
