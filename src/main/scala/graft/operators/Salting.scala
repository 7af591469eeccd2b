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
    * The salt is a DETERMINISTIC hash of the row's hashable columns, not
    * rand(): a random salt is re-evaluated on task retry, so a re-run map
    * task can emit a row under a different (key, salt) than the one a
    * reducer already consumed — duplicating or dropping rows exactly in
    * the distributed setting salting targets. Row-content hashing spreads
    * a hot key just as well (its rows differ in their other columns) and
    * is stable under recomputation. Map-typed columns are excluded —
    * `hash()` rejects them (map equality is order-ambiguous) and the
    * remaining columns carry the spread. Known limit: rows identical in
    * EVERY hashable column share a salt; content-determinism makes that
    * unavoidable, and it only bites when a hot key's rows are also
    * byte-identical duplicates (dedup upstream in that case). */
  def saltFact(fact: DataFrame, n: Int): DataFrame = {
    val hashable = fact.schema.fields.filter { f =>
      def ok(t: org.apache.spark.sql.types.DataType): Boolean = t match {
        case _: org.apache.spark.sql.types.MapType => false
        case s: org.apache.spark.sql.types.StructType => s.fields.map(_.dataType).forall(ok)
        case a: org.apache.spark.sql.types.ArrayType => ok(a.elementType)
        case _ => true
      }
      ok(f.dataType)
    }.map(f => col(f.name)).toSeq
    require(hashable.nonEmpty, "saltFact: no hashable columns to derive a salt from")
    fact.withColumn("__salt", pmod(hash(hashable: _*), lit(n)))
  }

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
