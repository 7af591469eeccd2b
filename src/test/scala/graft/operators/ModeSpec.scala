package graft.operators

import graft.{SparkEntry, SparkSuite}

/** q61_mode semantics on hand-built data: the tie-break is (count DESC,
  * value ASC) — pinned here because neither engine's built-in mode()
  * guarantees it, which is the whole reason the operator computes the
  * rank explicitly. */
class ModeSpec extends SparkSuite {
  import spark.implicits._

  test("mode tie-break: equal counts resolve to the LOWER value") {
    val dir = graft.core.Fixtures.path("modespec")
    // group (A,X): values 2,2,1,1 — tie at count 2, mode must be 1;
    // group (B,Y): values 3,3,3,1 — clear mode 3 with count 3 of 4
    Seq(
      ("A", "X", 2), ("A", "X", 2), ("A", "X", 1), ("A", "X", 1),
      ("B", "Y", 3), ("B", "Y", 3), ("B", "Y", 3), ("B", "Y", 1))
      .toDF("l_returnflag", "l_linestatus", "l_linenumber")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q61_mode")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(("A", "X", 1L, 2L, 4L), ("B", "Y", 3L, 3L, 4L)), got)
  }
}
