package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** r16 focused pin for the jaccard pair-generation rewrite: the
  * per-shingle sorted-array transform must emit exactly the rows of the
  * reference a⋈b self-join it replaced — including at the df-cap
  * boundary (a shingle shared by exactly 50 docs still pairs; 51 is a
  * stop shingle and pairs nobody) and for docs whose only overlap is a
  * stop shingle (no pair row at all, not a zero row). */
class PairGenSpec extends SparkSuite {

  test("array pair generation equals the reference self-join at the cap boundary") {
    import spark.implicits._
    // synthetic capped-set rows (doc_id, sh): shingle 100 shared by 50
    // docs (cap-kept), 200 by 51 (stop), 300 by 2, 400 by 1 (no pair)
    val rows =
      (1L to 50L).map(d => (d, 100L)) ++
        (1L to 51L).map(d => (d, 200L)) ++
        Seq((7L, 300L), (9L, 300L), (3L, 400L))
    val dsh = rows.toDF("doc_id", "sh")
    val dfc = dsh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 50).select("sh")
    val kept = dsh.join(dfc, Seq("sh"))

    val reference = kept.select(col("doc_id").as("doc_a"), col("sh"))
      .join(kept.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))

    val viaArrays = kept.groupBy(col("sh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds) - i - 1),
          |    y -> struct(x AS doc_a, y AS doc_b))))""".stripMargin)).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))

    val ref = reference.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val arr = viaArrays.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(arr == ref)
    // the cap-kept 50-doc shingle contributes C(50,2) pairs; the 51-doc
    // stop shingle none; (7,9) share exactly shingle 300
    assert(ref.size == 50 * 49 / 2)
    assert(ref.contains((7L, 9L, 2L))) // shingles 100 AND 300
  }
}
