package graft

import org.apache.spark.sql.functions._

/** The composed curation pipeline must preserve each stage's contract
  * when the stages are chained — containment through the funnel, zero
  * duplicate fingerprints in the output, split purity, bin capacity —
  * and reproduce itself exactly on a re-run. */
class CurationDemoSpec extends SparkSuite {

  // sf0.1: the only fixture scale with exact-duplicate groups, so
  // the dedup stage of the funnel has real work to do (4992/5000 fps)
  private val demoSf = "/root/testdata/sf0.1"

  test("filter -> dedup -> select -> split -> pack holds its invariants") {
    val r = CurationDemo.run(spark, demoSf)
    val rows = r.selected.collect()
    assert(rows.nonEmpty && r.nSelected > 0)

    // funnel shrinks monotonically and every stage really cut something
    assert(r.nGopherKept < r.nDocs, "gopher battery rubber-stamped")
    assert(r.nSurvivors < r.nDocs, "no duplicate groups collapsed")
    assert(r.nSelected <= math.min(r.nGopherKept, 100L))

    // containment: every selected doc passed the rule battery AND is its
    // group's canonical survivor AND made the DSIR top slice
    val kept = SparkEntry.queries("curate_gopher_rules")(spark, demoSf)
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    val surv = SparkEntry.queries("dedup_canonical")(spark, demoSf)
      .select("keep_doc").collect().map(_.getLong(0)).toSet
    val dsir = SparkEntry.queries("sample_importance")(spark, demoSf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      assert(kept(id) && surv(id) && dsir(id), s"doc $id skipped a stage")
    }

    // dedup contract survives composition: one row per fingerprint
    val fps = rows.map(_.getAs[String]("fp"))
    assert(fps.distinct.length === fps.length, "duplicate fp in output")

    // packing: bin ids derive exactly from the exclusive token prefix,
    // prefixes are gapless per split, and bins form a contiguous range
    rows.groupBy(_.getAs[String]("split")).foreach { case (split, members) =>
      val sorted = members.sortBy(_.getAs[Long]("cum_tokens"))
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(b.getAs[Long]("cum_tokens") ===
          a.getAs[Long]("cum_tokens") + b.getAs[Long]("n_words"),
          s"broken token prefix in split $split")
      }
      sorted.foreach { row =>
        val start = row.getAs[Long]("cum_tokens") - row.getAs[Long]("n_words")
        assert(row.getAs[Long]("bin") === start / 512L,
          s"bin desynced from prefix in split $split")
      }
      val bins = sorted.map(_.getAs[Long]("bin")).distinct.toSeq
      assert(bins === (0L to bins.max).toSeq,
        s"bin holes in split $split: $bins")
    }

    // split purity: membership matches the graded splitter exactly
    val splitOf = SparkEntry.queries("sample_hash_split")(spark, demoSf)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { row =>
      assert(row.getAs[String]("split") ===
        splitOf(row.getAs[Long]("doc_id")))
    }

    // determinism: full re-run reproduces the packed output exactly
    val again = CurationDemo.run(spark, demoSf).selected
      .orderBy("split", "bin", "doc_id").collect().toSeq
    assert(r.selected.orderBy("split", "bin", "doc_id").collect().toSeq
      === again)
  }
}
