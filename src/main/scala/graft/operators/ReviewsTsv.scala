package graft.operators

import java.nio.file.{Files, Paths}

/** Deterministic reviews-shaped TSV fixture (FIXTURES.md §3) for the
  * reference batch-job replica (Q02): same header as the public Amazon
  * reviews TSV the reference consumes (/root/reference/README.md:157-167),
  * read with header=true and NO type inference so every column is a string
  * (/root/reference/scripts/spark_converter.py:25). Content is a fixed
  * function of the row index — byte-identical on every run, so both Spark
  * and the DuckDB oracle read the same file. */
object ReviewsTsv {
  val path: String = graft.core.Fixtures.path("reviews.tsv")

  private val header = Seq(
    "marketplace", "customer_id", "review_id", "product_id", "product_parent",
    "product_title", "product_category", "star_rating", "helpful_votes",
    "total_votes", "vine", "verified_purchase", "review_headline",
    "review_body", "review_date")

  private val categories = Seq(
    "Books", "Electronics", "Home", "Toys", "Video_Games", "Books",
    "Electronics", "Books")

  def ensure(): String = synchronized {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    val rows = (0 until 120).map { i =>
      val cat = categories(i % categories.length)
      Seq(
        "US", s"C$i", s"R$i", s"P${i % 37}", s"${i * 7 % 100}",
        s"product title $i", cat, s"${i % 5 + 1}", s"${i % 13}", s"${i % 17}",
        if (i % 9 == 0) "Y" else "N", if (i % 2 == 0) "Y" else "N",
        s"headline $i", s"review body text $i",
        f"2015-${i % 12 + 1}%02d-${i % 28 + 1}%02d")
    }
    Files.writeString(p,
      (header +: rows).map(_.mkString("\t")).mkString("\n") + "\n")
    path
  }
}
