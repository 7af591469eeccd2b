package graft

import org.apache.spark.sql.SparkSession

/** One-question measurement main (VERDICT r14 #5): at which corpus
  * multiple does the PERSISTED postings index ([[graft.llm.PostingsIndex]])
  * beat the inline `text_bm25` recompute?
  *
  * Prints one JSON line per run:
  * `{"sf":…,"inline_sec":…,"search_sec":…,"build_sec":…,"crossover_queries":…}`
  *
  * - `inline_sec`: the graded query (re-derives postings from the corpus
  *   every run), min of 2 executions.
  * - `search_sec`: query terms + search over the ALREADY-BUILT index,
  *   min of 2 (the steady-state cost a deployment pays per query batch).
  * - `build_sec`: one index build — amortized over every future search.
  * - `crossover_queries`: build / (inline − search) — how many query
  *   batches until the index has paid for itself (negative/inf when the
  *   inline path is still cheaper per batch, i.e. below the crossover).
  *
  * Run: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.BmCrossover"`.
  * Results recorded in SCALING.md's BM25 row.
  */
object BmCrossover {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warm-up

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def minOf2(f: => Unit): Double = {
      val a = timed(f); graft.core.Release.storage(spark)
      val b = timed(f); graft.core.Release.storage(spark)
      math.min(a, b)
    }

    val inline = minOf2(
      SparkEntry.queries("text_bm25")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())

    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_bm_crossover").toString
    val build = timed(graft.llm.PostingsIndex.build(spark, sfDir, idxDir))
    val search = minOf2 {
      val q = graft.llm.PostingsIndex.probeQueryTerms(spark, idxDir)
      graft.llm.PostingsIndex.search(spark, idxDir, q)
        .write.format("noop").mode("overwrite").save()
    }
    // the marginal per-batch cost a deployment actually pays: query
    // terms arrive WITH the query (they are not mined from the corpus),
    // so time the search alone over a pre-collected term table
    val qRows = graft.llm.PostingsIndex.probeQueryTerms(spark, idxDir)
      .collect()
    val qSchema = graft.llm.PostingsIndex.probeQueryTerms(spark, idxDir).schema
    val qFixed = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(qRows: _*)), qSchema)
    val searchOnly = minOf2(
      graft.llm.PostingsIndex.search(spark, idxDir, qFixed)
        .write.format("noop").mode("overwrite").save())
    graft.streaming.CommitFiles.rmTree(new java.io.File(idxDir))

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val cross =
      if (inline > search) num(build / (inline - search)) else "null"
    println(s"""{"sf":"$sfDir","inline_sec":${num(inline)},""" +
      s""""search_sec":${num(search)},"search_only_sec":${num(searchOnly)},""" +
      s""""build_sec":${num(build)},"crossover_queries":$cross}""")
    spark.stop()
  }
}
