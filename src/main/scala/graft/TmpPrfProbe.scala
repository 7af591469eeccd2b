package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

object TmpPrfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/repo/target/sf1"
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val tf = TextStats.termFreqsMemo(spark, d)
    val (dl, st, df_, qidf) = TextStats.Bm25ModelMemo.parts(spark, d)
    t("warm-everything") { tf.count(); dl.count(); df_.count(); qidf.count() }
    val fw = Window.partitionBy(col("q_doc"))
      .orderBy(col("score_dec").desc, col("doc_id"))
    var fb: org.apache.spark.sql.DataFrame = null
    t("fb-top3") {
      fb = TextStats.bm25Scores(spark, d)
        .withColumn("rn", row_number().over(fw)).filter(col("rn") <= 3)
        .select(col("q_doc"), col("doc_id"))
      fb.count()
    }
    val ew = Window.partitionBy(col("q_doc"))
      .orderBy(col("escore").desc, col("wh"))
    var expTerms: org.apache.spark.sql.DataFrame = null
    t("mining") {
      expTerms = tf.join(broadcast(fb), Seq("doc_id"))
        .groupBy(col("q_doc"), col("wh")).agg(sum(col("c")).as("fc"))
        .join(df_, Seq("wh")).crossJoin(broadcast(st.select(col("n_docs"))))
        .withColumn("idf",
          log((((col("n_docs") - col("df")).cast(DoubleType) + 0.5) /
            (col("df").cast(DoubleType) + 0.5)) + 1.0)
            .cast(DecimalType(18, 6)))
        .withColumn("escore", col("idf") * col("fc").cast(DecimalType(18, 0)))
        .join(qidf.select(col("q_doc"), col("wh")), Seq("q_doc", "wh"),
          "left_anti")
        .withColumn("ern", row_number().over(ew))
        .filter(col("ern") <= 2)
        .select(col("q_doc"), col("wh"), col("idf"))
      expTerms.count()
    }
    val rw = Window.partitionBy(col("q_doc"))
      .orderBy(col("score_dec").desc, col("doc_id"))
    t("final-score") {
      TextStats.bm25Score(tf, qidf.unionByName(expTerms), dl,
          st.select(col("avgdl")))
        .withColumn("rn", row_number().over(rw).cast(LongType))
        .filter(col("rn") <= 10)
        .write.format("noop").mode("overwrite").save()
    }
    locally { val x = TextStats.bm25Scores(spark, d).withColumn("rn", row_number().over(fw)).filter(col("rn") <= 3)
      x.collect()
      val pl = x.queryExecution.executedPlan.toString
      println("PLAN-HAS-WGL " + pl.contains("WindowGroupLimit"))
      pl.split("\n").filter(l => l.contains("Window") || l.contains("Sort") || l.contains("Exchange")).foreach(l => println("PLANLINE " + l.take(150))) }
    spark.stop()
  }
}
