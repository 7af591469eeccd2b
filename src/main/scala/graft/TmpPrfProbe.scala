package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    val dsh = Dedup.ShingleHashMemo.table(spark, d)
      .select(col("doc_id"), col("shh").as("sh")).distinct().cache()
    t("dsh-distinct") { println("COUNT dsh " + dsh.count()) }
    val sizes = dsh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val dfT = dsh.groupBy("sh").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
    var pref: org.apache.spark.sql.DataFrame = null
    t("prefix-window") {
      pref = dsh.join(dfT, Seq("sh"))
        .withColumn("rn", row_number().over(w))
        .join(sizes, Seq("doc_id"))
        .filter(col("rn") <= col("nsh") / 2 + 1)
        .select(col("doc_id"), col("sh"), col("nsh"), col("rn"))
        .cache()
      println("COUNT pref " + pref.count())
    }
    var cand: org.apache.spark.sql.DataFrame = null
    t("cand-join") {
      cand = pref.select(col("doc_id").as("doc_a"), col("sh"),
          col("nsh").as("na"), col("rn").as("ra"))
        .join(pref.select(col("doc_id").as("doc_b"), col("sh"),
          col("nsh").as("nb"), col("rn").as("rb")), Seq("sh"))
        .filter(col("doc_a") < col("doc_b") &&
          col("nb") <= col("na") * 2 && col("na") <= col("nb") * 2 &&
          (lit(1) + least(col("na") - col("ra"), col("nb") - col("rb"))) * 3 >=
            col("na") + col("nb"))
        .select("doc_a", "doc_b").distinct().cache()
      println("COUNT cand " + cand.count())
    }
    t("verify-join") {
      val inter = cand
        .join(dsh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
        .join(dsh.select(col("doc_id").as("doc_b"), col("sh")),
          Seq("doc_b", "sh"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
      println("COUNT verified " + inter.count())
    }
    t("full-query") {
      graft.SparkEntry.queries("dedup_prefix_filter")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
