package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .withExtensions(new graft.functions.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.filter(l => l.contains("Window") || l.contains("Exchange") || l.contains("Sort")).foreach(println)
    spark.stop()
  }
}
