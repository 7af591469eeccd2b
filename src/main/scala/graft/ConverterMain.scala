package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Drop-in replacement for the reference batch job
  * (/root/reference/scripts/spark_converter.py): TSV scan with header and
  * NO type inference → groupBy(product_category).count() → show →
  * repartition(10) → Parquet overwrite, with the same two-arg CLI and
  * usage check (spark_converter.py:5-16).
  *
  * Usage: `runMain graft.ConverterMain <input_tsv_dir> <output_parquet_dir>`
  * (or spark-submit with the assembled jar on a cluster).
  */
object ConverterMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("Usage: ConverterMain <input_location> <output_location>")
      sys.exit(1)
    }
    val Array(input, output) = args
    // spark-submit injects spark.master; default to local[*] otherwise
    val base = SparkSession.builder()
    val withMaster =
      if (sys.props.contains("spark.master")) base else base.master("local[*]")
    val spark = withMaster
      .appName("SparkConverter")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

    val df = spark.read
      .option("sep", "\t")
      .option("header", "true") // names from header, all columns string
      .csv(input)

    // "calculates total number of product category" (README.md:158)
    df.groupBy("product_category").count().show()

    // "Repartition for multiple output files" (spark_converter.py:30-31)
    df.repartition(10).write.mode(SaveMode.Overwrite).parquet(output)

    spark.stop()
  }
}
