package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink surface (SURVEY.md §7.1 io/): Parquet overwrite with explicit file
  * count (the reference's repartition(10) layout, R4/R5), partitioned
  * layout for partition-pruned scans, and bucketed tables for co-located
  * (shuffle-free) joins at scale. */
object Writers {

  /** The reference sink verbatim: round-robin to `n` files, overwrite
    * (/root/reference/scripts/spark_converter.py:31). */
  def parquetOverwrite(df: DataFrame, path: String, numFiles: Int = 10): Unit =
    df.repartition(numFiles).write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned layout: scans filtered on `partitionCols`
    * prune directories instead of reading them (PartitionFilters). */
  def parquetPartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed + sorted table: two tables bucketed the same way join
    * without a shuffle (the pre-partitioning story for repeated big-big
    * joins at 100 TB). Requires saveAsTable (bucket metadata lives in the
    * catalog). */
  def parquetBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int,
      path: String = "target/graft-warehouse"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", s"$path/$table")
      .format("parquet")
      .saveAsTable(table)
}
