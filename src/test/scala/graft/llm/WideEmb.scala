package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared deterministic dim-1024 embeddings fixture (10 labels, 200
  * vectors, pure index arithmetic) — used by WideDimSpec's guard stress
  * and AnnRecallSpec's parameterized-IVF grade. Built once per JVM. */
object WideEmb {
  val Dim = 1024

  @volatile private var built: String = _

  def dir(spark: SparkSession): String = synchronized {
    if (built == null) {
      import spark.implicits._
      val d = graft.core.Fixtures.path(s"dim$Dim")
      val rows = (0L until 200L).map { id =>
        val emb = Array.tabulate(Dim) { i =>
          (((id * 131 + i * 17 + 7) % 97) - 48).toFloat / 10.0f
        }
        (id, emb, (id % 10).toInt)
      }
      rows.toDF("vec_id", "embedding", "label")
        .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      built = d
    }
    built
  }
}
