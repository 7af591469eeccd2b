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

  /** Deterministic cluster-structured embeddings: `n` vectors in
    * `clusters` groups (vec_id % clusters), each a shared center plus
    * per-vector noise scaled so within-cluster cosine sits around 0.92 —
    * the near-neighbor structure a real model's embeddings have, which
    * the flat fixture above (pure hash noise) lacks entirely. LSH/IVF
    * recall is only a meaningful grade against this kind of corpus. */
  private def clustered(spark: SparkSession, name: String, n: Long,
      clusters: Int): String = {
    import spark.implicits._
    val d = graft.core.Fixtures.path(name)
    val rows = (0L until n).map { id =>
      val c = (id % clusters).toInt
      val emb = Array.tabulate(Dim) { i =>
        val center = (((c * 9176L + i * 37L + 11L) % 193L) - 96L) / 10.0f
        val noise = (((id * 131L + i * 17L + 7L) % 23L) - 11L) / 4.0f
        center + noise
      }
      (id, emb, c)
    }
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  @volatile private var builtClustered: String = _

  /** 1000 vectors / 10 clusters: the planes=8 LSH recall gate. */
  def clusteredDir(spark: SparkSession): String = synchronized {
    if (builtClustered == null)
      builtClustered = clustered(spark, s"dim${Dim}c", 1000L, 10)
    builtClustered
  }

  @volatile private var builtBig: String = _

  /** 20k vectors / 100 clusters (sf1-scale corpus at model dim): the
    * realistic-nlist IVF sweep (k=64, nprobe=4). */
  def bigClusteredDir(spark: SparkSession): String = synchronized {
    if (builtBig == null)
      builtBig = clustered(spark, s"dim${Dim}big", 20000L, 100)
    builtBig
  }
}
