package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.SparkSuite
import graft.core.{Tables => T}
import graft.functions.DotProduct.dot

/** ann_mips_topk's scale claim: the Neyshabur–Srebro augmentation
  * [x, √(M²−|x|²)] makes every corpus vector norm M, so cosine order
  * over the augmented corpus (probe augmented as [q, 0]) equals raw
  * inner-product order — the bridge that lets the library's cosine ANN
  * indexes serve MIPS. The first test runs the honest floating-point
  * path — cosine normalized by each augmented vector's COMPUTED norm,
  * which is only ulp-equal to M — and requires the identical neighbor
  * order per probe, not just the same set. */
class MipsReductionSpec extends SparkSuite {

  private def emb = T.embeddings(spark, sfDir).select(col("vec_id"),
    transform(col("embedding"), x => x.cast(DoubleType)).as("emb"))

  test("augmented-cosine ranking equals inner-product ranking per probe") {
    val e = emb
    val aug = Dedup.mipsAugment(e)
    val qRaw = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb").as("qv"))

    def order(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(r => (-r.getDouble(2), r.getLong(1)))
          .map(_.getLong(1)).toSeq).toMap

    val ip = order(e.crossJoin(broadcast(qRaw))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        dot(col("qv"), col("emb")).as("score")).collect())

    // the reduction path: probe [q, 0] against the augmented corpus,
    // scored as cosine with the COMPUTED per-vector norm (≈ M, ulp noise
    // and all — exactly what a cosine index would use)
    val qZero = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"),
        concat(col("emb"), array(lit(0.0))).as("qv"))
    val cos = order(aug.crossJoin(broadcast(qZero))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        (dot(col("qv"), col("aug")) /
          sqrt(dot(col("aug"), col("aug")))).as("score")).collect())

    assert(ip.keySet == cos.keySet && ip.nonEmpty)
    ip.foreach { case (qid, want) =>
      assert(cos(qid) == want, s"probe $qid diverged: " +
        s"ip=${want.take(8)} cos=${cos(qid).take(8)}")
    }
  }

  test("every augmented corpus vector has the max norm, up to ulps") {
    val norms = Dedup.mipsAugment(emb)
      .select(dot(col("aug"), col("aug")).as("n2"))
      .agg(min(col("n2")).as("lo"), max(col("n2")).as("hi"))
      .collect().head
    assert(math.abs(norms.getDouble(0) - norms.getDouble(1)) < 1e-6,
      s"augmented norms not constant: ${norms.getDouble(0)} vs ${norms.getDouble(1)}")
  }
}
