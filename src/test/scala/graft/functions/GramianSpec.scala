package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** `gramian` (functions/Gramian.scala): the one-pass moments buffer must
  * reproduce the pair-explode formulation it replaced — including the
  * ragged-array and null-component corners the explode got for free from
  * SQL semantics — and fail loudly on overflow and over-wide input. */
class GramianSpec extends SparkSuite {

  private val arrTy = ArrayType(LongType, containsNull = true)
  private val schema = StructType(Seq(StructField("qa", arrTy, nullable = true)))

  private def df(rows: Seq[Seq[java.lang.Long]]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r)), 3), schema)

  /** The explode-path reference: (j, tj, n) and (j, k, s) exactly as
    * EmbPca's former moments() computed them. */
  private def reference(rows: Seq[Seq[java.lang.Long]])
      : (Map[Int, (Option[Long], Long)], Map[(Int, Int), Option[Long]]) = {
    val sums = rows.flatMap(_.zipWithIndex).groupBy(_._2).map { case (j, vs) =>
      val nn = vs.flatMap(v => Option(v._1).map(_.longValue))
      j -> (if (nn.isEmpty) None else Some(nn.sum), vs.size.toLong)
    }
    val pairs = rows.flatMap { r =>
      for (j <- r.indices; k <- j until r.size)
        yield ((j, k), (Option(r(j)), Option(r(k))))
    }.groupBy(_._1).map { case (jk, ps) =>
      val prods = ps.collect { case (_, (Some(a), Some(b))) => a.longValue * b.longValue }
      jk -> (if (prods.isEmpty) None else Some(prods.sum))
    }
    (sums, pairs)
  }

  private def unpack(row: Row): (Map[Int, (Option[Long], Long)], Map[(Int, Int), Option[Long]]) = {
    val g = row.getStruct(0)
    val d = g.getInt(0)
    val nj = g.getSeq[Long](1)
    val tj = g.getSeq[Any](2)
    val s = g.getSeq[Any](3)
    val sums = (0 until d).filter(nj(_) > 0).map { j =>
      j -> (Option(tj(j)).map(_.asInstanceOf[Long]), nj(j))
    }.toMap
    val pairs = (for (k <- 0 until d; if nj(k) > 0; j <- 0 to k)
      yield (j, k) -> Option(s(k * (k + 1) / 2 + j)).map(_.asInstanceOf[Long])).toMap
    (sums, pairs)
  }

  private def check(rows: Seq[Seq[java.lang.Long]]): Unit = {
    val got = unpack(df(rows)
      .agg(GramianAgg.gramian(col("qa"), 64).as("g")).collect().head)
    assert(got == reference(rows))
  }

  test("dense fixed-dim arrays match the explode reference") {
    check(Seq(Seq(1L, 2L, 3L), Seq(-4L, 5L, 6L), Seq(7L, -8L, 9L),
      Seq(10L, 11L, -12L), Seq(0L, 0L, 0L)).map(_.map(Long.box)))
  }

  test("ragged arrays: pairs exist only where they co-occurred") {
    // dims 1, 3, 5 — pair (3,4) exists only via the third row; position
    // counts n differ per dim
    check(Seq(Seq(2L).map(Long.box),
      Seq(1L, -1L, 4L).map(Long.box),
      Seq(3L, 2L, -5L, 7L, 1L).map(Long.box)))
    // the buffer must emit NO pair rows beyond any row's length: the
    // reference map's key set is checked by equality above
  }

  test("null components count toward n but not toward sums or products") {
    check(Seq(
      Seq[java.lang.Long](1L, null, 3L),
      Seq[java.lang.Long](null, null, 5L),
      Seq[java.lang.Long](2L, 4L, null)))
  }

  test("an all-null position yields SQL NULL, exactly like sum() over nulls") {
    // position 1 is null in every row: tj(1) and every s(., 1) product
    // through it must be NULL, not 0
    check(Seq(
      Seq[java.lang.Long](1L, null, 3L),
      Seq[java.lang.Long](2L, null, 5L)))
  }

  test("empty input evaluates to the d = 0 buffer, not a crash") {
    val row = df(Nil).agg(GramianAgg.gramian(col("qa"), 64).as("g"))
      .collect().head.getStruct(0)
    assert(row.getInt(0) == 0)
    assert(row.getSeq[Long](1).isEmpty)
  }

  test("serialize/deserialize round-trips partials across a repartition") {
    // force many partitions so partial buffers genuinely merge through
    // the serialized path
    val rows = (0 until 200).map(i =>
      Seq(Long.box(i.toLong % 13 - 6), Long.box(i.toLong % 7), Long.box(i.toLong)))
    val one = unpack(df(rows).coalesce(1)
      .agg(GramianAgg.gramian(col("qa"), 64).as("g")).collect().head)
    val many = unpack(df(rows).repartition(16)
      .agg(GramianAgg.gramian(col("qa"), 64).as("g")).collect().head)
    assert(one == many)
  }

  test("long overflow fails loudly, never wraps") {
    val big = Seq(Seq(Long.box(3037000500L)), Seq(Long.box(3037000500L)))
    val e = intercept[Exception] {
      df(big).agg(GramianAgg.gramian(col("qa"), 64)).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("; ")
    assert(msgs.contains("overflow"), msgs)
  }

  test("dim past maxDim fails loudly, never truncates") {
    val wide = Seq(Seq.fill(65)(Long.box(1L)))
    val e = intercept[Exception] {
      df(wide).agg(GramianAgg.gramian(col("qa"), 64)).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("; ")
    assert(msgs.contains("exceeds maxDim"), msgs)
  }
}
