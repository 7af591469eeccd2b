package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSuite

class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("interleave matches a naive bit-by-bit reference") {
    def ref(a: Long, b: Long): Long =
      (0 until 16).map { i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val cases = Gen.listOfN(200,
      Gen.zip(Gen.chooseNum(0L, 70000L), Gen.chooseNum(0L, 70000L))).sample.get
    cases.foreach { case (a, b) =>
      assert(ZOrderUtil.interleave16(a, b) == ref(a & 0xffffL, b & 0xffffL),
        s"a=$a b=$b")
    }
  }

  test("the SQL rendering computes the same key as the expression") {
    val df = Seq((3L, 5L), (65535L, 0L), (0L, 65535L), (12345L, 54321L))
      .toDF("a", "b")
    df.createOrReplaceTempView("zo_in")
    val viaSql = spark.sql(
      s"SELECT ${ZOrderUtil.interleaveSql("a", "b")} AS k FROM zo_in")
      .as[Long].collect().toSeq
    val viaExpr = df.select(ZOrderKey.zorderKey(col("a"), col("b")).as("k"))
      .as[Long].collect().toSeq
    assert(viaSql == viaExpr)
  }

  test("curve locality: bucket extents are narrow in BOTH dimensions") {
    // 256 points on a 16x16 grid; z >> 28 keeps the top 2 bits of EACH
    // axis → 16 buckets, each spanning a quarter of both axes (extent
    // ≤ 3) — the property lexicographic sorting cannot give for the
    // second dimension
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val rows = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        (ZOrderKey.zorderKey(col("x") * 4096L, col("y") * 4096L))
          .as("z"))
      .withColumn("bucket", expr("z div 268435456"))
      .groupBy("bucket")
      .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y")))
      .collect()
    assert(rows.length == 16, rows.length)
    rows.foreach { r =>
      assert(r.getLong(1) <= 3 && r.getLong(2) <= 3, r.toString)
    }
  }

  test("SQL registration: zorder_key") {
    assert(spark.sql("SELECT zorder_key(3L, 5L)").as[Long].head() ==
      ZOrderUtil.interleave16(3L, 5L))
  }
}
