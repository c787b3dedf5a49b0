package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave is a bijection on the bit-bounded domain") {
    val pairs = for (x <- 0L to 31L; y <- 0L to 31L) yield (x, y)
    val zs = pairs.toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 5).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length == pairs.length)
    assert(zs.min == 0L && zs.max == 1023L)
  }

  test("known Morton values: bit i of x at 2i, bit i of y at 2i+1") {
    val got = Seq((1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 16).as("z"))
      .as[Long].collect().toSeq
    // (3,5): x bits {0,1} -> z bits {0,2}; y bits {0,2} -> z bits {1,5}
    //        = 1 + 4 + 2 + 32 = 39.
    assert(got == Seq(1L, 2L, 39L, (1L << 32) - 1))
  }

  test("every 2^(2k)-aligned tile bounds both dimensions to 2^k") {
    val rnd = new Random(9)
    val pts = Seq.fill(5000)((rnd.nextInt(20000).toLong, rnd.nextInt(1000).toLong))
    val k = 9 // tiles of 2^18 z-range = 512x512 rectangles
    val stats = pts.toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y"), 16))
      .withColumn("tile", expr(s"z div ${1L << (2 * k)}"))
      .groupBy("tile")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .select(max("dx"), max("dy")).head()
    assert(stats.getLong(0) < (1L << k), s"x spread ${stats.getLong(0)}")
    assert(stats.getLong(1) < (1L << k), s"y spread ${stats.getLong(1)}")
  }

  test("clusterByZ: each output partition covers a bounded rectangle, all rows kept") {
    val rnd = new Random(11)
    val pts = Seq.fill(4000)((rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
    val clustered = ZOrder.clusterByZ(pts.toDF("x", "y"), "x", "y",
      bits = 12, numPartitions = 8)
    assert(clustered.count() == 4000)
    // Per-partition footer stats: the z-sort means partition boundaries
    // are z-ranges; check both dims' spread stays far below the global
    // 4096 domain (range-partitioned z keeps files rectangular-ish).
    val perPart = clustered
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"),
        count(lit(1)).as("n"))
      .collect()
    assert(perPart.length == 8)
    // A random (unclustered) 8-way split would put the full 4096 spread
    // in every partition; z-clustering must beat it on at least one dim
    // in every partition and on average by 2x.
    val avgSpread = perPart.map(r => (r.getLong(1) + r.getLong(2)) / 2.0).sum / 8
    assert(avgSpread < 2048, s"average per-partition spread $avgSpread")
  }
}
