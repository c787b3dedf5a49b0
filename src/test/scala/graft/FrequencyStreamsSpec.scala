package graft

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.FrequencyStreams

class FrequencyStreamsSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed vocabulary: a few hot tokens over a long tail. */
  private def skewed(n: Int, seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    (1 to n).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 30) "hot1" else if (r < 50) "hot2" else if (r < 60) "hot3"
      else "tail" + rnd.nextInt(500)
    }
  }

  test("mgAdd: superset and undercount bounds hold on random streams") {
    val cap = 9
    for (seed <- 1 to 3) {
      val toks = skewed(2000, seed)
      val mg = toks.foldLeft(Map.empty[String, Long])(
        FrequencyStreams.mgAdd(_, _, cap))
      assert(mg.size <= cap)
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = toks.size.toLong / (cap + 1)
      // Every true heavy hitter (count > n/(cap+1)) is retained...
      for ((t, c) <- exact if c > bound)
        assert(mg.contains(t), s"seed $seed: heavy $t ($c > $bound) evicted")
      // ...and every kept estimate is within [true - bound, true].
      for ((t, est) <- mg) {
        assert(est <= exact(t), s"seed $seed: $t overcounted")
        assert(est >= exact(t) - bound, s"seed $seed: $t below lower bound")
      }
    }
  }

  test("streaming summaries keep the guarantees across trigger splits with bounded state") {
    val cap = 9; val nBuckets = 4
    val toks = skewed(3000, 42)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    @volatile var last: Array[(Int, String, Long)] = Array.empty
    val q = FrequencyStreams.mgHeavyHitters(input.toDF(), "value", cap, nBuckets)
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[(Int, String, Long)], _: Long) =>
        val rows = b.collect()
        if (rows.nonEmpty) last = rows
      }
      .start()
    try {
      val (first, second) = toks.splitAt(1700)
      input.addData(first); q.processAllAvailable()
      input.addData(second); q.processAllAvailable()
    } finally q.stop()

    // State boundedness: each bucket carries at most cap candidates.
    assert(last.groupBy(_._1).values.forall(_.length <= cap))
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = last.map { case (_, t, c) => t -> c }.toMap
    // Per-bucket guarantee, lifted: a token heavier than its bucket's
    // n/(cap+1) is retained; the global n bound is weaker, so use it.
    val bound = toks.size.toLong / (cap + 1)
    for ((t, c) <- exact if c > bound)
      assert(got.contains(t), s"heavy $t ($c > $bound) missing from summary")
    for ((t, est) <- got) {
      assert(est <= exact(t), s"$t overcounted: $est > ${exact(t)}")
      assert(est >= exact(t) - bound, s"$t below lower bound")
    }
  }
}
