package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): run every declared query on
 * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
 * Each query is forced through the noop sink so the full result set is
 * computed (count() would let Catalyst prune the work).
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Cap AQE plan-update string generation (driver-side, exponential in
      // cache-nesting depth) — see PipelineQueries.corefPipeline scaladoc.
      .config("spark.sql.maxPlanStringLength", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/JIT/scan machinery so the first timed query doesn't
    // absorb session initialization.
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(10).write.format("noop").mode("overwrite").save()
    // Two passes, min per query: this host is shared and single-run
    // timings swing 2-5x under external load; min-of-2 reports the plan's
    // actual cost rather than the noisiest co-tenant moment.
    // A query that throws reports -1 (and lands in "failed"), never its
    // wall-clock-to-exception time — a fast failure must not look like a
    // speedup in the JSON.
    def onePass(): Seq[(String, Double, Boolean)] = SparkEntry.allQueries.map { q =>
      val t0 = System.nanoTime()
      // Track each query's operator-internal persists and release them
      // once the result is fully materialized: a 76-query sweep otherwise
      // accumulates every LSH/curation cache in the CacheManager, and the
      // later queries run under growing memory/GC pressure.
      val (ok, caches) = graft.operators.CacheScope.tracking {
        try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          false
        }
      }
      val sec = (System.nanoTime() - t0) / 1e9
      caches.release()
      // The q40-q42 family shares memoized checkpointed intermediates;
      // after the last of them, release the block-manager memory so later
      // queries don't run under cache/GC pressure.
      if (q.name == "q42_document_entity") {
        graft.queries.PipelineQueries.resetCache(spark)
        spark.catalog.clearCache()
      }
      (q.name, sec, ok)
    }
    val p1 = onePass().map(t => t._1 -> (t._2, t._3)).toMap
    graft.queries.PipelineQueries.resetCache(spark)
    spark.catalog.clearCache()
    val p2 = onePass().map(t => t._1 -> (t._2, t._3)).toMap
    val results = SparkEntry.allQueries.map { q =>
      val (s1, ok1) = p1(q.name); val (s2, ok2) = p2(q.name)
      val sec =
        if (ok1 && ok2) math.min(s1, s2)
        else if (ok1) s1 else if (ok2) s2 else -1.0
      q.name -> sec
    }
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
