package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Dump `.explain("formatted")` for selected declared queries, ONE FILE
 * per query — the before/after plan evidence the optimization rounds
 * commit under plans/rNN/:
 *
 *   sbt "runMain graft.tools.PlanExplain /root/testdata/sf0.01 plans/r15 _before q247"
 *
 * Args: sfDir, outDir, suffix (e.g. "_before"/"_after"), name regex.
 * Writes <outDir>/<query><suffix>.txt with the FormattedMode plan
 * (operator list + details: PushedFilters, ReadSchema, join strategy,
 * exchange partitioning). Planning only — results are not materialized,
 * though operators with eager internals (iterative localCheckpoint
 * rounds) do run them, so expect a Verify-like wall for graph queries.
 */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("plans/r15")
    val suffix = args.lift(2).getOrElse("")
    val nameFilter = args.lift(3).map(_.r)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      if (nameFilter.forall(_.findFirstIn(name).isDefined)) {
        val (_, caches) = graft.operators.CacheScope.tracking {
          val plan =
            try fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            catch { case e: Throwable =>
              s"(plan unavailable: ${e.getClass.getSimpleName}: ${e.getMessage})"
            }
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"$name$suffix.txt"), plan)
          println(s"wrote $outDir/$name$suffix.txt")
        }
        caches.release()
      }
    }
    spark.stop()
  }
}
