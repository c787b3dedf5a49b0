package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profiler for the q40/q41/q42 pipeline family (diagnostic main,
  * not part of the driver contract): times each stage at
  * SPARK_GRAFT_SF_DIR with the same pinning strategy as
  * PipelineQueries.corefPipeline.
  *
  * History: this tool isolated the round-3 finding that warm actions over
  * deep-lineage persisted frames cost 6-7 s of pure DRIVER time on Spark 4
  * with AQE — TreeNode.generateTreeString dominates (each nested cached
  * AdaptiveSparkPlan prints both its current and initial plans, so the
  * plan-update event text grows exponentially with cache-nesting depth,
  * while actual task time is ~0.1 s). Fixes: localCheckpoint the shared
  * pipeline frames (lineage → LogicalRDD leaf) + cap
  * spark.sql.maxPlanStringLength in harness sessions.
  */
object ProfileQ41 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.queries.PipelineQueries
    import graft.operators.{Coref, SocialNetwork}

    val mentions = time("mentions")(
      PipelineQueries.syntheticMentions(spark, sfDir).localCheckpoint(true))
    val within = Coref.withinDoc(mentions, Coref.WithinDocParams.person)
    // Round-15 split: materialize within-doc output first so the
    // across-doc stage times separately.
    val wdEntities = time("withinDoc entities")(
      within.entities.localCheckpoint(true))
    val (across, entities) = time("acrossDoc entities") {
      val a = Coref.acrossDoc(wdEntities, Coref.AcrossDocParams.person)
      (a, a.entities.localCheckpoint(true))
    }
    val assign = time("final assignment")(within.assignment
      .withColumnRenamed("entity_id", "within_id")
      .join(across.assignment.withColumnRenamed("entity_id", "within_id"), "within_id")
      .select(col("mention_id"), col("new_entity_id").as("entity_id"))
      .localCheckpoint(true))

    val edges = SocialNetwork.cooccurrenceEdges(
      assign, mentions.select("mention_id", "doc_id"), entities,
      maxEntitiesPerDoc = SocialNetwork.DefaultMaxEntitiesPerDoc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("edges")(edges.count())
    time("edges warm recount")(edges.count())
    val (_, kept) = SocialNetwork.thresholded(entities, edges)
    val names = entities.select(col("entity_id"), col("entity_text"))
    val out = kept
      .join(names.withColumnRenamed("entity_id", "src_entity_id")
        .withColumnRenamed("entity_text", "src_name"), Seq("src_entity_id"))
      .join(names.withColumnRenamed("entity_id", "dst_entity_id")
        .withColumnRenamed("entity_text", "dst_name"), Seq("dst_entity_id"))
      .select(least(col("src_name"), col("dst_name")).as("src_text"),
        greatest(col("src_name"), col("dst_name")).as("dst_text"),
        col("num_docs"))
    time("threshold+names+noop")(
      out.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
