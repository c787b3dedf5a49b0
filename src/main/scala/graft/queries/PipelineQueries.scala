package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables => T}
import graft.operators.{Coref, SocialNetwork}

/**
 * End-to-end reference pipeline (steps 3→4/5→8 of SURVEY.md §0) driven off
 * the `documents` table: adjacent-bigram shingles play the role of NER
 * PERSON mentions (deterministic ids), then within-doc coref → across-doc
 * coref → co-occurrence network → materialized counts. Not SQL-expressible
 * as a single oracle query (iterative connected components) → rows-only
 * driver check; invariants are pinned by ScalaTest instead (CorefSpec).
 */
object PipelineQueries {

  /** Synthesize a PERSON mention table from document token bigrams. */
  def syntheticMentions(s: SparkSession, d: String): DataFrame = {
    val toks = T.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    toks
      .withColumn("next", lead(col("tok"), 1).over(w))
      .filter(col("next").isNotNull)
      .select(
        col("doc_id"),
        xxhash64(col("doc_id"), col("pos")).as("mention_id"),
        lit("PERSON").as("mention_type"),
        concat_ws(" ", col("tok"), col("next")).as("text"))
  }

  // q40/q41/q42 share this pipeline; memoized per (session, dir) with
  // persisted outputs so a Verify/Bench session pays the coref cost once.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String),
      (DataFrame, DataFrame, DataFrame)]

  /** Drop memoized pipelines for `s` (bench passes re-run from cold). */
  def resetCache(s: SparkSession): Unit =
    cache.keys.filter(_._1 eq s).foreach(cache.remove)

  private def corefPipeline(s: SparkSession, d: String): (DataFrame, DataFrame, DataFrame) =
    cache.getOrElseUpdate((s, d), {
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val mentions = syntheticMentions(s, d).persist(lvl)
      val within = Coref.withinDoc(mentions, Coref.WithinDocParams.person)
      val across = Coref.acrossDoc(within.entities, Coref.AcrossDocParams.person)
      val finalAssign = within.assignment
        .withColumnRenamed("entity_id", "within_id")
        .join(across.assignment.withColumnRenamed("entity_id", "within_id"), "within_id")
        .select(col("mention_id"), col("new_entity_id").as("entity_id"))
        .persist(lvl)
      val entities = across.entities.persist(lvl)
      // Materialize the shared intermediates eagerly: the pipeline cost is
      // paid once, in whichever query builds the cache (q40), instead of
      // leaking into the first downstream consumer's timing.
      mentions.count(); entities.count(); finalAssign.count()
      (mentions, entities, finalAssign)
    })

  val all: Seq[Q] = Seq(

    // ---- Full ER pipeline → entity table (flagship).
    Q("q40_coref_pipeline",
      (s, d) => {
        val (_, entities, _) = corefPipeline(s, d)
        entities.select("entity_id", "entity_type", "entity_text",
          "created_by", "num_mentions", "num_docs")
      },
      None),

    // ---- Social network over the coref'd entities (R18/R19/R14/R22).
    Q("q41_social_network",
      (s, d) => {
        val (mentions, entities, assign) = corefPipeline(s, d)
        // The pair join is the expensive stage; persist its (much smaller)
        // aggregate so the two endpoint semi-joins and the final action
        // don't re-run it.
        val edges = SocialNetwork.cooccurrenceEdges(
          assign, mentions.select("mention_id", "doc_id"), entities,
          maxEntitiesPerDoc = SocialNetwork.DefaultMaxEntitiesPerDoc)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val (_, kept) = SocialNetwork.thresholded(entities, edges)
        kept
      },
      None),

    // ---- Materialized doc-entity counts (R27) over the pipeline output.
    Q("q42_document_entity",
      (s, d) => {
        val (mentions, _, assign) = corefPipeline(s, d)
        SocialNetwork.documentEntityCounts(
          assign, mentions.select("mention_id", "doc_id"))
      },
      None)
  )
}
