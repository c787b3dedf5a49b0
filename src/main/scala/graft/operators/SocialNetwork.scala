package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Co-occurrence social network + count materialization:
 *
 *  - doc → distinct coref'd person-entity sets, all unordered pairs, edge
 *    weight = number of co-occurrence documents
 *    (/root/reference/src/SocialNetworkDCO.groovy:53-84 — the O(p²)/doc
 *    nested loop becomes a doc-keyed equi self-join with a `<` residual;
 *    the probe-and-increment edge update becomes one groupBy count)
 *  - node/edge num_docs thresholds for export
 *    (/root/reference/src/SNGephiGraphML.groovy:14-15,52-89)
 *  - per-(doc, entity) mention counts
 *    (/root/reference/src/EdgeMentionsCounter.groovy:33-60).
 */
object SocialNetwork {

  /**
   * Build the undirected co-occurrence edge table.
   *
   * @param assignment  (mention_id, entity_id) — final coref assignment
   * @param mentions    (mention_id, doc_id, ...)
   * @param entities    entity table; only `createdBy`-tagged entities join
   *                    the network (SocialNetworkDCO.groovy:57)
   * @return (src_entity_id, dst_entity_id, num_docs) with src < dst
   */
  /**
   * @param maxEntitiesPerDoc scale guard (SURVEY.md §7.4(7)): pair
   *        generation is O(p²) per document; a pathological doc with 10⁵
   *        distinct entities would emit 5·10⁹ pairs. When set, each doc
   *        keeps its top-N entities by mention count (ties → smaller id,
   *        deterministic) before pairing. 0 = unbounded (reference
   *        behaviour).
   */
  /** Default pair-generation cap: no real corpus doc approaches 10³
    * distinct coref'd entities (sf0.1 max ≈ 10²), while one pathological
    * doc at 10⁵ entities would otherwise emit 5·10⁹ pairs. */
  val DefaultMaxEntitiesPerDoc: Int = 1000

  def cooccurrenceEdges(
      assignment: DataFrame,
      mentions: DataFrame,
      entities: DataFrame,
      createdBy: String = "across_doc_person_coref",
      maxEntitiesPerDoc: Int = 0): DataFrame = {
    val kept = entities.filter(col("created_by") === createdBy)
      .select(col("entity_id"))
    // R18: doc → distinct entity, restricted to coref'd persons.
    val distinctDocEntity = mentions.select(col("mention_id"), col("doc_id"))
      .join(assignment, "mention_id")
      .join(kept, "entity_id")
      .groupBy(col("doc_id"), col("entity_id"))
      .agg(count(lit(1)).as("m"))
    val capped = if (maxEntitiesPerDoc <= 0) distinctDocEntity else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("m").desc, col("entity_id"))
      distinctDocEntity
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= maxEntitiesPerDoc)
    }
    // Persisted: both sides of the pair self-join read it, and the two
    // branches' exchanges don't canonicalize equal (different
    // projections), so without this the whole mention⋈assignment⋈filter
    // aggregation chain runs twice.
    val docEntity = CacheScope.pin(capped)
    // R19/R20: unordered pairs per doc; multiplicity by construction = 1.
    val a = docEntity.select(col("doc_id"), col("entity_id").as("src_entity_id"))
    val b = docEntity.select(col("doc_id"), col("entity_id").as("dst_entity_id"))
    a.join(b, Seq("doc_id"))
      .filter(col("src_entity_id") < col("dst_entity_id"))
      .groupBy(col("src_entity_id"), col("dst_entity_id"))
      .agg(count(lit(1)).as("num_docs"))
  }

  /**
   * Node/edge threshold filtering for export (R14/R22): keep entities seen
   * in ≥ nodeMinDocs docs, then edges with weight ≥ edgeMinDocs whose BOTH
   * endpoints survived (semi-joins — SNGephiGraphML.groovy:53-63,84-89).
   */
  def thresholded(
      entities: DataFrame,
      edges: DataFrame,
      nodeMinDocs: Int = 2,
      edgeMinDocs: Int = 2): (DataFrame, DataFrame) = {
    val keptNodes = entities.filter(col("num_docs") >= nodeMinDocs)
    val keptIds = keptNodes.select(col("entity_id"))
    val keptEdges = edges.filter(col("num_docs") >= edgeMinDocs)
      .join(keptIds.withColumnRenamed("entity_id", "src_entity_id"),
        Seq("src_entity_id"), "left_semi")
      .join(keptIds.withColumnRenamed("entity_id", "dst_entity_id"),
        Seq("dst_entity_id"), "left_semi")
    (keptNodes, keptEdges)
  }

  /**
   * R27: materialized per-(document, entity) mention counts — the
   * `document_entity` table (one partial+final hash agg; replaces the
   * reference's per-doc Gremlin groupCount).
   */
  def documentEntityCounts(assignment: DataFrame, mentions: DataFrame): DataFrame =
    mentions.select(col("mention_id"), col("doc_id"))
      .join(assignment, "mention_id")
      .groupBy(col("doc_id"), col("entity_id"))
      .agg(count(lit(1)).as("num_mentions"))
}
