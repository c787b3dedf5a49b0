package graft.sinks

import java.io.{BufferedWriter, FileWriter}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sinks for the pipeline's terminal artifacts:
 *
 *  - Gephi-flavoured GraphML of the social network
 *    (/root/reference/src/SNGephiGraphML.groovy:40-102: fixed XML template,
 *    node label + weighted edges). The thresholded graph is small by
 *    construction (num_docs ≥ 2 filters), so a driver-streamed single file
 *    matches the artifact contract; `toLocalIterator` keeps memory at one
 *    partition.
 *  - TSV node-id dump (/root/reference/src/SNNodeId.groovy:38-57).
 *  - relational export (/root/reference/src/GraphDBToH2.groovy:40-165):
 *    the five tables as parquet directories (H2's row-at-a-time JDBC insert
 *    becomes bulk columnar writes; a `jdbc` mirror is one option-line away).
 */
object GraphML {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Ceiling on rows a single driver-written XML export will stream. A
    * thresholded social network sits orders of magnitude below this; an
    * UNFILTERED 100×-scale export would otherwise serialize the corpus
    * through one driver thread into one file — fail fast instead. */
  val DefaultMaxExportRows: Long = 5000000L

  /**
   * @param nodes (entity_id, entity_text, num_docs)
   * @param edges (src_entity_id, dst_entity_id, num_docs)
   * @param maxRows guard over nodes+edges (see [[DefaultMaxExportRows]]);
   *                raise deliberately, use [[writeSharded]] for networks
   *                above the single-file contract, or [[RelationalExport
   *                .writeParquet]] for bulk relational output. 0 disables.
   *                Note the guard's two count() jobs execute the input
   *                plans a second time ahead of the streamed write —
   *                pin (persist/checkpoint) expensive upstream plans, or
   *                accept the re-run for the thresholded (small) networks
   *                this sink targets.
   */
  def write(nodes: DataFrame, edges: DataFrame, path: String,
      maxRows: Long = DefaultMaxExportRows): Unit = {
    if (maxRows > 0) {
      // Two cheap count jobs before any driver-side streaming begins: the
      // guard must trip before an oversized export starts, not midway.
      val (nN, nE) = (nodes.count(), edges.count())
      require(nN + nE <= maxRows,
        s"GraphML export is a single driver-streamed XML file by contract " +
          s"(reference SNGephiGraphML artifact); $nN nodes + $nE edges " +
          s"exceeds maxRows=$maxRows. Export the THRESHOLDED network " +
          s"(num_docs filter), raise maxRows deliberately, or use " +
          s"RelationalExport.writeParquet for bulk output.")
    }
    val w = new BufferedWriter(new FileWriter(path))
    try {
      w.write("""<?xml version="1.0" encoding="UTF-8"?>""")
      w.newLine()
      w.write("""<graphml xmlns="http://graphml.graphdrawing.org/xmlns">""")
      w.newLine()
      w.write("""<key id="label" for="node" attr.name="label" attr.type="string"/>""")
      w.newLine()
      w.write("""<key id="num_docs" for="all" attr.name="num_docs" attr.type="int"/>""")
      w.newLine()
      w.write("""<graph edgedefault="undirected">""")
      w.newLine()
      val nit = nodes.select(col("entity_id"), col("entity_text"), col("num_docs"))
        .orderBy(col("entity_id")).toLocalIterator()
      while (nit.hasNext) {
        val r = nit.next()
        w.write(s"""<node id="n${r.getLong(0)}"><data key="label">${esc(r.getString(1))}</data>""" +
          s"""<data key="num_docs">${r.getLong(2)}</data></node>""")
        w.newLine()
      }
      val eit = edges.select(col("src_entity_id"), col("dst_entity_id"), col("num_docs"))
        .orderBy(col("src_entity_id"), col("dst_entity_id")).toLocalIterator()
      var i = 0L
      while (eit.hasNext) {
        val r = eit.next()
        w.write(s"""<edge id="e$i" source="n${r.getLong(0)}" target="n${r.getLong(1)}">""" +
          s"""<data key="num_docs">${r.getLong(2)}</data></edge>""")
        w.newLine()
        i += 1
      }
      w.write("</graph></graphml>")
      w.newLine()
    } finally w.close()
  }

  /** R11: `(node_id \t entity_text)` TSV of filtered entities. */
  def writeNodeIdTsv(nodes: DataFrame, path: String): Unit =
    nodes.select(col("entity_id"), col("entity_text"))
      .write.mode("overwrite").option("sep", "\t").csv(path)

  /** Column-level XML escape (the SQL mirror of [[esc]]); `&` first so
    * escapes aren't re-escaped. */
  private def escCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;"), "\"", "&quot;")

  /**
   * Sharded GraphML export — the escape hatch above [[write]]'s
   * single-file `maxRows` contract: node and edge elements are written as
   * XML FRAGMENT shards by the EXECUTORS (distributed text writes — no
   * driver streaming, no row ceiling), with a driver-written `header.xml`
   * / `footer.xml` and an `index.json` listing concatenation order.
   * Concatenating the listed files in order reproduces a valid GraphML
   * document; consumers that stream (Gephi importers, SAX) can also read
   * the shards directly.
   *
   * Shard CONTENT is byte-stable run-to-run: rows are hash-partitioned on
   * their id columns (murmur3 — deterministic for a fixed `shards`) and
   * sorted within each shard, and edge ids are content-derived
   * (`e<src>_<dst>`, globally unique for the undirected-deduped edge
   * table) instead of the single-file writer's stream-sequence numbers.
   * Only the part-file NAMES carry a per-run task UUID; `index.json`
   * abstracts them away.
   */
  def writeSharded(nodes: DataFrame, edges: DataFrame, dir: String,
      shards: Int = 64): Unit = {
    require(shards > 0, "shards must be positive")
    val nodeXml = nodes
      .repartition(shards, col("entity_id"))
      .sortWithinPartitions(col("entity_id"))
      .select(format_string(
        "<node id=\"n%d\"><data key=\"label\">%s</data>" +
          "<data key=\"num_docs\">%d</data></node>",
        col("entity_id"), escCol(col("entity_text")), col("num_docs"))
        .as("value"))
    val edgeXml = edges
      .repartition(shards, col("src_entity_id"), col("dst_entity_id"))
      .sortWithinPartitions(col("src_entity_id"), col("dst_entity_id"))
      .select(format_string(
        "<edge id=\"e%d_%d\" source=\"n%d\" target=\"n%d\">" +
          "<data key=\"num_docs\">%d</data></edge>",
        col("src_entity_id"), col("dst_entity_id"), col("src_entity_id"),
        col("dst_entity_id"), col("num_docs")).as("value"))
    nodeXml.write.mode("overwrite").text(s"$dir/nodes")
    edgeXml.write.mode("overwrite").text(s"$dir/edges")
    val header = Seq(
      """<?xml version="1.0" encoding="UTF-8"?>""",
      """<graphml xmlns="http://graphml.graphdrawing.org/xmlns">""",
      """<key id="label" for="node" attr.name="label" attr.type="string"/>""",
      """<key id="num_docs" for="all" attr.name="num_docs" attr.type="int"/>""",
      """<graph edgedefault="undirected">""").mkString("", "\n", "\n")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      nodes.sparkSession.sparkContext.hadoopConfiguration)
    def put(name: String, content: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
    put("header.xml", header)
    put("footer.xml", "</graph></graphml>\n")
    // part files in name order == partition order (fixed-width part index
    // prefix), so the index is deterministic modulo the task UUID suffix.
    def parts(sub: String): Seq[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(dir, sub)).toSeq
        .map(_.getPath.getName).filter(_.startsWith("part-")).sorted
        .map(n => s"$sub/$n")
    val order = ("header.xml" +: (parts("nodes") ++ parts("edges"))) :+
      "footer.xml"
    put("index.json", order.map(p => "\"" + p + "\"")
      .mkString("{\"order\":[", ",", "]}\n"))
  }
}

/** Relational export mirroring the H2 schema (GraphDBToH2.groovy:79-159). */
object RelationalExport {

  /**
   * Assemble the five terminal tables from pipeline outputs.
   *
   * @param docs        (doc_id, name, path, text)
   * @param mentions    mention table with assignment-ready ids
   * @param assignment  (mention_id, entity_id) — final (nullable via left join)
   * @param entities    final entity table
   * @param geolocation geolocation rows from [[graft.operators.Geocode]]
   */
  def tables(docs: DataFrame, mentions: DataFrame, assignment: DataFrame,
      entities: DataFrame, geolocation: DataFrame,
      documentEntity: DataFrame): Map[String, DataFrame] = Map(
    "document" -> docs.select(
      col("doc_id").as("document_id"), col("name"), col("path"), col("text")),
    // R21: mentions keep a NULL entity_id when unresolved (left outer).
    "mention" -> mentions
      .join(assignment, Seq("mention_id"), "left_outer")
      .select(col("mention_id"), col("doc_id").as("document_id"),
        col("entity_id"), col("mention_type").as("type"), col("text"),
        col("mention_index").as("index"), col("global_id"),
        col("text_start"), col("text_stop")),
    "entity" -> entities.select(
      col("entity_id"), col("entity_type").as("type"), col("entity_text").as("text"),
      col("created_by"), col("num_docs").as("num_documents"), col("num_mentions")),
    "document_entity" -> documentEntity
      .select(col("doc_id").as("document_id"), col("entity_id"), col("num_mentions")),
    "geolocation" -> geolocation)

  /** Bulk parquet export (one subdirectory per table). */
  def writeParquet(tables: Map[String, DataFrame], outDir: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }

  /** JDBC mirror of the H2 export path (df.write.jdbc with batching). */
  def writeJdbc(tables: Map[String, DataFrame], url: String,
      props: java.util.Properties): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").option("batchsize", 1000).jdbc(url, name, props)
    }
}
