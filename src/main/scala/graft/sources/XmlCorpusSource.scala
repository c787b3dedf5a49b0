package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Annotated-corpus source (R10 — /root/reference/src/XMLToTSVConverter
 * .groovy:85-159): documents with `<TEXT>` sections containing inline
 * PERSON/ORGANIZATION/LOCATION/DATE tags → one (token, tag) row per token,
 * for NER training data. The reference streams StAX events and PTB-tokenizes
 * (:148-159); here a per-partition linear scanner + whitespace tokenization
 * (the PTB tokenizer is an external model dependency — same seam policy as
 * the CRF: pluggable, whitespace by default).
 */
object XmlCorpusSource {

  private val TagRe = "(?s)<(PERSON|ORGANIZATION|LOCATION|DATE)>(.*?)</\\1>".r
  private val TextRe = "(?s)<TEXT>(.*?)</TEXT>".r

  /** (doc_id, pos, token, tag) rows; tag = O outside annotations. */
  def tokenTagRows(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (docId, xml) =>
        if (xml == null) Iterator.empty
        else TextRe.findAllMatchIn(xml).flatMap { section =>
          val body = section.group(1)
          val out = Seq.newBuilder[(Long, String, String)]
          var last = 0
          for (m <- TagRe.findAllMatchIn(body)) {
            body.substring(last, m.start).split("\\s+").filter(_.nonEmpty)
              .foreach(t => out += ((docId, t, "O")))
            m.group(2).split("\\s+").filter(_.nonEmpty)
              .foreach(t => out += ((docId, t, m.group(1))))
            last = m.end
          }
          body.substring(last).split("\\s+").filter(_.nonEmpty)
            .foreach(t => out += ((docId, t, "O")))
          out.result()
        }.zipWithIndex.map { case ((id, tok, tag), i) => (id, i, tok, tag) }
      }
      .toDF("doc_id", "pos", "token", "tag")
  }

  /** TSV sink of the training rows (token \t tag). */
  def writeTsv(rows: DataFrame, path: String): Unit =
    rows.orderBy(col("doc_id"), col("pos"))
      .select(col("token"), col("tag"))
      .write.mode("overwrite").option("sep", "\t").csv(path)
}
