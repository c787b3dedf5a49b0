package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Field-level survivorship ("golden record") — merge conflicting
 * per-source records of one entity into a single best row, where EACH
 * FIELD independently takes its value from the highest-ranked source
 * row in which that field is non-null. This is the master-data-merge
 * refinement of [[Changelog.latestState]]: latest-wins picks one whole
 * ROW per key; survivorship lets a low-priority source fill the fields
 * a high-priority source left blank (the standard MDM fallback chain).
 *
 * Shape: ONE map-side-combined groupBy — per field a
 * `max(when(field non-null, struct(rank..., field)))` aggregate, so a
 * key with a billion source rows ships one candidate struct per field
 * per input partition (the [[Changelog]] skew discipline; never a
 * per-field window). O(keys) output, one shuffle total for ANY number
 * of fields.
 *
 * `rankCols` must totally order each key's rows (e.g. source priority,
 * then recency, then a unique tie-break) — ties would make the winner
 * engine-dependent.
 */
object Survivorship {

  /** @param fieldCols payload fields to merge independently
    * @param withProvenance also emit `<field>_rank1` — the winning
    *        row's first rank column per field (which source won)
    * @return keyCols..., fieldCols... (+ provenance columns), plus
    *         `n_source_rows` */
  def goldenRecord(rows: DataFrame, keyCols: Seq[String],
      rankCols: Seq[String], fieldCols: Seq[String],
      withProvenance: Boolean = false): DataFrame = {
    require(fieldCols.nonEmpty, "no fields to merge")
    val aggs = fieldCols.map { f =>
      max(when(col(f).isNotNull,
        struct(rankCols.map(col) :+ col(f).as("v"): _*))).as(s"_w_$f")
    } :+ count(lit(1)).as("n_source_rows")
    val collapsed = rows.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val out = keyCols.map(col) ++
      fieldCols.map(f => col(s"_w_$f.v").as(f)) ++
      (if (withProvenance)
        fieldCols.map(f => col(s"_w_$f.${rankCols.head}").as(s"${f}_rank1"))
      else Nil) :+
      col("n_source_rows")
    collapsed.select(out: _*)
  }
}
