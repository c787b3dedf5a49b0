package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Literal latitude/longitude parsing — /root/reference/src/Geocoder.groovy:
 * 19-27 (regex families), 96-112 (DMS→decimal conversion), 55-57 (`,`→`.`
 * decimal fixup). Longitude is always negated (western-hemisphere corpus
 * assumption in the reference). Pure Column expressions: stays inside
 * whole-stage codegen and is pushdown/prune friendly.
 */
object GeoParse {
  private val Num2 = "(\\d\\d)"
  private val Num2Dec = "(\\d\\d(?:[.,]\\d*)?)"
  private val Sep = "\\D{1,9}"
  private val Noise = "\\D*"

  /** DMS with separators: `^\D*(dd)SEP(dd)SEP(dd[.,]?d*)SEP(dd)SEP(dd)SEP(dd[.,]?d*)\D*$` */
  val LatLong1: String =
    s"^$Noise$Num2$Sep$Num2$Sep$Num2Dec$Sep$Num2$Sep$Num2$Sep$Num2Dec$Noise$$"

  /** Packed `DDMMSS \D+ DDMMSS`. */
  val LatLong2: String =
    s"^$Noise$Num2$Num2$Num2$Sep$Num2$Num2$Num2$Noise$$"

  val BadCoordinate = -999.0d // sentinel — Geocoder.groovy:27,131-133

  private def dotted(c: Column): Column = regexp_replace(c, ",", ".")

  private def dms(d: Column, m: Column, s: Column): Column =
    d.cast("double") + m.cast("double") / 60.0d + dotted(s).cast("double") / 3600.0d

  private def viaPattern(place: Column, pattern: String): Column = {
    def g(i: Int) = regexp_extract(place, pattern, i)
    struct(
      dms(g(1), g(2), g(3)).as("lat"),
      (-dms(g(4), g(5), g(6))).as("lon"))
  }

  /**
   * Parse a place string as a literal lat/long. Returns
   * `struct(lat: double, lon: double)` or NULL when neither regex family
   * matches (the caller then falls back to gazetteer lookup — the Spark
   * replacement for the reference's per-row OSM HTTP call).
   */
  def lat_long_parse(place: Column): Column =
    when(place.rlike(LatLong1), viaPattern(place, LatLong1))
      .when(place.rlike(LatLong2), viaPattern(place, LatLong2))
      .otherwise(lit(null))
}
