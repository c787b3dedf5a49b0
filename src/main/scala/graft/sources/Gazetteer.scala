package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Offline gazetteer — the Spark replacement for both the reference's
 * hardcoded country-centroid map (/root/reference/src/Countries.groovy:
 * 3-17,19-301: uppercase ASCII-normalized Spanish names → [lat, lon],
 * plus an endsWith(' ' + country) suffix probe) and its per-row OSM
 * Nominatim HTTP lookups (/root/reference/src/OSMFetcher.groovy:7-37 —
 * a synchronous network call per location cannot exist at 100 TB; the
 * semantics become broadcast joins against gazetteer tables).
 *
 * A representative subset ships in code for tests/demo; production loads a
 * full gazetteer parquet through the same `fromRows` path.
 */
object Gazetteer {

  /** (name_upper, lat, lon) — sample of the reference's table (same
    * normalization convention: uppercase, accent-stripped Spanish names). */
  val SampleCountries: Seq[(String, Double, Double)] = Seq(
    ("AFGANISTAN", 33.0, 65.0), ("ALEMANIA", 51.5, 10.5),
    ("ARGENTINA", -34.0, -64.0), ("BELGICA", 50.75, 4.5),
    ("BOLIVIA", -17.0, -65.0), ("BRASIL", -10.0, -55.0),
    ("CANADA", 60.0, -96.0), ("CHILE", -30.0, -71.0),
    ("CHINA", 35.0, 105.0), ("COLOMBIA", 4.0, -72.0),
    ("COSTA RICA", 10.0, -84.0), ("CUBA", 21.5, -80.0),
    ("ECUADOR", -2.0, -77.5), ("EGIPTO", 27.0, 30.0),
    ("EL SALVADOR", 13.83, -88.91), ("ESPANA", 40.0, -4.0),
    ("ESTADOS UNIDOS", 38.0, -97.0), ("FRANCIA", 46.0, 2.0),
    ("GUATEMALA", 15.5, -90.25), ("HONDURAS", 15.0, -86.5),
    ("INGLATERRA", 52.5, -1.5), ("ITALIA", 42.83, 12.83),
    ("JAPON", 36.0, 138.0), ("MEXICO", 23.0, -102.0),
    ("NICARAGUA", 13.0, -85.0), ("PANAMA", 9.0, -80.0),
    ("PARAGUAY", -23.0, -58.0), ("PERU", -10.0, -76.0),
    ("PUERTO RICO", 18.25, -66.5), ("URUGUAY", -33.0, -56.0),
    ("VENEZUELA", 8.0, -66.0))

  def countries(spark: SparkSession): DataFrame = fromRows(spark, SampleCountries)

  def fromRows(spark: SparkSession, rows: Seq[(String, Double, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("name_upper", "gaz_lat", "gaz_lon")
  }

  /**
   * R24: exact-name lookup — broadcast hash equi-join.
   * Adds (gaz_lat, gaz_lon) nullable.
   */
  def lookup(places: DataFrame, gaz: DataFrame, nameCol: String): DataFrame =
    places.join(broadcast(gaz), places(nameCol) === gaz("name_upper"), "left_outer")
      .drop("name_upper")

  /**
   * R23: suffix probe — `location.endsWith(' ' + country)` as a broadcast
   * nested-loop theta join (Countries.groovy:8-17). Emits at most one match
   * per place (min country name pinned for determinism).
   */
  def suffixLookup(places: DataFrame, gaz: DataFrame, nameCol: String): DataFrame = {
    val g = gaz.select(col("name_upper").as("sfx_name"),
      col("gaz_lat").as("hit_lat"), col("gaz_lon").as("hit_lon"))
    val matched = places.join(broadcast(g),
        places(nameCol).endsWith(concat(lit(" "), col("sfx_name"))), "left_outer")
      .groupBy(places.columns.map(col): _*)
      .agg(min_by(struct(col("hit_lat"), col("hit_lon")), col("sfx_name")).as("hit"))
    matched.select(places.columns.map(col) :+
      col("hit.hit_lat").as("sfx_lat") :+ col("hit.hit_lon").as("sfx_lon"): _*)
  }
}
