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
 * The schema carries the full enrichment the reference extracts from each
 * OSM result (OSMFetcher.groovy:24-30: lat/lon, bounding box, type,
 * country code) plus the NGA designation column of the geolocation table
 * (GraphDBToH2.groovy:149-152), so gazetteer hits populate every
 * geolocation field, not just the centroid.
 *
 * A representative subset ships in code for tests/demo; production loads a
 * full gazetteer parquet through the same `fromRows` path.
 */
object Gazetteer {

  /** One gazetteer row: OSM-shaped enrichment for a normalized name. */
  final case class Entry(
      name_upper: String,
      gaz_lat: Double, gaz_lon: Double,
      gaz_lat_s: Double, gaz_lat_n: Double,
      gaz_lon_w: Double, gaz_lon_e: Double,
      gaz_osm_type: String,
      gaz_country: String,
      gaz_nga: String)

  /** Centroid sample of the reference's table (same normalization
    * convention: uppercase, accent-stripped Spanish names). The sample's
    * bounding boxes are synthetic ±2° demo boxes; a production gazetteer
    * parquet carries real ones through the same schema. */
  private val Centroids: Seq[(String, Double, Double, String)] = Seq(
    ("AFGANISTAN", 33.0, 65.0, "af"), ("ALEMANIA", 51.5, 10.5, "de"),
    ("ARGENTINA", -34.0, -64.0, "ar"), ("BELGICA", 50.75, 4.5, "be"),
    ("BOLIVIA", -17.0, -65.0, "bo"), ("BRASIL", -10.0, -55.0, "br"),
    ("CANADA", 60.0, -96.0, "ca"), ("CHILE", -30.0, -71.0, "cl"),
    ("CHINA", 35.0, 105.0, "cn"), ("COLOMBIA", 4.0, -72.0, "co"),
    ("COSTA RICA", 10.0, -84.0, "cr"), ("CUBA", 21.5, -80.0, "cu"),
    ("ECUADOR", -2.0, -77.5, "ec"), ("EGIPTO", 27.0, 30.0, "eg"),
    ("EL SALVADOR", 13.83, -88.91, "sv"), ("ESPANA", 40.0, -4.0, "es"),
    ("ESTADOS UNIDOS", 38.0, -97.0, "us"), ("FRANCIA", 46.0, 2.0, "fr"),
    ("GUATEMALA", 15.5, -90.25, "gt"), ("HONDURAS", 15.0, -86.5, "hn"),
    ("INGLATERRA", 52.5, -1.5, "gb"), ("ITALIA", 42.83, 12.83, "it"),
    ("JAPON", 36.0, 138.0, "jp"), ("MEXICO", 23.0, -102.0, "mx"),
    ("NICARAGUA", 13.0, -85.0, "ni"), ("PANAMA", 9.0, -80.0, "pa"),
    ("PARAGUAY", -23.0, -58.0, "py"), ("PERU", -10.0, -76.0, "pe"),
    ("PUERTO RICO", 18.25, -66.5, "pr"), ("URUGUAY", -33.0, -56.0, "uy"),
    ("VENEZUELA", 8.0, -66.0, "ve"))

  val SampleCountries: Seq[Entry] = Centroids.map { case (n, lat, lon, cc) =>
    Entry(n, lat, lon, lat - 2.0, lat + 2.0, lon - 2.0, lon + 2.0,
      "administrative", cc, "PCLI")
  }

  def countries(spark: SparkSession): DataFrame = fromRows(spark, SampleCountries)

  def fromRows(spark: SparkSession, rows: Seq[Entry]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  private val EnrichCols = Seq("gaz_lat", "gaz_lon", "gaz_lat_s", "gaz_lat_n",
    "gaz_lon_w", "gaz_lon_e", "gaz_osm_type", "gaz_country", "gaz_nga")

  /**
   * R24: exact-name lookup — broadcast hash equi-join.
   * Adds the gaz_* enrichment columns, nullable.
   */
  def lookup(places: DataFrame, gaz: DataFrame, nameCol: String): DataFrame =
    places.join(broadcast(gaz), places(nameCol) === gaz("name_upper"), "left_outer")
      .drop("name_upper")

  /**
   * R23: suffix probe — `location.endsWith(' ' + country)` as a broadcast
   * nested-loop theta join (Countries.groovy:8-17). Emits at most one match
   * per place (min country name pinned for determinism), carrying the full
   * enrichment as sfx_* columns.
   */
  def suffixLookup(places: DataFrame, gaz: DataFrame, nameCol: String): DataFrame = {
    val g = gaz.select(col("name_upper").as("sfx_name") +:
      EnrichCols.map(c => col(c).as("h_" + c)): _*)
    val matched = places.join(broadcast(g),
        places(nameCol).endsWith(concat(lit(" "), col("sfx_name"))), "left_outer")
      .groupBy(places.columns.map(col): _*)
      .agg(min_by(struct(EnrichCols.map(c => col("h_" + c).as(c)): _*),
        col("sfx_name")).as("hit"))
    matched.select(places.columns.map(col) ++
      EnrichCols.map(c => col("hit." + c).as(c.replaceFirst("^gaz_", "sfx_"))): _*)
  }
}
