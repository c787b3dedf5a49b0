package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GeoParse
import graft.sources.Gazetteer

/**
 * Geocoding pass (/root/reference/src/Geocoder.groovy:154-212): for each
 * across-doc LOCATION entity, resolve coordinates through an ordered
 * fallback chain — literal lat/long parse, then place-name cleanup +
 * gazetteer exact lookup, then gazetteer suffix probe — first hit wins
 * (modeled as coalesce over strategies), the −999 bad-coordinate sentinel
 * dropped (Geocoder.groovy:27,131-133). Emits the `geolocation` table shape
 * (SURVEY.md §1.1) with rank = 1 (single-result strategies; the reference
 * queries OSM with limit=1 — OSMFetcher.groovy:10-11).
 */
object Geocode {

  def run(entities: DataFrame, gaz: DataFrame,
      createdBy: String = "across_doc_location_coref"): DataFrame = {
    val locs = entities
      .filter(col("created_by") === createdBy)
      .select(col("entity_id"), col("entity_text"))
      // Geocoder.groovy:146-152: strip one leading dash/space.
      .withColumn("cleaned", graft.functions.place_cleanup(col("entity_text")))
      .filter(col("cleaned") =!= "")

    val parsed = locs.withColumn("ll", GeoParse.lat_long_parse(col("cleaned")))
    val exact = Gazetteer.lookup(parsed, gaz, "cleaned")
    val withSuffix = Gazetteer.suffixLookup(exact, gaz, "cleaned")

    // Enrichment follows the winning strategy: literal coordinates carry
    // none (the reference only gets bbox/type/country from OSM —
    // OSMFetcher.groovy:24-30); gazetteer hits carry their full row.
    def enriched(gazCol: String, sfxCol: String): org.apache.spark.sql.Column =
      when(col("ll").isNotNull, lit(null))
        .when(col("gaz_lat").isNotNull, col(gazCol))
        .otherwise(col(sfxCol))

    withSuffix
      .withColumn("latitude", coalesce(
        col("ll.lat"), col("gaz_lat"), col("sfx_lat")))
      .withColumn("longitude", coalesce(
        col("ll.lon"), col("gaz_lon"), col("sfx_lon")))
      .withColumn("source", when(col("ll").isNotNull, "COORDINATES")
        .when(col("gaz_lat").isNotNull, "GAZETTEER")
        .when(col("sfx_lat").isNotNull, "GAZETTEER_SUFFIX"))
      .filter(col("latitude").isNotNull &&
        col("latitude") =!= GeoParse.BadCoordinate)
      .select(
        col("entity_id"),
        lit(1).as("rank"),
        col("latitude"), col("longitude"),
        enriched("gaz_lat_s", "sfx_lat_s").cast("double").as("latitude_south"),
        enriched("gaz_lat_n", "sfx_lat_n").cast("double").as("latitude_north"),
        enriched("gaz_lon_w", "sfx_lon_w").cast("double").as("longitude_west"),
        enriched("gaz_lon_e", "sfx_lon_e").cast("double").as("longitude_east"),
        col("entity_text").as("name"),
        enriched("gaz_osm_type", "sfx_osm_type").cast("string").as("osm_type"),
        enriched("gaz_nga", "sfx_nga").cast("string").as("nga_designation"),
        enriched("gaz_country", "sfx_country").cast("string").as("country"),
        col("source"))
  }
}
