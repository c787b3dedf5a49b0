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
        lit(null).cast("double").as("latitude_south"),
        lit(null).cast("double").as("latitude_north"),
        lit(null).cast("double").as("longitude_west"),
        lit(null).cast("double").as("longitude_east"),
        col("entity_text").as("name"),
        lit(null).cast("string").as("osm_type"),
        lit(null).cast("string").as("nga_designation"),
        lit(null).cast("string").as("country"),
        col("source"))
  }
}
