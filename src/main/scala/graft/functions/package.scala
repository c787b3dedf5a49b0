package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._

/**
 * Scalar function library. Every function here reproduces a scalar the
 * reference computes imperatively (citations on each), expressed as Spark
 * `Column` transforms so Catalyst can push, prune and codegen them.
 */
package object functions {

  /** Lift a Catalyst expression into a user-facing Column (classic Spark). */
  private[graft] def exprCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)

  /** Accent strip as a Column op (custom codegen'd expression). */
  def strip_accents(c: Column): Column = exprCol(StripAccents(ColumnBridge.expression(c)))

  /** Junk-char classes — /root/reference/src/CorefBase.groovy:44-46. */
  val JunkChars = "[\\^\"<>_]"
  val JunkCharsForLocs = "[\\^<>_]" // '"' is a good char in a location

  /**
   * Reference `normalizeStr` — /root/reference/src/CorefBase.groovy:75-87:
   * trim → upper → NFD accent strip → collapse whitespace → strip
   * leading/trailing non-word ([^A-Za-z0-9-]) → junk chars to space.
   */
  def normalize_str(c: Column, junkToRemove: String = JunkChars): Column = {
    val up = strip_accents(upper(trim(c)))
    val ws = regexp_replace(up, "\\s+", " ")
    val noLead = regexp_replace(ws, "^[^A-Za-z0-9-]+", "")
    val noTrail = regexp_replace(noLead, "[^A-Za-z0-9-]+$", "")
    regexp_replace(noTrail, junkToRemove, " ")
  }

  /** Reference `twitterNormalizeStr` — /root/reference/src/CorefBase.groovy:89-93. */
  def twitter_normalize_str(c: Column): Column = strip_accents(lower(trim(c)))

  /**
   * Digit-run guard — /root/reference/src/CorefBase.groovy:214-218: the list
   * of embedded `\d+` runs. Two keys may fuzzy-merge only if these are equal.
   */
  def digit_runs(c: Column): Column = regexp_extract_all(c, lit("\\d+"), lit(0))

  /** NBSP fixup — /root/reference/src/EntityExtractor.groovy:24-25. */
  def fix_nbsp(c: Column): Column = regexp_replace(c, " ", " ")

  /** Whitespace token count — /root/reference/src/AcrossDocPerCoref.groovy:35. */
  def token_count(c: Column): Column = size(split(c, "\\s+"))

  /** Place-name cleanup: strip one leading dash/space — /root/reference/src/Geocoder.groovy:146-152. */
  def place_cleanup(c: Column): Column = regexp_replace(c, "^[- ]", "")

  /**
   * Candidate predicate (strong/weak split) —
   * /root/reference/src/AcrossDocPerCoref.groovy:31-43 and org/loc variants.
   */
  def candidate_predicate(
      c: Column,
      charsMin: Int,
      tokensMax: Int,
      tokensMin: Int,
      charsetRegex: Option[String]): Column = {
    val base = (length(c) >= charsMin) &&
      token_count(c).between(tokensMin, tokensMax)
    charsetRegex.fold(base)(re => base && c.rlike(re))
  }

  /** Register SQL names for the custom expressions. */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "strip_accents",
      exprs => StripAccents(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "spanish_date_norm",
      exprs => SpanishDateNormalize(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot",
      exprs => VectorDot(exprs(0), exprs(1)),
      "scala_udf")
  }
}
