package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Spanish free-text date normalization → `YYYY/MM/DD` strings —
 * /root/reference/src/DateNormalizer.groovy:12-72 (the three regex families)
 * and /root/reference/src/NormalizedDate.groovy:44-110 (day/month/year
 * resolution incl. the 2-digit-year pivot ≤12→20xx else 19xx and the valid
 * range 1900–2012).
 *
 * Deviations (documented): the reference's pattern-2 uses a `\2`
 * backreference to force a consistent separator; we expand it into slash and
 * dash variants (identical accept language, leftmost-match selection
 * preserved by comparing match offsets). Where the reference would emit a
 * partially-null "null/MM/DD" string on an out-of-range year we return NULL.
 */
object SpanishDate {
  private[functions] val longMonthNames = Seq(
    "enero", "febrero", "marzo", "abril", "mayo", "junio",
    "julio", "agosto", "septiembre", "octubre", "noviembre", "diciembre")
  private[functions] val shortMonthNames = Seq(
    "ene", "feb", "mar", "abr", "may", "jun",
    "jul", "ago", "sep", "oct", "nov", "dic")
  private val LongMonths = longMonthNames
  private val ShortMonths = shortMonthNames

  private val LongMonth = LongMonths.mkString("(?:", "|", ")")
  private val ShortMonth = ShortMonths.mkString("(?:", "|", ")")
  private val Day = "(?:[1-9]|0[1-9]|[1-2][0-9]|30|31)"
  private val Year4 = "(?:1\\.?9[0-9][0-9]|2\\.?0[01][0-9])"
  private val Year2 = "(?:[0-9][0-9])"

  /** `d (de)? <longmonth> (de|del|del año)? yyyy` — DateNormalizer.groovy:30 */
  val Pattern1 = s"($Day) (?:de )?($LongMonth) (?:de |del |del año )?($Year4)"
  /** `d/(mon|month)/(yy|yyyy)` — DateNormalizer.groovy:47, slash variant */
  val Pattern2Slash = s"(?:el día )?($Day)/($ShortMonth|$LongMonth)/($Year4|$Year2)"
  /** dash variant of the same */
  val Pattern2Dash = s"(?:el día )?($Day)-($ShortMonth|$LongMonth)-($Year4|$Year2)"
  /** `<longmonth> d del? yyyy` — DateNormalizer.groovy:59 (month first) */
  val Pattern3 = s"($LongMonth) ($Day) del? ($Year4)"

  private def monthMap: Column = {
    val entries = (LongMonths ++ ShortMonths).zipWithIndex.flatMap { case (m, i) =>
      Seq(lit(m), lit(f"${i % 12 + 1}%02d"))
    }
    map(entries: _*)
  }

  private def resolveYear(y: Column): Column = {
    val digits = regexp_replace(y, "[^0-9]", "")
    val n = digits.cast("int")
    when(length(digits) === 2,
      when(n <= 12, n + 2000).otherwise(n + 1900).cast("string"))
      .when(length(digits) === 4 && n.between(1900, 2012), digits)
      .otherwise(lit(null))
  }

  /**
   * Normalize a Spanish date phrase to a `YYYY/MM/DD` string Column, or NULL
   * when no pattern matches / the year is out of range. Delegates to the
   * codegen'd [[SpanishDateNormalize]] expression (one compiled-regex call
   * per row; the pure-Column variant below builds a ~100-node tree that
   * costs ~45 s of planning/codegen).
   */
  def spanish_date_normalize(c: Column): Column =
    graft.functions.exprCol(SpanishDateNormalize(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /**
   * Pure-Column reference implementation (kept for cross-validation in
   * FunctionsSpec — same accept language and resolution as the expression).
   */
  def spanish_date_normalize_cols(c: Column): Column = {
    val norm = regexp_replace(lower(c), "\\s+", " ")

    // (day, month, year) group order per pattern; pattern 3 is month-first.
    def extract(p: String, d: Int, m: Int, y: Int): Column =
      when(regexp_extract(norm, p, y) =!= "",
        struct(
          regexp_extract(norm, p, d).as("d"),
          regexp_extract(norm, p, m).as("m"),
          regexp_extract(norm, p, y).as("y")))

    // Pattern 2 is one regex in the reference (separator backreference):
    // leftmost match wins across the slash/dash expansion, not slash-first.
    val slashPos = call_function("regexp_instr", norm, lit(Pattern2Slash))
    val dashPos = call_function("regexp_instr", norm, lit(Pattern2Dash))
    val p2 = when(slashPos > 0 && (dashPos === 0 || slashPos <= dashPos),
        extract(Pattern2Slash, 1, 2, 3))
      .when(dashPos > 0, extract(Pattern2Dash, 1, 2, 3))

    val hit = coalesce(
      extract(Pattern1, 1, 2, 3),
      p2,
      extract(Pattern3, 2, 1, 3),
      lit(null))

    val day = lpad(hit.getField("d"), 2, "0")
    val month = element_at(monthMap, hit.getField("m"))
    val year = resolveYear(hit.getField("y"))
    when(hit.isNotNull && year.isNotNull && month.isNotNull,
      concat_ws("/", year, month, day))
  }

  /** Same, as a proper DateType Column. */
  def spanish_date(c: Column): Column =
    to_date(spanish_date_normalize(c), "yyyy/MM/dd")
}
