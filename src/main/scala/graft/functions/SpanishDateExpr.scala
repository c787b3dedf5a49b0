package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Runtime for [[SpanishDateNormalize]]: the reference's DateNormalizer/
 * NormalizedDate semantics (citations in [[SpanishDate]]) with regexes
 * compiled once per JVM. Shared by interpreted eval and generated code.
 *
 * Exists because the equivalent pure-Column regexp chain builds a ~100-node
 * expression tree (every group extraction repeats the pattern), which cost
 * ~45 s of plan/codegen time per query — a scalar this hot belongs in one
 * codegen'd expression (SURVEY.md §4 "custom expressions only").
 */
object SpanishDateUtil {
  private val P1 = Pattern.compile(SpanishDate.Pattern1)
  private val P2s = Pattern.compile(SpanishDate.Pattern2Slash)
  private val P2d = Pattern.compile(SpanishDate.Pattern2Dash)
  private val P3 = Pattern.compile(SpanishDate.Pattern3)
  private val Ws = Pattern.compile("\\s+")
  private val NonDigit = Pattern.compile("[^0-9]")

  private val MonthNum: Map[String, String] =
    (SpanishDate.longMonthNames.zipWithIndex ++ SpanishDate.shortMonthNames.zipWithIndex)
      .map { case (m, i) => m -> f"${i % 12 + 1}%02d" }.toMap

  def normalize(input: UTF8String): UTF8String = {
    val norm = Ws.matcher(input.toString.toLowerCase).replaceAll(" ")
    var d: String = null; var mo: String = null; var y: String = null
    val m1 = P1.matcher(norm)
    if (m1.find()) { d = m1.group(1); mo = m1.group(2); y = m1.group(3) }
    else {
      // Pattern 2 is ONE regex in the reference with a \2 separator
      // backreference (slash or dash) → leftmost match wins regardless of
      // separator. RE2-safe expansion: run both variants and keep the one
      // whose match starts first (slash wins start-offset ties; a tie can't
      // happen in practice since the separators differ at the same offset).
      val m2 = P2s.matcher(norm)
      val m3 = P2d.matcher(norm)
      val f2 = m2.find()
      val f3 = m3.find()
      if (f2 && (!f3 || m2.start() <= m3.start())) {
        d = m2.group(1); mo = m2.group(2); y = m2.group(3)
      } else if (f3) {
        d = m3.group(1); mo = m3.group(2); y = m3.group(3)
      } else {
        val m4 = P3.matcher(norm)
        if (m4.find()) { d = m4.group(2); mo = m4.group(1); y = m4.group(3) }
        else return null
      }
    }
    val month = MonthNum.getOrElse(mo, null)
    val year = resolveYear(y)
    if (month == null || year == null) null
    else UTF8String.fromString(s"$year/$month/${if (d.length == 1) "0" + d else d}")
  }

  /** NormalizedDate.resolveYear: 2-digit pivot ≤12→20xx else 19xx; 4-digit
    * valid 1900-2012 (dots stripped). */
  private def resolveYear(y: String): String = {
    val digits = NonDigit.matcher(y).replaceAll("")
    if (digits.length == 2) {
      val n = digits.toInt
      if (n <= 12) String.valueOf(2000 + n) else String.valueOf(1900 + n)
    } else if (digits.length == 4) {
      val n = digits.toInt
      if (n >= 1900 && n <= 2012) digits else null
    } else null
  }
}

/** Codegen'd Spanish-date normalization: string → `YYYY/MM/DD` or NULL. */
case class SpanishDateNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"spanish_date_norm requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "spanish_date_norm"

  override def nullSafeEval(input: Any): Any =
    SpanishDateUtil.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SpanishDateUtil.normalize($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): SpanishDateNormalize =
    copy(child = newChild)
}
