package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper shared by interpreted eval and generated code. */
object StripAccentsUtil {
  private val Combining = "\\p{InCombiningDiacriticalMarks}+"

  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: pure-ASCII strings can't carry diacritics; skip NFD.
    var i = 0
    var ascii = true
    while (ascii && i < str.length) { if (str.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFD).replaceAll(Combining, ""))
  }
}

/**
 * Unicode-accent stripping: NFD-decompose then drop combining diacritical
 * marks. Semantics of the reference's normalizer
 * (/root/reference/src/CorefBase.groovy:79,91 — `Normalizer.normalize(out,
 * Form.NFD).replaceAll("\\p{InCombiningDiacriticalMarks}+","")`), rebuilt as
 * a codegen'd Catalyst expression so coref key derivation stays inside
 * whole-stage codegen instead of falling out to a Scala UDF.
 */
case class StripAccents(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_accents requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(input: Any): Any =
    StripAccentsUtil.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripAccentsUtil.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}
