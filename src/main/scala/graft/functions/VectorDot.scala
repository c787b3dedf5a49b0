package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Unboxed dot-product helpers over Catalyst ArrayData. The higher-order
 * `zip_with` + `aggregate` formulation allocates an intermediate array and
 * boxes every element through lambda variables per row; embeddings-heavy
 * operators (ANN top-k, near-dup) spend their whole budget there. These
 * loops read primitives straight out of the columnar array.
 */
object VectorOps {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    s
  }
  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/**
 * `dot(Array[Float|Double], Array[Float|Double]) → Double` as a codegen'd
 * expression. Sequential accumulation order — bit-identical to the
 * zip_with/aggregate formulation it replaces (oracle parity preserved).
 */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elem(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left).isDefined && elem(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot requires array<float|double> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  private lazy val method: String = (elem(left).get, elem(right).get) match {
    case (FloatType, FloatType) => "dotFF"
    case (FloatType, DoubleType) => "dotFD"
    case (DoubleType, FloatType) => "dotDF"
    case (DoubleType, DoubleType) => "dotDD"
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    method match {
      case "dotFF" => VectorOps.dotFF(x, y)
      case "dotFD" => VectorOps.dotFD(x, y)
      case "dotDF" => VectorOps.dotDF(x, y)
      case "dotDD" => VectorOps.dotDD(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.$method($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/**
 * Unboxed kernels for the other hot vector folds ([[VectorOps]]'
 * round-15 siblings). Same caller contract as the dot kernels: dense
 * (no null elements) equal-length arrays — every call site in this
 * engine constructs both sides itself (signatures, code arrays,
 * plan-literal centroid rows), so the zip_with null/pad semantics the
 * HOF formulation had were dead paths.
 */
object VectorFoldOps {
  // Element accessor tags (see [[VectorSqL2.tag]]).
  @inline private def getD(a: ArrayData, i: Int, t: Int): Double = t match {
    case 0 => a.getDouble(i)
    case 1 => a.getFloat(i).toDouble
    case 2 => a.getLong(i).toDouble
    case _ => a.getInt(i).toDouble
  }

  /** Σ (aᵢ − bᵢ)² with each element cast to double first — the exact
    * accumulation order of `aggregate(zip_with(a, b, (x, y) =>
    * (x.cast(double) − y)²), 0.0, _ + _)`, so results are bit-identical
    * to the HOF formulation this replaces (oracle parity preserved). */
  def sqL2(a: ArrayData, b: ArrayData, ta: Int, tb: Int): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = getD(a, i, ta) - getD(b, i, tb)
      s += d * d; i += 1
    }
    s
  }

  /** Exact BIGINT dot of two long code arrays — the accumulation of
    * `aggregate(zip_with(a, b, _ * _), 0L, _ + _)` (integer adds:
    * order-insensitive, wrap-identical). */
  def dotLL(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L; var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Count of positions where two long arrays agree — the MinHash
    * signature-agreement fold (`Σ 1{aᵢ = bᵢ}` as INT). */
  def eqCountLL(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0; var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) s += 1; i += 1 }
    s
  }

  /** [[eqCountLL]] over string signatures (the portable md5 hash family
    * stores hex-string components). */
  def eqCountSS(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0; var i = 0
    while (i < n) {
      if (a.getUTF8String(i).equals(b.getUTF8String(i))) s += 1
      i += 1
    }
    s
  }
}

/**
 * `sq_l2(array<numeric>, array<numeric>) → Double`: squared L2 distance
 * as one codegen'd expression — replaces the interpreted
 * `aggregate(zip_with(...))` fold that every IVF/PQ distance, coarse
 * assignment and ADC LUT build previously spent its per-row budget in
 * (lambda-variable boxing per element). Bit-identical accumulation
 * order (see [[VectorFoldOps.sqL2]]).
 */
case class VectorSqL2(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.{IntegerType, LongType}

  private def tag(e: Expression): Option[Int] = e.dataType match {
    case ArrayType(DoubleType, _) => Some(0)
    case ArrayType(FloatType, _) => Some(1)
    case ArrayType(LongType, _) => Some(2)
    case ArrayType(IntegerType, _) => Some(3)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (tag(left).isDefined && tag(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_l2 requires array<double|float|bigint|int> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_l2"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorFoldOps.sqL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      tag(left).get, tag(right).get)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorFoldOps.sqL2($a, $b, ${tag(left).get}, ${tag(right).get})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorSqL2 =
    copy(left = newLeft, right = newRight)
}

/**
 * `dot_long(array<bigint>, array<bigint>) → Long`: the exact integer
 * code dot ([[VectorFoldOps.dotLL]]) as a codegen'd expression — the
 * SQ8 serving scorer's inner loop.
 */
case class VectorDotLong(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.LongType

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_long requires array<bigint> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "dot_long"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorFoldOps.dotLL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorFoldOps.dotLL($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotLong =
    copy(left = newLeft, right = newRight)
}

/**
 * `eq_count(array<bigint|string>, same) → Int`: positions where two
 * signature arrays agree — the MinHash est_jaccard numerator as one
 * codegen'd fold instead of an interpreted zip_with/aggregate pair per
 * candidate row.
 */
case class VectorEqCount(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

  private def kind: Option[String] = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => Some("eqCountLL")
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => Some("eqCountSS")
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (kind.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"eq_count requires two array<bigint> or two array<string> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "eq_count"

  override def nullSafeEval(a: Any, b: Any): Any = kind.get match {
    case "eqCountLL" => VectorFoldOps.eqCountLL(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    case _ => VectorFoldOps.eqCountSS(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorFoldOps.${kind.get}($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorEqCount =
    copy(left = newLeft, right = newRight)
}
