package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.{SpanishDateNormalize, StripAccents, VectorDot}

/**
 * Optimizer rule: rewrite threshold comparisons on the 2-arg
 * `levenshtein` into the bounded 3-arg form, whose DP early-exits once
 * the distance exceeds the bound — O(k·min(m,n)) instead of O(m·n) per
 * pair. This is exactly the hot shape of fuzzy-merge predicates (the
 * coref merge and q39 call the bounded form directly; the rule gives
 * the same plan to any user SQL `levenshtein(a, b) <= k`).
 *
 * The 3-arg form returns -1 when the distance exceeds the threshold, so
 * `lev(a,b) <= k  ⟺  lev(a,b,k) != -1` for k >= 0 (and `< k` lowers the
 * bound by one). Null propagation is identical on both forms.
 */
object BoundedLevenshteinRule extends Rule[LogicalPlan] {
  private def bounded(a: Expression, b: Expression, k: Int): Expression =
    Not(EqualTo(Levenshtein(a, b, Some(Literal(k))), Literal(-1)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 => bounded(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 => bounded(a, b, k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 => bounded(a, b, k)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 => bounded(a, b, k - 1)
    }
}

/**
 * Session extensions (enable with
 * `spark.sql.extensions=graft.plans.GraftExtensions` or
 * `builder.withExtensions(new GraftExtensions)`): registers the custom
 * codegen'd expressions as SQL functions in every session — no
 * per-session `registerAll` call needed — and installs
 * [[BoundedLevenshteinRule]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BoundedLevenshteinRule)
    ext.injectFunction((FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (exprs: Seq[Expression]) => StripAccents(exprs.head)))
    ext.injectFunction((FunctionIdentifier("spanish_date_norm"),
      new ExpressionInfo(classOf[SpanishDateNormalize].getName, "spanish_date_norm"),
      (exprs: Seq[Expression]) => SpanishDateNormalize(exprs.head)))
    ext.injectFunction((FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
  }
}
