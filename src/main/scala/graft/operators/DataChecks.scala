package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality validation — the expectation-suite gate an
 * ingestion pipeline runs before promoting a snapshot (the reference
 * validates row-by-row while mutating its store,
 * `/root/reference/src/GraphPopulator.groovy`; here the whole suite is
 * ONE aggregation). Each rule is a boolean `passWhen` column; a NULL
 * predicate counts as a violation (the standard expectation semantics —
 * a null can't prove it passed).
 *
 * Scale shape: `validate` evaluates ALL rules in a single
 * map-side-combined pass (one row of counters per partition, one 1-row
 * result unpivoted to O(rules) rows — the corpus is scanned once,
 * never shuffled). `uniqueKey` is one exact distinct (the only rule
 * that inherently shuffles); `fkOrphans` is an anti-join the optimizer
 * broadcasts when the parent's key side is small (dimension tables) —
 * both emit the same (check_name, n_rows, n_violations) row shape so a
 * suite unions into one report (q121).
 */
object DataChecks {

  /** One expectation: `passWhen` true ⇒ the row passes. */
  final case class Rule(name: String, passWhen: Column)

  /** Evaluate all rules in one pass: (check_name, n_rows, n_violations)
    * per rule, check_name-ordered deterministically by input order. */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(coalesce(r.passWhen, lit(false)), 0L).otherwise(1L))
          .as(s"v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case (r, i) => s"'${r.name}', v$i" }.mkString(", ")
    one.select(
      expr(s"stack(${rules.size}, $stackArgs) AS (check_name, n_violations)"),
      col("n_rows"))
      .select(col("check_name"), col("n_rows"), col("n_violations"))
  }

  /** Key-uniqueness expectation: violations = rows − distinct keys. */
  def uniqueKey(df: DataFrame, keyCols: Seq[String],
      name: String = "unique_key"): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - countDistinct(keyCols.head, keyCols.tail: _*))
          .as("n_violations"))
      .select(lit(name).as("check_name"), col("n_rows"),
        col("n_violations"))

  /** Functional-dependency expectation lhs → rhs: keys (lhs tuples)
    * determining MORE than one distinct rhs tuple violate; reported as
    * the number of violating keys (not rows — the key is the unit a
    * fixer deduplicates). One (lhs, rhs)-distinct pass + one lhs
    * aggregation; NULL rhs counts as a value (two rows (k, NULL) and
    * (k, 1) disagree). */
  def functionalDependency(df: DataFrame, lhs: Seq[String],
      rhs: Seq[String], name: String = "fd"): DataFrame = {
    val keyed = df
      .select((lhs ++ rhs).map(col): _*).distinct()
      .groupBy(lhs.map(col): _*)
      .agg(count(lit(1)).as("n_rhs"))
    df.agg(count(lit(1)).as("n_rows"))
      .crossJoin(keyed.agg(
        sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violations")))
      .select(lit(name).as("check_name"), col("n_rows"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))
  }

  /** Referential-integrity expectation: child rows whose key misses the
    * parent (NULL child keys count as orphans — they reference nothing). */
  def fkOrphans(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, name: String = "fk_orphans"): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey)).distinct(),
        col(childKey) === col(parentKey), "left_anti")
    child.agg(count(lit(1)).as("n_rows"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_violations")))
      .select(lit(name).as("check_name"), col("n_rows"),
        col("n_violations"))
  }
}
