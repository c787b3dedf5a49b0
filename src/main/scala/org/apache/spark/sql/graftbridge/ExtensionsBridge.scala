package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Bridge into `private[sql]` extension-builder accessors so specs can
  * assert what a [[SparkSessionExtensions]] instance actually registered. */
object ExtensionsBridge {
  def optimizerRules(ext: SparkSessionExtensions,
      session: SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(session)
}
