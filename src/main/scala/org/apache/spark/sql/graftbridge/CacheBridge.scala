package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** Bridge into the `private[sql]` CacheManager so specs can assert the
  * engine's bounded-cache discipline (CacheScope release paths) against
  * the session's ACTUAL cached-plan registry, not just handles the test
  * happens to hold. */
object CacheBridge {
  /** True when the session has no cached Dataset plans. */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
