package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Bridge to Spark's `private[sql]` cache-manager state: lets specs
  * assert that the `Retained` release contract actually leaves the
  * session's cache empty (there is no public API for "is anything
  * cached", only per-table `catalog.isCached`).
  */
object CacheBridge {
  def isCacheEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[ClassicSession].sharedState.cacheManager.isEmpty
}
