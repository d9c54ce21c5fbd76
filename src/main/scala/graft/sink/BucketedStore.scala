package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet staging (SURVEY §4: "co-locate joins via bucketing").
  *
  * Repeated merges against the same key columns re-shuffle both sides
  * every run. Persisting the target as a bucketed table clusters rows by
  * `hash(keys) % numBuckets` at write time, so subsequent equi-joins /
  * aggregations on those keys read co-located data and skip the
  * exchange entirely (the plan shows no `Exchange` on the bucketed
  * side). At 100 TB this converts the per-import merge from
  * "shuffle the target every time" to "shuffle the (small) staged side
  * only once, at write".
  */
object BucketedStore {

  /** Save as a bucketed, sorted managed table (bucket pruning + join
    * co-location). `numBuckets` should roughly match target parallelism
    * (files ≈ buckets × writing tasks; call `coalesce` upstream to keep
    * file counts sane).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // A managed-table location can survive a previous JVM whose
    // (in-process) metastore did not: `saveAsTable` then refuses with
    // LOCATION_ALREADY_EXISTS even in overwrite mode. Drop both halves.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val whDir = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = whDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(whDir)) fs.delete(whDir, true)
    val w = df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    val sorted = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    sorted.format("parquet").saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True if the physical plan of `df` contains a shuffle exchange —
    * used to assert co-location in tests and plan reviews.
    */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
