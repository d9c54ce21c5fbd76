package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-files compaction — the table-maintenance pass every long-lived
  * 100 TB dataset needs: streaming ingest, per-trigger micro-batches,
  * and over-parallel writers leave thousands of KB-sized parquet files
  * whose open/footer overhead dominates scans and whose listing cost
  * dominates planning. Compaction reads the directory once and
  * rewrites it at a target rows-per-file, with `maxRecordsPerFile` as
  * the hard cap so one skewed partition cannot produce a giant file.
  *
  * The rewrite must be INVISIBLE to queries — q237 pins result
  * identity against the pre-compaction data; MaintenanceSpec pins the
  * file arithmetic.
  */
object Compaction {

  /** Post-compaction accounting: input/output file counts and the row
    * count (preserved by construction, republished for audits).
    */
  final case class CompactionStats(nFilesIn: Long, nFilesOut: Long,
                                   nRows: Long)

  private def dataFiles(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count { st =>
      st.isFile && st.getPath.getName.startsWith("part-")
    }.toLong
  }

  /** Rewrite the parquet at `in` into `out` at ~`targetRecords` rows
    * per file: one count pass sizes the shuffle to
    * `ceil(n / targetRecords)` balanced partitions (round-robin), and
    * `maxRecordsPerFile` caps any residual imbalance. Output file
    * count is `parts` when balanced, at most `parts + spill` files
    * otherwise — never the input's file explosion.
    */
  def compactParquet(spark: SparkSession, in: String, out: String,
                     targetRecords: Long): CompactionStats = {
    require(targetRecords >= 1, s"targetRecords must be >= 1, got $targetRecords")
    val df = spark.read.parquet(in)
    val n = df.count()
    val parts = math.max(1L, (n + targetRecords - 1) / targetRecords).toInt
    df.repartition(parts).write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecords)
      .parquet(out)
    CompactionStats(dataFiles(spark, in), dataFiles(spark, out), n)
  }

  /** Read back a compacted directory (symmetry with BucketedStore). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
