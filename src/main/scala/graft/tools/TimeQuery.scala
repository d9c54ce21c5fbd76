package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: runs one SparkEntry query N times in a warm JVM and
  * prints per-iteration wall time — separates codegen/JIT warmup from
  * steady-state cost when chasing a bench outlier.
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <queryName> [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val reps = if (args.length > 2) args(2).toInt else 3
    // mirror Bench's session exactly (UTC, shuffle partitions = cpus) —
    // this tool explains Bench outliers, so it must run Bench's plans
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-time")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[time] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
