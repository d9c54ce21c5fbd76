package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` of named queries to
  * `<outDir>/<query>_<tag>.txt` — the plan evidence the optimization
  * rounds commit under `plans/rNN/`. Usage:
  *   runMain graft.ExplainDump <outDir> <tag> q268_theil_sen[,qNNN...]
  * Runs at sf0.01 (gate scale) so plan shapes match the driver's data,
  * with the bench's session conf (32 shuffle partitions, local[32]).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, tag, names) = args.take(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (q <- names.split(",")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${q}_$tag.txt"), plan)
      println(s"wrote $outDir/${q}_$tag.txt (${plan.length} chars)")
      operators.Retained.releaseAll(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
