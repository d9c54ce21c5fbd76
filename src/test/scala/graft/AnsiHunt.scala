package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic for the r14/r15 q276 DIVIDE_BY_ZERO hunt: runs a list of
  * queries in bench order and prints `spark.sql.ansi.enabled` (both the
  * session conf and the thread-local SQLConf the expression constructors
  * actually read) before and after each, then runs q276 last and reports
  * pass/fail. Usage:
  *   Test/runMain graft.AnsiHunt <sfDir> <q1,q2,...>
  */
object AnsiHunt {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def ansi(): String = {
      val sess = spark.conf.getOption("spark.sql.ansi.enabled")
        .getOrElse("unset")
      val tl = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled
      val active = SparkSession.getActiveSession.map(
        s => System.identityHashCode(s).toString).getOrElse("none")
      s"session=$sess threadLocal=$tl activeSession=$active"
    }
    println(s"START  ${ansi()}")
    for (name <- names) {
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"ran $name%-28s ${ansi()}")
      } catch { case e: Throwable =>
        println(f"ran $name%-28s FAILED ${e.getClass.getSimpleName} ${ansi()}")
      }
      operators.Retained.releaseAll(spark)
      spark.catalog.clearCache()
    }
    try {
      val n = SparkEntry.queries("q276_link_suite")(spark, sfDir).collect().length
      println(s"q276 OK rows=$n  ${ansi()}")
    } catch { case e: Throwable =>
      println(s"q276 FAILED ${e.getClass.getSimpleName}: " +
        Option(e.getMessage).getOrElse("").take(120) + s"  ${ansi()}")
    }
    spark.stop()
  }
}
