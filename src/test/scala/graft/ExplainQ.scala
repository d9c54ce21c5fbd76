package graft
import org.apache.spark.sql.SparkSession
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q")
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan.toString
      plan.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Scan parquet") ||
          l.contains("WholeStageCodegen") || l.contains("Sort ") ||
          l.contains("Window"))
        .foreach(println)
      if (plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin"))
        println(s"!!! $q plan contains a cartesian/nested-loop join")
    }
    spark.stop()
  }
}
