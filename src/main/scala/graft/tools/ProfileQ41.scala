package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only salted-vs-plain comparison on the q41 hot-key join. */
object ProfileQ41 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"== $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s (aqe=$aqe)")
    }
    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      when(col("l_orderkey") % 10 < 7, 0L).otherwise(col("l_orderkey") % 997)
        .as("skew_key"),
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val dim = spark.read.parquet(s"$sfDir/orders.parquet")
      .select((col("o_orderkey") % 997).as("skew_key")).distinct()
      .withColumn("bucket_mod", col("skew_key") % 5)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("bucket_mod"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
    // warm
    fact.count(); dim.count()
    t("plain shuffle join")(
      agg(fact.join(dim, "skew_key")).write.format("noop").mode("overwrite").save())
    t("salted join x8")(
      agg(graft.operators.Skew.saltedJoin(fact, dim, Seq("skew_key"), 8,
        hash(col("l_orderkey"), col("l_linenumber"))))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
