package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev-only stage profiler for the q28 hyperplane-LSH pipeline. */
object ProfileQ28 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
    val corpus = e.unionAll(e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("label"), col("embedding")))
    t("warm")(corpus.count())
    val keyed = corpus.select(col("label").as("bk"), col("vec_id").as("id"),
        col("embedding").as("v"))
      .withColumn("bandkeys",
        Similarity.hyperplaneBandKeys(col("v"), Similarity.hyperplaneWeights(24, 64), 4))
      .cache()
    t("keyed cache")(keyed.count())
    val exploded = keyed.select(col("bk"), col("id"),
      posexplode(col("bandkeys")).as(Seq("band_idx", "band_key")))
    val cand = exploded.as("a").join(exploded.as("b"),
        col("a.bk") === col("b.bk") && col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
      .cache()
    t("cand cache")(println("   candidates=" + cand.count()))
    val res = cand
      .join(keyed.select(col("id").as("id1"), col("v").as("v1")), Seq("id1"))
      .join(keyed.select(col("id").as("id2"), col("v").as("v2")), Seq("id2"))
      .withColumn("sim", Similarity.cosine(col("v1"), col("v2")))
      .filter(col("sim") >= 0.99)
    t("verify")(println("   pairs=" + res.count()))
    spark.stop()
  }
}
