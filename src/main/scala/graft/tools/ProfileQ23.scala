package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Dev-only stage profiler for the q23 MinHash-LSH pipeline. */
object ProfileQ23 {
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
      println(f"== $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
    val corpus = docs
      .unionAll(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      .unionAll(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          regexp_replace(col("text"), "^(\\S+\\s+){3}", "").as("text")))
    t("warm corpus")(corpus.count())
    val withSig = TextDedup.withMinhash(corpus, "doc_id", "text", 3, 12, 4).cache()
    t("withSig cache")(withSig.count())
    val cand = TextDedup.minhashCandidates(withSig, "doc_id").cache()
    t("cand cache")(println("   candidates=" + cand.count()))
    val sets = withSig.select(col("doc_id"), col("shingles"))
    val res = cand
      .join(sets.withColumnRenamed("doc_id", "id1").withColumnRenamed("shingles", "__sh1"), Seq("id1"))
      .join(sets.withColumnRenamed("doc_id", "id2").withColumnRenamed("shingles", "__sh2"), Seq("id2"))
      .withColumn("__common", size(array_intersect(col("__sh1"), col("__sh2"))))
      .withColumn("jaccard", col("__common").cast("double") /
        (size(col("__sh1")) + size(col("__sh2")) - col("__common")).cast("double"))
      .filter(col("jaccard") >= 0.5)
    t("verify")(println("   pairs=" + res.count()))
    spark.stop()
  }
}
