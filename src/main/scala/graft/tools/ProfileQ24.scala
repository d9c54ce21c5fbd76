package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextAnalysis, TextShingles}

/** Dev-only stage profiler for the q24 prefix-Jaccard pipeline. */
object ProfileQ24 {
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
    val threshold = 0.6
    val sets = corpus.select(col("doc_id").as("id"),
        array_distinct(TextShingles.shingles(TextAnalysis.tokens(col("text")), 3))
          .as("shingles"))
      .withColumn("n", size(col("shingles")))
      .cache()
    t("sets cache")(sets.count())
    println("   docs=" + sets.count() + " total_shingles=" +
      sets.agg(sum("n")).head.getLong(0))
    val exploded = sets.select(col("id"), col("n"), explode(col("shingles")).as("sh"))
    val dfreq = exploded.groupBy("sh").agg(count(lit(1)).as("df"))
    t("dfreq count")(println("   distinct_sh=" + dfreq.count()))
    val ranked = exploded.join(dfreq, "sh")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("df"), col("sh"))))
      .filter(col("rn") <= col("n") - ceil(col("n") * threshold - lit(1e-9)) + 1)
      .select(col("id"), col("n"), col("sh"), col("rn"))
      .cache()
    t("ranked cache")(println("   prefix_rows=" + ranked.count()))
    val minOverlap =
      ceil((col("a.n") + col("b.n")) * (threshold / (1 + threshold)) - lit(1e-9))
    val cand = ranked.as("a").join(ranked.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id") &&
        least(col("a.n"), col("b.n")) >=
          ceil(greatest(col("a.n"), col("b.n")) * threshold - lit(1e-9)) &&
        lit(1) + least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")) >= minOverlap)
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
      .cache()
    t("cand cache")(println("   candidates=" + cand.count()))
    val res = cand
      .join(sets.select(col("id").as("id1"), col("shingles").as("__s1")), Seq("id1"))
      .join(sets.select(col("id").as("id2"), col("shingles").as("__s2")), Seq("id2"))
      .withColumn("__common", size(array_intersect(col("__s1"), col("__s2"))))
      .withColumn("jaccard", col("__common").cast("double") /
        (size(col("__s1")) + size(col("__s2")) - col("__common")).cast("double"))
      .filter(col("jaccard") >= threshold)
    t("verify")(println("   pairs=" + res.count()))
    spark.stop()
  }
}
