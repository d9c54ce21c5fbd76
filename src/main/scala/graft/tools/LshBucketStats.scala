package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** LSH band-bucket diagnostics for the kNN-graph tier
  * ([[graft.operators.KnnGraph.knnEdgesLsh]]): per-band bucket count,
  * max/p99 width, and the implied candidate-pair mass (Σ width²) —
  * the numbers that say whether the 8192 hot-bucket cap is binding
  * (recall at risk) or the corpus has simply outgrown the band key's
  * bit width (pair mass grows ~n²/2^r per band; the principled lever
  * is more planes, a RECALL trade the operator won't take silently).
  *
  * Usage: runMain graft.tools.LshBucketStats [sfDir] [numPlanes] [bands]
  */
object LshBucketStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val adaptive = args.lift(1).contains("adaptive")
    val numPlanes = if (adaptive) 0 else args.lift(1).map(_.toInt).getOrElse(24)
    val bands = args.lift(2).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    // `adaptive` mode replays knnEdgesLshAdaptive's keying (r from n,
    // sliced 16-bit-family planes) so the pair-mass curve the adaptive
    // tier actually sees is what gets measured
    val weights = if (adaptive) {
      val n = e.count()
      val r = graft.operators.KnnGraph.adaptiveBits(n, 128L, 4, 16)
      println(s"[lsh-stats] adaptive: n=$n r=$r bits/band")
      val full = Similarity.hyperplaneWeights(bands * 16, 64)
      Array.tabulate(bands * r) { i => full((i / r) * 16 + (i % r)) }
    } else Similarity.hyperplaneWeights(numPlanes, 64)
    val keyed = e.select(
        Similarity.hyperplaneBits(col("embedding"), weights).as("bits"))
      .withColumn("keys",
        Similarity.packBandKeys(col("bits"), bands, weights.length / bands))
      .select(posexplode(col("keys")).as(Seq("band", "key")))
    val w = keyed.groupBy("band", "key").agg(count(lit(1)).as("width"))
    w.agg(count(lit(1)).as("n_buckets"),
        max("width").as("max_width"),
        expr("percentile_approx(width, 0.99)").as("p99_width"),
        sum(expr("width * width")).as("candidate_pair_mass"))
      .show(false)
    spark.stop()
  }
}
