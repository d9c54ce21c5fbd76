package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Top-k ranking comparison — rank-biased overlap (Webber, Moffat &
  * Zobel, TOIS'10): how much do two rankings of the same universe
  * agree, weighting agreement at the top far more than agreement at
  * depth? The metric every scorer swap should report before a 100 TB
  * curation pipeline replaces ranking A with ranking B: Kendall/
  * Spearman treat depth 3 and depth 3,000,000 alike; RBO's geometric
  * depth weights `p^(d−1)` match how consumers actually read a
  * ranking (top first, attention decaying).
  *
  * `RBO@D = (1−p) · Σ_{d=1..D} p^(d−1) · X_d / d`, where `X_d` is the
  * conjoint-prefix size `|A_{1..d} ∩ B_{1..d}|` (the truncated form —
  * no tail extrapolation — documented as the published value).
  *
  * Exactness discipline: the weights `p^(d−1)` are NOT floating
  * powers (`Math.pow` is allowed 1 ulp of slack — a cross-engine hash
  * killer) but the exact integer ppm recurrence
  * `w_1 = 1,000,000; w_{d+1} = (w_d · pPpm) div 1,000,000` — a
  * D-row sequence any engine reproduces digit-for-digit (DuckDB: a
  * recursive CTE). Each depth term is ONE IEEE divide of exact
  * integers rounded to 6 dp, summed in DECIMAL; the final `(1−p)`
  * scale is one more deterministic double multiply.
  *
  * Scale shape: one equi-join of the two D-row ranking heads, then
  * everything runs on the D-row depth grid (histQuantiles bin-frame
  * discipline — the single-partition prefix window is bounded by D,
  * never by data).
  */
object RankCompare {

  /** RBO at `depth` between two `(idCol, rankCol)` frames whose ranks
    * are 1..depth (dense, from any deterministic top-k). `pPpm` is
    * the persistence parameter in ppm (900,000 = p 0.9). Returns one
    * row `(depth, n_conjoint, rbo)` — `n_conjoint` the overlap of the
    * full heads, `rbo` the truncated rank-biased overlap, 6 dp.
    */
  def rbo(a: DataFrame, b: DataFrame, idCol: String, rankCol: String,
          depth: Int, pPpm: Long): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(pPpm > 0 && pPpm < 1000000L, s"pPpm must be in (0, 1e6), got $pPpm")
    val spark = a.sparkSession
    // exact integer ppm weights: w_1 = 1e6, w_{d+1} = w_d * p div 1e6
    val weights = Iterator.iterate(1000000L)(w => w * pPpm / 1000000L)
      .take(depth).zipWithIndex
      .map { case (w, i) => Row((i + 1).toLong, w) }.toSeq
    val wdf = spark.createDataFrame(
      spark.sparkContext.parallelize(weights, 1),
      StructType(Seq(StructField("d", LongType, nullable = false),
        StructField("w", LongType, nullable = false))))
    val conj = a.select(col(idCol).as("__id"), col(rankCol).cast("long").as("__ra"))
      .join(b.select(col(idCol).as("__id"), col(rankCol).cast("long").as("__rb")),
        Seq("__id"))
      .select(greatest(col("__ra"), col("__rb")).as("__dm"))
      .groupBy(col("__dm")).agg(count(lit(1)).as("__c"))
    // X_d = # conjoint pairs with max-rank <= d: prefix sum on the
    // D-row grid
    val grid = wdf.join(conj, wdf("d") === conj("__dm"), "left")
      .na.fill(0L, Seq("__c"))
    val wPrefix = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("__x", sum(col("__c")).over(wPrefix))
      .withColumn("__term", round(
        (col("w") * col("__x")).cast("double") /
          (col("d") * lit(1000000L)).cast("double"), 6)
        .cast("decimal(18,6)"))
      .agg(max(col("__x")).as("__nconj"),
        sum(col("__term")).as("__s"))
      .select(lit(depth.toLong).as("depth"),
        col("__nconj").cast("long").as("n_conjoint"),
        round(col("__s").cast("double") *
          (lit((1000000L - pPpm).toDouble) / lit(1000000.0)), 6).as("rbo"))
  }
}
