package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximation diagnostics for pair-generation tiers: given an
  * approximate pair set (LSH candidates, banded buckets, sampled
  * verify) and the exact ground truth, report the confusion counts and
  * precision/recall — "the quality of the approximation is measured,
  * not guessed". One row out; the joins hash on the normalized pair
  * key, so corpus size never enters — cost scales with the PAIR sets.
  */
object PairMetrics {

  /** (n_approx, n_exact, n_common, precision, recall) as one row.
    * Pairs are normalized to (min,max) so orientation never miscounts;
    * ratios are exact-integer divisions rounded to 6 decimals, and the
    * empty-set edges define 0/0 as 1.0 (an empty approximation of an
    * empty truth is perfect).
    */
  def confusion(approx: DataFrame, exact: DataFrame,
                id1: String = "id1", id2: String = "id2"): DataFrame = {
    def norm(df: DataFrame) = df.select(
      least(col(id1), col(id2)).as("p"), greatest(col(id1), col(id2)).as("q"))
      .distinct()
    val a = norm(approx)
    val e = norm(exact)
    val nA = a.agg(count(lit(1)).as("n_approx"))
    val nE = e.agg(count(lit(1)).as("n_exact"))
    val nC = a.join(e, Seq("p", "q")).agg(count(lit(1)).as("n_common"))
    nA.crossJoin(broadcast(nE)).crossJoin(broadcast(nC))
      .select(col("n_approx"), col("n_exact"), col("n_common"),
        when(col("n_approx") === 0, lit(1.0)).otherwise(round(
          col("n_common").cast("double") / col("n_approx").cast("double"), 6))
          .as("precision"),
        when(col("n_exact") === 0, lit(1.0)).otherwise(round(
          col("n_common").cast("double") / col("n_exact").cast("double"), 6))
          .as("recall"))
  }
}
