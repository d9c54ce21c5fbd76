package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chi-square test of independence over a two-way contingency table,
  * plus Cramér's V effect size — the categorical-drift / association
  * audit (is `lang` independent of `source`? did the label mix shift
  * between snapshots?).
  *
  * Scale shape: ONE hash aggregation over the raw rows builds the
  * `(a, b, o)` cell frame (bounded by |A|·|B| cells, not |rows|);
  * marginals are two more hash aggs over the CELL frame; the χ²
  * terms are evaluated per cell and summed. No window, no collect.
  * The cell frame is PERSISTED ([[Retained]]-tracked): marginals,
  * totals and the grid all branch from it, and without the persist
  * each branch re-runs the raw-table scan + aggregation — four full
  * input passes for one dimension-bounded intermediate. Persist cost
  * is |A|·|B| rows, release via `Retained.releaseAll`.
  *
  * Exactness: the per-cell term is algebraically
  * `(o − e)²/e = (o·n − r·c)² / (n·r·c)` — numerator and denominator
  * are exact BIGINT/DECIMAL products of counts, so the only float op
  * per cell is one division, rounded 6 dp and summed in DECIMAL
  * (order-independent, portable across engines).
  */
object Contingency {

  /** One row: `(n, n_a, n_b, dof, chi2, cramers_v)` for the `aCol` ×
    * `bCol` table. `cramers_v = sqrt(χ² / (n·min(|A|−1,|B|−1)))`,
    * NULL when either dimension is constant (dof = 0).
    */
  def chiSquareIndependence(df: DataFrame, aCol: String,
                            bCol: String): DataFrame = {
    val cells = Retained.track(cellFrame(df, aCol, bCol))
    val rowTot = cells.groupBy("a").agg(sum(col("o")).as("r"))
    val colTot = cells.groupBy("b").agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"),
      count_distinct(col("a")).as("n_a"),
      count_distinct(col("b")).as("n_b"))
    // the FULL |A|×|B| grid, not just observed cells: a zero cell still
    // contributes (0−e)²/e = r·c/n² ... scaled below — dropping zeros
    // understates χ² exactly where association is strongest. Broadcast
    // the column-marginal side explicitly: both sides are
    // dimension-bounded, but without the hint the planner sometimes
    // picks a shuffling CartesianProduct over the bounded-build
    // nested-loop (q198's plan audit caught it doing exactly that)
    val grid = rowTot.crossJoin(broadcast(colTot))
      .join(cells, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    // every χ² term (o·n − r·c)²/(n·r·c): integer numerator/denominator,
    // one float divide per CELL, 6-dp rounded, summed in DECIMAL
    val terms = grid
      .crossJoin(broadcast(tot))
      .withColumn("__d",
        (col("o") * col("n") - col("r") * col("c")).cast("decimal(19,0)"))
      .withColumn("term", round(
        (col("__d") * col("__d")).cast("double") /
          (col("n") * col("r") * col("c")).cast("double"), 6)
        .cast("decimal(18,6)"))
    terms.groupBy("n", "n_a", "n_b")
      .agg(sum(col("term")).cast("decimal(28,6)").as("chi2d"))
      .withColumn("dof",
        ((col("n_a") - 1L) * (col("n_b") - 1L)).cast("long"))
      .withColumn("chi2", col("chi2d").cast("double"))
      .withColumn("cramers_v",
        when(least(col("n_a"), col("n_b")) <= 1L, lit(null).cast("double"))
          .otherwise(round(sqrt(col("chi2d").cast("double") /
            (col("n") * (least(col("n_a"), col("n_b")) - 1L)).cast("double")),
            6)))
      .select(col("n"), col("n_a"), col("n_b"), col("dof"),
        col("chi2"), col("cramers_v"))
  }

  /** The shared `(a, b, o)` cell aggregation — the single raw-row pass
    * every contingency statistic branches from; persisted at call sites
    * (dimension-bounded, so the persist is sketch-sized).
    */
  private def cellFrame(df: DataFrame, aCol: String,
                        bCol: String): DataFrame =
    df.select(col(aCol).as("a"), col(bCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
      .persist()

  /** Cohen's kappa — chance-corrected agreement between two
    * categorical labelings of the same rows (classifier vs gold,
    * annotator vs annotator): κ = (p_o − p_e)/(1 − p_e). Cleared of
    * denominators, κ = (n·D − Σ_k r_k·c_k) / (n² − Σ_k r_k·c_k) with
    * D = Σ diagonal — ALL-integer numerator and denominator, so the
    * only float op is one division, rounded 6 dp.
    *
    * Scale shape: one hash agg to cells, two cell-frame aggs for the
    * marginals, one broadcast join on the label key. Returns one row
    * `(n, n_agree, po, pe, kappa)`; κ NULL when p_e = 1 (both sides
    * constant and equal — agreement is undefined, not perfect).
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = Retained.track(cellFrame(df, aCol, bCol))
    val rowTot = cells.groupBy("a").agg(sum(col("o")).as("r"))
    val colTot = cells.groupBy("b").agg(sum(col("o")).as("c"))
    // Σ r_k·c_k joins the marginals on the LABEL (categories present on
    // either side contribute only when present on both)
    val pe = rowTot.join(colTot, col("a") === col("b"))
      .agg(coalesce(sum((col("r") * col("c")).cast("decimal(19,0)")),
        lit(0).cast("decimal(19,0)")).as("rc"))
    val agree = cells.filter(col("a") === col("b"))
      .agg(coalesce(sum(col("o")), lit(0L)).as("d"))
    cells.agg(sum(col("o")).as("n"))
      .crossJoin(broadcast(agree)).crossJoin(broadcast(pe))
      .withColumn("po", round(col("d").cast("double") / col("n").cast("double"), 6))
      .withColumn("pe", round(col("rc").cast("double") /
        (col("n") * col("n")).cast("double"), 6))
      .withColumn("kappa",
        // (19,0)×(19,0) → (38,0): inside BOTH engines' decimal cap
        when((col("n") * col("n")).cast("decimal(19,0)") === col("rc"),
          lit(null).cast("double"))
          .otherwise(round(
            (col("n").cast("decimal(19,0)") * col("d").cast("decimal(19,0)") -
              col("rc")).cast("double") /
              ((col("n") * col("n")).cast("decimal(19,0)") - col("rc"))
                .cast("double"), 6)))
      .select(col("n"), col("d").as("n_agree"), col("po"), col("pe"),
        col("kappa"))
  }

  /** Mutual information (nats) between two categorical columns — the
    * feature-association screen that, unlike χ², is directly
    * comparable across tables as "bits of shared information". Same
    * cell/marginal shape as [[chiSquareIndependence]]; zero cells
    * contribute 0 (lim p→0 of p·ln is 0), so only OBSERVED cells
    * enter. Per-cell term `c_ab · round(ln(c_ab·n / (r·c)), 6)` —
    * exact integer ratio inside one rounded ln, summed in DECIMAL
    * (order-independent, engine-portable; the tokenEntropy doctrine).
    * Returns one row `(n, n_a, n_b, sum_cmi, mi)` where
    * `mi = round(sum_cmi / n, 6)` and `sum_cmi = Σ c·ln-term` is the
    * exact published sum.
    */
  def mutualInformation(df: DataFrame, aCol: String,
                        bCol: String): DataFrame = {
    val cells = Retained.track(cellFrame(df, aCol, bCol))
    val rowTot = cells.groupBy("a").agg(sum(col("o")).as("r"))
    val colTot = cells.groupBy("b").agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"),
      count_distinct(col("a")).as("n_a"),
      count_distinct(col("b")).as("n_b"))
    cells.join(rowTot, Seq("a")).join(colTot, Seq("b"))
      .crossJoin(broadcast(tot))
      .withColumn("__t", (col("o") * round(log(
        (col("o") * col("n")).cast("double") /
          (col("r") * col("c")).cast("double")), 6).cast("decimal(18,6)"))
        .cast("decimal(28,6)"))
      .groupBy("n", "n_a", "n_b")
      .agg(sum(col("__t")).cast("decimal(28,6)").as("__s"))
      .select(col("n"), col("n_a"), col("n_b"),
        col("__s").cast("double").as("sum_cmi"),
        round(col("__s").cast("double") / col("n").cast("double"), 6)
          .as("mi"))
  }
}
