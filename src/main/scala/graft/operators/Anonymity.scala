package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-audit primitives for export pipelines — the question a
  * curation run must answer before handing a table to a downstream
  * consumer: how re-identifiable are the rows? A release is
  * k-ANONYMOUS when every combination of quasi-identifier values (the
  * columns an attacker can link externally: region, segment, coarse
  * balance, ...) is shared by at least k rows; it is l-DIVERSE when
  * every such equivalence class also spans at least l distinct values
  * of the sensitive column (k-anonymity alone leaks when a whole
  * class shares one sensitive value). Complements [[graft.functions
  * .PiiMask]]: masking hides direct identifiers, these profiles
  * measure the quasi-identifier joinability that masking does not
  * touch.
  *
  * Scale shape: ONE hash aggregation over the raw rows builds the
  * equivalence-class frame (bounded by distinct quasi tuples, not
  * |rows|); the published histograms are one more hash agg over the
  * CLASS frame. No window, no collect, all-integer outputs — exact
  * and engine-portable by construction.
  */
object Anonymity {

  /** Class-size histogram: one row per equivalence-class size —
    * `(class_size, n_classes, n_rows)` — ordered by size. The
    * k-anonymity verdict for any k reads directly off the head of
    * this frame (rows with `class_size < k` are the exposed
    * population); publishing the full histogram instead of one
    * verdict row lets the consumer pick k after the fact.
    */
  def kAnonymityProfile(df: DataFrame,
                        quasiCols: Seq[String]): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("sz")).as("n_rows"))
      .orderBy(col("class_size"))
  }

  /** Diversity histogram: one row per distinct-sensitive-value count —
    * `(l_diversity, n_classes)` — ordered by diversity. Classes with
    * `l_diversity = 1` are full leaks (quasi tuple ⇒ sensitive value
    * with certainty); the l-diversity verdict for any l reads off the
    * head.
    */
  def lDiversityProfile(df: DataFrame, quasiCols: Seq[String],
                        sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count_distinct(col(sensitiveCol)).as("ldiv"))
      .groupBy(col("ldiv").as("l_diversity"))
      .agg(count(lit(1)).as("n_classes"))
      .orderBy(col("l_diversity"))
  }

  /** t-closeness profile (Li, Li & Venkatasubramanian, ICDE'07) — the
    * third rung of the privacy ladder: even an l-diverse class leaks
    * when its sensitive-value DISTRIBUTION differs sharply from the
    * table's (an attacker learns "this class skews high-balance"
    * without pinning a value). Per equivalence class this publishes
    * both distances of the paper: `t_emd`, the Earth-Mover's distance
    * for an ORDERED sensitive domain (`Σ_i |Σ_{j≤i}(P_j − Q_j)| /
    * (m−1)` over the m domain values in order), and `t_tv`, the total
    * variation / equal-distance form (`Σ_j |P_j − Q_j| / 2`) an
    * unordered domain would use. A release is t-close at threshold t
    * when every class's distance is ≤ t.
    *
    * Exactness: P_j = n_cj/n_c and Q_j = g_j/N are rationals; every
    * difference is computed over the common denominator n_c·N as the
    * exact integer `n_cj·N − g_j·n_c` in DECIMAL(38,0) (never a float
    * sum), and only the FINAL per-class value performs one IEEE
    * divide of exact operands, rounded to 6 dp — deterministic on any
    * engine. Scale shape: two hash aggs over the rows (class×value
    * and value marginals), then all work runs on the class×domain
    * GRID — bounded by |distinct quasi tuples| × |sensitive domain|,
    * never by |rows|; the cumulative-sum window partitions by class
    * over the domain-sized frame (histQuantiles bin-frame
    * discipline). Returns `(quasiCols..., n_rows, t_emd, t_tv)`.
    */
  def tClosenessProfile(df: DataFrame, quasiCols: Seq[String],
                        sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    val base = df.filter(col(sensitiveCol).isNotNull)
      .select(quasiCols.map(col) :+ col(sensitiveCol).as("__v"): _*)
    // ONE pass over the raw rows: the class × value aggregate.
    // Everything else — value marginals g_j, class sizes n_c, the
    // (N, m) scalars — derives from this grid-sized frame, so the
    // 100 TB table is scanned exactly once ([[Retained]]-tracked
    // persist: three lazy consumers below).
    val clsVal = Retained.track(
      base.groupBy(quasiCols.map(col) :+ col("__v"): _*)
        .agg(count(lit(1)).as("__ncj")).persist())
    val vals = clsVal.groupBy(col("__v")).agg(sum(col("__ncj")).as("__g"))
    val tot = vals.agg(sum(col("__g")).as("__N"),
      count(lit(1)).as("__m"))
    val clsSz = clsVal.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__ncj")).as("n_rows"))
    // class × domain grid: absent values contribute n_cj = 0 but still
    // advance the EMD prefix sum, so the grid must be dense. The join
    // back to the per-(class, value) counts is NULL-SAFE on the quasi
    // columns — SQL groupBy keeps a NULL quasi class, and a plain
    // equi-join would silently miss all its rows (zeroing every n_cj)
    val cv2 = clsVal.select((quasiCols.map(c => col(c).as(s"__r_$c")) :+
      col("__v").as("__rv") :+ col("__ncj")): _*)
    val joinCond = (quasiCols.map(c => col(c) <=> col(s"__r_$c")) :+
      (col("__v") === col("__rv"))).reduce(_ && _)
    val grid = clsSz.crossJoin(broadcast(vals))
      .join(cv2, joinCond, "left")
      .na.fill(0L, Seq("__ncj"))
      .drop((quasiCols.map(c => s"__r_$c") :+ "__rv"): _*)
      .crossJoin(broadcast(tot))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val w = Window.partitionBy(quasiCols.map(col): _*)
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("__d",
        d38(col("__ncj")) * d38(col("__N")) - d38(col("__g")) * d38(col("n_rows")))
      .withColumn("__cum", sum(col("__d")).over(w))
      .groupBy(quasiCols.map(col) :+ col("n_rows") :+ col("__N") :+ col("__m"): _*)
      .agg(sum(abs(col("__cum"))).as("__se"),
        sum(abs(col("__d"))).as("__st"))
      .withColumn("t_emd", // a 1-value domain has every class at
        // distance 0 (the (m−1) normalizer would be 0/0 ⇒ NaN)
        when(col("__m") === 1, lit(0.0)).otherwise(
          round(col("__se").cast("double") /
            (d38(col("__N")) * d38(col("n_rows")) * d38(col("__m") - 1))
              .cast("double"), 6)))
      .withColumn("t_tv", round(col("__st").cast("double") /
        (d38(lit(2)) * d38(col("__N")) * d38(col("n_rows"))).cast("double"), 6))
      .select(quasiCols.map(col) :+ col("n_rows") :+ col("t_emd") :+
        col("t_tv"): _*)
  }
}
