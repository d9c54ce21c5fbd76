package graft.operators

import org.apache.spark.sql.DataFrame
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
}
