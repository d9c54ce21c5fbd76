package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-way analysis of variance — the parametric k-group mean test
  * completing the battery around [[RankTests.kruskalWallis]] (its
  * rank twin), Welch's t (q130, two groups), and the paired tests:
  * "do the k group MEANS differ more than chance", plus the η²
  * effect size (share of variance explained by the grouping) that a
  * bare p-value hides. Brown–Forsythe ([[brownForsythe]]) is the
  * same F computed on |y − median_g| — the robust variance-equality
  * test (Levene's with medians), the standard pre-check before
  * trusting the pooled-variance F.
  *
  * Scale shape: ONE value-keyed hash aggregation accumulating exact
  * DECIMAL (n, Σy, Σy²) per group — map-side combining, no window, no
  * second scan; the k-row group frame then reduces to one row.
  *
  * Exactness discipline: the cross-group mass `Σ_g (Σy_g)²/n_g` is
  * accumulated as TRUNCATING integer terms, exact in DECIMAL
  * — a float term per group would have to be re-summed through a
  * double→DECIMAL transport, and that cast is NOT portable (Spark
  * expands the double's exact binary value, DuckDB its shortest
  * decimal repr; they disagree once ULP > 1e-6, i.e. above ~9e9 —
  * measured, not theoretical). Truncation discards < k cents² out of
  * ~1e14+, far below double ULP, and keeps every intermediate an
  * exact integer any engine reproduces bit-for-bit; the two floats
  * (F, η²) are single fixed trees over those integers. The floor
  * division runs in PURE DECIMAL (`(s² − s² mod n)/n`, exactly
  * divisible so the division's scale rounding is identity) — never
  * `DIV`, whose long result silently wraps past 2^63 under ANSI-off.
  * Headroom: `|Σy| < 10^19` per group and `(Σy)²/n < 10^32`
  * (a 10¹²-row group of 10⁸-cent values sits at 10^28); DECIMAL
  * overflow NULLs honestly, never wraps.
  */
object Anova {

  /** One row: `(k, n, ss_between, ss_within, f_stat, eta_sq)` for the
    * integer-valued `valueCol` grouped by `groupCol`. `f_stat` /
    * `eta_sq` are NULL when undefined (k < 2, n ≤ k, or zero
    * within-group variance). NULL group/value rows drop.
    */
  def oneWayF(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__y"))
      .filter(col("__g").isNotNull && col("__y").isNotNull)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__y").cast("decimal(19,0)")).as("__s"),
        sum((col("__y").cast("decimal(18,0)") *
          col("__y").cast("decimal(18,0)"))).as("__ss"))
      // exact truncating integer term: (19,0)² → (38,0) DECIMAL, then
      // floor division in PURE DECIMAL — (s² − s² mod n)/n is exactly
      // divisible, so the division's scale-6 rounding is identity and
      // the value stays exact to 10^32. NEVER `DIV`: IntegralDivide's
      // long result silently WRAPS past 2^63 under ANSI-off (measured:
      // grand flipped to −9.03e18 at sf0.01), and these terms pass
      // 2^63 already at sf0.1
      .withColumn("__s2", expr(
        "CAST(__s AS DECIMAL(19,0)) * CAST(__s AS DECIMAL(19,0))"))
      .withColumn("__term", expr(
        "CAST((__s2 - pmod(__s2, __n)) / __n AS DECIMAL(32,0))"))
    g.agg(count(lit(1)).as("k"), sum(col("__n")).as("n"),
        sum(col("__s")).as("__st"), sum(col("__ss")).as("__sst"),
        sum(col("__term")).as("__t"),
        // a term past the DECIMAL headroom NULLs — and sum() would
        // silently SKIP it, dropping a group from the mass; detect
        // and null the whole readout honestly instead
        count(col("__term")).as("__tcnt"))
      .withColumn("__g2", expr(
        "CAST(__st AS DECIMAL(19,0)) * CAST(__st AS DECIMAL(19,0))"))
      .withColumn("__grand", expr(
        "CAST((__g2 - pmod(__g2, n)) / n AS DECIMAL(32,0))"))
      .withColumn("__ok",
        col("__tcnt") === col("k") && col("__grand").isNotNull)
      .withColumn("__ssb",
        when(col("__ok"), (col("__t") - col("__grand")).cast("double")))
      .withColumn("__ssw",
        when(col("__ok"), (col("__sst") - col("__t")).cast("double")))
      .withColumn("f_stat",
        when(col("k") < 2L || col("n") <= col("k") || col("__ssw") <= 0.0,
            lit(null).cast("double"))
          .otherwise(round(
            (col("__ssb") / (col("k") - 1L).cast("double")) /
              (col("__ssw") / (col("n") - col("k")).cast("double")), 6)
            + 0.0))
      .withColumn("eta_sq",
        when(col("__ssb") + col("__ssw") <= 0.0, lit(null).cast("double"))
          .otherwise(round(
            col("__ssb") / (col("__ssb") + col("__ssw")), 6) + 0.0))
      // ss_* publish as the correctly-rounded double of an exact
      // integer (deterministic on any engine) — never round()ed:
      // round(x, d) at 1e14+ magnitudes resolves differently per
      // engine's rounding path (ULP exceeds the round increment)
      .select(col("k"), col("n"),
        (col("__ssb") + 0.0).as("ss_between"),
        (col("__ssw") + 0.0).as("ss_within"),
        col("f_stat"), col("eta_sq"))
  }

  /** Brown–Forsythe robust variance-equality test: [[oneWayF]] on the
    * absolute deviations from each group's exact lower MEDIAN (the
    * [[ExactSelection]] keyed drill — sort-free, GROUP-like keys by
    * its contract). Deviations are exact integers, so the F inherits
    * [[oneWayF]]'s engine determinism unchanged.
    */
  def brownForsythe(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val v = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("long").as("__y"))
      .filter(col("__g").isNotNull && col("__y").isNotNull)
    val med = ExactSelection.lowerMedianPerKey(v, "__g", "__y")
      .select(col("__g"), col("value").as("__med"))
    oneWayF(
      v.join(broadcast(med), Seq("__g"))
        .select(col("__g"), abs(col("__y") - col("__med")).as("__dev")),
      "__g", "__dev")
  }
}
