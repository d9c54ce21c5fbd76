package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resampling and observational-causal queries — the Poisson
  * bootstrap CI, split conformal coverage, caliper matching, and
  * difference-in-differences. New family in round 12; self-typed to
  * [[SparkEntry]] (see [[StatsQueries]]). Contributes
  * [[queriesStatsCausal]] / [[oracleSqlStatsCausal]].
  */
private[graft] trait CausalStatsQueries { this: SparkEntry.type =>

  import Tables._

  // ---------------------------------------------------------------- q292
  /** Poisson-bootstrap 90% CI for the mean order value
    * ([[operators.Resampling.poissonBootstrapCi]]) — per-row hash-
    * seeded Poisson(1) replicate weights (Chamandy et al.), the
    * bootstrap that shards: one scan, 40 replicates, no coordination.
    * Weights come from exact integer threshold comparisons on the
    * md5-48 uniform; replicate means are one float tree each; the CI
    * bounds are exact rank selections over the 40-row replicate frame.
    */
  def q292BootstrapCi(s: SparkSession, d: String): DataFrame =
    operators.Resampling.poissonBootstrapCi(
      orders(s, d).select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents")),
      "o_orderkey", "cents", reps = 40, alphaPpm = 100000L)

  // ---------------------------------------------------------------- q293
  /** Split conformal prediction audit per priority
    * ([[operators.Resampling.splitConformal]]): calibrate on the
    * ≤1997 era (per-priority exact median predictor + the
    * finite-sample conformal quantile of |y − median|), then audit
    * empirical coverage on the ≥1998 era — the distribution-free
    * interval guarantee every forecasting pipeline should verify.
    * Every published quantity is an exact integer.
    */
  def q293Conformal(s: SparkSession, d: String): DataFrame =
    operators.Resampling.splitConformal(
      orders(s, d).select(col("o_orderpriority").as("priority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"),
        (to_date(col("o_orderdate")) <= lit("1997-12-31")).as("calib")),
      "priority", "cents", "calib", alphaPpm = 100000L)

  // ---------------------------------------------------------------- q294
  /** Caliper-matched ATT of the BUILDING market segment on total
    * customer spend ([[operators.Matching.caliperMatchAtt]]): each
    * BUILDING customer matches the nearest non-BUILDING customer by
    * account balance within a $100 caliper (banded equi-join — never
    * |T|·|C|), then the average treated−control outcome gap over
    * matched pairs. The never-ordered customers count as zero spend —
    * exactly the population matching is meant to compare.
    */
  def q294CaliperMatch(s: SparkSession, d: String): DataFrame = {
    val spend = orders(s, d).groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("__spend"))
    val v = customer(s, d)
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").as("treated"),
        (col("c_acctbal").cast("decimal(18,2)") * 100)
          .cast("long").as("bal_cents"),
        coalesce(col("__spend"), lit(0L)).as("spend_cents"))
    operators.Matching.caliperMatchAtt(v, "c_custkey", "treated",
      "bal_cents", "spend_cents", caliper = 10000L)
  }

  // ---------------------------------------------------------------- q295
  /** Difference-in-differences on event engagement
    * ([[operators.Matching.didEstimate]]): users hash-assigned to a
    * treated arm (the q130 md5 discipline), pre/post split at the
    * corpus's temporal midpoint, and the 2×2 cell means' double
    * difference — the parallel-trends estimator that strips both the
    * arm-level baseline gap and the secular time trend a naive
    * post-only comparison confounds.
    */
  def q295Did(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .filter(col("value").isNotNull && col("user_id").isNotNull &&
        col("ts").isNotNull)
      .select(
        (conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 2 === 0L).as("g"),
        expr("ts DIV 1000").as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    // exact integer midpoint — a float `/2` loses exactness right at
    // the 9e15 epoch-µs magnitudes this sits at
    val cut = ev.agg(min(col("us")).as("__mn"), max(col("us")).as("__mx"))
      .select(expr("(__mn + __mx) DIV 2").as("__cut"))
    operators.Matching.didEstimate(
      ev.crossJoin(broadcast(cut))
        .select(col("g"), (col("us") >= col("__cut")).as("post"),
          col("cents")),
      "g", "post", "cents")
  }

  // ---------------------------------------------------------------- q298
  /** Epoch materialization of the T=2 temperature mix
    * ([[operators.EpochResample]]): q275 computes the target source
    * shares; this row EMITS the resampled epoch — every document
    * replicated `floor(r)` times plus an md5-coin extra with
    * probability `frac(r)` — and audits achieved vs target share per
    * source. All arithmetic is exact integer ppm (the α = 1/2 tilt via
    * integer isqrt), the coin is the content hash, so the epoch is a
    * pure function of the corpus: reproducible on any engine, any
    * shard layout, with no shuffle in the emission path.
    */
  def q298EpochResample(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("source"),
      col("n_chars"))
    val rates = operators.EpochResample.replicationRates(
      docs, "doc_id", "source", "n_chars")
    val got = operators.EpochResample.resampledIds(
        docs, "doc_id", "source", "n_chars")
      .groupBy(col("source")).agg(count(lit(1)).as("n_emitted"))
    val joined = rates.join(got, Seq("source"), "left")
      .withColumn("n_emitted", coalesce(col("n_emitted"), lit(0L)))
    val tot = joined.agg(sum(col("n_emitted")).as("__te"))
    joined.crossJoin(broadcast(tot))
      .select(col("source"), col("n_rows"), col("p_ppm"),
        col("target_ppm"), col("r_ppm"), col("n_emitted"),
        expr("1000000 * n_emitted DIV __te").as("achieved_ppm"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q300
  /** Delta-method CI for the ratio metric "purchase revenue per
    * click" ([[operators.ExperimentMetrics.ratioDeltaCi]]): per-user
    * numerator/denominator masses (users, not rows, are the
    * independent unit — the naive per-row variance is simply wrong
    * for ratio metrics), exact DECIMAL moments, the classic
    * first-order variance expansion, 95% bounds. The experiment-
    * readout face q130's mean-difference t-test can't cover.
    */
  def q300RatioDelta(s: SparkSession, d: String): DataFrame = {
    val per = events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
          (col("value").cast("decimal(18,2)") * 100).cast("long"))
          .otherwise(0L)).as("rev_cents"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("clicks"))
    operators.ExperimentMetrics.ratioDeltaCi(per, "rev_cents", "clicks")
  }

  // ---------------------------------------------------------------- q301
  /** Sample-ratio-mismatch guardrail
    * ([[operators.ExperimentMetrics.srmCheck]]) on q130's md5 arm
    * assignment over the distinct event users: the 1-dof chi-square
    * of observed arm sizes against the intended 50/50. An SRM means
    * assignment or logging is broken and every downstream metric —
    * including q130 and q300 — is untrustworthy; this is the check
    * that runs FIRST.
    */
  def q301SrmCheck(s: SparkSession, d: String): DataFrame =
    operators.ExperimentMetrics.srmCheck(
      events(s, d).select(col("user_id")).filter(col("user_id").isNotNull)
        .distinct()
        .select((conv(substring(md5(col("user_id").cast("string")), 1, 8),
          16, 10).cast("long") % 2 === 0L).as("arm")),
      "arm")

  // ---------------------------------------------------------------- q304
  /** Stratified ATE of the BUILDING segment on customer spend
    * ([[operators.Matching.stratifiedAte]]): sub-classify on $1,000
    * account-balance bands (the confounder proxy), average the
    * within-band treated−control gaps over the common support — the
    * OTHER classic observational estimator next to q294's 1-NN
    * matching, published with the naive pooled difference so the
    * confounding correction is visible. Bands via pmod flooring
    * (negative balances band correctly).
    */
  def q304StratifiedAte(s: SparkSession, d: String): DataFrame = {
    val spend = orders(s, d).groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("__spend"))
    val v = customer(s, d)
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select((col("c_mktsegment") === "BUILDING").as("treated"),
        (col("c_acctbal").cast("decimal(18,2)") * 100)
          .cast("long").as("__bal"),
        coalesce(col("__spend"), lit(0L)).as("spend_cents"))
      .withColumn("band", expr(
        "CAST((__bal - pmod(__bal, 100000)) / 100000 AS BIGINT)"))
    operators.Matching.stratifiedAte(v, "treated", "band", "spend_cents")
  }

  // ---------------------------------------------------------------- q305
  /** Minimum detectable effect at the q130 experiment's current
    * sample sizes ([[operators.ExperimentMetrics.mdeCheck]]): pooled
    * SD from exact moments, 80% power at two-sided α = 0.05 — the
    * planning readout that says whether an inconclusive q130 t-test
    * means "no effect" or "underpowered test", which are opposite
    * conclusions.
    */
  def q305MdePower(s: SparkSession, d: String): DataFrame =
    operators.ExperimentMetrics.mdeCheck(
      events(s, d).filter(col("user_id").isNotNull &&
          col("value").isNotNull)
        .select(
          (conv(substring(md5(col("user_id").cast("string")), 1, 8),
            16, 10).cast("long") % 2 === 0L).as("arm"),
          (col("value").cast("decimal(18,2)") * 100).cast("long")
            .as("cents")),
      "arm", "cents")

  // ---------------------------------------------------------------- q308
  /** Fisher index-of-dispersion test on per-user event counts
    * ([[operators.ExperimentMetrics.dispersionIndex]]): is user
    * activity Poisson or bursty (over-dispersed)? The answer decides
    * whether negative-binomial variance inflation is needed in every
    * count-metric readout — including q300's ratio CI. Exact moments,
    * two float trees, one-sided 5% flag.
    */
  def q308Dispersion(s: SparkSession, d: String): DataFrame =
    operators.ExperimentMetrics.dispersionIndex(
      events(s, d).filter(col("user_id").isNotNull)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_events")),
      "n_events")

  // ---------------------------------------------------------------- q309
  /** Jackknife CI for the q300 ratio metric
    * ([[operators.ExperimentMetrics.ratioJackknifeCi]]) — the
    * recompute-everything sibling of the delta method on the SAME
    * per-user frame, so the two standard errors can be compared row
    * to row (they should nearly agree when the linearization is
    * honest — a divergence flags heavy-tailed units). Leave-one-out
    * ratios collapse to one pass off the global sums; the variance
    * mass travels as centered rounded DECIMAL terms.
    */
  def q309JackknifeRatio(s: SparkSession, d: String): DataFrame = {
    val per = events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
          (col("value").cast("decimal(18,2)") * 100).cast("long"))
          .otherwise(0L)).as("rev_cents"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("clicks"))
    operators.ExperimentMetrics.ratioJackknifeCi(per, "rev_cents", "clicks")
  }

  // ---------------------------------------------------------------- q310
  /** Mantel–Haenszel pooled odds ratio of urgent-priority orders on
    * order fulfilment ('F' status), stratified by nation
    * ([[operators.Matching.mantelHaenszelOr]]) — the binary-outcome
    * confounder adjustment next to q304's continuous ATE: each
    * nation's 2×2 contributes information-weighted ad/n and bc/n
    * masses, and the pooled OR is their ratio.
    */
  def q310MantelHaenszel(s: SparkSession, d: String): DataFrame =
    operators.Matching.mantelHaenszelOr(
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nation"),
          (col("o_orderpriority") === "1-URGENT").as("urgent"),
          (col("o_orderstatus") === "F").as("fulfilled")),
      "nation", "urgent", "fulfilled")

  private[graft] def queriesStatsCausal: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q304_stratified_ate" -> (q304StratifiedAte _),
    "q308_dispersion" -> (q308Dispersion _),
    "q309_jackknife_ratio" -> (q309JackknifeRatio _),
    "q310_mantel_haenszel" -> (q310MantelHaenszel _),
    "q305_mde_power" -> (q305MdePower _),
    "q300_ratio_delta" -> (q300RatioDelta _),
    "q301_srm_check" -> (q301SrmCheck _),
    "q298_epoch_resample" -> (q298EpochResample _),
    "q292_bootstrap_ci" -> (q292BootstrapCi _),
    "q293_conformal" -> (q293Conformal _),
    "q294_caliper_match" -> (q294CaliperMatch _),
    "q295_did" -> (q295Did _))

  private[graft] def oracleSqlStatsCausal: Map[String, String] = Map(
    "q309_jackknife_ratio" ->
      // leave-one-out ratios off the global sums; centered rounded
      // DECIMAL(18,6) variance mass (centering keeps the unscaled
      // values below 2^53 where both engines' decimal↔double
      // conversions are exact); float trees mirror ratioJackknifeCi
      """WITH per AS (SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS DECIMAL(19,0))) AS sx,
        |    sum(CAST(y AS DECIMAL(19,0))) AS sy
        |  FROM per),
        |jk AS (SELECT CAST(count(*) AS BIGINT) AS n_jk,
        |    sum(s) AS ss, sum(s * s) AS ss2
        |  FROM (SELECT CAST(round(
        |      CAST(sx - x AS DOUBLE) / CAST(sy - y AS DOUBLE)
        |      - round(CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE), 6), 6)
        |      AS DECIMAL(18,6)) AS s
        |    FROM per CROSS JOIN tot WHERE sy - y > 0)),
        |f AS (SELECT tot.n, jk.n_jk,
        |    round(CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE), 6) + 0.0 AS r,
        |    CAST(n_jk AS DOUBLE) AS njd,
        |    CAST(ss AS DOUBLE) AS ssd, CAST(ss2 AS DOUBLE) AS ss2d
        |  FROM jk CROSS JOIN tot),
        |g AS (SELECT n, n_jk, r,
        |    (njd - 1.0) / njd * (ss2d - ssd * ssd / njd) AS var_jk
        |  FROM f),
        |h AS (SELECT n, n_jk, r,
        |    CASE WHEN n_jk >= 2 AND var_jk >= 0.0
        |      THEN round(sqrt(var_jk), 6) + 0.0 END AS se_jk
        |  FROM g)
        |SELECT n, n_jk, r, se_jk,
        |  CASE WHEN se_jk IS NOT NULL THEN
        |    round(r - CAST(1.959964 AS DOUBLE) * se_jk, 6) + 0.0 END
        |    AS ci_lo,
        |  CASE WHEN se_jk IS NOT NULL THEN
        |    round(r + CAST(1.959964 AS DOUBLE) * se_jk, 6) + 0.0 END
        |    AS ci_hi
        |FROM h""".stripMargin,
    "q310_mantel_haenszel" ->
      // per-nation 2×2 masses; ad/n and bc/n one rounded float tree
      // each, re-summed in DECIMAL; pooled OR is one division
      """WITH v AS (SELECT c_nationkey AS st,
        |    o_orderpriority = '1-URGENT' AS e,
        |    o_orderstatus = 'F' AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |s AS (SELECT st,
        |    CAST(sum(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN e AND NOT o THEN 1 ELSE 0 END) AS BIGINT)
        |      AS b,
        |    CAST(sum(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c,
        |    CAST(sum(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM v GROUP BY st),
        |t AS (SELECT st,
        |    CAST(round(CAST(a * d AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) AS adn,
        |    CAST(round(CAST(b * c AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) AS bcn
        |  FROM s),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS k_strata,
        |    CAST(sum(CASE WHEN adn > 0.0 AND bcn > 0.0 THEN 1 ELSE 0
        |      END) AS BIGINT) AS k_informative,
        |    sum(adn) AS sad, sum(bcn) AS sbc
        |  FROM t)
        |SELECT k_strata, k_informative,
        |  CAST(sad AS DOUBLE) + 0.0 AS sum_ad_n,
        |  CAST(sbc AS DOUBLE) + 0.0 AS sum_bc_n,
        |  CASE WHEN sbc > 0.0 THEN
        |    round(CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE), 6) + 0.0 END
        |    AS or_mh
        |FROM agg""".stripMargin,
    "q308_dispersion" ->
      // exact moments over per-user counts; D and z mirror the Spark
      // trees term for term
      """WITH pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS DECIMAL(19,0))) AS s,
        |    sum(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)))
        |      AS ss
        |  FROM pu),
        |f AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        |    CAST(s AS DOUBLE) AS sd, CAST(ss AS DOUBLE) AS ssd,
        |    n >= 2 AND s > 0 AS ok
        |  FROM m),
        |g AS (SELECT n, ok, nd, sd / nd AS mean,
        |    (ssd - sd * sd / nd) / (sd / nd) AS disp
        |  FROM f),
        |h AS (SELECT n, ok, mean, disp,
        |    (disp - (nd - CAST(1 AS DOUBLE)))
        |      / sqrt(CAST(2 AS DOUBLE) * (nd - CAST(1 AS DOUBLE))) AS z
        |  FROM g)
        |SELECT n,
        |  CASE WHEN ok THEN round(mean, 6) + 0.0 END AS mean,
        |  CASE WHEN ok THEN round(disp, 6) + 0.0 END AS dispersion,
        |  CASE WHEN ok THEN round(z, 6) + 0.0 END AS z,
        |  CASE WHEN ok THEN z > CAST(1.644854 AS DOUBLE) END
        |    AS overdispersed
        |FROM h""".stripMargin,
    "q304_stratified_ate" ->
      // per-band exact sums; each within-band gap is ONE float tree
      // rounded 6dp and re-summed weighted in DECIMAL (the q131
      // rounded-term transport — valid because |gap| sits far below
      // the ~4.5e9 magnitude where 6dp stops pinning a double)
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS sp
        |  FROM orders GROUP BY 1),
        |v AS (SELECT c_mktsegment = 'BUILDING' AS t,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS bal,
        |    coalesce(sp, CAST(0 AS BIGINT)) AS y
        |  FROM customer LEFT JOIN spend ON o_custkey = c_custkey),
        |b AS (SELECT t, (bal - ((bal % 100000 + 100000) % 100000))
        |      / 100000 AS band, y
        |  FROM v),
        |st AS (SELECT band,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS nc,
        |    sum(CASE WHEN t THEN CAST(y AS DECIMAL(19,0))
        |      ELSE CAST(0 AS DECIMAL(19,0)) END) AS sts,
        |    sum(CASE WHEN t THEN CAST(0 AS DECIMAL(19,0))
        |      ELSE CAST(y AS DECIMAL(19,0)) END) AS scs
        |  FROM b GROUP BY 1),
        |g AS (SELECT band, nt, nc, nt > 0 AND nc > 0 AS common,
        |    CASE WHEN nt > 0 AND nc > 0 THEN
        |      CAST(round(CAST(sts AS DOUBLE) / CAST(nt AS DOUBLE)
        |        - CAST(scs AS DOUBLE) / CAST(nc AS DOUBLE), 6)
        |        AS DECIMAL(18,6)) END AS gap
        |  FROM st),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(sum(CASE WHEN common THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_common,
        |    sum(CASE WHEN common THEN CAST(nt + nc AS DECIMAL(12,0))
        |      * gap END) AS wsum,
        |    CAST(sum(CASE WHEN common THEN nt + nc ELSE 0 END)
        |      AS BIGINT) AS nw
        |  FROM g),
        |nv AS (SELECT
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_treated,
        |    CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_control,
        |    sum(CASE WHEN t THEN CAST(y AS DECIMAL(19,0))
        |      ELSE CAST(0 AS DECIMAL(19,0)) END) AS sts,
        |    sum(CASE WHEN t THEN CAST(0 AS DECIMAL(19,0))
        |      ELSE CAST(y AS DECIMAL(19,0)) END) AS scs
        |  FROM v)
        |SELECT agg.n_strata, agg.n_common, nv.n_treated, nv.n_control,
        |  CASE WHEN nv.n_treated > 0 AND nv.n_control > 0 THEN
        |    round(CAST(nv.sts AS DOUBLE) / CAST(nv.n_treated AS DOUBLE)
        |      - CAST(nv.scs AS DOUBLE) / CAST(nv.n_control AS DOUBLE), 6)
        |      + 0.0 END AS naive_diff,
        |  CASE WHEN agg.nw > 0 THEN
        |    round(CAST(agg.wsum AS DOUBLE) / CAST(agg.nw AS DOUBLE), 6)
        |      + 0.0 END AS ate_strat
        |FROM agg CROSS JOIN nv""".stripMargin,
    "q305_mde_power" ->
      // exact per-arm DECIMAL moments; pooled variance and the MDE as
      // single float trees mirroring mdeCheck term for term
      """WITH ev AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 = 0 AS a,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        |    sum(CASE WHEN a THEN CAST(y AS DECIMAL(19,0))
        |      ELSE CAST(0 AS DECIMAL(19,0)) END) AS sa,
        |    sum(CASE WHEN a THEN CAST(0 AS DECIMAL(19,0))
        |      ELSE CAST(y AS DECIMAL(19,0)) END) AS sb,
        |    sum(CASE WHEN a THEN CAST(y AS DECIMAL(18,0))
        |        * CAST(y AS DECIMAL(18,0))
        |      ELSE CAST(0 AS DECIMAL(18,0)) END) AS ssa,
        |    sum(CASE WHEN a THEN CAST(0 AS DECIMAL(18,0))
        |      ELSE CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))
        |      END) AS ssb
        |  FROM ev),
        |f AS (SELECT n_a, n_b,
        |    CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
        |    CAST(CAST(sa AS VARCHAR) AS DOUBLE) AS sad,
        |    CAST(CAST(sb AS VARCHAR) AS DOUBLE) AS sbd,
        |    CAST(CAST(ssa AS VARCHAR) AS DOUBLE) AS ssad,
        |    CAST(CAST(ssb AS VARCHAR) AS DOUBLE) AS ssbd,
        |    CAST(CAST(sa + sb AS VARCHAR) AS DOUBLE) AS std,
        |    n_a >= 2 AND n_b >= 2 AS ok
        |  FROM m),
        |g AS (SELECT n_a, n_b, ok, nad, nbd, std,
        |    (ssad - sad * sad / nad) / (nad - 1.0) AS va,
        |    (ssbd - sbd * sbd / nbd) / (nbd - 1.0) AS vb
        |  FROM f),
        |h AS (SELECT n_a, n_b, ok, nad, nbd, std,
        |    ((nad - 1.0) * va + (nbd - 1.0) * vb) / (nad + nbd - 2.0)
        |      AS sp2
        |  FROM g),
        |i AS (SELECT n_a, n_b, ok, sp2,
        |    CAST(2.801585233572914 AS DOUBLE)
        |      * sqrt(sp2 * (CAST(1 AS DOUBLE) / nad
        |        + CAST(1 AS DOUBLE) / nbd)) AS mde,
        |    std / (nad + nbd) AS mean
        |  FROM h)
        |SELECT n_a, n_b,
        |  CASE WHEN ok THEN round(sqrt(sp2), 6) + 0.0 END AS sd_pooled,
        |  CASE WHEN ok THEN round(mde, 6) + 0.0 END AS mde_abs,
        |  CASE WHEN ok AND mean <> 0.0 THEN round(mde / mean, 6) + 0.0
        |    END AS mde_rel
        |FROM i""".stripMargin,
    "q300_ratio_delta" ->
      // exact DECIMAL moments over the per-user frame; each published
      // double mirrors the Spark tree term for term; the big squared
      // sums hop DECIMAL→VARCHAR→DOUBLE (the 1-ulp int128 cast)
      """WITH per AS (SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(x AS DECIMAL(19,0))) AS sx,
        |    sum(CAST(y AS DECIMAL(19,0))) AS sy,
        |    sum(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0)))
        |      AS sxx,
        |    sum(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
        |      AS syy,
        |    sum(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0)))
        |      AS sxy
        |  FROM per),
        |f AS (SELECT n, CAST(n AS DOUBLE) AS nd,
        |    CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS sxd,
        |    CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
        |    CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxxd,
        |    CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS syyd,
        |    CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxyd,
        |    sy <> 0 AND n >= 2 AS ok
        |  FROM m),
        |g AS (SELECT n, ok, sxd / syd AS r,
        |    (sxxd - sxd * sxd / nd) / (nd - 1.0) AS varx,
        |    (syyd - syd * syd / nd) / (nd - 1.0) AS vary,
        |    (sxyd - sxd * syd / nd) / (nd - 1.0) AS covxy,
        |    syd / nd AS ybar, nd
        |  FROM f),
        |h AS (SELECT n, ok, r,
        |    sqrt((varx - CAST(2 AS DOUBLE) * r * covxy + r * r * vary)
        |      / (nd * ybar * ybar)) AS se
        |  FROM g)
        |SELECT n,
        |  CASE WHEN ok THEN round(r, 6) + 0.0 END AS r,
        |  CASE WHEN ok THEN round(se, 6) + 0.0 END AS se,
        |  CASE WHEN ok THEN round(r - CAST(1.959964 AS DOUBLE) * se, 6)
        |    + 0.0 END AS ci_lo,
        |  CASE WHEN ok THEN round(r + CAST(1.959964 AS DOUBLE) * se, 6)
        |    + 0.0 END AS ci_hi
        |FROM h""".stripMargin,
    "q301_srm_check" ->
      // q130's md5 arm hash over distinct users; one float tree
      """WITH u AS (SELECT DISTINCT user_id FROM events
        |  WHERE user_id IS NOT NULL),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN CAST(('0x' || substr(md5(CAST(user_id
        |      AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN CAST(('0x' || substr(md5(CAST(user_id
        |      AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0 THEN 0 ELSE 1 END)
        |      AS BIGINT) AS n_b
        |  FROM u)
        |SELECT n_a, n_b,
        |  round(CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
        |    / CAST(n_a + n_b AS DOUBLE), 6) + 0.0 AS chi2,
        |  round(CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
        |    / CAST(n_a + n_b AS DOUBLE), 6) + 0.0
        |    > CAST(3.841459 AS DOUBLE) AS srm_flag
        |FROM a""".stripMargin,
    "q298_epoch_resample" ->
      // exact ppm shares via HUGEINT division (q275's discipline), the
      // α=1/2 tilt as integer isqrt, per-doc emission counted without
      // materializing (sum of floor(r) + md5-coin), achieved ppm exact
      """WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(n_chars) AS BIGINT) AS mass
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(mass) AS BIGINT) AS t,
        |    CAST(sum(n_rows) AS BIGINT) AS nt FROM per),
        |p AS (SELECT source, n_rows, mass,
        |    CAST((1000000 * CAST(mass AS HUGEINT)) // tot.t AS BIGINT)
        |      AS p_ppm
        |  FROM per, tot),
        |u AS (SELECT *, CAST(floor(sqrt(CAST(p_ppm AS DOUBLE)))
        |    AS BIGINT) AS iu FROM p),
        |su AS (SELECT CAST(sum(iu) AS BIGINT) AS s FROM u),
        |tg AS (SELECT source, n_rows, p_ppm,
        |    CAST((1000000 * CAST(iu AS HUGEINT)) // su.s AS BIGINT)
        |      AS target_ppm
        |  FROM u, su),
        |r AS (SELECT source, n_rows, p_ppm, target_ppm,
        |    CAST((CAST(nt AS HUGEINT) * 1000000 * target_ppm)
        |      // (CAST(n_rows AS HUGEINT) * 1000000) AS BIGINT) AS r_ppm
        |  FROM tg, tot),
        |em AS (SELECT d.source,
        |    CAST(sum(r.r_ppm // 1000000
        |      + CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id
        |          AS VARCHAR)), 1, 12)) AS BIGINT) % 1000000
        |          < r.r_ppm % 1000000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_emitted
        |  FROM documents d JOIN r USING (source) GROUP BY 1),
        |te AS (SELECT CAST(sum(n_emitted) AS BIGINT) AS s FROM em)
        |SELECT r.source, r.n_rows, r.p_ppm, r.target_ppm, r.r_ppm,
        |  CAST(coalesce(em.n_emitted, 0) AS BIGINT) AS n_emitted,
        |  1000000 * coalesce(em.n_emitted, 0) // te.s AS achieved_ppm
        |FROM r LEFT JOIN em USING (source) CROSS JOIN te
        |ORDER BY r.source""".stripMargin,
    "q292_bootstrap_ci" ->
      // the SAME Poisson thresholds (floor(CDF·2^48) integer literals)
      // on the md5-48 uniform; replicate sums exact DECIMAL; rank 2 /
      // rank 38 = the ceil(α/2·40) / ceil((1−α/2)·40) selections
      """WITH v AS (SELECT CAST(o_orderkey AS VARCHAR) AS id,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS y
        |  FROM orders WHERE o_orderkey IS NOT NULL),
        |rep AS (SELECT b, id, y FROM v
        |  CROSS JOIN (SELECT unnest(generate_series(0, 39)) AS b)),
        |w AS (SELECT b, y,
        |    CAST(('0x' || substr(md5(id || '_' || CAST(b AS VARCHAR)),
        |      1, 12)) AS BIGINT) AS u
        |  FROM rep),
        |pw AS (SELECT b, y,
        |    CASE WHEN u < 103548857136060 THEN 0
        |      WHEN u < 207097714272121 THEN 1
        |      WHEN u < 258872142840152 THEN 2
        |      WHEN u < 276130285696162 THEN 3
        |      WHEN u < 280444821410164 THEN 4
        |      WHEN u < 281307728552965 THEN 5
        |      WHEN u < 281451546410098 THEN 6
        |      ELSE 7 END AS wt
        |  FROM w),
        |rm AS (SELECT b, sum(CAST(wt * y AS DECIMAL(23,0))) AS sv,
        |    CAST(sum(wt) AS BIGINT) AS sw
        |  FROM pw GROUP BY b),
        |mm AS (SELECT b,
        |    round(CAST(sv AS DOUBLE) / CAST(sw AS DOUBLE), 6) + 0.0 AS mean
        |  FROM rm WHERE sw > 0),
        |rk AS (SELECT mean, row_number() OVER (ORDER BY mean, b) AS r
        |  FROM mm),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(y AS DECIMAL(19,0))) AS s FROM v)
        |SELECT n, CAST(40 AS BIGINT) AS reps,
        |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS mean,
        |  (SELECT mean FROM rk WHERE r = 2) AS ci_lo,
        |  (SELECT mean FROM rk WHERE r = 38) AS ci_hi
        |FROM f""".stripMargin,
    "q293_conformal" ->
      // per-key lower-median rank walk (q284 pattern) on the ≤1997
      // calibration era, conformal rank ceil((n+1)·0.9) in exact ppm
      // integer arithmetic, coverage audited on ≥1998
      """WITH v AS (SELECT o_orderpriority AS priority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS y,
        |    CAST(o_orderdate AS DATE) <= DATE '1997-12-31' AS cal
        |  FROM orders),
        |cl AS (SELECT priority, y FROM v WHERE cal),
        |pv AS (SELECT priority, y, CAST(count(*) AS BIGINT) AS c
        |  FROM cl GROUP BY 1, 2),
        |w AS (SELECT priority, y, c,
        |    sum(c) OVER (PARTITION BY priority ORDER BY y) AS cum,
        |    sum(c) OVER (PARTITION BY priority) AS n FROM pv),
        |med AS (SELECT priority, y AS median, CAST(n AS BIGINT) AS n_calib
        |  FROM w WHERE cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum),
        |dv AS (SELECT cl.priority, abs(cl.y - med.median) AS dev
        |  FROM cl JOIN med USING (priority)),
        |pd AS (SELECT priority, dev, CAST(count(*) AS BIGINT) AS c
        |  FROM dv GROUP BY 1, 2),
        |wd AS (SELECT priority, dev, c,
        |    sum(c) OVER (PARTITION BY priority ORDER BY dev) AS cum
        |  FROM pd),
        |r AS (SELECT priority, n_calib,
        |    ((n_calib + 1) * 900000 + 999999) // 1000000 AS rk
        |  FROM med),
        |qh AS (SELECT wd.priority, wd.dev AS qhat
        |  FROM wd JOIN r USING (priority)
        |  WHERE r.rk <= r.n_calib AND wd.cum - wd.c < r.rk
        |    AND r.rk <= wd.cum),
        |ts AS (SELECT v.priority, CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(sum(CASE WHEN qh.qhat IS NULL
        |        OR abs(v.y - med.median) <= qh.qhat THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_covered
        |  FROM v JOIN med USING (priority)
        |  LEFT JOIN qh ON qh.priority = v.priority
        |  WHERE NOT v.cal GROUP BY 1)
        |SELECT med.priority, med.n_calib,
        |  CAST(coalesce(ts.n_test, 0) AS BIGINT) AS n_test, med.median,
        |  qh.qhat, CAST(coalesce(ts.n_covered, 0) AS BIGINT) AS n_covered,
        |  CASE WHEN coalesce(ts.n_test, 0) > 0
        |    THEN 1000000 * ts.n_covered // ts.n_test END AS coverage_ppm
        |FROM med LEFT JOIN qh USING (priority) LEFT JOIN ts USING (priority)
        |ORDER BY priority""".stripMargin,
    "q294_caliper_match" ->
      // the oracle needs no banding (it is a superset constraint):
      // candidates by |Δbal| ≤ caliper directly, nearest by the same
      // (|Δ|, control balance, control id) total order, ATT from
      // exact DECIMAL sums
      """WITH spend AS (SELECT o_custkey,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS sp
        |  FROM orders GROUP BY 1),
        |v AS (SELECT c_custkey AS id, c_mktsegment = 'BUILDING' AS t,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS s,
        |    coalesce(sp, CAST(0 AS BIGINT)) AS o
        |  FROM customer LEFT JOIN spend ON o_custkey = c_custkey),
        |t AS (SELECT id AS tid, s AS ts, o AS tout FROM v WHERE t),
        |c AS (SELECT id AS cid, s AS cs, o AS cout FROM v WHERE NOT t),
        |cand AS (SELECT t.tid, t.tout, c.cs, c.cid, c.cout,
        |    abs(t.ts - c.cs) AS d
        |  FROM t JOIN c ON abs(t.ts - c.cs) <= 10000),
        |best AS (SELECT tid, tout, cout,
        |    row_number() OVER (PARTITION BY tid ORDER BY d, cs, cid)
        |      AS rk
        |  FROM cand),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n_matched,
        |    sum(CAST(tout AS DECIMAL(19,0))) AS st,
        |    sum(CAST(cout AS DECIMAL(19,0))) AS sc
        |  FROM best WHERE rk = 1),
        |cnt AS (SELECT CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_treated,
        |    CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_control
        |  FROM v)
        |SELECT n_treated, n_control, n_matched,
        |  1000000 * n_matched // n_treated AS matched_ppm,
        |  CASE WHEN n_matched > 0 THEN round(CAST(st AS DOUBLE)
        |    / CAST(n_matched AS DOUBLE), 6) + 0.0 END AS mean_treated,
        |  CASE WHEN n_matched > 0 THEN round(CAST(sc AS DOUBLE)
        |    / CAST(n_matched AS DOUBLE), 6) + 0.0 END AS mean_control,
        |  CASE WHEN n_matched > 0 THEN round(CAST(st - sc AS DOUBLE)
        |    / CAST(n_matched AS DOUBLE), 6) + 0.0 END AS att
        |FROM m CROSS JOIN cnt""".stripMargin,
    "q295_did" ->
      // q130's md5 arm assignment, temporal midpoint cutoff in exact
      // epoch-µs integers, 2×2 exact DECIMAL cell sums, one float
      // tree per mean and for the double difference
      """WITH ev AS (SELECT
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 2 = 0 AS g,
        |    CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
        |    AND ts IS NOT NULL),
        |cut AS (SELECT (min(us) + max(us)) // 2 AS cutoff FROM ev),
        |p AS (SELECT g, us >= cutoff AS post, y FROM ev CROSS JOIN cut),
        |a AS (SELECT
        |  CAST(sum(CASE WHEN g AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
        |  CAST(sum(CASE WHEN g AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
        |  CAST(sum(CASE WHEN NOT g AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
        |  CAST(sum(CASE WHEN NOT g AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
        |  sum(CASE WHEN g AND NOT post THEN CAST(y AS DECIMAL(19,0))
        |    ELSE CAST(0 AS DECIMAL(19,0)) END) AS s_t_pre,
        |  sum(CASE WHEN g AND post THEN CAST(y AS DECIMAL(19,0))
        |    ELSE CAST(0 AS DECIMAL(19,0)) END) AS s_t_post,
        |  sum(CASE WHEN NOT g AND NOT post THEN CAST(y AS DECIMAL(19,0))
        |    ELSE CAST(0 AS DECIMAL(19,0)) END) AS s_c_pre,
        |  sum(CASE WHEN NOT g AND post THEN CAST(y AS DECIMAL(19,0))
        |    ELSE CAST(0 AS DECIMAL(19,0)) END) AS s_c_post
        | FROM p),
        |x AS (SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
        |  CASE WHEN n_t_pre > 0 THEN CAST(s_t_pre AS DOUBLE)
        |    / CAST(n_t_pre AS DOUBLE) END AS m_t_pre,
        |  CASE WHEN n_t_post > 0 THEN CAST(s_t_post AS DOUBLE)
        |    / CAST(n_t_post AS DOUBLE) END AS m_t_post,
        |  CASE WHEN n_c_pre > 0 THEN CAST(s_c_pre AS DOUBLE)
        |    / CAST(n_c_pre AS DOUBLE) END AS m_c_pre,
        |  CASE WHEN n_c_post > 0 THEN CAST(s_c_post AS DOUBLE)
        |    / CAST(n_c_post AS DOUBLE) END AS m_c_post
        | FROM a)
        |SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
        |  round(m_t_pre, 6) + 0.0 AS m_t_pre,
        |  round(m_t_post, 6) + 0.0 AS m_t_post,
        |  round(m_c_pre, 6) + 0.0 AS m_c_pre,
        |  round(m_c_post, 6) + 0.0 AS m_c_post,
        |  round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6) + 0.0
        |    AS did
        |FROM x""".stripMargin)
}
