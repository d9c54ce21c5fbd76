package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream", RANDOM'02; the
  * bottom-k refinement in Beyer et al., SIGMOD'07): hash every value
  * onto a uniform 48-bit line, keep the k smallest per group, and
  * estimate the distinct count as `(k-1) · 2^48 / h_k` from the k-th
  * smallest hash. Unlike `approx_count_distinct`'s HLL++ register
  * blob, a KMV sketch is plain rows — mergeable by "union, re-take the
  * k smallest" (associative + commutative, so partition partials
  * combine in any order), auditable in SQL on any engine, and
  * deterministic: md5 is content-keyed, so the same data produces the
  * SAME sketch on any run, partitioning, or engine.
  *
  * Scale shape: values are distinct-ed (hash agg with map-side
  * partials), then the per-group bottom-k runs as a hash-partitioned
  * `row_number` window — Spark plans the `<= k` filter as
  * WindowGroupLimit, so every scan partition prunes to its local
  * bottom-k BEFORE the exchange and the shuffle carries ≤ k rows per
  * group per partition, never the corpus.
  */
object Sketches {

  /** 2^48 — the hash line length; any small-int multiple is an exact
    * double (mantissa = the multiplier), so estimates are
    * engine-deterministic.
    */
  val HashLine: Double = 281474976710656.0

  /** First 48 bits of md5 as a non-negative long position. */
  def hash48(v: Column): Column =
    conv(substring(md5(v), 1, 12), 16, 10).cast("long")

  /** The KMV sketch rows: the k smallest distinct-value hashes per
    * group — `(groupCols..., rk, h, v)`, rk 1-based ascending by
    * (hash, value). Keep the rows to merge sketches later; feed to
    * [[kmvEstimate]] for the cardinality estimate.
    */
  def kmvSketch(values: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val distinctVals = values
      .select(groupCols.map(col) :+ col(valueCol).as("v"): _*).distinct()
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("h"), col("v"))
    distinctVals.withColumn("h", hash48(col("v")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(groupCols.map(col) :+ col("rk").cast("long").as("rk") :+
        col("h") :+ col("v"): _*)
  }

  /** Distinct-count estimate per group from sketch rows: exact when the
    * sketch is not full (fewer than k distinct values exist), else
    * `(k-1) · 2^48 / h_k`. Returns
    * `(groupCols..., n_kept, kth_hash, est_distinct)`.
    */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashLine) /
            col("kth_hash").cast("double")))

  /** Merge two sketches built with the same k (e.g. from different
    * corpus partitions or days): union the rows, re-take the bottom-k.
    * `kmvSketch(a ∪ b) == kmvMerge(kmvSketch(a), kmvSketch(b))` —
    * spec-pinned.
    */
  def kmvMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String],
               k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("h"), col("v"))
    a.unionByName(b)
      .select(groupCols.map(col) :+ col("h") :+ col("v"): _*).distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(groupCols.map(col) :+ col("rk").cast("long").as("rk") :+
        col("h") :+ col("v"): _*)
  }

  /** KMV set-operation estimates between two sketches built with the
    * SAME k and group keys (Beyer et al., SIGMOD'07, "On synopses for
    * distinct value estimation under multiset operations"): the
    * bottom-k of the sketch UNION estimates |A∪B| exactly like any
    * single sketch, and the fraction ρ/|K| of those rows present in
    * BOTH input sketches is the standard Jaccard estimator, so
    * |A∩B| ≈ Ĵ·(A∪B-estimate). Exact whenever the merged sketch is not
    * full. Cost: sketch-row joins ONLY — nothing rescans the raw data,
    * so two 100 TB sources compare at k-row cost (the audience/corpus
    * overlap question answered from pre-built per-source sketches).
    * Engine-deterministic throughout: integer hash comparisons, one
    * exact-double union estimate (the [[kmvEstimate]] discipline), and
    * 6-dp-rounded ratio/product.
    *
    * Returns `(groupCols..., n_kept, n_both, est_union, jaccard_est,
    * est_intersection)`.
    */
  def kmvOverlapEstimate(a: DataFrame, b: DataFrame,
                         groupCols: Seq[String], k: Int): DataFrame = {
    val m = kmvMerge(a, b, groupCols, k)
    val key = groupCols :+ "h" :+ "v"
    val aK = a.select(key.map(col): _*).withColumn("__in_a", lit(1L))
    val bK = b.select(key.map(col): _*).withColumn("__in_b", lit(1L))
    m.join(aK, key, "left").join(bK, key, "left")
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("__kth"),
        sum(coalesce(col("__in_a"), lit(0L)) *
          coalesce(col("__in_b"), lit(0L))).as("n_both"))
      .withColumn("est_union",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashLine) /
            col("__kth").cast("double")))
      .withColumn("jaccard_est",
        round(col("n_both").cast("double") / col("n_kept").cast("double"), 6))
      .withColumn("est_intersection",
        round(col("jaccard_est") * col("est_union"), 6))
      .drop("__kth")
  }

  // ------------------------------------------------------------- HLL

  /** HyperLogLog registers (Flajolet et al., AofA'07) on the same
    * 48-bit md5 line as [[hash48]]: bucket = low p bits, rho = 1 +
    * leading zeros of the remaining 48−p bits. Registers are exact
    * integers and content-keyed, so the sketch is deterministic across
    * runs, partitionings and engines, and MERGEABLE by per-bucket max
    * (associative+commutative — partition partials combine in any
    * order; map-side combining does exactly that here). Returns the
    * sparse register table `(groupCols..., bucket, rho)` — absent
    * buckets are rho 0.
    */
  def hllRegisters(values: DataFrame, groupCols: Seq[String],
                   valueCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    values
      .select(groupCols.map(col) :+ col(valueCol).as("v"): _*)
      .withColumn("__h", hash48(col("v")))
      .withColumn("bucket", pmod(col("__h"), lit(m.toLong)))
      .withColumn("__w", expr(s"__h DIV $m")) // the remaining 48−p bits
      // bitlength via bin(): rho = (48−p) − bitlen(w) + 1; w = 0 → 49−p
      .withColumn("rho",
        when(col("__w") === 0, lit(49 - p))
          .otherwise(lit(49 - p) - length(bin(col("__w")))))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).cast("long").as("rho"))
  }

  /** Register ROLLUP — the reaggregatability that makes HLL the 100 TB
    * distinct-count currency: registers built once at a fine grain
    * (per day, per source, per shard) merge to ANY coarser grain by
    * per-bucket max, without rescanning the raw rows. `coarseCols`
    * must already exist on the register frame (derive them first,
    * e.g. `withColumn("week", ...)`); the result is bit-identical to
    * registers built directly from the raw values at the coarse grain
    * (max is associative/commutative/idempotent), so estimates off a
    * rollup ARE the direct estimates.
    */
  def hllRollup(registers: DataFrame, coarseCols: Seq[String]): DataFrame =
    registers.groupBy(coarseCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("rho"))

  /** Cardinality estimate from HLL registers. The harmonic-mean sum
    * `Σ 2^−rho` is computed as the EXACT integer `Σ 2^(49−rho)`
    * (common denominator 2^49; at most (m−1)·2^49 + 2^48 < 2^63 for
    * p ≤ 14, so it fits BIGINT) — order-independent, unlike a float
    * sum of powers that spans more than 52 bits. One double conversion + three IEEE ops
    * give the raw estimate; the standard linear-counting branch covers
    * the small range. Returns
    * `(groupCols..., n_zero, s_scaled, est_distinct)` with the
    * estimate rounded to 6 dp.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
                  p: Int): DataFrame = {
    require(p >= 4 && p <= 14, s"estimate supports p in [4,14], got $p")
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    registers.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__nb"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - rho AS INT))"))
          .as("__sp"))
      .withColumn("n_zero", lit(m.toLong) - col("__nb"))
      .withColumn("s_scaled", // absent buckets: rho 0 → 2^(49−0)
        col("__sp") + col("n_zero") * lit(562949953421312L))
      .withColumn("__raw",
        lit(alpha) * lit((m.toLong * m).toDouble) * lit(562949953421312.0) /
          col("s_scaled").cast("double"))
      .withColumn("est_distinct", round(
        when(col("__raw") <= lit(2.5 * m) && col("n_zero") > 0,
          lit(m.toDouble) *
            log(lit(m.toDouble) / col("n_zero").cast("double")))
          .otherwise(col("__raw")), 6))
      .select(groupCols.map(col) :+ col("n_zero") :+ col("s_scaled") :+
        col("est_distinct"): _*)
  }

  // ------------------------------------------------------------- CMS

  /** Count-min sketch (Cormode & Muthukrishnan, J.Alg. 2005): `depth`
    * hash rows × `width` counters; a value's count lands in one bucket
    * per row, a point query reads the MINIMUM over its `depth`
    * buckets — always an overestimate, never under. Counters are exact
    * BIGINTs on the md5 line (content-keyed ⇒ deterministic across
    * engines/partitionings) and the sketch is MERGEABLE by plain
    * cell-wise addition — which is exactly what the map-side partial
    * aggregation does here. Returns the sparse counter table
    * `(row_idx, bucket, cnt)`; absent cells are 0.
    */
  /** The `depth` row-hash buckets of one value: disjoint 8-hex-char
    * (32-bit) slices of a SINGLE md5 — one digest per value instead of
    * one per (row, value), the standard multi-hash derivation (cf.
    * Kirsch–Mitzenmacher). depth ≤ 4 fits md5's 32 hex chars.
    */
  private def cmsBuckets(v: Column, depth: Int, width: Int): Column = {
    val h = md5(v)
    array((0 until depth).map { j =>
      pmod(conv(substring(h, 1 + 8 * j, 8), 16, 10).cast("long"),
        lit(width.toLong))
    }: _*)
  }

  def cmsSketch(values: DataFrame, valueCol: String, depth: Int,
                width: Int): DataFrame = {
    require(depth >= 1 && depth <= 4 && width >= 2,
      s"bad cms shape ($depth × $width) — depth ≤ 4 (md5 slices)")
    values.select(col(valueCol).cast("string").as("v"))
      .select(posexplode(cmsBuckets(col("v"), depth, width))
        .as(Seq("row_idx", "bucket")))
      .groupBy(col("row_idx").cast("long").as("row_idx"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point queries against a [[cmsSketch]]: for each probe value the
    * exact-integer CMS estimate `min_j cnt[j][h_j(v)]` (0 when any
    * probed cell is empty). One broadcast-sized join per probe set —
    * the sketch is depth×width rows regardless of corpus size.
    */
  // ------------------------------------------------------ histogram

  /** Fixed-width integer histogram sketch — the simplest MERGEABLE
    * quantile summary (bin counts add; error bounded by the bin width
    * by construction, unlike GK/t-digest whose merge rules are
    * implementation-defined). `valueCol` must already be exact
    * integers (e.g. cents via a DECIMAL cast). Returns `(bin, cnt)`.
    */
  def histSketch(values: DataFrame, valueCol: String,
                 binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"bin width must be >= 1, got $binWidth")
    values.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(expr(s"v DIV ${binWidth}L").as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Histogram ROLLUP — the quantile-side reaggregatability twin of
    * [[hllRollup]]: bin counts built at a fine grain (per source, per
    * day, per shard — any extra grouping columns alongside `bin`)
    * merge to a coarser grain by plain ADDITION, bit-identical to
    * binning the raw values at the coarse grain directly. Quantile
    * read-offs ([[histQuantiles]]) over a rollup therefore ARE the
    * direct estimates. `coarseCols` may be empty (global rollup).
    */
  def histRollup(sketch: DataFrame, coarseCols: Seq[String]): DataFrame =
    sketch.groupBy(coarseCols.map(col) :+ col("bin"): _*)
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** Type-1 (ceil-rank) quantile estimates from a histogram sketch —
    * INTEGER end to end: target rank `t = ⌈q·n⌉` via ppm arithmetic,
    * the answer bin is the first with cumulative count ≥ t, and the
    * within-bin position interpolates in exact integer division. The
    * estimate is within one `binWidth` of the true type-1 quantile by
    * construction. The cumulative walk runs on the bin frame (bounded
    * by the value range / binWidth, never by rows) via the distributed
    * two-pass prefix sum ([[Ordinals.withOrderedPrefixSum]]) — no
    * single-partition window, so even a fine-grained binWidth over a
    * wide value range cannot serialize this stage. Returns
    * `(q_ppm, n_values, target_rank, bin, est)`.
    */
  def histQuantiles(sketch: DataFrame, binWidth: Long,
                    qPpm: Seq[Long]): DataFrame = {
    require(qPpm.nonEmpty && qPpm.forall(q => q > 0 && q <= 1000000),
      s"quantiles must be ppm in (0, 1e6], got $qPpm")
    // "prev" = exclusive prefix of bin counts (bin is distinct);
    // inclusive cumulative = prev + own count
    val cum = Ordinals.withOrderedPrefixSum(
        sketch.withColumn("cnt", col("cnt").cast("long")),
        Seq(col("bin")), "cnt", "prev")
      .withColumn("cum", col("prev") + col("cnt"))
    val tot = cum.agg(max(col("cum")).as("n_values"))
    val targets = tot.withColumn("q_ppm",
        explode(array(qPpm.map(lit): _*)))
      .withColumn("target_rank",
        expr("(n_values * q_ppm + 999999L) DIV 1000000L"))
    targets.join(cum, col("cum") >= col("target_rank") &&
        col("prev") < col("target_rank"))
      .select(col("q_ppm"), col("n_values"), col("target_rank"), col("bin"),
        (col("bin") * lit(binWidth) +
          expr(s"((target_rank - prev) * ${binWidth}L) DIV cnt"))
          .as("est"))
  }

  /** CMS inner-product estimate (Cormode & Muthukrishnan, J.Alg. 2005
    * §4.2): for two sketches with the SAME shape over key-frequency
    * vectors a and b, `min_j Σ_w cntA[j][w]·cntB[j][w]` estimates
    * `Σ_k a_k·b_k` — which is exactly the output cardinality of an
    * equi-join of the two sides on that key (and, with a == b, the
    * self-join size / second frequency moment F2, the skew signal).
    * Always an OVERestimate, never under — the safe direction for
    * sizing a shuffle before running it. At 100 TB the estimate costs
    * two depth×width sketches (mergeable map-side partials) and a
    * depth×width-row join: the join-planning question "how big is
    * this join's output" answered without executing the join.
    * Products/sums run in DECIMAL(38,0) — exact while both cell
    * counts stay below 1e19, far past any BIGINT corpus. Missing
    * sketch rows dot to 0 (a row with no colliding cells means the
    * estimate is 0). Returns one row: `(est_join_size)`.
    */
  def cmsInnerProduct(a: DataFrame, b: DataFrame, depth: Int): DataFrame = {
    val prod = a.select(col("row_idx"), col("bucket"), col("cnt").as("__ca"))
      .join(b.select(col("row_idx"), col("bucket"), col("cnt").as("__cb")),
        Seq("row_idx", "bucket"))
      .groupBy(col("row_idx"))
      .agg(sum(col("__ca").cast("decimal(19,0)") *
        col("__cb").cast("decimal(19,0)")).as("__dot"))
    a.sparkSession.range(depth).select(col("id").as("row_idx"))
      .join(prod, Seq("row_idx"), "left")
      .agg(min(coalesce(col("__dot"), lit(0).cast("decimal(38,0)")))
        .as("__m"))
      .select(col("__m").cast("long").as("est_join_size"))
  }

  def cmsQuery(sketch: DataFrame, probes: DataFrame, valueCol: String,
               depth: Int, width: Int): DataFrame = {
    val keyed = probes.select(col(valueCol).cast("string").as("v")).distinct()
      .select(col("v"), posexplode(cmsBuckets(col("v"), depth, width))
        .as(Seq("row_idx", "bucket")))
      .withColumn("row_idx", col("row_idx").cast("long"))
    keyed.join(sketch, Seq("row_idx", "bucket"), "left")
      .groupBy("v")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
      .select(col("v").as(valueCol), col("cms_est"))
  }
}
