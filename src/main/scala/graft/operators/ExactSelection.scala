package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Sort-free EXACT rank selection (median / discrete quantiles) via
  * iterative histogram drill-down — the classic distributed selection
  * algorithm (a distributed generalization of quickselect with
  * radix-style pivoting).
  *
  * [[Quantiles.exactQuantiles]] (q48) pays a full range-partitioned
  * sort of the data; the histogram-sketch face (q166) is approximate.
  * This operator is the third point on that trade-off curve: EXACT
  * answers with NO sort and NO data-sized shuffle at all. Each pass is
  * one scan feeding a tiny hash aggregation (at most `maxBuckets`
  * groups per active range), and the number of passes is logarithmic
  * in the VALUE RANGE, not the row count:
  *
  *  1. one scan for (min, max, count) — quantile fractions become
  *     explicit ranks k = max(1, ceil(q·n));
  *  2. while any rank's candidate value range is wider than
  *     `maxBuckets`: one scan histogramming each active range into
  *     ≤ `maxBuckets` equi-width buckets (`(v − lo) >> shift` — shift
  *     keeps the bucketing a cheap integral op); the driver walks the
  *     cumulative counts (bounded by ranges × maxBuckets rows, never
  *     by data) and narrows each rank to the one bucket containing it;
  *  3. one final scan groups the (narrow) surviving ranges by exact
  *     value; the driver reads the value at the residual rank off the
  *     per-value cumulative counts.
  *
  * A 64-bit value domain therefore costs ≤ 1 + 4 + 1 scans; a cents
  * domain (≈2^30) costs 3. At 100 TB that is the difference between
  * "three column scans with KB-sized aggregates" and "shuffle the
  * whole table through a sort" — and unlike a sampled/sketched
  * quantile the answer is exact, so it can gate correctness checks.
  * Skew is immune by construction: a heavy tied value collapses to a
  * single bucket whose cumulative count covers the rank directly.
  *
  * Driver memory is bounded by `ranks × maxBuckets` histogram rows per
  * pass — never by the data. NULLs are ignored (SQL aggregate
  * convention); an all-NULL / empty input returns zero rows.
  */
object ExactSelection {

  /** Type-1 discrete quantiles of `valueCol` (integral): one row
    * `(q, rank, value, n_values)` per requested fraction, where
    * `rank = max(1, ceil(q·n))` and `value` is the rank-th smallest
    * (ties counted with multiplicity) — the `percentile_disc`
    * convention. `qs` must lie in [0, 1].
    */
  def quantilesDisc(df: DataFrame, valueCol: String, qs: Seq[Double],
                    maxBuckets: Int = 1 << 16): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile fractions must be in [0,1], got $qs")
    require(maxBuckets >= 2, "maxBuckets must be at least 2")
    val spark = df.sparkSession
    import spark.implicits._

    val vals = df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .persist()
    try {
      val head = vals.agg(min(col("__v")), max(col("__v")), count(lit(1)))
        .as[(Option[Long], Option[Long], Long)].head()
      val (vminOpt, vmaxOpt, n) = head
      if (n == 0L) {
        return Seq.empty[(Double, Long, Long, Long)]
          .toDF("q", "rank", "value", "n_values")
      }
      val (vmin, vmax) = (vminOpt.get, vmaxOpt.get)
      // ANSI-safe arithmetic precondition: (v − lo) must not overflow.
      // Real measure domains (cents, micros, counts) are nowhere near
      // this; a domain genuinely spanning > 2^63 needs one extra
      // pre-split pass this operator does not implement.
      require(BigInt(vmax) - BigInt(vmin) < BigInt(2).pow(63),
        "value domain spans more than 2^63; pre-split the input first")

      // candidate state per quantile: value range [lo, hi] known to
      // contain the answer, and the rank WITHIN that range
      final case class Cand(id: Int, q: Double, rank: Long,
                            lo: Long, hi: Long, inner: Long)
      var cands = qs.zipWithIndex.map { case (q, i) =>
        val k = math.max(1L, math.ceil(q * n).toLong)
        Cand(i, q, k, vmin, vmax, k)
      }

      // width as unsigned-safe BigInt: hi - lo can overflow Long when
      // the domain spans both Long extremes
      def width(c: Cand): BigInt = BigInt(c.hi) - BigInt(c.lo)

      while (cands.exists(width(_) >= maxBuckets)) {
        val active = cands.filter(width(_) >= maxBuckets)
        // quantiles of one distribution start from (and often stay
        // in) IDENTICAL ranges — histogram each DISTINCT range once,
        // not once per quantile; shift = smallest s putting the range
        // into < maxBuckets buckets
        val planned = active.map(c => (c.lo, c.hi)).distinct
          .zipWithIndex.map { case ((lo, hi), rid) =>
            val w = BigInt(hi) - BigInt(lo)
            var s = 1
            while ((w >> s) >= maxBuckets) s += 1
            (rid, lo, hi, 1L << s, s)
          }
        val ridOf = planned.map(p => (p._2, p._3) -> p._1).toMap
        val ranges = planned.map { case (rid, lo, hi, p2, _) =>
          (rid, lo, hi, p2)
        }.toDF("__id", "__lo", "__hi", "__p2")
        // one scan: per-range equi-width histogram — bucket = the
        // non-negative (v − lo) DIV 2^s, a codegen'd integral divide
        // (functions.shiftright only takes a literal shift). Ranges
        // may overlap (a value lands in every range containing it) —
        // each group is keyed by the range id, so overlap
        // double-counts nothing.
        val hist = vals
          .join(broadcast(ranges),
            col("__v") >= col("__lo") && col("__v") <= col("__hi"))
          .groupBy(col("__id"),
            expr("(__v - __lo) DIV __p2").as("__b"))
          .agg(count(lit(1)).as("__c"))
          .as[(Int, Long, Long)]
          .collect()
          .groupBy(_._1)
        val shifts = planned.map { case (rid, lo, _, _, s) =>
          rid -> (lo, s)
        }.toMap
        cands = cands.map { c =>
          if (width(c) < maxBuckets) c
          else {
            val rid = ridOf((c.lo, c.hi))
            val (lo, s) = shifts(rid)
            var rem = c.inner
            val buckets = hist(rid).sortBy(_._2)
            val (b, cnt) = buckets.iterator
              .map { case (_, b, cnt) => (b, cnt) }
              .find { case (_, cnt) => rem <= cnt || { rem -= cnt; false } }
              .getOrElse(throw new IllegalStateException(
                s"rank ${c.rank} fell off the histogram for q=${c.q}"))
            // BigInt guards the bucket-edge arithmetic near Long.Max
            val nloB = BigInt(lo) + (BigInt(b) << s)
            val nhiB = (nloB + (BigInt(1) << s) - 1).min(BigInt(c.hi))
            Cand(c.id, c.q, c.rank, nloB.toLong, nhiB.toLong, rem)
          }
        }
      }

      // final scan: exact per-value counts inside each narrow range
      // (distinct ranges again shared across quantiles)
      val finRanges = cands.map(c => (c.lo, c.hi)).distinct.zipWithIndex
      val finRidOf = finRanges.map { case (r, rid) => r -> rid }.toMap
      val fin = finRanges.map { case ((lo, hi), rid) => (rid, lo, hi) }
        .toDF("__id", "__lo", "__hi")
      val perValue = vals
        .join(broadcast(fin),
          col("__v") >= col("__lo") && col("__v") <= col("__hi"))
        .groupBy(col("__id"), col("__v"))
        .agg(count(lit(1)).as("__c"))
        .as[(Int, Long, Long)]
        .collect()
        .groupBy(_._1)
      val out = cands.map { c =>
        var rem = c.inner
        val value = perValue(finRidOf((c.lo, c.hi))).sortBy(_._2).iterator
          .map { case (_, v, cnt) => (v, cnt) }
          .find { case (_, cnt) => rem <= cnt || { rem -= cnt; false } }
          .map(_._1)
          .getOrElse(throw new IllegalStateException(
            s"rank ${c.rank} fell off the value counts for q=${c.q}"))
        (c.q, c.rank, value, n)
      }
      out.toDF("q", "rank", "value", "n_values").orderBy(col("q"))
    } finally vals.unpersist()
  }

  /** PER-KEY lower median by the same sort-free drill — the scale
    * path for "median of a huge expansion per group" (Theil–Sen
    * slopes, latency percentiles per tenant): no sort, no window, no
    * RDD conversion; each round is one hash aggregation over the
    * input with ≤ `maxBuckets` live buckets per key. Driver memory is
    * O(|keys| · maxBuckets) histogram rows per round — keys must be
    * GROUP-like (priorities, tenants), not data-like.
    *
    * The projected input persists for the drill's ≈
    * log_maxBuckets(range) + 2 rounds and releases on return, so an
    * expensive upstream runs once. Returns `(keyCol, n_values,
    * value)` with `value` the rank-`(n+1) DIV 2` smallest per key;
    * NULL values and NULL keys are ignored, empty keys drop.
    */
  def lowerMedianPerKey(df: DataFrame, keyCol: String, valueCol: String,
                        maxBuckets: Int = 1 << 16): DataFrame = {
    require(maxBuckets >= 2, "maxBuckets must be at least 2")
    val spark = df.sparkSession
    import spark.implicits._
    // NOTE: this is the same drill loop as quantilesDisc above, keyed
    // — a fix to either rank walk / bucket-narrowing step must land in
    // BOTH (they share spec coverage via the brute-force differentials)
    val vals = df.select(col(keyCol).cast("string").as("__key"),
        col(valueCol).cast("long").as("__v"))
      // NULL keys would fall out of the equi-joins below after being
      // planned — drop them up front (no group, no median)
      .filter(col("__v").isNotNull && col("__key").isNotNull)
      .persist()
    val keyType = df.schema(keyCol).dataType
    try {
    val stats = vals.groupBy(col("__key"))
      .agg(min(col("__v")).as("lo"), max(col("__v")).as("hi"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
    stats.foreach { case (k, lo, hi, _) =>
      require(BigInt(hi) - BigInt(lo) < BigInt(2).pow(63),
        s"value domain of key $k spans more than 2^63") }
    // per-key candidate state: [lo, hi] contains the answer at
    // residual rank `inner`
    var cands = stats.toSeq.map { case (k, lo, hi, n) =>
      (k, lo, hi, (n + 1L) / 2L, n)
    }
    while (cands.exists(c => BigInt(c._3) - BigInt(c._2) >= maxBuckets)) {
      val active = cands.filter(c => BigInt(c._3) - BigInt(c._2) >= maxBuckets)
      val planned = active.map { case (k, lo, hi, _, _) =>
        val w = BigInt(hi) - BigInt(lo)
        var s = 1
        while ((w >> s) >= maxBuckets) s += 1
        (k, lo, hi, 1L << s, s)
      }
      val ranges = planned.map(p => (p._1, p._2, p._3, p._4))
        .toDF("__key", "__lo", "__hi", "__p2")
      val hist = vals.join(broadcast(ranges), Seq("__key"))
        .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
        .groupBy(col("__key"), expr("(__v - __lo) DIV __p2").as("__b"))
        .agg(count(lit(1)).as("__c"))
        .as[(String, Long, Long)].collect()
        .groupBy(_._1)
      val shifts = planned.map(p => p._1 -> (p._2, p._5)).toMap
      cands = cands.map { c =>
        if (BigInt(c._3) - BigInt(c._2) < maxBuckets) c
        else {
          val (k, _, hi, _, n) = c
          val (lo, s) = shifts(k)
          var rem = c._4
          val (b, _) = hist(k).sortBy(_._2).iterator
            .map { case (_, b, cnt) => (b, cnt) }
            .find { case (_, cnt) => rem <= cnt || { rem -= cnt; false } }
            .getOrElse(throw new IllegalStateException(
              s"median rank fell off the histogram for key $k"))
          val nloB = BigInt(lo) + (BigInt(b) << s)
          val nhiB = (nloB + (BigInt(1) << s) - 1).min(BigInt(hi))
          (k, nloB.toLong, nhiB.toLong, rem, n)
        }
      }
    }
    val fin = cands.map(c => (c._1, c._2, c._3))
      .toDF("__key", "__lo", "__hi")
    val perValue = vals.join(broadcast(fin), Seq("__key"))
      .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
      .groupBy(col("__key"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    cands.map { case (k, _, _, inner, n) =>
      var rem = inner
      val value = perValue(k).sortBy(_._2).iterator
        .map { case (_, v, cnt) => (v, cnt) }
        .find { case (_, cnt) => rem <= cnt || { rem -= cnt; false } }
        .map(_._1)
        .getOrElse(throw new IllegalStateException(
          s"median rank fell off the value counts for key $k"))
      (k, n, value)
    }.toDF("__key", "n_values", "value")
      // the drill keys on a string rendering; hand back the caller's
      // key type (integral/string keys round-trip exactly)
      .select(col("__key").cast(keyType).as(keyCol), col("n_values"),
        col("value"))
      .orderBy(col(keyCol))
    } finally vals.unpersist()
  }
}
