package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted averaging over irregular event streams — the TWAP /
  * sensor-mean primitive: each observation holds its value until the
  * next observation, so the mean weights every value by how LONG it
  * was current, not by how often it was sampled (a user emitting 100
  * events in one minute then one event a day later is dominated by
  * the day, not the burst).
  *
  * Scale shape: ONE user-partitioned window (`lead` over the per-user
  * time order — a single hash shuffle on the user key, the same
  * partitioning Sessionize/SCD2 use) and ONE hash aggregation. The
  * value×duration products accumulate in DECIMAL (exact — both the
  * 2-dp value and the µs duration are exact decimals), so the sum is
  * order-independent and engine-portable; only the final mean is a
  * double (one cast + one IEEE division, deterministic given the
  * exact inputs).
  */
object TimeWeighted {

  /** Per-key interval-weighted mean: `(key, n_events, span_us, twa)`
    * with `twa = Σ value_i·dur_i / Σ dur_i` where `dur_i` is the µs
    * gap to the key's next event (the last event carries no weight —
    * its value was never "current" for any observed duration). Keys
    * with a single event have no observed interval and are dropped.
    * `tsCol` must be epoch µs (exact integers).
    */
  def twa(events: DataFrame, keyCol: String, tsCol: String,
          valueCol: String): DataFrame = {
    val w = Window.partitionBy("k").orderBy("us")
    // (9,2)×(18,0) → decimal(28,2): stays exact, no Spark precision-loss
    // adjustment (a (18,2)×long product would cross the 38-digit cap)
    events.select(col(keyCol).as("k"), col(tsCol).cast("long").as("us"),
        col(valueCol).cast("decimal(9,2)").as("v"))
      .withColumn("dur",
        (lead("us", 1).over(w) - col("us")).cast("decimal(18,0)"))
      .filter(col("dur").isNotNull) // last event per key: no interval
      .groupBy("k")
      .agg((count(lit(1)) + 1).as("n_events"), // +1: the dropped last event
        sum(col("dur")).cast("long").as("span_us"),
        // the Σv·dur integer exceeds 2^53 for long-lived keys, so the
        // decimal→double cast rounds; 6dp absorbs the engine-specific
        // last-ULP of that conversion (values are O(100), µs-weighted)
        round(sum(col("v") * col("dur")).cast("double") /
          sum(col("dur")).cast("double"), 6).as("twa"))
  }
}
