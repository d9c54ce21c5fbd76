package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** Pins the table-maintenance operators: keyed snapshot diff and
  * incremental aggregate maintenance.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot diff classifies added/removed/changed, ignores unchanged") {
    val old = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v")
    val neu = Seq((2L, "b", 20L), (3L, "CHANGED", 30L), (4L, "d", 40L))
      .toDF("k", "s", "v")
    val out = SnapshotDiff.diff(old, neu, "k", Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("incremental merge equals full recompute, in any delta split") {
    val o = Tables.orders(spark, sf())
      .withColumn("price", col("o_totalprice").cast("decimal(18,2)"))
    val full = IncrementalAgg.partials(o, Seq("o_custkey"), Seq("price"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
    for (m <- Seq(2L, 10L)) {
      val state = IncrementalAgg.partials(
        o.filter(col("o_orderkey") % m =!= 0), Seq("o_custkey"), Seq("price"))
      val delta = IncrementalAgg.partials(
        o.filter(col("o_orderkey") % m === 0), Seq("o_custkey"), Seq("price"))
      val merged = IncrementalAgg.merge(state, delta, Seq("o_custkey"), Seq("price"))
        .select(col("o_custkey"), col("n"),
          col("sum_price").cast("decimal(18,2)").as("sum_price"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
      assert(merged === full, s"split mod $m")
    }
  }
}
