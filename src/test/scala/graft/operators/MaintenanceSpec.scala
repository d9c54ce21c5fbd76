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

  test("profile reports exact nulls/ndv/min/max per column") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")), (4L, Some("a")))
      .toDF("id", "s")
    val p = TableProfile.profile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") === ((4L, 4L, 4L, "1", "4")))
    assert(p("s") === ((4L, 3L, 2L, "a", "b")))
  }

  test("compaction: file count drops to ~ceil(n/target), rows and values preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-").toString
    val n = 10000L
    spark.range(n).toDF("id").withColumn("v", col("id") % 7)
      .repartition(40).write.mode("overwrite").parquet(s"$dir/in")
    val stats = Compaction.compactParquet(spark, s"$dir/in", s"$dir/out",
      targetRecords = 1500L)
    assert(stats.nRows == n)
    assert(stats.nFilesIn == 40)
    val parts = 7L // ceil(10000 / 1500)
    assert(stats.nFilesOut >= parts && stats.nFilesOut <= parts + 1,
      s"expected ~$parts files, got ${stats.nFilesOut}")
    val back = Compaction.read(spark, s"$dir/out")
    assert(back.count() == n)
    assert(back.agg(sum(col("v"))).head().getLong(0) ==
      spark.range(n).select(sum(col("id") % 7)).head().getLong(0))
    // every file respects the hard cap
    val perFile = back.groupBy(input_file_name()).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(perFile <= 1500L)
  }

  test("sketch profile: nulls counted, sub-k columns exact, case-clashing names refused") {
    val df = Seq((1L, Option("a")), (2L, None), (3L, Option("b")),
      (4L, Option("a"))).toDF("id", "s")
    val out = TableProfile.profileSketch(df, Seq(
        "id" -> col("id").cast("string"), "s" -> col("s")), k = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5))).toMap
    assert(out("id") == ((4L, 0L, 4L, 4.0))) // 4 rows, 0 null, 4 distinct
    assert(out("s") == ((4L, 1L, 2L, 2.0)))  // null skipped, a/b distinct
    intercept[IllegalArgumentException] {
      TableProfile.profileSketch(df, Seq(
        "S" -> col("s"), "s" -> col("s")))
    }
  }

  test("CDC apply: latest op wins, deletes drop, out-of-order log ok") {
    val log = Seq(
      (1L, "I", 1L, "v1"), (1L, "U", 3L, "v3"), (1L, "U", 2L, "v2"),
      (2L, "I", 1L, "x"), (2L, "D", 2L, null),
      (3L, "D", 2L, null), (3L, "I", 1L, "y"), // delete is latest
      (4L, "I", 9L, "z")).toDF("k", "op", "ord", "payload")
    val out = CdcApply.applyLog(log, "k", "op", "ord", Seq("payload"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "v3", 4L -> "z"))
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
