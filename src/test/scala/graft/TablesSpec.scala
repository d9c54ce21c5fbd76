package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pins the `Tables.events` timestamp contract: whatever shape the
  * driver's generator writes (ns-BIGINT under nanosAsLong, µs
  * TIMESTAMP, or µs TIMESTAMP_NTZ), consumers see epoch-ns BIGINTs.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(writer: org.apache.spark.sql.DataFrame): Long = {
    val dir = Files.createTempDirectory("tablesspec").toFile
    val sub = new java.io.File(dir, "events.parquet")
    writer.write.mode("overwrite").parquet(sub.getPath)
    val got = Tables.events(spark, dir.getPath)
    assert(got.schema("ts").dataType ===
      org.apache.spark.sql.types.LongType)
    got.select(col("ts")).collect().head.getLong(0)
  }

  private val usEpoch = 1704067200000000L // 2024-01-01T00:00:00Z in µs

  test("BIGINT ts (ns) passes through untouched") {
    val ns = usEpoch * 1000 + 123 // sub-µs survives the long path
    assert(roundTrip(Seq((1L, ns)).toDF("event_id", "ts")) === ns)
  }

  test("TIMESTAMP ts (µs) converts to exact epoch ns") {
    val df = Seq((1L, new java.sql.Timestamp(usEpoch / 1000)))
      .toDF("event_id", "ts")
      .withColumn("ts", col("ts") + expr("INTERVAL 1 MICROSECOND"))
    assert(roundTrip(df) === (usEpoch + 1) * 1000)
  }

  test("TIMESTAMP_NTZ ts (µs) reads as UTC instant ns") {
    val df = Seq((1L, usEpoch)).toDF("event_id", "us")
      .withColumn("ts", expr("make_timestamp_ntz(2024, 1, 1, 0, 0, 0)"))
      .select(col("event_id"), col("ts"))
    assert(roundTrip(df) === usEpoch * 1000)
  }

  test("rowCount: footer totals equal count() for file and directory tables") {
    val dir = Files.createTempDirectory("tablesspec").toFile
    // directory-of-part-files shape (Spark's own writer, 3 parts)
    Seq.tabulate(100)(i => (i.toLong, i.toString)).toDF("id", "v")
      .repartition(3)
      .write.mode("overwrite").parquet(new java.io.File(dir, "t.parquet").getPath)
    assert(Tables.rowCount(spark, dir.getPath, "t") === 100L)
    // memoized: a second call must not re-read (same value back)
    assert(Tables.rowCount(spark, dir.getPath, "t") === 100L)
    // single-file shape (the driver generator's layout)
    val one = Files.createTempDirectory("tablesspec1").toFile
    val staged = new java.io.File(one, "staged")
    Seq.tabulate(7)(i => (i.toLong, i * 2.0)).toDF("id", "x")
      .coalesce(1).write.mode("overwrite").parquet(staged.getPath)
    val part = staged.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(one, "u.parquet").toPath)
    assert(Tables.rowCount(spark, one.getPath, "u") === 7L)
  }

  test("GRAFT_STRICT_TS: planted sub-µs residue fails loudly at ingest") {
    sys.props("graft.strict.ts") = "1"
    try {
      // aligned data passes under the flag
      assert(roundTrip(Seq((1L, usEpoch * 1000)).toDF("event_id", "ts"))
        === usEpoch * 1000)
      // a true-ns residue dies at ingest with the contract named —
      // instead of diverging 1 unit from the µs-truncating oracle
      val e = intercept[IllegalStateException] {
        roundTrip(Seq((1L, usEpoch * 1000 + 123)).toDF("event_id", "ts"))
      }
      assert(e.getMessage.contains("µs-alignment contract"))
    } finally sys.props.remove("graft.strict.ts")
  }
}
