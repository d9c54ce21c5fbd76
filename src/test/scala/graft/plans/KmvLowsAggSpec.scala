package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sketches

class KmvLowsAggSpec extends SparkSpec {

  import spark.implicits._

  test("kmv_lows equals the row-sketch bottom-k on the same data") {
    val vals = (1 to 5000).map(i => (s"g${i % 3}", s"v${i % 700}"))
      .toDF("g", "v")
    val k = 16
    // row formulation: distinct + windowed bottom-k
    val rows = Sketches.kmvSketch(vals, Seq("g"), "v", k)
      .groupBy("g").agg(sort_array(collect_list(col("h"))).as("expect"))
    // native aggregate over the same hash column
    val native = vals.withColumn("h", Sketches.hash48(col("v")))
      .groupBy("g").agg(KmvLowsAgg.kmvLows(col("h"), k).as("got"))
    val j = rows.join(native, "g")
    assert(j.count() == 3)
    assert(j.filter(col("expect") =!= col("got")).count() == 0)
  }

  test("merge law: result is invariant under partitioning") {
    val vals = (1 to 4000).map(i => ("g", s"x${i % 911}")).toDF("g", "v")
      .withColumn("h", Sketches.hash48(col("v")))
    val one = vals.coalesce(1)
      .groupBy("g").agg(KmvLowsAgg.kmvLows(col("h"), 32).as("lows"))
    val many = vals.repartition(13)
      .groupBy("g").agg(KmvLowsAgg.kmvLows(col("h"), 32).as("lows"))
    val a = one.select("lows").as[Seq[Long]].head()
    val b = many.select("lows").as[Seq[Long]].head()
    assert(a == b)
    assert(a.length == 32 && a == a.sorted && a.distinct == a)
  }

  test("NULLs are skipped; an under-full group returns all distinct hashes; empty input planned") {
    val vals = Seq(("g", Option("a")), ("g", Option("b")), ("g", None),
      ("g", Option("a"))).toDF("g", "v")
      .withColumn("h", Sketches.hash48(col("v")))
    val out = vals.groupBy("g")
      .agg(KmvLowsAgg.kmvLows(col("h"), 8).as("lows"))
      .select("lows").as[Seq[Long]].head()
    assert(out.length == 2) // a, b — NULL skipped, duplicate a collapsed
  }

  test("SQL registration: kmv_lows usable from spark.sql") {
    KmvLowsAgg.register(spark)
    (1 to 300).map(i => (i % 2, i % 97)).toDF("g", "x")
      .withColumn("h", Sketches.hash48(col("x").cast("string")))
      .createOrReplaceTempView("__kmv_in")
    val df = spark.sql(
      "SELECT g, kmv_lows(h, 16) AS lows FROM __kmv_in GROUP BY g")
    val lens = df.select(size(col("lows"))).as[Int].collect().toSeq
    assert(lens == Seq(16, 16))
  }

  test("rejects non-long input and k < 2 loudly") {
    intercept[Exception] {
      Seq(("g", "s")).toDF("g", "v").groupBy("g")
        .agg(KmvLowsAgg.kmvLows(col("v"), 8)).collect()
    }
    intercept[IllegalArgumentException] {
      KmvLowsAgg(org.apache.spark.sql.catalyst.expressions.Literal(1L), 1)
    }
  }
}
