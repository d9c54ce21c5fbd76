package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Merge.{DuplicateMode, ImportMode, Key}

/** Merge/dedup semantics pinned by the reference's golden JSON upsert
  * test (FIXTURES.md §3 ⇄ reference DbImportTest_HSQL.java:792-905):
  * 8 source records with duplicated keys 1-3 (second occurrence has a
  * null varchar), pre-filled target keys 1, 3, 999.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  // source arrival order = ord; keys 1,1,2,2,3,3,4,5; later dup rows have
  // null varchar but a distinct clob (the §3 scenario).
  private def source = Seq(
    (1, Some(" aBcDeF123_1"), " aBcDeF1234", 1),
    (1, None, " aBcDeF1235_1", 2),
    (2, Some(" aBcDeF123_2"), " aBcDeF1234", 3),
    (2, None, " aBcDeF1235_2", 4),
    (3, Some(" aBcDeF123_3"), " aBcDeF1234", 5),
    (3, None, " aBcDeF1235_3", 6),
    (4, None, " aBcDeF1235_4", 7),
    (5, Some(" aBcDeF123_5"), " aBcDeF1234", 8),
  ).toDF("k", "varchar_col", "clob_col", "ord")

  private def target = Seq(
    (1, Some("pre_1"), "pre_clob_1"),
    (3, Some("pre_3"), "pre_clob_3"),
    (999, Some("Überprüfung \"§\""), "pre_clob_999"),
  ).toDF("k", "varchar_col", "clob_col")

  test("UPSERT with UPDATE_ALL_JOIN and updateWithNullValues=true (reference default)") {
    val out = Merge.importMerge(target, source, Seq(Key("k")),
        ImportMode.Upsert, DuplicateMode.UpdateAllJoin, updateWithNull = true,
        sourceOrder = col("ord"), targetOrder = Seq(col("k")))
      .orderBy("k").select("k", "varchar_col", "clob_col").collect()
    // later dup rows win INCLUDING nulls: keys 1-3 get null varchar and the
    // _1235 clob; 999 untouched; 4,5 inserted.
    assert(out.toSeq == Seq(
      Row(1, null, " aBcDeF1235_1"),
      Row(2, null, " aBcDeF1235_2"),
      Row(3, null, " aBcDeF1235_3"),
      Row(4, null, " aBcDeF1235_4"),
      Row(5, " aBcDeF123_5", " aBcDeF1234"),
      Row(999, "Überprüfung \"§\"", "pre_clob_999")))
  }

  test("UPSERT with updateWithNullValues=false keeps last non-null per column") {
    val out = Merge.importMerge(target, source, Seq(Key("k")),
        ImportMode.Upsert, DuplicateMode.UpdateAllJoin, updateWithNull = false,
        sourceOrder = col("ord"), targetOrder = Seq(col("k")))
      .orderBy("k").select("k", "varchar_col", "clob_col").collect()
    assert(out.toSeq == Seq(
      Row(1, " aBcDeF123_1", " aBcDeF1235_1"),
      Row(2, " aBcDeF123_2", " aBcDeF1235_2"),
      Row(3, " aBcDeF123_3", " aBcDeF1235_3"),
      Row(4, null, " aBcDeF1235_4"),
      Row(5, " aBcDeF123_5", " aBcDeF1234"),
      Row(999, "Überprüfung \"§\"", "pre_clob_999")))
  }

  test("INSERT with UPDATE_ALL_DROP keeps first occurrence and skips existing keys") {
    val out = Merge.importMerge(target, source, Seq(Key("k")),
        ImportMode.Insert, DuplicateMode.UpdateAllDrop, updateWithNull = true,
        sourceOrder = col("ord"), targetOrder = Seq(col("k")))
      .orderBy("k").select("k", "varchar_col").collect()
    // keys 1,3 exist → dropped; first occurrences of 2,4,5 appended
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSeq == Seq(
      1 -> "pre_1", 2 -> " aBcDeF123_2", 3 -> "pre_3", 4 -> null,
      5 -> " aBcDeF123_5", 999 -> "Überprüfung \"§\""))
  }

  test("UPDATE with NO_CHECK leaves the target unchanged") {
    val out = Merge.importMerge(target, source, Seq(Key("k")),
        ImportMode.Update, DuplicateMode.NoCheck, updateWithNull = true,
        sourceOrder = col("ord"), targetOrder = Seq(col("k")))
    assert(out.orderBy("k").collect().toSeq == target.orderBy("k").collect().toSeq)
  }

  test("CLEARINSERT empties the target before inserting deduped source") {
    val out = Merge.importMerge(target, source, Seq(Key("k")),
        ImportMode.ClearInsert, DuplicateMode.UpdateAllJoin, updateWithNull = true,
        sourceOrder = col("ord"), targetOrder = Seq(col("k")))
    assert(out.select("k").as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("UPDATE_FIRST only updates the first duplicate target row") {
    val dupTarget = Seq((1, "a", 10), (1, "b", 20), (2, "c", 30))
      .toDF("k", "v", "pos")
    val staged = Seq((1, "NEW")).toDF("k", "v")
    val out = Merge.updateFirst(dupTarget, staged, Seq(Key("k")),
        targetOrder = Seq(col("pos")))
      .orderBy("k", "pos").select("k", "v").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq(1 -> "NEW", 1 -> "b", 2 -> "c"))
  }

  test("key functions compare on fn(col) — LOWER(email) style keys") {
    val t = Seq(("A@X.COM", 1), ("b@y.com", 2)).toDF("email", "v")
    val s = Seq(("a@x.com", 99), ("C@Z.COM", 3)).toDF("email", "v")
    val out = Merge.insertNotExisting(t, s, Seq(Key("email", lower)))
      .orderBy("v").collect()
    // a@x.com matches A@X.COM case-insensitively → only C@Z.COM inserted
    assert(out.map(_.getString(0)).toSeq == Seq("A@X.COM", "b@y.com", "C@Z.COM"))
  }

  test("importMerge dedups on fn(col): case-variant source keys collapse") {
    val t = Seq(("A@X.COM", 1), ("b@y.com", 2)).toDF("email", "v")
    // two case-variants of the SAME fn-key arrive; a raw-column dedup
    // would keep both and the update join would then duplicate A@X.COM
    val s = Seq(("a@x.com", 10, 1L), ("A@x.Com", 11, 2L), ("c@z.com", 3, 3L))
      .toDF("email", "v", "ord")
    val out = Merge.importMerge(t, s,
        Seq(Key("email", lower)), ImportMode.Upsert, DuplicateMode.UpdateAllJoin,
        updateWithNull = true, sourceOrder = col("ord"),
        targetOrder = Seq(col("email")))
      .orderBy(lower(col("email"))).select("email", "v").collect()
    // exactly one row per fn-key; the later variant's value (11) wins
    assert(out.map(r => (r.getString(0).toLowerCase, r.getInt(1))).toSeq ==
      Seq(("a@x.com", 11), ("b@y.com", 2), ("c@z.com", 3)))
  }

  test("importMerge with key-only schema dedups instead of crashing") {
    val t = Seq(Tuple1(1), Tuple1(2)).toDF("k")
    val s = Seq((3, 1L), (3, 2L), (4, 3L)).toDF("k", "ord")
    val out = Merge.importMerge(t, s, Seq(Key("k")),
        ImportMode.Upsert, DuplicateMode.UpdateAllJoin, updateWithNull = true,
        sourceOrder = col("ord"), targetOrder = Seq(col("k")))
      .select("k").as[Int].collect().sorted
    assert(out.toSeq == Seq(1, 2, 3, 4))
  }

  test("arrival ordinal is contiguous, 1-based, and order-preserving") {
    val df = spark.range(0, 1000).toDF("x").repartition(7)
    val withOrd = Ordinals.withArrivalOrdinal(df)
    val ords = withOrd.select("import_item").as[Long].collect().sorted
    assert(ords.toSeq == (1L to 1000L))
    // ordinal follows partition-local row order (true arrival semantics)
    val firstPerPart = withOrd.rdd
      .mapPartitions(it => it.toSeq.sortBy(_.getLong(1)).headOption.iterator)
    assert(firstPerPart.count() == 7)
  }

  test("detectDuplicates counts duplicated key groups") {
    val df = Seq(1, 1, 2, 3, 3, 3).toDF("k")
    assert(Dedup.detectDuplicates(df, Seq("k")) == 2)
  }

  test("INSERT with CKECK_SOURCE_ONLY_DROP dedups source but keeps existing keys") {
    val out = Merge.importMerge(target, source, Seq(Key("k")),
        ImportMode.Insert, DuplicateMode.CheckSourceOnlyDrop, updateWithNull = true,
        sourceOrder = col("ord"), targetOrder = Seq(col("k")))
      .groupBy("k").count().orderBy("k").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    // source-only check: deduped source appends even where keys exist →
    // keys 1 and 3 now appear twice (target row + source first occurrence)
    assert(out.toSeq == Seq(1 -> 2L, 2 -> 1L, 3 -> 2L, 4 -> 1L, 5 -> 1L, 999 -> 1L))
  }

  test("UPSERT with NO_CHECK appends everything unconditionally") {
    val out = Merge.importMerge(target, source, Seq(Key("k")),
        ImportMode.Upsert, DuplicateMode.NoCheck, updateWithNull = true,
        sourceOrder = col("ord"), targetOrder = Seq(col("k")))
    assert(out.count() == target.count() + source.count())
  }

  test("composite keys: merge matches on all key columns") {
    val t = Seq((1, "x", "t1"), (1, "y", "t2")).toDF("k1", "k2", "v")
    val s = Seq((1, "x", "S1", 1), (1, "z", "S3", 2)).toDF("k1", "k2", "v", "ord")
    val out = Merge.importMerge(t, s, Seq(Key("k1"), Key("k2")),
        ImportMode.Upsert, DuplicateMode.UpdateAllJoin, updateWithNull = true,
        sourceOrder = col("ord"), targetOrder = Seq(col("k1"), col("k2")))
      .orderBy("k1", "k2").select("k1", "k2", "v").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    // (1,x) updated, (1,y) untouched, (1,z) inserted
    assert(out.toSeq == Seq((1, "x", "S1"), (1, "y", "t2"), (1, "z", "S3")))
  }

  test("MAKE_UNIQUE_DROP dedups the target itself before merging") {
    val dupTarget = Seq((1, "first", 10), (1, "second", 20), (2, "only", 30))
      .toDF("k", "v", "pos")
    val src = Seq((3, "new", 1)).toDF("k", "v", "ord")
    val out = Merge.importMerge(dupTarget.drop("pos"), src, Seq(Key("k")),
        ImportMode.Insert, DuplicateMode.MakeUniqueDrop, updateWithNull = true,
        sourceOrder = col("ord"),
        targetOrder = Seq(col("v"))) // "first" < "second" lexicographically
      .orderBy("k").select("k", "v").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq(1 -> "first", 2 -> "only", 3 -> "new"))
  }

  test("MAKE_UNIQUE_JOIN merges duplicate target rows before merging") {
    val dupTarget = Seq((1, Some("a"), 10), (1, None, 20), (2, Some("x"), 30))
      .toDF("k", "v", "pos")
    val src = Seq((9, Some("z"), 1)).toDF("k", "v", "ord")
    val out = Merge.importMerge(dupTarget.drop("pos"), src.drop("ord")
          .withColumn("ord", lit(1)), Seq(Key("k")),
        ImportMode.Upsert, DuplicateMode.MakeUniqueJoin, updateWithNull = false,
        sourceOrder = col("ord"), targetOrder = Seq(col("v")))
      .orderBy("k").select("k", "v").collect()
    // target key 1: join-dup keeps last non-null over v-order → "a"
    assert(out.map(r => (r.getInt(0), Option(r.getString(1)))).toSeq ==
      Seq(1 -> Some("a"), 2 -> Some("x"), 9 -> Some("z")))
  }
}
