package graft.index

import java.nio.file.Files

import graft.SparkSpec

/** Pins the trained-index store's lifecycle: train-once semantics,
  * content/version addressing, manifest presence, and the atomicity
  * contract (no `_SUCCESS` → not an index).
  */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  test("getOrTrain trains once, loads thereafter; version bump retrains") {
    val root = Files.createTempDirectory("idxspec").toString
    sys.props("graft.index.root") = root
    try {
      var builds = 0
      def train() = { builds += 1; Seq((1L, 2.0), (3L, 4.0)).toDF("id", "w") }
      val a = IndexStore.getOrTrain(spark, "toy", "v1", "k1",
        Map("alpha" -> "0.5"))(train())
      assert(a.count() === 2 && builds === 1)
      // second call: loads the SAVED parquet, no retrain
      val b = IndexStore.getOrTrain(spark, "toy", "v1", "k1")(train())
      assert(builds === 1)
      assert(b.orderBy("id").collect().toSeq ===
        a.orderBy("id").collect().toSeq)
      // manifest records identity + params
      val m = IndexStore.manifest("toy", "v1", "k1").get
      assert(m.contains("\"name\": \"toy\"") &&
        m.contains("\"param_alpha\": \"0.5\""))
      // a trainer-version bump addresses a NEW directory → retrains
      IndexStore.getOrTrain(spark, "toy", "v2", "k1")(train())
      assert(builds === 2)
      // a different input key likewise
      IndexStore.getOrTrain(spark, "toy", "v1", "k2")(train())
      assert(builds === 3)
      // load() of something never trained is None, not an exception
      assert(IndexStore.load(spark, "toy", "v9", "k1").isEmpty)
    } finally sys.props.remove("graft.index.root")
  }

  test("inputKey changes when a parquet input changes, ignores other files") {
    val dir = Files.createTempDirectory("idxkey")
    Files.writeString(dir.resolve("a.parquet"), "AAAA")
    Files.writeString(dir.resolve("notes.txt"), "x")
    val k1 = IndexStore.inputKey(dir.toString)
    // non-parquet files don't participate in the key
    Files.writeString(dir.resolve("notes.txt"), "yyyy")
    assert(IndexStore.inputKey(dir.toString) === k1)
    // a parquet content change (size) re-keys
    Files.writeString(dir.resolve("a.parquet"), "AAAAAAAA")
    assert(IndexStore.inputKey(dir.toString) !== k1)
  }
}
