package graft

import java.nio.file.{Files, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Pins the content-addressed artifact store's lifecycle: identical
  * corpus ⇒ cross-call (and cross-session — the address is pure
  * filesystem state) reuse with zero rebuilds; ANY input change ⇒ new
  * content key ⇒ rebuild. A false hit would be silent wrong data, so
  * the invalidation direction is the load-bearing assertion.
  */
class ArtifactCacheSpec extends SparkSpec {
  import spark.implicits._

  test("artifacts reuse on identical corpus and rebuild on corpus change") {
    val cache = Files.createTempDirectory("graft-artcache-")
    sys.props("graft.artifact.cache") = cache.toString
    try {
      val data = Files.createTempDirectory("graft-artdata-")
      def writeInput(rows: Seq[(Long, String)], mtime: Long): Unit = {
        val stage = Files.createTempDirectory("graft-artstage-")
        rows.toDF("id", "t").coalesce(1).write.mode("overwrite")
          .parquet(stage.toString)
        val part = Files.list(stage).iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
        Files.move(part, data.resolve("documents.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        assert(data.resolve("documents.parquet").toFile.setLastModified(mtime))
      }
      writeInput(Seq((1L, "a"), (2L, "b")), 1000000000L)
      val k1 = SparkEntry.SessionArtifacts.contentKey(data.toString)
      var builds = 0
      def get() = SparkEntry.SessionArtifacts.getOrBuild("t", spark,
          data.toString) {
        builds += 1
        spark.read.parquet(data.resolve("documents.parquet").toString)
      }
      assert(get().count() === 2L && builds === 1)
      assert(get().count() === 2L && builds === 1, "identical corpus must hit")
      // the address is stable: same inputs, same key
      assert(SparkEntry.SessionArtifacts.contentKey(data.toString) === k1)
      // changed corpus (size AND mtime move) => new key => rebuild
      writeInput(Seq((1L, "a"), (2L, "b"), (3L, "c")), 2000000000L)
      val k2 = SparkEntry.SessionArtifacts.contentKey(data.toString)
      assert(k2 !== k1, "changed corpus must re-key")
      assert(get().count() === 3L && builds === 2, "changed corpus must rebuild")
      // an mtime-only touch (same size) also re-keys — stats are the
      // address, not the bytes; a false rebuild is the cheap direction
      assert(data.resolve("documents.parquet").toFile.setLastModified(3000000000L))
      assert(SparkEntry.SessionArtifacts.contentKey(data.toString) !== k2)
    } finally sys.props.remove("graft.artifact.cache")
  }

  test("bumping ONE artifact's builder version rebuilds only that artifact") {
    val cache = Files.createTempDirectory("graft-artcache2-")
    sys.props("graft.artifact.cache") = cache.toString
    try {
      val data = Files.createTempDirectory("graft-artdata2-")
      Seq((1L, "a"), (2L, "b")).toDF("id", "t").coalesce(1)
        .write.mode("overwrite").parquet(data.resolve("documents.parquet").toString)
      var buildsA = 0
      var buildsB = 0
      def getA() = SparkEntry.SessionArtifacts.getOrBuild("arta", spark,
        data.toString) { buildsA += 1
          spark.read.parquet(data.resolve("documents.parquet").toString) }
      def getB() = SparkEntry.SessionArtifacts.getOrBuild("artb", spark,
        data.toString) { buildsB += 1
          spark.read.parquet(data.resolve("documents.parquet").toString) }
      assert(getA().count() === 2L && getB().count() === 2L)
      assert(buildsA === 1 && buildsB === 1)
      // bump ONLY arta's builder version: arta rebuilds, artb stays warm
      sys.props("graft.artifact.version.arta") = "spec-bump-1"
      try {
        assert(getA().count() === 2L && getB().count() === 2L)
        assert(buildsA === 2, "bumped artifact must rebuild")
        assert(buildsB === 1, "un-bumped artifact must stay warm")
      } finally sys.props.remove("graft.artifact.version.arta")
      // back on the original version, the ORIGINAL arta artifact is
      // still addressed (and still warm) — versions are addresses, not
      // overwrites
      assert(getA().count() === 2L && buildsA === 2)
    } finally sys.props.remove("graft.artifact.cache")
  }
}
