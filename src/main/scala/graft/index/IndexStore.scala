package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable store for TRAINED index artifacts — IVF/k-means centroids,
  * PQ codebooks and code tables, BPE merge lists, Bloom/KMV/CMS
  * sketches. At 100 TB you train once and serve many runs; a query
  * that re-trains its index inside every execution (q27/q78/q89/q260
  * before round 12) turns a one-time cost into a per-run tax.
  *
  * Layout: `<root>/<name>/v=<version>/key=<inputKey>/` holding the
  * artifact parquet plus a `_manifest.json` (name, version, input key,
  * training params, save-time schema) so an operator can refuse a
  * mismatched index instead of silently scoring against stale
  * centroids. Addressing discipline mirrors the session artifact
  * store (`EntrySupport.SessionArtifacts`): the INPUT key captures the
  * training corpus (content hash), the VERSION captures the trainer
  * (bump on semantic change) — a changed corpus or changed trainer
  * simply addresses a different directory, so invalidation is by
  * construction and a false hit is impossible.
  *
  * Writes are atomic (tmp sibling + ATOMIC_MOVE, completeness judged
  * by parquet's `_SUCCESS`), so a crashed training run can never be
  * mistaken for a finished index; concurrent trainers race benignly
  * (the loser discards its tmp). `GRAFT_INDEX_ROOT` (env) or
  * `graft.index.root` (sys-prop) relocates the root — a real
  * deployment points it at durable shared storage. Artifacts here are
  * PRODUCTS with a lifecycle, not run intermediates: nothing is
  * cleaned up at JVM exit.
  */
object IndexStore {

  def root: String =
    sys.props.get("graft.index.root")
      .orElse(sys.env.get("GRAFT_INDEX_ROOT"))
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-index-store")

  /** Content key for a training-input directory: md5 over every
    * parquet file's (name, size, mtime) — the SessionArtifacts
    * discipline (coarse, but a false rebuild costs one training pass
    * while a false hit would be silent wrong data).
    */
  def inputKey(dir: String): String = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val d = Paths.get(dir)
    val stats =
      if (!Files.isDirectory(d)) s"missing:$dir"
      else {
        val ls = Files.list(d)
        try ls.iterator().asScala.toSeq
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .sortBy(_.getFileName.toString)
          .map(p => s"${p.getFileName}:${Files.size(p)}:" +
            s"${Files.getLastModifiedTime(p).toMillis}")
          .mkString("|")
        finally ls.close()
      }
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|$stats".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }

  def dirFor(name: String, version: String, inputKey: String): String =
    s"$root/$name/v=$version/key=$inputKey"

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Train-or-load: returns the stored artifact if present and
    * complete, else runs `train`, saves it (with its manifest), and
    * returns the SAVED copy — both paths therefore read identical
    * parquet bits, which is what lets an oracle row prove
    * load ≡ retrain by hash.
    */
  def getOrTrain(spark: SparkSession, name: String, version: String,
                 inputKey: String, params: Map[String, String] = Map.empty)
                (train: => DataFrame): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get(dirFor(name, version, inputKey))
    if (!Files.exists(dir.resolve("_SUCCESS"))) {
      Files.createDirectories(dir.getParent)
      val tmp = dir.getParent.resolve(s".tmp_${System.nanoTime()}")
      val df = train
      df.write.mode("overwrite").parquet(tmp.toString)
      val manifest = Seq(
        "name" -> name, "version" -> version, "input_key" -> inputKey,
        "schema" -> df.schema.catalogString
      ).map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" } ++
        params.toSeq.sorted.map { case (k, v) =>
          s"${jstr(s"param_$k")}: ${jstr(v)}" }
      Files.writeString(tmp.resolve("_manifest.json"),
        manifest.mkString("{", ",", "}"))
      try Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
      catch { // lost a race: the winner's artifact is equivalent
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.FileSystemException
          if Files.exists(dir.resolve("_SUCCESS")) =>
          rmTree(tmp.toString)
      }
    }
    spark.read.parquet(dir.toString)
  }

  /** The stored artifact, or None when absent/incomplete. */
  def load(spark: SparkSession, name: String, version: String,
           inputKey: String): Option[DataFrame] = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(dirFor(name, version, inputKey))
    if (Files.exists(dir.resolve("_SUCCESS")))
      Some(spark.read.parquet(dir.toString))
    else None
  }

  /** Raw manifest JSON text, when present. */
  def manifest(name: String, version: String,
               inputKey: String): Option[String] = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(dirFor(name, version, inputKey), "_manifest.json")
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  private def rmTree(p: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val r = Paths.get(p)
    if (Files.exists(r)) {
      val walk = Files.walk(r)
      try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
  }
}
