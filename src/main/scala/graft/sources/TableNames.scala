package graft.sources

/** Multi-file import helpers (reference DbImport.java:947-948,1316-1340;
  * DbImportMultiWorker.java:107-130, SURVEY §2.1 "Multi-file glob"):
  * files sort by name and each derives its destination table when
  * `-table '*'`.
  */
object TableNames {

  private val CompressionExts = Seq(".zip", ".tar.gz", ".tgz", ".gz")
  private val FormatExts =
    Seq(".csv", ".json", ".yaml", ".yml", ".xml", ".xls", ".xlsx", ".ods",
      ".vcf", ".kdbx", ".sql", ".txt")

  /** Table name from file name: strip compression extension, then format
    * extension, then take a trailing `(name)` if present — pinned by the
    * reference's unit test (`DbImportTest.java:17-25`:
    * `"some_additional text(test_tbl).csv"` → `test_tbl`).
    */
  def deriveTableName(fileName: String): String = {
    val base = new java.io.File(fileName).getName
    var n = base
    val lower0 = n.toLowerCase
    CompressionExts.find(lower0.endsWith).foreach(e => n = n.dropRight(e.length))
    val lower1 = n.toLowerCase
    FormatExts.find(lower1.endsWith).foreach(e => n = n.dropRight(e.length))
    val m = "\\(([^()]*)\\)\\s*$".r.findFirstMatchIn(n.trim)
    m.map(_.group(1)).getOrElse(n.trim)
  }

  /** Sorted expansion of a `?`/`*` glob over the file name (not dirs),
    * mirroring `Collections.sort(filesToImport)`.
    */
  def expandGlob(pattern: String): Seq[String] = {
    val f = new java.io.File(pattern)
    val dir = Option(f.getParentFile).getOrElse(new java.io.File("."))
    val rx = java.util.regex.Pattern.quote(f.getName)
      .replace("*", "\\E.*\\Q").replace("?", "\\E.\\Q")
    val p = java.util.regex.Pattern.compile(rx)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(x => x.isFile && p.matcher(x.getName).matches())
      .map(_.getPath).sorted.toSeq
  }
}
