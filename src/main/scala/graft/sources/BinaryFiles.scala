package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared `binaryFile` loader for the one-file-per-task sources
  * (xls/xlsx/ods/kdbx). A glob in the FILENAME is routed through
  * `pathGlobFilter` on the parent directory: loading the raw glob path
  * works, but Spark's streaming-sink metadata probe then logs a
  * FileNotFoundException stack trace for the unexpanded pattern on
  * every read.
  */
object BinaryFiles {
  def read(spark: SparkSession, path: String): DataFrame = {
    val p = new java.io.File(path)
    val reader = spark.read.format("binaryFile")
    if (p.getName.exists(c => c == '*' || c == '?'))
      reader.option("pathGlobFilter", p.getName).load(p.getParent)
    else reader.load(path)
  }
}
