package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{BinaryType, StringType, StructField}

/** `file` format info (reference DbImportWorker.java:1209-1315, SURVEY
  * §2.3): a column value is a file path whose contents load into a BLOB
  * (binary) or CLOB (text) column, with transparent single-entry
  * decompression and an upload size guard (the `max_allowed_packet`
  * analog, :961-966,1212-1219).
  *
  * Distributed model: contents load inside the task that owns the row
  * (`mapPartitions`), so the bytes never gather on the driver; paths must
  * resolve on every executor (shared/dist FS), which is the cluster
  * equivalent of the reference's local-path contract.
  */
object FileLoad {

  def loadFileColumn(df: DataFrame, pathCol: String, outCol: String,
                     asText: Boolean = false, charset: String = "UTF-8",
                     zipPassword: Option[String] = None,
                     maxBytes: Long = Long.MaxValue): DataFrame = {
    val schema = df.schema.add(StructField(outCol,
      if (asText) StringType else BinaryType, nullable = true))
    val idx = df.schema.fieldIndex(pathCol)
    val rows = df.rdd.mapPartitions { it =>
      it.map { r =>
        val p = r.getString(idx)
        val v: Any = if (p == null) null else {
          val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
          val bytes = graft.sources.Compression.decompress(p, raw, zipPassword)
          if (bytes.length > maxBytes)
            throw new IllegalArgumentException(
              s"file $p exceeds the allowed upload size ($maxBytes bytes)")
          if (asText) new String(bytes, charset) else bytes
        }
        Row.fromSeq(r.toSeq :+ v)
      }
    }
    df.sparkSession.createDataFrame(rows, schema)
  }
}
