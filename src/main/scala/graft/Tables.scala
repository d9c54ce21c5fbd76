package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loading helpers for the driver-generated TPC-H-ish
  * test data (see TESTDATA.md). Every `SparkEntry.queries` entry reads
  * through here so filters/projections push down to the parquet scan.
  */
object Tables {
  def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Every consumer treats `events.ts` as epoch NANOSECONDS in a BIGINT
    * (the shape TIMESTAMP(NANOS) parquet takes under
    * `spark.sql.legacy.parquet.nanosAsLong=true`). Driver-regenerated
    * data may instead carry µs-precision TIMESTAMP/TIMESTAMP_NTZ —
    * normalize those back to the ns-long contract here (sessions pin
    * UTC, so the NTZ→instant reading is unambiguous). `unix_micros` is
    * exact integer arithmetic — no float rounding on the path.
    *
    * µs-ALIGNMENT CONTRACT: `ts` values are required to be µs-aligned
    * (ns % 1000 == 0). The LongType path passes values through
    * untouched — TablesSpec pins that sub-µs residues SURVIVE (they
    * are data, not noise, and truncating here would silently alter
    * them) — but oracle parity for µs-granular arithmetic (q146's
    * `ts DIV 1000`, q157's `DIV 1000000000` offsets) holds only for
    * aligned inputs, because DuckDB reads the same parquet as
    * TIMESTAMP and truncates each value to µs BEFORE differencing.
    * The driver's generator emits µs-aligned ns; true-ns data would
    * need its own oracle treatment, not silent truncation.
    *
    * `GRAFT_STRICT_TS=1` (env; `graft.strict.ts=1` sys-prop for specs)
    * opts into ENFORCING the alignment contract at ingest: the
    * LongType path scans for a sub-µs residue (`pmod(ts,1000) != 0`)
    * once per (JVM, source dir) and fails loudly on the first offender
    * — true-ns data then dies here with a named contract instead of
    * diverging 1-unit from the oracle deep inside q146/q157.
    */
  private val strictTsChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def strictTs: Boolean =
    sys.env.get("GRAFT_STRICT_TS").contains("1") ||
      sys.props.get("graft.strict.ts").contains("1")
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        val key = df.queryExecution.analyzed
          .collectLeaves().map(_.toString).mkString("|")
        // memo only AFTER a clean pass — a failed check must keep
        // failing on retry, not vanish into the memo
        if (strictTs && !strictTsChecked.contains(key)) {
          val bad = df.filter(expr("pmod(ts, 1000) != 0")).limit(1).collect()
          if (bad.nonEmpty) throw new IllegalStateException(
            "events.ts violates the µs-alignment contract (ns % 1000 != 0; " +
              s"first offender: ${bad.head}) — true-ns data needs its own " +
              "oracle treatment, see Tables.normalizeTs")
          strictTsChecked.add(key)
        }
        df
      case TimestampType =>
        df.withColumn("ts", expr("unix_micros(ts) * CAST(1000 AS BIGINT)"))
      case TimestampNTZType =>
        df.withColumn("ts",
          expr("unix_micros(CAST(ts AS TIMESTAMP)) * CAST(1000 AS BIGINT)"))
      case other =>
        throw new IllegalStateException(s"unsupported events.ts type: $other")
    }

  def region(s: SparkSession, d: String): DataFrame = tbl(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = tbl(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = tbl(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = tbl(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = tbl(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = tbl(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = tbl(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(tbl(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")

  /** Exact row count of a source table, read from parquet FOOTER
    * metadata on the driver — no Spark job. Memoized per (JVM, path):
    * the testdata is immutable for a session's lifetime, and at
    * cluster scale footer reads cost one RPC per file (the driver
    * lists the files anyway to plan the scan) where a `count()` job
    * launches a task per row-group. Footer record counts are the
    * parquet writer's own exact totals, so the value is identical to
    * the oracle's `count(*)` — strategy elections and the q314 r-law
    * stay engine-exact. Handles both single-file tables (the driver
    * generator's shape) and directory-of-part-files tables.
    */
  private val rowCountCache =
    scala.collection.concurrent.TrieMap[String, Long]()
  def rowCount(s: SparkSession, d: String, name: String): Long =
    rowCountCache.getOrElseUpdate(s"$d/$name", {
      import org.apache.hadoop.fs.Path
      val root = new Path(s"$d/$name.parquet")
      val conf = s.sparkContext.hadoopConfiguration
      val fs = root.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(root).isFile) Array(fs.getFileStatus(root))
        else fs.listStatus(root).filter { f =>
          val n = f.getPath.getName
          f.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
      files.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    })
}
