package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.{Dedup, Merge, Ordinals}
import graft.operators.Merge.{DuplicateMode, ImportMode, Key}
import graft.sink.JdbcSink

/** The import orchestrator — reference `DbImportWorker.work()`
  * (DbImportWorker.java:331-686, SURVEY §3.1) as a driver-side plan
  * builder:
  *
  *   source (raw strings) → mapping/transform select → validate (error
  *   side-channel) → FAST PATH (keyless INSERT/CLEARINSERT → batch
  *   append) or MERGE PATH (arrival ordinal → dedup → mode matrix as
  *   DataFrame joins → atomic rewrite of the JDBC target).
  *
  * The relational merge runs in Spark (cluster-side) instead of the
  * destination DB — the process boundary moves from "JVM→DB" to
  * "driver→executors" and only final writes cross to the sink.
  */
object Importer {

  case class ImportConfig(mode: ImportMode = ImportMode.Insert,
                          duplicateMode: DuplicateMode = DuplicateMode.UpdateAllJoin,
                          keyColumns: Seq[String] = Nil,
                          mapping: Option[String] = None,
                          updateWithNull: Boolean = true,
                          batchSize: Int = 1000,
                          completeCommit: Boolean = false,
                          createTableIfNeeded: Boolean = false,
                          trimValues: Boolean = false,
                          importTz: String = "UTC", dbTz: String = "UTC",
                          createIndexIfNeeded: Boolean = true,
                          /** Run the merge as SQL inside the destination
                            * DB (reference strategy) instead of reading
                            * the target into Spark — for very large
                            * remote targets. See [[graft.sink.JdbcMerge]].
                            */
                          mergeInDb: Boolean = false)

  /** Per-run statistics (reference DbImportWorker.java:879-934). */
  case class ImportResult(found: Long, valid: Long, invalid: Long,
                          duplicates: Long, inserted: Long, updated: Long,
                          deleted: Long, finalCount: Long,
                          createdIndex: Option[String])

  /** Map + transform the raw source through the mapping pipeline. */
  def transformSource(source: DataFrame, targetSchema: StructType,
                      cfg: ImportConfig): DataFrame = {
    val trimmed = if (cfg.trimValues)
      source.select(source.columns.map(c => trim(col(s"`$c`")).as(c)).toIndexedSeq: _*)
    else source
    val mappings = cfg.mapping match {
      case Some(s) => Mapping.parseMappingString(s)
      case None => Mapping.autoMap(targetSchema.fieldNames.toIndexedSeq,
        trimmed.columns.toIndexedSeq)
    }
    val cols: Seq[Column] = mappings.flatMap { m =>
      targetSchema.fields.find(_.name.equalsIgnoreCase(m.dbColumn))
        .map(f => Mapping.compile(m, f, cfg.importTz, cfg.dbTz))
    }
    require(cols.nonEmpty, "mapping resolved no columns")
    trimmed.select(cols: _*)
  }

  /** Full import into a JDBC target. `source` carries raw (string-ish)
    * data columns as produced by the graft sources.
    */
  def importToJdbc(source: DataFrame, url: String, table: String,
                   cfg: ImportConfig): ImportResult = {
    val spark = source.sparkSession

    // --- destination schema: existing table or auto-create (-create) ---
    val exists = JdbcSink.withConnection(url)(c => JdbcSink.tableExists(c, table))
    if (!exists) {
      require(cfg.createTableIfNeeded, s"table $table does not exist")
      val inferred = graft.schema.TypeLattice.stats(source, source.columns.toIndexedSeq)
        .map(graft.schema.TypeLattice.decide)
      val schema = graft.schema.TypeLattice.toStructType(inferred)
      val sizes = inferred.filter(_.dataType == "VARCHAR")
        .map(i => i.columnName -> math.max(1, i.dataSize.toInt)).toMap
      JdbcSink.withConnection(url)(c =>
        JdbcSink.createTable(c, table, schema, cfg.keyColumns, sizes))
    }
    val target = spark.read.format("jdbc")
      .option("url", url).option("dbtable", s""""${table.toUpperCase}"""").load()
    // JDBC metadata uppercases names; normalize to lowercase like the
    // reference (DbImportMappingDialog.java:294)
    val targetLc = target.toDF(target.columns.map(_.toLowerCase).toIndexedSeq: _*)
    val targetSchema = targetLc.schema

    val mapped = transformSource(source, targetSchema, cfg)
    val found = source.count()
    val valid = mapped.count()

    val createdIndex =
      if (cfg.keyColumns.nonEmpty && cfg.createIndexIfNeeded)
        JdbcSink.withConnection(url)(c =>
          JdbcSink.createIndexIfNeeded(c, table, cfg.keyColumns))
      else None

    val fastPath = (cfg.mode == ImportMode.Insert || cfg.mode == ImportMode.ClearInsert) &&
      cfg.keyColumns.isEmpty

    val (inserted, updated, deleted, duplicates) =
      if (fastPath) {
        val deleted = if (cfg.mode == ImportMode.ClearInsert)
          JdbcSink.withConnection(url)(c => JdbcSink.clearTable(c, table))
        else 0L
        val stats =
          if (cfg.completeCommit) JdbcSink.appendAtomic(mapped, url, table, cfg.batchSize)
          else JdbcSink.appendBatch(mapped, url, table, cfg.batchSize)
        (stats.inserted, 0L, deleted, 0L)
      } else if (cfg.mergeInDb) {
        // DB-side merge: Spark dedups the staged side, the destination DB
        // runs the set-based merge against its indexed target in place.
        val st = graft.sink.JdbcMerge.mergeViaSql(mapped, url, table,
          cfg.keyColumns, cfg.mode, cfg.duplicateMode, cfg.updateWithNull,
          cfg.batchSize)
        (st.inserted, st.updated, 0L, st.duplicates)
      } else {
        // MERGE PATH: ordinal → dedup → mode matrix → atomic rewrite
        val staged = Ordinals.withArrivalOrdinal(mapped, "__graft_ord")
        val beforeCount = targetLc.count()
        val dupsInSource = staged.count() -
          Dedup.dropDuplicatesKeepFirst(staged, cfg.keyColumns, Seq(col("__graft_ord"))).count()
        val merged = Merge.importMerge(
            targetLc, staged, cfg.keyColumns.map(Key(_)),
            cfg.mode, cfg.duplicateMode, cfg.updateWithNull,
            sourceOrder = col("__graft_ord"),
            targetOrder = cfg.keyColumns.map(col))
          .drop("__graft_ord")
          .select(targetLc.columns.map(col).toIndexedSeq: _*)
          .cache()
        val afterCount = merged.count()
        val deleted = if (cfg.mode == ImportMode.ClearInsert) beforeCount else 0L
        val insertedN = cfg.mode match {
          case ImportMode.ClearInsert => afterCount
          case _ => afterCount - beforeCount
        }
        val updatedN = cfg.mode match {
          case ImportMode.Update | ImportMode.Upsert =>
            targetLc.join(staged, cfg.keyColumns, "left_semi").count()
          case _ => 0L
        }
        // atomic rewrite: clear + atomic append of the merged table
        JdbcSink.withConnection(url)(c => JdbcSink.clearTable(c, table))
        JdbcSink.appendAtomic(merged, url, table, cfg.batchSize)
        merged.unpersist()
        (insertedN, updatedN, deleted, dupsInSource)
      }

    val finalCount = JdbcSink.withConnection(url)(c => JdbcSink.countRows(c, table))
    ImportResult(found, valid, found - valid, duplicates, inserted, updated,
      deleted, finalCount, createdIndex)
  }
}
