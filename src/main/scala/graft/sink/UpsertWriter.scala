package graft.sink

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Row-routed upsert writer — the NoSQL/Cassandra path (reference
  * DbNoSqlImportWorker.java:330-623, SURVEY §2.2): no temp table; each
  * row probes key existence and routes to UPDATE or INSERT, with an
  * in-flight `waitingInsertKeys` set so a key inserted earlier in the
  * same partition batch counts as existing (DbNoSqlImportWorker.java:
  * 423-457). `updateWithNull=false` skips null columns in the UPDATE,
  * mirroring the restriction to UPDATE_ALL_JOIN + updateNull modes
  * (:39-58).
  *
  * Scale: the caller should pre-partition the DataFrame by the key
  * columns so each key lands in exactly one partition (no cross-partition
  * write races); existence probes are prepared-statement lookups against
  * the key index.
  */
object UpsertWriter {

  case class UpsertStats(inserted: Long, updated: Long)

  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
             updateWithNull: Boolean = true): UpsertStats = {
    val schema: StructType = df.schema
    val keyIdx = keys.map(k => schema.fieldIndex(k))
    val valCols = schema.fieldNames.filterNot(keys.contains)
    val t = table.toUpperCase
    def q(c: String) = s""""${c.toUpperCase}""""
    val sc = df.sparkSession.sparkContext
    val ins = sc.longAccumulator("graft.upsert.inserted")
    val upd = sc.longAccumulator("graft.upsert.updated")
    // route each key to one partition so probes don't race; the shuffle
    // loses arrival order, so pin it with an ordinal BEFORE repartition
    // and sort within partitions — last-wins must be deterministic
    val ordered = graft.operators.Ordinals.withArrivalOrdinal(df, "__graft_uord")
    val partitioned = ordered
      .repartition(keys.map(org.apache.spark.sql.functions.col): _*)
      .sortWithinPartitions(org.apache.spark.sql.functions.col("__graft_uord"))
      .drop("__graft_uord")
    partitioned.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val c = DriverManager.getConnection(url)
        try {
          c.setAutoCommit(true)
          val probe = c.prepareStatement(
            s"""SELECT 1 FROM "$t" WHERE """ +
              keys.map(k => s"${q(k)} = ?").mkString(" AND "))
          val insertPs = c.prepareStatement(
            s"""INSERT INTO "$t" (${schema.fieldNames.map(q).mkString(", ")}) """ +
              s"VALUES (${schema.fieldNames.map(_ => "?").mkString(", ")})")
          val cachedPs = scala.collection.mutable.Map.empty[String, java.sql.PreparedStatement]
          def fullUpdatePs(conn: java.sql.Connection, sql: String): java.sql.PreparedStatement =
            cachedPs.getOrElseUpdate(sql, conn.prepareStatement(sql))
          val seen = scala.collection.mutable.Set.empty[Seq[Any]]
          rows.foreach { r =>
            val keyVals = keyIdx.map(r.get)
            val exists = seen.contains(keyVals) || {
              keyVals.zipWithIndex.foreach { case (v, i) => probe.setObject(i + 1, v) }
              val rs = probe.executeQuery()
              try rs.next() finally rs.close()
            }
            if (!exists) {
              schema.fields.indices.foreach(i => insertPs.setObject(i + 1, r.get(i)))
              insertPs.executeUpdate()
              seen += keyVals
              ins.add(1L)
            } else {
              val setCols = valCols.filter(cn =>
                updateWithNull || r.get(schema.fieldIndex(cn)) != null)
              if (setCols.nonEmpty) {
                // updateWithNull=true always sets ALL value columns —
                // reuse one prepared statement instead of compiling per row
                val sql = s"""UPDATE "$t" SET ${setCols.map(cn => s"${q(cn)} = ?").mkString(", ")}""" +
                  s" WHERE ${keys.map(k => s"${q(k)} = ?").mkString(" AND ")}"
                val ps = if (updateWithNull) fullUpdatePs(c, sql) else c.prepareStatement(sql)
                try {
                  setCols.zipWithIndex.foreach { case (cn, i) =>
                    ps.setObject(i + 1, r.get(schema.fieldIndex(cn)))
                  }
                  keyVals.zipWithIndex.foreach { case (v, i) =>
                    ps.setObject(setCols.length + i + 1, v)
                  }
                  ps.executeUpdate()
                } finally if (!updateWithNull) ps.close()
                upd.add(1L)
              }
            }
          }
          probe.close(); insertPs.close()
          cachedPs.values.foreach(_.close())
        } finally c.close()
      }
    }
    UpsertStats(ins.value, upd.value)
  }
}
