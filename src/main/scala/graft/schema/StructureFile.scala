package graft.schema

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types._

import graft.sink.JdbcSink

/** Structure-file support (reference `-structure` JSON,
  * DbImportWorker.java:760-877 + standalone DbStructureWorker.java:42-200,
  * SURVEY §1.3): an explicit declared schema
  * `{table: {columns: [{name, datatype, datasize, defaultvalue}],
  * keycolumns: [...]}}` that can create tables and sync missing columns.
  */
object StructureFile {

  case class ColumnDef(name: String, datatype: String, datasize: Option[Int],
                       defaultvalue: Option[String])
  case class TableDef(name: String, columns: Seq[ColumnDef], keyColumns: Seq[String])

  /** Parse the structure JSON with Jackson (shipped with Spark). */
  def parse(json: String): Seq[TableDef] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    root.properties().asScala.toSeq.map { e =>
      val tbl = e.getKey
      val node = e.getValue
      val cols = Option(node.get("columns")).map(_.elements().asScala.toSeq).getOrElse(Nil)
        .map { c =>
          ColumnDef(
            c.get("name").asText(),
            // explicit JSON null arrives as Jackson NullNode, not Java
            // null — filter it, or datasize:null becomes Some(0) and
            // defaultvalue:null the literal string "null"
            Option(c.get("datatype")).filterNot(_.isNull).map(_.asText())
              .getOrElse("String"),
            Option(c.get("datasize")).filterNot(_.isNull).map(_.asInt()),
            Option(c.get("defaultvalue")).filterNot(_.isNull).map(_.asText()))
        }
      val keys = Option(node.get("keycolumns")).map(_.elements().asScala.toSeq)
        .getOrElse(Nil).map(_.asText())
      TableDef(tbl, cols, keys)
    }
  }

  /** Reference datatype names → Spark types (DbSimpleDataType, §1.2). */
  def sparkType(datatype: String): DataType = datatype.toLowerCase match {
    case "integer" => IntegerType
    case "biginteger" | "bigint" => LongType
    case "float" | "double" => DoubleType
    case "boolean" => BooleanType
    case "date" => DateType
    case "datetime" | "timestamp" => TimestampType
    case "blob" => BinaryType
    case _ => StringType // String, Clob
  }

  def toStructType(t: TableDef): StructType =
    StructType(t.columns.map(c => StructField(c.name.toLowerCase, sparkType(c.datatype))))

  /** Structure sync: CREATE missing tables, ALTER TABLE ADD missing
    * columns (DbStructureWorker contract). Returns (createdTables,
    * addedColumns).
    */
  def sync(url: String, tables: Seq[TableDef]): (Seq[String], Seq[(String, String)]) = {
    val created = scala.collection.mutable.ArrayBuffer.empty[String]
    val added = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    JdbcSink.withConnection(url) { c =>
      tables.foreach { t =>
        if (!JdbcSink.tableExists(c, t.name)) {
          val sizes = t.columns.flatMap(cd => cd.datasize.map(cd.name.toLowerCase -> _)).toMap
          JdbcSink.createTable(c, t.name, toStructType(t), t.keyColumns.map(_.toLowerCase), sizes)
          created += t.name
        } else {
          val rs = c.getMetaData.getColumns(null, null, t.name.toUpperCase, null)
          val existing = scala.collection.mutable.Set.empty[String]
          try while (rs.next()) existing += rs.getString("COLUMN_NAME").toLowerCase
          finally rs.close()
          t.columns.filterNot(cd => existing.contains(cd.name.toLowerCase)).foreach { cd =>
            val sqlT = JdbcSink.sqlType(sparkType(cd.datatype), cd.datasize.getOrElse(1024))
            val st = c.createStatement()
            try st.executeUpdate(
              s"""ALTER TABLE "${t.name.toUpperCase}" ADD COLUMN "${cd.name.toUpperCase}" $sqlT""")
            finally st.close()
            added += ((t.name, cd.name))
          }
        }
      }
    }
    (created.toSeq, added.toSeq)
  }
}
