package graft.cli

import java.io.File

import graft.SparkSpec
import graft.api.MultiImporter
import graft.sink.JdbcSink
import graft.sources.SyntheticFixtures

/** CLI surface + multi-file worker. */
class CliSpec extends SparkSpec {

  private var dbN = 200
  private def freshDb(): String = { dbN += 1; s"jdbc:derby:memory:clidb$dbN;create=true" }

  test("arg parse covers the reference's main flags") {
    val a = Main.parseArgs(Array("jdbc:x", "tbl", "f.csv", "-i", "UPSERT", "-k", "a,b",
      "-d", "UPDATE_FIRST_DROP", "-create", "-t", "-c", "-n", "NULL",
      "-sep", ",", "-noheaders", "-batchBlockSize", "500"))
    assert(a.cfg.mode == graft.operators.Merge.ImportMode.Upsert)
    assert(a.cfg.keyColumns == Seq("a", "b"))
    assert(a.cfg.duplicateMode == graft.operators.Merge.DuplicateMode.UpdateFirstDrop)
    assert(a.cfg.createTableIfNeeded && a.cfg.trimValues && a.cfg.completeCommit)
    assert(a.nullToken.contains("NULL") && a.sep == "," && !a.headers)
    assert(a.cfg.batchSize == 500)
    intercept[IllegalArgumentException](Main.parseArgs(Array("u", "t", "f", "-bogus")))
    intercept[IllegalArgumentException](Main.parseArgs(Array("u", "t", "f", "-i", "JUNK")))
  }

  test("end-to-end CLI run: csv upsert with -create") {
    val url = freshDb()
    val f = SyntheticFixtures.writeText(
      new File(SyntheticFixtures.dir("cli"), "people.csv"),
      "id;name\n1;ann\n2;bob\n2;bea")
    val a = Main.parseArgs(Array(url, "people", f.getPath,
      "-i", "UPSERT", "-k", "id", "-create"))
    assert(Main.run(spark, a) == 0)
    JdbcSink.withConnection(url) { c =>
      assert(JdbcSink.countRows(c, "people") == 2) // join-duplicates on 2
    }
  }

  test("multi-file glob with -table '*' derives tables and runs hooks once") {
    val url = freshDb()
    val dir = SyntheticFixtures.dir("climulti")
    SyntheticFixtures.writeText(new File(dir, "t_one.csv"), "id;v\n1;x")
    SyntheticFixtures.writeText(new File(dir, "t_two.csv"), "id;v\n1;y\n2;z")
    val a = Main.parseArgs(Array(url, "*", new File(dir, "t_*.csv").getPath,
      "-i", "INSERT", "-create"))
    val results = MultiImporter.importGlob(spark, a.importPathOrData, url, "*",
      a.cfg, (s, f) => Main.readSource(s, a, f),
      MultiImporter.Hooks(
        pre = Seq("CREATE TABLE \"HOOKLOG\" (\"X\" INTEGER)"),
        post = Seq("INSERT INTO \"HOOKLOG\" VALUES (1)")))
    assert(results.map(_.table) == Seq("t_one", "t_two"))
    assert(results.forall(_.result.isRight))
    JdbcSink.withConnection(url) { c =>
      assert(JdbcSink.countRows(c, "t_one") == 1)
      assert(JdbcSink.countRows(c, "t_two") == 2)
      assert(JdbcSink.countRows(c, "hooklog") == 1) // hooks ran once
    }
  }

  test("multi-file validation fails fast when tables missing without -create") {
    val url = freshDb()
    JdbcSink.withConnection(url)(_ => ())
    val dir = SyntheticFixtures.dir("climissing")
    SyntheticFixtures.writeText(new File(dir, "nope_tbl.csv"), "id\n1")
    val e = intercept[IllegalArgumentException] {
      MultiImporter.importGlob(spark, new File(dir, "nope_*.csv").getPath, url, "*",
        graft.api.Importer.ImportConfig(), (s, f) => Main.readSource(s,
          Main.parseArgs(Array(url, "*", f)), f))
    }
    assert(e.getMessage.contains("nope_tbl"))
  }

  test("-analyse lists property names with inferred types") {
    import spark.implicits._
    val src = Seq(("1", "x", "2.5")).toDF("id", "name", "price")
    val got = MultiImporter.analyse(src).toMap
    assert(got == Map("id" -> "INTEGER", "name" -> "VARCHAR", "price" -> "DOUBLE"))
  }

  test("inline -data payload imports through the same path") {
    val url = freshDb()
    val a = Main.parseArgs(Array(url, "inline_t", "id;v\n5;q", "-data", "-create", "-i", "INSERT"))
    assert(Main.run(spark, a) == 0)
    JdbcSink.withConnection(url)(c => assert(JdbcSink.countRows(c, "inline_t") == 1))
  }

  test("SQL script mode executes against the sink") {
    val url = freshDb()
    val f = SyntheticFixtures.writeText(new File(SyntheticFixtures.dir("clisql"), "s.sql"),
      "CREATE TABLE \"SCRIPTED\" (\"A\" INTEGER); INSERT INTO \"SCRIPTED\" VALUES (42)")
    val a = Main.parseArgs(Array(url, "-", f.getPath, "-x"))
    assert(Main.run(spark, a) == 0)
    JdbcSink.withConnection(url)(c => assert(JdbcSink.countRows(c, "scripted") == 1))
  }
}
