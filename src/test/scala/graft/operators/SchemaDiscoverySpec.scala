package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[SchemaDiscovery]]'s dependency audits against hand-built
  * frames: FD hold/violate counting with NULL key semantics, and
  * inclusion containment with exact-ppm accounting.
  */
class SchemaDiscoverySpec extends SparkSpec {
  import spark.implicits._

  test("fdAudit: holds/violated counts, NULL det excluded, NULL dep ignored") {
    // k -> v : k=1 maps to {a}, k=2 maps to {a,b} (violates), k=3 all-NULL v
    // (countDistinct 0 -> holds), one NULL k row excluded entirely.
    val df = Seq(
      (Option(1L), Option("a")), (Option(1L), Option("a")),
      (Option(2L), Option("a")), (Option(2L), Option("b")),
      (Option(3L), None: Option[String]),
      (None: Option[Long], Option("z"))).toDF("k", "v")
    val r = SchemaDiscovery.fdAudit(df, Seq("k" -> "v")).collect()(0)
    assert(r.getAs[String]("determinant") === "k")
    assert(r.getAs[Long]("n_groups") === 3L)       // k = 1, 2, 3
    assert(r.getAs[Long]("n_pairs") === 3L)        // {1a} + {2a,2b} + {}
    assert(r.getAs[Long]("n_violating_groups") === 1L)
    assert(r.getAs[Long]("max_dep_per_group") === 2L)
    assert(!r.getAs[Boolean]("holds"))
    // the genuinely functional direction holds
    val ok = SchemaDiscovery.fdAudit(
      Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("k", "v"),
      Seq("k" -> "v")).collect()(0)
    assert(ok.getAs[Boolean]("holds") &&
      ok.getAs[Long]("n_violating_groups") === 0L)
  }

  test("inclusionAudit: containment ppm and the contained flag") {
    val child = Seq(1L, 1L, 2L, 3L, 4L).toDF("c")   // domain {1,2,3,4}
    val parent = Seq(1L, 2L, 3L, 9L).toDF("p")      // 4 missing
    val r = SchemaDiscovery.inclusionAudit(Seq(
      SchemaDiscovery.IndCandidate("ch", "c", child, "pa", "p", parent)))
      .collect()(0)
    assert(r.getAs[Long]("n_child_distinct") === 4L)
    assert(r.getAs[Long]("n_missing") === 1L)
    assert(r.getAs[Long]("containment_ppm") === 750000L)
    assert(!r.getAs[Boolean]("contained"))
    val full = SchemaDiscovery.inclusionAudit(Seq(
      SchemaDiscovery.IndCandidate("ch", "c", child, "pa", "p",
        Seq(1L, 2L, 3L, 4L).toDF("p"))))
      .collect()(0)
    assert(full.getAs[Boolean]("contained") &&
      full.getAs[Long]("containment_ppm") === 1000000L)
  }
}
