package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-truss peeling — the EDGE-strength sibling of [[KCore]]: a
  * k-truss is the maximal subgraph whose every edge closes at least
  * k−2 triangles INSIDE the subgraph, the standard community-core
  * primitive that is stricter than k-core (degree says a node has
  * neighbors; truss support says its edges sit in dense
  * neighborhoods — Cohen, "Trusses: cohesive subgraphs for social
  * network analysis", 2008).
  *
  * Each round recomputes per-edge triangle support with the same
  * degree-oriented O(m^1.5) wedge join as [[Triangles]] and deletes
  * under-supported edges; the round count is FIXED so a SQL oracle
  * can replay the peel as unrolled CTEs (the [[KCore.peelRounds]]
  * discipline — deleting an edge can drop another's support, so the
  * fixpoint needs iteration, and fixed rounds make the intermediate
  * states part of the contract).
  *
  * Scale shape per round: hash joins on node keys + one hash agg per
  * edge — no window, no driver-side graph; each round's edge frame is
  * checkpointed so plans stay round-sized.
  */
object KTruss {

  /** Surviving canonical edges after `rounds` peels with their
    * FINAL-state support: `(lo, hi, support)`.
    */
  def peelRounds(edges: DataFrame, srcCol: String, dstCol: String,
                 k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = Triangles.canonicalEdges(edges, srcCol, dstCol)
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      e = e.join(edgeSupport(e), Seq("lo", "hi"), "left")
        .filter(coalesce(col("support"), lit(0L)) >= (k - 2).toLong)
        .select(col("lo"), col("hi"))
        .localCheckpoint(true)
    }
    e.join(edgeSupport(e), Seq("lo", "hi"), "left")
      .withColumn("support", coalesce(col("support"), lit(0L)))
  }

  /** Triangle-membership count per canonical edge of `e` — the
    * [[Triangles.census]] oriented wedge enumeration, crediting all
    * three edges of each triangle through one explode + hash agg.
    */
  private def edgeSupport(e: DataFrame): DataFrame = {
    val deg = e.select(col("lo").as("n"))
      .unionAll(e.select(col("hi").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val o = e
      .join(deg.select(col("n").as("lo"), col("deg").as("dl")), "lo")
      .join(deg.select(col("n").as("hi"), col("deg").as("dh")), "hi")
      .select(
        when(col("dl") < col("dh") ||
            (col("dl") === col("dh") && col("lo") < col("hi")),
          col("lo")).otherwise(col("hi")).as("u"),
        when(col("dl") < col("dh") ||
            (col("dl") === col("dh") && col("lo") < col("hi")),
          col("hi")).otherwise(col("lo")).as("v"))
    def packed(a: Column, b: Column): Column = {
      val ok = a >= 0 && b >= 0 && a < (1L << 32) && b < (1L << 32)
      when(assert_true(ok, lit("KTruss: node ids must fit 32 bits"))
        .isNull, shiftleft(a, 32).bitwiseOR(b))
    }
    val wedges = o.as("ab").join(o.as("ac"),
        col("ab.u") === col("ac.u") && col("ab.v") < col("ac.v"))
      .select(col("ab.u").as("u"), col("ab.v").as("v"),
        col("ac.v").as("w"), packed(col("ab.v"), col("ac.v")).as("ek"))
    wedges.join(
        e.select(packed(col("lo"), col("hi")).as("ek")), Seq("ek"),
        "left_semi")
      .select(explode(array(
        struct(least(col("u"), col("v")).as("lo"),
          greatest(col("u"), col("v")).as("hi")),
        struct(least(col("u"), col("w")).as("lo"),
          greatest(col("u"), col("w")).as("hi")),
        struct(col("v").as("lo"), col("w").as("hi")))).as("ed")) // v < w
      .select(col("ed.lo").as("lo"), col("ed.hi").as("hi"))
      .groupBy(col("lo"), col("hi")).agg(count(lit(1)).as("support"))
  }
}
