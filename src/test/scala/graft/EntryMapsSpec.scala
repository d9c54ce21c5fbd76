package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the round-11 split of SparkEntry into nine family traits:
  * the assembled maps are plain `++` unions, so a duplicate qNNN key
  * across two families would silently SHADOW one implementation (and
  * possibly pair q's code from family A with its oracle from family
  * B) while every other test stays green. These checks fail loudly,
  * naming the colliding keys.
  */
class EntryMapsSpec extends AnyFunSuite {

  private def collisions(
      families: Seq[(String, Iterable[String])]): Seq[String] = {
    val owners = scala.collection.mutable.Map.empty[String, List[String]]
    for ((fam, keys) <- families; k <- keys)
      owners(k) = fam :: owners.getOrElse(k, Nil)
    owners.collect { case (k, fams) if fams.sizeIs > 1 =>
      s"$k in ${fams.reverse.mkString(", ")}"
    }.toSeq.sorted
  }

  test("query keys are pairwise disjoint across family files") {
    val dup = collisions(
      SparkEntry.queryFamilies.map { case (f, m) => (f, m.keys) })
    assert(dup.isEmpty, s"duplicate query keys shadowed by ++: $dup")
    assert(SparkEntry.queries.size ===
      SparkEntry.queryFamilies.map(_._2.size).sum)
  }

  test("oracle keys are pairwise disjoint across family files") {
    val dup = collisions(
      SparkEntry.oracleFamilies.map { case (f, m) => (f, m.keys) })
    assert(dup.isEmpty, s"duplicate oracle keys shadowed by ++: $dup")
    assert(SparkEntry.oracleSql.size ===
      SparkEntry.oracleFamilies.map(_._2.size).sum)
  }

  test("every oracle key has a query (no orphaned oracle rows)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }
}
