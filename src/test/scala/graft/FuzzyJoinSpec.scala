package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FuzzyJoin

class FuzzyJoinSpec extends AnyFunSuite with SharedSpark {

  private def pairs(rows: Seq[(Long, String)], maxDist: Int,
      maxVariantDf: Int = 0): Set[(Long, Long, Int)] = {
    import spark.implicits._
    FuzzyJoin.editDistancePairs(rows.toDF("id", "s"), "id", "s", maxDist,
        maxVariantDf)
      .select("id_1", "id_2", "dist").as[(Long, Long, Int)].collect().toSet
  }

  test("distance-1 pairs: substitution, insertion, deletion all found") {
    val found = pairs(Seq(
      1L -> "kitten", 2L -> "mitten", // substitution
      3L -> "cart", 4L -> "car",      // deletion/insertion
      5L -> "carts",                  // cart+s
      6L -> "zebra"), maxDist = 1)    // no neighbor
    assert(found === Set((1L, 2L, 1), (3L, 4L, 1), (3L, 5L, 1)))
  }

  test("depth-2 neighborhood matches brute force on random short strings") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0L until 120L).map(i =>
      i -> Iterator.continually(rng.nextPrintableChar())
        .filter(_.isLetter).take(3 + rng.nextInt(4)).mkString)
    val brute = rows.toDF("id", "s").as("a")
      .crossJoin(rows.toDF("id", "s").as("b"))
      .filter(col("a.id") < col("b.id") &&
        levenshtein(col("a.s"), col("b.s")) <= 2)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("d"))
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs(rows, maxDist = 2) === brute)
    assert(brute.nonEmpty) // the property is vacuous on an empty pair set
  }

  test("empty and single-char strings do not crash variant generation") {
    val found = pairs(Seq(1L -> "", 2L -> "a", 3L -> "b", 4L -> "ab"), maxDist = 1)
    // "" ~ "a" (ins), "" ~ "b", "a" ~ "b" (sub), "a" ~ "ab", "b" ~ "ab"
    assert(found === Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1),
      (2L, 4L, 1), (3L, 4L, 1)))
  }

  test("maxVariantDf caps hub variants, keeping pairs on rare blocks only") {
    // ten single-char strings all share the "" variant (df = 10); capping at 5
    // removes every pair mediated only by that hub
    val hub = (0L until 10L).map(i => i -> ('a' + i).toChar.toString)
    assert(pairs(hub, maxDist = 1).size === 45)
    assert(pairs(hub, maxDist = 1, maxVariantDf = 5) === Set.empty)
  }

  test("plan is an equality join, never a cartesian product") {
    import spark.implicits._
    val df = FuzzyJoin.editDistancePairs(
      Seq(1L -> "abc", 2L -> "abd").toDF("id", "s"), "id", "s", 1)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"))
    assert(!physical.contains("BroadcastNestedLoopJoin"))
  }
}
