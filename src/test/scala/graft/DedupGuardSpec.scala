package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup

/** Stop-gram (document-frequency cap) guard for the n-gram Jaccard
  * pass: hot grams leave candidate generation but the Jaccard value
  * stays exact via the per-doc hot-gram set correction.
  */
class DedupGuardSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  // every doc shares a boilerplate header (hot grams at cap 3: df=12);
  // docs pair up (0,1),(2,3),... through a group-unique body (cold
  // grams, df=2) with one word changed in the odd member
  private val base = "shared boilerplate header used across every document in this corpus"
  private lazy val docs = (0 until 12).map { i =>
    val grp = i / 2
    val tail = if (i % 2 == 0) "alpha" else "omega"
    (i.toLong, s"$base g$grp one$grp two$grp three$grp four$grp five$grp six$grp $tail")
  }.toDF("id", "text")

  private def pairs(cap: Int, threshold: Double) =
    Dedup.ngramJaccardPairs(docs, "id", "text", n = 3, threshold = threshold, maxGramDf = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap

  test("DF cap preserves exact jaccard for pairs sharing cold grams") {
    val uncapped = pairs(0, 0.5)
    val capped = pairs(3, 0.5)
    val within = (0 until 6).map(g => (2L * g, 2L * g + 1)).toSet
    assert(uncapped.keySet == within)
    assert(capped == uncapped) // same pairs AND same exact jaccard values
  }

  test("DF cap drops pairs whose ONLY overlap is hot grams (documented recall tradeoff)") {
    // at a permissive threshold, cross-group pairs (boilerplate-only
    // overlap) surface uncapped but are pruned by the cap
    val uncapped = pairs(0, 0.05)
    val capped = pairs(3, 0.05)
    val crossGroup = uncapped.keySet.filter { case (a, b) => a / 2 != b / 2 }
    assert(crossGroup.nonEmpty)
    assert(capped.keySet.intersect(crossGroup).isEmpty)
    // within-group pairs survive with identical values
    val within = uncapped.keySet -- crossGroup
    assert(capped.keySet == within)
    assert(within.forall(k => capped(k) == uncapped(k)))
  }
}
