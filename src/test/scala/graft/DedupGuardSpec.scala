package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup

/** Skew guards on every candidate-generation path: the n-gram DF cap
  * (exact-jaccard-preserving), the SimHash pigeonhole hot-bucket
  * degrade-to-star, and the winnowing fingerprint DF cap. Each guard
  * must leave the guarded result identical (clusters / true pairs)
  * while provably engaging on the planted skew.
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

  test("simhash hot-bucket guard degrades to star with identical clusters") {
    // mega-bucket fixture: 60 docs with the SAME token multiset
    // (reversed word order) => identical SimHash => every pigeonhole
    // block bucket holds all 60 (quadratic without the guard), plus
    // unrelated singletons
    val words = (1 to 20).map(i => s"w$i")
    val hot = (0L until 60L).map { i =>
      val t = if (i % 2 == 0) words else words.reverse
      (i, t.mkString(" "))
    }
    val singles = (1000L until 1020L).map(i =>
      (i, (0 to 15).map(j => s"u${i}x$j").mkString(" ")))
    val df = (hot ++ singles).toDF("doc_id", "text")

    // the guard provably engages: largest block bucket is the 60-doc group
    val sigs = Dedup.signatures(df.selectExpr("doc_id as id", "text"), "id", "text")
    val largest = Dedup.simhashBucketStats(sigs, radius = 3)
      .agg(org.apache.spark.sql.functions.max(col("largest_bucket"))).head().getLong(0)
    assert(largest >= 60, s"fixture must plant a mega-bucket, got $largest")

    def clusters(maxBucket: Int): Set[Set[Long]] = {
      val labeled = Dedup.simhashClusters(df, "doc_id", "text", radius = 3, maxBucket = maxBucket)
      val out = labeled
        .select(col("doc_id"), col("cluster_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
        .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
      Dedup.release(labeled) // same consume-then-release lifecycle production uses
      out
    }
    val unguarded = clusters(0)
    val guarded = clusters(10) // cap far below the 60-doc bucket
    assert(unguarded == guarded,
      "guard must preserve the cluster partition on near-exact groups")
    assert(guarded.exists(_.size == 60), "the mega-group must stay one cluster")
  }

  test("incremental merge with a hot base band bucket: broadcast bound engages, result unchanged") {
    // base plants a 40-doc near-dup mega-group (hot band buckets on the
    // base side of the cross probe) plus singletons; the batch near-dups
    // the mega-group AND a singleton. maxProbeBroadcast=1 forces the
    // sided verify onto the shuffle left_semi fallback — the merged
    // clusters must equal the default broadcast path's.
    val mega = (0 until 30).map(w => s"hot$w").mkString(" ")
    val base = ((0L until 40L).map(i => (i, s"$mega tail$i")) ++
      Seq((500L, (1 to 30).map(w => s"solo$w").mkString(" ")))).toDF("doc_id", "text")
    val batch = Seq(
      (1000L, s"$mega tailnew extra"),
      (1001L, (1 to 30).map(w => s"solo$w").mkString(" ") + " x")).toDF("doc_id", "text")
    def mergedClusters(cfg: graft.dedup.DedupConfig, index: Boolean = false): Map[Long, Long] = {
      val st0 = Dedup.clusterState(base, "doc_id", "text", cfg)
      val st = if (index) Dedup.withBandIndex(st0) else st0
      val merged = Dedup.addBatch(st, batch, "doc_id", "text", cfg)
      val out = merged.assignments.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      merged.release(); st.release()
      out
    }
    val cfg = graft.dedup.DedupConfig(exactVerify = true)
    val viaBroadcast = mergedClusters(cfg)
    val viaShuffle = mergedClusters(cfg.copy(maxProbeBroadcast = 1L))
    assert(viaBroadcast == viaShuffle)
    // the persisted band index (probe path of a committed warehouse):
    // identical merge result, with and without the hot-bucket guard
    assert(mergedClusters(cfg, index = true) == viaBroadcast)
    assert(mergedClusters(cfg.copy(maxBandBucket = 10), index = true) ==
      mergedClusters(cfg.copy(maxBandBucket = 10)))
    // sanity: batch docs actually merged into their base clusters
    assert(viaShuffle(1000L) == viaShuffle(0L), "mega-group merge")
    assert(viaShuffle(1001L) == viaShuffle(500L), "singleton merge")
  }

  test("winnowing fingerprint DF cap drops boilerplate-only pairs, keeps true spans") {
    // every doc shares a long boilerplate run (ubiquitous fingerprints);
    // docs pair up (2g, 2g+1) through a long group-unique span
    val boiler = (1 to 20).map(i => s"same$i").mkString(" ") // ~140 chars shared by all
    val docs = (0 until 12).map { i =>
      val g = i / 2
      val span = (1 to 20).map(j => s"grp${g}tok$j").mkString(" ") // ~160 chars shared by the pair
      (i.toLong, s"$boiler $span tail$i")
    }.toDF("id", "text")
    def pairs(cap: Int): Set[(Long, Long)] =
      Dedup.sharedSpanPairs(docs, "id", "text",
          k = 24, window = 8, minShared = 2, minSpan = 64, maxFpDf = cap)
        .select(col("id1"), col("id2")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val within = (0 until 6).map(g => (2L * g, 2L * g + 1)).toSet
    val uncapped = pairs(0)
    // boilerplate alone satisfies minShared + minSpan => cross pairs leak
    assert((uncapped -- within).nonEmpty, "fixture must surface boilerplate-only pairs uncapped")
    assert(within.subsetOf(uncapped))
    // capped: ubiquitous fingerprints (df=12 > 3) leave candidate
    // generation; only the true pair spans remain
    assert(pairs(3) == within)
  }
}
