package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.{Dedup, DedupConfig, WebDedup}
import graft.io.Warehouse
import graft.web.{DomainStats, Frontier}

/** Composed frontier -> addBatch -> DomainStats under MEGA-DOMAIN skew:
  * one domain holds half the corpus as templated near-dups, hot enough
  * that the maxBandBucket guard degrades its band buckets to star
  * edges. The individual guards are unit-tested elsewhere; this suite
  * asserts the COMPOSED pipeline (the shape a real crawl hits — skew is
  * a property of the web, not of one operator's input) still:
  *   - filters the frontier exactly (re-crawled urls never reach the
  *     merge),
  *   - keeps the mega-template connected through the degraded buckets
  *     (one cluster, base and batch generations alike),
  *   - ACCOUNTS the degraded mass on the stats surfaces
  *     (bandBucketStats shows the oversized buckets the guard hit; the
  *     committed pairs table stays linear in the hot-bucket size
  *     instead of quadratic; the pipeline metrics row carries the
  *     counts),
  *   - reports the skew downstream (DomainStats sees one domain with
  *     ~half the pages and a dup_fraction near 1).
  */
class MegaDomainSkewSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits.{StringToColumn => _, _}

  // pairwise near-dup, never exact-equal: exact collapse cannot absorb
  // the skew before banding, so the band buckets really are hot
  private val template = (1 to 60).map(i => s"tok$i").mkString(" ")
  private def megaPage(i: Int): (Long, String, String) =
    (1000L + i, s"https://mega.example.org/p$i", s"$template pg$i")
  // mutually dissimilar one-page domains
  private def smallPage(i: Int): (Long, String, String) =
    (5000L + i, s"https://site$i.example.net/home",
      (1 to 40).map(j => s"s${i}w$j").mkString(" "))

  private val cfg = DedupConfig(maxBandBucket = 20) // pairs mode + guard

  test("frontier -> addBatch -> DomainStats accounts a 50%-of-corpus mega-domain") {
    val basePages = ((0 until 100).map(megaPage) ++ (0 until 100).map(smallPage))
      .toDF("page_id", "url", "text")
    val wh = new Warehouse(
      java.nio.file.Files.createTempDirectory("megaskew").toString, spark)
    val baseClusters = WebDedup.run(basePages, wh, cfg)

    // the skew is VISIBLE on the stats surface the guard keys off: the
    // mega-template's 100 mutually-colliding signatures produce band
    // buckets far above the configured cap
    val stats = Dedup.bandBucketStats(wh.read("signatures"), cfg)
    val largest = stats.agg(max($"largest_bucket")).head().getLong(0)
    assert(largest > cfg.maxBandBucket,
      s"expected oversized buckets above ${cfg.maxBandBucket}, largest=$largest")
    assert(largest >= 90, s"mega bucket should hold ~100 members, largest=$largest")

    // ...and the guard kept the committed pair stream LINEAR in the
    // bucket size (star degrade), not quadratic: 32 bands x C(100,2)
    // would be ~158k candidates; the verified pairs table must stay
    // ~(members - 1) + cold remainder
    val nPairs = wh.read("pairs").count()
    assert(nPairs < 5000, s"degraded pair stream should be linear, got $nPairs")

    // mega cluster survives the degrade connected: one cluster of 100
    val megaBase = baseClusters.where($"url".startsWith("https://mega."))
    assert(megaBase.select($"cluster_id").distinct().count() == 1)
    assert(megaBase.count() == 100)

    // pipeline metrics row accounts the run (pages + pairs + clusters)
    val m = wh.metrics().where($"stage" === "pipeline")
      .select($"key", $"value").as[(String, Long)].collect().toMap
    assert(m("pages") == 200L)
    assert(m("near_pairs") == nPairs)
    assert(m("clusters") == m("pages") - m("dup_pages"))

    // ---- generation 1: 20 re-crawls of mega urls (frontier must drop
    // them) + 50 new mega near-dups + 10 new small domains
    val batch = ((0 until 20).map(megaPage) ++
      (100 until 150).map(megaPage) ++ (200 until 210).map(smallPage))
      .toDF("page_id", "url", "text")
      // re-crawled pages carry NEW page ids (a crawler re-fetch)
      .withColumn("page_id", $"page_id" + 100000L)

    val bloom = Frontier.committedUrlBloom(wh, basePages, "url",
      expectedItems = 1000, fingerprint = WebDedup.inputSnapshot(basePages))
    val ref = Frontier.broadcastBloom(spark, bloom)
    val filtered =
      try {
        val f = Frontier.newUrlsBloom(batch, basePages, "url", ref)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        f.count()
        f
      } finally ref.release()
    // exact: every re-crawled url dropped, every new url kept
    assert(filtered.count() == 60)
    assert(filtered.where($"url".isin((0 until 20).map(megaPage(_)._2): _*)).count() == 0)

    val g1 = WebDedup.addBatch(filtered, wh, cfg, gen = 1)

    // the mega-domain's batch pages joined the BASE cluster through the
    // guarded cross probe: still exactly one mega cluster, now 150 pages
    val megaG1 = g1.where($"url".startsWith("https://mega."))
    assert(megaG1.count() == 150)
    assert(megaG1.select($"cluster_id").distinct().count() == 1)

    // DomainStats over the merged generation reports the skew the
    // sampling/blocklist layer acts on: one domain with ~58% of pages
    // and dup_fraction ~ 1 - 1/150; the small domains stay clean
    val report = DomainStats.report(g1).persist()
    val mega = report.where($"domain" === "mega.example.org").head()
    assert(mega.getAs[Long]("pages") == 150L)
    assert(mega.getAs[Long]("clusters") == 1L)
    assert(mega.getAs[Double]("dup_fraction") > 0.99)
    val dirtySmall = report.where($"domain" =!= "mega.example.org" &&
      $"dup_fraction" > 0.0).count()
    assert(dirtySmall == 0, "small domains must not inherit the mega-domain's dup mass")
    report.unpersist()
    filtered.unpersist()
  }
}
