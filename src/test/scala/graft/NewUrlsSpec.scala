package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup

/** URL seen-set (crawl-frontier) filter: batch pages whose canonical
  * url exists in the base are dropped; genuinely new urls survive.
  */
class NewUrlsSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits.{StringToColumn => _, _}

  private val base = Seq(
    (1L, "http://example.com/a"),
    (2L, "http://example.com/b")).toDF("page_id", "url")

  private val batch = Seq(
    (10L, "HTTP://WWW.Example.COM:80/a/?utm_source=x#frag"), // seen (messy form of /a)
    (11L, "http://example.com/c"),                           // new
    (12L, "http://example.com/c"),                           // within-batch dup of a NEW url: kept
    (13L, "http://example.com/b")                            // seen verbatim
  ).toDF("page_id", "url")

  test("canonical-seen rows drop, new rows keep, within-batch dups ride") {
    val got = Dedup.newUrls(batch, base, "url")
      .select($"page_id").as[Long].collect().toSet
    assert(got == Set(11L, 12L))
  }

  test("batch columns ride through unchanged") {
    val cols = Dedup.newUrls(batch, base, "url").columns.toSeq
    assert(cols == Seq("page_id", "url"))
  }

  test("shuffle fallback (maxBatchBroadcast=0) gives the identical survivor set") {
    val a = Dedup.newUrls(batch, base, "url")
      .select($"page_id").as[Long].collect().toSet
    val b = Dedup.newUrls(batch, base, "url", maxBatchBroadcast = 0L)
      .select($"page_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("default path broadcasts the batch keys — the base side never shuffles") {
    val plan = Dedup.newUrls(batch, base, "url").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast semi-join in:\n$plan")
  }

  // ------------------------------------------------- bloom scale path

  test("bloom probe: no false negatives over every inserted canonical url") {
    val bloom = graft.web.Frontier.urlBloom(base, "url", expectedItems = 100)
    val probed = base.select(graft.norm.Normalizers.normalizeUrl($"url").as("u"))
      .where(graft.web.Frontier.mightContain($"u", bloom))
    assert(probed.count() == base.count())
  }

  test("bloom-pruned frontier equals the exact filter (incl. messy canonical forms)") {
    val bloom = graft.web.Frontier.urlBloom(base, "url", expectedItems = 100)
    val exact = Dedup.newUrls(batch, base, "url")
      .select($"page_id").as[Long].collect().toSet
    val viaBloom = graft.web.Frontier.newUrlsBloom(batch, base, "url", bloom)
      .select($"page_id").as[Long].collect().toSet
    assert(viaBloom == exact && exact == Set(11L, 12L))
    assert(graft.web.Frontier.newUrlsBloom(batch, base, "url", bloom)
      .columns.toSeq == Seq("page_id", "url"))
    // shuffle-fallback confirm path: identical survivors
    val fallback = graft.web.Frontier
      .newUrlsBloom(batch, base, "url", bloom, maxBroadcast = 0L)
      .select($"page_id").as[Long].collect().toSet
    assert(fallback == exact)
  }

  test("committed bloom: built once, resumed from the warehouse, invalidated on fingerprint change") {
    val root = java.nio.file.Files.createTempDirectory("bloomwh").toString
    val wh1 = new graft.io.Warehouse(root, spark)
    val b1 = graft.web.Frontier.committedUrlBloom(wh1, base, "url", 100, "fp1")
    assert(wh1.buildCount == 1)
    val wh2 = new graft.io.Warehouse(root, spark)
    val b2 = graft.web.Frontier.committedUrlBloom(wh2, base, "url", 100, "fp1")
    assert(wh2.buildCount == 0, "same fingerprint must resume the artifact")
    assert(java.util.Arrays.equals(b1, b2))
    val wh3 = new graft.io.Warehouse(root, spark)
    graft.web.Frontier.committedUrlBloom(wh3, base.limit(1), "url", 100, "fp2")
    assert(wh3.buildCount == 1, "changed fingerprint must rebuild")
  }
}
