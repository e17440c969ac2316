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
}
