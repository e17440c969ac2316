package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
import graft.dedup.Dedup
import graft.norm.Normalizers
import graft.web.Frontier

/** Measures the frontier filter's two claims (ARCHITECTURE decision
  * 22) on a synthetic base/batch: (a) the bloom path's exact-confirm
  * BROADCAST shrinks from |batch| distinct urls to the bloom-positive
  * set (truly-seen + fpp·|batch|) — the bound that un-caps snapshot
  * size; (b) both paths return the identical survivor set, and their
  * walls on one box are comparable (the base scan dominates both —
  * the bloom's win is the bound, plus base-scan-free negatives once
  * the artifact is committed).
  *
  *   sbt "runMain graft.tools.FrontierProbe [baseN] [batchN] [seenFrac]"
  */
object FrontierProbe {
  def main(args: Array[String]): Unit = {
    val baseN = args.headOption.getOrElse("4000000").toLong
    val batchN = args.drop(1).headOption.getOrElse("400000").toLong
    val seenFrac = args.drop(2).headOption.getOrElse("0.1").toDouble
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def url(id: org.apache.spark.sql.Column) =
      concat(lit("http://site"), pmod(id, lit(997)).cast("string"),
        lit(".com/p/"), id.cast("string"))
    val base = spark.range(baseN).select($"id".as("page_id"), url($"id").as("url"))
      .repartition(64)
    // batch: seenFrac re-crawls (messy variants of base urls) + the rest new
    val nSeen = (batchN * seenFrac).toLong
    val batch = spark.range(nSeen)
      .select(($"id" + 10000000L).as("page_id"),
        concat(lit("HTTP://WWW.Site"), pmod($"id", lit(997)).cast("string"),
          lit(".COM:80/p/"), $"id".cast("string"), lit("#f")).as("url"))
      .unionAll(spark.range(nSeen, batchN)
        .select(($"id" + 10000000L).as("page_id"), url($"id" + baseN).as("url")))
      .repartition(16)

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
    }
    // warm the inputs (range is cheap but JIT/codegen isn't)
    base.count(); batch.count()

    val (tExact, nExact) = time(Dedup.newUrls(batch, base, "url").count())
    val (tBloomBuild, bloom) = time(Frontier.urlBloom(base, "url", baseN))
    val (tBloom, nBloom) = time(Frontier.newUrlsBloom(batch, base, "url", bloom).count())
    // the bound: distinct bloom-positive canonical urls vs |batch| distinct
    val ref = Frontier.broadcastBloom(spark, bloom)
    val key = Normalizers.normalizeUrl(col("url"))
    val positives = batch.select(key.as("_u"))
      .where(Frontier.mightContain($"_u", ref)).distinct().count()
    val batchDistinct = batch.select(key.as("_u")).distinct().count()
    // seenFrac=0 with zero false positives → positives=0; emit null
    // rather than Infinity (not valid JSON for downstream parsers)
    val shrink = if (positives > 0) f"${batchDistinct.toDouble / positives}%.1f" else "null"
    println(f"""{"metric":"frontier_probe","base":$baseN,"batch":$batchN,""" +
      f""""survivors_exact":$nExact,"survivors_bloom":$nBloom,""" +
      f""""exact_s":$tExact%.2f,"bloom_s":$tBloom%.2f,"bloom_build_s":$tBloomBuild%.2f,""" +
      f""""broadcast_exact_urls":$batchDistinct,"broadcast_bloom_urls":$positives,""" +
      s""""bound_shrink":$shrink}""")
    spark.stop()
  }
}
