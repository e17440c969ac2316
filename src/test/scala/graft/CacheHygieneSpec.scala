package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.{Dedup, DedupConfig, WebDedup}
import graft.io.Warehouse
import graft.matching.{MatchColumn, MatchOptions, Matching}

/** Persist hygiene (r2 VERDICT #3): a long-lived session running many
  * graft jobs must not accumulate MEMORY_AND_DISK blocks. The staged
  * warehouse pipeline cleans up after itself; matchTables releases its
  * perfect-pair cache via the first-action listener; in-session
  * clustering results release via the explicit MLlib-model-style
  * `Dedup.release`.
  */
class CacheHygieneSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def persistedIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** The release listener fires on the (async) listener bus. */
  private def eventuallyEmptyBeyond(before: Set[Int], hint: String): Unit = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var extra = persistedIds -- before
    while (extra.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(50)
      extra = persistedIds -- before
    }
    assert(extra.isEmpty, s"$hint left persisted RDDs: $extra")
  }

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("two nearDupClusters jobs + release leave no persisted blocks") {
    val before = persistedIds
    val r1 = Dedup.nearDupClusters(docs, "doc_id", "text", DedupConfig())
    assert(r1.count() > 0)
    Dedup.release(r1)
    val r2 = Dedup.nearDupClusters(docs.where(col("doc_id") % 2 === 0), "doc_id", "text",
      DedupConfig())
    assert(r2.count() > 0)
    Dedup.release(r2)
    eventuallyEmptyBeyond(before, "nearDupClusters x2 + release")
  }

  test("matchTables frees its perfect-pair cache after the first action; re-action recomputes") {
    val before = persistedIds
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val s1 = c.select(col("c_custkey").cast("long").as("k1"), col("c_name").as("n1"))
    val s2 = c.select(col("c_custkey").cast("long").as("k2"), col("c_name").as("n2"))
    val m = Matching.matchTables(s1, s2, "k1", "k2",
      Seq(MatchColumn("n1", "n2", "levenshtein", 1.0)),
      MatchOptions(threshold = 0.9, earlyTermination = true))
    val n = m.count()
    assert(n > 0)
    eventuallyEmptyBeyond(before, "matchTables first action")
    // the persist's lineage is intact: a second action silently
    // recomputes the perfect-pair table and returns the same rows
    assert(m.count() == n)
    eventuallyEmptyBeyond(before, "matchTables second action")
  }

  test("warehouse-staged WebDedup.run leaves no persisted blocks") {
    val before = persistedIds
    val pages = fixtures.WebPages.fromDocuments(docs.withColumn("lang", lit("en")))
    val wh = new Warehouse(java.nio.file.Files.createTempDirectory("wh").toString, spark)
    val clusters = WebDedup.run(pages, wh, DedupConfig(exactVerify = true))
    assert(clusters.count() > 0)
    eventuallyEmptyBeyond(before, "WebDedup.run")
  }

  test("guarded simhash/span paths free their working persists after the first action") {
    val before = persistedIds
    val sigs = Dedup.signatures(docs, "doc_id", "text")
    // guards ON: both paths persist an intermediate (exploded blocks /
    // fingerprint table) and must free it via the first-action listener
    assert(Dedup.simhashPairs(sigs, radius = 3, maxBucket = 5).count() >= 0)
    eventuallyEmptyBeyond(before, "guarded simhashPairs")
    assert(Dedup.sharedSpanPairs(docs, "doc_id", "text", maxFpDf = 5).count() >= 0)
    eventuallyEmptyBeyond(before, "guarded sharedSpanPairs")
  }

  test("inline ivfTopK leaves no persisted blocks (driver-local centroids)") {
    val before = persistedIds
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val top = graft.emb.IvfIndex.ivfTopK(e, q, "vec_id", "embedding",
      k = 1, nlist = 8, nprobe = 2, iters = 2)
    assert(top.count() > 0)
    // train() frees every generation before returning; the probe plan
    // holds centroids as a LocalRelation, so repeated actions are safe
    assert(top.count() > 0)
    eventuallyEmptyBeyond(before, "ivfTopK")
  }
}
