package graft.web

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft._
import graft.io.Warehouse
import graft.norm.Normalizers

/** Crawl-frontier seen-set filtering with a COMMITTED Bloom filter —
  * the scale path of [[graft.dedup.Dedup.newUrls]].
  *
  * `newUrls` scans the accumulated base per snapshot and broadcasts the
  * whole batch's distinct canonical urls; its broadcast bound is
  * |batch|. This variant builds a Bloom filter over the base's
  * canonical urls ONCE (a reusable warehouse artifact, rebuilt only
  * when the base fingerprint changes), then each snapshot:
  *
  *   1. probes the bloom in a map-only projection — no false
  *      negatives, so every bloom-negative url is DEFINITELY new and
  *      never touches the base;
  *   2. exact-confirms only the bloom-POSITIVE urls (truly-seen +
  *      ~fpp of the batch) against the base, so the broadcast bound
  *      drops from |batch| to |seen ∩ batch| + fpp·|batch| — the
  *      quantity that is actually small for a mostly-new crawl
  *      snapshot. Results are EXACT (identical to `newUrls`): the
  *      bloom only prunes, the anti-join decides.
  *
  * Sizing: a 10^9-url base at fpp 0.01 is ~1.2 GB of filter — per-task
  * shared via the codegen reference table, one deserialization per
  * task. At 10^12 urls a single filter no longer fits; shard the base
  * by url-hash range and run this per shard (the warehouse layout
  * already partitions; out of scope here).
  */
object Frontier {

  /** Serialized Bloom filter over the base's canonical urls
    * (distributed build via `stat.bloomFilter` — a treeAggregate; only
    * the filter bytes land on the driver).
    */
  def urlBloom(base: DataFrame, urlCol: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf = base.select(Normalizers.normalizeUrl(col(urlCol)).as("_u"))
      .stat.bloomFilter("_u", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** The committed form: the filter bytes live in the warehouse as a
    * 1-row binary table under the standard manifest/fingerprint
    * protocol, so a restarted pipeline (or the next snapshot) reuses
    * the artifact instead of rescanning the base. `fingerprint` must
    * change when the base does (callers fold the base snapshot id in,
    * as [[graft.dedup.WebDedup]] does for signature tables).
    */
  def committedUrlBloom(wh: Warehouse, base: DataFrame, urlCol: String,
      expectedItems: => Long, fingerprint: String, fpp: Double = 0.01): Array[Byte] = {
    val spark = base.sparkSession
    val df = wh.getOrCreate("url_bloom", fingerprint) {
      import spark.implicits._
      Seq(Tuple1(urlBloom(base, urlCol, expectedItems, fpp))).toDF("bloom")
    }
    df.head().getAs[Array[Byte]](0)
  }

  /** A broadcast filter plus its content fingerprint — the unit of
    * lifecycle management. `release()` destroys the broadcast blocks
    * AND drops the local JVM's deserialized-cache entry; call it once
    * the filtered batch is MATERIALIZED (PipelineMain commits the
    * frontier batch to the warehouse, so the point is well-defined
    * there). Without release, a long-lived session cycling many
    * snapshots against many base generations would retain ~2× filter
    * size per generation (broadcast blocks + cache copy); the
    * content-keyed [[graft.sim.BloomCache]] already collapses repeat
    * broadcasts of the SAME artifact to one cached copy, release
    * frees generations that are done. On a real cluster
    * `broadcast.destroy` removes the executor-side blocks too;
    * executor cache entries stay bounded by distinct-filters-probed.
    */
  final case class BloomRef(
      broadcastRef: org.apache.spark.broadcast.Broadcast[Array[Byte]],
      key: String) {
    def release(): Unit = {
      graft.sim.BloomCache.drop(key)
      broadcastRef.destroy()
    }
  }

  /** Broadcast `bloom` once and fingerprint it for the per-executor
    * deserialized cache. Callers probing more than once (or wanting a
    * release point) should hold the returned handle.
    */
  def broadcastBloom(spark: org.apache.spark.sql.SparkSession,
      bloom: Array[Byte]): BloomRef =
    BloomRef(spark.sparkContext.broadcast(bloom),
      graft.sim.BloomCache.fingerprint(bloom))

  /** Map-only membership probe over an already-broadcast filter (see
    * [[graft.sim.BloomMightContain]] — bytes ship and deserialize once
    * per executor).
    */
  def mightContain(c: Column, bloom: BloomRef): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.sim.BloomMightContain(
      org.apache.spark.sql.GraftColumnBridge.expression(c),
      bloom.broadcastRef, bloom.key))

  /** Convenience overload: broadcasts `bloom` on the active session
    * (one cached deserialization per CONTENT either way).
    */
  def mightContain(c: Column, bloom: Array[Byte]): Column =
    mightContain(c, broadcastBloom(org.apache.spark.sql.SparkSession.active, bloom))

  /** Bloom-pruned EXACT frontier filter: batch rows whose canonical
    * url is not in the base. Same contract as `Dedup.newUrls`
    * (within-batch duplicates survive; every batch column rides
    * through); the bloom only decides which rows need the exact
    * confirm. Above `maxBroadcast` bloom-positive distinct urls the
    * confirm degrades to a plain shuffle anti-join (identical result).
    */
  def newUrlsBloom(batch: DataFrame, base: DataFrame, urlCol: String,
      bloom: Array[Byte], maxBroadcast: Long): DataFrame =
    newUrlsBloom(batch, base, urlCol,
      broadcastBloom(batch.sparkSession, bloom), maxBroadcast)

  def newUrlsBloom(batch: DataFrame, base: DataFrame, urlCol: String,
      bloom: Array[Byte]): DataFrame =
    newUrlsBloom(batch, base, urlCol, bloom, 4000000L)

  /** Handle form: caller owns the broadcast and its release point. */
  def newUrlsBloom(batch: DataFrame, base: DataFrame, urlCol: String,
      ref: BloomRef, maxBroadcast: Long = 4000000L): DataFrame = {
    val key = Normalizers.normalizeUrl(col(urlCol))
    val b = batch.withColumn("_u", key)
    val definitelyNew = b.where(!mightContain($"_u", ref))
    val maybeSeen = b.where(mightContain($"_u", ref))
    val maybeKeys = maybeSeen.select($"_u").distinct()
    val baseKeys = base.select(key.as("_u"))
    val seen =
      if (maybeKeys.count() <= maxBroadcast)
        baseKeys.join(broadcast(maybeKeys), Seq("_u"), "left_semi").distinct()
      else baseKeys.distinct()
    definitelyNew
      .unionByName(maybeSeen.join(seen, Seq("_u"), "left_anti"))
      .drop("_u")
  }
}
