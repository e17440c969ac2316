package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.{Dedup, DedupConfig}
import graft.streaming.StreamingDedup

/** Streaming ingest semantics, driven deterministically with
  * MemoryStream + processAllAvailable (no wall-clock dependence).
  */
class StreamingDedupSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val cfg = DedupConfig()

  test("stream-static dup candidates: near-dup of a corpus doc is flagged, novel doc is not") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val staticSigs = Dedup.signatures(docs, "doc_id", "text", cfg)

    // incoming: a near-dup of doc 7 (one appended token) and a novel doc
    val base7 = docs.where(col("doc_id") === 7).select(col("text")).head().getString(0)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData((100007L, base7 + " zz"), (200001L, (1 to 40).map(i => s"novel$i").mkString(" ")))

    val flagged = StreamingDedup.dupCandidatesAgainst(
      staticSigs, mem.toDF().toDF("page_id", "text"), "page_id", "text", cfg)
    val q = flagged.writeStream.format("memory").queryName("dups")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM dups").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(rows.contains(100007L), "near-dup must collide with the corpus")
      assert(rows(100007L) == 7L, "first match should be the source doc")
      assert(!rows.contains(200001L), "novel doc must not be flagged")
    } finally q.stop()
  }

  test("streaming signatures equal batch signatures (same pinned family)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val texts = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"))
    mem.addData(texts: _*)
    val q = StreamingDedup.signatureStream(mem.toDF().toDF("id", "text"), "id", "text", cfg)
      .writeStream.format("memory").queryName("sigs").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT id, sig, simhash FROM sigs").collect()
        .map(r => (r.getLong(0), (r.getSeq[Long](1), r.getLong(2)))).toMap
      val batch = Dedup.signatures(texts.toDF("id", "text"), "id", "text", cfg)
        .collect().map(r => (r.getLong(0), (r.getSeq[Long](1), r.getLong(2)))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("watermarked windowed ingest stats") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, String)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData(
      (ts("2024-01-01 00:00:10"), "en", "hello world"),
      (ts("2024-01-01 00:00:40"), "en", "more text here"),
      (ts("2024-01-01 00:01:10"), "de", "hallo welt"))
    val q = StreamingDedup.ingestStats(
        mem.toDF().toDF("ts", "lang", "text"), "ts", "lang")
      .writeStream.format("memory").queryName("ingest").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT lang, pages FROM ingest ORDER BY window_start, lang")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq(("en", 2L), ("de", 1L)))
    } finally q.stop()
  }
}
