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

  test("verified streaming dedup: band collision alone is not enough, estimator gate is") {
    implicit val sqlCtx = spark.sqlContext
    // 64x2 banding makes a jaccard ~0.5 doc collide in >=1 band with
    // near-certainty while its estimated similarity stays far below the
    // 0.8 threshold — separating the candidate surface from the
    // verified one (everything is seed-pinned, so this is deterministic)
    val wideCfg = DedupConfig(bands = 64, rowsPerBand = 2)
    val toks = (1 to 40).map(i => s"corp$i")
    val corpusDoc = toks.mkString(" ")
    // ~half the tokens replaced => shingle jaccard ~0.45
    val halfway = toks.take(20).mkString(" ") + " " +
      (1 to 20).map(i => s"other$i").mkString(" ")
    val nearDup = corpusDoc + " zz"
    val staticSigs = Dedup.signatures(
      Seq((7L, corpusDoc)).toDF("id", "text"), "id", "text", wideCfg)

    val mem = MemoryStream[(Long, String)]
    mem.addData((100L, nearDup), (200L, halfway))

    val cand = StreamingDedup.dupCandidatesAgainst(
      staticSigs, mem.toDF().toDF("page_id", "text"), "page_id", "text", wideCfg)
    val ver = StreamingDedup.verifiedDupsAgainst(
      staticSigs, mem.toDF().toDF("page_id", "text"), "page_id", "text", wideCfg)
    val q1 = cand.writeStream.format("memory").queryName("cand")
      .outputMode("complete").start()
    val q2 = ver.writeStream.format("memory").queryName("ver")
      .outputMode("complete").start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      val candIds = spark.sql("SELECT in_id FROM cand").collect().map(_.getLong(0)).toSet
      assert(candIds == Set(100L, 200L),
        "both docs band-collide: the candidate surface flags the halfway doc too")
      val verified = spark.sql("SELECT in_id, match_id, est_sim FROM ver").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(verified.keySet == Set(100L), "only the true near-dup survives the estimator gate")
      assert(verified(100L)._1 == 7L)
      assert(verified(100L)._2 >= 0.8)
    } finally { q1.stop(); q2.stop() }
  }

  test("watermarked verified dedup: append mode, window closes on watermark, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val toks = (1 to 40).map(i => s"wmk$i")
    val corpusDoc = toks.mkString(" ")
    val staticSigs = Dedup.signatures(
      Seq((7L, corpusDoc)).toDF("id", "text"), "id", "text", cfg)

    def ts(minute: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ver = StreamingDedup.verifiedDupsAgainst(
      staticSigs, mem.toDF().toDF("page_id", "text", "ts"), "page_id", "text", cfg,
      tsCol = Some("ts"), watermarkDelay = "10 minutes", windowLen = "5 minutes")
    // append mode is only legal because the watermark bounds the window
    // state — the un-watermarked variant would throw AnalysisException here
    val q = ver.writeStream.format("memory").queryName("wmkver")
      .outputMode("append").start()
    try {
      // batch 1: a near-dup at 10:00. Its [10:00,10:05) window cannot
      // close yet (watermark = max ts - 10 min = 9:50) -> no output.
      mem.addData((100L, corpusDoc + " zz", ts(0)))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM wmkver").count() == 0,
        "append mode must hold the row until the watermark passes the window")
      // batch 2: an unrelated late page at 10:20 advances the watermark
      // to 10:10 >= window end 10:05 -> the verified match emits.
      mem.addData((999L, "unrelated filler page", ts(20)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT in_id, match_id, est_sim FROM wmkver").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.map(_._1).toSet == Set(100L), s"expected the near-dup window to emit, got ${rows.mkString}")
      assert(rows.head._2 == 7L && rows.head._3 >= cfg.threshold)
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
