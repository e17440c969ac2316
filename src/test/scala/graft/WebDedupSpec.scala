package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.{Dedup, DedupConfig, WebDedup}
import graft.io.Warehouse
import graft.norm.Normalizers

/** North-rule acceptance: dup-pair recall >= 0.99 vs a reference scorer
  * at the same shingle/signature config, checkpoint/resume semantics,
  * and the byte-identical extraction contract (BASELINE.json).
  */
class WebDedupSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val cfg = DedupConfig(exactVerify = true)

  private def pages = fixtures.WebPages.fromDocuments(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))

  /** In-test reference scorer: the semantics the reference engine
    * computes pair-at-a-time (clusterer.py:561-645) — exact k-shingle
    * jaccard over every pair at the pinned config, driver-side plain
    * Scala. Small-fixture only.
    */
  private def referencePairs(texts: Map[Long, String], k: Int, th: Double): Set[(Long, Long)] = {
    def norm(s: String) = s.toLowerCase.trim.replaceAll("\\s+", " ")
    def shingles(s: String): Set[String] = {
      val toks = norm(s).split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) Set.empty
      else if (toks.length <= k) Set(toks.mkString(" "))
      else toks.sliding(k).map(_.mkString(" ")).toSet
    }
    val sh = texts.map { case (id, t) => id -> shingles(t) }
    val ids = texts.keys.toArray.sorted
    val out = Set.newBuilder[(Long, Long)]
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val a = sh(ids(i)); val b = sh(ids(j))
      if (a.nonEmpty && b.nonEmpty) {
        val inter = a.intersect(b).size.toDouble
        val jac = inter / (a.size + b.size - inter)
        if (jac >= th) out += ((ids(i), ids(j)))
      }
    }
    out.result()
  }

  test("byte-identical extraction per url (input_hint contract)") {
    val mismatches = graft.extract.HtmlExtract.extractDF(pages.withColumnRenamed("text", "expected"))
      .where(col("text") =!= Normalizers.normalizeString(col("expected")))
      .count()
    assert(mismatches == 0)
  }

  test("dup-pair recall >= 0.99 and precision 1.0 vs reference scorer; cluster partitions match") {
    val wh = new Warehouse(java.nio.file.Files.createTempDirectory("wh").toString, spark)
    val clusters = WebDedup.run(pages, wh, cfg)

    val texts = pages.select(col("page_id"), col("text")).as[(Long, String)].collect().toMap
    val refPairs = referencePairs(texts, cfg.shingleK, cfg.threshold)

    // pipeline same-cluster relation restricted to reference pairs
    val assign = clusters.select(col("page_id"), col("cluster_id")).as[(Long, Long)].collect().toMap
    val found = refPairs.count { case (a, b) => assign(a) == assign(b) }
    val recall = found.toDouble / refPairs.size
    assert(refPairs.nonEmpty, "fixture must contain dup pairs")
    assert(recall >= 0.99, s"recall $recall over ${refPairs.size} reference pairs")

    // precision at the PAIR level: verified pairs are exact-jaccard
    // filtered, so every emitted pair must be a reference pair
    val emitted = wh.read("pairs").select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
    assert(emitted.subsetOf(refPairs), "exactVerify pairs must be true dup pairs")

    // partition equality: same-cluster relation == union-find of refPairs
    val parent = scala.collection.mutable.Map[Long, Long](texts.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    refPairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val refRoots = texts.keys.map(k => k -> find(k)).toMap
    val sameRef = refPairs.forall { case (a, b) => refRoots(a) == refRoots(b) }
    assert(sameRef)
    // compare as partitions (not ids): group pages by cluster both ways
    val ours = assign.groupBy(_._2).values.map(_.keys.toSet).toSet
    val ref = refRoots.groupBy(_._2).values.map(_.keys.toSet).toSet
    assert(ours == ref, "cluster assignments must match the reference partition")
  }

  test("star candidate topology gives identical clusters on near-dup groups") {
    val full = Dedup.nearDupClusters(pages, "page_id", "text", cfg)
      .select(col("page_id"), col("cluster_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val star = Dedup.nearDupClusters(pages, "page_id", "text", cfg.copy(candidateMode = "star"))
      .select(col("page_id"), col("cluster_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fullParts = full.groupBy(_._2).values.map(_.keys.toSet).toSet
    val starParts = star.groupBy(_._2).values.map(_.keys.toSet).toSet
    assert(fullParts == starParts, "star topology must not split near-dup clusters")
  }

  test("hot-template skew: bucket cap degrades to star edges, cluster stays complete") {
    // boilerplate fixture (FIXTURES.md): one hot template shared by 200
    // pages + unrelated singletons; cap buckets far below the template
    // group size — every template page must still land in ONE cluster
    import spark.implicits._
    val template = (1 to 30).map(i => s"tpl$i").mkString(" ")
    val hot = (0L until 200L).map(i => (i, s"$template page$i"))
    val singles = (1000L until 1100L).map(i => (i, (0 to 25).map(j => s"u${i}w$j").mkString(" ")))
    val df = (hot ++ singles).toDF("doc_id", "text")
    val out = Dedup.nearDupClusters(df, "doc_id", "text",
      cfg.copy(maxBandBucket = 20, threshold = 0.7))
      .select(col("doc_id"), col("cluster_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val templateClusters = (0L until 200L).map(out).toSet
    assert(templateClusters.size == 1, s"template pages split into ${templateClusters.size} clusters")
    assert((1000L until 1100L).forall(i => out(i) == i), "singletons must stay singleton")
  }

  test("full north-rule pipeline: simhash + shared-span tiers catch what LSH cannot") {
    import spark.implicits._
    // fixture of distinct duplicate CLASSES:
    //  - 1/2: token-REVERSED copy — identical token multiset => hamming
    //    0 SimHash, but 5-shingle jaccard ~ 0 (no shared shingles) =>
    //    invisible to the LSH tier
    //  - 3/4: a long exact span embedded in otherwise-different text =>
    //    jaccard well below threshold, LCS >= 64 => only the span tier
    //  - 5/6: plain near-dup (one appended token) => the LSH tier
    //  - 7: unrelated singleton
    val t1 = (1 to 20).map(i => s"tok$i").mkString(" ")
    val span = (1 to 15).map(i => s"quote$i").mkString(" ") // ~100 chars
    val t3 = s"intro one two three $span closing words here"
    val t4 = s"different opening entirely $span and another ending"
    val t5 = (1 to 20).map(i => s"base$i").mkString(" ")
    val rows = Seq(
      (1L, t1), (2L, t1.split(" ").reverse.mkString(" ")),
      (3L, t3), (4L, t4),
      (5L, t5), (6L, t5 + " extra"),
      (7L, (1 to 20).map(i => s"lone$i").mkString(" ")))
    val pages = rows.toDF("page_id", "text")
      .withColumn("url", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("u"), col("page_id")))
    val full = cfg.copy(simhashRadius = 0, spanMinSpan = 64)
    val wh = new Warehouse(java.nio.file.Files.createTempDirectory("wh").toString, spark)
    val out = WebDedup.run(pages, wh, full)
      .select(col("page_id"), col("cluster_id")).as[(Long, Long)].collect().toMap
    assert(wh.buildCount == 8, "simhash_pairs + span_pairs stages must commit")
    assert(out(1L) == out(2L), "simhash tier must pair the reversed copy")
    assert(out(3L) == out(4L), "span tier must pair the shared-quotation pages")
    assert(out(5L) == out(6L), "LSH tier still pairs plain near-dups")
    assert(Set(out(1L), out(3L), out(5L), out(7L)).size == 4,
      "distinct duplicate classes must stay distinct clusters")

    // the LSH-only default config misses the first two classes — the
    // tiers genuinely add recall, not redundancy
    val wh2 = new Warehouse(java.nio.file.Files.createTempDirectory("wh").toString, spark)
    val lshOnly = WebDedup.run(pages, wh2, cfg)
      .select(col("page_id"), col("cluster_id")).as[(Long, Long)].collect().toMap
    assert(lshOnly(1L) != lshOnly(2L) && lshOnly(3L) != lshOnly(4L))
    assert(lshOnly(5L) == lshOnly(6L))

    // resume: all 8 stages reuse
    val wh3 = new Warehouse(wh.root, spark)
    WebDedup.run(pages, wh3, full)
    assert(wh3.buildCount == 0, "full pipeline must resume every committed stage")
  }

  test("canonical stage commits one longest-text survivor per cluster and resumes") {
    val root = java.nio.file.Files.createTempDirectory("wh").toString
    val wh1 = new Warehouse(root, spark)
    val clusters = WebDedup.run(pages, wh1, cfg, canonical = true)
    val canon = wh1.read("canonical")
    assert(canon.columns.toSet ==
      Set("page_id", "url", "text", "cluster_id", "cluster_size"))
    assert(canon.count() == clusters.select(col("cluster_id")).distinct().count())

    // expected survivor per cluster from the committed tables
    val byCluster = wh1.read("extracted")
      .join(clusters.select(col("page_id"), col("cluster_id")), Seq("page_id"))
      .select(col("cluster_id"), col("page_id"), length(col("text")).as("len"))
      .as[(Long, Long, Int)].collect().groupBy(_._1)
    val expected = byCluster.map { case (cid, rows) =>
      cid -> rows.minBy(r => (-r._3, r._2))._2 }
    val got = canon.select(col("cluster_id"), col("page_id")).as[(Long, Long)]
      .collect().toMap
    assert(got == expected)

    // the canonical stage is committed: a rerun rebuilds nothing
    val wh2 = new Warehouse(root, spark)
    WebDedup.run(pages, wh2, cfg, canonical = true)
    assert(wh2.buildCount == 0, "canonical stage must resume from commit")
  }

  test("resume: second run rebuilds nothing and returns identical clusters") {
    val root = java.nio.file.Files.createTempDirectory("wh").toString
    val wh1 = new Warehouse(root, spark)
    val c1 = WebDedup.run(pages, wh1, cfg).collect().map(_.toSeq).toSet
    assert(wh1.buildCount == 6)

    val wh2 = new Warehouse(root, spark)
    val c2 = WebDedup.run(pages, wh2, cfg).collect().map(_.toSeq).toSet
    assert(wh2.buildCount == 0, "resumed run must reuse every committed stage")
    assert(c1 == c2)
  }

  test("resume after kill: missing commit marker rebuilds only that stage onward") {
    val root = java.nio.file.Files.createTempDirectory("wh").toString
    val wh1 = new Warehouse(root, spark)
    val c1 = WebDedup.run(pages, wh1, cfg).collect().map(_.toSeq).toSet

    // simulate a crash mid-stage-4: data present, manifest never written
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "pairs", "_manifest.json"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "clusters", "_manifest.json"))
    val wh2 = new Warehouse(root, spark)
    val c2 = WebDedup.run(pages, wh2, cfg).collect().map(_.toSeq).toSet
    // pairs rebuilds (no marker) -> new snapshot id -> the parent-chain
    // check invalidates assignments too -> clusters: 3 stages, i.e.
    // everything from the killed stage onward; the 3 upstream stages
    // (extracted, exact_map, signatures) are reused
    assert(wh2.buildCount == 3, "the killed stage and its descendants rebuild")
    assert(c1 == c2)
  }

  test("changed input invalidates checkpoints (input snapshot in fingerprint)") {
    val root = java.nio.file.Files.createTempDirectory("wh").toString
    WebDedup.run(pages, new Warehouse(root, spark), cfg)
    // same warehouse root, same config, DIFFERENT corpus: nothing may
    // be silently reused (the round-1 advice's stale-resume hazard)
    val wh2 = new Warehouse(root, spark)
    val changed = pages.where(col("page_id") =!= 3L)
    WebDedup.run(changed, wh2, cfg)
    assert(wh2.buildCount == 6, "changed input must rebuild every stage")
  }

  test("config change invalidates checkpoints (no stale reuse)") {
    val root = java.nio.file.Files.createTempDirectory("wh").toString
    WebDedup.run(pages, new Warehouse(root, spark), cfg)
    val wh2 = new Warehouse(root, spark)
    WebDedup.run(pages, wh2, cfg.copy(threshold = 0.9))
    assert(wh2.buildCount == 6, "different fingerprint must rebuild every stage")
  }

  test("pipeline metrics are written with lineage counts") {
    val wh = new Warehouse(java.nio.file.Files.createTempDirectory("wh").toString, spark)
    WebDedup.run(pages, wh, cfg)
    val m = wh.metrics().as[(String, String, Long)].collect()
      .map { case (_, k, v) => k -> v }.toMap
    assert(m("pages") == 725)
    assert(m("dup_pages") > 0)
    assert(m("near_pairs") > 0)
  }

  test("incremental addBatch == full recompute (single and chained batches)") {
    val docs = pages.select(col("page_id"), col("text"))
    val full = Dedup.nearDupClusters(docs, "page_id", "text", cfg)
      .select(col("page_id"), col("cluster_id"), col("cluster_size"))
      .as[(Long, Long, Long)].collect().toSet

    // one batch: even base + odd batch
    val st0 = Dedup.clusterState(docs.where(col("page_id") % 2 === 0), "page_id", "text", cfg)
    val st1 = Dedup.addBatch(st0, docs.where(col("page_id") % 2 =!= 0), "page_id", "text", cfg)
    val inc1 = Dedup.stateClusters(st1).as[(Long, Long, Long)].collect().toSet
    assert(inc1 == full, "single-batch incremental must equal full recompute")

    // chained: thirds, two addBatch calls
    val st2 = Dedup.clusterState(docs.where(col("page_id") % 3 === 0), "page_id", "text", cfg)
    val st3 = Dedup.addBatch(st2, docs.where(col("page_id") % 3 === 1), "page_id", "text", cfg)
    val st4 = Dedup.addBatch(st3, docs.where(col("page_id") % 3 === 2), "page_id", "text", cfg)
    val inc2 = Dedup.stateClusters(st4).as[(Long, Long, Long)].collect().toSet
    assert(inc2 == full, "chained incremental must equal full recompute")
    st1.release(); st4.release()
  }

  test("incremental addBatch through the persisted band index == full recompute") {
    val docs = pages.select(col("page_id"), col("text"))
    val fullDf = Dedup.nearDupClusters(docs, "page_id", "text", cfg)
      .select(col("page_id"), col("cluster_id"), col("cluster_size"))
    val full = fullDf.as[(Long, Long, Long)].collect().toSet
    Dedup.release(fullDf)
    // same merge as above, but the base carries the committed band
    // index + null-sig complement — the warehouse-amortized probe path
    val st0 = Dedup.withBandIndex(
      Dedup.clusterState(docs.where(col("page_id") % 2 === 0), "page_id", "text", cfg))
    assert(st0.bands.isDefined && st0.nullSigs.isDefined)
    assert(Dedup.withBandIndex(st0) eq st0, "withBandIndex must be idempotent")
    val st1 = Dedup.addBatch(st0, docs.where(col("page_id") % 2 =!= 0), "page_id", "text", cfg)
    val inc = Dedup.stateClusters(st1).as[(Long, Long, Long)].collect().toSet
    assert(inc == full, "indexed-probe incremental must equal full recompute")
    st1.release()
  }

  test("incremental: a batch document bridges two base clusters into one") {
    import spark.implicits._
    val a = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val b = (1 to 30).map(i => s"beta$i").mkString(" ")
    val bridge = a + " " + b // contains both halves: jaccard vs a and b ~ 0.46
    val base = Seq((1L, a), (2L, a + " xa"), (10L, b), (11L, b + " xb")).toDF("id", "text")
    // 64x2 banding: P(candidate | jac 0.46) ~ 1 (32x4 would miss the
    // mid-similarity bridge pair ~22% of the time); exactVerify keeps
    // the 2-row bands' false positives out
    val lowTh = cfg.copy(threshold = 0.45, bands = 64, rowsPerBand = 2)
    val st0 = Dedup.clusterState(base, "id", "text", lowTh)
    val baseAssign = st0.assignments.as[(Long, Long)].collect().toMap
    assert(baseAssign(1L) == baseAssign(2L) && baseAssign(10L) == baseAssign(11L))
    assert(baseAssign(1L) != baseAssign(10L), "base must start as two clusters")

    val st1 = Dedup.addBatch(st0, Seq((20L, bridge)).toDF("id", "text"), "id", "text", lowTh)
    val merged = Dedup.stateClusters(st1)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(merged.values.map(_._1).toSet.size == 1, "bridge doc must merge both clusters")
    assert(merged(1L)._1 == 1L, "merged root must be the global min id")
    assert(merged.values.forall(_._2 == 5L), "merged cluster size must count all 5 docs")
    st1.release()
  }

  test("staged addBatch: == full run over the union; resumes; kill rebuilds only downstream") {
    val even = pages.where(col("page_id") % 2 === 0)
    val odd = pages.where(col("page_id") % 2 =!= 0)
    val root = java.nio.file.Files.createTempDirectory("wh").toString

    // gen 0: full run over the even half commits signatures + clusters
    val wh0 = new Warehouse(root, spark)
    WebDedup.run(even, wh0, cfg)
    // gen 1: merge the odd half as a crawl batch
    val wh1 = new Warehouse(root, spark)
    val merged = WebDedup.addBatch(odd, wh1, cfg, gen = 1)
      .select(col("page_id"), col("cluster_id"), col("cluster_size"))
      .as[(Long, Long, Long)].collect().toSet
    assert(wh1.buildCount == 7, "all 7 generation-1 stages must build")

    // equality with a one-shot full run over the whole corpus (labels
    // are min member ids both ways, so rows compare directly)
    val whFull = new Warehouse(java.nio.file.Files.createTempDirectory("wh").toString, spark)
    val full = WebDedup.run(pages, whFull, cfg)
      .select(col("page_id"), col("cluster_id"), col("cluster_size"))
      .as[(Long, Long, Long)].collect().toSet
    assert(merged == full, "staged addBatch must equal full recompute over the union")

    // resume: same root, same batch — nothing rebuilds
    val wh2 = new Warehouse(root, spark)
    val again = WebDedup.addBatch(odd, wh2, cfg, gen = 1)
      .select(col("page_id"), col("cluster_id"), col("cluster_size"))
      .as[(Long, Long, Long)].collect().toSet
    assert(wh2.buildCount == 0, "committed batch merge must resume entirely")
    assert(again == merged)

    // kill mid-merge: edges committed but unmarked -> edges + its
    // descendants (assignments, clusters) rebuild; the 3 batch prep
    // stages and signatures_g1 (parented on sig_batch) are reused
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "edges_g1", "_manifest.json"))
    val wh3 = new Warehouse(root, spark)
    val resumed = WebDedup.addBatch(odd, wh3, cfg, gen = 1)
      .select(col("page_id"), col("cluster_id"), col("cluster_size"))
      .as[(Long, Long, Long)].collect().toSet
    assert(wh3.buildCount == 3, "only the killed stage and its descendants rebuild")
    assert(resumed == merged)

    // changed BASE invalidates the batch merge (base snapshot ids are
    // folded into the generation fingerprint)
    val whBase = new Warehouse(root, spark)
    WebDedup.run(even.where(col("page_id") =!= 2L), whBase, cfg)
    val wh4 = new Warehouse(root, spark)
    WebDedup.addBatch(odd, wh4, cfg, gen = 1)
    assert(wh4.buildCount == 7, "a re-run base must invalidate every generation stage")
  }

  test("staged addBatch chains generations (gen 2 over gen 1)") {
    val third0 = pages.where(col("page_id") % 3 === 0)
    val third1 = pages.where(col("page_id") % 3 === 1)
    val third2 = pages.where(col("page_id") % 3 === 2)
    val root = java.nio.file.Files.createTempDirectory("wh").toString
    WebDedup.run(third0, new Warehouse(root, spark), cfg)
    WebDedup.addBatch(third1, new Warehouse(root, spark), cfg, gen = 1)
    val g2 = WebDedup.addBatch(third2, new Warehouse(root, spark), cfg, gen = 2)
      .select(col("page_id"), col("cluster_id"), col("cluster_size"))
      .as[(Long, Long, Long)].collect().toSet
    val whFull = new Warehouse(java.nio.file.Files.createTempDirectory("wh").toString, spark)
    val full = WebDedup.run(pages, whFull, cfg)
      .select(col("page_id"), col("cluster_id"), col("cluster_size"))
      .as[(Long, Long, Long)].collect().toSet
    assert(g2 == full, "two chained generations must equal full recompute")
  }

  test("incremental: identical EMPTY docs merge across the batch boundary (null-sig exact path)") {
    import spark.implicits._
    // empty normalized text => NULL MinHash sig => no band can ever
    // surface the cross pair; the content-hash exact path must merge
    // them exactly like a full recompute's exact collapse does
    val grp = (1 to 30).map(i => s"gm$i").mkString(" ")
    val docs = Seq(
      (1L, ""), (2L, "   "),          // base empties (normalize to "")
      (3L, grp), (4L, grp + " zz"),   // a normal near-dup group
      (11L, ""),                      // batch empty
      (13L, grp + " yy")).toDF("id", "text")
    val full = Dedup.nearDupClusters(docs, "id", "text", cfg)
      .select(col("id"), col("cluster_id"), col("cluster_size")).as[(Long, Long, Long)].collect().toSet
    val st0 = Dedup.clusterState(docs.where(col("id") < 10), "id", "text", cfg)
    val st1 = Dedup.addBatch(st0, docs.where(col("id") > 10), "id", "text", cfg)
    val inc = Dedup.stateClusters(st1).as[(Long, Long, Long)].collect().toSet
    assert(inc == full, "batch empty doc must join the base empties' cluster")
    assert(inc.exists { case (id, c, n) => id == 11L && c == 1L && n == 3 })
    st1.release()

    // indexed base: bands can't reach the empties, so the merge must go
    // through the persisted null-sig complement instead of the full
    // content-hash join
    val stIx = Dedup.withBandIndex(
      Dedup.clusterState(docs.where(col("id") < 10), "id", "text", cfg))
    val stIx1 = Dedup.addBatch(stIx, docs.where(col("id") > 10), "id", "text", cfg)
    val incIx = Dedup.stateClusters(stIx1).as[(Long, Long, Long)].collect().toSet
    assert(incIx == full, "null-sig complement must merge cross-boundary empties")
    stIx1.release()

    // staged twin through the warehouse
    val base = docs.where(col("id") < 10).withColumnRenamed("id", "page_id")
      .withColumn("url", concat(lit("https://x.test/"), col("page_id")))
    val batch = docs.where(col("id") > 10).withColumnRenamed("id", "page_id")
      .withColumn("url", concat(lit("https://x.test/"), col("page_id")))
    val root = java.nio.file.Files.createTempDirectory("wh").toString
    WebDedup.run(base, new Warehouse(root, spark), cfg)
    val merged = WebDedup.addBatch(batch, new Warehouse(root, spark), cfg, gen = 1)
      .select(col("page_id"), col("cluster_id"), col("cluster_size")).as[(Long, Long, Long)].collect().toSet
    assert(merged == full, "staged addBatch must merge cross-boundary empties too")
  }

  test("incremental: an incompatible batch config is refused, not silently zero-merge") {
    import spark.implicits._
    val grp = (1 to 30).map(i => s"cfgv$i").mkString(" ")
    val docs = Seq((1L, grp), (2L, grp + " zz")).toDF("id", "text")
    val st = Dedup.clusterState(docs, "id", "text", cfg)
    // different seed: cross candidates could never collide
    intercept[IllegalArgumentException] {
      Dedup.addBatch(st, Seq((9L, grp + " yy")).toDF("id", "text"), "id", "text",
        cfg.copy(seed = 7L))
    }
    // exactVerify over a base without shingle sets: every cross sim nulls
    val stEst = Dedup.clusterState(docs, "id", "text", cfg.copy(exactVerify = false))
    intercept[IllegalArgumentException] {
      Dedup.addBatch(stEst, Seq((9L, grp + " yy")).toDF("id", "text"), "id", "text",
        cfg.copy(exactVerify = true))
    }
    st.release(); stEst.release()

    // staged twin: the base fingerprint in the manifest carries the
    // family; a mismatched batch family must be refused up front
    val base = docs.withColumnRenamed("id", "page_id")
      .withColumn("url", concat(lit("https://x.test/"), col("page_id")))
    val root = java.nio.file.Files.createTempDirectory("wh").toString
    WebDedup.run(base, new Warehouse(root, spark), cfg.copy(exactVerify = false))
    val batch = Seq((9L, grp + " yy")).toDF("page_id", "text")
      .withColumn("url", concat(lit("https://x.test/"), col("page_id")))
    intercept[IllegalArgumentException] {
      WebDedup.addBatch(batch, new Warehouse(root, spark), cfg.copy(seed = 7L), gen = 1)
    }
    intercept[IllegalArgumentException] {
      WebDedup.addBatch(batch, new Warehouse(root, spark), cfg.copy(exactVerify = true), gen = 1)
    }
  }

  test("result is independent of input partitioning (shuffle determinism)") {
    val wh1 = new Warehouse(java.nio.file.Files.createTempDirectory("wh").toString, spark)
    val wh2 = new Warehouse(java.nio.file.Files.createTempDirectory("wh").toString, spark)
    val c1 = WebDedup.run(pages.repartition(1), wh1, cfg).collect().map(_.toSeq).toSet
    val c2 = WebDedup.run(pages.repartition(13), wh2, cfg).collect().map(_.toSeq).toSet
    assert(c1 == c2)
  }
}
