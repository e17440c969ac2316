package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft._
import graft.io.Warehouse
import graft.norm.Normalizers

/** The flagship staged pipeline over the Common-Crawl-style page table
  * (north rule): extract -> exact-collapse -> signatures -> LSH
  * candidate pairs -> verify -> connected components -> cluster
  * assignment, with every stage committed to the warehouse so a killed
  * run resumes from the last committed table and metrics/lineage land
  * next to the data.
  *
  * Stage boundaries = the expensive shuffles; each committed table is
  * also the natural repartition point (signatures by id, pairs by
  * band-hash during the join, assignments by id).
  */
object WebDedup {

  /** Pinned-config fingerprint: any change invalidates downstream
    * checkpoints (getOrCreate rebuilds on mismatch).
    */
  def fingerprint(cfg: DedupConfig): String =
    s"k${cfg.shingleK}_c${cfg.charShingles}_h${cfg.numHashes}_b${cfg.bands}" +
      s"_r${cfg.rowsPerBand}_s${cfg.seed}_t${cfg.threshold}_e${cfg.exactVerify}_m${cfg.maxBandBucket}" +
      s"_sh${cfg.simhashRadius}_sp${cfg.spanMinSpan}.${cfg.spanK}.${cfg.spanWindow}" +
      s".${cfg.spanMinShared}.${cfg.spanMaxFpDf}"

  /** Content snapshot of the input table (row count + order-invariant
    * xxhash checksum over all columns): folded into the stage
    * fingerprint so resuming against the same warehouse root with
    * CHANGED input invalidates every checkpoint instead of silently
    * returning clusters for the old corpus. One extra scan per run —
    * the price of a sound resume. Callers that already track input
    * identity (a real Iceberg snapshot id) pass it via `inputId` and
    * skip the scan.
    */
  def inputSnapshot(pages: DataFrame): String = {
    val h = xxhash64(pages.columns.map(col): _*)
    val row = pages.agg(
      count(lit(1)),
      // decimal(38) sum: ANSI mode would overflow a long sum of hashes
      coalesce(sum(h.cast("decimal(38,0)")), lit(0))).head()
    val digest = scala.util.hashing.MurmurHash3.stringHash(
      row.getLong(0) + "_" + row.get(1)) & 0xffffffffL
    java.lang.Long.toHexString(digest)
  }

  /** Run (or resume) the full pipeline. `pages` must carry
    * (page_id, url, html|text, ...); when `html` is present, text is
    * re-extracted per the byte-identical contract.
    *
    * @return cluster table: page_id, url, cluster_id, cluster_size
    */
  def run(pages: DataFrame, wh: Warehouse, cfg: DedupConfig = DedupConfig(),
      inputId: Option[String] = None): DataFrame = {
    val fp = fingerprint(cfg) + "_in" + inputId.getOrElse(inputSnapshot(pages))

    // -- stage 1: extraction (typed transform contract)
    val extracted = wh.getOrCreate("extracted", fp) {
      val withText =
        if (pages.columns.contains("html"))
          pages.withColumn("text", graft.extract.HtmlExtract.extractText($"html"))
        else pages.withColumn("text", Normalizers.normalizeString($"text"))
      withText.select($"page_id".cast("long").as("page_id"), $"url", $"text")
    }

    // -- stage 2: exact-dup collapse (identical text -> representative).
    // Kills quadratic LSH buckets for boilerplate before banding.
    // Hash-rep join shape: group on a 128-bit content hash (never the
    // raw text — that ships the whole corpus as shuffle-key bytes) and
    // store the flat (page_id, rep) map (never collect_list — a hot
    // boilerplate group would be one giant array row). A mega-group
    // skews one join key; the rep side is a single row per key, which
    // AQE skew-split handles.
    val exactMap = wh.getOrCreate("exact_map", fp, parent = Some("extracted")) {
      val hashed = extracted.select($"page_id",
        xxhash64($"text").as("_h1"), xxhash64($"text", lit(1)).as("_h2"))
      val reps = hashed.groupBy($"_h1", $"_h2").agg(min($"page_id").as("rep"))
      hashed.join(reps, Seq("_h1", "_h2")).select($"page_id", $"rep")
    }

    // -- stage 3: signatures on representatives (the resume point the
    // north rule names explicitly); reps pull their text back from the
    // committed extracted table by id (cheap equi-join, no text shuffle
    // through the collapse)
    val sigs = wh.getOrCreate("signatures", fp, parent = Some("exact_map")) {
      val repRows = exactMap.where($"page_id" === $"rep").select($"page_id")
        .join(extracted, Seq("page_id"))
        .select($"page_id".as("id"), $"text")
      Dedup.signatures(repRows, "id", "text", cfg)
    }

    // -- stage 4: candidate pairs + verify (LSH banding)
    val pairs = wh.getOrCreate("pairs", fp, parent = Some("signatures")) {
      Dedup.verifyPairs(Dedup.lshCandidates(sigs, cfg), sigs, cfg)
    }

    // -- stage 4b (opt-in): SimHash hamming-ball pass over the SAME
    // signature table (the simhash column already rides it) — the north
    // rule's near-exact tier, catching e.g. reordered token multisets
    // whose shingle jaccard is low. Bucket cap reuses maxBandBucket.
    var lastPairStage = "pairs"
    val simhashPairs: Option[DataFrame] =
      if (cfg.simhashRadius >= 0) {
        val t = wh.getOrCreate("simhash_pairs", fp, parent = Some(lastPairStage)) {
          Dedup.simhashPairs(sigs, cfg.simhashRadius, cfg.maxBandBucket)
        }
        lastPairStage = "simhash_pairs"
        Some(t)
      } else None

    // -- stage 4c (opt-in): winnowing shared-span pass on the
    // representatives — the north rule's substring tier, pairing pages
    // that embed a long exact span (>= spanMinSpan code points,
    // LCS-verified) inside otherwise-different text.
    val spanPairs: Option[DataFrame] =
      if (cfg.spanMinSpan > 0) {
        val t = wh.getOrCreate("span_pairs", fp, parent = Some(lastPairStage)) {
          val repRows = exactMap.where($"page_id" === $"rep").select($"page_id")
            .join(extracted, Seq("page_id"))
          Dedup.sharedSpanPairs(repRows, "page_id", "text",
            cfg.spanK, cfg.spanWindow, cfg.spanMinShared, cfg.spanMinSpan, cfg.spanMaxFpDf)
        }
        lastPairStage = "span_pairs"
        Some(t)
      } else None

    // -- stage 5: connected components over every edge source (exact
    // collapse + LSH near-dups + optional simhash/span tiers)
    var ccResult: DataFrame = null
    val assignments = wh.getOrCreate("assignments", fp, parent = Some(lastPairStage)) {
      val exactEdges = exactMap.where($"page_id" =!= $"rep")
        .select($"rep".as("u"), $"page_id".as("v"))
      val edgeSources = Seq(pairs.select($"id1".as("u"), $"id2".as("v"))) ++
        simhashPairs.map(_.select($"id1".as("u"), $"id2".as("v"))) ++
        spanPairs.map(_.select($"id1".as("u"), $"id2".as("v")))
      ccResult = ConnectedComponents.run(
        edgeSources.foldLeft(exactEdges)(_ union _))
      ccResult
    }
    // the stage commit (parquet write inside getOrCreate) consumed the
    // CC label checkpoints; assignments reads back from the warehouse,
    // so the blocks are dead — free them (the staged pipeline leaves NO
    // persisted RDDs behind, asserted in WebDedupSpec)
    if (ccResult != null) ConnectedComponents.release(ccResult)

    // -- stage 6: assign + sizes (final output table), laid out in
    // cluster_id hash buckets so per-cluster consumers prune partitions
    val clusters = wh.getOrCreate("clusters", fp, parent = Some("assignments"),
        partitionBy = Seq("bucket")) {
      val withCluster = extracted.select($"page_id", $"url")
        .join(assignments.withColumnRenamed("id", "page_id"), Seq("page_id"), "left")
        .withColumn("cluster_id", coalesce($"cluster_id", $"page_id"))
      val sizes = withCluster.groupBy($"cluster_id").agg(count(lit(1)).as("cluster_size"))
      withCluster.join(sizes, "cluster_id")
        .select($"page_id", $"url", $"cluster_id", $"cluster_size",
          pmod(xxhash64($"cluster_id"), lit(16)).as("bucket"))
    }

    // per-stage metrics (counts & skew surface) — written once per build
    if (wh.buildCount > 0) {
      val nPages = extracted.count()
      val nReps = sigs.count()
      val nPairs = pairs.count()
      val nClusters = clusters.select($"cluster_id").distinct().count()
      wh.logMetrics("pipeline", Map(
        "pages" -> nPages,
        "exact_reps" -> nReps,
        "near_pairs" -> nPairs,
        "clusters" -> nClusters,
        "dup_pages" -> (nPages - nClusters)) ++
        simhashPairs.map(p => "simhash_pairs" -> p.count()).toMap ++
        spanPairs.map(p => "span_pairs" -> p.count()).toMap)
    }
    clusters
  }
}
