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

  /** The fields that pin what a committed SIGNATURE table means (hash
    * family + shingling). The leading v-token is the table-schema
    * version: bumping it invalidates every warehouse committed under an
    * older schema (v2 added th1/th2 content hashes), so a resume can
    * never read a table missing columns the current code selects.
    */
  def signatureFamily(cfg: DedupConfig): String =
    s"v2k${cfg.shingleK}_c${cfg.charShingles}_h${cfg.numHashes}_b${cfg.bands}" +
      s"_r${cfg.rowsPerBand}_s${cfg.seed}"

  /** Pinned-config fingerprint: any change invalidates downstream
    * checkpoints (getOrCreate rebuilds on mismatch).
    */
  def fingerprint(cfg: DedupConfig): String =
    signatureFamily(cfg) +
      s"_t${cfg.threshold}_e${cfg.exactVerify}_m${cfg.maxBandBucket}" +
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
      inputId: Option[String] = None, canonical: Boolean = false): DataFrame = {
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

    // -- stage 7 (opt-in): canonical survivor per cluster — the
    // deduplicated corpus itself (page_id, url, text + cluster cols),
    // longest extracted text wins, ties to the lowest page_id. Reads
    // only committed tables, so a killed run resumes like every stage.
    if (canonical) {
      wh.getOrCreate("canonical", fp, parent = Some("clusters")) {
        Dedup.canonicalDocs(
          extracted.join(clusters.select($"page_id", $"cluster_id", $"cluster_size"),
            Seq("page_id")),
          "page_id", length($"text"))
      }
    }

    // per-stage metrics (counts & skew surface) — written once per build
    if (wh.buildCount > 0) {
      writeMetrics(wh, extracted, sigs, pairs, clusters,
        simhashPairs, spanPairs)
    }
    clusters
  }

  private def writeMetrics(wh: Warehouse, extracted: DataFrame, sigs: DataFrame,
      pairs: DataFrame, clusters: DataFrame,
      simhashPairs: Option[DataFrame], spanPairs: Option[DataFrame]): Unit = {
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

  /** Incremental staged pipeline: merge a new crawl batch into the
    * committed result of a previous `run()` (gen = 1) or `addBatch()`
    * (gen = k+1) WITHOUT recomputing base-base pairs — the per-snapshot
    * operation a 10^12-document crawl pipeline actually runs.
    *
    * Work is O(batch + touched clusters): batch documents collapse,
    * sign and band-probe the committed base signature table; verified
    * pairs to a base document become edges to that document's CLUSTER
    * ROOT (one join against the base clusters table), so connected
    * components runs over batch ids + touched roots only. The updated
    * corpus-wide tables (`signatures_g$gen`, `clusters_g$gen`) are the
    * base of generation gen+1 — in a real Iceberg warehouse the
    * signature update is an APPEND; the sandbox warehouse rewrites it.
    *
    * Every stage is a committed, resumable table keyed by config +
    * batch-input snapshot + base-generation snapshot ids, so a killed
    * batch merge resumes and a changed base invalidates. Result equals
    * a full `run()` over base ∪ batch in "pairs" candidate mode
    * (WebDedupSpec; the in-session twin is oracled by
    * `dedup_incremental`).
    */
  def addBatch(batch: DataFrame, wh: Warehouse, cfg: DedupConfig = DedupConfig(),
      gen: Int = 1, inputId: Option[String] = None): DataFrame = {
    require(gen >= 1, "gen starts at 1 (the first batch on top of the base run)")
    require(cfg.simhashRadius < 0 && cfg.spanMinSpan == 0,
      "incremental maintenance covers the LSH tier; run the simhash/span tiers in run()")
    def sigsName(g: Int) = if (g <= 0) "signatures" else s"signatures_g$g"
    def clustersName(g: Int) = if (g <= 0) "clusters" else s"clusters_g$g"
    val baseSigsN = sigsName(gen - 1)
    val baseClustersN = clustersName(gen - 1)
    val baseId = (wh.snapshotOf(baseSigsN), wh.snapshotOf(baseClustersN)) match {
      case (Some(a), Some(b)) => a + "." + b
      case _ => sys.error(s"base generation ${gen - 1} is not committed under ${wh.root}")
    }
    // the base chain must carry signatures THIS config can probe: a
    // seed/shingle mismatch empties every cross candidate silently, and
    // exactVerify over a base committed without shingle sets nulls out
    // every cross similarity — both would "succeed" with zero merges
    val baseFp = wh.fingerprintOf(baseSigsN).getOrElse("")
    require(baseFp.startsWith(signatureFamily(cfg) + "_"),
      s"base generation ${gen - 1} was committed under a different signature family: " +
        s"base fingerprint '$baseFp' vs batch family '${signatureFamily(cfg)}'")
    require(!cfg.exactVerify || baseFp.contains("_etrue"),
      "exactVerify batch merge needs a base committed with exactVerify=true " +
        "(the base signature table carries no shingle-hash sets)")
    // chain fingerprint: config + batch content + base snapshot ids —
    // a changed base (or batch, or config) invalidates every stage
    val fp = fingerprint(cfg) + "_b" + inputId.getOrElse(inputSnapshot(batch)) + "_base" + baseId

    val extracted = wh.getOrCreate(s"extracted_g$gen", fp) {
      val withText =
        if (batch.columns.contains("html"))
          batch.withColumn("text", graft.extract.HtmlExtract.extractText($"html"))
        else batch.withColumn("text", Normalizers.normalizeString($"text"))
      withText.select($"page_id".cast("long").as("page_id"), $"url", $"text")
    }

    val exactMap = wh.getOrCreate(s"exact_map_g$gen", fp, parent = Some(s"extracted_g$gen")) {
      val hashed = extracted.select($"page_id",
        xxhash64($"text").as("_h1"), xxhash64($"text", lit(1)).as("_h2"))
      val reps = hashed.groupBy($"_h1", $"_h2").agg(min($"page_id").as("rep"))
      hashed.join(reps, Seq("_h1", "_h2")).select($"page_id", $"rep")
    }

    val batchSigs = wh.getOrCreate(s"sig_batch_g$gen", fp, parent = Some(s"exact_map_g$gen")) {
      val repRows = exactMap.where($"page_id" === $"rep").select($"page_id")
        .join(extracted, Seq("page_id"))
        .select($"page_id".as("id"), $"text")
      Dedup.signatures(repRows, "id", "text", cfg)
    }

    // every edge the batch adds, already rewired to base cluster roots
    var crossCand: DataFrame = null
    val edges = wh.getOrCreate(s"edges_g$gen", fp, parent = Some(s"sig_batch_g$gen")) {
      val baseSigs = wh.read(baseSigsN)
      val exactEdges = exactMap.where($"page_id" =!= $"rep")
        .select($"rep".as("u"), $"page_id".as("v"))
      val nn = Dedup.verifyPairs(Dedup.lshCandidates(batchSigs, cfg), batchSigs, cfg)
        .select($"id1".as("u"), $"id2".as("v"))
      // sided verify: the committed base signature table is scanned,
      // semi-pruned to the probed ids, and never shuffled (see
      // Dedup.verifyPairsCross). cross persists for its two consumers
      // (probed-id broadcast + verify join); freed after the stage
      // commit consumes it (the pipeline leaves no persisted RDDs).
      crossCand = Dedup.crossCandidates(batchSigs, baseSigs, cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      crossCand.count()
      val no = Dedup.verifyPairsCross(crossCand, batchSigs, baseSigs, cfg)
      // cross-boundary EXACT merges by content hash: a too-short-to-
      // shingle doc has a NULL sig and never collides in a band, but a
      // full recompute's exact collapse merges its identical base twin
      // — the hash equi-join restores that equivalence (see
      // Dedup.addBatch)
      val crossExact = batchSigs.select($"th1", $"th2", $"id".as("id1"))
        .join(baseSigs.select($"th1", $"th2", $"id".as("id2")), Seq("th1", "th2"))
        .select($"id1", $"id2")
      val baseAssign = wh.read(baseClustersN)
        .select($"page_id".as("id2"), $"cluster_id".as("_root"))
      val noEdges = no.select($"id1", $"id2").union(crossExact)
        .join(baseAssign, Seq("id2"))
        .select($"id1".as("u"), $"_root".as("v"))
      exactEdges.union(nn).union(noEdges)
    }
    // the edges stage commit consumed the candidate persist (no-op when
    // the stage resumed and the builder never ran)
    if (crossCand != null) crossCand.unpersist(blocking = false)

    var ccResult: DataFrame = null
    val assignments = wh.getOrCreate(s"assignments_g$gen", fp, parent = Some(s"edges_g$gen")) {
      ccResult = ConnectedComponents.run(edges)
      val roots = ccResult.select($"id".as("_r"), $"cluster_id".as("_newRoot"))
      val oldFinal = wh.read(baseClustersN).select($"page_id".as("id"), $"cluster_id")
        .join(roots, $"cluster_id" === $"_r", "left")
        .select($"id", coalesce($"_newRoot", $"cluster_id").as("cluster_id"))
      val newFinal = extracted.select($"page_id".as("id"))
        .join(roots.withColumnRenamed("_r", "id"), Seq("id"), "left")
        .select($"id", coalesce($"_newRoot", $"id").as("cluster_id"))
      oldFinal.unionByName(newFinal)
    }
    if (ccResult != null) ConnectedComponents.release(ccResult)

    // corpus-wide signature table of this generation (Iceberg append)
    val sigsAll = wh.getOrCreate(sigsName(gen), fp, parent = Some(s"sig_batch_g$gen")) {
      wh.read(baseSigsN).unionByName(batchSigs)
    }

    val clusters = wh.getOrCreate(clustersName(gen), fp,
        parent = Some(s"assignments_g$gen"), partitionBy = Seq("bucket")) {
      val urls = wh.read(baseClustersN).select($"page_id", $"url")
        .unionByName(extracted.select($"page_id", $"url"))
      val withCluster = urls
        .join(assignments.withColumnRenamed("id", "page_id"), Seq("page_id"))
      val sizes = withCluster.groupBy($"cluster_id").agg(count(lit(1)).as("cluster_size"))
      withCluster.join(sizes, "cluster_id")
        .select($"page_id", $"url", $"cluster_id", $"cluster_size",
          pmod(xxhash64($"cluster_id"), lit(16)).as("bucket"))
    }

    if (wh.buildCount > 0) {
      wh.logMetrics(s"addBatch_g$gen", Map(
        "batch_pages" -> extracted.count(),
        "batch_reps" -> batchSigs.count(),
        "new_edges" -> edges.count(),
        "clusters" -> clusters.select($"cluster_id").distinct().count()))
      val _ = sigsAll // committed for the next generation
    }
    clusters
  }
}
