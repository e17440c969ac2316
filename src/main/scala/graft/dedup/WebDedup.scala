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
      s"_r${cfg.rowsPerBand}_s${cfg.seed}_t${cfg.threshold}_e${cfg.exactVerify}_m${cfg.maxBandBucket}"

  /** Run (or resume) the full pipeline. `pages` must carry
    * (page_id, url, html|text, ...); when `html` is present, text is
    * re-extracted per the byte-identical contract.
    *
    * @return cluster table: page_id, url, cluster_id, cluster_size
    */
  def run(pages: DataFrame, wh: Warehouse, cfg: DedupConfig = DedupConfig()): DataFrame = {
    val fp = fingerprint(cfg)

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
    val groups = wh.getOrCreate("exact_groups", fp, parent = Some("extracted")) {
      extracted.groupBy($"text")
        .agg(min($"page_id").as("rep"), collect_list($"page_id").as("members"))
        .select($"rep", $"members", $"text")
    }

    // -- stage 3: signatures on representatives (the resume point the
    // north rule names explicitly)
    val sigs = wh.getOrCreate("signatures", fp, parent = Some("exact_groups")) {
      Dedup.signatures(groups.select($"rep".as("id"), $"text"), "id", "text", cfg)
    }

    // -- stage 4: candidate pairs + verify (LSH banding)
    val pairs = wh.getOrCreate("pairs", fp, parent = Some("signatures")) {
      Dedup.verifyPairs(Dedup.lshCandidates(sigs, cfg), sigs, cfg)
    }

    // -- stage 5: connected components over near edges + exact edges
    val assignments = wh.getOrCreate("assignments", fp, parent = Some("pairs")) {
      val exactEdges = groups
        .select($"rep", explode($"members").as("m"))
        .where($"rep" =!= $"m")
        .select($"rep".as("u"), $"m".as("v"))
      val nearEdges = pairs.select($"id1".as("u"), $"id2".as("v"))
      ConnectedComponents.run(exactEdges.union(nearEdges))
    }

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
        "dup_pages" -> (nPages - nClusters)))
    }
    clusters
  }
}
