package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft._
import graft.functions._
import graft.norm.Normalizers

/** Near-duplicate detection pipelines over a document table, replacing
  * the reference's blocking-index + pairwise-scoring core
  * (/root/reference/src/clusterer.py:375-559) with cluster-native
  * candidate generation:
  *
  *   exact       — hash groupBy (identical normalized text)
  *   minhash LSH — k-shingle -> MinHash signature -> band hash ->
  *                 shuffle self-join within band -> verify
  *   simhash     — 64-bit SimHash, hamming-ball via pigeonhole block
  *                 join (radius r => r+1 blocks; exact recall)
  *   winnowing   — fingerprint join for long shared substrings,
  *                 verified by exact suffix-automaton LCS
  *
  * All stages are DataFrame ops; nothing is collected to the driver
  * (the reference materializes all pairs driver-side,
  * clusterer.py:509-517 — the one design we must never replicate).
  */
object DedupConfigDefaults {
  val ShingleK = 5       // word shingles
  val NumHashes = 128
  val Bands = 32         // 32 bands x 4 rows: P(candidate|s=0.8) ~ 1-5e-8
  val RowsPerBand = 4
  val Seed = 42L
  val Threshold = 0.8
}

/** Pinned signature/banding config; identical config => identical
  * signatures across runs and cluster sizes.
  */
final case class DedupConfig(
    shingleK: Int = DedupConfigDefaults.ShingleK,
    charShingles: Boolean = false,
    numHashes: Int = DedupConfigDefaults.NumHashes,
    bands: Int = DedupConfigDefaults.Bands,
    rowsPerBand: Int = DedupConfigDefaults.RowsPerBand,
    seed: Long = DedupConfigDefaults.Seed,
    threshold: Double = DedupConfigDefaults.Threshold,
    /** verify candidates with exact shingle-set Jaccard instead of the
      * signature estimate (heavier: ships shingle-hash sets through the
      * join; use estimate at web scale)
      */
    exactVerify: Boolean = false,
    /** drop band buckets larger than this (0 = unlimited). Recall-
      * accounted skew guard for degenerate boilerplate; exact-dup
      * collapse runs first, so only near-dup mega-templates hit it.
      */
    maxBandBucket: Int = 0,
    /** Candidate topology. "pairs" (default) emits every within-bucket
      * pair — exact reference-cluster equality, but a dup-group that
      * collides in all b bands amplifies its pair stream b-fold.
      * "star" emits (bucketMin, member) edges only: connectivity-
      * preserving for CLUSTERING, ~k/2 x fewer verified pairs and b x
      * less pre-distinct shuffle — the 100 TB scale path. Star can
      * split a cluster when verify(min, x) fails while verify(a, x)
      * holds for another member; on near-dup groups (all sims >>
      * threshold) the assignments are identical — asserted in
      * WebDedupSpec.
      */
    candidateMode: String = "pairs",
    /** SimHash hamming-ball pass in the staged pipeline (north rule:
      * "SimHash hamming-ball lookup for near-exact pairs"): >= 0
      * enables an extra edge source pairing documents within this
      * hamming radius — catches near-exact rewrites (e.g. reordered
      * token multisets) whose shingle jaccard is LOW. -1 = off
      * (default: the LSH tier alone matches the reference clusters).
      * The pigeonhole join reuses `maxBandBucket` as its skew cap.
      */
    simhashRadius: Int = -1,
    /** Winnowing shared-span pass in the staged pipeline (north rule:
      * "suffix-array substring pass for long shared spans"): > 0
      * enables an edge source pairing documents that share an exact
      * substring of at least this many code points (verified by
      * suffix-automaton LCS) — catches long quotations/mirrored
      * fragments buried in otherwise-different pages. 0 = off.
      */
    spanMinSpan: Int = 0,
    spanK: Int = 24,
    spanWindow: Int = 8,
    spanMinShared: Int = 2,
    /** document-frequency cap for span fingerprints (0 = off) */
    spanMaxFpDf: Int = 0,
    /** Broadcast bound for the sided cross-verify's probed-id set
      * ([[Dedup.verifyPairsCross]]): candidate pairs above this count
      * switch the base-side semi-prune from a driver broadcast to a
      * shuffle left_semi join. 4M ids ≈ 32 MB serialized — safe on any
      * driver; without the bound a hot base band bucket (maxBandBucket
      * defaults to off) could broadcast the whole touched base corpus
      * and OOM the driver at web scale (r3 verdict, What's wrong #3).
      */
    maxProbeBroadcast: Long = 4000000L) {
  require(candidateMode == "pairs" || candidateMode == "star",
    s"unknown candidateMode $candidateMode")
  require(numHashes == bands * rowsPerBand, "numHashes must equal bands*rowsPerBand")

  /** Can signatures/verify artifacts built under `base` be probed with
    * THIS config? The hash-family fields must match exactly (a seed or
    * shingle mismatch makes cross candidates silently empty — never
    * wrong-but-plausible, just zero merges), and exact verify can only
    * be requested if the base actually shipped shingle-hash sets
    * (otherwise `array_jaccard(null, _)` nulls out every cross pair).
    * Threshold/topology knobs may differ: they change which pairs
    * verify, not what the stored artifacts mean.
    */
  def signatureCompatible(base: DedupConfig): Boolean =
    shingleK == base.shingleK && charShingles == base.charShingles &&
      numHashes == base.numHashes && bands == base.bands &&
      rowsPerBand == base.rowsPerBand && seed == base.seed &&
      (!exactVerify || base.exactVerify)
}

/** Clustered-corpus snapshot for incremental dedup: the full
  * per-document assignment table (id, cluster_id — singletons map to
  * themselves; cluster_id = min member id) plus the representatives'
  * persisted signature table. Everything [[Dedup.addBatch]] needs to
  * merge a new crawl batch without recomputing old-old pairs.
  */
final case class ClusterState(assignments: DataFrame, signatures: DataFrame,
    cfg: DedupConfig, retained: Seq[DataFrame] = Nil,
    /** Optional persisted LSH band index over `signatures` — (band,
      * bh, id), hot buckets pre-degraded, hash-partitioned on (band,
      * bh). The in-session analogue of the committed band-index table
      * a real warehouse keeps next to the signature table: with it,
      * [[Dedup.addBatch]]'s probe is O(batch) — the base is neither
      * re-banded nor shuffled per merge (the probe side repartitions
      * to the index's partitioning). Build once via
      * [[Dedup.withBandIndex]]; amortized over every subsequent merge.
      */
    bands: Option[DataFrame] = None,
    /** Tiny persisted complement to `bands`, built with it: the
      * (th1, th2, id) content hashes of the state's NULL-signature
      * docs (too short to shingle — bands can never surface them). A
      * merge's cross-boundary exact check only needs THESE rows:
      * identical real-signature docs collide in every band and verify
      * at sim 1.0, so the full base-table content-hash join the
      * index-less path pays is redundant work (measured: two full
      * scans of the 1.1M-row signature cache per merge).
      */
    nullSigs: Option[DataFrame] = None) {
  /** Free every persisted signature generation in the chain plus the
    * label checkpoints, once the state (or the successor chain built
    * from it) is fully consumed. `retained` tracks the chain's
    * persisted pieces explicitly because a union plan over them is not
    * itself cached — unpersisting the union would free nothing.
    */
  def release(): Unit = release(blocking = false)

  /** @param blocking wait for block removal — pass true for the LAST
    *                  release before a `spark.stop()` so no async
    *                  removal races the BlockManager's shutdown (see
    *                  [[graft.CacheHygiene.releaseCheckpoints]])
    */
  def release(blocking: Boolean): Unit = {
    (signatures +: retained).foreach(_.unpersist(blocking))
    bands.foreach(_.unpersist(blocking))
    nullSigs.foreach(_.unpersist(blocking))
    assignments.unpersist(blocking)
    graft.CacheHygiene.releaseCheckpoints(assignments, blocking)
    ()
  }
}

object Dedup {

  /** Signature-table size at or below which [[verifyPairs]] keeps the
    * plain two-join verify instead of the persisted-candidate +
    * semi-pruned shape: below ~256k rows (~280 MB of signatures) the
    * full table joins in a couple of seconds and the pruned shape's
    * extra serial barriers (candidate persist + count + two probed-id
    * broadcasts) dominate — the regime every incremental-merge batch
    * and the sf-scale declared queries live in. Above it (the 1.28M-row
    * bench corpus and anything larger) pruning halves the verify wall
    * (13-16 s -> 7-8.5 s at 32 cores, measured).
    */
  val SimpleVerifyMaxSigs = 262144L

  /** Scan-parallelism guard: a small local parquet (or any few-file
    * source) coalesces into one or two input splits, serializing the
    * whole narrow pipeline (normalize -> shingle -> MinHash) on a
    * couple of cores. If the input has fewer partitions than the
    * cluster's default parallelism, shuffle it out once, BEFORE the
    * expensive per-row work. At real scale (thousands of input files)
    * the guard is inactive — no gratuitous full-corpus shuffle.
    */
  def ensureParallel(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // The probe builds the NON-ADAPTIVE physical plan's RDD graph and
    // reads its partition count — for a file-rooted narrow plan that is
    // the exact split count, with no job and ~0.1 s of driver time
    // (file-count shortcuts are wrong in both directions: Spark packs
    // many small files into few splits and splits one big file into
    // many). `df.rdd` answers through the ADAPTIVE plan, whose final-
    // plan resolution + codegen costs ~2 s of driver time per call on
    // Spark 4.1 (measured, RddProbe) — pure serial tail.
    //
    // For a frame over not-yet-materialized persisted intermediates
    // (the reps path in collapseAndSign), building this RDD graph
    // materializes those caches EARLY — through the caches' own
    // prepared plans (CacheManager's executedPlan, exchanges intact),
    // so the work is correct and not duplicated: the downstream count
    // then reads blocks (measured, RddProbe: probe 8 s + count 3 s vs
    // the same 11 s in one count). The count it reports is the cache's
    // fixed shuffle partitioning — NOT a post-AQE coalesce — which is
    // precisely the parallelism contract the expensive per-row
    // projections above it need (an AQE-coalesced 1-2-partition cache
    // would starve them; measured 50 s vs 15 s on the signature job).
    // `sparkPlan` skips exchange-insertion prep, so a plan it cannot
    // execute falls back to repartitioning (callers are pre-shuffle
    // roots, where an extra round-robin exchange is at worst redundant).
    val parts = scala.util.Try(df.queryExecution.sparkPlan.execute().getNumPartitions)
    if (parts.getOrElse(0) < target) df.repartition(target) else df
  }

  // ------------------------------------------------------------ exact

  /** Exact dedup: cluster_id = min id among identical values of
    * `textCol`. One shuffle (partial-agg groupBy), no join for the
    * cluster key thanks to window-free min-broadcast... kept as
    * aggregate + equi-join on the 64-bit content hash.
    */
  def exactClusters(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = xxhash64(col(textCol))
    val withHash = ensureParallel(df.withColumn("_h", h))
    val reps = withHash.groupBy($"_h")
      .agg(min(col(idCol)).cast("long").as("cluster_id"),
        count(lit(1)).as("cluster_size"))
    withHash.join(reps, "_h").drop("_h")
  }

  // ------------------------------------------------- signature table

  /** Narrow per-document signature table:
    * (id, sig array<long>, simhash long, shingles array<long> hashes,
    * th1/th2 128-bit content hash of the normalized text).
    * This is the checkpointable resume point (see io.Warehouse).
    *
    * th1/th2 exist for CROSS-corpus exact merges (incremental dedup):
    * a document too short to shingle has a NULL sig and can never
    * collide in a band, but an identical copy on the other side of a
    * batch boundary must still merge — the content hash is the only
    * signature such documents have. Same dual-xxhash64 family as the
    * exact-collapse stage, so exact semantics agree everywhere.
    */
  def signatures(df0: DataFrame, idCol: String, textCol: String,
      cfg: DedupConfig = DedupConfig()): DataFrame =
    signatureRows(df0, idCol, Normalizers.normalizeString(col(textCol)), None, cfg)

  /** Signature table over text that is ALREADY normalized, with the
    * 128-bit content hashes precomputed upstream (the exact-collapse
    * stage already derived both from the same normalized text). Skips
    * one full normalize pass and two full xxhash64 passes over the
    * corpus text relative to [[signatures]] — value-identical because
    * normalizeString is idempotent (byte-contract asserted in
    * NormalizersSpec/WebDedupSpec) and the hash family is shared.
    */
  private[graft] def signaturesOfNormalized(df0: DataFrame, idCol: String, textCol: String,
      th1Col: String, th2Col: String, cfg: DedupConfig): DataFrame =
    signatureRows(df0, idCol, col(textCol), Some((col(th1Col), col(th2Col))), cfg)

  private def signatureRows(df0: DataFrame, idCol: String, text: Column,
      th: Option[(Column, Column)], cfg: DedupConfig): DataFrame = {
    val df = ensureParallel(df0)
    val (th1, th2) = th.getOrElse((xxhash64(text), xxhash64(text, lit(1))))
    // no isNotNull filter on sig: Catalyst would push it below the
    // projection and recompute the full MinHash per row (observed in
    // .explain); posexplode skips null arrays and verify drops null
    // sims, so empty docs fall out downstream for free
    if (cfg.charShingles) {
      // fused one-pass char-shingle kernels (byte-identical to the
      // char_shingles composition — a char shingle is a contiguous
      // byte range of the text, so no per-shingle strings exist;
      // r3 VERDICT task 8 closed the word/char asymmetry)
      df.select(
        col(idCol).cast("long").as("id"),
        minhash_chars(text, cfg.shingleK, cfg.numHashes, cfg.seed).as("sig"),
        simhash64(ws_tokens(text), cfg.seed).as("simhash"),
        (if (cfg.exactVerify) shingle_hashes_chars(text, cfg.shingleK)
        else lit(null).cast("array<long>")).as("shingle_hashes"),
        th1.as("th1"), th2.as("th2"))
    } else {
      // hot path: fused one-pass kernels (byte-identical to the
      // word_shingles composition; shingles are contiguous byte ranges
      // of the normalized text, so no per-shingle strings exist at all)
      df.select(
        col(idCol).cast("long").as("id"),
        minhash_words(text, cfg.shingleK, cfg.numHashes, cfg.seed).as("sig"),
        simhash_words(text, cfg.seed).as("simhash"),
        (if (cfg.exactVerify) shingle_hashes(text, cfg.shingleK)
        else lit(null).cast("array<long>")).as("shingle_hashes"),
        th1.as("th1"), th2.as("th2"))
    }
  }

  // ------------------------------------------------------ minhash LSH

  /** Candidate pairs via LSH banding: posexplode band hashes, shuffle
    * self-join on (band, hash) with id1 < id2, distinct.
    *
    * `sigRows` (when > 0, known for free at the pipeline call sites)
    * sizes the star stage's single exchange from the DATA — band rows
    * x 24 bytes at the 64 MB advisory partition size, floored by the
    * cluster's parallelism — instead of inheriting the configured
    * shuffle-partition count. The star stage chains sort + window +
    * pair dedup + shuffle write in ONE task pipeline; at a 1-core/2 GiB
    * executor the configured 4 partitions made each chain's concurrent
    * footprint brush the task's execution-memory ceiling
    * (UNABLE_TO_ACQUIRE_MEMORY in the window's input sorter, observed
    * intermittently at the bench's fair-sized scaling child).
    * Data-derived sizing keeps per-task state bounded at every scale
    * and is identical to the configured count wherever that count is
    * already adequate (32-core bench level: unchanged).
    */
  def lshCandidates(sigs: DataFrame, cfg: DedupConfig = DedupConfig(),
      sigRows: Long = -1L): DataFrame = {
    val r = cfg.rowsPerBand
    val bandArr = array((0 until cfg.bands).map(b =>
      xxhash64(slice($"sig", b * r + 1, r), lit(b))): _*)
    var bands = sigs.select($"id", posexplode(bandArr).as(Seq("band", "bh")))

    var hotEdges: Option[DataFrame] = None
    if (cfg.maxBandBucket > 0 && cfg.candidateMode != "star") {
      // skew guard for pair mode: oversized buckets degrade to star
      // edges (connectivity-preserving — the cluster result keeps every
      // member reachable) instead of the reference's silent drop
      // (skip_high_cardinality, matcher.py:643-649). Cold buckets keep
      // exact pair semantics.
      val hot = bands.groupBy($"band", $"bh").count()
        .where($"count" > cfg.maxBandBucket)
        .select($"band", $"bh", lit(true).as("_hot"))
      val marked = bands.join(broadcast(hot), Seq("band", "bh"), "left")
      val hotRows = marked.where($"_hot".isNotNull).drop("_hot")
      val hotMins = hotRows.groupBy($"band", $"bh").agg(min($"id").as("id1"))
      hotEdges = Some(hotRows.join(hotMins, Seq("band", "bh"))
        .where($"id" =!= $"id1")
        .select($"id1", $"id".as("id2")))
      bands = marked.where($"_hot".isNull).drop("_hot")
    }

    if (cfg.candidateMode == "star") {
      // per-bucket star: a bucket of size m contributes m-1 edges
      // instead of m(m-1)/2. ONE exchange for the whole star stage
      // (r6 optimization, guide §2.4): the previous partial-agg groupBy
      // + equi-join shape computed and shuffled the band table TWICE —
      // the map-side partial min reduced almost nothing, because a
      // bucket's members are scattered across input partitions
      // (measured at the 1.28M-doc bench corpus, 32 cores: mins 6.5 s
      // + join-subtree 12.7 s before; one-exchange shape ~7 s after).
      // Skew note: a mega-bucket lands on one partition, where the
      // window min stays LINEAR in the bucket size — the same degrade
      // star mode guarantees everywhere else (MegaDomainSkewSpec) —
      // and the window's group buffer spills; AQE picks the partition
      // count (repartition by expression), so parallelism stays
      // scale-adaptive.
      // the min attaches via an UNORDERED window over the same
      // partitioning rather than a groupBy + self-join: no second scan
      // of the band table, no join at all, and — decisive for the
      // 2 GiB-per-core bench child — no ShuffledHashJoin build, whose
      // in-memory hashed relation cannot spill and OOM'd the 1-core
      // level right at its memory edge (SparkOutOfMemoryError "not
      // enough memory to build hash map", reproduced twice). The
      // window's sort and group buffer both spill gracefully.
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"band", $"bh")
      val spark = sigs.sparkSession
      val confPartitions = spark.sessionState.conf.numShufflePartitions
      val partitions =
        if (sigRows <= 0) confPartitions
        else {
          val bandBytes = sigRows * cfg.bands * 24L
          math.max(math.max(spark.sparkContext.defaultParallelism,
            confPartitions),
            math.min(65536L, bandBytes / (64L << 20) + 1).toInt)
        }
      bands.repartition(partitions, $"band", $"bh")
        .withColumn("id1", min($"id").over(w))
        .where($"id" =!= $"id1")
        .select($"id1", $"id".as("id2"))
        .distinct()
    } else {
      val a = bands.select($"band", $"bh", $"id".as("id1"))
      val b = bands.select($"band", $"bh", $"id".as("id2"))
      val pairs = a.join(b, Seq("band", "bh"))
        .where($"id1" < $"id2")
        .select($"id1", $"id2")
      hotEdges.map(pairs.unionAll(_)).getOrElse(pairs).distinct()
    }
  }

  /** Bucket-size distribution per band — the skew/metrics surface. */
  def bandBucketStats(sigs: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame = {
    val r = cfg.rowsPerBand
    val bandArr = array((0 until cfg.bands).map(b =>
      xxhash64(slice($"sig", b * r + 1, r), lit(b))): _*)
    sigs.select(posexplode(bandArr).as(Seq("band", "bh")))
      .groupBy($"band", $"bh").count()
      .groupBy($"band").agg(
        count(lit(1)).as("buckets"),
        max($"count").as("largest_bucket"),
        sum(when($"count" > 1, $"count" * ($"count" - 1) / 2).otherwise(0)).as("candidate_pairs"))
  }

  /** Verify candidate pairs: estimated (signature agreement) or exact
    * (shingle-hash-set Jaccard) similarity, filtered at cfg.threshold.
    * Output: (id1, id2, sim).
    *
    * Shape (r6 optimization, guide §2.3/§3.2): the candidate table is
    * persisted and counted once (narrow — two longs per row), then each
    * verify side joins a signature table SEMI-PRUNED to that side's
    * probed ids instead of the full table. In star candidate mode the
    * id1 side is the bucket-hub set (~1/k of the corpus), so the wide
    * signature rows crossing the verify shuffles drop accordingly
    * (measured at the 1.28M-doc bench corpus, 32 cores: 13-16 s
    * two-full-join verify -> 7-8.5 s pruned). The prune follows the
    * same bounded-broadcast discipline as [[verifyPairsCross]]: the
    * candidate count upper-bounds the probed-id sets, and above
    * cfg.maxProbeBroadcast the semi-join degrades from a broadcast to a
    * shuffle. The candidate persist frees itself after the first action
    * on the result (lineage intact, so later actions just recompute).
    *
    * `sigRows` (when >= 0): the signature table's row count, free at
    * both pipeline call sites from their eager persists. At or below
    * [[Dedup.SimpleVerifyMaxSigs]] the whole persist/count/prune
    * apparatus is SKIPPED for the plain two-join verify — for a small
    * signature table the pruned shape's extra job barriers cost more
    * than they save, and the incremental merge's batch-side self-verify
    * sits exactly in that regime (its fixed floor is barrier-bound;
    * measured +1.5-2 s per merge with the pruned shape forced on).
    */
  def verifyPairs(candidates: DataFrame, sigs: DataFrame,
      cfg: DedupConfig = DedupConfig(), sigRows: Long = -1L): DataFrame = {
    val simCol =
      if (cfg.exactVerify)
        array_jaccard($"a.shingle_hashes", $"b.shingle_hashes")
      else
        minhash_jaccard($"a.sig", $"b.sig")
    val narrow =
      if (cfg.exactVerify) sigs.select($"id", $"shingle_hashes")
      else sigs.select($"id", $"sig")
    if (sigRows >= 0 && sigRows <= SimpleVerifyMaxSigs)
      return candidates
        .join(narrow.as("a"), candidates("id1") === col("a.id"))
        .join(narrow.as("b"), candidates("id2") === col("b.id"))
        .select($"id1", $"id2", simCol.as("sim"))
        .where($"sim" >= cfg.threshold)
    val cands = candidates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = graft.CacheHygiene.described(sigs.sparkSession,
      "graft: LSH candidate pairs")(cands.count())
    val small = n <= cfg.maxProbeBroadcast
    def pruned(idCol: String): DataFrame = {
      val ids = cands.select(col(idCol).as("_pid")).distinct()
      narrow.join(if (small) broadcast(ids) else ids, $"id" === $"_pid", "left_semi")
    }
    // join order + strategy (guide §3.1): the id2 (member) side joins
    // first with the narrow candidate table as the shuffle-hash BUILD
    // side — two longs per row, so the per-partition hashed relation
    // stays small at any heap while the wide signature rows stream
    // un-sorted. The id1 (hub) side joins second UNHINTED: its build
    // would be wide signature rows, and an unspillable hashed relation
    // of those OOM'd the 2 GiB-per-core bench child — the planner's
    // sort-merge default spills gracefully and the hub prune keeps its
    // sort input ~1/k of the corpus in star mode.
    val out = cands.hint("shuffle_hash")
      .join(pruned("id2").as("b"), cands("id2") === col("b.id"))
      .join(pruned("id1").as("a"), cands("id1") === col("a.id"))
      .select($"id1", $"id2", simCol.as("sim"))
      .where($"sim" >= cfg.threshold)
    graft.CacheHygiene.releaseAfterAction(out, () => { cands.unpersist(blocking = false); () })
  }

  /** Full near-dup pipeline over (idCol, textCol):
    *  1. exact-dup collapse (identical normalized text -> one
    *     representative) — kills quadratic LSH buckets for boilerplate
    *     and is the single biggest scale win;
    *  2. MinHash/LSH on representatives;
    *  3. verify; 4. connected components; 5. union exact + near edges;
    *  6. assign cluster_id = min member id + cluster_size.
    */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
      cfg: DedupConfig = DedupConfig()): DataFrame = {
    val st = clusterState(df, idCol, textCol, cfg)
    // the signature table is part of the returned state only for
    // incremental maintenance — a one-shot clustering drops it
    st.signatures.unpersist(blocking = false)
    val sizes = st.assignments.groupBy($"cluster_id").agg(count(lit(1)).as("cluster_size"))
    val res = df.withColumn(idCol, col(idCol).cast("long"))
      .join(st.assignments.join(sizes, "cluster_id").withColumnRenamed("id", idCol), idCol)
    // the assignment persist is recomputable (plain cache over the
    // label checkpoints), so it frees itself after the first action on
    // the result; the checkpoints themselves stay until
    // Dedup.release(result)
    graft.CacheHygiene.releaseAfterAction(res,
      () => { st.assignments.unpersist(blocking = false); () })
  }

  /** One surviving row per cluster — the "deduplicated corpus"
    * projection a training pipeline actually consumes downstream.
    * Input is a clustered table as produced by [[nearDupClusters]] /
    * [[exactClusters]] / [[stateClusters]] (doc columns + cluster_id).
    * Survivor = the row with the HIGHEST `prefer` value (numeric;
    * e.g. `length($"text")` to keep the most content, or
    * `-unix_timestamp($"warc_ts")` to keep the earliest crawl);
    * ties break to the lowest id, so the choice is deterministic.
    *
    * Scale shape: a single min_by aggregate over one shuffle on
    * cluster_id — partial-aggregation-friendly (map-side combine keeps
    * one candidate row per cluster per partition, asserted in
    * DedupCanonicalSpec), no window over cluster members, so a
    * boilerplate mega-cluster reduces through combine chains instead
    * of materializing + sorting in a single window task.
    */
  def canonicalDocs(clustered: DataFrame, idCol: String, prefer: Column): DataFrame = {
    val docCols = clustered.columns.filter(_ != "cluster_id")
    clustered.groupBy(col("cluster_id"))
      // min over (-prefer, id): max prefer, ties to min id. The id is
      // the struct's second slot, so any orderable id type works. A
      // NULL prefer (e.g. length of a null text) would sort FIRST in
      // the nulls-first struct comparison — the opposite of "highest
      // prefer wins" — so it coalesces to +inf: a null-prefer row only
      // survives when the whole cluster is null-prefer (then min id).
      .agg(min_by(struct(docCols.map(col): _*),
        struct(coalesce(negate(prefer.cast("double")), lit(Double.PositiveInfinity)).as("_p"),
          col(idCol).as("_t"))).as("_doc"))
      .select(docCols.map(n => col(s"_doc.$n")) :+ col("cluster_id"): _*)
  }

  /** nearDupClusters + canonicalDocs in one call: the deduplicated
    * corpus (every input column + cluster_id + cluster_size, one row
    * per near-dup cluster). Default survivor policy: longest text.
    */
  def dedupedCorpus(df: DataFrame, idCol: String, textCol: String,
      cfg: DedupConfig = DedupConfig(), prefer: Column = null): DataFrame = {
    val p = Option(prefer).getOrElse(length(col(textCol)))
    canonicalDocs(nearDupClusters(df, idCol, textCol, cfg), idCol, p)
  }

  /** In-batch exact collapse in the hash-rep join shape (same as
    * exactClusters): group on a 128-bit content hash — never on the raw
    * text (the full corpus would ride the shuffle as key bytes) and
    * never into collect_list arrays (a hot boilerplate group with
    * millions of members would OOM one executor as a single array row).
    * Members rejoin their representative by hash; a mega-group skews
    * exactly one join key, which AQE skew-split handles (the rep side
    * is one row per key).
    *
    * @return (exact star edges rep->member, persisted signature table
    *         over representatives, that table's row count — free from
    *         the eager persist, sized for join-strategy choices —
    *         free() for the collapse persists)
    */
  private def collapseAndSign(df: DataFrame, idCol: String, textCol: String,
      cfg: DedupConfig): (DataFrame, DataFrame, Long, () => Unit) = {
    val norm = ensureParallel(df.select(col(idCol).cast("long").as("id"),
        Normalizers.normalizeString(col(textCol)).as("_t")))
      .withColumn("_h1", xxhash64($"_t"))
      .withColumn("_h2", xxhash64($"_t", lit(1))) // 2nd seed: 128-bit key, no collision pairs at 1e12 docs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one row per distinct text; map-side partial agg collapses hot
    // groups before the shuffle. first(_t) is well-defined: all texts
    // in a hash group are identical.
    val grouped = norm.groupBy($"_h1", $"_h2")
      .agg(min($"id").as("rep"), first($"_t").as("_t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exactEdges = norm
      .join(grouped.select($"_h1", $"_h2", $"rep"), Seq("_h1", "_h2"))
      .where($"id" =!= $"rep")
      .select($"rep".as("u"), $"id".as("v"))
    // signatures()' internal ensureParallel guard matters here: AQE
    // coalesces the small (h1,h2) shuffle ahead of reps to 1-2
    // partitions (64 MB advisory target), which would run the EXPENSIVE
    // MinHash projection nearly serial (measured: 50 s vs 15 s for the
    // signature job at 4 cores). Inactive at real scale, where reps
    // spans many partitions.
    // reps carry their normalized text AND the content hashes the
    // collapse already computed: the signature projection below skips
    // one normalize pass and two xxhash64 passes over the corpus text
    // (r6 optimization; normalizeString is idempotent, same hash family)
    val reps = grouped.select($"rep".as("id"), $"_t".as("text"), $"_h1", $"_h2")
    // signatures feed three joins (candidates + both verify sides):
    // persist so the MinHash projection runs once, exactly like the
    // checkpointed signature table in the staged pipeline (WebDedup).
    // EAGER: the downstream edge pipeline references sigs (and norm/
    // grouped beneath it) from ~10 independent exchange subtrees; when
    // the first action's AQE plan materializes those stages as
    // concurrent jobs against a still-lazy cache, EACH ONE recomputes
    // normalize+MinHash over the corpus before any blocks land
    // (measured: ten identical 8-9 s stage jobs at 4 cores on the
    // 640k-doc bench corpus — pure duplicated work, and it serializes
    // at 1 core). One count() runs the projection exactly once; the
    // herd then reads blocks. norm and grouped fill as its inputs.
    val sigs = signaturesOfNormalized(reps, "id", "text", "_h1", "_h2", cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSigs = graft.CacheHygiene.described(sigs.sparkSession,
      "graft: exact collapse + signatures")(sigs.count())
    (exactEdges, sigs, nSigs, () => {
      norm.unpersist(blocking = false)
      grouped.unpersist(blocking = false)
      ()
    })
  }

  /** Full clustering that KEEPS the state needed for incremental
    * maintenance: the per-document assignment table and the persisted
    * representative signature table. `assignments` covers EVERY input
    * document (singletons map to themselves) — at warehouse scale this
    * is the committed clusters table, not extra state.
    */
  def clusterState(df: DataFrame, idCol: String, textCol: String,
      cfg: DedupConfig = DedupConfig()): ClusterState = {
    val (exactEdges, sigs, nSigs, free) = collapseAndSign(df, idCol, textCol, cfg)
    // EAGER pair materialization: the banding/window/distinct/verify
    // chain is the expensive half of the job, and connected components
    // references it from FOUR branches (canon x flip x the initial
    // label aggregation). Left lazy, AQE materializes those branches as
    // overlapping stage jobs that contend and partially duplicate work
    // (measured 2.4x wall at 4 cores); one count() runs the chain
    // exactly once — the in-session analogue of WebDedup's committed
    // `pairs` stage.
    // the exact star edges ride the SAME persist: CC must receive the
    // exact persisted Dataset, not a union over it — a composite
    // union(exactEdges, cachedEdges) plan can fail cache substitution
    // (the sides share the norm/grouped subtrees, and the analyzer's
    // relation dedup rewrites one side), making the adjacency
    // checkpoint silently re-run the whole verify chain per union
    // branch (measured on addBatch: ~5 s of a 19 s merge).
    val nearEdges = verifyPairs(lshCandidates(sigs, cfg, sigRows = nSigs), sigs, cfg,
        sigRows = nSigs)
      .select($"id1".as("u"), $"id2".as("v"))
      .union(exactEdges)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.CacheHygiene.described(nearEdges.sparkSession,
      "graft: LSH candidates + verify")(nearEdges.count())
    val labels = ConnectedComponents.run(nearEdges)
    // run() materialized the labels (checkpointed), fully consuming the
    // edge pipeline — the collapse persists and the pair table are
    // dead; the signature table stays persisted because it IS the
    // returned state.
    nearEdges.unpersist(blocking = false)
    free()
    // persisted + EAGER: the assignment table is the state's committed
    // product and every consumer reads it at least twice
    // (stateClusters sizes it AND joins it; addBatch relabels it and
    // unions it) — left lazy, each consumer re-runs the corpus scan +
    // label join, and AQE materializes concurrent consumers as a
    // stage herd (decision 12). ~16 bytes/doc, so it fits the same
    // budget as the signature persist at any per-executor scale.
    val assignments = df.select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select($"id", coalesce($"cluster_id", $"id").as("cluster_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.CacheHygiene.described(assignments.sparkSession,
      "graft: assignment table")(assignments.count())
    ClusterState(assignments, sigs, cfg)
  }

  /** Cross-corpus LSH candidates: every (new id, old id) pair that
    * collides in at least one band — the probe side of incremental
    * dedup. Same band family as [[lshCandidates]], so a batch document
    * identical to an old document collides in EVERY band (signature
    * equality) and can never be missed.
    *
    * Skew: when cfg.maxBandBucket > 0, a hot OLD bucket (boilerplate
    * the base corpus already clusters) degrades to its min-id member —
    * the batch row still reaches that cluster through one
    * representative instead of fanning out to the whole bucket.
    */
  def crossCandidates(newSigs: DataFrame, oldSigs: DataFrame,
      cfg: DedupConfig = DedupConfig()): DataFrame =
    crossCandidatesVia(newSigs, bandRowsGuarded(oldSigs, cfg), cfg)

  /** (id, band, bh) rows of a signature table — one per (doc, band). */
  private def bandRows(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val r = cfg.rowsPerBand
    val bandArr = array((0 until cfg.bands).map(b =>
      xxhash64(slice($"sig", b * r + 1, r), lit(b))): _*)
    sigs.select($"id", posexplode(bandArr).as(Seq("band", "bh")))
  }

  /** Band rows with the hot-bucket degrade applied (when
    * cfg.maxBandBucket > 0): an oversized bucket keeps only its min-id
    * member, so a probe still reaches that cluster through one
    * representative instead of fanning out to the whole bucket.
    */
  private def bandRowsGuarded(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    var rows = bandRows(sigs, cfg)
    if (cfg.maxBandBucket > 0) {
      val hot = rows.groupBy($"band", $"bh").agg(
          count(lit(1)).as("_n"), min($"id").as("_mn"))
        .where($"_n" > cfg.maxBandBucket)
        .select($"band", $"bh", $"_mn")
      rows = rows.join(broadcast(hot), Seq("band", "bh"), "left")
        .where($"_mn".isNull || $"id" === $"_mn")
        .drop("_mn")
    }
    rows
  }

  /** `probeRows` (when >= 0, the probe side's row count = batch docs x
    * bands — known for free from the collapse's eager count) picks the
    * join strategy: a small probe BROADCASTS over the old/index side
    * (which then streams with no exchange and no sort — the index is
    * already partitioned on the join keys); a large one hints
    * SHUFFLE_HASH so only the probe side shuffles and the 10-100x
    * larger index side is never sorted (SMJ, the planner default when
    * it can't see through the explode, would sort it — measured 4.2 s
    * of a 24 s merge on a 36M-row index).
    */
  private def crossCandidatesVia(newSigs: DataFrame, oldBands: DataFrame,
      cfg: DedupConfig, probeRows: Long = -1L): DataFrame = {
    val nb = bandRows(newSigs, cfg).select($"band", $"bh", $"id".as("id1"))
    val probe =
      if (probeRows < 0) nb
      else if (probeRows <= cfg.maxProbeBroadcast / 2) broadcast(nb)
      else nb.hint("shuffle_hash")
    probe
      .join(oldBands.select($"band", $"bh", $"id".as("id2")), Seq("band", "bh"))
      .select($"id1", $"id2")
      .distinct()
  }

  /** Materialize the state's LSH band index: (band, bh, id) rows over
    * the state's signatures, hot buckets pre-degraded, hash-partitioned
    * on (band, bh) and persisted — the in-session analogue of the
    * committed band-index table a real warehouse keeps (Iceberg table
    * bucketed by (band, bh); decision 10). One-time O(base) cost; every
    * subsequent [[addBatch]]/[[decontaminate]]-style probe then joins
    * the index CO-LOCATED — the base corpus is never re-banded or
    * re-shuffled per merge, making the probe O(batch + index scan).
    * Idempotent (returns `state` if the index exists). Freed by
    * [[ClusterState.release]].
    */
  def withBandIndex(state: ClusterState): ClusterState =
    if (state.bands.isDefined) state
    else {
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val ix = bandRowsGuarded(state.signatures, state.cfg)
        .repartition($"band", $"bh")
        .persist(lvl)
      graft.CacheHygiene.described(ix.sparkSession,
        "graft: band index build")(ix.count()) // one build job; probes read blocks
      // the unshingleable complement (see ClusterState.nullSigs):
      // content hashes of docs the bands can't reach. Tiny by
      // construction (short docs only), scanned once here.
      val nulls = state.signatures.where($"sig".isNull)
        .select($"th1", $"th2", $"id").persist(lvl)
      nulls.count()
      state.copy(bands = Some(ix), nullSigs = Some(nulls))
    }

  /** Cross verify for incremental merges: `candidates` id1 always
    * comes from `newSigs` (the batch) and id2 from `oldSigs` (the
    * base), so each pair side joins ITS OWN signature table instead of
    * a two-sided union — the shape that made the base table cross the
    * verify shuffle twice. The old side is additionally semi-pruned by
    * a broadcast of the probed id SET (8 bytes per candidate id2 —
    * O(batch x bands) when the band-bucket guard is on), so the base
    * signature table never crosses a shuffle at all: its blocks are
    * scanned once, filtered to the probed rows, and the small survivor
    * side joins (AQE broadcasts it when it fits).
    *
    * The broadcast is BOUNDED: `candidates.count()` (cheap — both
    * callers persist+count the candidate table before verifying) upper-
    * bounds the probed-id set; above cfg.maxProbeBroadcast the prune
    * degrades to a shuffle left_semi join. With maxBandBucket off, a
    * hot base bucket can push candidates toward the touched base corpus
    * — the fallback trades one bounded shuffle of the base's narrow
    * projection for not OOMing the driver.
    */
  def verifyPairsCross(candidates: DataFrame, newSigs: DataFrame, oldSigs: DataFrame,
      cfg: DedupConfig = DedupConfig()): DataFrame = {
    val simCol =
      if (cfg.exactVerify) array_jaccard($"a.shingle_hashes", $"b.shingle_hashes")
      else minhash_jaccard($"a.sig", $"b.sig")
    def narrow(s: DataFrame) =
      if (cfg.exactVerify) s.select($"id", $"shingle_hashes") else s.select($"id", $"sig")
    val probeIds = candidates.select($"id2".as("_pid")).distinct()
    val smallProbe = candidates.count() <= cfg.maxProbeBroadcast
    val probedOld = narrow(oldSigs).join(
      if (smallProbe) broadcast(probeIds) else probeIds,
      $"id" === $"_pid", "left_semi")
    candidates
      .join(narrow(newSigs).as("a"), candidates("id1") === col("a.id"))
      .join(probedOld.as("b"), candidates("id2") === col("b.id"))
      .select($"id1", $"id2", simCol.as("sim"))
      .where($"sim" >= cfg.threshold)
  }

  /** Benchmark decontamination: every (corpus doc, reference doc) pair
    * whose texts near-dup at cfg.threshold — the cross-corpus form of
    * dedup a training pipeline runs to keep EVAL data out of training
    * data. Same banded candidate generation + sided verify as the
    * incremental merge (the reference table is scanned once and never
    * crosses a shuffle; see [[verifyPairsCross]]), so the cost is
    * O(corpus banding + reference scan + candidates), not corpus x
    * reference. Ids must be long-castable (they need not be unique
    * ACROSS the two tables). Output: (idCol, refIdCol, sim) — eagerly
    * materialized; free via [[release]] when consumed. When idCol ==
    * refIdCol (the natural call: corpus and eval set both keyed
    * `doc_id`), the reference column is emitted as `refIdCol + "_ref"`
    * so the result never carries duplicate column names.
    */
  def contaminationPairs(corpus: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refIdCol: String, refTextCol: String,
      cfg: DedupConfig = DedupConfig()): DataFrame = {
    val refOut = if (refIdCol == idCol) refIdCol + "_ref" else refIdCol
    contaminationPairsInternal(corpus, idCol, textCol, reference, refIdCol, refTextCol, cfg)
      .select($"_cid".as(idCol), $"_rid".as(refOut), $"sim")
  }

  /** Pairs with collision-proof internal names (_cid, _rid, sim); the
    * public surfaces rename at the boundary. Checkpointed — released
    * through any projection above it (releaseCheckpoints walks the
    * plan).
    */
  private def contaminationPairsInternal(corpus: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refIdCol: String, refTextCol: String,
      cfg: DedupConfig): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def sign(df: DataFrame, id: String, text: String) = {
      val s = signatures(
        df.select(col(id).cast("long").as("id"), col(text).as("text")), "id", "text", cfg)
        .persist(lvl)
      s.count() // one projection pass; consumers read blocks (decision 12)
      s
    }
    val cSigs = sign(corpus, idCol, textCol)
    val rSigs = sign(reference, refIdCol, refTextCol)
    val cand = crossCandidates(cSigs, rSigs, cfg).persist(lvl)
    cand.count()
    val out = verifyPairsCross(cand, cSigs, rSigs, cfg)
      .select($"id1".as("_cid"), $"id2".as("_rid"), $"sim")
      .localCheckpoint(true) // pairs are the small survivor set
    cand.unpersist(blocking = false)
    cSigs.unpersist(blocking = false)
    rSigs.unpersist(blocking = false)
    out
  }

  /** The deconned corpus: every input column, minus documents that
    * near-dup any reference document. The anti-join key is the
    * long-cast id. Safe for idCol == refIdCol (internal names carry
    * the pair table; see [[contaminationPairs]]).
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refIdCol: String, refTextCol: String,
      cfg: DedupConfig = DedupConfig()): DataFrame = {
    val pairs = contaminationPairsInternal(
      corpus, idCol, textCol, reference, refIdCol, refTextCol, cfg)
    val bad = pairs.select($"_cid".as(idCol)).distinct()
    corpus.withColumn(idCol, col(idCol).cast("long"))
      .join(bad, Seq(idCol), "left_anti")
  }

  /** Exact n-gram decontamination report — the OTHER standard
    * decontamination method (GPT-3 appendix C / PaLM style: a training
    * document is contaminated if it shares at least one exact word
    * 13-gram with an eval document; no reference analogue — the
    * training-data brief's surface). Complements [[contaminationPairs]]
    * (banded MinHash + Jaccard threshold): n-gram collision catches a
    * short eval snippet EMBEDDED in a long page, which whole-document
    * Jaccard dilutes below any usable threshold.
    *
    * Shape, sized for corpus >> eval set: both sides explode distinct
    * word n-grams (string-distinct per doc, then xxhash64 so the join
    * shuffles 8-byte keys, never 13-word strings; a 64-bit collision
    * can only merge two grams — vanishing probability, bounded effect
    * on a count). The eval side is tiny by nature, so its gram table
    * broadcasts when its row count is <= `maxRefBroadcast` (same
    * bound discipline as the incremental merge's probe); above that it
    * degrades to a shuffle join. Per-gram join fan-out is
    * corpusDf(g) x refDf(g) — bounded by the eval set on one side;
    * `maxGramDf` (0 = off) drops grams above that CORPUS document
    * frequency (ubiquitous boilerplate: the standard df-cap recall
    * tradeoff; the hot set rides one bounded broadcast, and pulling a
    * gram from the corpus side alone removes it from the inner join).
    *
    * @return one row per contaminated (corpus doc, eval doc) pair:
    *         (idCol, refIdCol [+ "_ref" if names collide],
    *         shared_ngrams = count of distinct shared n-grams).
    */
  def ngramContamination(corpus: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refIdCol: String, refTextCol: String,
      n: Int = 13, maxGramDf: Int = 0,
      maxRefBroadcast: Long = 4000000L): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    def grams(df: DataFrame, id: String, text: String) =
      ensureParallel(df.select(col(id).cast("long").as("id"),
          Normalizers.normalizeString(col(text)).as("_t")))
        .select($"id", explode(array_distinct(word_shingles($"_t", n))).as("g"))
        .select($"id", xxhash64($"g").as("g"))
    val cg0 = grams(corpus, idCol, textCol)
    val cg =
      if (maxGramDf <= 0) cg0
      else {
        val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        val cgp = cg0.persist(lvl)
        val hot = broadcast(cgp.groupBy($"g").agg(count(lit(1)).as("df"))
          .where($"df" > maxGramDf).select($"g"))
        graft.CacheHygiene.releaseAfterAction(
          cgp.join(hot, Seq("g"), "left_anti"),
          () => { cgp.unpersist(false); () })
      }
    val rg0 = grams(reference, refIdCol, refTextCol)
    val rg = if (rg0.count() <= maxRefBroadcast) broadcast(rg0) else rg0
    val refOut = if (refIdCol == idCol) refIdCol + "_ref" else refIdCol
    cg.as("a").join(rg.as("b"), Seq("g"))
      .groupBy($"a.id".as(idCol), $"b.id".as(refOut))
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /** The n-gram-deconned corpus: every input column, minus documents
    * sharing >= `minShared` distinct word n-grams with any reference
    * document. The anti-join key is the long-cast id.
    */
  def ngramDecontaminate(corpus: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refIdCol: String, refTextCol: String,
      n: Int = 13, minShared: Long = 1, maxGramDf: Int = 0): DataFrame = {
    val bad = ngramContamination(corpus, idCol, textCol,
        reference, refIdCol, refTextCol, n, maxGramDf)
      .where($"shared_ngrams" >= minShared)
      .select(col(idCol)).distinct()
    corpus.withColumn(idCol, col(idCol).cast("long"))
      .join(bad, Seq(idCol), "left_anti")
  }

  /** URL seen-set filter — the crawl-frontier op: drop batch pages
    * whose canonical URL ([[Normalizers.normalizeUrl]]) already exists
    * in the base corpus. The batch (one crawl snapshot) is small
    * relative to the accumulated base, so the plan is sided like the
    * incremental merge: the base is scanned ONCE and filtered by a
    * broadcast left-semi join against the batch's distinct canonical
    * urls — the base never shuffles and never broadcasts; only the
    * <= |batch| "seen" set crosses the cluster. Above
    * `maxBatchBroadcast` distinct batch urls the broadcast would be
    * the OOM cliff, so it degrades to a plain shuffle anti-join
    * (identical result, one base shuffle).
    *
    * Within-batch duplicates are NOT collapsed (both copies of a new
    * url survive) — run url-level dedup ([[exactClusters]] over
    * `normalize_url`) separately; a frontier filter and a dedup are
    * different ops.
    *
    * @return every batch column, minus rows whose canonical url is in
    *         the base.
    */
  def newUrls(batch: DataFrame, base: DataFrame, urlCol: String,
      maxBatchBroadcast: Long = 4000000L): DataFrame = {
    val key = Normalizers.normalizeUrl(col(urlCol))
    val batchKeys = batch.select(key.as("_u")).distinct()
    val baseKeys = base.select(key.as("_u"))
    val seen =
      if (batchKeys.count() <= maxBatchBroadcast)
        baseKeys.join(broadcast(batchKeys), Seq("_u"), "left_semi").distinct()
      else baseKeys.distinct()
    batch.withColumn("_u", key).join(seen, Seq("_u"), "left_anti").drop("_u")
  }

  /** Incremental dedup: cluster a NEW batch of documents against an
    * already-clustered corpus in O(batch + touched clusters) work — the
    * operation a 10^12-document crawl pipeline actually runs (full
    * recompute per crawl snapshot is exactly what does not scale).
    *
    * Candidates are batch-vs-batch (self LSH on the batch's collapsed
    * representatives) plus batch-vs-base (band join against the state's
    * signature table); verified pairs to an old document become edges
    * to that document's CLUSTER ROOT, so connected components runs over
    * batch ids + touched roots only — never the base corpus. Old roots
    * relabel through one join on cluster_id; labels only decrease (the
    * merged root is the global min member id), so the result equals a
    * full recompute over the union in "pairs" candidate mode (asserted
    * in WebDedupSpec and by the dedup_incremental driver oracle).
    *
    * Requires globally unique ids across base and batch.
    */
  def addBatch(state: ClusterState, newDocs: DataFrame, idCol: String, textCol: String,
      cfg: DedupConfig = DedupConfig()): ClusterState = {
    // a seed/shingle mismatch (or exactVerify over a base that shipped
    // no shingle sets) makes every cross pair silently null out — zero
    // batch-to-base merges with no error. Refuse instead.
    require(cfg.signatureCompatible(state.cfg),
      s"batch config cannot probe the base state's signatures: base=${state.cfg}, batch=$cfg")
    val (exactEdges, newSigs, nNewSigs, free) = collapseAndSign(newDocs, idCol, textCol, cfg)
    val nn = verifyPairs(lshCandidates(newSigs, cfg, sigRows = nNewSigs), newSigs, cfg,
      sigRows = nNewSigs)
      .select($"id1".as("u"), $"id2".as("v"))
    // batch-vs-base: sided verify with a broadcast-semi-pruned base
    // side — the base signature table is scanned once and never
    // shuffled (measured: the old two-sided union shipped it through
    // BOTH verify join sides, and the merge cost 2.2x a full
    // recompute). With a band index on the state ([[withBandIndex]])
    // the base is not even re-BANDED: the probe joins the persisted
    // co-located index, so per-merge band cost is O(batch + index
    // scan) instead of O(base explode + shuffle). The candidate table
    // persists because it feeds both the probed-id broadcast and the
    // verify join; the eager count keeps AQE from materializing those
    // consumers as a stage herd.
    val cross = state.bands.map(ix =>
        crossCandidatesVia(newSigs, ix, cfg, probeRows = nNewSigs * cfg.bands))
      .getOrElse(crossCandidates(newSigs, state.signatures, cfg))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.CacheHygiene.described(cross.sparkSession,
      "graft: cross candidates (batch -> base)")(cross.count())
    val no = verifyPairsCross(cross, newSigs, state.signatures, cfg)
    // cross-boundary EXACT merges by content hash: a doc too short to
    // shingle has a NULL sig — bands can never surface its identical
    // twin on the base side, but a full recompute's exact collapse
    // would merge them. With the indexed state the join touches ONLY
    // the persisted null-sig complement: identical real-sig docs have
    // identical signatures, collide in every band, and verify at sim
    // 1.0, so re-joining the whole base table by content hash would be
    // redundant — UNLESS a hot-bucket guard may have pruned those
    // collisions, in which case the full join is the recall backstop.
    val nullOnlyExact = cfg.maxBandBucket == 0 && state.cfg.maxBandBucket == 0
    val crossExact = state.nullSigs match {
      case Some(nulls) if nullOnlyExact =>
        newSigs.where($"sig".isNull).select($"th1", $"th2", $"id".as("id1"))
          .join(nulls.select($"th1", $"th2", $"id".as("id2")), Seq("th1", "th2"))
          .select($"id1", $"id2")
      case _ =>
        newSigs.select($"th1", $"th2", $"id".as("id1"))
          .join(state.signatures.select($"th1", $"th2", $"id".as("id2")), Seq("th1", "th2"))
          .select($"id1", $"id2")
    }
    // an edge to an old document is an edge to its cluster root: CC
    // never touches base-corpus members, only roots
    val noEdges = no.select($"id1", $"id2").union(crossExact)
      .join(state.assignments.withColumnRenamed("id", "id2"), Seq("id2"))
      .select($"id1".as("u"), $"cluster_id".as("v"))
    // eager pair materialization before CC — same rationale as in
    // clusterState (CC references the edge pipeline from four
    // branches). The batch's exact star edges ride the same persist:
    // CC must receive the exact persisted Dataset — feeding it
    // union(exactEdges, newEdges) instead made the adjacency
    // checkpoint MISS the cache and re-run the cross-verify chain per
    // union branch (measured: ~5 s of a 19 s merge at 1:128, a dozen
    // recomputed signature/semi-prune stages in the probe trace).
    val newEdges = nn.union(noEdges).union(exactEdges)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.CacheHygiene.described(newEdges.sparkSession,
      "graft: cross verify + root edges")(newEdges.count())
    val cc = ConnectedComponents.run(newEdges)
    newEdges.unpersist(blocking = false)
    cross.unpersist(blocking = false)
    free()
    val roots = cc.select($"id".as("_r"), $"cluster_id".as("_newRoot"))
    // relabel old assignments through their root (left join: untouched
    // clusters keep their id); labels only decrease, so the coalesce is
    // exact, not heuristic
    val oldFinal = state.assignments.join(roots, $"cluster_id" === $"_r", "left")
      .select($"id", coalesce($"_newRoot", $"cluster_id").as("cluster_id"))
    val newFinal = newDocs.select(col(idCol).cast("long").as("id"))
      .join(roots.withColumnRenamed("_r", "id"), Seq("id"), "left")
      .select($"id", coalesce($"_newRoot", $"id").as("cluster_id"))
    // the successor state's verify capability is the WEAKEST in the
    // chain: a batch signed without shingle sets leaves nulls in the
    // signature union, so a later exactVerify merge must be refused
    // successor bands = None: the base index is stale for the grown
    // signature set — rebuild via withBandIndex (cheap relative to a
    // merge; a warehouse would commit the appended index instead). The
    // base's index rides `retained` so releasing the successor chain
    // frees it.
    // lazy persist: the first consumer materializes the relabel once;
    // anything after (sizing, canonical projection, the next merge's
    // probe) reads blocks. Freed by release() like the base state's.
    val mergedAssign = oldFinal.unionByName(newFinal)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ClusterState(mergedAssign,
      state.signatures.unionByName(newSigs),
      state.cfg.copy(exactVerify = state.cfg.exactVerify && cfg.exactVerify),
      retained = (state.signatures +:
        (state.retained ++ state.bands.toSeq ++ state.nullSigs.toSeq)) :+ newSigs)
  }

  /** Materialize a state as the standard cluster table
    * (id, cluster_id, cluster_size).
    */
  def stateClusters(state: ClusterState): DataFrame = {
    val sizes = state.assignments.groupBy($"cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    state.assignments.join(sizes, "cluster_id")
      .select($"id", $"cluster_id", $"cluster_size")
  }

  /** Free the connected-components label blocks backing a clustering
    * result (`nearDupClusters`/`simhashClusters`) once it has been
    * consumed — see [[ConnectedComponents.release]]. The warehouse-
    * staged pipeline (`WebDedup.run`) does this internally.
    */
  def release(result: DataFrame): Unit = ConnectedComponents.release(result)

  // --------------------------------------------------------- simhash

  private def simhashBlocks(radius: Int): (Int, Column) = {
    val nBlocks = radius + 1
    val width = 64 / nBlocks
    // JVM shifts are mod-64: 1L<<64 == 1, so width=64 (radius 0) needs
    // an explicit all-ones mask
    val mask = if (width == 64) -1L else (1L << width) - 1
    (nBlocks, array((0 until nBlocks).map(i =>
      shiftright($"simhash", i * width).bitwiseAND(lit(mask))): _*))
  }

  /** SimHash near-exact pairs within hamming radius r: pigeonhole —
    * split 64 bits into r+1 blocks; any pair within distance r agrees
    * on >= 1 block (exact recall). Join per block, verify with
    * bit_count(xor) <= r.
    *
    * `maxBucket` (0 = unlimited) is the skew guard: a (blk, bv) bucket
    * larger than the cap — a boilerplate-heavy 16-bit block value at
    * web scale — would put a quadratic pair fan-out on one join task.
    * Oversized buckets degrade to STAR edges (bucket-min hub → member,
    * hub's hamming verified): connectivity-preserving for clustering,
    * O(m) instead of O(m²) per bucket. Recall tradeoff: a hot-bucket
    * pair survives only via the hub (or a cold bucket of another
    * block); near-exact groups (hamming ≈ 0 throughout) keep identical
    * clusters — asserted in DedupGuardSpec. Account the degraded mass
    * with [[simhashBucketStats]].
    */
  def simhashPairs(sigs: DataFrame, radius: Int = 3, maxBucket: Int = 0): DataFrame = {
    val (_, blocks) = simhashBlocks(radius)
    var exploded = sigs.select($"id", $"simhash", posexplode(blocks).as(Seq("blk", "bv")))

    var hotEdges: Option[DataFrame] = None
    // with the guard on, the exploded block table feeds FOUR subtrees
    // (hot detection, the marker join, hubs, the cold self-join) — one
    // small persist keeps the upstream signature projection from
    // recomputing per subtree; freed when the first action completes
    val persisted = if (maxBucket > 0)
      Some(exploded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    else None
    persisted.foreach(p => exploded = p)
    if (maxBucket > 0) {
      // same degrade-to-star pattern as the LSH maxBandBucket guard
      val hot = exploded.groupBy($"blk", $"bv").count()
        .where($"count" > maxBucket)
        .select($"blk", $"bv", lit(true).as("_hot"))
      val marked = exploded.join(broadcast(hot), Seq("blk", "bv"), "left")
      val hotRows = marked.where($"_hot".isNotNull).drop("_hot")
      // hub = bucket-min id (so hub < member always holds); min_by
      // carries the hub's simhash for the hamming verify
      val hubs = hotRows.groupBy($"blk", $"bv")
        .agg(min($"id").as("id1"), min_by($"simhash", $"id").as("h1"))
      hotEdges = Some(hotRows.join(hubs, Seq("blk", "bv"))
        .where($"id" =!= $"id1")
        .select($"id1", $"id".as("id2"), $"h1", $"simhash".as("h2")))
      exploded = marked.where($"_hot".isNull).drop("_hot")
    }

    val a = exploded.select($"blk", $"bv", $"id".as("id1"), $"simhash".as("h1"))
    val b = exploded.select($"blk", $"bv", $"id".as("id2"), $"simhash".as("h2"))
    val cold = a.join(b, Seq("blk", "bv"))
      .where($"id1" < $"id2")
      .select($"id1", $"id2", $"h1", $"h2")
    val out = hotEdges.map(cold.unionAll(_)).getOrElse(cold)
      .select($"id1", $"id2", bit_count($"h1".bitwiseXOR($"h2")).as("hamming"))
      .where($"hamming" <= radius)
      .distinct()
    persisted match {
      case Some(p) => graft.CacheHygiene.releaseAfterAction(out, () => { p.unpersist(false); () })
      case None => out
    }
  }

  /** Per-block bucket-size distribution of the pigeonhole join — the
    * skew/metrics surface for sizing `maxBucket` (mirror of
    * [[bandBucketStats]] for the SimHash path).
    */
  def simhashBucketStats(sigs: DataFrame, radius: Int = 3): DataFrame = {
    val (_, blocks) = simhashBlocks(radius)
    sigs.select(posexplode(blocks).as(Seq("blk", "bv")))
      .groupBy($"blk", $"bv").count()
      .groupBy($"blk").agg(
        count(lit(1)).as("buckets"),
        max($"count").as("largest_bucket"),
        sum(when($"count" > 1, $"count" * ($"count" - 1) / 2).otherwise(0)).as("candidate_pairs"))
  }

  /** SimHash-based clustering (near-exact dups). */
  def simhashClusters(df: DataFrame, idCol: String, textCol: String,
      radius: Int = 3, cfg: DedupConfig = DedupConfig(), maxBucket: Int = 0): DataFrame = {
    val sigs = signatures(
      df.select(col(idCol).cast("long").as("id"), col(textCol).as("text")),
      "id", "text", cfg)
    val edges = simhashPairs(sigs, radius, maxBucket).select($"id1".as("u"), $"id2".as("v"))
    ConnectedComponents.assign(df.withColumn(idCol, col(idCol).cast("long")), idCol, edges)
  }

  // ------------------------------------------------------- winnowing

  /** Shared-span candidate pairs: documents sharing >= minShared
    * winnowing fingerprints; verified with exact suffix-automaton LCS
    * >= minSpan code points. The distributed "suffix-array substring
    * pass": fingerprints shuffle-join globally (a per-partition suffix
    * array cannot see cross-partition pairs).
    *
    * `maxFpDf` (0 = off) is the skew guard: a fingerprint appearing in
    * more than that many documents (a ubiquitous k-gram — licence
    * boilerplate, nav chrome) would contribute a quadratic bucket to
    * the equi-join on one task. Hot fingerprints leave candidate
    * generation (the `maxGramDf` pattern); `shared_fps` then counts
    * COLD shared fingerprints only. Recall tradeoff, documented: a pair
    * sharing nothing but ubiquitous fingerprints is boilerplate overlap
    * by construction — and precision is untouched because every
    * surviving pair is still verified by the exact LCS.
    */
  def sharedSpanPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 24, window: Int = 8, minShared: Int = 2, minSpan: Int = 64,
      maxFpDf: Int = 0): DataFrame = {
    // norm feeds three subtrees (the fingerprint explode + both LCS
    // text joins) and the winnowing kernel feeds both self-join sides —
    // un-persisted, each branch re-ran the normalize and (worse) the
    // rolling-hash winnowing over every document (r6). One persisted
    // pass each; blocks free when the first action on the result
    // completes (recomputable, so a later action merely recomputes).
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val norm = ensureParallel(df.select(col(idCol).cast("long").as("id"),
      Normalizers.normalizeString(col(textCol)).as("_t"))).persist(lvl)
    val fpsIn = norm.select($"id", explode(winnow_fingerprint($"_t", k, window)).as("fp"))
      .persist(lvl)
    graft.CacheHygiene.described(df.sparkSession, "graft: winnow fingerprints")(fpsIn.count())
    val guarded = maxFpDf > 0
    val fps =
      if (!guarded) fpsIn
      else {
        val hot = broadcast(fpsIn.groupBy($"fp").agg(countDistinct($"id").as("df"))
          .where($"df" > maxFpDf).select($"fp"))
        fpsIn.join(hot, Seq("fp"), "left_anti")
      }
    val cand = fps.as("a").join(fps.as("b"), Seq("fp"))
      .where($"a.id" < $"b.id")
      .groupBy($"a.id".as("id1"), $"b.id".as("id2"))
      .agg(count(lit(1)).as("shared_fps"))
      .where($"shared_fps" >= minShared)
    val out = cand.join(norm.select($"id".as("id1"), $"_t".as("t1")), "id1")
      .join(norm.select($"id".as("id2"), $"_t".as("t2")), "id2")
      .select($"id1", $"id2", $"shared_fps",
        longest_common_substring($"t1", $"t2").as("lcs_len"))
      .where($"lcs_len" >= minSpan)
    graft.CacheHygiene.releaseAfterAction(out, () => {
      fpsIn.unpersist(blocking = false)
      norm.unpersist(blocking = false)
      ()
    })
  }

  // ------------------------------------------------ n-gram jaccard

  /** Word n-gram Jaccard pairs above a threshold, via exploded
    * shingle-hash equi-join (set semantics; |A∩B| from the join count,
    * |A∪B| = |A|+|B|-|A∩B|).
    *
    * `maxGramDf` (0 = off) is the stop-gram guard: a gram appearing in
    * more than that many documents (ubiquitous boilerplate shingle)
    * would contribute a quadratic bucket to the equi-join. Hot grams
    * are pulled out of candidate generation; the Jaccard stays EXACT —
    * each doc's (small, broadcast-bounded) hot-gram hash set rides the
    * candidate pair and `array_intersect` restores the hot overlap.
    * Only recall changes: a pair sharing NOTHING but hot grams is no
    * longer surfaced (the standard document-frequency-cap tradeoff;
    * such pairs are boilerplate-only overlap by construction).
    */
  /** Exploded distinct word n-shingles per doc (id, g) and set sizes
    * (id, n) — the shared front half of every gram-overlap operator
    * ([[ngramJaccardPairs]], [[containmentPairs]]).
    */
  private def gramTable(df: DataFrame, idCol: String, textCol: String,
      n: Int): (DataFrame, DataFrame) = {
    val norm = ensureParallel(df.select(col(idCol).cast("long").as("id"),
      Normalizers.normalizeString(col(textCol)).as("_t")))
    val grams = norm.select($"id",
      explode(array_distinct(word_shingles($"_t", n))).as("g"))
    (grams, grams.groupBy($"id").agg(count(lit(1)).as("n")))
  }

  /** Per-pair overlap statistics (id1 < id2, inter, n1, n2) from the
    * shared-gram equi-join — the ratio layer on top picks the
    * coefficient (Jaccard: inter/(n1+n2-inter); containment:
    * inter/min(n1,n2)).
    */
  private def gramPairStats(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    // the gram table feeds FOUR subtrees (both self-join sides + both
    // size joins); un-persisted, each recomputed the normalize + gram
    // explosion from the scan (4 scans visible in the r6 before-plan).
    // One persisted pass + eager count (the AQE-herd discipline,
    // decision 12); blocks free after the first action on the result.
    val (grams0, _) = gramTable(df, idCol, textCol, n)
    val grams = grams0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.CacheHygiene.described(df.sparkSession, "graft: gram table")(grams.count())
    val sizes = grams.groupBy($"id").agg(count(lit(1)).as("n"))
    val out = grams.as("a").join(grams.as("b"), Seq("g"))
      .where($"a.id" < $"b.id")
      .groupBy($"a.id".as("id1"), $"b.id".as("id2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select($"id".as("id1"), $"n".as("n1")), "id1")
      .join(sizes.select($"id".as("id2"), $"n".as("n2")), "id2")
    graft.CacheHygiene.releaseAfterAction(out, () => { grams.unpersist(blocking = false); () })
  }

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxGramDf: Int = 0): DataFrame = {
    if (maxGramDf <= 0)
      return gramPairStats(df, idCol, textCol, n)
        .select($"id1", $"id2",
          ($"inter".cast("double") / ($"n1" + $"n2" - $"inter").cast("double")).as("jaccard"))
        .where($"jaccard" >= threshold)
    // same multi-consumer persist as gramPairStats: grams feeds the hot
    // detection, the marker join, and the size aggregation
    val (gramsRaw, _) = gramTable(df, idCol, textCol, n)
    val grams = gramsRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.CacheHygiene.described(df.sparkSession, "graft: gram table")(grams.count())
    val sizes = grams.groupBy($"id").agg(count(lit(1)).as("n"))
    val inter = {
      val hot = broadcast(grams.groupBy($"g").count()
        .where($"count" > maxGramDf).select($"g", lit(true).as("_hot")))
      val marked = grams.join(hot, Seq("g"), "left")
      val cold = marked.where($"_hot".isNull).select($"id", $"g")
      val hotSets = marked.where($"_hot".isNotNull)
        .groupBy($"id").agg(sort_array(collect_set(xxhash64($"g"))).as("hg"))
      cold.as("a").join(cold.as("b"), Seq("g"))
        .where($"a.id" < $"b.id")
        .groupBy($"a.id".as("id1"), $"b.id".as("id2"))
        .agg(count(lit(1)).as("inter_cold"))
        .join(hotSets.select($"id".as("id1"), $"hg".as("hg1")), Seq("id1"), "left")
        .join(hotSets.select($"id".as("id2"), $"hg".as("hg2")), Seq("id2"), "left")
        .select($"id1", $"id2",
          ($"inter_cold" + when($"hg1".isNull || $"hg2".isNull, 0)
            .otherwise(size(array_intersect($"hg1", $"hg2")))).as("inter"))
    }
    val out = inter
      .join(sizes.select($"id".as("id1"), $"n".as("n1")), "id1")
      .join(sizes.select($"id".as("id2"), $"n".as("n2")), "id2")
      .select($"id1", $"id2",
        ($"inter".cast("double") / ($"n1" + $"n2" - $"inter").cast("double")).as("jaccard"))
      .where($"jaccard" >= threshold)
    graft.CacheHygiene.releaseAfterAction(out, () => { grams.unpersist(blocking = false); () })
  }

  /** Containment near-dup pairs — Broder's containment coefficient
    * `|A ∩ B| / min(|A|, |B|)` over distinct word n-shingle sets,
    * instead of Jaccard's `|A ∩ B| / |A ∪ B|`. The case it exists for:
    * a short document EMBEDDED verbatim in a long one (a quoted
    * article inside a commentary page, a licence block inside source
    * dumps) has containment ~1 while Jaccard dilutes toward
    * |short|/|long| and slips under any usable threshold. Complements
    * [[ngramContamination]] (which counts absolute shared grams
    * cross-corpus); this is the WITHIN-corpus symmetric form.
    *
    * Same shuffle shape as [[ngramJaccardPairs]]: explode distinct
    * grams -> one equi-join on the gram -> count per pair -> size
    * join -> threshold filter. At web scale apply the same `maxGramDf`
    * hygiene via [[ngramJaccardPairs]]' guard first if boilerplate
    * grams dominate (kept out of this signature deliberately: a
    * df-cap UNDERCOUNTS intersections, which containment — dividing
    * by the SMALLER set — amplifies more than Jaccard).
    *
    * @return (id1, id2, containment) with id1 < id2, containment >= threshold.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    gramPairStats(df, idCol, textCol, n)
      .select($"id1", $"id2",
        ($"inter".cast("double") / least($"n1", $"n2").cast("double")).as("containment"))
      .where($"containment" >= threshold)
  }

  /** Threshold sweep — near-dup pair and affected-doc counts at every
    * candidate threshold in ONE pass over the pair table: the report a
    * pipeline reads to pick its dedup threshold (too low merges
    * topically-similar pages; too high leaves templated near-dups in).
    *
    * Shape: pairs are computed once at min(thresholds); each surviving
    * pair fans out to the thresholds it passes (explode over a
    * filtered literal array — bounded by |thresholds|), then ONE
    * two-level aggregation yields both metrics: group by (threshold,
    * id) counts each doc once and sums pair-contributions (each pair
    * contributes exactly 2 id-rows, so pairs = sum/2) — no second scan
    * of the corpus or the pair table, no distinct over exploded rows.
    * Thresholds with zero pairs still appear (zero-filled join against
    * the threshold list).
    *
    * @return (threshold, pairs, docs) — docs = documents in >= 1
    *         passing pair.
    */
  def thresholdSweep(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, thresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)): DataFrame = {
    require(thresholds.nonEmpty, "thresholdSweep needs at least one threshold")
    val ths = thresholds.distinct.sorted
    val thArray = array(ths.map(lit): _*)
    val pairs = ngramJaccardPairs(df, idCol, textCol, n, ths.head)
    val contrib = pairs
      .select(explode(filter(thArray, t => $"jaccard" >= t)).as("threshold"),
        $"id1", $"id2")
      .select($"threshold", explode(array($"id1", $"id2")).as("id"))
      .groupBy($"threshold", $"id").agg(count(lit(1)).as("_cnt"))
      .groupBy($"threshold").agg(
        count(lit(1)).as("docs"),
        (sum($"_cnt") / 2).cast("long").as("pairs"))
    df.sparkSession.range(1)
      .select(explode(thArray).as("threshold"))
      .join(contrib, Seq("threshold"), "left")
      .select($"threshold",
        coalesce($"pairs", lit(0L)).as("pairs"),
        coalesce($"docs", lit(0L)).as("docs"))
  }
}
