package graft.emb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft._

/** Embedding-space operators: cosine similarity, brute-force top-k
  * nearest neighbors (correctness baseline), random-hyperplane LSH
  * bucketed ANN (the 100 TB scale path), and embedding-cosine near-dup
  * pairs.
  *
  * The embedding column is `array<float>`; all arithmetic accumulates
  * in double. Everything is Column algebra (zip_with/aggregate are
  * codegen'd higher-order functions), no UDFs.
  */
object Embeddings {

  /** Dot product accumulated in double, sequential array order —
    * a codegen'd kernel (graft.sim.VecDot), bit-identical to the
    * `aggregate(zip_with(...))` composition it replaced but without
    * the per-pair 64-element array allocation (that allocation
    * dominated the brute-force scorer: 2.5M pairs at sf0.1).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(graft.sim.VecDot(
      org.apache.spark.sql.GraftColumnBridge.expression(a),
      org.apache.spark.sql.GraftColumnBridge.expression(b)))

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Exact top-k per query over a (query_id, neighbor_id, sim) table,
    * emitted as (query_id, neighbor_id, sim, rank) with rank 1..k by
    * (sim desc, neighbor_id asc) — drop-in equal to the
    * `row_number() over (partition by query_id order by ...) <= k`
    * window every ANN tier used, as a PARTIAL-AGGREGATING bounded-heap
    * top-k (graft.sim.TopKSimAgg) instead: each map partition reduces
    * to at most k candidates per query before the shuffle, and the
    * scored table is never sorted (guide §2.3; the window form paid a
    * full local sort below its rank limit — measured 5.5 s of the
    * 8.9 s brute-force row at the 256k-vector bench corpus).
    */
  private[graft] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
    val agg = toCol(graft.sim.TopKSimAgg(
      toExpr($"neighbor_id"), toExpr($"sim"), k).toAggregateExpression())
    scored.groupBy($"query_id").agg(agg.as("_top"))
      .select($"query_id", posexplode($"_top").as(Seq("_pos", "_e")))
      .select($"query_id", $"_e.id".as("neighbor_id"), $"_e.sim".as("sim"),
        ($"_pos" + 1).as("rank"))
  }

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2norm(a) * l2norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** Brute-force top-k cosine neighbors of each query row against the
    * full corpus. The query side is expected to be small (it is
    * broadcast); the corpus streams — one shuffle for the window.
    * At cluster scale this is the exact baseline an ANN index is
    * measured against.
    *
    * Output: (query_id, neighbor_id, sim, rank), rank 1..k by
    * (sim desc, neighbor_id asc) — the id tie-break keeps ranking
    * deterministic across partitionings.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // norms are per-ROW, not per-pair: compute them before the join so
    // the pair projection does one dot product (norm values identical,
    // so sim is bit-identical to cosine(_qv, _cv))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("_qv"))
      .withColumn("_qn", l2norm($"_qv"))
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("_cv"))
      .withColumn("_cn", l2norm($"_cv"))
    val scored = c.join(broadcast(q), $"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id",
        when($"_qn" * $"_cn" === 0.0, 0.0)
          .otherwise(dot($"_qv", $"_cv") / ($"_qn" * $"_cn")).as("sim"))
    topKPerQuery(scored, k)
  }

  /** Deterministic random hyperplanes: `bits` rows of `dim` doubles,
    * seeded — identical across runs/executors (the signature function
    * is part of the index config, like the MinHash family).
    */
  def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH bucket id: bit i set
    * iff dot(v, plane_i) >= 0. Vectors at cosine ~1 get identical
    * signatures; bucket join replaces the n^2 scan.
    */
  def rhpSignature(vec: Column, planes: Array[Array[Double]]): Column = {
    // one float->double cast of the vector, then `bits` no-allocation
    // vec_dot calls (the zip_with form allocated a fresh array per
    // plane per row); per-plane sums are the same sequential double
    // accumulation, so signatures are bit-identical
    val dvec = transform(vec, x => x.cast("double"))
    val bits: Seq[Column] = planes.zipWithIndex.toSeq.map { case (p, i) =>
      when(dot(dvec, typedLit(p.toSeq)) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Vector-length guard: a vector whose size differs from the plane
    * dimension would zip_with-pad with nulls, null every dot product,
    * and silently drop every row into bucket 0 — LSH would degrade to
    * a cross join. Fail loudly instead.
    */
  private def dimChecked(vec: Column, dim: Int): Column =
    when(size(vec) === dim, vec).otherwise(raise_error(
      concat(lit(s"embedding dimension mismatch: expected $dim, got "),
        size(vec).cast("string"))))

  /** Per-row (band, bucket) entries for the banded RHP signature —
    * ids only: the vector payload must NOT ride the explode (it would
    * multiply through the candidate shuffle by the band count; verify
    * joins vectors back by id instead). With `probeFlips` > 0 the
    * PROBE side also emits every bucket within that Hamming distance
    * of each band value (multi-probe: recall of extra hash tables at
    * zero extra index size — Lv et al., VLDB'07).
    */
  private def bandEntries(df: DataFrame, idCol: String, outId: String, vecCol: String,
      planes: Array[Array[Double]], bands: Int, width: Int, dim: Int,
      probeFlips: Int = 0, carryVec: Option[String] = None): DataFrame = {
    val mask = (1L << width) - 1
    val sig = rhpSignature(dimChecked(col(vecCol), dim), planes)
    val entries: Seq[Column] = (0 until bands).flatMap { b =>
      val base = shiftright(sig, b * width).bitwiseAND(lit(mask))
      val variants: Seq[Column] = base +: (if (probeFlips >= 1)
        (0 until width).map(i => base.bitwiseXOR(lit(1L << i))) else Nil)
      variants.map(v => struct(lit(b).as("band"), v.as("bv")))
    }
    // carryVec: let the vector ride the explode (ONLY sound when the
    // downstream join is a broadcast — map-only, so the extra width is
    // in-core, never network; see embeddingContamination)
    val head = Seq(col(idCol).cast("long").as(outId)) ++
      carryVec.map(a => col(vecCol).as(a))
    df.select(head :+ explode(array(entries: _*)).as("e"): _*)
      .select(Seq(col(outId)) ++ carryVec.map(col) ++
        Seq($"e.band".as("band"), $"e.bv".as("bv")): _*)
  }

  /** LSH-bucketed ANN: band the signature into `bands` chunks;
    * candidates = rows sharing any band value (query side multi-probes
    * Hamming-1 neighbors of each band bucket); verify with exact
    * cosine; top-k per query.
    *
    * Scale shape: explode ids+bucket only -> shuffle on (band, value)
    * -> within-bucket id join -> join vectors back -> window. Hot
    * buckets are bounded by the band width; AQE skew-join covers the
    * residual. Multi-probe multiplies only the (small) query side's
    * entries by (1 + width), not the corpus index.
    *
    * Recall/compute dial: narrower bands and more of them raise recall
    * AND candidate volume; `probeFlips` raises recall with no index
    * growth. Defaults measure recall@10 >= 0.9 on the driver's
    * low-contrast random embeddings (top neighbors at cosine ~0.4 —
    * the hard case; see `ann_lsh_recall`); real embedding spaces with
    * contrast get higher recall at the same setting.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, bits: Int = 18, bands: Int = 6, dim: Int = 64, seed: Long = 42L,
      probeFlips: Int = 1): DataFrame = {
    require(bits % bands == 0, "bits must divide into bands")
    val planes = hyperplanes(dim, bits, seed)
    val width = bits / bands
    val cBands = bandEntries(corpus, idCol, "neighbor_id", vecCol, planes, bands, width, dim)
    val qBands = bandEntries(queries, idCol, "query_id", vecCol, planes, bands, width, dim,
      probeFlips)
    val cand = cBands.join(qBands, Seq("band", "bv"))
      .where($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id")
      .dropDuplicates("query_id", "neighbor_id")
    val qVec = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("_qv"))
    val cVec = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("_cv"))
    val scored = cand.join(qVec, "query_id").join(cVec, "neighbor_id")
      .select($"query_id", $"neighbor_id", cosine($"_qv", $"_cv").as("sim"))
    topKPerQuery(scored, k)
  }

  /** Embedding-space contamination report: LSH CANDIDATE pairs
    * verified by exact cosine >= threshold — APPROXIMATE RECALL.
    * Candidate generation is banded random-hyperplane LSH, so only
    * pairs sharing at least one band ever reach the cosine verify:
    * identical/near-identical vectors share every band (recall is
    * exact as threshold -> 1), but at the defaults (bits=16, bands=4)
    * a genuinely contaminated pair at, say, cosine 0.9 can be missed.
    * For thresholds below ~0.98 raise recall by widening the dial:
    * more bands / fewer bits per band (e.g. bits=16, bands=8 halves
    * the per-band width, P(candidate) = 1-(1-p^w)^b rises steeply) —
    * at the cost of more candidates to verify. Precision is always
    * exact (every emitted pair passed the true cosine).
    *
    * This is the SEMANTIC form of cross-corpus decontamination (a
    * paraphrased eval question shares no exact 13-gram and may fall
    * below a lexical-Jaccard threshold, but its embedding sits next
    * to the eval doc's) — the third decontamination method alongside
    * the lexical two in [[graft.dedup.Dedup]] (banded-MinHash
    * `contaminationPairs`, exact n-gram `ngramContamination`).
    *
    * Scale shape — the corpus NEVER crosses a shuffle: the reference
    * (an eval set: thousands of rows, not billions) broadcasts twice
    * (band entries, then vectors); the corpus side is one map-only
    * projection (signature -> band explode, vector riding along — no
    * network, the explode only multiplies in-core row width by
    * `bands`) -> broadcast-hash join -> inline cosine verify ->
    * threshold filter. The only shuffle is the `dropDuplicates` over
    * SURVIVING pairs (bounded by true contamination, not candidates).
    *
    * Output columns: (_cid = long corpus id, _rid = long reference id,
    * sim) — internal names, collision-proof for idCol == refIdCol.
    */
  def embeddingContamination(corpus: DataFrame, idCol: String, vecCol: String,
      reference: DataFrame, refIdCol: String, refVecCol: String,
      threshold: Double, bits: Int = 16, bands: Int = 4, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    require(bits % bands == 0, "bits must divide into bands")
    val planes = hyperplanes(dim, bits, seed)
    val width = bits / bands
    val cB = bandEntries(corpus, idCol, "_cid", vecCol,
      planes, bands, width, dim, carryVec = Some("_cv"))
    val rB = bandEntries(reference, refIdCol, "_rid", refVecCol,
      planes, bands, width, dim)
    val rV = reference.select(col(refIdCol).cast("long").as("_rid"),
      col(refVecCol).as("_rv"))
    cB.join(broadcast(rB), Seq("band", "bv"))
      .join(broadcast(rV), "_rid")
      .select($"_cid", $"_rid", cosine($"_cv", $"_rv").as("sim"))
      .where($"sim" >= threshold)
      .dropDuplicates("_cid", "_rid")
  }

  /** The embedding-deconned corpus: every input column and type rides
    * through untouched, minus documents [[embeddingContamination]]
    * flags as within cosine `threshold` of a reference embedding.
    * APPROXIMATE RECALL, same contract as embeddingContamination: LSH
    * candidates verified by exact cosine, so at thresholds below
    * ~0.98 some contaminated docs can survive at the default
    * (bits=16, bands=4) dial — raise bands (or cut bits per band) to
    * raise recall. The anti-join runs on an internal long key so the
    * caller's id column keeps its original type (int/string ids are
    * not rewritten).
    */
  def embeddingDecontaminate(corpus: DataFrame, idCol: String, vecCol: String,
      reference: DataFrame, refIdCol: String, refVecCol: String,
      threshold: Double, bits: Int = 16, bands: Int = 4, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val bad = embeddingContamination(corpus, idCol, vecCol,
        reference, refIdCol, refVecCol, threshold, bits, bands, dim, seed)
      .select($"_cid".as("_k")).distinct()
    corpus.withColumn("_k", col(idCol).cast("long"))
      .join(bad, Seq("_k"), "left_anti")
      .drop("_k")
  }

  /** Embedding near-dup pairs: all (id1 < id2) with cosine >= threshold,
    * via LSH buckets (identical/near-identical vectors share all bands).
    * Candidates carry ids only; vectors join back at verify.
    */
  def cosineDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      bits: Int = 16, bands: Int = 4, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bits, seed)
    val width = bits / bands
    val banded = bandEntries(df, idCol, "id", vecCol, planes, bands, width, dim)
    val a = banded.select($"band", $"bv", $"id".as("id1"))
    val b = banded.select($"band", $"bv", $"id".as("id2"))
    val cand = a.join(b, Seq("band", "bv"))
      .where($"id1" < $"id2")
      .dropDuplicates("id1", "id2")
    val vecs = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("_v"))
    cand
      .join(vecs.select($"id".as("id1"), $"_v".as("_v1")), "id1")
      .join(vecs.select($"id".as("id2"), $"_v".as("_v2")), "id2")
      .select($"id1", $"id2", cosine($"_v1", $"_v2").as("sim"))
      .where($"sim" >= threshold)
  }
}
