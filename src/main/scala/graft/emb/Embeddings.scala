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

  /** Dot product accumulated in double, sequential array order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

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
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("_qv"))
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("_cv"))
    val scored = c.join(broadcast(q), $"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id", cosine($"_qv", $"_cv").as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    scored.withColumn("rank", row_number().over(w)).where($"rank" <= k)
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
    val bits: Seq[Column] = planes.zipWithIndex.toSeq.map { case (p, i) =>
      val d = aggregate(
        zip_with(vec, typedLit(p.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: band the signature into `bands` chunks (multi-
    * probe via bands, not permutations); candidates = rows sharing any
    * band value; verify with exact cosine; top-k per query.
    *
    * Scale shape: explode(bands) -> shuffle on (band, value) ->
    * within-bucket join -> window. Hot buckets are bounded by the band
    * width; AQE skew-join covers the residual.
    *
    * Recall/compute dial: narrower bands (fewer bits) and more of them
    * raise recall AND candidate volume. Defaults (18 bits / 6 bands)
    * measure recall@10 = 0.75 on the driver's low-contrast random
    * embeddings (top neighbors at cosine ~0.4 — the hard case; see the
    * `ann_lsh_recall` query); high-contrast real embedding spaces get
    * much higher recall at the same setting.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, bits: Int = 18, bands: Int = 6, dim: Int = 64, seed: Long = 42L): DataFrame = {
    require(bits % bands == 0, "bits must divide into bands")
    val planes = hyperplanes(dim, bits, seed)
    val width = bits / bands
    val mask = (1L << width) - 1
    def banded(df: DataFrame, id: String): DataFrame = {
      val sig = rhpSignature(col(vecCol), planes)
      val bandArr = array((0 until bands).map(b =>
        shiftright(sig, b * width).bitwiseAND(lit(mask))): _*)
      df.select(col(idCol).cast("long").as(id), col(vecCol).as(s"_v_$id"),
        posexplode(bandArr).as(Seq("band", "bv")))
    }
    val c = banded(corpus, "neighbor_id")
    val q = banded(queries, "query_id")
    val cand = c.join(q, Seq("band", "bv"))
      .where($"query_id" =!= $"neighbor_id")
      .select($"query_id", $"neighbor_id", $"_v_query_id".as("_qv"), $"_v_neighbor_id".as("_cv"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.select($"query_id", $"neighbor_id", cosine($"_qv", $"_cv").as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    scored.withColumn("rank", row_number().over(w)).where($"rank" <= k)
  }

  /** Embedding near-dup pairs: all (id1 < id2) with cosine >= threshold,
    * via LSH buckets (identical/near-identical vectors share all bands).
    */
  def cosineDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      bits: Int = 16, bands: Int = 4, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bits, seed)
    val width = bits / bands
    val mask = (1L << width) - 1
    val sig = rhpSignature(col(vecCol), planes)
    val bandArr = array((0 until bands).map(b =>
      shiftright(sig, b * width).bitwiseAND(lit(mask))): _*)
    val banded = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("_v"),
      posexplode(bandArr).as(Seq("band", "bv")))
    val a = banded.select($"band", $"bv", $"id".as("id1"), $"_v".as("_v1"))
    val b = banded.select($"band", $"bv", $"id".as("id2"), $"_v".as("_v2"))
    a.join(b, Seq("band", "bv"))
      .where($"id1" < $"id2")
      .dropDuplicates("id1", "id2")
      .select($"id1", $"id2", cosine($"_v1", $"_v2").as("sim"))
      .where($"sim" >= threshold)
  }
}
