package graft.web

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft._

/** Deterministic corpus sampling — the operator that turns a
  * per-domain report into the actual training mix. Web corpora are
  * head-heavy (a handful of template-heavy hosts dominate raw page
  * counts); pipelines flatten the head by "temperature" sampling:
  * domain d with n_d pages contributes mass proportional to n_d^tau
  * instead of n_d (tau = 1 keeps the natural mix, tau -> 0 approaches
  * uniform-over-domains). The reference has no analogue (its unit is
  * the record pair; matcher.py never subsamples) — this is a
  * training-data addition over the web-page input shape, composing
  * with [[DomainStats.report]] which supplies the per-domain counts.
  *
  * Everything is DETERMINISTIC and cross-engine reproducible: the
  * per-row accept test is an integer multiplicative-hash residue, not
  * `rand()` — the same corpus always yields the same sample (a
  * training run must be replayable bit-for-bit from lineage), and the
  * DuckDB oracle (`web_sample_temperature`) applies the identical
  * arithmetic and must row-match.
  *
  * Scale shape: `sampleByRates` is one projection + one inner join
  * against a rates table with one row per key — AQE broadcasts it at
  * any realistic domain count, so the corpus never shuffles; the
  * accept test is a codegen'd long-arithmetic Column. The rates
  * computation (`temperatureRates`) is a groupBy(domain) partial
  * aggregate plus one scalar (the normalizing max) broadcast back —
  * the only corpus-sized work is the count the report already did.
  */
object Sampling {

  /** Modulus of the sampling hash: prime, ~2^20 — granular enough for
    * per-mille rates, and (P-1)*A stays far under Long.MaxValue so the
    * arithmetic is overflow-free under ANSI mode in both engines.
    */
  val HashMod = 1000003L

  /** Knuth's multiplicative constant (2654435761 = floor(2^32/phi)). */
  val HashMul = 2654435761L

  /** Deterministic uniform residue in [0, HashMod) from a long id:
    * `(pmod(id, P) * A) mod P`. Plain long arithmetic — expressible
    * identically in ANSI SQL, so oracles reproduce it exactly (the
    * reason this is not xxhash64: DuckDB has no matching kernel).
    * pmod (not %) keeps negative ids in range.
    */
  def hashResidue(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(HashMod)) * lit(HashMul), lit(HashMod))

  /** Keep a deterministic `rate` fraction of rows (by id hash).
    * rate is clamped to [0, 1]; rate = 1 keeps every row.
    */
  def sampleByRate(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.where(hashResidue(col(idCol)) < lit(rate * HashMod))
  }

  /** Keep a per-key deterministic fraction of rows: `rates` has one
    * row per key value with a `rate` column in [0, 1]. Rows whose key
    * is NULL or absent from `rates` are DROPPED (an inner join — no
    * rate means no mass in the mix; pass rate 1 rows to keep a key
    * untouched). The join side is one row per key, so AQE broadcasts
    * it and the corpus never shuffles.
    */
  def sampleByRates(df: DataFrame, idCol: String, keyCol: String,
      rates: DataFrame, rateCol: String = "rate"): DataFrame = {
    val r = rates.select(col(keyCol).as("_sk"), col(rateCol).cast("double").as("_sr"))
    df.join(r, col(keyCol) === col("_sk"))
      .where(hashResidue(col(idCol)) < col("_sr") * HashMod)
      .drop("_sk", "_sr")
  }

  /** Per-domain keep-rates realizing temperature-tau domain
    * reweighting by Bernoulli thinning (no upsampling): domain d with
    * n_d pages gets rate_d = n_d^(tau-1) / max_e(n_e^(tau-1)), so the
    * sampled mass is proportional to n_d^tau and the largest rate is
    * exactly 1 (the normalization spends the whole keep budget —
    * thinning any further would discard data without changing the
    * mix). tau = 1: every rate is 1 (natural mix); tau -> 0: the
    * sample approaches uniform-over-domains; tau > 1 sharpens the
    * head instead. Input is any frame with (domain, pages) columns —
    * [[DomainStats.report]]'s shape.
    *
    * The normalizing max is ONE scalar: computed as a global
    * aggregate over the (already tiny) per-domain frame and joined
    * back by literal cross join — no corpus-sized work.
    */
  def temperatureRates(report: DataFrame, tau: Double,
      domainCol: String = "domain", pagesCol: String = "pages"): DataFrame = {
    require(tau > 0, s"tau must be > 0, got $tau")
    val w = report.select(col(domainCol).as("domain"),
      pow(col(pagesCol).cast("double"), lit(tau - 1)).as("_w"))
    val maxW = w.agg(max($"_w").as("_maxw"))
    w.crossJoin(maxW).select($"domain", ($"_w" / $"_maxw").as("rate"))
  }

  /** Leakage-free train/held-out split over a CLUSTERED corpus: the
    * split unit is the near-dup CLUSTER, not the document — a
    * row-level split puts near-copies of training documents into the
    * eval set, and the contamination survives document-level dedup by
    * construction (the copies are in different splits, so no within-
    * split pass sees both). Deterministic: side = hash residue of the
    * cluster id, so re-running on a grown corpus keeps every old
    * cluster on its old side (new members follow their cluster —
    * exactly what an accumulating crawl warehouse needs).
    *
    * @return df plus a `split` column: "held_out" for the
    *         `heldOutFrac` residue band, else "train". One codegen'd
    *         long expression; no join, no shuffle.
    */
  def splitByCluster(df: DataFrame, clusterCol: String,
      heldOutFrac: Double): DataFrame = {
    require(heldOutFrac >= 0 && heldOutFrac <= 1,
      s"heldOutFrac must be in [0,1], got $heldOutFrac")
    df.withColumn("split",
      when(hashResidue(col(clusterCol)) < lit(heldOutFrac * HashMod),
        lit("held_out")).otherwise(lit("train")))
  }
}
