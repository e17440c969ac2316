package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.web.Sampling

/** Deterministic corpus sampling: hash-residue properties, rate
  * accuracy, and the temperature-rate algebra.
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ids(n: Int) = spark.range(n).toDF("id")

  test("hashResidue is deterministic, in range, and defined for negative ids") {
    val r = ids(1000).select(Sampling.hashResidue(col("id")).as("h"))
      .agg(min(col("h")), max(col("h"))).head()
    assert(r.getLong(0) >= 0 && r.getLong(1) < Sampling.HashMod)
    val twice = Seq(-5L, -1L, 0L, 7L).toDF("id")
      .select(col("id"), Sampling.hashResidue(col("id")).as("h")).collect()
    twice.foreach(row => assert(row.getLong(1) >= 0 && row.getLong(1) < Sampling.HashMod))
    // same input -> same residue (pure arithmetic, no rand())
    val a = ids(100).select(Sampling.hashResidue(col("id"))).collect().toSeq
    val b = ids(100).select(Sampling.hashResidue(col("id"))).collect().toSeq
    assert(a == b)
  }

  test("sampleByRate keeps ~rate of rows, exactly and reproducibly") {
    val n = 20000
    val kept = Sampling.sampleByRate(ids(n), "id", 0.3).count()
    assert(math.abs(kept.toDouble / n - 0.3) < 0.02, s"kept $kept of $n at rate 0.3")
    assert(Sampling.sampleByRate(ids(n), "id", 0.3).count() == kept) // replayable
    assert(Sampling.sampleByRate(ids(n), "id", 1.0).count() == n)
    assert(Sampling.sampleByRate(ids(n), "id", 0.0).count() == 0)
  }

  test("sampleByRates applies per-key rates; null/unlisted keys drop") {
    val df = ids(10000).select(col("id"),
      when(col("id") % 3 === 0, lit(null).cast("string"))
        .when(col("id") % 3 === 1, lit("a")).otherwise(lit("b")).as("k"))
    val rates = Seq(("a", 1.0), ("c", 0.5)).toDF("k", "rate")
    val out = Sampling.sampleByRates(df, "id", "k", rates)
    assert(out.columns.toSeq == Seq("id", "k")) // helper columns dropped
    val byK = out.groupBy(col("k")).count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byK == Map("a" -> 3333L)) // every 'a' kept; 'b' unlisted and nulls dropped
  }

  test("temperatureRates: tau=1 is the natural mix, tau=0.5 flattens the head") {
    val report = Seq(("big", 1600L), ("mid", 400L), ("tail", 100L)).toDF("domain", "pages")
    val natural = Sampling.temperatureRates(report, tau = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(natural.values.forall(_ == 1.0))
    val flat = Sampling.temperatureRates(report, tau = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // rate_d = (pages_d)^(-1/2) normalized so the SMALLEST domain keeps all:
    // tail -> 1, mid -> sqrt(100/400) = 0.5, big -> sqrt(100/1600) = 0.25
    assert(flat("tail") == 1.0)
    assert(math.abs(flat("mid") - 0.5) < 1e-12)
    assert(math.abs(flat("big") - 0.25) < 1e-12)
    // realized mass proportional to n^tau: big keeps 1600*0.25 = 400 =
    // 4x the tail's 100 (vs 16x naturally) — the head is flattened
  }

  test("splitByCluster: whole clusters share a side, fraction holds, old sides are stable") {
    // 5000 docs in 1000 clusters of 5
    val docs = ids(5000).select(col("id"), (col("id") % 1000).as("cluster_id"))
    val split = Sampling.splitByCluster(docs, "cluster_id", heldOutFrac = 0.2)
    // every member of a cluster lands on the same side (the leakage guarantee)
    val sidesPerCluster = split.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("sides"))
      .agg(max(col("sides"))).head().getLong(0)
    assert(sidesPerCluster == 1L)
    val heldOut = split.where(col("split") === "held_out").count()
    assert(math.abs(heldOut / 5000.0 - 0.2) < 0.03, s"held out $heldOut of 5000")
    // growing the corpus (new members in existing clusters + new
    // clusters) never flips an old cluster's side: side is a pure
    // function of cluster_id
    val grown = ids(8000).select(col("id"), (col("id") % 1600).as("cluster_id"))
    val re = Sampling.splitByCluster(grown, "cluster_id", heldOutFrac = 0.2)
      .select(col("cluster_id"), col("split")).distinct()
    val old = split.select(col("cluster_id"), col("split")).distinct()
    assert(re.join(old, Seq("cluster_id"))
      .where(re("split") =!= old("split")).count() == 0L)
  }

  test("end-to-end: temperature sample rebalances a skewed corpus deterministically") {
    val corpus = ids(8000).select(col("id"),
      when(col("id") % 8 < 6, lit("head.com")).otherwise(lit("tail.org")).as("domain"))
    val counts = corpus.groupBy(col("domain")).agg(count(lit(1)).as("pages"))
    val rates = Sampling.temperatureRates(counts, tau = 0.5)
    val sampled = Sampling.sampleByRates(corpus, "id", "domain", rates)
    val byDom = sampled.groupBy(col("domain")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom("tail.org") == 2000L) // rate 1: the whole tail survives
    // head rate sqrt(2000/6000) = 0.577..: expect ~3464 of 6000, hash-exact
    val expectHead = byDom("head.com")
    assert(math.abs(expectHead - 6000 * math.sqrt(2000.0 / 6000)) < 60,
      s"head kept $expectHead")
    // replayable: the same pipeline yields the identical sample
    assert(Sampling.sampleByRates(corpus, "id", "domain", rates)
      .agg(sum(col("id"))).head().getLong(0) ==
      sampled.agg(sum(col("id"))).head().getLong(0))
  }
}
