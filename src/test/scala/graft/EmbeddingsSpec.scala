package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.emb.Embeddings

/** VecDot kernel semantics: pinned to the aggregate(zip_with(...))
  * composition it replaced — sequential double accumulation, null on
  * length mismatch or null element.
  */
class EmbeddingsSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("dot and cosine match manual computation on float vectors") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))
    ).toDF("a", "b")
    val r = df.select(
      Embeddings.dot(col("a"), col("b")).as("d"),
      Embeddings.cosine(col("a"), col("a")).as("self"),
      Embeddings.l2norm(col("a")).as("n")).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - math.sqrt(14.0)) < 1e-12)
  }

  test("length mismatch and zero norm degrade like the Column composition") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    assert(df.select(Embeddings.dot(col("a"), col("b"))).head().isNullAt(0))
    val z = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(z.select(Embeddings.cosine(col("a"), col("b"))).head().getDouble(0) == 0.0)
  }

  test("IVF: assignment covers every row with a valid cell id") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = graft.emb.IvfIndex.train(e, "vec_id", "embedding", 8, 2, 42L)
    assert(cents.count() == 8)
    val cells = graft.emb.IvfIndex.assign(e, "vec_id", "embedding", cents)
    assert(cells.count() == e.count())
    val range = cells.agg(min(col("cid")), max(col("cid"))).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) < 8)
  }

  test("IVF: planted duplicate found at rank 1 (query vector == corpus vector)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val top1 = graft.emb.IvfIndex.ivfTopK(e, q, "vec_id", "embedding",
        k = 1, nlist = 8, nprobe = 2, iters = 2)
      .select(col("query_id"), col("neighbor_id")).collect()
    assert(top1.nonEmpty)
    assert(top1.forall(r => r.getLong(0) - 100000 == r.getLong(1)))
  }

  test("LSH recall@10 vs brute force >= 0.9 (pins the r2 tuning; was 0.75 in r1)") {
    // the driver's random embeddings are the LOW-contrast hard case
    // (top neighbors at cosine ~0.4); band/probe tuning must not
    // silently regress below 0.9 — measured 1.0 in round 2
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 10 === 0)
    val bf = Embeddings.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select(col("query_id"), col("neighbor_id"))
    val lsh = Embeddings.lshTopK(e, q, "vec_id", "embedding", 10)
      .select(col("query_id").as("q2"), col("neighbor_id").as("n2"))
    val exact = bf.count()
    val found = bf.join(lsh,
      col("query_id") === col("q2") && col("neighbor_id") === col("n2"), "left_semi").count()
    val recall = found.toDouble / exact
    assert(recall >= 0.9, s"recall@10 regressed to $recall ($found/$exact)")
  }

  test("persisted IVF index: probe equals inline search and resumes without rebuild") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val root = java.nio.file.Files.createTempDirectory("ivf").toString
    val wh1 = new graft.io.Warehouse(root, spark)
    graft.emb.IvfIndex.build(wh1, e, "vec_id", "embedding", nlist = 8, iters = 2)
    assert(wh1.buildCount == 2, "centroids + cells build on first run")
    val persisted = graft.emb.IvfIndex.probe(wh1, q, "vec_id", "embedding", k = 1, nprobe = 2)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted-duplicate truth holds through the at-rest index
    assert(persisted.nonEmpty)
    assert(persisted.forall { case (qid, nid) => qid - 100000 == nid })
    val inline = graft.emb.IvfIndex.ivfTopK(e, q, "vec_id", "embedding",
        k = 1, nlist = 8, nprobe = 2, iters = 2)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(persisted == inline, "persisted probe must match the inline tier")

    // resume: a second build against the same warehouse + input reuses
    // both committed tables (manifest/fingerprint protocol)
    val wh2 = new graft.io.Warehouse(root, spark)
    graft.emb.IvfIndex.build(wh2, e, "vec_id", "embedding", nlist = 8, iters = 2)
    assert(wh2.buildCount == 0, "resumed build must rebuild nothing")
    // changed corpus invalidates (input snapshot folded into fingerprint)
    val wh3 = new graft.io.Warehouse(root, spark)
    graft.emb.IvfIndex.build(wh3, e.where(col("vec_id") =!= 1), "vec_id", "embedding",
      nlist = 8, iters = 2)
    assert(wh3.buildCount == 2, "changed input must rebuild the index")
  }

  test("embedding decontamination: twins and near-twins drop, rest survive; same-name ids safe") {
    // corpus doc 1 == ref vector (cosine 1.0); doc 2 is a tiny angular
    // perturbation of it (cosine > 0.99); docs 3/4 are orthogonal-ish
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.01f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f, 1.0f))
    ).toDF("doc_id", "embedding")
    val ref = Seq((100L, Seq(2.0f, 0.0f, 0.0f, 0.0f))) // scaled: cosine ignores norm
      .toDF("doc_id", "embedding")
    val pairs = Embeddings.embeddingContamination(corpus, "doc_id", "embedding",
        ref, "doc_id", "embedding", 0.99, bits = 16, bands = 4, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 100L), (2L, 100L)))
    val survivors = Embeddings.embeddingDecontaminate(corpus, "doc_id", "embedding",
        ref, "doc_id", "embedding", 0.99, bits = 16, bands = 4, dim = 4)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(survivors == Set(3L, 4L))
    // every corpus column rides through the anti-join
    assert(Embeddings.embeddingDecontaminate(corpus, "doc_id", "embedding",
      ref, "doc_id", "embedding", 0.99, bits = 16, bands = 4, dim = 4)
      .columns.toSeq == Seq("doc_id", "embedding"))
  }

  test("brute-force top-k ranks deterministically with id tie-break") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.7f, 0.7f))
    ).toDF("vec_id", "embedding")
    val q = Seq((10L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Embeddings.bruteForceTopK(corpus, q, "vec_id", "embedding", 3)
      .orderBy(col("rank")).collect()
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 4L))
  }
}
