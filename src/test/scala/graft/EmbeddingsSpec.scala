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
