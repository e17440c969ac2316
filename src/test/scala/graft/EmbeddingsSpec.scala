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
