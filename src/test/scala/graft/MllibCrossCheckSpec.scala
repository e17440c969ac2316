package graft

import org.apache.spark.ml.feature.MinHashLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup

/** Independent-implementation cross-check (SURVEY §2.11): our n-gram
  * Jaccard near-dup pairs vs Spark MLlib's MinHashLSH
  * `approxSimilarityJoin` over the IDENTICAL shingle sets. MLlib's
  * hash family is not config-pinned (why the engine carries its own
  * seeded MinHash), but its exact-Jaccard verify is an independent
  * code path — agreement on both the pair set and the per-pair
  * Jaccard value rules out a systematic shingle/Jaccard bug shared by
  * our kernels and our DuckDB oracles.
  */
class MllibCrossCheckSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits.{StringToColumn => _, _}

  test("pair set and Jaccard values agree with MLlib MinHashLSH") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      1L -> base,
      2L -> (base + " nu"),   // 10/11 Jaccard with 1
      3L -> "one two three four five six seven eight nine ten eleven twelve",
      4L -> "one two three four five six seven eight nine ten eleven twelve thirteen",
      5L -> "totally different words which share nothing with the other documents at all",
      6L -> "yet another unrelated document full of its own distinct vocabulary entirely"
    ).toDF("id", "text")

    val ours = Dedup.ngramJaccardPairs(docs, "id", "text", n = 3, threshold = 0.5)
      .select($"id1", $"id2", $"jaccard")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap

    // the same distinct word-3-shingle sets as sparse binary vectors
    val dim = 1 << 20
    val sets = docs.select($"id",
        array_distinct(graft.functions.word_shingles(
          graft.norm.Normalizers.normalizeString($"text"), 3)).as("g"))
      .select($"id", transform($"g", g => pmod(xxhash64(g), lit(dim)).cast("int")).as("idx"))
      .as[(Long, Seq[Int])]
      .map { case (id, idx) =>
        val s = idx.distinct.sorted.toArray
        (id, Vectors.sparse(dim, s, Array.fill(s.length)(1.0)))
      }
      .toDF("id", "features")

    val model = new MinHashLSH().setInputCol("features").setOutputCol("h")
      .setNumHashTables(8).setSeed(42L).fit(sets)
    val theirs = model.approxSimilarityJoin(sets, sets, 0.5 + 1e-9, "dist")
      .select(col("datasetA.id").as("id1"), col("datasetB.id").as("id2"), $"dist")
      .where($"id1" < $"id2")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (1.0 - t._3)).toMap

    assert(ours.keySet == theirs.keySet && ours.keySet == Set((1L, 2L), (3L, 4L)),
      s"pair sets diverged: ours=${ours.keySet} mllib=${theirs.keySet}")
    ours.foreach { case (pair, jac) =>
      assert(math.abs(jac - theirs(pair)) < 1e-12,
        s"jaccard diverged on $pair: ours=$jac mllib=${theirs(pair)}")
    }
  }
}
