package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.{Dedup, DedupConfig}
import graft.norm.Normalizers

/** Pins the r6 optimization rewrites to the shapes they replaced:
  *
  *  - `minhash_jaccard` became the fused SigAgree kernel: must be
  *    value-identical to the `aggregate(zip_with(...)) / size` Column
  *    composition, including the composition's null/length edge cases;
  *  - `verifyPairs` gained a persisted-candidate + semi-pruned-side
  *    shape: result set must equal the naive two-full-join verify;
  *  - star-mode `lshCandidates` shares one exchange between the
  *    bucket-min aggregation and the bucket join: pair set must equal
  *    the definitional per-bucket (min, member) edges;
  *  - `signaturesOfNormalized` (collapse path) skips the re-normalize
  *    and content re-hash: rows must equal `signatures` over the same
  *    normalized text.
  */
class VerifyOptSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  // exclude StringToColumn: package graft already provides a $ interpolator
  import spark.implicits.{StringToColumn => _, _}

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def jaccardComposition(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v
    ).cast("double") / size(a).cast("double")

  test("fused minhash_jaccard == zip_with/aggregate composition on real signatures") {
    val cfg = DedupConfig()
    val sigs = Dedup.signatures(docs, "doc_id", "text", cfg).select($"id", $"sig")
    val pairs = sigs.as("a").join(sigs.as("b"), $"a.id" % 7 === $"b.id" % 7)
      .select($"a.sig".as("sa"), $"b.sig".as("sb"))
    val diff = pairs.select(
        graft.functions.minhash_jaccard($"sa", $"sb").as("fused"),
        jaccardComposition($"sa", $"sb").as("composed"))
      .where(not($"fused" <=> $"composed")).count()
    assert(diff == 0)
  }

  test("fused minhash_jaccard matches composition on null / empty / ragged inputs") {
    val rows = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(1L, 9L, 3L))), // partial agreement
      (Some(Seq(1L, 2L, 3L)), Some(Seq(1L, 2L))),     // right shorter
      (Some(Seq(1L, 2L)), Some(Seq(1L, 2L, 3L))),     // left shorter
      (None, Some(Seq(1L, 2L))),                      // null left
      (Some(Seq(1L, 2L)), None),                      // null right
      (None, None)                                    // both null
    ).toDF("sa", "sb")
    val diff = rows.select(
        graft.functions.minhash_jaccard($"sa", $"sb").as("fused"),
        jaccardComposition($"sa", $"sb").as("composed"))
      .where(not($"fused" <=> $"composed")).count()
    assert(diff == 0)
    // empty left array: the old composition raised ANSI DIVIDE_BY_ZERO
    // (a case signatures() can never produce — empty text yields a NULL
    // sig, not an empty array); the kernel is strictly more forgiving
    // and returns NaN. Pin that behavior.
    val nan = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("sa", "sb")
      .select(graft.functions.minhash_jaccard($"sa", $"sb").as("fused")).head()
    assert(nan.getDouble(0).isNaN)
  }

  test("pruned verifyPairs == naive two-full-join verify") {
    for (exact <- Seq(false, true); mode <- Seq("star", "pairs")) {
      val cfg = DedupConfig(candidateMode = mode, exactVerify = exact)
      val sigs = Dedup.signatures(docs, "doc_id", "text", cfg)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sigs.count()
      val cands = Dedup.lshCandidates(sigs, cfg)
      val got = Dedup.verifyPairs(cands, sigs, cfg)
        .select($"id1", $"id2", round($"sim", 9).as("sim"))
      val simCol =
        if (exact) graft.functions.array_jaccard($"a.shingle_hashes", $"b.shingle_hashes")
        else graft.functions.minhash_jaccard($"a.sig", $"b.sig")
      val want = cands
        .join(sigs.as("a"), cands("id1") === $"a.id")
        .join(sigs.as("b"), cands("id2") === $"b.id")
        .select($"id1", $"id2", simCol.as("sim"))
        .where($"sim" >= cfg.threshold)
        .select($"id1", $"id2", round($"sim", 9).as("sim"))
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"verify mismatch at exact=$exact mode=$mode")
      sigs.unpersist()
    }
  }

  test("one-exchange star candidates == definitional per-bucket (min, member) edges") {
    val cfg = DedupConfig(candidateMode = "star")
    val sigs = Dedup.signatures(docs, "doc_id", "text", cfg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sigs.count()
    val got = Dedup.lshCandidates(sigs, cfg)
    // definitional recomputation: the r5 partial-agg groupBy + bucket
    // join shape the one-exchange window form replaced
    val r = cfg.rowsPerBand
    val bandArr = array((0 until cfg.bands).map(b =>
      xxhash64(slice($"sig", b * r + 1, r), lit(b))): _*)
    val bands = sigs.select($"id", posexplode(bandArr).as(Seq("band", "bh")))
    val mins = bands.groupBy($"band", $"bh").agg(min($"id").as("id1"))
    val want = bands.join(mins, Seq("band", "bh"))
      .where($"id" =!= $"id1")
      .select($"id1", $"id".as("id2"))
      .distinct()
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    sigs.unpersist()
  }

  test("best-match min_by aggregation == row_number window top-1 (ties to lowest id2)") {
    import graft.matching.{MatchColumn, MatchOptions, Matching}
    // planted ties: s2 rows 10+i and 110+i normalize identically, so a
    // probe row scores them equally and the lowest id2 must win
    val s1 = (0 until 40).map(i => (i.toLong, s"alpha$i name", f"$i%04d")).toDF("id1", "n1", "v1")
    val s2 = ((0 until 40).map(i => (10 + i.toLong, s"alpha$i name", f"$i%04d")) ++
      (0 until 40).map(i => (110 + i.toLong, s"alpha$i name", f"$i%04d")))
      .toDF("id2", "n2", "v2")
    val mapping = Seq(MatchColumn("n1", "n2", "string_name", 0.6),
      MatchColumn("v1", "v2", "levenshtein", 0.4))
    val opts = MatchOptions(threshold = 0.8, undecidedRange = 0.05,
      earlyTermination = false, cartesianFallbackLimit = 0)
    val got = Matching.matchTables(s1, s2, "id1", "id2", mapping, opts)
    // reference shape: the window the aggregate replaced
    val all = Matching.matchTables(s1, s2, "id1", "id2", mapping,
      opts.copy(returnAllMatches = true, threshold = 0.0, undecidedRange = 0.0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"id1").orderBy($"overall_score".desc, $"id2".asc)
    val want = all.withColumn("_rn", row_number().over(w)).where($"_rn" === 1).drop("_rn")
      .withColumn("match_result",
        Matching.classify($"overall_score", opts.threshold, opts.undecidedRange))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // every probe row resolves to its tie-group's LOWEST id2 (10+i, not 110+i)
    assert(got.where($"id2" >= 110).count() == 0)
  }

  test("heap top-k aggregation == row_number window on every ANN tier's scored shape") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where($"vec_id" % 10 === 0)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    for (k <- Seq(1, 5, 7)) {
      val got = graft.emb.Embeddings.bruteForceTopK(e, q, "vec_id", "embedding", k)
      // the window shape the aggregate replaced
      val qv = q.select($"vec_id".cast("long").as("query_id"), $"embedding".as("_qv"))
      val cv = e.select($"vec_id".cast("long").as("neighbor_id"), $"embedding".as("_cv"))
      val scored = cv.crossJoin(qv).where($"query_id" =!= $"neighbor_id")
        .select($"query_id", $"neighbor_id",
          graft.emb.Embeddings.cosine($"_qv", $"_cv").as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
      val want = scored.withColumn("rank", row_number().over(w)).where($"rank" <= k)
      val g = got.select($"query_id", $"neighbor_id", round($"sim", 9).as("sim"), $"rank")
      val ww = want.select($"query_id", $"neighbor_id", round($"sim", 9).as("sim"), $"rank")
      assert(g.exceptAll(ww).count() == 0 && ww.exceptAll(g).count() == 0, s"mismatch at k=$k")
    }
    // tie behavior: duplicated vectors (sim 1.0 twice) must rank by id asc
    val dup = e.limit(20).select($"vec_id", $"embedding")
      .unionAll(e.limit(20).select(($"vec_id" + 500L).as("vec_id"), $"embedding"))
    val got = graft.emb.Embeddings.bruteForceTopK(
      dup, e.limit(5).select(($"vec_id" + 9000L).as("vec_id"), $"embedding"),
      "vec_id", "embedding", 3)
    val ranks = got.groupBy($"query_id").agg(count(lit(1)).as("n"), min($"rank").as("mn"),
      max($"rank").as("mx")).collect()
    assert(ranks.forall(r => r.getLong(1) == 3 && r.getInt(2) == 1 && r.getInt(3) == 3))
  }

  test("signaturesOfNormalized == signatures over pre-normalized text") {
    for (cfg <- Seq(DedupConfig(), DedupConfig(exactVerify = true),
        DedupConfig(charShingles = true))) {
      val norm = docs.select($"doc_id".cast("long").as("id"),
          Normalizers.normalizeString($"text").as("t"))
        .withColumn("h1", xxhash64($"t"))
        .withColumn("h2", xxhash64($"t", lit(1)))
      val got = Dedup.signaturesOfNormalized(norm, "id", "t", "h1", "h2", cfg)
      val want = Dedup.signatures(
        docs.select($"doc_id", $"text"), "doc_id", "text", cfg)
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"signature mismatch at $cfg")
    }
  }
}
