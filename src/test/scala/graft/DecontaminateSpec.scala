package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{concat, lit}
import graft.dedup.{Dedup, DedupConfig}

/** Cross-corpus decontamination: corpus docs near-dupping a reference
  * (eval) doc are flagged and removed; corpus-INTERNAL near-dups are
  * not decontamination's business and must survive.
  */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits.{StringToColumn => _, _}

  private def mk(tag: String) = (1 to 30).map(i => s"$tag$i").mkString(" ")
  private val cfg = DedupConfig(exactVerify = true)

  private def corpus = (
    (0L to 5L).map(g => (g, mk(s"c$g"))) ++
      Seq((100L, mk("dup")), (101L, mk("dup") + " extra")) // internal near-dup pair
    ).toDF("doc_id", "text")

  private def reference = Seq(
    (900L, mk("c2") + " evaltail"), // near-dups corpus doc 2
    (901L, mk("fresh"))             // matches nothing
  ).toDF("ref_id", "text")

  test("contaminationPairs flags exactly the cross matches") {
    val pairs = Dedup.contaminationPairs(corpus, "doc_id", "text",
      reference, "ref_id", "text", cfg)
    val got = pairs.select($"doc_id", $"ref_id").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 900L)))
    Dedup.release(pairs)
  }

  test("decontaminate drops contaminated docs, keeps internal dups intact") {
    val clean = Dedup.decontaminate(corpus, "doc_id", "text",
      reference, "ref_id", "text", cfg)
    val ids = clean.select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(0L, 1L, 3L, 4L, 5L, 100L, 101L),
      s"expected only doc 2 removed, got $ids")
    assert(clean.columns.toSet == Set("doc_id", "text"))
    Dedup.release(clean)
  }

  test("idCol == refIdCol (both doc_id) works: internal names carry the pair table") {
    val ref2 = reference.withColumnRenamed("ref_id", "doc_id")
    val pairs = Dedup.contaminationPairs(corpus, "doc_id", "text",
      ref2, "doc_id", "text", cfg)
    // collision-proof output naming: the ref side is suffixed
    assert(pairs.columns.toSeq == Seq("doc_id", "doc_id_ref", "sim"))
    val got = pairs.select($"doc_id", $"doc_id_ref").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 900L)))
    Dedup.release(pairs)
    val clean = Dedup.decontaminate(corpus, "doc_id", "text", ref2, "doc_id", "text", cfg)
    assert(clean.select($"doc_id").as[Long].collect().toSet ==
      Set(0L, 1L, 3L, 4L, 5L, 100L, 101L))
    Dedup.release(clean)
  }

  test("probe-broadcast bound: shuffle left_semi fallback gives identical pairs") {
    // cap of 1 forces every candidate set over the bound — the sided
    // verify must switch to the shuffle semi join with no result change
    val bounded = cfg.copy(maxProbeBroadcast = 1L)
    val pairs = Dedup.contaminationPairs(corpus, "doc_id", "text",
      reference, "ref_id", "text", bounded)
    val got = pairs.select($"doc_id", $"ref_id").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 900L)))
    Dedup.release(pairs)
  }

  // ---------------- exact n-gram (GPT-3-style) decontamination ------

  // a 12-word snippet lifted from doc 2 (words 5..16): whole-document
  // jaccard is ~7/25 — far below any dedup threshold — but every one
  // of its 7 6-grams collides with doc 2 (the embedded-contamination
  // case n-gram collision exists for)
  private val snippet = (5 to 16).map(i => s"c2$i").mkString(" ")

  test("ngramContamination reports the embedded snippet with its exact gram count") {
    val ref = Seq((900L, snippet), (901L, mk("fresh"))).toDF("ref_id", "text")
    val got = Dedup.ngramContamination(corpus, "doc_id", "text",
        ref, "ref_id", "text", n = 6)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 900L, 7L)))
  }

  test("ngramDecontaminate honours minShared") {
    val ref = Seq((900L, snippet)).toDF("ref_id", "text")
    val clean = Dedup.ngramDecontaminate(corpus, "doc_id", "text",
      ref, "ref_id", "text", n = 6)
    assert(clean.select($"doc_id").as[Long].collect().toSet ==
      Set(0L, 1L, 3L, 4L, 5L, 100L, 101L))
    // a floor above the snippet's 7 shared grams keeps everything
    val lax = Dedup.ngramDecontaminate(corpus, "doc_id", "text",
      ref, "ref_id", "text", n = 6, minShared = 8)
    assert(lax.count() == corpus.count())
  }

  test("ngram maxGramDf drops corpus-boilerplate grams from the report") {
    val boiler = "share1 share2 share3 share4 share5 share6"
    val corpusB = corpus.select($"doc_id",
      concat($"text", lit(" " + boiler)).as("text"))
    val refB = Seq((902L, "e1 e2 e3 " + boiler)).toDF("ref_id", "text")
    // uncapped: the one pure boilerplate gram pairs every corpus doc
    val all = Dedup.ngramContamination(corpusB, "doc_id", "text",
      refB, "ref_id", "text", n = 6)
    assert(all.count() == corpusB.count())
    // capped: gram df = 8 > 3 -> pulled from the corpus side, no pairs left
    val capped = Dedup.ngramContamination(corpusB, "doc_id", "text",
      refB, "ref_id", "text", n = 6, maxGramDf = 3)
    assert(capped.count() == 0)
  }

  test("ngram report: idCol == refIdCol naming; shuffle-join fallback agrees") {
    val ref2 = Seq((900L, snippet)).toDF("doc_id", "text")
    // maxRefBroadcast = 0 forces the non-broadcast join path
    val pairs = Dedup.ngramContamination(corpus, "doc_id", "text",
      ref2, "doc_id", "text", n = 6, maxRefBroadcast = 0L)
    assert(pairs.columns.toSeq == Seq("doc_id", "doc_id_ref", "shared_ngrams"))
    assert(pairs.as[(Long, Long, Long)].collect().toSet == Set((2L, 900L, 7L)))
  }

  test("no persisted blocks survive after release") {
    // scope the hygiene assertion to RDDs created by THIS test: the
    // session is shared across suites, so a global isEmpty check would
    // flake on suite ordering (r3 verdict: it inherited another suite's
    // leak and blamed this operator)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val clean = Dedup.decontaminate(corpus, "doc_id", "text",
      reference, "ref_id", "text", cfg)
    clean.count()
    Dedup.release(clean)
    // the operator frees its own signature/candidate persists; release
    // drops the checkpointed pair table behind the result
    val leaked = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !before.contains(id)
    }
    assert(leaked.isEmpty, leaked.values.map(_.name).mkString(", "))
  }
}
