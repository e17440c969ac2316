package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.config.JobConfig

/** Config parsing mirrors the reference's validator semantics
  * (/root/reference/src/config_validator.py:176-314 and
  * tests/test_integration.py:25-32).
  */
class JobConfigSpec extends AnyFunSuite {

  test("matching config parses with defaults") {
    val cfg = JobConfig.parse(
      """{"source1": "a.csv", "source2": "b.csv", "output": "out.csv",
        | "match_config": {"columns": [
        |   {"source1": "name", "source2": "full_name", "weight": 0.3}],
        |  "threshold": 0.8}}""".stripMargin)
    assert(cfg.mode == "matching")
    assert(cfg.source1.get.path.contains("a.csv"))
    assert(cfg.matchConfig.threshold == 0.8)
    assert(cfg.matchConfig.undecidedRange == 0.05)
    assert(cfg.matchConfig.columns.head.source2.contains("full_name"))
  }

  test("matcher/clusterer knobs parse with reference keys and defaults") {
    val cfg = JobConfig.parse(
      """{"source1": "a.csv", "source2": "b.csv", "output": "out.csv",
        | "match_config": {"max_block_size": 500, "skip_high_cardinality": false,
        |   "max_candidates": 100, "candidate_trim_strategy": "fallback",
        |   "early_termination": false}}""".stripMargin)
    assert(cfg.matchConfig.maxBlockSize == 500)
    assert(!cfg.matchConfig.skipHighCardinality)
    assert(cfg.matchConfig.maxCandidates == 100)
    assert(cfg.matchConfig.candidateTrimStrategy == "fallback")
    assert(!cfg.matchConfig.earlyTermination)
    val cl = JobConfig.parse(
      """{"mode": "clustering", "source1": "a.csv", "output": "o",
        | "cluster_config": {"use_blocking": false, "max_block_size": 200}}""".stripMargin)
    assert(!cl.clusterConfig.useBlocking)
    assert(cl.clusterConfig.maxBlockSize == 200)
    assert(cl.clusterConfig.skipHighCardinality)
    // defaults (matcher.py:390-400)
    val d = JobConfig.parse("""{"source1": "a.csv", "source2": "b.csv", "output": "o"}""")
    assert(d.matchConfig.maxBlockSize == 0 && d.matchConfig.earlyTermination &&
      d.matchConfig.candidateTrimStrategy == "truncate" && d.clusterConfig.useBlocking)
  }

  test("cluster scale knobs: candidate_mode and max_band_bucket parse and validate") {
    val cl = JobConfig.parse(
      """{"mode": "clustering", "source1": "a.csv", "output": "o",
        | "cluster_config": {"candidate_mode": "star", "max_band_bucket": 1000}}""".stripMargin)
    assert(cl.clusterConfig.candidateMode == "star")
    assert(cl.clusterConfig.maxBandBucket.contains(1000))
    // defaults: pairs mode, band-bucket cap falls back to max_block_size
    val d = JobConfig.parse(
      """{"mode": "clustering", "source1": "a.csv", "output": "o"}""")
    assert(d.clusterConfig.candidateMode == "pairs")
    assert(d.clusterConfig.maxBandBucket.isEmpty)
    val e = intercept[IllegalArgumentException] {
      JobConfig.parse(
        """{"mode": "clustering", "source1": "a.csv", "output": "o",
          | "cluster_config": {"candidate_mode": "ring"}}""".stripMargin)
    }
    assert(e.getMessage.contains("candidate_mode"))
  }

  test("config-driven clustering runs end-to-end in star mode (CLI smoke)") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("starcfg")
    val src = dir.resolve("docs.parquet").toString
    // two near-dup trios + singletons: star topology must cluster them
    // identically to pairs mode
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    (Seq((1L, base), (2L, base + " x"), (3L, base + " y"),
      (10L, "one two three four five six seven eight nine ten"),
      (11L, "one two three four five six seven eight nine ten k"),
      (20L, "unrelated totally different words entirely here now then")))
      .toDF("id", "text").write.parquet(src)
    val out = dir.resolve("clusters.parquet").toString
    val cfgPath = dir.resolve("cfg.json")
    java.nio.file.Files.writeString(cfgPath,
      s"""{"mode": "clustering", "source1": "$src", "output": "$out",
         | "cluster_config": {"threshold": 0.5, "candidate_mode": "star",
         |   "max_band_bucket": 100,
         |   "columns": [{"source1": "text", "weight": 1.0}]}}""".stripMargin)
    Main.runConfig(spark, cfgPath.toString)
    val got = spark.read.parquet(out).select("id", "cluster_id").as[(Long, Long)]
      .collect().toMap
    assert(got(1L) == got(2L) && got(2L) == got(3L), "first trio clusters together")
    assert(got(10L) == got(11L), "second pair clusters together")
    assert(got(20L) != got(1L) && got(20L) != got(10L), "singleton stays apart")
  }

  test("decontaminate mode: parse, dependency checks, end-to-end run") {
    // dependency checks
    val e1 = intercept[IllegalArgumentException] {
      JobConfig.parse("""{"mode": "decontaminate", "source1": "a.csv", "output": "o"}""")
    }
    assert(e1.getMessage.contains("decontaminate mode requires source2"))
    val e2 = intercept[IllegalArgumentException] {
      JobConfig.parse("""{"mode": "decontaminate", "source2": "r.csv", "output": "o"}""")
    }
    assert(e2.getMessage.contains("decontaminate mode requires source1"))

    // e2e: corpus doc 2 near-dups the eval set and must be dropped;
    // the corpus-internal near-dup pair (100, 101) must survive
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("deconcfg")
    def mk(tag: String) = (1 to 30).map(i => s"$tag$i").mkString(" ")
    val corpusPath = dir.resolve("corpus.parquet").toString
    ((0L to 5L).map(g => (g, mk(s"c$g"))) ++
      Seq((100L, mk("dup")), (101L, mk("dup") + " extra")))
      .toDF("id", "text").write.parquet(corpusPath)
    val refPath = dir.resolve("ref.parquet").toString
    Seq((900L, mk("c2") + " evaltail"), (901L, mk("fresh")))
      .toDF("id", "text").write.parquet(refPath)
    val out = dir.resolve("clean.parquet").toString
    val cfgPath = dir.resolve("cfg.json")
    java.nio.file.Files.writeString(cfgPath,
      s"""{"mode": "decontaminate", "source1": "$corpusPath",
         | "source2": "$refPath", "output": "$out",
         | "cluster_config": {"threshold": 0.8,
         |   "columns": [{"source1": "text", "weight": 1.0}]}}""".stripMargin)
    Main.runConfig(spark, cfgPath.toString)
    val ids = spark.read.parquet(out).select("id").as[Long].collect().toSet
    assert(ids == Set(0L, 1L, 3L, 4L, 5L, 100L, 101L), s"got $ids")
  }

  test("decontaminate decon_method: ngram — validation + e2e embedded-snippet removal") {
    val bad = intercept[IllegalArgumentException] {
      JobConfig.parse("""{"mode": "decontaminate", "source1": "a.csv", "source2": "r.csv",
        "output": "o", "cluster_config": {"decon_method": "bogus"}}""")
    }
    assert(bad.getMessage.contains("decon_method"))

    // eval doc = a 12-word snippet of corpus doc 2 (words 5..16):
    // whole-document jaccard stays far below the 0.8 minhash threshold,
    // so ONLY the ngram method may drop doc 2
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("deconngramcfg")
    def mk(tag: String) = (1 to 30).map(i => s"$tag$i").mkString(" ")
    val corpusPath = dir.resolve("corpus.parquet").toString
    (0L to 5L).map(g => (g, mk(s"c$g")))
      .toDF("id", "text").write.parquet(corpusPath)
    val refPath = dir.resolve("ref.parquet").toString
    Seq((900L, (5 to 16).map(i => s"c2$i").mkString(" ")))
      .toDF("id", "text").write.parquet(refPath)
    val out = dir.resolve("clean.parquet").toString
    val cfgPath = dir.resolve("cfg.json")
    java.nio.file.Files.writeString(cfgPath,
      s"""{"mode": "decontaminate", "source1": "$corpusPath",
         | "source2": "$refPath", "output": "$out",
         | "cluster_config": {"decon_method": "ngram", "decon_ngram_n": 6,
         |   "columns": [{"source1": "text", "weight": 1.0}]}}""".stripMargin)
    Main.runConfig(spark, cfgPath.toString)
    val ids = spark.read.parquet(out).select("id").as[Long].collect().toSet
    assert(ids == Set(0L, 1L, 3L, 4L, 5L), s"got $ids")
  }

  test("clustering c4_filter: true drops junk pages before clustering") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("c4cfg")
    val src = dir.resolve("docs.parquet").toString
    val good = "A first proper sentence with enough words here.\n" +
      "A second proper sentence with enough words too!\n" +
      "A third proper sentence closing out the page?"
    Seq((1L, good), (2L, good + "\nAn extra fourth sentence only this page has."),
      (3L, "junk { page with no sentences"))
      .toDF("id", "text").write.parquet(src)
    val out = dir.resolve("clusters.parquet").toString
    val cfgPath = dir.resolve("cfg.json")
    java.nio.file.Files.writeString(cfgPath,
      s"""{"mode": "clustering", "source1": "$src", "output": "$out",
         | "cluster_config": {"threshold": 0.5, "c4_filter": true,
         |   "columns": [{"source1": "text", "weight": 1.0}]}}""".stripMargin)
    Main.runConfig(spark, cfgPath.toString)
    val got = spark.read.parquet(out)
    val ids = got.select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L), s"junk page must be filtered before clustering, got $ids")
    // the two surviving near-identical pages still cluster together
    val clusters = got.select("cluster_id").distinct().count()
    assert(clusters == 1L)
  }

  test("clustering gopher_filter: true drops low-quality docs before clustering") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gophercfg")
    val src = dir.resolve("docs.parquet").toString
    // passes every Gopher rule at gopher_min_words=10
    val good = "the quick brown fox jumps over the lazy dog and that was it to be of note with zeal"
    Seq((1L, good), (2L, good + " extra tail"),
      (3L, "• one\n• two\n• three"),              // all-bullet page: dropped
      (4L, "zebra quokka wombat ibis lemur gecko owl puma lynx orca newt koala")) // no stopwords
      .toDF("id", "text").write.parquet(src)
    val out = dir.resolve("clusters.parquet").toString
    val cfgPath = dir.resolve("cfg.json")
    java.nio.file.Files.writeString(cfgPath,
      s"""{"mode": "clustering", "source1": "$src", "output": "$out",
         | "cluster_config": {"threshold": 0.5, "gopher_filter": true,
         |   "gopher_min_words": 10,
         |   "columns": [{"source1": "text", "weight": 1.0}]}}""".stripMargin)
    Main.runConfig(spark, cfgPath.toString)
    val got = spark.read.parquet(out)
    val ids = got.select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L), s"low-quality pages must drop before clustering, got $ids")
    assert(got.select("cluster_id").distinct().count() == 1L)
  }

  test("clustering canonical: true writes the survivor corpus next to the clusters") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("canoncfg")
    val src = dir.resolve("docs.parquet").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq((1L, base), (2L, base + " longertail"),
      (20L, "unrelated totally different words entirely here now then"))
      .toDF("id", "text").write.parquet(src)
    val out = dir.resolve("clusters.parquet").toString
    val cfgPath = dir.resolve("cfg.json")
    java.nio.file.Files.writeString(cfgPath,
      s"""{"mode": "clustering", "source1": "$src", "output": "$out",
         | "cluster_config": {"threshold": 0.5, "canonical": true,
         |   "columns": [{"source1": "text", "weight": 1.0}]}}""".stripMargin)
    Main.runConfig(spark, cfgPath.toString)
    val canon = spark.read.parquet(out + "_canonical")
    val ids = canon.select("id").as[Long].collect().toSet
    // survivor of the near-dup pair = the longer text (id 2); singleton kept
    assert(ids == Set(2L, 20L), s"got $ids")
    assert(canon.columns.toSet == Set("id", "text", "cluster_id", "cluster_size"))
  }

  test("clustering line_dedup: true strips boilerplate before near-dup") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("linecfg")
    val src = dir.resolve("docs.parquet").toString
    // two UNRELATED bodies whose texts are dominated by identical
    // boilerplate lines: with the boilerplate in, they are near-dups;
    // line_dedup removes it corpus-wide, so they must NOT cluster
    val boiler = "HOME ABOUT CONTACT PRIVACY TERMS COOKIES SITEMAP HELP FAQ LOGIN\nall rights reserved by the site operator worldwide every year"
    Seq((1L, s"$boiler\nalpha beta gamma"), (2L, s"$boiler\ndelta epsilon zeta"))
      .toDF("id", "text").write.parquet(src)
    val out = dir.resolve("clusters.parquet").toString
    def run(lineDedup: Boolean): Map[Long, Long] = {
      val cfgPath = dir.resolve(s"cfg_$lineDedup.json")
      java.nio.file.Files.writeString(cfgPath,
        s"""{"mode": "clustering", "source1": "$src", "output": "$out",
           | "cluster_config": {"threshold": 0.5, "line_dedup": $lineDedup,
           |   "columns": [{"source1": "text", "weight": 1.0}]}}""".stripMargin)
      Main.runConfig(spark, cfgPath.toString)
      spark.read.parquet(out)
        .select(org.apache.spark.sql.functions.col("id").cast("long"),
          org.apache.spark.sql.functions.col("cluster_id"))
        .as[(Long, Long)].collect().toMap
    }
    val without = run(lineDedup = false)
    assert(without(1L) == without(2L), "boilerplate-dominated docs should cluster without line_dedup")
    val withLd = run(lineDedup = true)
    assert(withLd(1L) != withLd(2L), "line_dedup must strip the shared lines so unrelated bodies do not cluster")
  }

  test("mode dependency errors match the reference text") {
    val e1 = intercept[IllegalArgumentException] {
      JobConfig.parse("""{"mode": "clustering", "source1": "a.csv", "source2": "b.csv", "output": "o"}""")
    }
    assert(e1.getMessage.contains("clustering mode does not require source2"))
    val e2 = intercept[IllegalArgumentException] {
      JobConfig.parse("""{"mode": "search", "source2": "m.csv", "source1": "q.csv", "output": "o"}""")
    }
    assert(e2.getMessage.contains("search mode does not require source1"))
    val e3 = intercept[IllegalArgumentException] {
      JobConfig.parse("""{"source1": "a.csv", "output": "o"}""")
    }
    assert(e3.getMessage.contains("matching mode requires source2"))
  }

  test("env interpolation with defaults (config_validator.py:282-314)") {
    val cfg = JobConfig.parse(
      """{"source1": "${GRAFT_TEST_SRC:fallback.csv}", "source2": "b.csv", "output": "${GRAFT_TEST_OUT:o.csv}"}""",
      env = Map.empty)
    assert(cfg.source1.get.path.contains("fallback.csv"))
    val e = intercept[IllegalArgumentException] {
      JobConfig.parse("""{"source1": "${GRAFT_MISSING_VAR}", "source2": "b", "output": "o"}""",
        env = Map.empty)
    }
    assert(e.getMessage.contains("Environment variable 'GRAFT_MISSING_VAR' not found"))
  }

  test("jdbc table specs") {
    val cfg = JobConfig.parse(
      """{"source1": {"table": "people", "host": "h", "user": "u", "password": "p", "database": "d"},
        | "source2": "b.csv", "output": "o.csv"}""".stripMargin)
    assert(cfg.source1.get.isJdbc)
    assert(cfg.source1.get.table.contains("people"))
  }

  test("table-vs-path heuristic: remote/extensionless paths never route to JDBC") {
    // with mysql_credentials present, a bare name is a table, but any
    // URI scheme or path separator marks a dataset path — Files.exists
    // checks the driver's LOCAL fs and can never see cluster paths
    val cfg = JobConfig.parse(
      """{"source1": "people", "source2": "hdfs:///data/pages",
        | "output": "o.csv", "mysql_credentials":
        | {"host": "h", "user": "u", "password": "p", "database": "d"}}""".stripMargin)
    assert(cfg.source1.get.isJdbc, "bare name + creds is a table")
    assert(cfg.source2.get.path.contains("hdfs:///data/pages"),
      "an hdfs:// URI must stay a path even with creds configured")
    val cfg2 = JobConfig.parse(
      """{"source1": "people", "source2": "data/extensionless_dir",
        | "output": "o.csv", "mysql_credentials":
        | {"host": "h", "user": "u", "password": "p", "database": "d"}}""".stripMargin)
    assert(cfg2.source2.get.path.contains("data/extensionless_dir"),
      "a relative path with a separator must stay a path")
  }

  test("threshold bounds enforced") {
    val e = intercept[IllegalArgumentException] {
      JobConfig.parse(
        """{"source1": "a", "source2": "b", "output": "o",
          | "match_config": {"threshold": 1.5}}""".stripMargin)
    }
    assert(e.getMessage.contains("threshold"))
  }

  test("search config runs end-to-end through Main.runConfig") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("searchcfg")
    val master = dir.resolve("master.parquet").toString
    Seq((1L, "Robert Johnson", 42.0), (2L, "Mary Smith", 7.0), (3L, "Robert Johnstone", 9.0))
      .toDF("id", "name", "score").write.parquet(master)
    val out = dir.resolve("hits.parquet").toString
    val cfgPath = dir.resolve("cfg.json")
    java.nio.file.Files.writeString(cfgPath,
      s"""{"mode": "search", "source2": "$master", "output": "$out",
         | "match_config": {"columns": [{"source1": "name", "source2": "name", "weight": 1.0}],
         |  "threshold": 0.6}}""".stripMargin)
    Main.runConfig(spark, cfgPath.toString,
      Map("query" -> """{"name": "Robert Johnson"}"""))
    val hits = spark.read.parquet(out).orderBy(org.apache.spark.sql.functions.desc("overall_score"))
      .select("id").as[Long].collect().toSeq
    assert(hits.head == 1L, s"exact hit must rank first, got $hits")
    assert(hits.contains(3L), "near variant above threshold must be returned")
    assert(!hits.contains(2L), "unrelated row below threshold must be filtered")
  }

  test("search query values are typed independently of the master column") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // master 'contact' column holds emails -> detected 'email'; the
    // query value is a phone-shaped string -> pair falls back to
    // string_general instead of scoring a phone against the email kernel
    val master = Seq((1L, "bob@example.com"), (2L, "sue@example.com")).toDF("id", "contact")
    val fields = Main.searchFields(master,
      Map("contact" -> ("555-123-4567", false)), Nil)
    assert(fields.map(f => (f.col, f.colType)) == Seq(("contact", "string_general")))
    // agreeing types keep the specific kernel
    val fields2 = Main.searchFields(master,
      Map("contact" -> ("ann@example.com", false)), Nil)
    assert(fields2.map(_.colType) == Seq("email"))
    // JSON numbers type as numeric like the reference's one-row frame
    val m2 = Seq((1L, 10.0)).toDF("id", "amount")
    val fields3 = Main.searchFields(m2, Map("amount" -> ("12", true)), Nil)
    assert(fields3.map(_.colType) == Seq("numeric"))
  }
}
