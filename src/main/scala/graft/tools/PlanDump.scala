package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, DedupConfig}
import graft.matching.{MatchColumn, MatchOptions, Matching}

/** Dev probe: dump `.explain("formatted")` for SparkEntry queries and
  * the bench-path dataframes to files (the plans/r06 evidence the
  * optimization round commits).
  *
  *   runMain graft.tools.PlanDump <outDir> [sfDir] [name ...]
  *
  * With no names: dumps the bench headline query set plus the bench
  * match/ANN/dedup-edge paths. Special names (not SparkEntry queries):
  * match_scored, match_shortcut, ann_brute, ann_ivf, web_dedup_edges.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("dedup_minhash_clusters", "dedup_exact", "dedup_lines",
        "dedup_ngram_jaccard", "ann_topk", "text_stats", "q_lineitem_agg",
        "q_orders_best", "match_scored", "ann_brute", "web_dedup_edges")
    Files.createDirectories(Paths.get(outDir))
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def matchSides(n: Int): (DataFrame, DataFrame, Seq[MatchColumn]) = {
      val firsts = Seq("james", "mary", "robert", "patricia", "john")
      val lasts = Seq("smith", "johnson", "williams", "brown", "jones")
      def fixture = {
        val f = element_at(typedLit(firsts), (pmod(xxhash64(col("id"), lit(1)), lit(5)) + 1).cast("int"))
        val l = element_at(typedLit(lasts), (pmod(xxhash64(col("id"), lit(2)), lit(5)) + 1).cast("int"))
        spark.range(n.toLong).select(col("id"),
          concat(f, lit(" "), l).as("name"),
          concat(f, lit("."), l, lit("@example.com")).as("email"),
          lpad(pmod(xxhash64(col("id"), lit(3)), lit(10000000000L)).cast("string"), 10, "0").as("phone"))
      }
      val s1 = fixture.withColumnRenamed("id", "id1")
      val s2 = fixture.select(col("id").as("id2"), col("name").as("name2"),
        col("email").as("email2"), col("phone").as("phone2"))
      (s1, s2, Seq(
        MatchColumn("name", "name2", "string_name", 0.4),
        MatchColumn("email", "email2", "email", 0.3),
        MatchColumn("phone", "phone2", "phone", 0.3)))
    }

    def frame(name: String): DataFrame = name match {
      case "match_scored" =>
        val (s1, s2, mapping) = matchSides(10000)
        Matching.matchTables(s1, s2, "id1", "id2", mapping,
          MatchOptions(threshold = 0.85, undecidedRange = 0.05,
            blockingStrategies = Seq("first_char", "three_gram"),
            earlyTermination = false))
      case "match_shortcut" =>
        val (s1, s2, mapping) = matchSides(10000)
        Matching.matchTables(s1, s2, "id1", "id2", mapping,
          MatchOptions(threshold = 0.85, undecidedRange = 0.05,
            blockingStrategies = Seq("first_char", "three_gram"),
            earlyTermination = true))
      case "ann_brute" =>
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val q = emb.where(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 1000000000000L).as("vec_id"), col("embedding"))
        graft.emb.Embeddings.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
      case "web_dedup_edges" =>
        val cfg = DedupConfig(candidateMode = "star")
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val sigs = Dedup.signatures(docs, "doc_id", "text", cfg)
        Dedup.verifyPairs(Dedup.lshCandidates(sigs, cfg), sigs, cfg)
      case q => graft.SparkEntry.queries(q)(spark, sfDir)
    }

    names.foreach { name =>
      try {
        val df = frame(name)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
        println(s"[plan-dump] wrote $outDir/$name.txt")
      } catch { case e: Throwable =>
        println(s"[plan-dump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
