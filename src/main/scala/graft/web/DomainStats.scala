package graft.web

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft._
import graft.norm.Normalizers

/** Per-domain corpus report — the table a crawl pipeline filters and
  * weights by (domain-level dup rate and volume drive blocklists and
  * sampling temperature; per-PAGE decisions don't see that a whole
  * host is templated boilerplate). The reference reports per-run
  * match statistics only (matcher.py summary counters); the domain
  * axis is a training-data addition over the web-page input shape
  * (url column, BASELINE.json input_hint).
  *
  * Scale shape: one projection (urlHost is a codegen'd regex
  * composition) + one groupBy(domain) with map-side partial
  * aggregation — a mega-domain reduces through combine chains. The
  * dup fraction needs distinct clusters per domain; countDistinct
  * expands to the standard two-phase distinct aggregate, still
  * partial-combinable on (domain, cluster_id).
  */
object DomainStats {

  /** Report over a CLUSTERED page table (any frame with a url column
    * and a cluster id column, e.g. `WebDedup.run`'s output or
    * `Dedup.nearDupClusters` over extracted pages).
    *
    * @return one row per domain: pages, distinct clusters, dup_fraction
    *         (1 - clusters/pages: the share of pages that are redundant
    *         within their domain's clusters), mean_text_len when a
    *         text column is present (NULL otherwise — the report stays
    *         schema-stable so sinks don't fork on input shape)
    */
  def report(clustered: DataFrame, urlCol: String = "url",
      clusterCol: String = "cluster_id"): DataFrame = {
    val textLen: Column =
      if (clustered.columns.contains("text")) length(col("text")).cast("double")
      else lit(null).cast("double")
    clustered
      .select(Normalizers.urlHost(col(urlCol)).as("domain"),
        col(clusterCol).as("_c"), textLen.as("_len"))
      .groupBy($"domain")
      .agg(
        count(lit(1)).as("pages"),
        countDistinct($"_c").as("clusters"),
        round(lit(1.0) - countDistinct($"_c").cast("double") / count(lit(1)), 6)
          .as("dup_fraction"),
        round(avg($"_len"), 6).as("mean_text_len"))
  }

  /** Corpus mixture report — the table a pretraining data recipe is
    * written against: per (grouping columns, e.g. source x lang) docs,
    * whitespace tokens, characters, and each measure's share of the
    * corpus total. Token counts drive mixture weights ("p% of training
    * tokens from source X"), so the report counts tokens, not rows.
    *
    * Scale shape: one codegen'd projection (token/char counts fuse
    * into the scan) + one partial-aggregated groupBy; the share
    * denominators reuse the SAME aggregate rows via a single-row
    * cross join (broadcast — no second corpus scan, no window over
    * the whole table).
    */
  def mixReport(df: DataFrame, textCol: String, groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "mixReport needs at least one grouping column")
    val norm = Normalizers.normalizeString(col(textCol))
    val perGroup = df
      .select(groupCols.map(col) :+
        graft.text.TextAnalysis.wsTokenCount(norm).cast("long").as("_toks") :+
        length(col(textCol)).cast("long").as("_chars"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("docs"),
        sum($"_toks").as("tokens"),
        sum($"_chars").as("chars"))
    val totals = broadcast(perGroup.agg(
      sum($"docs").as("_td"), sum($"tokens").as("_tt"), sum($"chars").as("_tc")))
    perGroup.crossJoin(totals)
      .select(groupCols.map(col) ++ Seq(
        $"docs", $"tokens", $"chars",
        round($"docs".cast("double") / $"_td", 6).as("doc_share"),
        round($"tokens".cast("double") / $"_tt", 6).as("token_share"),
        round($"chars".cast("double") / $"_tc", 6).as("char_share")): _*)
  }
}
