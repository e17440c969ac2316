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
}
