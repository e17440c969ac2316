package graft.fixtures

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft._

/** Deterministic Common-Crawl-style page table, synthesized from the
  * driver's documents.parquet (no external data, no wall-clock):
  * (page_id, url, warc_ts, html, text, lang) per BASELINE.json
  * input_hint. `text` is the extraction ground truth: the byte-identical
  * contract is extract(html) == normalize_string(text)
  * (/root/reference/src/data_loader.py:216-227 + normalizers.py:172-182).
  *
  * Planted structure on top of the corpus's own 25 near-dup pairs:
  *  - exact-dup pages (same html, new url) for page_id % 5 == 0
  *  - near-dup pages (one appended token) for page_id % 4 == 0
  */
object WebPages {

  /** 2024-01-01T00:00:00Z, fixed crawl epoch. */
  val CrawlEpoch = 1704067200L

  private def page(pageId: org.apache.spark.sql.Column, text: org.apache.spark.sql.Column,
      lang: org.apache.spark.sql.Column) = Seq(
    pageId.cast("long").as("page_id"),
    concat(lit("https://crawl.example.org/"), lang, lit("/p"), pageId).as("url"),
    timestamp_seconds(lit(CrawlEpoch) + pageId).as("warc_ts"),
    encode(concat(
      lit("<html><head><title>doc </title></head><body>\n<p>"),
      text, lit("</p>\n</body></html>")), "UTF-8").as("html"),
    text.as("text"),
    lang.as("lang"))

  /** Build the page table from a documents-shaped DataFrame
    * (doc_id, text, lang).
    */
  def fromDocuments(docs: DataFrame): DataFrame = {
    val base = docs.select(page($"doc_id", $"text", $"lang"): _*)
    val exactDups = docs.where($"doc_id" % 5 === 0)
      .select(page($"doc_id" + 1000000, $"text", $"lang"): _*)
    val nearDups = docs.where($"doc_id" % 4 === 0)
      .select(page($"doc_id" + 2000000, concat($"text", lit(" zqvxj")), $"lang"): _*)
    base.unionAll(exactDups).unionAll(nearDups)
  }
}
