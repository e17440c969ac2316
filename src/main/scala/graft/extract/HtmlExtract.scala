package graft.extract

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.norm.Normalizers

/** html -> text extraction as a typed Dataset transform (input_hint):
  * decode bytes, drop script/style subtrees, strip tags/entities, then
  * the reference's normalization chain (lower -> trim -> collapse \s+;
  * null -> "") — byte-identical per url to the reference contract
  * (/root/reference/src/data_loader.py:216-227,
  * /root/reference/src/normalizers.py:172-182).
  *
  * Column form for DataFrame pipelines; typed form for Dataset[WebPage].
  */
object HtmlExtract {

  /** Typed row shape of the web-page table (SURVEY §1.2). */
  case class WebPage(page_id: Long, url: String, warc_ts: java.sql.Timestamp,
      html: Array[Byte], text: String, lang: String)

  private val entities = Seq(
    "&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'")

  /** Pure-Column extraction: codegen'd, no UDF. */
  def extractText(html: Column): Column = {
    val decoded = decode(html, "UTF-8")
    val noHead = regexp_replace(decoded, "(?is)<head[^>]*>.*?</head>", " ")
    val noScript = regexp_replace(noHead,
      "(?is)<(script|style)[^>]*>.*?</\\1>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    val unescaped = entities.foldLeft(noTags) { case (acc, (e, r)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(e), r)
    }
    Normalizers.normalizeString(unescaped)
  }

  /** Typed transform over Dataset[WebPage]: re-extract text from html,
    * keeping everything else — the pipeline's first stage.
    */
  def extract(pages: Dataset[WebPage]): Dataset[WebPage] = {
    import pages.sparkSession.implicits._
    pages.toDF()
      .withColumn("text", extractText(col("html")))
      .as[WebPage]
  }

  /** DataFrame form (page_id/url/warc_ts/html/lang preserved). */
  def extractDF(pages: DataFrame): DataFrame =
    pages.withColumn("text", extractText(col("html")))
}
