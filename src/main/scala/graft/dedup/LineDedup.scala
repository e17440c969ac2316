package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft._

/** Corpus-level exact LINE dedup — the boilerplate-removal pass a
  * training-data pipeline runs before document-level near-dup (C4
  * removed any three-sentence span occurring more than once; CCNet
  * dedups paragraphs by hash across shards). Web boilerplate (nav
  * bars, cookie banners, footers) repeats across millions of pages
  * while each page's body is unique — document-level dedup can't
  * remove it (the documents aren't near-dups), so it needs its own
  * operator. The reference has no analogue (its unit is the record,
  * matcher.py scores whole fields); this is a training-data addition.
  *
  * Contract (mirrored by the DuckDB oracle in SparkEntry):
  *  - a "line" is a `\n`-split segment of the text, compared EXACTLY
  *    (no normalization — callers normalize first if they want
  *    case/whitespace-insensitive identity);
  *  - a line whose total occurrence count across the corpus exceeds
  *    `maxDf` is removed from every document EXCEPT its single first
  *    occurrence — first = lowest doc id, then lowest line position
  *    within that doc (deterministic at any partitioning);
  *  - lines that are empty after trimming are structure, not content:
  *    exempt (kept everywhere), or dropped everywhere when
  *    `dropBlank` is set;
  *  - surviving lines are rejoined with `\n` in original order; a
  *    document whose every line was removed keeps its row with an
  *    empty text.
  *
  * Scale shape: one explode, one count+min aggregation on a 128-bit
  * line hash (both map-side combinable — a boilerplate line occurring
  * a billion times reduces through partial aggregates, never
  * materializing as a group), one hash join back (the stats side is
  * one row per DUPLICATED line; a hot line skews exactly one join key,
  * which AQE skew-split handles — same shape as the exact-collapse
  * rejoin), and one per-document reassembly groupBy (collect_list is
  * bounded by a single document's line count, never by a cluster or
  * corpus dimension). Nothing touches the driver.
  */
object LineDedup {

  /** @param maxDf a line is boilerplate when its corpus-wide
    *              occurrence count exceeds this (default 1: any
    *              repeated line collapses to its first occurrence)
    * @param dropBlank remove blank lines entirely instead of keeping
    *              them as exempt structure
    * @return (idCol, textCol) with boilerplate lines removed
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      maxDf: Long = 1L, dropBlank: Boolean = false): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val lines = Dedup.ensureParallel(
        df.select(col(idCol).cast("long").as("_id"), col(textCol).as("_t")))
      // -1 limit: trailing empty segments are positions too — dropping
      // them would shift reassembly for texts ending in '\n'
      .select($"_id", posexplode(split($"_t", "\n", -1)).as(Seq("_pos", "_line")))
      // 128-bit line identity: the corpus-wide aggregation and the
      // rejoin ship 16-byte keys, never line text (a 1 KB boilerplate
      // line occurring 1e9 times would otherwise ride every shuffle)
      .withColumn("_h1", xxhash64($"_line"))
      .withColumn("_h2", xxhash64($"_line", lit(1)))
    val blank = trim($"_line") === ""
    // count + first occurrence in ONE aggregation (partial: count sums,
    // min combines); only duplicated non-blank lines survive the filter,
    // so the join side is as small as the boilerplate vocabulary
    val dups = lines.where(!blank)
      .groupBy($"_h1", $"_h2")
      .agg(count(lit(1)).as("_df"), min(struct($"_id", $"_pos")).as("_first"))
      .where($"_df" > maxDf)
    val dupOk = $"_df".isNull ||
      ($"_id" === $"_first._id" && $"_pos" === $"_first._pos")
    val keep = lines
      .join(dups, Seq("_h1", "_h2"), "left")
      .where(if (dropBlank) !blank && dupOk else blank || dupOk)
    val rebuilt = keep.groupBy($"_id")
      .agg(array_join(transform(array_sort(collect_list(struct($"_pos", $"_line"))),
        s => s("_line")), "\n").as("_out"))
    // left join from the id table: a document whose every line was
    // removed keeps its row (empty text) instead of vanishing
    df.select(col(idCol).cast("long").as("_id"))
      .join(rebuilt, Seq("_id"), "left")
      .select($"_id".as(idCol), coalesce($"_out", lit("")).as(textCol))
  }

  /** Per-line corpus stats — the report a pipeline inspects to pick
    * `maxDf` (how much boilerplate is there, and what does it say):
    * one row per distinct non-blank line with its occurrence count,
    * document frequency, and first occurrence.
    */
  def lineStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("_id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("_pos", "_line")))
      .where(trim($"_line") =!= "")
      .groupBy($"_line")
      .agg(count(lit(1)).as("occurrences"),
        countDistinct($"_id").as("doc_freq"),
        min(struct($"_id", $"_pos")).as("_first"))
      .select($"_line".as("line"), $"occurrences", $"doc_freq",
        $"_first._id".as("first_doc"), $"_first._pos".as("first_pos"))
}
