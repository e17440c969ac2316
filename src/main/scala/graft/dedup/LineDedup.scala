package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale shape: the corpus text never rides a wide shuffle. The
  * exploded lines are projected to (id, pos, 128-bit hash) — 32
  * bytes/line — before any exchange; the count+min aggregation and
  * the dup join move only those rows (both map-side combinable; a hot
  * boilerplate line skews exactly one join key, which AQE skew-split
  * handles); the result is a per-document DROP-POSITION list (one row
  * per document that loses a line), and the text is rebuilt in place
  * by a positional filter expression after one id join against that
  * list — a broadcast join whenever the boilerplate set is small, the
  * common case. Nothing touches the driver.
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
    val docs = df.select(col(idCol).cast("long").as("_id"), col(textCol).as("_t"))
    // The corpus TEXT never rides a wide shuffle: the exploded side is
    // projected down to (_id, _pos, 128-bit line hash) — 32 bytes/line
    // regardless of line length — before anything exchanges, and the
    // reassembly is a per-row Column expression over the original
    // document, not a re-group of exploded lines (the previous shape
    // shipped every line's text through the dup join AND a
    // collect_list groupBy — 2 full-corpus text shuffles; this shape
    // ships text through at most the final id join, which AQE turns
    // into a broadcast whenever the drop-list table is small — the
    // common case: boilerplate vocabulary ≪ corpus).
    // -1 split limit: trailing empty segments are positions too —
    // dropping them would shift reassembly for texts ending in '\n'.
    val lines = Dedup.ensureParallel(docs)
      .select($"_id", posexplode(split($"_t", "\n", -1)).as(Seq("_pos", "_line")))
      .where(trim($"_line") =!= "") // blanks never participate in dedup
      .select($"_id", $"_pos",
        xxhash64($"_line").as("_h1"), xxhash64($"_line", lit(1)).as("_h2"))
    // count + first occurrence in ONE aggregation (partial: count sums,
    // min combines — a boilerplate line occurring 1e9 times reduces
    // through combine chains, never materializing as a group); only
    // duplicated lines survive, so the join side is as small as the
    // boilerplate vocabulary
    val dups = lines
      .groupBy($"_h1", $"_h2")
      .agg(count(lit(1)).as("_df"), min(struct($"_id", $"_pos")).as("_first"))
      .where($"_df" > maxDf)
      .select($"_h1", $"_h2", $"_first")
    // positions to remove, per document — one row per doc that LOSES a
    // line (a hot boilerplate line skews the (_h1,_h2) join key; the
    // dups side is one row per key, which AQE skew-split handles)
    val drops = lines.join(dups, Seq("_h1", "_h2"))
      .where($"_id" =!= $"_first._id" || $"_pos" =!= $"_first._pos")
      .groupBy($"_id").agg(collect_set($"_pos").as("_drop"))
    // rebuild in place: re-split the original text and keep by position
    // (the lambda filter's index argument), blanks exempt or dropped
    val dropSet = coalesce($"_drop", array().cast("array<int>"))
    val keepLine = (l: Column, i: Column) =>
      if (dropBlank) trim(l) =!= "" && !array_contains(dropSet, i)
      else trim(l) === "" || !array_contains(dropSet, i)
    docs.join(drops, Seq("_id"), "left")
      .select($"_id".as(idCol),
        array_join(filter(split($"_t", "\n", -1), keepLine), "\n").as(textCol))
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
