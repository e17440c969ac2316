package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import graft.matching.MatchColumn

/** Driver-side semantic column typing + auto-mapping, mirroring the
  * reference analyzer (/root/reference/src/column_analyzer.py): Spark
  * dtype first, then regex/heuristic vote over a 100-row sample.
  * Runs once per job on a tiny sample — deliberately NOT distributed.
  */
object ColumnAnalyzer {

  val ColumnTypes: Seq[String] =
    Seq("string_name", "string_general", "numeric", "date", "email", "phone")

  /** ALGORITHM_MAP (column_analyzer.py:23-30). */
  val AlgorithmMap: Map[String, String] = Map(
    "string_name" -> "jaro_winkler",
    "string_general" -> "levenshtein",
    "numeric" -> "numeric",
    "date" -> "date",
    "email" -> "token_set",
    "phone" -> "token_set")

  private val emailRe = "^[\\w.+-]+@[\\w-]+\\.[\\w.-]+$".r
  private val phoneRe = "^[\\d\\s()+.-]{7,}$".r
  private val dateRes = Seq(
    "^\\d{4}[-/.]\\d{1,2}[-/.]\\d{1,2}.*$".r,
    "^\\d{1,2}[-/.]\\d{1,2}[-/.]\\d{4}$".r,
    "^\\d{8}$".r)
  private val nameColKeywords =
    Seq("name", "first", "last", "surname", "given", "middle")
  private val commonFirstNames = Set(
    "james", "mary", "john", "patricia", "robert", "jennifer", "michael", "linda",
    "william", "elizabeth", "david", "barbara", "richard", "susan", "joseph", "jessica",
    "thomas", "sarah", "charles", "karen", "bob", "bill", "mike", "jim", "tom", "liz",
    "dave", "rick", "joe", "jen")

  /** 6-way semantic type for one column (column_analyzer.py:33-119):
    * dtype shortcut, then sampled heuristics with the reference's vote
    * thresholds.
    */
  def detectColumnType(df: DataFrame, column: String, sampleSize: Int = 100): String = {
    val field = df.schema(column)
    field.dataType match {
      case _: NumericType => return "numeric"
      case _: DateType | _: TimestampType => return "date"
      case _ =>
    }
    val sample = df.select(column).na.drop().limit(sampleSize)
      .collect().map(_.get(0).toString.trim).filter(_.nonEmpty)
    detectSampleType(sample.toSeq, column)
  }

  /** Semantic type of a single literal value (search-mode query
    * records): the reference types each query FIELD independently of
    * the master column so a differently-shaped query value picks its
    * own kernel before the pair falls back (column_analyzer.py:241-290,
    * via detect_column_type over a one-row frame).
    */
  def detectValueType(value: String, name: String = "", isJsonNumber: Boolean = false): String = {
    val v = Option(value).map(_.trim).getOrElse("")
    if (isJsonNumber) "numeric" // pd.DataFrame types a JSON number numerically
    else if (v.isEmpty) "string_general"
    else detectSampleType(Seq(v), name)
  }

  /** Shared sampled heuristics with the reference's vote thresholds
    * (column_analyzer.py:33-119).
    */
  private def detectSampleType(sample: Seq[String], column: String): String = {
    if (sample.isEmpty) return "string_general"
    val n = sample.length.toDouble

    def frac(p: String => Boolean): Double = sample.count(p) / n

    if (frac(s => emailRe.findFirstIn(s).isDefined) > 0.5) return "email"
    val digitsAvg = sample.map(_.count(_.isDigit)).sum / n
    if (frac(s => phoneRe.findFirstIn(s).isDefined && s.count(_.isDigit) >= 7) > 0.5 ||
      (digitsAvg >= 7 && frac(s => s.forall(c => !c.isLetter)) > 0.5)) return "phone"
    if (frac(s => dateRes.exists(_.findFirstIn(s).isDefined)) > 0.5) return "date"

    val colLower = column.toLowerCase
    val nameByHeader = nameColKeywords.exists(colLower.contains)
    val titleCase = frac(s => s.split("\\s+").forall(w =>
      w.nonEmpty && w.head.isUpper && w.drop(1).forall(c => !c.isUpper)))
    val knownFirst = frac(s =>
      commonFirstNames.contains(s.split("\\s+").head.toLowerCase))
    if (nameByHeader || titleCase > 0.6 || knownFirst > 0.3) return "string_name"
    "string_general"
  }

  /** Column-pair plan: explicit mappings (validated against both
    * schemas) or auto-pairing of identically-named columns; a type
    * disagreement falls back to string_general
    * (column_analyzer.py:132-190).
    */
  def analyzeColumns(s1: DataFrame, s2: DataFrame,
      explicit: Seq[(String, String, Double)] = Nil): Seq[MatchColumn] = {
    val pairs =
      if (explicit.nonEmpty) {
        explicit.foreach { case (c1, c2, _) =>
          require(s1.columns.contains(c1), s"Column '$c1' not found in source1")
          require(s2.columns.contains(c2), s"Column '$c2' not found in source2")
        }
        explicit
      } else {
        s1.columns.filter(s2.columns.contains).map(c => (c, c, 1.0)).toSeq
      }
    pairs.map { case (c1, c2, w) =>
      val t1 = detectColumnType(s1, c1)
      val t2 = detectColumnType(s2, c2)
      val t = if (t1 == t2) t1 else "string_general"
      MatchColumn(c1, c2, t, w)
    }
  }

  /** Query-key to master-column auto-mapping for search mode
    * (column_analyzer.py:193-238): exact lowercase, then substring,
    * then char-set overlap > 0.3.
    */
  def autoDetectQueryMappings(queryKeys: Seq[String], masterCols: Seq[String]): Map[String, String] = {
    val lowerMaster = masterCols.map(c => c.toLowerCase -> c).toMap
    queryKeys.flatMap { qk =>
      val ql = qk.toLowerCase
      val exact = lowerMaster.get(ql)
      val sub = masterCols.find(m =>
        m.toLowerCase.contains(ql) || ql.contains(m.toLowerCase))
      val overlap = masterCols.find { m =>
        val a = ql.toSet; val b = m.toLowerCase.toSet
        val inter = a.intersect(b).size.toDouble
        val uni = a.union(b).size.toDouble
        uni > 0 && inter / uni > 0.3
      }
      exact.orElse(sub).orElse(overlap).map(qk -> _)
    }.toMap
  }
}
