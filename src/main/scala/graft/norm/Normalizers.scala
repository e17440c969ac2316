package graft.norm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level normalizers with the reference's semantics
  * (/root/reference/src/normalizers.py). All pure built-in compositions
  * (regexp/case/map ops), fully codegen'd.
  */
object Normalizers {

  /** Null/"nan"-safe string view: null -> "". Mirrors the reference's
    * NaN -> '' load-time coercion (data_loader.py:216-227).
    */
  def safe(c: Column): Column = coalesce(c.cast("string"), lit(""))

  /** Generic normalization: lowercase, strip, collapse whitespace
    * (normalizers.py:172-177). This is also the byte-identical extracted
    * -text contract for the web-page pipeline. Collapse runs BEFORE
    * trim because Spark's trim strips only ' ' while Python's strip()
    * takes all whitespace — collapse-then-trim is equivalent to
    * Python's strip-then-collapse for every input.
    */
  def normalizeString(c: Column): Column =
    trim(regexp_replace(lower(safe(c)), "\\s+", " "))

  /** Email: lowercase + trim (normalizers.py:159-164). */
  def normalizeEmail(c: Column): Column = lower(trim(safe(c)))

  /** Phone: strip non-digits; drop leading '1' from 11-digit numbers
    * (normalizers.py:8-18).
    */
  def normalizePhone(c: Column): Column = {
    val digits = regexp_replace(safe(c), "\\D", "")
    when(length(digits) === 11 && digits.startsWith("1"), expr_substr(digits))
      .otherwise(digits)
  }
  private def expr_substr(c: Column): Column = c.substr(lit(2), length(c) - 1)

  /** Address: lowercase, expand abbreviations (word-bounded), strip
    * '#'/'.'/',', collapse whitespace (normalizers.py:29-59).
    */
  def normalizeAddress(c: Column): Column = {
    val abbrevs: Seq[(String, String)] = Seq(
      "\\bst\\b" -> "street", "\\bave\\b" -> "avenue", "\\bav\\b" -> "avenue",
      "\\bblvd\\b" -> "boulevard", "\\bdr\\b" -> "drive", "\\brd\\b" -> "road",
      "\\bln\\b" -> "lane", "\\bct\\b" -> "court", "\\bpl\\b" -> "place",
      "\\bpkwy\\b" -> "parkway", "\\bapt\\b" -> "apartment",
      "\\bapts\\b" -> "apartments", "\\b#\\b" -> "", "\\." -> "", "," -> ""
    )
    val lowered = lower(trim(safe(c)))
    val expanded = abbrevs.foldLeft(lowered) { case (acc, (pat, rep)) =>
      regexp_replace(acc, pat, rep)
    }
    trim(regexp_replace(expanded, "\\s+", " "))
  }

  private val prefixes = Set("mr", "mrs", "ms", "dr", "prof", "rev")
  private val suffixes = Set("jr", "sr", "ii", "iii", "iv", "phd", "md")

  /** Name: strip honorific prefix + suffix, expand nicknames, Title
    * Case (normalizers.py:88-114). Nickname map as a map-literal Column
    * (Catalyst constant-folds the literal; ~1k entries).
    */
  def normalizeName(c: Column): Column = {
    val nickMap = typedLit(Nicknames.Map)
    val parts = filter(split(lower(trim(safe(c))), "\\s+"), t => length(t) > 0)
    val noPrefix = when(
      size(parts) > 0 && element_at(parts, 1).isInCollection(prefixes),
      slice(parts, lit(2), size(parts) - 1)
    ).otherwise(parts)
    val noSuffix = when(
      size(noPrefix) > 1 && element_at(noPrefix, -1).isInCollection(suffixes),
      slice(noPrefix, lit(1), size(noPrefix) - 1)
    ).otherwise(noPrefix)
    // try_element_at: ANSI mode (Spark 4 default) makes element_at throw
    // on missing map keys
    val expanded = transform(noSuffix, t => coalesce(try_element_at(nickMap, t), t))
    initcap(array_join(expanded, " "))
  }

  /** Python str.title() semantics differ from initcap only on
    * intra-word punctuation (o'brien -> O'Brien in Python, O'brien in
    * initcap). The reference's scoring lowercases again before
    * comparison, so this difference is score-invisible; documented as
    * bounded-compat.
    */

  /** URL canonicalization for web-page dedup (no reference analogue —
    * the training-data brief's web payload makes URL-level exact dedup
    * a first-class pass before any content pass). Deterministic RFC
    * 3986-style normalization, pure codegen'd Column composition:
    *  - trim; drop the #fragment;
    *  - lowercase scheme://authority (path/query case is preserved —
    *    it is significant on most servers);
    *  - strip a leading `www.` host label (only when >= 2 labels
    *    remain — `www.com` is itself a registrable host) and the
    *    scheme-default port (http:80 / https:443). Known limitation:
    *    a `user:pass@` userinfo prefix in the authority is lowercased
    *    along with the host (userinfo is vanishingly rare in crawl
    *    URLs and usually stripped upstream);
    *  - drop tracking query params (utm_*, fbclid, gclid, msclkid),
    *    sort the survivors for order-insensitivity, drop a then-empty
    *    `?`;
    *  - strip trailing `/` from the path (`http://a.com/` ==
    *    `http://a.com`).
    * Strings with no `scheme://authority` prefix pass through trimmed
    * (they are not URLs; normalization would corrupt them).
    */
  def normalizeUrl(c: Column): Column = {
    val s = trim(safe(c))
    val noFrag = regexp_replace(s, "#.*$", "")
    // scheme://authority prefix; "" when the value is not a URL
    val head = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val tail = noFrag.substr(length(head) + 1, length(noFrag))
    val headLc = lower(head)
    // only strip www. when at least two host labels remain: www.com is
    // a (degenerate but legal) registrable host, and collapsing it to
    // "com" would conflate two different origins (r3 ADVICE). The
    // lookahead requires label.label after the strip point.
    val headNoWww = regexp_replace(headLc, "^([a-z0-9+.-]+://)www\\.(?=[^./?#]+\\.)", "$1")
    val headNoPort = regexp_replace(
      regexp_replace(headNoWww, "^(http://[^:/]+):80$", "$1"),
      "^(https://[^:/]+):443$", "$1")
    val path = regexp_replace(regexp_extract(tail, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(tail, "^[^?]*\\?(.*)$", 1)
    val params = filter(split(query, "&"), p =>
      length(p) > 0 && !p.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)="))
    val qNorm = array_join(array_sort(params), "&")
    val rebuilt = concat(headNoPort, path,
      when(length(qNorm) > 0, concat(lit("?"), qNorm)).otherwise(lit("")))
    when(length(head) > 0, rebuilt).otherwise(s)
  }

  /** Host of a URL, canonicalized like [[normalizeUrl]] (lowercased,
    * leading `www.` stripped when >= 2 labels remain, port and any
    * `user@` prefix dropped); '' when the value has no
    * scheme://authority prefix. The grouping key for per-domain corpus
    * reports (crawl pipelines rate-limit, filter and weight by
    * domain, not by page).
    */
  def urlHost(c: Column): Column = {
    val auth = regexp_extract(trim(safe(c)),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = lower(regexp_replace(regexp_replace(auth, "^[^@]*@", ""), ":\\d*$", ""))
    regexp_replace(host, "^www\\.(?=[^.]+\\.)", "")
  }

  /** Dispatch by semantic column type (matcher.py:594-605): phone,
    * email, string_name -> dedicated; address/string_general -> generic
    * string normalization; numeric/date pass through.
    */
  def byType(c: Column, colType: String): Column = colType match {
    case "phone" => normalizePhone(c)
    case "email" => normalizeEmail(c)
    case "string_name" => normalizeName(c)
    case t if t.toLowerCase.contains("address") || t == "string_general" => normalizeString(c)
    case _ => c
  }
}
