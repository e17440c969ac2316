package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.norm.Normalizers._

/** Normalizer goldens ported from the reference suite
  * (/root/reference/tests/test_comprehensive.py:100-139) — evaluated
  * through the actual Column expressions, not a Scala reimplementation.
  */
class NormalizersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def eval1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      in: String): String = {
    import spark.implicits.{StringToColumn => _, _}
    Seq(Option(in)).toDF("v").select(f(col("v")).as("r")).head().getString(0)
  }

  test("normalize_phone formats") {
    assert(eval1(normalizePhone, "555-123-4567") == "5551234567")
    assert(eval1(normalizePhone, "(555) 987-6543") == "5559876543")
    assert(eval1(normalizePhone, "5551112222") == "5551112222")
    assert(eval1(normalizePhone, "1-555-123-4567") == "5551234567")
    assert(eval1(normalizePhone, null) == "")
  }

  test("normalize_email") {
    assert(eval1(normalizeEmail, "John@Example.COM") == "john@example.com")
    assert(eval1(normalizeEmail, "  test@test.com  ") == "test@test.com")
  }

  test("normalize_address abbreviations") {
    assert(eval1(normalizeAddress, "123 Main St").contains("street"))
    assert(eval1(normalizeAddress, "456 Oak Ave").contains("avenue"))
    assert(eval1(normalizeAddress, "789 Park Blvd").contains("boulevard"))
    assert(eval1(normalizeAddress, "123 Main St") == "123 main street")
    // '.' and ',' are stripped, whitespace collapsed
    assert(eval1(normalizeAddress, "12 Oak St., Apt 5") == "12 oak street apartment 5")
  }

  test("normalize_name prefixes/suffixes/nicknames") {
    val r1 = eval1(normalizeName, "Mr John Smith")
    assert(!r1.toLowerCase.split(" ").contains("mr") && r1.toLowerCase.contains("john"))
    val r2 = eval1(normalizeName, "Dr Jane Doe")
    assert(!r2.toLowerCase.split(" ").contains("dr") && r2.toLowerCase.contains("jane"))
    assert(!eval1(normalizeName, "John Smith Jr").toLowerCase.split(" ").contains("jr"))
    // nickname expansion (nicknames.py data)
    assert(eval1(normalizeName, "Bob Smith") == "Robert Smith")
    assert(eval1(normalizeName, "Billy Jones") == "William Jones")
    // title case
    assert(eval1(normalizeName, "john smith") == "John Smith")
    // prefix-only name is not stripped to empty when it's the only token?
    // reference: parts[0] in prefixes -> stripped even if alone
    assert(eval1(normalizeName, "Dr") == "")
  }

  test("url_host extraction") {
    assert(eval1(urlHost, "HTTP://WWW.Example.COM:8080/p?q=1") == "example.com")
    assert(eval1(urlHost, "https://user@Sub.Site.org/x") == "sub.site.org")
    // www. survives when it IS the registrable host (same rule as
    // normalizeUrl, r3 ADVICE)
    assert(eval1(urlHost, "http://www.com/") == "www.com")
    assert(eval1(urlHost, "not a url") == "")
  }

  test("normalize_url canonicalization") {
    // every rule at once: scheme/host case, www, default port, tracking
    // params, param sort, trailing slash, fragment
    assert(eval1(normalizeUrl,
      "HTTPS://WWW.Example.COM:443/A/B/?z=1&utm_source=x&a=2#frag") ==
      "https://example.com/A/B?a=2&z=1")
    // http default port; path case preserved
    assert(eval1(normalizeUrl, "HTTP://Site.com:80/Path") == "http://site.com/Path")
    // non-default port kept
    assert(eval1(normalizeUrl, "http://site.com:8080/x") == "http://site.com:8080/x")
    // tracking-only query drops the '?' entirely
    assert(eval1(normalizeUrl, "http://a.com/p?fbclid=abc") == "http://a.com/p")
    assert(eval1(normalizeUrl, "http://a.com/p?gclid=1&msclkid=2") == "http://a.com/p")
    // utm param filter is prefix-anchored: 'autm_x' and 'utm' (no '=')
    // survive
    assert(eval1(normalizeUrl, "http://a.com/?autm_x=1&utm_b=2") == "http://a.com?autm_x=1")
    // root slash and bare host are the same page
    assert(eval1(normalizeUrl, "http://a.com/") == "http://a.com")
    // www only stripped as a host prefix label, not mid-host
    assert(eval1(normalizeUrl, "http://nwww.a.com/x") == "http://nwww.a.com/x")
    // www IS the registrable host: must survive (r3 ADVICE — stripping
    // would conflate http://www.com with a different origin)
    assert(eval1(normalizeUrl, "http://www.com/x") == "http://www.com/x")
    assert(eval1(normalizeUrl, "HTTP://WWW.COM") == "http://www.com")
    // two labels after the strip point: stripped as before
    assert(eval1(normalizeUrl, "http://www.a.com/x") == "http://a.com/x")
    // non-URL strings pass through trimmed, untouched
    assert(eval1(normalizeUrl, "  not a url  ") == "not a url")
    assert(eval1(normalizeUrl, null) == "")
    // idempotent
    assert(eval1(normalizeUrl, "https://example.com/A/B?a=2&z=1") ==
      "https://example.com/A/B?a=2&z=1")
  }

  test("normalize_string general") {
    assert(eval1(normalizeString, "  HELLO   WORLD  ") == "hello world")
    assert(eval1(normalizeString, "Test\n\nTest") == "test test")
    assert(eval1(normalizeString, null) == "")
    // tabs/CR/unicode spaces collapse like Python \s+
    assert(eval1(normalizeString, "a\t b\r\nc") == "a b c")
  }
}
