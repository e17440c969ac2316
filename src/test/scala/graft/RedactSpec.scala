package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.norm.Redact
import graft.text.TextAnalysis

/** PII redaction goldens (evaluated through the actual Column
  * expressions) and the within-document repetition signals.
  */
class RedactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def eval1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      in: String): String = {
    import spark.implicits._
    Seq(in).toDF("v").select(f(col("v")).as("r")).head().getString(0)
  }

  private def evalD(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      in: String): Double = {
    import spark.implicits._
    Seq(in).toDF("v").select(f(col("v")).as("r")).head().getDouble(0)
  }

  test("emails redact; bare domains and @handles survive") {
    assert(eval1(Redact.redactEmails,
      "mail First.Last+tag@sub.example.co.uk today") == "mail <EMAIL> today")
    assert(eval1(Redact.redactEmails, "see example.com or @handle") ==
      "see example.com or @handle")
  }

  test("ipv4 redacts; versions and long dotted runs survive") {
    assert(eval1(Redact.redactIps, "from 10.0.255.1 port 80") == "from <IP> port 80")
    assert(eval1(Redact.redactIps, "v1.2.3 release") == "v1.2.3 release")
  }

  test("phone-like digit runs redact; years, prices and short ids survive") {
    assert(eval1(Redact.redactPhones, "call +1 (555) 010-4477 now") == "call <PHONE> now")
    assert(eval1(Redact.redactPhones, "call 555-010-4477!") == "call <PHONE>!")
    assert(eval1(Redact.redactPhones, "tel 5550104477") == "tel <PHONE>")
    assert(eval1(Redact.redactPhones, "in 2024 it cost 1299 for 365 days") ==
      "in 2024 it cost 1299 for 365 days")
  }

  test("redactPii applies email, ip, phone in contract order") {
    val in = "a@b.co from 1.2.3.4 ring 555-010-4477"
    assert(eval1(Redact.redactPii, in) == "<EMAIL> from <IP> ring <PHONE>")
    // the email's digits must not be half-eaten by the phone pass
    assert(eval1(Redact.redactPii, "user5550104477@mail.com") == "<EMAIL>")
  }

  test("dupLineFraction counts repeated non-blank lines") {
    assert(evalD(TextAnalysis.dupLineFraction(_), "a\nb\n\na\na") == 0.5) // 4 lines, 2 distinct
    assert(evalD(TextAnalysis.dupLineFraction(_), "a\nb") == 0.0)
    assert(evalD(TextAnalysis.dupLineFraction(_), "") == 0.0)
  }

  test("dupNgramFraction counts repeated word n-grams") {
    // bigrams of "x y x y x": [x y, y x, x y, y x] -> 4 total, 2 distinct
    assert(evalD(TextAnalysis.dupNgramFraction(_, 2), "x y x y x") == 0.5)
    assert(evalD(TextAnalysis.dupNgramFraction(_, 2), "all words differ here") == 0.0)
    assert(evalD(TextAnalysis.dupNgramFraction(_, 2), "one") == 0.0) // fewer than n tokens
  }
}
