package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Pins the review-fixed contracts of the chunking and redaction
  * helpers: a null/empty document yields NO chunks (no phantom
  * md5('')-chunk rows), and the phone audit counts what the sequential
  * redaction actually masks. */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("chunkStarts: null and empty token arrays yield no starts") {
    val df = Seq(
      (1L, Some("one two three four five")),
      (2L, None),
      (3L, Some("a"))).toDF("id", "text")
    val out = df
      .withColumn("toks",
        when($"text".isNotNull, TextOps.tokens($"text")))
      .select($"id", TextOps.chunkStarts($"toks", 2).as("starts"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Int](1)))
      .toMap
    assert(out(1L).get == Seq(0, 2, 4))
    assert(out(2L).isEmpty || out(2L).get.isEmpty,
      "null text must not fabricate a chunk start")
    assert(out(3L).get == Seq(0))
  }

  test("ngrams: keeps duplicates in order; short/null input yields empty") {
    val df = Seq(
      (1L, Some("a b a b c")),
      (2L, Some("solo")),
      (3L, None)).toDF("id", "text")
    val out = df
      .withColumn("toks",
        when($"text".isNotNull, TextOps.tokens($"text")))
      .select($"id", TextOps.ngrams($"toks", 2).as("g"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1)))
      .toMap
    // the multiset: "a b" appears twice (shingles would dedup it)
    assert(out(1L).get == Seq("a b", "b a", "a b", "b c"))
    assert(out(2L).get.isEmpty, "one token has no 2-grams")
    assert(out(3L).isEmpty || out(3L).get.isEmpty,
      "null text must not fabricate n-grams")
  }

  test("redaction audit: phone-shaped email domain is not a masked phone") {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\b\\d{3}-\\d{4,}\\b"
    val df = Seq(
      ("a@555-0105.com and nothing else", 1L),
      ("call 555-0105 or mail b@x.org", 2L)).toDF("raw", "id")
      .withColumn("deml", TextOps.redact($"raw", emailRe, "<EMAIL>"))
      .select($"id",
        TextOps.matchCount($"raw", emailRe).as("n_emails"),
        TextOps.matchCount($"deml", phoneRe).as("n_phones"),
        TextOps.redact($"deml", phoneRe, "<PHONE>").as("red"))
    val rows = df.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    // row 1: the whole thing is one email; no phone is masked
    assert(rows(1L) == ((1, 0, "<EMAIL> and nothing else")))
    // row 2: one real phone, one real email, both masked
    assert(rows(2L) == ((1, 1, "call <PHONE> or mail <EMAIL>")))
  }
}
