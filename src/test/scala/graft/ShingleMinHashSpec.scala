package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity gate for the compiled in-row shingle+MinHash kernel
  * (graft.text.ShingleMinHash) against the built-in HOF composition it
  * replaced on the stateless streaming dedup lines (st28/st31): same
  * shingle set, same order, same signature mins — on real sf0.001
  * documents AND edge-case rows (short text, repeated tokens, tabs
  * inside, leading/trailing whitespace, empty string). */
class ShingleMinHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val P = 2147483647L

  private def hofForm(n: Int, numPerm: Int) = {
    val shs = graft.text.TextOps.shingles(
      graft.text.TextOps.tokens(col("text")), n)
    val h30s = transform(shs,
      sh => pmod(graft.text.TextOps.hash60(sh), lit(1073741824L)))
    struct(
      shs.as("shs"),
      array((0 until numPerm).map(i =>
        array_min(transform(h30s, h =>
          (h * graft.dedup.Dedup.permA(i) + graft.dedup.Dedup.permB(i)) % P)))
        : _*).as("sig"))
  }

  private def check(df: org.apache.spark.sql.DataFrame, n: Int,
                    numPerm: Int): Unit = {
    val both = df
      .select(col("text"),
        hofForm(n, numPerm).as("ref"),
        graft.text.ShingleMinHash(col("text"), n, numPerm).as("got"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val ref = r.getStruct(1)
      val got = r.getStruct(2)
      assert(ref.getSeq[String](0) === got.getSeq[String](0),
        s"shingle mismatch for text=${r.getString(0).take(60)}…")
      val refSig = ref.getSeq[Long](1)
      val gotSig = got.getSeq[Long](1)
      if (ref.getSeq[String](0).nonEmpty)
        assert(refSig === gotSig,
          s"sig mismatch for text=${r.getString(0).take(60)}…")
      // empty shingle set: HOF yields null mins, kernel yields
      // sentinels — both unusable, both filtered by size(shs) > 0
    }
  }

  test("kernel ≡ HOF composition on real sf0.001 documents (16 perms)") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text"))
    check(docs, n = 3, numPerm = 16)
  }

  test("kernel ≡ HOF composition at 32 perms (the st31 two-family width)") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).limit(200)
    check(docs, n = 3, numPerm = 32)
  }

  test("edge cases: short/empty/whitespace-heavy/duplicate-shingle text") {
    val rows = Seq(
      "",
      "   ",
      "one",
      "one two",
      "one two three",
      "a b c a b c a b c",      // duplicate shingles — distinct order
      "  leading and trailing  ",
      "tab\tseparated\ttokens here now",
      "newline\nseparated tokens appear here",
      "unicode æøå 中文 tokens mixed in here"
    ).toDF("text")
    check(rows, n = 3, numPerm = 16)
  }
}
