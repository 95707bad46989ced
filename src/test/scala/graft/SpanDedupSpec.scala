package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup

/** Anchor-diagonal span-dedup contracts (d15) on planted fixtures:
  * a verbatim copied span is found with its exact token length, a
  * token-shuffled bag-of-words twin is NOT a span match (the case
  * that separates this operator from Jaccard), spans split across
  * different positions still land (diagonal invariance), and the DF
  * band drops boilerplate grams. */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(docs: (Long, String)*): Map[(Long, Long), (Long, Long, Long)] = {
    import spark.implicits._
    Dedup.spanMatches(docs.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
  }

  test("a verbatim copied span is found with its exact token length") {
    // 8-token span planted inside otherwise-unrelated docs, at
    // DIFFERENT positions (diagonal ≠ 0)
    val span = "alpha bravo charlie delta echo foxtrot golf hotel"
    val out = run(
      1L -> s"one two three $span nine ten",
      2L -> s"$span many other unrelated closing words here")
    assert(out.contains((1L, 2L)), s"span pair missing: $out")
    val (anchors, diags, longest) = out((1L, 2L))
    assert(longest == 8L, s"longest_run_tokens $longest != 8")
    assert(anchors == 6L, "an 8-token span yields 8-2 = 6 anchors")
    assert(diags == 1L, "one verbatim span = one diagonal")
  }

  test("a shuffled bag-of-words twin is NOT a span match") {
    // same multiset of tokens, no shared 3-gram → Jaccard-similar,
    // span-dissimilar — the distinction the operator exists for
    val out = run(
      1L -> "alpha bravo charlie delta echo foxtrot golf hotel",
      2L -> "hotel golf foxtrot echo delta charlie bravo alpha")
    assert(!out.contains((1L, 2L)), s"shuffled twin matched: $out")
  }

  test("two separate shared spans appear as two diagonals") {
    val s1 = "red orange yellow green blue indigo" // 6 tokens → 4 anchors
    val s2 = "cat dog fish bird mouse horse"       // 6 tokens → 4 anchors
    val out = run(
      1L -> s"$s1 filler11 filler12 filler13 $s2",
      2L -> s"$s2 other21 other22 other23 other24 other25 $s1")
    val (anchors, diags, longest) = out((1L, 2L))
    assert(diags == 2L, s"expected two diagonals: $out")
    assert(longest == 6L && anchors == 8L)
  }

  test("boilerplate grams beyond the DF band produce no matches") {
    // the same 5-token phrase in 12 docs: every gram has DF 12 > 10 →
    // banded out, zero pairs (the d2/d12 fan-out bound in action)
    val docs = (1L to 12L).map(i =>
      i -> s"u${i}a u${i}b lorem ipsum dolor sit amet u${i}c")
    assert(run(docs: _*).isEmpty)
  }
}
