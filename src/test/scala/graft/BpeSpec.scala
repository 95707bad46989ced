package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bpe

/** BPE merge semantics pins — especially left-greedy NON-OVERLAPPING
  * application of a self-pair (a,a), the one case where naive
  * pair-matching over-merges (classic Sennrich merge_vocab behavior:
  * "aaaa" + rule (a,a) → "aa aa", never three overlapping merges). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(texts: Seq[String], k: Int) =
    Bpe.merges(texts.toDF("text"), "text", k)
      .select($"step", $"lhs", $"rhs", $"merged", $"pair_count")
      .as[(Int, String, String, String, Long)].collect().toSeq

  test("self-pair merges non-overlapping, then merged symbols pair up") {
    // words: "aaaa" freq 2, "ab" freq 1
    // round 1: (a,a) count 3·2 = 6 beats (a,b) 1 → "aaaa" = [aa, aa]
    // round 2: (aa,aa) count 2 beats (a,b) 1 → merged "aaaa"
    val got = run(Seq("aaaa aaaa", "ab"), 2)
    assert(got == Seq(
      (1, "a", "a", "aa", 6L),
      (2, "aa", "aa", "aaaa", 2L)))
  }

  test("odd-length run leaves the trailing singleton; ties break lexicographically") {
    // "aaaaa" → round 1 (a,a) count 4 → [aa, aa, a]
    // round 2: (aa,aa) and (aa,a) both count 1 → rhs "a" < "aa" wins
    val got = run(Seq("aaaaa"), 2)
    assert(got == Seq(
      (1, "a", "a", "aa", 4L),
      (2, "aa", "a", "aaa", 1L)))
  }

  test("frequencies weight pairs across repeated words") {
    // "lo" ×3 vs "hi" ×2 → (l,o) wins with count 3, then (h,i) with 2
    val got = run(Seq("lo lo", "lo hi", "hi"), 2)
    assert(got == Seq(
      (1, "l", "o", "lo", 3L),
      (2, "h", "i", "hi", 2L)))
  }

  private def segment(texts: Seq[String], k: Int): Map[String, Seq[String]] =
    Bpe.encoded(texts.toDF("text"), "text", k)
      .select($"w", $"pos", $"sym")
      .as[(String, Int, String)].collect().toSeq
      .groupBy(_._1).map { case (w, rows) =>
        w -> rows.sortBy(_._2).map(_._3) }

  test("encoded: final symbol table is the left-greedy application of all merges") {
    // merges learned above: (a,a) then (aa,aa)
    val seg = segment(Seq("aaaa aaaa", "ab"), 2)
    assert(seg("aaaa") == Seq("aaaa")) // [aa,aa] round 1, [aaaa] round 2
    assert(seg("ab") == Seq("a", "b")) // (a,b) never won a round
  }

  test("encoded: odd runs keep the trailing singleton through encoding") {
    val seg = segment(Seq("aaaaa"), 1) // one round: (a,a) → [aa, aa, a]
    assert(seg("aaaaa") == Seq("aa", "aa", "a"))
  }

  test("property: pieces always reconcatenate to the word; merges shrink piece counts") {
    // random small-alphabet corpora (repetition makes merges fire);
    // fixed seeds — deterministic across runs, PropertySpec convention
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpus = Gen.choose(3, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val docs = (0 until 6).flatMap(i =>
      Gen.listOfN(4, corpus).apply(Gen.Parameters.default, Seed(7L + i)))
    docs.zipWithIndex.foreach { case (texts, i) =>
      val k = 1 + i % 4
      val seg = segment(texts, k)
      val words = texts.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty).toSet
      assert(seg.keySet == words, s"seed $i: vocab mismatch")
      seg.foreach { case (w, pieces) =>
        assert(pieces.mkString == w,
          s"seed $i k=$k: pieces ${pieces} don't rebuild '$w'")
        assert(pieces.size <= w.length)
        assert(pieces.forall(_.nonEmpty))
      }
      // more merge rounds never increase any word's piece count
      if (k > 1) {
        val prev = segment(texts, k - 1)
        seg.foreach { case (w, pieces) =>
          assert(pieces.size <= prev(w).size,
            s"seed $i: piece count grew for '$w' at k=$k")
        }
      }
    }
  }
}
