package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bpe
import graft.ops.Bpe.Merge

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cpCompare is code-point order, including astral-plane symbols") {
    assert(Bpe.cpCompare("a", "b") < 0)
    assert(Bpe.cpCompare("ab", "a") > 0)
    assert(Bpe.cpCompare("a", "a") == 0)
    // U+FF21 (fullwidth A, BMP) < U+1D400 (math bold A, astral) in code
    // points; UTF-16 surrogate comparison would invert this.
    assert("Ａ".compareTo("𝐀") > 0) // the UTF-16 trap
    assert(Bpe.cpCompare("Ａ", "𝐀") < 0)
  }

  test("applyMerge is greedy leftmost non-overlapping") {
    def syms(s: String) = s.map(_.toString).toVector
    assert(Bpe.applyMerge(syms("oooo"), "o", "o") == Vector("oo", "oo"))
    assert(Bpe.applyMerge(syms("ooo"), "o", "o") == Vector("oo", "o"))
    assert(Bpe.applyMerge(Vector("oo", "o", "oo"), "oo", "o") ==
      Vector("ooo", "oo"))
    assert(Bpe.applyMerge(syms("abab"), "a", "b") == Vector("ab", "ab"))
    assert(Bpe.applyMerge(syms("x"), "a", "b") == Vector("x"))
  }

  test("learn: frequency-weighted winners, code-point ties, multi-level merges") {
    import spark.implicits._
    // "aaab" x3, "ab" x2: round 1 pairs -> (a,a):6, (a,b):5 -> merge (a,a);
    // round 2: vocab [aa,a,b] x3 + [a,b] x2 -> (a,b):5, (aa,a):3 -> (a,b);
    // round 3: [aa,ab] x3 + [ab] x2 -> (aa,ab):3 — a merged symbol
    // re-merging (the multi-level property a pretoken-count stub lacks).
    val docs = (Seq.fill(3)("aaab") ++ Seq.fill(2)("ab")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val ms = Bpe.learn(docs, 3)
    assert(ms == Seq(Merge(0, "a", "a"), Merge(1, "a", "b"),
      Merge(2, "aa", "ab")))
    // early stop: every word fully merged after 3 rounds here
    assert(Bpe.learn(docs, 10).map(m => (m.lhs, m.rhs)) ==
      Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("encodeWord reproduces the training rewrite for in-vocab words") {
    import spark.implicits._
    val words = Seq("aaab", "ab", "banana", "bandana", "na", "aa")
    val docs = words.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val ms = Bpe.learn(docs, 8)
    // replay training by hand over the vocab and compare per word
    var vocab = words.map(w => w -> w.map(_.toString).toVector).toMap
    ms.foreach { m =>
      vocab = vocab.map { case (w, s) =>
        w -> Bpe.applyMerge(s, m.lhs, m.rhs)
      }
    }
    words.foreach { w =>
      assert(Bpe.encodeWord(w, ms) == vocab(w), s"word $w")
    }
    // out-of-vocab words encode deterministically with the same merges
    assert(Bpe.encodeWord("abab", ms).nonEmpty)
  }

  test("encodedTokenCount: empty docs keep a 0 row; counts sum per doc") {
    import spark.implicits._
    val docs = Seq((1L, "aaab ab"), (2L, ""), (3L, "aaab aaab"))
      .toDF("doc_id", "text")
    val ms = Bpe.learn(docs, 4)
    val out = Bpe.encodedTokenCount(docs, ms).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(2L) == 0L)
    // " aaab"/"aaab" and " ab"/"ab" are distinct pretokens (space prefix)
    // but each fully merges under enough rounds → counts are small + exact
    val enc = (w: String) => Bpe.encodeWord(w, ms).length
    assert(out(1L) == enc("aaab") + enc(" ab"))
    assert(out(3L) == enc("aaab") + enc(" aaab"))
  }

  test("oracle soundness precondition: corpus text has no U+001E/U+001F") {
    val bad = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("text")
        .rlike("[\\x1e\\x1f]")).count()
    assert(bad == 0L)
  }
}
