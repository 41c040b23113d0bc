package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.corpus.SyntheticCorpus
import graft.index.Codec
import graft.model.Posting

class CorpusCodecSpec extends AnyFunSuite {
  /** Deterministic property driver (no scalatest-scalacheck bridge in the
    * offline dep set): sample the generator at fixed seeds. */
  def forAll[T](gen: Gen[T], n: Int = 60)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  // --- corpus -------------------------------------------------------------

  test("extractText(html) is byte-identical to the text column (input_hint invariant)") {
    (0L until 500L).foreach { i =>
      val pg = SyntheticCorpus.page(i)
      assert(SyntheticCorpus.extractText(pg.html) == pg.text, s"doc $i")
    }
  }

  test("corpus is deterministic (same index → same page)") {
    val p1 = SyntheticCorpus.page(12345L)
    val p2 = SyntheticCorpus.page(12345L)
    assert(p1.url == p2.url && p1.warc_ts == p2.warc_ts &&
      p1.text == p2.text && p1.lang == p2.lang &&
      p1.html.sameElements(p2.html))
    val a = SyntheticCorpus.page(7L)
    assert(a.url == "https://example.org/" + a.lang + "/00000007")
  }

  test("planted phrases are where FIXTURES.md says") {
    val toks = SyntheticCorpus.bodyTokens(14L) // 14 % 7 == 0
    assert(toks.slice(11, 14).sameElements(Array("obama", "family", "tree")))
    val t2 = SyntheticCorpus.bodyTokens(22L) // 22 % 11 == 0, gap = 22%6+1 = 5
    assert(t2(23) == "french" && t2(23 + 6) == "lick" && t2(23 + 12) == "resort")
  }

  test("zipf skew: head term df far exceeds tail") {
    val dfs = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    (0L until 300L).foreach { i =>
      SyntheticCorpus.bodyTokens(i).toSet.foreach((t: String) => dfs(t) += 1)
    }
    assert(dfs("w0") > 250)       // head term in nearly every doc
    assert(dfs("w9000") < dfs("w0") / 4) // deep tail well below head
  }

  // --- codec --------------------------------------------------------------

  val postingGen: Gen[List[Posting]] = for {
    n <- Gen.choose(0, 300)
    deltas <- Gen.listOfN(n, Gen.choose(1L, 1000L))
    metas <- Gen.listOfN(n, for {
      dl <- Gen.choose(1, 5000)
      np <- Gen.choose(1, 50) // tf == positions count (format invariant)
      pds <- Gen.listOfN(np, Gen.choose(1, 100))
    } yield (dl, pds))
  } yield {
    val ids = deltas.scanLeft(0L)(_ + _).tail
    ids.zip(metas).map { case (id, (dl, pds)) =>
      val pos = pds.scanLeft(0)(_ + _).tail.toArray
      Posting(id, pos.length, dl, pos)
    }
  }

  test("vbyte+delta roundtrip: decode(encode(x)) == x") {
    forAll(postingGen) { ps =>
      val seg = Codec.encode(ps.iterator)
      val back = Codec.decode(seg.blob, seg.n).toList
      assert(back.length == ps.length)
      back.zip(ps).foreach { case (a, b) =>
        assert(a.docId == b.docId && a.tf == b.tf && a.dl == b.dl)
        assert(a.positions.sameElements(b.positions))
      }
      assert(seg.cf == ps.map(_.tf.toLong).sum)
      if (ps.nonEmpty) {
        assert(seg.firstDocId == ps.head.docId)
        assert(seg.lastDocId == ps.last.docId)
        // block metadata invariants
        assert(seg.blockFirst.length == (ps.length + Codec.BlockSize - 1) / Codec.BlockSize)
        ps.grouped(Codec.BlockSize).zipWithIndex.foreach { case (blk, bi) =>
          assert(seg.blockFirst(bi) == blk.head.docId)
          assert(seg.blockMaxTf(bi) == blk.map(_.tf).max)
          assert(seg.blockMinDl(bi) == blk.map(_.dl).min)
        }
      }
    }
  }

  test("SegmentEncoder (pre-encoded positions) is byte-identical to encode") {
    forAll(postingGen, 30) { ps =>
      val a = Codec.encode(ps.iterator)
      val enc = new Codec.SegmentEncoder
      ps.foreach(p => enc.add(p.docId, p.tf, p.dl,
        Codec.encodePositions(p.positions)))
      val b = enc.finish()
      assert(java.util.Arrays.equals(a.blob, b.blob))
      assert(a.n == b.n && a.cf == b.cf && a.firstDocId == b.firstDocId &&
        a.lastDocId == b.lastDocId)
      assert(a.blockFirst.sameElements(b.blockFirst))
      assert(a.blockOff.sameElements(b.blockOff))
      assert(a.blockMaxTf.sameElements(b.blockMaxTf))
      assert(a.blockMinDl.sameElements(b.blockMinDl))
    }
  }

  test("block decode from offsets matches full decode") {
    forAll(postingGen.suchThat(_.length > Codec.BlockSize)) { ps =>
      val seg = Codec.encode(ps.iterator)
      val full = Codec.decode(seg.blob, seg.n).toList
      seg.blockOff.indices.foreach { bi =>
        val count = math.min(Codec.BlockSize, seg.n - bi * Codec.BlockSize)
        val blk = Codec.decodeBlock(seg.blob, seg.blockOff(bi),
          seg.blockFirst(bi), count).toList
        assert(blk.map(_.docId) ==
          full.slice(bi * Codec.BlockSize, bi * Codec.BlockSize + count).map(_.docId))
      }
    }
  }

  test("tokenizer matches duckdb regex semantics") {
    import graft.analysis.Tokenizer
    assert(Tokenizer.tokenize("Hello, World-42!").toList ==
      List("hello", "world", "42"))
    assert(Tokenizer.tokenize("").isEmpty)
    assert(Tokenizer.tokenize("...").isEmpty)
    assert(Tokenizer.tokenize("a  b\nc\td").toList == List("a", "b", "c", "d"))
  }

  test("TermDict.tokenizeInto spells exactly Tokenizer.tokenize (incl. non-ASCII fallback)") {
    import graft.analysis.Tokenizer
    import graft.index.{IntBuf, TermDict}
    val dict = new TermDict(4) // tiny initial capacity — exercise growth
    val buf = new IntBuf
    def toks(s: String): List[String] = {
      dict.tokenizeInto(s, buf)
      (0 until buf.n).map(i => dict.term(buf.a(i))).toList
    }
    val cases = Seq(
      "Hello, World-42!", "", "...", "a  b\nc\td",
      "MiXeD CaSe 007 tail", "trailing word",
      // non-ASCII reroutes the whole text through the legacy tokenizer:
      // U+0130 lowercases to 2 chars, U+212A lowercases to ASCII 'k'
      "naïve café résumé", "Xİy z", "Kelvin scale",
      "Über grment")
    cases.foreach { s =>
      assert(toks(s) == Tokenizer.tokenize(s).toList, s"input: $s")
    }
    // randomized cross-check incl. unicode (exercises interning + reuse)
    val gen = Gen.listOfN(40, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)), Gen.const(" "), Gen.const("-"),
      Gen.const("é"), Gen.const("W0"))).map(_.mkString)
    forAll(gen, 80) { s =>
      assert(toks(s) == Tokenizer.tokenize(s).toList, s"input: $s")
    }
    // ids are stable: same term → same id across calls
    dict.tokenizeInto("alpha beta alpha", buf)
    assert(buf.n == 3 && buf.a(0) == buf.a(2) && buf.a(0) != buf.a(1))
  }
}
