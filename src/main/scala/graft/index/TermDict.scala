package graft.index

import graft.analysis.Tokenizer

/** Growable primitive int buffer (reusable across docs — hot loop helper). */
private[graft] final class IntBuf(initial: Int = 256) {
  var a = new Array[Int](initial)
  var n = 0
  def clear(): Unit = n = 0
  def add(v: Int): Unit = {
    if (n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
    a(n) = v
    n += 1
  }
}

/** Per-task term interner: an open-addressing hash table mapping a term's
  * characters to a dense int id, storing each distinct term String ONCE per
  * task. The mini-segment hot loop keys every accumulator by this id, so a
  * token costs a char hash + one int-array probe — not a String allocation
  * plus a String-keyed HashMap lookup. At ~10³ tokens/doc the per-token
  * String garbage was the index build's single largest memory-bandwidth
  * consumer (the stage is measured bandwidth-bound — BASELINE.md), and
  * bandwidth-bound code gets faster by moving fewer bytes.
  *
  * Single-threaded by design (one instance per mapPartitions task).
  */
final class TermDict(initialPow: Int = 16) {
  private var cap = 1 << initialPow
  private var mask = cap - 1
  private var slots = new Array[Int](cap) // termId + 1; 0 = empty
  private var hashes = new Array[Int](cap)
  private var names = new Array[String](cap >> 1)
  private var count = 0

  def size: Int = count

  /** The interned spelling of a term id. */
  def term(id: Int): String = names(id)

  private def grow(): Unit = {
    val os = slots
    val oh = hashes
    cap <<= 1
    mask = cap - 1
    slots = new Array[Int](cap)
    hashes = new Array[Int](cap)
    var i = 0
    while (i < os.length) {
      if (os(i) != 0) {
        var j = oh(i) & mask
        while (slots(j) != 0) j = (j + 1) & mask
        slots(j) = os(i)
        hashes(j) = oh(i)
      }
      i += 1
    }
  }

  private def insert(slot: Int, h: Int, t: String): Int = {
    if (count == names.length)
      names = java.util.Arrays.copyOf(names, names.length * 2)
    names(count) = t
    count += 1
    slots(slot) = count
    hashes(slot) = h
    if (count.toLong * 4 > cap.toLong * 3) grow()
    count - 1
  }

  /** id of the (already lowercased) term spelled by chars[0, len). */
  def idOf(chars: Array[Char], len: Int, h: Int): Int = {
    var j = h & mask
    while (true) {
      val s = slots(j)
      if (s == 0) return insert(j, h, new String(chars, 0, len))
      if (hashes(j) == h) {
        val t = names(s - 1)
        if (t.length == len && eqChars(t, chars, len)) return s - 1
      }
      j = (j + 1) & mask
    }
    -1 // unreachable
  }

  /** id of an already-materialized token (the non-ASCII fallback path). */
  def idOf(t: String): Int = {
    var h = 0
    var i = 0
    while (i < t.length) { h = h * 31 + t.charAt(i); i += 1 }
    h ^= (h >>> 16)
    var j = h & mask
    while (true) {
      val s = slots(j)
      if (s == 0) return insert(j, h, t)
      if (hashes(j) == h && names(s - 1) == t) return s - 1
      j = (j + 1) & mask
    }
    -1 // unreachable
  }

  private def eqChars(t: String, chars: Array[Char], len: Int): Boolean = {
    var i = 0
    while (i < len) {
      if (t.charAt(i) != chars(i)) return false
      i += 1
    }
    true
  }

  // ---- tokenizer writing interned ids (zero allocations per token) -------

  private var cbuf = new Array[Char](1 << 12)

  /** Tokenize `text` into interned term ids, exactly Tokenizer.tokenize
    * semantics (lowercase + split on non-[a-z0-9] runs). The ASCII fast
    * path lowercases per char; ANY char ≥ 0x80 reroutes the WHOLE text
    * through the legacy full-string tokenizer (full-string toLowerCase has
    * multi-char edge cases — U+0130 İ, U+212A K — that a per-char map would
    * get wrong), so the id sequence always spells Tokenizer.tokenize(text).
    */
  def tokenizeInto(text: String, out: IntBuf): Unit = {
    out.clear()
    if (text == null || text.isEmpty) return
    val len = text.length
    if (cbuf.length < len) cbuf = new Array[Char](math.max(len, cbuf.length * 2))
    var w = 0
    var h = 0
    var i = 0
    while (i < len) {
      var c = text.charAt(i)
      if (c >= 0x80) { // rare: redo the whole text through the exact path
        out.clear()
        val toks = Tokenizer.tokenize(text)
        var k = 0
        while (k < toks.length) { out.add(idOf(toks(k))); k += 1 }
        return
      }
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        cbuf(w) = c
        w += 1
        h = h * 31 + c
      } else if (w > 0) {
        out.add(idOf(cbuf, w, h ^ (h >>> 16)))
        w = 0
        h = 0
      }
      i += 1
    }
    if (w > 0) out.add(idOf(cbuf, w, h ^ (h >>> 16)))
  }
}
