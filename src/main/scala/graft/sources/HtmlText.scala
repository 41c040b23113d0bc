package graft.sources

import java.nio.charset.StandardCharsets

/** Deterministic HTML → text extraction — the general-purpose
  * implementation of the pipeline's per-row invariant seam (a pages
  * table's `text` column must be a pure function of its `html` column,
  * byte-identical across runs and cluster sizes). This is the extractor
  * [[WarcSource.toPages]] expects for real crawl payloads; the synthetic
  * corpus keeps its own fixture-exact extractor
  * ([[graft.corpus.SyntheticCorpus.extractText]]) because its pages are
  * generated, not parsed.
  *
  * The algorithm is a single forward scan with no backtracking and no
  * regex, so cost is strictly linear in the payload and allocation is one
  * output builder — the shape that survives a 100 TB crawl where this
  * runs once per record inside the scan task:
  *
  *  1. `<!-- … -->` comments, `<script>`/`<style>`/`<template>` element
  *     bodies, `<!DOCTYPE …>` and CDATA sections are dropped.
  *  2. Every other tag is dropped; BLOCK-level tags (p, div, li, tr, h1-6,
  *     br, …) additionally emit a newline so words from different blocks
  *     never fuse.
  *  3. Character references are decoded: the core named set
  *     (`&amp; &lt; &gt; &quot; &apos; &nbsp;`) plus numeric `&#NNN;` /
  *     `&#xHH;`. An unterminated or unknown reference is kept literally —
  *     real crawl text is full of bare `&`.
  *  4. Whitespace is normalized LAST (so decoded references participate):
  *     within each line runs of whitespace (including NBSP) collapse to
  *     one space and ends are trimmed; empty lines are dropped; lines
  *     join with `\n`. No trailing newline.
  *
  * Untrusted-input contract (same as the decoders and the WARC parser):
  * any byte sequence yields SOME deterministic string — truncated tags,
  * unclosed scripts, and garbage entities degrade locally, never throw.
  */
object HtmlText {

  def extract(html: Array[Byte]): String =
    extract(new String(html, StandardCharsets.UTF_8))

  /** Tags whose element content is dropped entirely. */
  private val RawSkip = Set("script", "style", "template")

  /** Tags that separate text blocks: crossing one emits a newline. */
  private val Block = Set(
    "html", "head", "body", "title", "p", "div", "br", "hr",
    "li", "ul", "ol", "dl", "dt", "dd",
    "table", "tr", "td", "th", "thead", "tbody", "tfoot", "caption",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "section", "article", "aside", "header", "footer", "nav", "main",
    "pre", "blockquote", "figure", "figcaption", "form", "fieldset",
    "address", "option", "select")

  private val Named = Map(
    "amp" -> '&', "lt" -> '<', "gt" -> '>',
    "quot" -> '"', "apos" -> '\'', "nbsp" -> '\u00A0')

  def extract(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val end = html.indexOf("]]>", i + 9)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && html.charAt(i + 1) == '!') {
          // <!DOCTYPE ...> and other declarations
          val end = html.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else {
          val (name, closing, after) = tagName(html, i)
          if (after < 0) i = n // truncated tag: drop the tail
          else {
            if (Block.contains(name)) out.append('\n')
            i = after
            if (!closing && RawSkip.contains(name)) {
              // drop element content up to the matching close tag
              val close = indexOfClose(html, i, name)
              i = if (close < 0) n else close
            }
          }
        }
      } else if (c == '&') {
        val (ch, after) = entity(html, i)
        out.append(ch)
        i = after
      } else {
        out.append(c)
        i += 1
      }
    }
    normalize(out)
  }

  /** Parse the tag at `html(lt) == '<'`: lowercased name, whether it is a
    * closing tag, and the index just past the tag's `>` (−1 if the tag
    * never closes).
    */
  private def tagName(html: String, lt: Int): (String, Boolean, Int) = {
    val n = html.length
    var i = lt + 1
    val closing = i < n && html.charAt(i) == '/'
    if (closing) i += 1
    val start = i
    while (i < n && (html.charAt(i).isLetterOrDigit)) i += 1
    val name = html.substring(start, i).toLowerCase(java.util.Locale.ROOT)
    // skip attributes, respecting quoted values (a '>' inside quotes is
    // attribute DATA, not the tag end)
    var quote: Char = 0
    while (i < n) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return (name, closing, i + 1)
      i += 1
    }
    (name, closing, -1)
  }

  /** Index just past `</name ...>` at or after `from`, case-insensitive;
    * −1 if absent.
    */
  private def indexOfClose(html: String, from: Int, name: String): Int = {
    val n = html.length
    var i = from
    while (i >= 0 && i < n) {
      i = html.indexOf('<', i)
      if (i < 0) return -1
      if (i + 1 < n && html.charAt(i + 1) == '/' &&
          html.regionMatches(true, i + 2, name, 0, name.length)) {
        val gt = html.indexOf('>', i + 2)
        return if (gt < 0) -1 else gt + 1
      }
      i += 1
    }
    -1
  }

  /** Decode the character reference at `html(amp) == '&'`: (decoded char,
    * index after it). Unknown/unterminated → the literal '&' and amp+1.
    */
  private def entity(html: String, amp: Int): (Char, Int) = {
    val n = html.length
    val semi = {
      // references are short; cap the scan so a bare & near a long run of
      // text costs O(1)
      val lim = math.min(n, amp + 12)
      var j = amp + 1
      while (j < lim && html.charAt(j) != ';') j += 1
      if (j < lim) j else -1
    }
    if (semi < 0 || semi == amp + 1) return ('&', amp + 1)
    val body = html.substring(amp + 1, semi)
    if (body.charAt(0) == '#') {
      val cp =
        try {
          if (body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
            Integer.parseInt(body.substring(2), 16)
          else Integer.parseInt(body.substring(1), 10)
        } catch { case _: NumberFormatException => -1 }
      if (cp >= 0x20 && cp <= 0xffff && !Character.isSurrogate(cp.toChar))
        (cp.toChar, semi + 1)
      else if (cp == '\t' || cp == '\n' || cp == '\r') (' ', semi + 1)
      else ('&', amp + 1) // control/astral/invalid: keep literal
    } else Named.get(body) match {
      case Some(ch) => (ch, semi + 1)
      case None     => ('&', amp + 1)
    }
  }

  /** Collapse intra-line whitespace (incl. NBSP), trim, drop empty lines,
    * join with '\n'.
    */
  private def normalize(raw: java.lang.StringBuilder): String = {
    val out = new java.lang.StringBuilder(raw.length)
    var lineHasText = false  // emitted any char on the current line
    var pendingSpace = false // saw whitespace since the last char
    var pendingBreak = false // saw a line break since the last char
    var i = 0
    val n = raw.length
    while (i < n) {
      val c = raw.charAt(i)
      if (c == '\n') { pendingBreak = true; pendingSpace = false }
      else if (c == ' ' || c == '\t' || c == '\r' || c == '\f' ||
               c == '\u000B' || c == '\u00A0') pendingSpace = true
      else {
        if (pendingBreak) {
          if (lineHasText) out.append('\n')
          lineHasText = false; pendingBreak = false; pendingSpace = false
        }
        if (pendingSpace) {
          if (lineHasText) out.append(' ')
          pendingSpace = false
        }
        out.append(c)
        lineHasText = true
      }
      i += 1
    }
    out.toString
  }
}
