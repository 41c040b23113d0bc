package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.HtmlText

/** Pins the general HTML→text extractor's output byte-for-byte on hand
  * fixtures — the per-row invariant (text is a pure function of html)
  * holds only if these never drift.
  */
class HtmlTextSpec extends AnyFunSuite {

  test("tags stripped; block tags separate lines; inline tags do not") {
    val html = "<html><body><p>Hello <b>world</b></p><p>Second</p></body></html>"
    assert(HtmlText.extract(html) === "Hello world\nSecond")
  }

  test("script/style/template bodies, comments, doctype, CDATA dropped") {
    val html =
      """<!DOCTYPE html>
        |<html><head>
        |<script>var t = "<p>not text</p>"; if (1 < 2 && x) {}</script>
        |<STYLE>p { color: red }</STYLE>
        |</head><body>
        |<!-- navigation boilerplate -->
        |<![CDATA[ raw data ]]>
        |<p>kept</p>
        |</body></html>""".stripMargin
    assert(HtmlText.extract(html) === "kept")
  }

  test("core named and numeric character references decode") {
    val html = "<p>&amp; &lt;tag&gt; &quot;q&quot; &apos;a&apos; &#65;&#x42; x&nbsp;y</p>"
    assert(HtmlText.extract(html) === "& <tag> \"q\" 'a' AB x y")
  }

  test("unknown or unterminated references stay literal") {
    assert(HtmlText.extract("<p>AT&T and &unknown; and &#xZZ; and & alone</p>")
      === "AT&T and &unknown; and &#xZZ; and & alone")
  }

  test("numeric control references become spaces; invalid stay literal") {
    assert(HtmlText.extract("<p>a&#10;b</p>") === "a b")
    assert(HtmlText.extract("<p>a&#0;b</p>") === "a&#0;b")
    assert(HtmlText.extract("<p>a&#12345678;b</p>") === "a&#12345678;b")
  }

  test("quoted attribute values may contain '>'") {
    assert(HtmlText.extract("""<a title="a>b">x</a> <img alt='1>2'>y""")
      === "x y")
  }

  test("malformed input degrades locally, never throws") {
    assert(HtmlText.extract("<p>text <a href=") === "text")
    assert(HtmlText.extract("<p>seen</p><script>dropped tail") === "seen")
    assert(HtmlText.extract("plain no markup") === "plain no markup")
    assert(HtmlText.extract("") === "")
    assert(HtmlText.extract("&") === "&")
    assert(HtmlText.extract("<") === "")
  }

  test("case-insensitive raw-skip close tags") {
    assert(HtmlText.extract("<SCRIPT>x</ScRiPt><p>ok</p>") === "ok")
  }

  test("whitespace normalization: collapse, trim, drop empty lines, NBSP") {
    val html = "<div>  a\t\tb  c  </div>\r\n\r\n<div> </div><div>d</div>"
    assert(HtmlText.extract(html) === "a b c\nd")
    // no trailing newline
    assert(!HtmlText.extract("<p>x</p>").endsWith("\n"))
  }

  test("byte input decodes as UTF-8") {
    val s = "<p>café 中文</p>"
    assert(HtmlText.extract(s.getBytes("UTF-8")) === "café 中文")
  }

  test("deterministic: repeated extraction is identical") {
    val html = "<html><body><h1>T</h1><p>a &amp; b</p><ul><li>1</li><li>2</li></ul></body></html>"
    val a = HtmlText.extract(html)
    assert(a === HtmlText.extract(html))
    assert(a === "T\na & b\n1\n2")
  }
}
