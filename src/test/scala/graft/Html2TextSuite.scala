package graft

import graft.extract.Html2Text
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

class Html2TextSuite extends AnyFunSuite {

  test("strips script/style/nav/head/footer with content") {
    val html =
      """<html><head><title>T</title><script>var x = 1 < 2;</script>
        |<style>p{color:red}</style></head>
        |<body><nav><ul><li>Home</li></ul></nav>
        |<h1>Hello</h1><p>World</p>
        |<footer>bye</footer></body></html>""".stripMargin
    val text = Html2Text(html)
    assert(text == "Hello\nWorld")
  }

  test("block tags become newlines, inline tags stripped") {
    assert(Html2Text("<p>a <b>bold</b> move</p><p>next</p>") == "a bold move\nnext")
    assert(Html2Text("<div>x</div><div>y</div>") == "x\ny")
    assert(Html2Text("line<br/>break") == "line\nbreak")
  }

  test("entity decoding: named and numeric") {
    assert(Html2Text("<p>a &amp; b &lt;c&gt; &quot;d&quot; &#65; &#x42;</p>") ==
      "a & b <c> \"d\" A B")
    assert(Html2Text("x&nbsp;y") == "x y")
  }

  test("comments removed") {
    assert(Html2Text("<p>keep</p><!-- drop this --><p>also</p>") == "keep\nalso")
  }

  test("whitespace normalization: collapse runs, max one blank line, trim") {
    val got = Html2Text("<p>  a   b  </p>\n\n\n\n<p>c</p>")
    assert(got == "a b\nc")
  }

  test("byte-identical determinism over UTF-8 bytes") {
    val html = "<html><body><h1>Müller &amp; Søn</h1><p>Text—dash</p></body></html>"
    val bytes = html.getBytes(StandardCharsets.UTF_8)
    val a = Html2Text(bytes)
    val b = Html2Text(bytes)
    assert(a == b)
    assert(a == "Müller & Søn\nText—dash")
  }

  test("empty and tag-only inputs") {
    assert(Html2Text("") == "")
    assert(Html2Text("<html><head><title>x</title></head><body></body></html>") == "")
  }

  test("golden: the PagesGen HTML wrapper round-trips its text") {
    val text = "Alpha Beta uses Gamma Delta reliably.\nSecond line stays."
    val html = graft.fixtures.PagesGen.wrapHtml("Page 7", text)
    val extracted = Html2Text(html)
    assert(extracted == "Page 7\n" + text)
  }
}
