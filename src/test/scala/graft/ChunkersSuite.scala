package graft

import graft.extract.Chunkers
import org.scalatest.funsuite.AnyFunSuite

class ChunkersSuite extends AnyFunSuite {

  test("sentenceBoundary: empty and blank input") {
    assert(Chunkers.sentenceBoundary("") == Seq.empty)
    assert(Chunkers.sentenceBoundary("   \n  ") == Seq.empty)
  }

  test("sentenceBoundary: single small text → one chunk, index 0") {
    val cs = Chunkers.sentenceBoundary("Hello world. This is fine.", sourceId = "s")
    assert(cs.length == 1)
    assert(cs.head.index == 0)
    assert(cs.head.text == "Hello world. This is fine.")
    assert(cs.head.id.length == 16)
  }

  test("sentenceBoundary: packs to max_tokens*4 chars and carries overlap (chunker.py:58-76)") {
    val sentence = "Alpha beta gamma delta epsilon zeta eta theta." // 46 chars
    val text = Seq.fill(20)(sentence).mkString(" ")
    val cs = Chunkers.sentenceBoundary(text, maxTokens = 32, overlapTokens = 4, sourceId = "x")
    assert(cs.length > 1)
    // every chunk except possibly the last respects the budget+1-sentence slack
    assert(cs.forall(_.text.nonEmpty))
    // overlap: the head of chunk n+1 repeats the tail of chunk n
    val tail = cs(0).text.takeRight(8)
    assert(cs(1).text.contains(tail.trim.take(4)))
    // ids deterministic
    val cs2 = Chunkers.sentenceBoundary(text, maxTokens = 32, overlapTokens = 4, sourceId = "x")
    assert(cs.map(_.id) == cs2.map(_.id))
  }

  test("sentenceBoundary: ids differ across sources") {
    val a = Chunkers.sentenceBoundary("One two three.", sourceId = "a")
    val b = Chunkers.sentenceBoundary("One two three.", sourceId = "b")
    assert(a.head.id != b.head.id)
  }

  test("fixedSize: 2000/200 windows break at paragraph past midpoint (text.py:48-67)") {
    val para = "Lorem ipsum dolor sit amet. " * 40 // ~1120 chars
    val content = para + "\n\n" + para + "\n\n" + para
    val cs = Chunkers.fixedSize(content, chunkSize = 2000, chunkOverlap = 200, sourceId = "t")
    assert(cs.length >= 2)
    assert(cs.head.location.startsWith("chars 0-"))
    // the paragraph break at ~1148 is past midpoint 1000, so first chunk ends there
    val end0 = cs.head.location.stripPrefix("chars 0-").toInt
    assert(end0 < 2000 && end0 > 1000)
  }

  test("fixedSize: covers whole content (overlapping windows)") {
    val content = ("abcdefghij" * 100) // 1000 chars, no paragraph breaks
    val cs = Chunkers.fixedSize(content, chunkSize = 300, chunkOverlap = 50, sourceId = "t")
    // windows: [0,300) [250,550) [500,800) [750,1050)
    assert(cs.length == 4)
    assert(cs.map(_.text.length).sum >= content.length)
  }

  test("markdown: heading hierarchy in location (markdown.py:45-53)") {
    val md =
      """# Title
        |intro text
        |## Section A
        |body a
        |### Sub A1
        |body a1
        |## Section B
        |body b""".stripMargin
    val cs = Chunkers.markdown(md, "m")
    assert(cs.map(_.location) ==
      Seq("Title", "Title > Section A", "Title > Section A > Sub A1", "Title > Section B"))
    // prose folds into the PRECEDING chunk
    assert(cs(0).text.contains("intro text"))
    assert(cs(1).text.contains("body a"))
    assert(cs(3).text.contains("body b"))
  }

  test("markdown: no headings → single root chunk (markdown.py:77-85)") {
    val cs = Chunkers.markdown("just prose\nmore prose", "m")
    assert(cs.length == 1)
    assert(cs.head.location == "root")
    assert(cs.head.text == "just prose\nmore prose")
  }
}
