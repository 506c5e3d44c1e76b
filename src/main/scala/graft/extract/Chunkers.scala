package graft.extract

import graft.core.TextSpec

/** Deterministic chunking strategies, re-expressing the reference's three
  * chunkers as pure functions used inside `flatMap` over the pages Dataset
  * (UDTF-shaped: one doc → N chunks; SURVEY.md §2.10).
  */
object Chunkers {

  final case class Chunk(id: String, text: String, index: Int, location: String)

  /** Sentence-boundary chunker — the primary chunker for web text.
    * Semantics of packages/qortex-online/src/qortex/online/chunker.py:42-84:
    * regex split `(?<=[.!?\n])\s+` on the stripped text, greedy packing to
    * max_tokens*4 chars, carry the last overlap_tokens*4 chars into the next
    * chunk, deterministic id = sha256("{source}:{idx}:{current[:64]}")[:16].
    */
  def sentenceBoundary(
      text: String,
      maxTokens: Int = 256,
      overlapTokens: Int = 32,
      sourceId: String = ""
  ): Seq[Chunk] = {
    if (text == null || text.trim.isEmpty) return Seq.empty
    val maxChars = maxTokens * 4
    val overlapChars = overlapTokens * 4

    val sentences = text.trim.split("(?<=[.!?\\n])\\s+")
    val chunks = Vector.newBuilder[Chunk]
    var current = ""
    var idx = 0

    for (sentence <- sentences) {
      if (current.length + sentence.length > maxChars && current.nonEmpty) {
        val ct = current.trim
        chunks += Chunk(TextSpec.chunkId(sourceId, idx, current), ct, idx, s"chunk $idx")
        idx += 1
        current =
          if (overlapChars > 0) current.takeRight(overlapChars) + " " + sentence
          else sentence
      } else {
        current = if (current.nonEmpty) (current + " " + sentence).trim else sentence
      }
    }
    if (current.trim.nonEmpty) {
      chunks += Chunk(TextSpec.chunkId(sourceId, idx, current), current.trim, idx, s"chunk $idx")
    }
    chunks.result()
  }

  /** Fixed-size char windows with paragraph-boundary preference.
    * Semantics of packages/qortex-ingest/src/qortex/ingest/text.py:32-70:
    * 2000-char windows, 200 overlap, break at the last "\n\n" if it falls
    * past the window midpoint; location = "chars {start}-{end}".
    */
  def fixedSize(
      content: String,
      chunkSize: Int = 2000,
      chunkOverlap: Int = 200,
      sourceId: String = ""
  ): Seq[Chunk] = {
    if (content == null || content.isEmpty) return Seq.empty
    require(chunkSize > chunkOverlap, "chunkSize must exceed chunkOverlap")
    val chunks = Vector.newBuilder[Chunk]
    var start = 0
    var num = 0
    while (start < content.length) {
      var end = start + chunkSize // uncapped, exactly like the reference
      var chunkText = content.substring(start, math.min(end, content.length))
      if (end < content.length) {
        val lastPara = chunkText.lastIndexOf("\n\n")
        if (lastPara > chunkSize / 2) {
          chunkText = chunkText.substring(0, lastPara)
          end = start + lastPara
        }
      }
      chunks += Chunk(
        TextSpec.chunkId(sourceId, num, chunkText),
        chunkText.trim, num, s"chars $start-$end")
      start = end - chunkOverlap
      num += 1
    }
    chunks.result()
  }

  /** Markdown heading-hierarchy chunker.
    * Semantics of packages/qortex-ingest/src/qortex/ingest/markdown.py:16-87:
    * split on ^#{1,6} headings, keep a heading stack for location
    * "H1 > H2 > ...", fold prose into the preceding chunk, trailing prose
    * into the last chunk (or a single "root" chunk when no headings).
    */
  def markdown(content: String, sourceId: String = ""): Seq[Chunk] = {
    if (content == null || content.isEmpty) return Seq.empty
    val headingRe = "(?m)^(#{1,6})\\s+(.+)$".r
    var chunks = Vector.empty[Chunk]
    var lastEnd = 0
    var hierarchy = List.empty[String] // reversed stack

    def appendToLast(extra: String): Unit =
      if (extra.nonEmpty && chunks.nonEmpty) {
        val last = chunks.last
        chunks = chunks.init :+ last.copy(text = last.text + "\n\n" + extra)
      }

    for (m <- headingRe.findAllMatchIn(content)) {
      if (m.start > lastEnd) appendToLast(content.substring(lastEnd, m.start).trim)
      val level = m.group(1).length
      val title = m.group(2).trim
      while (hierarchy.length >= level) hierarchy = hierarchy.tail
      hierarchy = title :: hierarchy
      val location = hierarchy.reverse.mkString(" > ")
      chunks = chunks :+ Chunk(s"section_${chunks.length}", s"# $title", chunks.length, location)
      lastEnd = m.end
    }
    if (lastEnd < content.length) {
      val remaining = content.substring(lastEnd).trim
      if (remaining.nonEmpty) {
        if (chunks.nonEmpty) appendToLast(remaining)
        else chunks = chunks :+ Chunk("section_0", remaining, 0, "root")
      }
    }
    chunks
  }
}
