package graft.extract

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

/** Deterministic HTML → text extraction.
  *
  * The reference declares a `url` source type (src/qortex/core/models.py:152)
  * but ships no HTML ingestor, so this spec is ours (SURVEY.md §1.4, §7.3)
  * and is pinned by golden-byte tests: same bytes in ⇒ same string out, on
  * any JVM, any locale, any thread count. Rules:
  *
  *   1. decode as UTF-8 (malformed sequences → U+FFFD, the java default)
  *   2. drop <script>/<style>/<template>/<noscript> elements with content
  *   3. drop <head>, <nav>, <footer>, <aside> elements with content
  *   4. drop HTML comments
  *   5. block-level tags emit '\n' (p div h1-h6 li ul ol br hr tr table
  *      section article header main blockquote pre dd dt figure figcaption)
  *   6. all remaining tags are stripped
  *   7. entities decoded: named (amp lt gt quot apos nbsp) + numeric &#NN;
  *      and &#xHH;
  *   8. whitespace normalization: per line, collapse [ \t\x0B\f\r]+ → ' ' and
  *      trim; empty lines are dropped (any newline run → exactly one '\n');
  *      final trim.
  *
  * Implemented with precompiled regexes in a fixed order — no parser
  * dependency, no locale sensitivity (Locale.ROOT everywhere).
  */
object Html2Text {

  private def elementWithContent(tag: String): Pattern =
    Pattern.compile(s"(?is)<$tag\\b[^>]*>.*?</$tag\\s*>")

  private val dropWithContent: Seq[Pattern] =
    Seq("script", "style", "template", "noscript", "head", "nav", "footer", "aside")
      .map(elementWithContent)

  private val commentRe = Pattern.compile("(?s)<!--.*?-->")

  private val blockTags =
    "p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|br|hr|tr|table|section|article|header|main|blockquote|pre|dd|dt|figure|figcaption"
  private val blockTagRe =
    Pattern.compile(s"(?i)</?(?:$blockTags)\\b[^>]*/?>")

  private val anyTagRe = Pattern.compile("(?s)<[^>]*>")

  private val numericEntityRe = Pattern.compile("&#(x[0-9a-fA-F]{1,6}|[0-9]{1,7});")

  def apply(htmlBytes: Array[Byte]): String =
    apply(new String(htmlBytes, StandardCharsets.UTF_8))

  def apply(html: String): String = {
    if (html == null || html.isEmpty) return ""
    var s = html
    s = commentRe.matcher(s).replaceAll(" ")
    dropWithContent.foreach(p => s = p.matcher(s).replaceAll(" "))
    s = blockTagRe.matcher(s).replaceAll("\n")
    s = anyTagRe.matcher(s).replaceAll(" ")
    s = decodeEntities(s)
    normalizeWhitespace(s)
  }

  private def decodeEntities(s: String): String = {
    // numeric first so "&#38;lt;" decodes to the literal "&lt;" (single pass,
    // matching how a non-re-scanning decoder behaves — pinned by tests)
    val m = numericEntityRe.matcher(s)
    val sb = new StringBuffer(s.length)
    while (m.find()) {
      val body = m.group(1)
      val cp =
        try {
          if (body.charAt(0) == 'x' || body.charAt(0) == 'X')
            Integer.parseInt(body.substring(1), 16)
          else Integer.parseInt(body, 10)
        } catch { case _: NumberFormatException => 0xfffd }
      val rep =
        if (Character.isValidCodePoint(cp) && cp != 0) new String(Character.toChars(cp))
        else "�"
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(rep))
    }
    m.appendTail(sb)
    sb.toString
      .replace("&nbsp;", " ")
      .replace("&lt;", "<")
      .replace("&gt;", ">")
      .replace("&quot;", "\"")
      .replace("&apos;", "'")
      .replace("&amp;", "&")
  }

  private val intraLineWs = Pattern.compile("[ \\t\\x0B\\f\\r]+")

  private def normalizeWhitespace(s: String): String = {
    val lines = s.split("\n", -1)
    val sb = new java.lang.StringBuilder(s.length)
    var wroteAny = false
    var i = 0
    while (i < lines.length) {
      val line = intraLineWs.matcher(lines(i)).replaceAll(" ").trim
      if (line.nonEmpty) {
        if (wroteAny) sb.append('\n')
        sb.append(line)
        wroteAny = true
      }
      i += 1
    }
    sb.toString
  }
}
