package graft.extract

import java.util.Locale

/** Deterministic code-example extraction (E9's code half).
  *
  * The reference extracts code examples via an LLM prompt
  * (packages/qortex-ingest/src/qortex/ingest/backends/anthropic.py:385-454)
  * into the CodeExample shape (src/qortex/core/models.py:91-119): code,
  * language, description, concept links, is_antipattern, tags. This is the
  * deterministic stand-in: fenced blocks (``` / ```lang) in the
  * html2text-normalized page text. (Indented-block detection is impossible
  * after Html2Text's per-line whitespace collapse — fences are the one code
  * delimiter that survives normalization, so they ARE the spec here.)
  *
  *  - language  = the fence info string, "unknown" if absent
  *  - description = nearest preceding non-empty, non-fence line
  *  - is_antipattern = description matches (do not | bad example |
  *    anti-pattern) — the deterministic version of the LLM's judgment
  *  - names = lowercased mention names detected in the description line;
  *    the pipeline equi-joins them to the concept dictionary (same linking
  *    rule as explicit rules, ingest/base.py:300-306)
  */
object CodeExamples {

  final case class CodeLite(
      code: String,
      language: String,
      description: String,
      is_antipattern: Boolean,
      names: Seq[String])

  private val fenceRe = "^```([A-Za-z0-9_+\\-]*)\\s*$".r
  private val antipatternRe =
    "(?i)\\b(do not|bad example|anti-?pattern)\\b".r

  /** Pure per-page extraction — shared by the distributed flatMap and the
    * sequential oracle.
    */
  def extractBlocks(text: String): Vector[CodeLite] = {
    if (text == null || text.isEmpty) return Vector.empty
    val lines = text.split("\n", -1)
    val out = Vector.newBuilder[CodeLite]
    var i = 0
    var lastProse = ""
    while (i < lines.length) {
      lines(i).trim match {
        case fenceRe(info) =>
          // scan to the closing fence; unterminated fences yield no block
          var j = i + 1
          while (j < lines.length && !lines(j).trim.startsWith("```")) j += 1
          if (j < lines.length) {
            val code = lines.slice(i + 1, j).mkString("\n")
            if (code.trim.nonEmpty) {
              val desc = lastProse
              val toks = DetExtractor.tokens(desc)
              val names = DetExtractor.detectMentions(desc, toks)
                .map(_.name.toLowerCase(Locale.ROOT)).distinct.sorted
              out += CodeLite(
                code = code,
                language = if (info.isEmpty) "unknown" else info.toLowerCase(Locale.ROOT),
                description = desc,
                is_antipattern = antipatternRe.findFirstIn(desc).isDefined,
                names = names)
            }
            i = j + 1
          } else i = j
        case l =>
          if (l.nonEmpty) lastProse = l
          i += 1
      }
    }
    out.result()
  }
}
