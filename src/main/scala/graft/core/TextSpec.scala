package graft.core

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Locale

/** Pure, deterministic text functions shared by the distributed pipeline and
  * the single-threaded oracle. Versioned: any semantic change must bump
  * [[TextSpec.version]] — the P/R comparison refuses to compare across
  * versions (SURVEY.md §7.3).
  */
object TextSpec {

  /** Stamped into every triple/concept row. */
  val version: String = "det-1.0.0"

  /** Python str.title() semantics (reference _title_case,
    * packages/qortex-online/src/qortex/online/extractor.py:113-115):
    * collapse whitespace, strip, then capitalize every letter that follows a
    * non-letter and lowercase the rest. NOT the same as `initcap` (which only
    * splits on whitespace): "don't" → "Don'T".
    */
  def titleCase(text: String): String = {
    val collapsed = text.trim.replaceAll("\\s+", " ")
    val sb = new java.lang.StringBuilder(collapsed.length)
    var prevIsLetter = false
    var i = 0
    while (i < collapsed.length) {
      val c = collapsed.charAt(i)
      if (Character.isLetter(c)) {
        sb.append(if (prevIsLetter) Character.toLowerCase(c) else Character.toUpperCase(c))
        prevIsLetter = true
      } else {
        sb.append(c)
        prevIsLetter = false
      }
      i += 1
    }
    sb.toString
  }

  /** Stopword list copied verbatim from src/qortex/core/pruning.py:216-303. */
  val stopwords: Set[String] = Set(
    "a", "an", "the", "is", "are", "was", "were", "be", "been", "being",
    "have", "has", "had", "do", "does", "did", "will", "would", "could",
    "should", "may", "might", "must", "shall", "can", "to", "of", "in",
    "for", "on", "with", "at", "by", "from", "as", "into", "through",
    "during", "before", "after", "above", "below", "between", "under",
    "again", "further", "then", "once", "here", "there", "when", "where",
    "why", "how", "all", "each", "few", "more", "most", "other", "some",
    "such", "no", "nor", "not", "only", "own", "same", "so", "than", "too",
    "very", "just", "and", "but", "if", "or", "because", "until", "while",
    "this", "that", "these", "those", "it", "its"
  )

  private val wordRe = "\\b[a-z]+\\b".r

  /** Evidence tokenizer for Jaccard: lowercase `\b[a-z]+\b` words minus
    * stopwords, as a SET (src/qortex/core/pruning.py:204-305).
    */
  def tokenize(text: String): Set[String] =
    if (text == null || text.isEmpty) Set.empty
    else wordRe.findAllIn(text.toLowerCase(Locale.ROOT)).toSet.diff(stopwords)

  /** |A∩B| / |A∪B| (src/qortex/core/pruning.py:308-314). */
  def jaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val inter = a.intersect(b).size
    val union = a.size + b.size - inter
    if (union > 0) inter.toDouble / union else 0.0
  }

  /** Hex sha256; chunk ids take the first 16 hex chars of
    * sha256("{source}:{idx}:{text.take(64)}") — chunker.py:71-82.
    */
  def sha256Hex(s: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val bytes = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  def chunkId(sourceId: String, idx: Int, text: String): String =
    sha256Hex(s"$sourceId:$idx:${text.take(64)}").take(16)

  // --- Verb → relation map, verbatim from extractor.py:102-110, 367-380 ---
  private val verbUses = Set("use", "utilize", "call", "invoke")
  private val verbRequires = Set("require", "need", "depend", "import")
  private val verbContains = Set("contain", "include", "have", "hold")
  private val verbImplements = Set("implement", "extend", "inherit")
  private val verbRefines = Set("refine", "specialize", "customize")

  val relationVerbs: Set[String] =
    verbUses ++ verbRequires ++ verbContains ++ verbImplements ++ verbRefines

  def verbToRelation(lemma: String): String =
    if (verbUses.contains(lemma)) "USES"
    else if (verbRequires.contains(lemma)) "REQUIRES"
    else if (verbContains.contains(lemma)) "CONTAINS"
    else if (verbImplements.contains(lemma)) "IMPLEMENTS"
    else if (verbRefines.contains(lemma)) "REFINES"
    else "RELATED_TO"

  /** Minimal deterministic lemmatizer sufficient for the closed verb
    * vocabulary above (the reference gets lemmas from spaCy; our contract
    * only needs the relation verbs + their regular inflections to normalize).
    */
  def lemma(tokenLower: String): String = tokenLower match {
    case "has" | "have" | "had" | "having" => "have"
    case "uses" | "used" | "using"         => "use"
    case w if w.length > 4 && w.endsWith("ies") => w.dropRight(3) + "y"
    case w if w.endsWith("sses")           => w.dropRight(2)
    case w =>
      // try progressively weaker suffix strips; accept the first whose base
      // is a known relation verb, else strip a plain plural 's'
      val candidates = Seq(
        w.stripSuffix("ing"), w.stripSuffix("ing") + "e",
        w.stripSuffix("ed"), w.stripSuffix("ed") + "e",
        w.stripSuffix("es"), w.stripSuffix("s")
      )
      candidates.find(c => c != w && relationVerbs.contains(c)).getOrElse {
        if (w.endsWith("s") && !w.endsWith("ss")) w.dropRight(1) else w
      }
  }
}
