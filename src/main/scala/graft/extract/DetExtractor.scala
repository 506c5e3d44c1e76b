package graft.extract

import graft.core.TextSpec
import java.util.Locale

/** Deterministic mention-detection + triple-extraction spec, version
  * [[TextSpec.version]].
  *
  * Re-expresses the semantics of the reference's default extraction strategy
  * (SpaCyExtractor, packages/qortex-online/src/qortex/online/extractor.py:
  * 158-380) WITHOUT a model: capitalized-token runs stand in for NER spans,
  * adjacency-window SVO patterns stand in for the dependency parse. The
  * shape-level contract kept from the reference:
  *
  *   - mention names are title-cased (extractor.py:113-115), min length 2
  *     (extractor.py:129), deduped case-insensitively per document with
  *     entity-like spans winning over noun-phrase-like ones
  *     (_deduplicate_spans, extractor.py:118-155)
  *   - entity-like mentions carry confidence 0.9, noun-phrase-like 0.7
  *     (extractor.py:131-136, 146-151)
  *   - SVO triples: subject-mention VERB object-mention within a sentence,
  *     verb lemma mapped through the verbatim verb→relation table
  *     (extractor.py:102-110, 367-380), confidence 0.6 base
  *     (extractor.py:341), deduped on (subj, obj, type) per document
  *     (extractor.py:334-344)
  *   - coordination "X and Y" between two mentions → SIMILAR_TO at 0.5
  *     (extractor.py:347-363)
  *
  * Our additions (needed because we have no dependency parser, and to make
  * the pruning pipeline's strength/competing logic observable):
  *
  *   - verbs for the causal relation types (SUPPORTS / CHALLENGES /
  *     CONTRADICTS / ALTERNATIVE_TO / PART_OF) — the enum defines them
  *     (src/qortex/core/models.py:25-52) but the online extractor never emits
  *     them; batch LLM extraction does (anthropic.py:163-305)
  *   - confidence bonus: +0.15 when both endpoints are entity-like mentions,
  *     +0.05 when exactly one is (so confidences ∈ {0.60,0.65,0.70,0.75} and
  *     P2/P5 thresholds at 0.55/0.65/0.70 all bite)
  *
  * Everything here is a pure function of the input string — the Spark
  * pipeline calls it inside flatMap; the sequential oracle calls the same
  * code; goldens pin the behavior.
  */
object DetExtractor {

  final case class Token(text: String, begin: Int, end: Int) {
    def lower: String = text.toLowerCase(Locale.ROOT)
    def capitalized: Boolean = {
      val c = text.charAt(0); c >= 'A' && c <= 'Z'
    }
  }

  final case class Mention(
      name: String, // title-cased
      raw: String,
      begin: Int,
      end: Int,
      tokBegin: Int, // token index range within the sentence
      tokEnd: Int, // exclusive
      confidence: Double,
      description: String,
      // E10 concept_role (ingest/base.py:166-171): a mention introduced by
      // "such as" / "for example" / "e.g." is illustrative of the nearest
      // preceding mention in the sentence (null if none → orphan).
      role: String = "generalizable",
      illustrates: String = null
  )

  final case class Triple(
      subj: String,
      pred: String,
      obj: String,
      confidence: Double,
      sentence: String
  )

  final case class Extraction(mentions: Vector[Mention], triples: Vector[Triple])

  /** Extended verb→relation map: reference table first (TextSpec),
    * then our causal/structural additions.
    */
  private val extraVerbs: Map[String, String] = Map(
    "support" -> "SUPPORTS", "enable" -> "SUPPORTS", "justify" -> "SUPPORTS",
    "challenge" -> "CHALLENGES", "complicate" -> "CHALLENGES", "hinder" -> "CHALLENGES",
    "contradict" -> "CONTRADICTS", "oppose" -> "CONTRADICTS",
    "replace" -> "ALTERNATIVE_TO", "substitute" -> "ALTERNATIVE_TO",
    "compose" -> "PART_OF", "constitute" -> "PART_OF"
  )

  val allRelationVerbs: Set[String] = TextSpec.relationVerbs ++ extraVerbs.keySet

  def verbToRelation(lemmaStr: String): String =
    if (TextSpec.relationVerbs.contains(lemmaStr)) TextSpec.verbToRelation(lemmaStr)
    else extraVerbs.getOrElse(lemmaStr, "RELATED_TO")

  private def lemmaOf(lower: String): String = {
    val l = TextSpec.lemma(lower)
    if (allRelationVerbs.contains(l)) l
    else {
      // retry suffix strips against the extended verb set
      val candidates = Seq(
        lower.stripSuffix("ing"), lower.stripSuffix("ing") + "e",
        lower.stripSuffix("ed"), lower.stripSuffix("ed") + "e",
        lower.stripSuffix("es"), lower.stripSuffix("s")
      )
      candidates.find(c => c != lower && allRelationVerbs.contains(c)).getOrElse(l)
    }
  }

  private val tokenRe = "[A-Za-z0-9][A-Za-z0-9'\\-]*".r
  private val sentenceSplit = "(?<=[.!?\\n])\\s+"

  def tokens(s: String): Vector[Token] =
    tokenRe.findAllMatchIn(s).map(m => Token(m.matched, m.start, m.end)).toVector

  /** Max token gap between a mention and its verb / a verb and its object. */
  private val SvoGap = 3

  def extract(text: String): Extraction = {
    if (text == null || text.trim.isEmpty) return Extraction(Vector.empty, Vector.empty)

    val sentences = text.trim.split(sentenceSplit).toVector
    var allMentions = Vector.empty[Mention]
    var allTriples = Vector.empty[Triple]
    // per-document (s,o,type) dedup — extractor.py:312, 334-344
    val seenTriples = scala.collection.mutable.Set.empty[(String, String, String)]

    for (sentence <- sentences) {
      val toks = tokens(sentence)
      val mentions = detectMentions(sentence, toks)
      allMentions ++= mentions
      allTriples ++= inferTriples(sentence.trim, toks, mentions, seenTriples)
    }
    Extraction(dedupMentions(allMentions), allTriples)
  }

  /** Maximal runs of capitalized tokens. Runs of ≥2 tokens are entity-like
    * (conf 0.9); single capitalized tokens are noun-phrase-like (conf 0.7)
    * unless they are sentence-initial stopwords/relation-verbs (the
    * capitalization carries no signal there — the stand-in for spaCy's
    * PRON/DET noun-chunk filter, extractor.py:278-279).
    */
  def detectMentions(sentence: String, toks: Vector[Token]): Vector[Mention] = {
    val out = Vector.newBuilder[Mention]
    var i = 0
    while (i < toks.length) {
      if (toks(i).capitalized) {
        var j = i
        while (j < toks.length && toks(j).capitalized) j += 1
        val runLen = j - i
        val raw = sentence.substring(toks(i).begin, toks(j - 1).end)
        val name = TextSpec.titleCase(raw)
        val sentenceInitial = i == 0
        val lowerFirst = toks(i).lower
        val skipSingle = runLen == 1 && sentenceInitial &&
          (TextSpec.stopwords.contains(lowerFirst) || allRelationVerbs.contains(lemmaOf(lowerFirst)))
        val isDigitOnly = raw.forall(c => !Character.isLetter(c))
        if (name.length >= 2 && !skipSingle && !isDigitOnly) {
          if (runLen >= 2)
            out += Mention(name, raw, toks(i).begin, toks(j - 1).end, i, j, 0.9,
              s"Named entity: ${raw.trim}")
          else
            out += Mention(name, raw, toks(i).begin, toks(j - 1).end, i, j, 0.7,
              s"Noun phrase: ${raw.trim}")
        }
        i = j
      } else i += 1
    }
    markIllustrative(toks, out.result())
  }

  /** E10 pass-1 role tagging: a mention directly preceded by the token pair
    * "such as" / "for example" / "e g" (from "e.g.") is illustrative; its
    * parent is the nearest preceding mention in the sentence (the
    * deterministic stand-in for the LLM's `illustrates` field,
    * ingest/base.py:166-171, 190-192).
    */
  private def markIllustrative(toks: Vector[Token], ms: Vector[Mention]): Vector[Mention] = {
    if (ms.isEmpty) return ms
    ms.zipWithIndex.map { case (m, k) =>
      val b = m.tokBegin
      val introduced = b >= 2 && {
        val w1 = toks(b - 2).lower; val w2 = toks(b - 1).lower
        (w1 == "such" && w2 == "as") ||
        (w1 == "for" && w2 == "example") ||
        (w1 == "e" && w2 == "g")
      }
      if (!introduced) m
      else m.copy(role = "illustrative",
        illustrates = if (k > 0) ms(k - 1).name else null)
    }
  }

  /** Case-insensitive per-document name dedup; higher confidence wins, then
    * generalizable beats illustrative on ties (so a page's generalizable
    * witness survives even when an illustrative occurrence of the same name
    * precedes it — matching the 'generalizable wins' upsert semantics of
    * Linking.buildConcepts), then earlier position
    * (entities-beat-noun-chunks of extractor.py:139-153).
    */
  def dedupMentions(ms: Vector[Mention]): Vector[Mention] = {
    def rolePri(m: Mention): Int = if (m.role == "illustrative") 0 else 1
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Mention]
    for (m <- ms) {
      val k = m.name.toLowerCase(Locale.ROOT)
      seen.get(k) match {
        case Some(prev)
            if prev.confidence > m.confidence ||
              (prev.confidence == m.confidence && rolePri(prev) >= rolePri(m)) => ()
        case _ => seen.update(k, m)
      }
    }
    seen.values.toVector
  }

  private def inferTriples(
      sentence: String,
      toks: Vector[Token],
      mentions: Vector[Mention],
      seen: scala.collection.mutable.Set[(String, String, String)]
  ): Vector[Triple] = {
    val out = Vector.newBuilder[Triple]
    if (mentions.isEmpty) return Vector.empty
    // token index → mention covering it
    val covering = new Array[Int](toks.length)
    java.util.Arrays.fill(covering, -1)
    mentions.zipWithIndex.foreach { case (m, mi) =>
      var t = m.tokBegin; while (t < m.tokEnd) { covering(t) = mi; t += 1 }
    }

    // integer thousandths so 0.6+0.075+0.075 lands exactly on 0.75
    def confOf(a: Mention, b: Mention): Double =
      (600 + (if (a.confidence >= 0.9) 75 else 0) + (if (b.confidence >= 0.9) 75 else 0)) / 1000.0

    // SVO: verb token with a mention ending ≤ SvoGap tokens before it and a
    // mention starting ≤ SvoGap tokens after it
    var vi = 0
    while (vi < toks.length) {
      val t = toks(vi)
      if (covering(vi) == -1 && !t.capitalized) {
        val lm = lemmaOf(t.lower)
        if (allRelationVerbs.contains(lm)) {
          val subj = mentions.reverseIterator
            .find(m => m.tokEnd <= vi && vi - m.tokEnd <= SvoGap)
          val obj = mentions.iterator
            .find(m => m.tokBegin > vi && m.tokBegin - 1 - vi <= SvoGap)
          (subj, obj) match {
            case (Some(s), Some(o)) if s.name != o.name =>
              val rel = verbToRelation(lm)
              val key = (s.name, o.name, rel)
              if (!seen.contains(key)) {
                seen += key
                out += Triple(s.name, rel, o.name, confOf(s, o), sentence)
              }
            case _ => ()
          }
        }
      }
      vi += 1
    }

    // Coordination: mention "and" mention, strictly adjacent → SIMILAR_TO 0.5
    // (+ entity bonus, symmetric with SVO)
    var ti = 0
    while (ti < toks.length) {
      if (covering(ti) == -1 && toks(ti).lower == "and") {
        val left = mentions.find(_.tokEnd == ti)
        val right = mentions.find(_.tokBegin == ti + 1)
        (left, right) match {
          case (Some(a), Some(b)) if a.name != b.name =>
            val key = (a.name, b.name, "SIMILAR_TO")
            if (!seen.contains(key)) {
              seen += key
              out += Triple(a.name, "SIMILAR_TO", b.name,
                (confOf(a, b) * 1000 - 100).round / 1000.0, sentence)
            }
          case _ => ()
        }
      }
      ti += 1
    }
    out.result()
  }
}
