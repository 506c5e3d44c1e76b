package graft.oracle

import graft.fixtures.PagesGen
import graft.pipeline.Ingest
import java.nio.charset.StandardCharsets

/** Single-threaded reference oracle (SURVEY.md §7.3): runs the SAME
  * extraction spec (Html2Text → SentenceBoundaryChunker → DetExtractor) as
  * a sequential fold over the generated pages — no Spark, no partitioning,
  * no shuffles. Plays the role qortex's committed golden manifest plays
  * (ch05_manifest.json: 405 concepts / 23 edges / 7 rules for CH5.txt,
  * counts at ch05_manifest.json:9-11): the distributed pipeline's triple
  * set is compared against this with precision/recall ≥ 0.95 required.
  * Any divergence is a parallelism/ordering bug by construction, since the
  * per-chunk spec is shared code.
  */
object SeqOracle {

  final case class OracleResult(
      textSha: Map[String, String], // url → sha256(text) (byte-identical gate)
      triples: Set[(String, String, String)], // deduped (subj, pred, obj)
      tripleRows: Vector[(String, String, String, Double, String)], // + conf, url
      mentionNames: Set[String])

  def run(
      n: Long,
      seed: Long = 42L,
      nHosts: Int = 50,
      days: Int = 4,
      nonEnFraction: Double = 0.1,
      cfg: Ingest.Config = Ingest.Config()
  ): OracleResult = {
    var textSha = Map.empty[String, String]
    val triples = scala.collection.mutable.LinkedHashSet.empty[(String, String, String)]
    val rows = Vector.newBuilder[(String, String, String, Double, String)]
    val names = scala.collection.mutable.Set.empty[String]

    var i = 0L
    while (i < n) {
      val host = PagesGen.hostOf(seed, i, nHosts)
      val url = s"https://host$host.example.com/page/$i"
      val lang = langOf(seed, i, nonEnFraction)
      if (cfg.langFilter.forall(_ == lang)) {
        val text = PagesGen.pageText(seed, i)
        val html = PagesGen.wrapHtml(s"Page $i", text)
          .getBytes(StandardCharsets.UTF_8)
        val ce = Ingest.extractPage(url, "d", html, cfg)
        textSha = textSha.updated(url, ce.text_sha256)
        for (m <- ce.mentions) names += m.name.toLowerCase(java.util.Locale.ROOT)
        for (t <- ce.triples) {
          triples += ((t.subj, t.pred, t.obj))
          rows += ((t.subj, t.pred, t.obj, t.confidence, url))
        }
      }
      i += 1
    }
    OracleResult(textSha, triples.toSet, rows.result(), names.toSet)
  }

  /** Must stay in lockstep with PagesGen's lang draw. */
  def langOf(seed: Long, i: Long, nonEnFraction: Double): String =
    if (PagesGen.langDraw(seed, i) < nonEnFraction) "de" else "en"

  /** Precision/recall of a candidate triple set vs the oracle set. */
  def precisionRecall(
      candidate: Set[(String, String, String)],
      oracle: Set[(String, String, String)]): (Double, Double) = {
    if (candidate.isEmpty || oracle.isEmpty) return (0.0, 0.0)
    val tp = candidate.intersect(oracle).size.toDouble
    (tp / candidate.size, tp / oracle.size)
  }
}
