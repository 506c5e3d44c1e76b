package graft.fixtures

import graft.core.PageRow
import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic Common-Crawl-style pages generator (FIXTURES.md §1).
  *
  * Pure function of (seed, i): page i's host, timestamp, entities, and
  * sentences are all derived from a splitmix64 stream seeded by (seed, i) —
  * no java.util.Random state shared across rows, so generation is identical
  * regardless of partitioning or order. Distributed via spark.range.
  *
  * Built-in skew (SURVEY.md §7.5): Zipf-ish host distribution (host0 owns
  * ~30% of pages) and head entities ("The Platform", "Oauth2 Tokens")
  * appearing in a large fraction of documents.
  *
  * Closed-form expected triples: sentence templates place entity surface
  * forms around relation verbs drawn from the extractor's verb→relation
  * map, so the oracle (graft.oracle.SeqOracle) recovers the exact triple
  * set by running the same DetExtractor spec sequentially.
  */
object PagesGen {

  // --- splitmix64: tiny, deterministic, allocation-free PRNG ---
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private final class Rng(seed: Long) {
    private var state = seed
    def nextLong(): Long = { state = mix(state); state }
    def nextInt(bound: Int): Int = {
      val v = (nextLong() >>> 1) % bound
      v.toInt
    }
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
  }

  // Closed entity vocabulary: multiword Title-Case names + their aliases.
  // Head entities first (appear in ~40% of docs).
  val headEntities: Vector[String] = Vector("The Platform", "Oauth2 Tokens")
  val entities: Vector[String] = Vector(
    "Dependency Injection", "Service Registry", "Message Queue",
    "Auth Module", "Session Store", "Rate Limiter", "Config Loader",
    "Query Planner", "Cache Layer", "Token Bucket", "Event Bus",
    "Retry Policy", "Circuit Breaker", "Feature Flags", "Audit Log",
    "Schema Registry", "Data Catalog", "Lineage Tracker", "Access Control",
    "Key Vault", "Load Balancer", "Edge Proxy", "Blob Store",
    "Index Builder", "Merge Scheduler", "Vector Index", "Graph Engine",
    "Rule Engine", "Stream Processor", "Batch Runner"
  )
  val aliases: Map[String, String] = Map(
    "Dependency Injection" -> "DI",
    "Message Queue" -> "MQ",
    "Access Control" -> "AC",
    "Load Balancer" -> "LB"
  )

  // Relation verbs: 3rd-person-singular surface forms whose lemmas map
  // through DetExtractor.verbToRelation (reference verbs verbatim from
  // extractor.py:102-110 + our documented causal extensions).
  val verbs: Vector[String] = Vector(
    "uses", "requires", "contains", "implements", "refines",
    "invokes", "needs", "includes", "extends", "supports",
    "challenges", "contradicts", "replaces"
  )

  // filler words — lowercase so they never form mentions; long enough
  // clauses push sentences past the 8-content-token pruning floor
  private val fillers = Vector(
    "reliably", "internally", "across regions", "under heavy load",
    "during nightly compaction", "for every tenant", "behind the gateway",
    "within strict latency budgets", "according to policy",
    "when traffic spikes", "after each deploy", "without downtime"
  )

  def allEntities: Vector[String] = headEntities ++ entities

  /** One page's full text, deterministic in (seed, i). */
  def pageText(seed: Long, i: Long): String = {
    val rng = new Rng(mix(seed ^ 0x5eedL) ^ mix(i))
    val nSentences = 4 + rng.nextInt(8)
    val sb = new StringBuilder
    var s = 0
    while (s < nSentences) {
      val useHead = rng.nextDouble() < 0.4
      val subj =
        if (useHead) headEntities(rng.nextInt(headEntities.length))
        else entities(rng.nextInt(entities.length))
      val kind = rng.nextInt(10)
      if (kind < 6) {
        // SVO sentence: Subject VERB Object + filler clauses
        var obj = entities(rng.nextInt(entities.length))
        if (obj == subj) obj = entities((entities.indexOf(obj) + 1) % entities.length)
        val verb = verbs(rng.nextInt(verbs.length))
        val f1 = fillers(rng.nextInt(fillers.length))
        val f2 = fillers(rng.nextInt(fillers.length))
        sb.append(s"$subj $verb $obj $f1 and stays consistent $f2.\n")
      } else if (kind < 8) {
        // coordination sentence: X and Y
        var other = entities(rng.nextInt(entities.length))
        if (other == subj) other = entities((entities.indexOf(other) + 1) % entities.length)
        val f1 = fillers(rng.nextInt(fillers.length))
        sb.append(s"$subj and $other share operational traits $f1 in production clusters.\n")
      } else if (kind == 8) {
        // alias sentence (canonicalization seed)
        val named = aliases.keys.toVector.sorted
        val full = named(rng.nextInt(named.length))
        sb.append(s"${full} is also known as ${aliases(full)} among platform engineers.\n")
      } else {
        // plain prose, no mentions beyond the subject
        val f1 = fillers(rng.nextInt(fillers.length))
        sb.append(s"$subj remains stable $f1 even as deployments roll forward.\n")
      }
      s += 1
    }
    sb.toString.trim
  }

  /** Zipf-ish host id: host0 gets ~30%, long tail across nHosts. */
  def hostOf(seed: Long, i: Long, nHosts: Int): Int = {
    val r = new Rng(mix(seed ^ 0x4057L) ^ mix(i)).nextDouble()
    if (r < 0.30) 0
    else {
      // geometric-ish tail
      val t = new Rng(mix(seed ^ 0x7a11L) ^ mix(i)).nextDouble()
      1 + math.min(nHosts - 2, (-math.log1p(-t) * (nHosts / 6.0)).toInt)
    }
  }

  /** Uniform [0,1) draw deciding a page's lang — shared with the oracle so
    * both sides agree on which pages the `lang == "en"` filter keeps.
    */
  def langDraw(seed: Long, i: Long): Double =
    new Rng(mix(seed ^ 0x1a46L) ^ mix(i)).nextDouble()

  /** Wrap text in deterministic HTML incl. nav/script noise the extractor
    * must strip (FIXTURES.md §1) — pins the html→text spec.
    */
  def wrapHtml(title: String, text: String): String = {
    val paras = text.split("\n").map(p => s"<p>$p</p>").mkString("\n")
    s"""<html><head><title>$title</title><script>var t = 1 < 2;</script>
       |<style>p { color: #333; }</style></head>
       |<body><nav><ul><li>Home</li><li>Docs</li></ul></nav>
       |<h1>$title</h1>
       |$paras
       |<footer>© example corp</footer></body></html>""".stripMargin
  }

  /** Generate the pages Dataset. `days` spreads warc_ts over a partition
    * dimension; `langSkew` fraction of pages get a non-"en" lang (the
    * pipeline filters them, exercising predicate pushdown).
    */
  def pages(
      spark: SparkSession,
      n: Long,
      seed: Long = 42L,
      nHosts: Int = 50,
      days: Int = 4,
      nonEnFraction: Double = 0.1
  ): Dataset[PageRow] = {
    import spark.implicits._
    val baseTs = 1735689600000L // 2025-01-01T00:00:00Z — fixed epoch, no Date.now
    spark.range(0, n).map { i =>
      val host = hostOf(seed, i, nHosts)
      val day = new Rng(mix(seed ^ 0xda7eL) ^ mix(i)).nextInt(days)
      val text = pageText(seed, i)
      val title = s"Page $i"
      val html = wrapHtml(title, text)
      val lang = if (langDraw(seed, i) < nonEnFraction) "de" else "en"
      val ts = new Timestamp(baseTs + day * 86400000L + (i % 86400L) * 1000L)
      val dayStr = java.time.Instant.ofEpochMilli(ts.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      PageRow(
        url = s"https://host$host.example.com/page/$i",
        warc_ts = ts,
        html = html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        text = null, // pipeline must (re)extract from html
        lang = lang,
        day = dayStr)
    }
  }
}
