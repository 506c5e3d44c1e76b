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

  // Combinatorial long-tail vocabulary (~1600 distinct surface forms) so
  // the concept table and linking join behave like a real web corpus
  // (head entities dominate mention volume, the tail dominates cardinality).
  private val tailAdjectives = Vector(
    "Quantum", "Azure", "Crimson", "Nimble", "Stellar", "Granite", "Velvet",
    "Amber", "Cobalt", "Ivory", "Obsidian", "Scarlet", "Golden", "Silver",
    "Emerald", "Turquoise", "Magnetic", "Dynamic", "Static", "Parallel",
    "Serial", "Atomic", "Modular", "Hybrid", "Virtual", "Neural", "Logical",
    "Optimal", "Primal", "Vector", "Tensor", "Cipher", "Beacon", "Harbor",
    "Summit", "Canyon", "Meadow", "Willow", "Falcon", "Condor")
  private val tailNouns = Vector(
    "Ledger", "Gateway", "Pipeline", "Orchestrator", "Registry", "Fabric",
    "Mesh", "Router", "Broker", "Daemon", "Kernel", "Compiler", "Parser",
    "Indexer", "Crawler", "Scheduler", "Allocator", "Monitor", "Profiler",
    "Debugger", "Archiver", "Notifier", "Resolver", "Validator", "Sampler",
    "Encoder", "Decoder", "Shard", "Replica", "Snapshot", "Journal",
    "Manifest", "Catalog", "Vault", "Bridge", "Tunnel", "Relay", "Anchor",
    "Compass", "Lantern")

  def tailEntity(r1: Long, r2: Long): String =
    tailAdjectives((r1 % tailAdjectives.length).toInt) + " " +
      tailNouns((r2 % tailNouns.length).toInt)

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

  /** Draw an entity surface form: 40% head (skew), 30% core vocabulary,
    * 30% combinatorial long tail.
    */
  private def drawEntity(rng: Rng): String = {
    val r = rng.nextDouble()
    if (r < 0.40) headEntities(rng.nextInt(headEntities.length))
    else if (r < 0.70) entities(rng.nextInt(entities.length))
    else tailEntity(rng.nextLong() >>> 1, rng.nextLong() >>> 1)
  }

  /** One page's full text, deterministic in (seed, i). ~25-45 sentences
    * (~2-4 KB) — the text volume of a real Common-Crawl page, so bench
    * runs are extraction-compute-bound rather than job-overhead-bound.
    */
  def pageText(seed: Long, i: Long): String = {
    val rng = new Rng(mix(seed ^ 0x5eedL) ^ mix(i))
    val nSentences = 25 + rng.nextInt(20)
    val sb = new StringBuilder
    var s = 0
    while (s < nSentences) {
      val subj = drawEntity(rng)
      val kind = rng.nextInt(10)
      if (kind < 6) {
        // SVO sentence: Subject VERB Object + filler clauses
        var obj = drawEntity(rng)
        if (obj == subj) obj = entities(rng.nextInt(entities.length))
        val verb = verbs(rng.nextInt(verbs.length))
        val f1 = fillers(rng.nextInt(fillers.length))
        val f2 = fillers(rng.nextInt(fillers.length))
        sb.append(s"$subj $verb $obj $f1 and stays consistent $f2.\n")
      } else if (kind < 8) {
        // coordination sentence: X and Y
        var other = drawEntity(rng)
        if (other == subj) other = entities(rng.nextInt(entities.length))
        val f1 = fillers(rng.nextInt(fillers.length))
        sb.append(s"$subj and $other share operational traits $f1 in production clusters.\n")
      } else if (kind == 8) {
        // alias sentence (canonicalization seed)
        val named = aliases.keys.toVector.sorted
        val full = named(rng.nextInt(named.length))
        sb.append(s"${full} is also known as ${aliases(full)} among platform engineers.\n")
      } else {
        // normative sentence (explicit-rule source) or illustrative sentence
        // (E10 source — "such as"/"for example" mentions carry no relation
        // verb, so the triple set is untouched). Side RNG so the main
        // stream — and therefore every other sentence — is identical to
        // earlier corpus versions.
        val f1 = fillers(rng.nextInt(fillers.length))
        val r2 = new Rng(mix(seed ^ 0x777L) ^ mix(i * 97L + s))
        val obj2 = entities(r2.nextInt(entities.length))
        val roll = r2.nextDouble()
        if (roll < 0.32)
          sb.append(s"$subj must never bypass $obj2 $f1 in production environments.\n")
        else if (roll < 0.64)
          sb.append(s"$subj should always be deployed alongside $obj2 $f1 for resilience reasons.\n")
        else if (roll < 0.82)
          // illustrative with parent: obj2 illustrates subj (E10 attach path)
          sb.append(s"$subj offers integrations such as $obj2 $f1 in production.\n")
        else if (roll < 0.90) {
          // sentence-initial illustrative with NO preceding mention → orphan.
          // "Zephyr" is outside tailAdjectives, so the name never occurs as a
          // generalizable mention and stays an orphan concept.
          val orphan = "Zephyr " + tailNouns(((r2.nextLong() >>> 1) % tailNouns.length).toInt)
          sb.append(s"For example $orphan handles overflow gracefully $f1.\n")
        } else {
          // fenced code block (E9 code-example source). The description line
          // starts with a stopword run so it never forms a spurious mention;
          // ~half are antipatterns (contrastive-learning signal).
          val slug = obj2.toLowerCase(java.util.Locale.ROOT).replace(' ', '_')
          if (r2.nextDouble() < 0.5) {
            sb.append(s"The following example shows $obj2 usage $f1.\n")
            sb.append(s"```python\nclient = connect(\"$slug\")\nclient.retry(3)\n```\n")
          } else {
            sb.append(s"Do not copy this bad example for $obj2.\n")
            sb.append(s"```python\nglobals()[\"$slug\"] = 0  # mutates global state\n```\n")
          }
        }
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

  /** Partition values the generator will emit for a given `days` count —
    * the metadata-listing analog for the generated table.
    */
  def dayStrings(days: Int): Seq[String] = {
    val base = java.time.LocalDate.of(2025, 1, 1)
    (0 until days).map(d => base.plusDays(d.toLong).toString)
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
    // 4 splits per core: page sizes vary ~2×, so finer tasks avoid stragglers;
    // values are a pure function of i, so partitioning never affects content
    val splits = spark.sparkContext.defaultParallelism * 4
    spark.range(0, n, 1, splits).map { i =>
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
