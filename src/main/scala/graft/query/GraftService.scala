package graft.query

import graft.projectors.Projectors
import graft.store.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The in-process service facade over a committed warehouse — the
  * orchestration surface of the reference's QortexService (service.py):
  * query → {items, query_id, rules}, feedback (with optional causal credit
  * propagation), explore, knowledge stats, and rule projection, all
  * composed from the operators this library already ships. A reference
  * user's call pattern maps 1:1; only the transport (their MCP/REST
  * wrappers) is out of scope.
  *
  * The committed tables are read once per service instance and
  * plan-truncated (`localCheckpoint`) so every query plans against leaves
  * — the "query service checkpoints its graph across queries" shape.
  */
final class GraftService(store: SnapshotStore)(implicit spark: SparkSession) {
  import spark.implicits._

  private lazy val concepts: DataFrame = store.read("concepts").localCheckpoint()
  private lazy val edges: DataFrame = store.read("edges").localCheckpoint()
  private lazy val rules: DataFrame = store.read("rules").localCheckpoint()

  /** The normalized PPR adjacency, prepared ONCE per service instance
    * (= per committed snapshot — the tables above are snapshot-pinned the
    * same way). Every query's retrieval reuses it; only that query's
    * ephemeral online edges pay new normalization work. Feedback updates
    * factors, never edges, so no invalidation is needed mid-instance.
    */
  private[query] lazy val pprGraph: graft.graph.Ppr.PreparedGraph =
    graft.graph.Ppr.prepare(edges)

  private def factors: DataFrame =
    if (store.exists("factors")) store.read("factors")
    else Seq.empty[(String, Double)].toDF("node_id", "factor")

  // service counters (service.py:439, 482-485)
  private val queryCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  private val feedbackCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  def queryCount: Long = queryCounter.get()
  def feedbackCount: Long = feedbackCounter.get()

  final case class QueryResult(
      queryId: String,
      items: DataFrame, // (id, name, vec_score, ppr, combined)
      rules: DataFrame, // (id, text, category, relevance)
      kgCoverage: Double)

  /** service.py:413-459 — top_k clamped to [1, 1000], min_confidence to
    * [0, 1], optional domain filter (node ids are "{domain}:{name}"),
    * result bundles the ranked items and their linked rules. The query id
    * is deterministic (counter + content hash) instead of the reference's
    * uuid4 — reproducible runs beat opaque ids in a distributed setting.
    */
  def query(
      context: String,
      domains: Seq[String] = Seq.empty,
      topK: Int = 20,
      minConfidence: Double = 0.0
  ): QueryResult = {
    val k = math.max(1, math.min(topK, 1000))
    val minConf = math.max(0.0, math.min(minConfidence, 1.0))
    val cs0 =
      if (domains.isEmpty) concepts
      else concepts.filter(substring_index(col("id"), ":", 1).isin(domains: _*))
    val cs = if (minConf > 0.0) cs0.filter(col("confidence") >= minConf) else cs0
    val out = Retrieval.retrieveFull(cs, edges, factors, context, k,
      rules = Some(rules), prepared = Some(pprGraph))
    // the PPR graph spans all domains (cross-domain activation is the
    // HippoRAG point), so a domain restriction must ALSO filter the scored
    // items — hippocampus/retrieval.py:137-141 filters scores the same way
    val items =
      if (domains.isEmpty) out.results
      else out.results.filter(substring_index(col("id"), ":", 1).isin(domains: _*))
    val n = queryCounter.incrementAndGet()
    val qid = s"q$n-" + java.security.MessageDigest.getInstance("SHA-256")
      .digest(context.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    // query.completed + kg_coverage — the reference emits both per query
    // (events.py QueryCompleted / KGCoverageComputed)
    graft.observe.Observe.emit("query.completed",
      "query_id" -> qid, "top_k" -> k,
      "domains" -> domains, "kg_coverage" -> out.kgCoverage)
    QueryResult(qid, items, out.rules, out.kgCoverage)
  }

  /** The service's "credit" learner (service.py:1654:
    * `_get_or_create_learner("credit")`): causal credit deltas from
    * feedback land in its per-concept posteriors. State restores from the
    * committed `learner_credit` table when present and re-persists after
    * every credit application (the reference's store.save()-per-observe).
    */
  lazy val creditLearner: graft.learning.Learner =
    graft.learning.Learner.create(
      graft.learning.LearnerConfig("credit"),
      existingState =
        if (store.exists("learner_credit")) Some(store.read("learner_credit")) else None)

  /** service.py:464-498 — validate outcomes, update + persist the
    * teleportation factors, optionally propagate causal credit through the
    * committed edge table (the _maybe_propagate_credit flag path) into
    * the credit learner's posteriors (learner.apply_credit_deltas,
    * service.py:1653-1655).
    */
  def feedback(
      queryId: String,
      outcomes: Map[String, String],
      propagateCredit: Boolean = false
  ): Either[String, Service.FeedbackResult] = {
    val df = outcomes.toSeq.toDF("node_id", "outcome")
    val res = Service.feedback(factors, df, queryId,
      persistTo = Some((store, "factors")),
      creditEdges = if (propagateCredit) Some(edges) else None,
      creditConcepts = if (propagateCredit) Some(concepts) else None)
    res.foreach { r =>
      feedbackCounter.incrementAndGet()
      r.credit.foreach { c =>
        creditLearner.applyCreditDeltas(c.posteriorDeltas)
        creditLearner.persistTo(store, "learner_credit")
      }
    }
    res
  }

  final case class ExploreResult(
      edges: DataFrame, // reachable edge subset
      neighbors: DataFrame, // (id, name) of reached concepts
      rules: DataFrame) // rules linked to any reached concept

  /** service.py:827-914 — BFS neighborhood to depth ≤ 3 from one node,
    * returning the reachable edges, the neighbor concepts, and the rules
    * linked to anything visited. None if the node doesn't exist.
    */
  def explore(nodeId: String, depth: Int = 1): Option[ExploreResult] = {
    if (concepts.filter(col("id") === nodeId).isEmpty) return None
    val d = math.max(1, math.min(depth, 3))
    val seeds = Seq(nodeId).toDF("id")
    val sub = graft.graph.Bfs.exploreEdges(edges, seeds, maxDepth = d).localCheckpoint()
    val reached = sub.select(col("source_id").as("id"))
      .unionByName(sub.select(col("target_id").as("id")))
      .unionByName(seeds)
      .distinct()
    val neighbors = reached.join(concepts.select(col("id"), col("name")), Seq("id"))
    val linked = graft.rules.Rules.rulesForConcepts(
      rules, reached.withColumn("score", lit(1.0)))
    Some(ExploreResult(sub, neighbors, linked))
  }

  /** Session-scoped online retrieval (service.py:724-785 + the gateway
    * composition over it): conversation messages index into an ephemeral
    * per-session vector domain alongside the committed KG.
    */
  lazy val sessions: SessionIndex = new SessionIndex(store)

  final case class SessionQueryResult(
      kg: QueryResult,
      sessionItems: DataFrame) // (id, role, text, score)

  /** One conversational query: the committed-KG retrieval PLUS the
    * session's own top chunks (what was said earlier in this session),
    * each ranked in its own space — the gateway merges them the same way
    * because session chunks have no KG edges to activate.
    */
  def queryWithSession(context: String, sessionId: String, topK: Int = 20,
      sessionTopK: Int = 5, nowMillis: Long = 0L): SessionQueryResult =
    SessionQueryResult(
      query(context, topK = topK),
      sessions.search(sessionId, context, sessionTopK, nowMillis))

  /** A7 per-domain knowledge stats over the committed tables. */
  def knowledgeStats(): DataFrame = Service.knowledgeStats(concepts, edges, rules)

  /** §3.3 projection over the committed rules table: split back into the
    * explicit/derived halves (derived rows carry a template_id), run the
    * projection pipeline, emit the universal ruleset artifact.
    */
  def project(
      persona: String,
      filter: Projectors.ProjectionFilter = Projectors.ProjectionFilter(),
      enrich: Boolean = true,
      projectedAt: String = "1970-01-01T00:00:00Z"
  ): String = {
    val explicitHalf = rules.filter(col("template_id") === "")
      .select("id", "text", "domain", "source_id", "concept_ids", "category", "confidence")
    val derivedHalf = rules.filter(col("template_id") =!= "")
      .select("id", "text", "domain", "concept_ids", "category", "confidence",
        "template_id", "severity")
    val src = Projectors.ruleSource(explicitHalf, derivedHalf, filter)
    val enriched = if (enrich) Projectors.enrichTemplate(src) else src
    Projectors.serializeRuleset(enriched, persona, projectedAt = projectedAt)
  }

  /** Write a projection artifact next to the warehouse (atomic). */
  def projectToFile(path: String, persona: String, projectedAt: String): Unit =
    Projectors.writeArtifact(path, project(persona, projectedAt = projectedAt))
}
