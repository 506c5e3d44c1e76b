package graft

import graft.fixtures.PagesGen
import graft.pipeline.Ingest
import graft.query.GraftService
import graft.store.SnapshotStore
import org.apache.spark.sql.functions._

/** End-to-end service facade over a freshly ingested warehouse: the
  * reference's query/feedback/explore/stats/project call pattern.
  */
class GraftServiceSuite extends SparkFunSuite {
  import spark.implicits._

  private lazy val store: SnapshotStore = {
    val dir = java.nio.file.Files.createTempDirectory("graft-svc").toString
    val st = new SnapshotStore(dir)
    Ingest.run(PagesGen.pages(spark, 80), st, Ingest.Config(),
      knownPartitions = Some(PagesGen.dayStrings(4)))
    st
  }
  private lazy val svc = new GraftService(store)(spark)

  test("query: ranked items + bundled rules + coverage, clamped top_k") {
    val r = svc.query("platform access control tokens", topK = 5)
    assert(r.queryId.startsWith("q") && r.queryId.contains("-"))
    val items = r.items.collect()
    assert(items.nonEmpty && items.length <= 5)
    assert(r.items.columns.toSeq == Seq("id", "name", "vec_score", "ppr", "combined"))
    assert(r.kgCoverage >= 0.0 && r.kgCoverage <= 1.0)
    // bundled rules (if any) have relevance ≤ the max combined score
    val maxCombined = items.map(_.getAs[Double]("combined")).max
    val bundled = r.rules.select("relevance").as[Double].collect()
    assert(bundled.forall(_ <= maxCombined + 1e-9))
    assert(svc.queryCount == 1)
    // domain filter: an unknown domain yields no items
    assert(svc.query("anything", domains = Seq("nope")).items.isEmpty)
  }

  test("feedback: validates, updates + persists factors, optional credit") {
    val item = svc.query("platform access control tokens", topK = 3)
      .items.select("id").as[String].head()
    assert(svc.feedback("q-bad", Map(item -> "great")).isLeft)
    val fb = svc.feedback("q-ok", Map(item -> "accepted"), propagateCredit = true)
      .fold(e => fail(e), identity)
    assert(fb.accepted == 1 && fb.status == "recorded")
    assert(store.exists("factors"))
    val f = store.read("factors").filter(col("node_id") === item)
      .select("factor").as[Double].head()
    assert(math.abs(f - 1.1) < 1e-9) // default 1.0 + accepted delta 0.1
    // credit: the accepted concept gets direct credit at reward 1.0
    val credit = fb.credit.getOrElse(fail("no credit summary"))
    assert(credit.directCount >= 1)
    assert(credit.posteriorDeltas(item)._1 == 1.0)
    assert(svc.feedbackCount == 1)
    // the deltas land in the service's "credit" learner (service.py:1653)
    // and its state is committed next to the warehouse
    val armState = svc.creditLearner
      .statesFor(Seq(graft.learning.Thompson.Arm(item)))
      .getOrElse(item, fail("credit learner has no state for the item"))
    assert(armState.alpha == 2.0 && armState.pulls == 1L) // 1.0 prior + 1.0 delta
    assert(store.exists("learner_credit"))
  }

  test("GraftCli: query/stats/feedback/project command surface over the warehouse") {
    val wh = store.root
    val q = graft.pipeline.GraftCli.run(
      Seq(wh, "query", "platform access control tokens", "3"), spark)
    assert(q.head.contains("\"query_id\"") && q.head.contains("kg_coverage"))
    assert(q.exists(_.contains("\"combined\"")))

    val st = graft.pipeline.GraftCli.run(Seq(wh, "stats"), spark)
    assert(st.exists(_.contains("\"domain\":\"web\"")))

    val id = svc.query("platform access control tokens", topK = 1)
      .items.select("id").as[String].head()
    val fb = graft.pipeline.GraftCli.run(
      Seq(wh, "feedback", "q-cli", s"$id=accepted"), spark)
    assert(fb.head.contains("\"status\":\"recorded\"") && fb.head.contains("\"accepted\":1"))
    val bad = graft.pipeline.GraftCli.run(
      Seq(wh, "feedback", "q-cli", s"$id=meh"), spark)
    assert(bad.head.startsWith("""{"error":"""))

    val out = java.nio.file.Files.createTempDirectory("graft-cli").toString + "/rules.json"
    val pr = graft.pipeline.GraftCli.run(
      Seq(wh, "project", "reviewer", out, "2026-01-01T00:00:00Z"), spark)
    assert(pr.head.contains("written"))
    assert(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8")
      .contains("\"persona\":\"reviewer\""))
  }

  test("explore: reachable edges, neighbors and linked rules; unknown → None") {
    assert(svc.explore("web:Nope").isEmpty)
    // pick a well-connected node (an edge endpoint)
    val seed = store.read("edges").select("source_id").as[String].head()
    val ex = svc.explore(seed, depth = 2).getOrElse(fail("explore returned None"))
    assert(ex.edges.count() > 0)
    val neighborIds = ex.neighbors.select("id").as[String].collect().toSet
    assert(neighborIds.contains(seed))
    // every linked rule references at least one reached concept
    val ruleIds = ex.rules.select("id").as[String].collect().toSet
    val linked = store.read("rules")
      .select(col("id"), explode(col("concept_ids")).as("cid"))
      .filter(col("cid").isin(neighborIds.toSeq: _*))
      .select("id").as[String].collect().toSet
    assert(ruleIds == linked)
  }

  test("knowledgeStats matches the committed tables") {
    val row = svc.knowledgeStats().filter(col("domain") === "web").collect().head
    assert(row.getAs[Long]("concepts") == store.read("concepts").count())
    assert(row.getAs[Long]("edges") == store.read("edges").count())
    assert(row.getAs[Long]("rules") == store.read("rules").count())
  }

  test("project: universal artifact over the committed rules table") {
    val doc = svc.project("graft_web", projectedAt = "2026-01-01T00:00:00Z")
    val parsed = spark.read.json(Seq(doc).toDS)
    assert(parsed.select("persona").head.getString(0) == "graft_web")
    assert(parsed.select("metadata.rule_count").head.getLong(0) ==
      store.read("rules").count())
    val rs = parsed.select(explode(col("rules")).as("r")).select("r.*")
    // both derivations present, with template provenance only on derived
    val derivs = rs.select("provenance.derivation").distinct().as[String].collect().toSet
    assert(derivs == Set("explicit", "derived"))
    assert(rs.filter(col("provenance.derivation") === "derived")
      .filter(col("provenance.template_id").isNull).count() == 0)
  }
}
