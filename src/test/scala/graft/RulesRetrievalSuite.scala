package graft

import graft.core.Embeddings
import graft.graph.Bfs
import graft.query.Retrieval
import graft.rules.Rules
import org.apache.spark.sql.functions._

class RulesRetrievalSuite extends SparkFunSuite {
  import spark.implicits._

  private lazy val concepts = Seq(
    ("web:Auth Module", "Auth Module"),
    ("web:Session Store", "Session Store"),
    ("web:Key Vault", "Key Vault")).toDF("id", "name")

  private lazy val edges = Seq(
    ("web:Auth Module", "web:Session Store", "REQUIRES", 0.9),
    ("web:Auth Module", "web:Session Store", "USES", 0.7), // same pair, lower conf
    ("web:Session Store", "web:Key Vault", "USES", 0.8)
  ).toDF("source_id", "target_id", "relation_type", "confidence")

  test("derived rules: exactly one per unique (source,target) pair (flat.py invariant)") {
    val derived = Rules.derivedRules(edges, concepts, "web")
    assert(derived.count() == 2) // 2 unique pairs from 3 edges
    val texts = derived.select("text").as[String].collect()
    // max-confidence relation wins the pair: REQUIRES template for pair 1
    assert(texts.exists(_.contains("cannot operate without")))
    assert(texts.exists(_.contains("builds on")))
    // names expanded, no leftover placeholders
    assert(texts.forall(t => !t.contains("{source}") && !t.contains("{target}")))
  }

  test("explicit rules: normative sentences linked to mentioned concepts") {
    val pages = Seq(
      ("u1", "Auth Module must never bypass Key Vault in production environments."),
      ("u1", "Session Store should always be replicated across regions for safety."),
      ("u2", "This sentence is calm and descriptive without any modality at all."))
      .toDF("url", "text")
    val rules = Rules.explicitRules(pages, concepts, "web")
    val byText = rules.select("text", "category", "concept_ids")
      .as[(String, String, Seq[String])].collect().toSeq
    assert(byText.length == 2)
    val prohibition = byText.find(_._2 == "prohibition").get
    assert(prohibition._3.toSet == Set("web:Auth Module", "web:Key Vault"))
    val requirement = byText.find(_._2 == "requirement").get
    assert(requirement._3 == Seq("web:Session Store"))
  }

  test("rulesForConcepts: relevance = max activation over linked concepts (core/rules.py)") {
    val rules = Seq(
      ("r1", "rule one", "requirement", Seq("web:Auth Module", "web:Key Vault")),
      ("r2", "rule two", "derived", Seq("web:Session Store")),
      ("r3", "rule three", "derived", Seq("web:Unactivated")))
      .toDF("id", "text", "category", "concept_ids")
    val activated = Seq(("web:Auth Module", 0.9), ("web:Key Vault", 0.4),
      ("web:Session Store", 0.6)).toDF("id", "score")
    val out = Rules.rulesForConcepts(rules, activated)
      .select("id", "relevance").as[(String, Double)].collect().toMap
    assert(out == Map("r1" -> 0.9, "r2" -> 0.6)) // r3 not activated → absent
  }

  test("embeddings: deterministic, unit-norm, similar texts score higher") {
    val a = Embeddings.embedConcept("Auth Module", "Named entity: Auth Module")
    val a2 = Embeddings.embedConcept("Auth Module", "Named entity: Auth Module")
    val b = Embeddings.embedConcept("Auth Module Service", "Named entity: Auth Module Service")
    val c = Embeddings.embedConcept("Quantum Ledger", "Noun phrase: Quantum Ledger")
    assert(a.toSeq == a2.toSeq)
    assert(math.abs(Embeddings.cosine(a, a) - 1.0) < 1e-6)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(Embeddings.cosine(a, b) > Embeddings.cosine(a, c))
  }

  test("BFS pattern completion: score = 0.5^depth with max-combine (retrieval.py:146-184)") {
    val chain = Seq(
      ("a", "b", "USES", 0.9), ("b", "c", "USES", 0.9), ("c", "d", "USES", 0.9))
      .toDF("source_id", "target_id", "relation_type", "confidence")
    val scores = Bfs.patternCompletion(chain, Seq("a").toDF("id"), maxDepth = 2)
      .as[(String, Double)].collect().toMap
    assert(scores("a") == 1.0)
    assert(scores("b") == 0.5)
    assert(scores("c") == 0.25)
    assert(!scores.contains("d")) // beyond depth 2
  }

  test("BFS explore: collects the reachable edge subset to depth 3 (service.py:827-914)") {
    val g = Seq(
      ("a", "b", "USES", 0.9), ("b", "c", "USES", 0.9),
      ("c", "d", "USES", 0.9), ("x", "y", "USES", 0.9))
      .toDF("source_id", "target_id", "relation_type", "confidence")
    val sub = Bfs.exploreEdges(g, Seq("a").toDF("id"), maxDepth = 3)
      .select("source_id", "target_id").as[(String, String)].collect().toSet
    assert(sub == Set(("a", "b"), ("b", "c"), ("c", "d"))) // x-y unreachable
  }

  test("hybrid retrieval: seeds, PPR blend, top-k ordering") {
    val withEmb = concepts.select(col("id"), col("name"))
      .as[(String, String)]
      .map { case (id, name) => (id, name, Embeddings.embedConcept(name, s"Named entity: $name").toSeq) }
      .toDF("id", "name", "embedding")
    val factors = Seq(("web:Key Vault", 2.0)).toDF("node_id", "factor")
    val out = Retrieval.retrieve(withEmb, edges, factors, "auth module session", topK = 3)
    val rows = out.as[(String, String, Double, Double, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 3)
    // ordered by combined desc
    assert(rows.map(_._5).toSeq == rows.map(_._5).sortBy(-_).toSeq)
    // query mentions auth module → it should rank first
    assert(rows.head._1 == "web:Auth Module")
  }

  test("online edges among candidates: undirected pairs above threshold (adapter.py:627-663)") {
    val cands = Seq(
      ("a", Seq(1f, 0f, 0f)), ("b", Seq(0.95f, 0.05f, 0f)), ("c", Seq(0f, 1f, 0f)))
      .toDF("id", "embedding")
    val pairs = Retrieval.onlineEdges(cands, threshold = 0.7)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b")))
  }
}
