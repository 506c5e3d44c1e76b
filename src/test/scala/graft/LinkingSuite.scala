package graft

import graft.link.Linking

class LinkingSuite extends SparkFunSuite {
  import spark.implicits._

  private lazy val mentions = Seq(
    ("u1", "d1", "c1", "Auth Module", "Named entity: Auth Module", 0.9),
    ("u1", "d1", "c1", "Session Store", "Named entity: Session Store", 0.9),
    ("u2", "d1", "c2", "auth module", "Noun phrase: auth module", 0.7),
    ("u2", "d1", "c2", "Key Vault", "Named entity: Key Vault", 0.9)
  ).toDF("url", "day", "chunk_id", "name", "description", "confidence")

  private lazy val triples = Seq(
    ("Auth Module", "REQUIRES", "Session Store", 0.75, "u1", "d1", "c1", "evidence one", "v"),
    ("auth module", "USES", "Key Vault", 0.75, "u2", "d1", "c2", "evidence two", "v"),
    ("Ghost Entity", "USES", "Key Vault", 0.75, "u3", "d1", "c3", "evidence three", "v")
  ).toDF("subj", "pred", "obj", "confidence", "url", "day", "chunk_id", "sentence",
    "extractor_version")

  test("buildConcepts: case-insensitive grouping, max confidence, mention counts") {
    val c = Linking.buildConcepts(mentions, "web", "v1")
    assert(c.count() == 3)
    val auth = c.filter($"name" === "Auth Module")
      .select("id", "confidence", "mention_count")
      .as[(String, Double, Long)].head()
    assert(auth == (("web:Auth Module", 0.9, 2L)))
  }

  test("resolveEdges broadcast path: both endpoints must resolve (J2 validation)") {
    val concepts = Linking.buildConcepts(mentions, "web", "v1")
    val edges = Linking.resolveEdges(triples, concepts)
      .select("source_id", "target_id", "relation_type")
      .as[(String, String, String)].collect().toSet
    assert(edges == Set(
      ("web:Auth Module", "web:Session Store", "REQUIRES"),
      ("web:Auth Module", "web:Key Vault", "USES"))) // Ghost Entity dropped
  }

  test("resolveEdges salted path produces identical results to broadcast") {
    val concepts = Linking.buildConcepts(mentions, "web", "v1")
    val bcast = Linking.resolveEdges(triples, concepts).collect().map(_.toString).toSet
    val salted = Linking.resolveEdges(triples, concepts, broadcastMaxRows = 0L, saltBuckets = 4)
      .collect().map(_.toString).toSet
    assert(bcast == salted)
  }

  test("dictSizeHint skips the sizing count but picks the same plan") {
    val concepts = Linking.buildConcepts(mentions, "web", "v1")
    val hinted = Linking.resolveEdges(triples, concepts, dictSizeHint = Some(3L))
      .collect().map(_.toString).toSet
    val counted = Linking.resolveEdges(triples, concepts).collect().map(_.toString).toSet
    assert(hinted == counted)
  }
}
