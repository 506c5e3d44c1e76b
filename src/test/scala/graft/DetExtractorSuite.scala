package graft

import graft.extract.DetExtractor
import org.scalatest.funsuite.AnyFunSuite

class DetExtractorSuite extends AnyFunSuite {

  test("mention detection: multiword capitalized runs are entity-like (conf 0.9)") {
    val ex = DetExtractor.extract("the Auth Module handles everything smoothly today.")
    val m = ex.mentions.find(_.name == "Auth Module")
    assert(m.isDefined)
    assert(m.get.confidence == 0.9)
    assert(m.get.description.startsWith("Named entity:"))
  }

  test("mention detection: single capitalized token is noun-phrase-like (conf 0.7)") {
    val ex = DetExtractor.extract("we rely on Redis across the regional deployments daily.")
    val m = ex.mentions.find(_.name == "Redis")
    assert(m.isDefined)
    assert(m.get.confidence == 0.7)
    assert(m.get.description.startsWith("Noun phrase:"))
  }

  test("sentence-initial lone stopword/verb capitalization carries no signal") {
    val ex = DetExtractor.extract("The system keeps running. Uses of caching vary widely.")
    assert(!ex.mentions.exists(_.name == "The"))
    assert(!ex.mentions.exists(_.name == "Uses"))
  }

  test("sentence-initial run of capitalized tokens IS a mention (The Platform)") {
    val ex = DetExtractor.extract("The Platform uses Message Queue reliably across regions.")
    assert(ex.mentions.exists(_.name == "The Platform"))
  }

  test("case-insensitive per-doc dedup, higher confidence wins (extractor.py:139-153)") {
    val ex = DetExtractor.extract(
      "Auth Module works fine here. the auth module is busy. AUTH MODULE again!")
    val ms = ex.mentions.filter(_.name.equalsIgnoreCase("Auth Module"))
    assert(ms.length == 1)
    assert(ms.head.confidence == 0.9)
  }

  test("SVO triple with reference verb map (extractor.py:367-380)") {
    val ex = DetExtractor.extract("Auth Module requires Session Store during nightly compaction runs.")
    val t = ex.triples.find(t => t.subj == "Auth Module" && t.obj == "Session Store")
    assert(t.isDefined)
    assert(t.get.pred == "REQUIRES")
    assert(t.get.confidence == 0.75) // both endpoints entity-like: 0.6 + 2*0.075
  }

  test("inflected verbs normalize: uses/includes/extends/needs") {
    def pred(s: String) = DetExtractor.extract(s).triples.headOption.map(_.pred)
    assert(pred("Cache Layer uses Token Bucket under heavy load always.") == Some("USES"))
    assert(pred("Event Bus includes Retry Policy for every tenant there.") == Some("CONTAINS"))
    assert(pred("Edge Proxy extends Load Balancer behind the gateway node.") == Some("IMPLEMENTS"))
    assert(pred("Query Planner needs Data Catalog according to policy now.") == Some("REQUIRES"))
  }

  test("coordination: X and Y → SIMILAR_TO conf base 0.5 (extractor.py:347-363)") {
    val ex = DetExtractor.extract("Rate Limiter and Token Bucket share operational traits nicely.")
    val t = ex.triples.find(_.pred == "SIMILAR_TO")
    assert(t.isDefined)
    assert(t.get.subj == "Rate Limiter" && t.get.obj == "Token Bucket")
    assert(math.abs(t.get.confidence - 0.65) < 1e-9) // 0.5 + 2*0.075
  }

  test("(s,o,type) dedup within a document (extractor.py:334-344)") {
    val text = "Auth Module uses Key Vault reliably across regions. " +
      "Auth Module uses Key Vault for every tenant happily."
    val ex = DetExtractor.extract(text)
    assert(ex.triples.count(t =>
      t.subj == "Auth Module" && t.obj == "Key Vault" && t.pred == "USES") == 1)
  }

  test("no triple across sentence boundary") {
    val ex = DetExtractor.extract("Auth Module is stable. Uses Session Store heavily sometimes.")
    assert(!ex.triples.exists(t => t.subj == "Auth Module" && t.obj == "Session Store"))
  }

  test("subject/object gap beyond 3 tokens breaks the pattern") {
    val ex = DetExtractor.extract(
      "Auth Module at some point in recent operational history uses Session Store.")
    assert(ex.triples.isEmpty)
  }

  test("empty input") {
    assert(DetExtractor.extract("").mentions.isEmpty)
    assert(DetExtractor.extract(null).triples.isEmpty)
  }

  test("extraction is a pure function (same input ⇒ same output)") {
    val text = "The Platform implements Circuit Breaker and Feature Flags under heavy load."
    val a = DetExtractor.extract(text)
    val b = DetExtractor.extract(text)
    assert(a == b)
  }
}
