package graft

import graft.prune.Pruning
import org.apache.spark.sql.DataFrame

/** Re-expression of the reference's pruning tests (tests/test_pruning.py;
  * spec src/qortex/core/pruning.py:29-100) over the DataFrame engine.
  */
class PruningSuite extends SparkFunSuite {
  import spark.implicits._

  private val longEvidence =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa evidence tokens"
  private val longEvidence2 =
    "totally different words about service mesh routing policies under heavy traffic load"

  private def edges(rows: (String, String, String, Double, String)*): DataFrame =
    rows.toDF("source_id", "target_id", "relation_type", "confidence", "source_text")

  test("P1: drops edges with < 8 evidence tokens (pruning.py:369-376)") {
    val df = edges(
      ("a", "b", "USES", 0.9, "this helps"),
      ("a", "c", "USES", 0.9, longEvidence))
    val out = Pruning.prune(df)
    assert(out.count() == 1)
    assert(out.select("target_id").as[String].collect().toSet == Set("c"))
  }

  test("P2: confidence floor 0.55 + strength tag at 0.70 (pruning.py:378-388)") {
    val df = edges(
      ("a", "b", "USES", 0.50, longEvidence),
      ("a", "c", "USES", 0.60, longEvidence),
      ("a", "d", "USES", 0.80, longEvidence2))
    // strength is assigned at P2; read the tagged frame (the 0.60 edge is
    // later dropped by P5 as isolated-weak, which is its own test)
    val tagged = Pruning.tag(df)
    val reasons = tagged.select("target_id", "drop_reason")
      .as[(String, String)].collect().toMap
    assert(reasons("b") == "low_confidence")
    val strengths = tagged.filter($"drop_reason".isNull || $"drop_reason" === "isolated")
      .select("target_id", "strength").as[(String, String)].collect().toMap
    assert(strengths("c") == "weak")
    assert(strengths("d") == "strong")
  }

  test("P3: Jaccard dedup within (src,tgt,type) keeps highest confidence (pruning.py:390-417)") {
    val df = edges(
      ("a", "b", "USES", 0.90, longEvidence),
      ("a", "b", "USES", 0.70, longEvidence + " slightly reworded"),
      ("a", "b", "USES", 0.75, longEvidence2), // different evidence → kept
      ("x", "y", "USES", 0.70, longEvidence)) // keeps degree>1 irrelevant here
    val tagged = Pruning.tag(df)
    val dropped = tagged.filter($"drop_reason" === "duplicate").count()
    assert(dropped == 1)
    val kept = Pruning.survivors(tagged)
      .filter($"source_id" === "a").select("confidence").as[Double].collect().toSet
    assert(kept == Set(0.90, 0.75))
  }

  test("P4: competing relation types with overlapping evidence keep higher confidence (pruning.py:419-448)") {
    val df = edges(
      ("a", "b", "SUPPORTS", 0.90, longEvidence),
      ("a", "b", "CHALLENGES", 0.70, longEvidence + " extra"), // overlap ≥ 0.3 → dropped
      ("x", "y", "USES", 0.90, longEvidence))
    val tagged = Pruning.tag(df)
    assert(tagged.filter($"drop_reason" === "competing").count() == 1)
    val kept = Pruning.survivors(tagged).filter($"source_id" === "a")
      .select("relation_type").as[String].collect().toSeq
    assert(kept == Seq("SUPPORTS"))
  }

  test("P5: isolated weak edges dropped (degree 1 endpoint AND conf < 0.65) (pruning.py:450-472)") {
    val df = edges(
      ("a", "b", "USES", 0.60, longEvidence), // both endpoints isolated, weak → drop
      ("c", "d", "USES", 0.60, longEvidence2 + " one"),
      ("c", "e", "USES", 0.60, longEvidence2 + " two")) // c has degree 2; d,e degree 1 → still isolated → drop
    val tagged = Pruning.tag(df)
    val isolated = tagged.filter($"drop_reason" === "isolated").count()
    assert(isolated == 3)
  }

  test("P5: strong isolated edges survive") {
    val df = edges(("a", "b", "USES", 0.90, longEvidence))
    assert(Pruning.prune(df).count() == 1)
  }

  test("P6: structural/causal layer tagging (pruning.py:317-326)") {
    val df = edges(
      ("a", "b", "PART_OF", 0.9, longEvidence),
      ("b", "a", "REQUIRES", 0.9, longEvidence2),
      ("a", "b", "FROBNICATES", 0.9, longEvidence + " unknown relation words here"))
    val layers = Pruning.withLayer(df)
      .select("relation_type", "layer").as[(String, String)].collect().toMap
    assert(layers("PART_OF") == "structural")
    assert(layers("REQUIRES") == "causal")
    assert(layers("FROBNICATES") == "structural") // unknown → structural (safer)
  }

  test("disabled pruning passes everything through with layers (pruning.py:347-360)") {
    val df = edges(("a", "b", "USES", 0.1, "short"))
    val out = Pruning.tag(df, Pruning.Config(enabled = false))
    assert(out.count() == 1)
    assert(out.select("layer").as[String].head() == "structural")
  }

  test("dry-run stats match what full pruning drops (pruning.py:492-504)") {
    val df = edges(
      ("a", "b", "USES", 0.9, "too short"),
      ("a", "c", "USES", 0.4, longEvidence),
      ("a", "d", "USES", 0.9, longEvidence),
      ("d", "e", "USES", 0.9, longEvidence2))
    val stats = Pruning.dryRunStats(df)
    assert(stats.input == 4)
    assert(stats.droppedLowEvidence == 1)
    assert(stats.droppedLowConfidence == 1)
    assert(stats.output == 2)
  }

  test("pruning output ⊆ input and is row-order independent") {
    val rows = Seq(
      ("a", "b", "USES", 0.9, longEvidence),
      ("a", "b", "USES", 0.8, longEvidence + " again"),
      ("a", "b", "REQUIRES", 0.7, longEvidence),
      ("b", "c", "SUPPORTS", 0.66, longEvidence2),
      ("c", "a", "USES", 0.58, longEvidence2 + " more"))
    val fwd = Pruning.prune(edges(rows: _*))
      .select("source_id", "target_id", "relation_type", "confidence")
      .as[(String, String, String, Double)].collect().toSet
    val rev = Pruning.prune(edges(rows.reverse: _*))
      .select("source_id", "target_id", "relation_type", "confidence")
      .as[(String, String, String, Double)].collect().toSet
    assert(fwd == rev)
    assert(fwd.subsetOf(rows.map(r => (r._1, r._2, r._3, r._4)).toSet))
  }
}
