package graft

import graft.causal._
import org.apache.spark.sql.functions._

class CausalSuite extends SparkFunSuite {
  import spark.implicits._

  private def chainForkCollider(): CausalDag =
    // A→B→C (chain into collider with E→C), A→D (fork at A)
    CausalDag.fromEdges(Seq(
      ("A", "B", "REQUIRES", 0.9), ("B", "C", "REQUIRES", 0.9),
      ("A", "D", "USES", 0.75), ("E", "C", "SUPPORTS", 0.7)))

  test("causalEdges: orientation, reversal, drop of non-DAG relations (types.py:186-197)") {
    val edges = Seq(
      ("x", "y", "REQUIRES", 0.8), // forward, strength 0.8·0.9
      ("x", "y", "IMPLEMENTS", 1.0), // reversed → y→x
      ("x", "y", "SIMILAR_TO", 1.0), // none → dropped
      ("x", "y", "CONTRADICTS", 1.0)) // bidirectional → dropped
      .toDF("source_id", "target_id", "relation_type", "confidence")
    val got = Causal.causalEdges(edges)
      .select("src", "dst", "relation_type", "strength")
      .as[(String, String, String, Double)].collect().toSet
    assert(got == Set(
      ("x", "y", "REQUIRES", 0.8 * 0.9),
      ("y", "x", "IMPLEMENTS", 0.85)))
  }

  test("cycle breaking removes the weakest edge (dag.py:155-180)") {
    val dag = CausalDag.fromEdges(Seq(
      ("a", "b", "REQUIRES", 0.9), ("b", "c", "REQUIRES", 0.8),
      ("c", "a", "USES", 0.3))) // weakest — must go
    assert(dag.isValidDag)
    assert(dag.edgeCount == 2)
    assert(dag.edgeStrength("c", "a") == 0.0)
    assert(dag.edgeStrength("a", "b") == 0.9)
    assert(dag.topologicalOrder() == Seq("a", "b", "c"))
  }

  test("cycle detection survives a deep path graph (no recursive DFS overflow)") {
    val deep = (0 until 30000).map(i => (f"n$i%05d", f"n${i + 1}%05d", "REQUIRES", 0.9))
    val dag = CausalDag.fromEdges(deep) // breakCycles → findCycle over 30k-deep DFS
    assert(dag.isValidDag && dag.edgeCount == 30000)
    assert(dag.ancestors("n30000").size == 30000)
  }

  test("d-separation: chain, fork, collider, collider-descendant") {
    val d = new DSeparation(chainForkCollider())
    // chain A→B→C: blocked by B, open marginally
    assert(d.isDSeparated(Set("A"), Set("C"), Set("B")).isIndependent)
    assert(!d.isDSeparated(Set("A"), Set("C"), Set.empty).isIndependent)
    // fork at A: B ⟂ D | A, dependent marginally
    assert(d.isDSeparated(Set("B"), Set("D"), Set("A")).isIndependent)
    assert(!d.isDSeparated(Set("B"), Set("D"), Set.empty).isIndependent)
    // collider at C: A ⟂ E marginally, but conditioning on C OPENS the path
    assert(d.isDSeparated(Set("A"), Set("E"), Set.empty).isIndependent)
    assert(!d.isDSeparated(Set("A"), Set("E"), Set("C")).isIndependent)
    // conditioning on a collider's DESCENDANT also opens it
    val d2 = new DSeparation(CausalDag.fromEdges(Seq(
      ("A", "C", "REQUIRES", 0.9), ("E", "C", "REQUIRES", 0.9),
      ("C", "F", "USES", 0.75))))
    assert(d2.isDSeparated(Set("A"), Set("E"), Set.empty).isIndependent)
    assert(!d2.isDSeparated(Set("A"), Set("E"), Set("F")).isIndependent)
  }

  test("ancestors/descendants/minimal conditioning set") {
    val dag = chainForkCollider()
    assert(dag.ancestors("C") == Set("A", "B", "E"))
    assert(dag.descendants("A") == Set("B", "C", "D"))
    val d = new DSeparation(dag)
    assert(d.findMinimalConditioningSet("A", "C").contains(Set("B")))
    assert(d.findMinimalConditioningSet("A", "E").contains(Set.empty[String]))
    assert(d.findMinimalConditioningSet("A", "B").isEmpty) // direct edge
  }

  test("credit assignment: direct, decayed ancestors, cutoff, posterior deltas") {
    // A →0.8→ B →0.9→ C; reward lands on C's rule
    val dag = CausalDag.fromEdges(Seq(
      ("A", "B", "REQUIRES", 0.8), ("B", "C", "REQUIRES", 0.9)))
    val ca = new CreditAssigner(dag)
    val as = ca.assignCredit(Seq("C"), reward = 1.0)
    val byId = as.map(a => a.conceptId -> a).toMap
    assert(byId("C").credit == 1.0 && byId("C").method == "direct")
    assert(math.abs(byId("B").credit - 0.5 * 0.9) < 1e-12) // decay × strength
    assert(math.abs(byId("A").credit - 0.45 * 0.5 * 0.8) < 1e-12)
    assert(byId("A").path == Seq("A", "B", "C"))
    // min-credit cutoff: a weak long chain stops propagating
    val weak = new CreditAssigner(dag, minCredit = 0.2)
    assert(weak.assignCredit(Seq("C"), 1.0).map(_.conceptId).toSet == Set("C", "B"))
    // posterior deltas: negative credit → beta
    val neg = ca.toPosteriorUpdates(ca.assignCredit(Seq("C"), reward = -1.0))
    assert(neg("C") == (0.0, 1.0))
    assert(math.abs(neg("B")._2 - 0.45) < 1e-12)
  }

  test("creditStream: distributed reward stream matches the sequential assigner") {
    val dag = CausalDag.fromEdges(Seq(
      ("A", "B", "REQUIRES", 0.8), ("B", "C", "REQUIRES", 0.9)))
    val ca = new CreditAssigner(dag)
    val rewards = Seq(
      (Seq("C"), 1.0), (Seq("C"), -1.0), (Seq("B"), 1.0), (Seq("Z"), 1.0))
      .toDF("concept_ids", "reward")
    val got = ca.creditStream(rewards)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // sequential expectation: per-reward assignments summed per concept
    val expected = Seq((Seq("C"), 1.0), (Seq("C"), -1.0), (Seq("B"), 1.0), (Seq("Z"), 1.0))
      .flatMap { case (cids, r) => ca.assignCredit(cids, r) }
      .groupBy(_.conceptId).map { case (cid, as) =>
        cid -> (as.filter(_.credit >= 0).map(_.credit).sum,
          as.filter(_.credit < 0).map(a => -a.credit).sum)
      }
    assert(got.keySet == expected.keySet)
    for ((k, (a, b)) <- expected) {
      assert(math.abs(got(k)._1 - a) < 1e-12, s"alpha for $k")
      assert(math.abs(got(k)._2 - b) < 1e-12, s"beta for $k")
    }
  }

  test("chi-square p-value against known quantiles") {
    // classic critical values: P(X²(1) > 3.841) ≈ .05, P(X²(5) > 11.07) ≈ .05
    assert(math.abs(Refutation.chiSquarePValue(3.841, 1) - 0.05) < 1e-3)
    assert(math.abs(Refutation.chiSquarePValue(11.070, 5) - 0.05) < 1e-3)
    assert(math.abs(Refutation.chiSquarePValue(6.635, 1) - 0.01) < 1e-3)
    assert(Refutation.chiSquarePValue(0.0, 3) == 1.0)
  }

  test("refutation: data agrees with the DAG's independence claims") {
    // generative model: Z ~ Bern(.5); X, Y each depend on Z (fork) →
    // X,Y marginally dependent but independent given Z
    val rng = new java.util.Random(7L)
    val rows = (1 to 4000).map { _ =>
      val z = rng.nextBoolean()
      val x = if (rng.nextDouble() < (if (z) 0.8 else 0.2)) "1" else "0"
      val y = if (rng.nextDouble() < (if (z) 0.8 else 0.2)) "1" else "0"
      val w = if (rng.nextBoolean()) "1" else "0" // independent of everything
      (if (z) "1" else "0", x, y, w)
    }.toDF("Z", "X", "Y", "W")

    val condIndep = Refutation.testIndependence(rows,
      Set("X"), Set("Y"), Set("Z"), claimedIndependent = true)
    assert(condIndep.consistent, s"X ⟂ Y | Z should hold: p=${condIndep.pValue}")
    val margDep = Refutation.testIndependence(rows,
      Set("X"), Set("Y"), Set.empty, claimedIndependent = false)
    assert(margDep.consistent, s"X, Y marginally dependent: p=${margDep.pValue}")
    val wIndep = Refutation.testIndependence(rows,
      Set("X"), Set("W"), Set.empty, claimedIndependent = true)
    assert(wIndep.consistent, s"W independent of X: p=${wIndep.pValue}")
    assert(wIndep.sampleSize == 4000)
  }

  test("feedback propagates causal credit into Thompson posterior deltas") {
    // one domain: web:A → web:B → web:C (REQUIRES, conf 0.9 → strength 0.81)
    val edges = Seq(
      ("web:A", "web:B", "REQUIRES", 0.9), ("web:B", "web:C", "REQUIRES", 0.9))
      .toDF("source_id", "target_id", "relation_type", "confidence")
    val factors = Seq.empty[(String, Double)].toDF("node_id", "factor")
    val outcomes = Seq(("web:C", "accepted")).toDF("node_id", "outcome")
    val fb = graft.query.Service.feedback(factors, outcomes, "q-credit",
      creditEdges = Some(edges)).fold(e => fail(e), identity)
    val credit = fb.credit.getOrElse(fail("no credit summary"))
    assert(credit.directCount == 1 && credit.ancestorCount == 2)
    assert(credit.conceptCount == 3)
    val (aC, _) = credit.posteriorDeltas("web:C")
    assert(aC == 1.0) // direct at the average reward (accepted → 1.0)
    val (aB, _) = credit.posteriorDeltas("web:B")
    assert(math.abs(aB - 0.5 * 0.81) < 1e-12) // decay × edge strength
    val (aA, _) = credit.posteriorDeltas("web:A")
    assert(math.abs(aA - 0.405 * 0.5 * 0.81) < 1e-12)
    // rejected-only batch: negative credit lands in beta
    val neg = graft.query.Service.feedback(factors,
      Seq(("web:C", "rejected")).toDF("node_id", "outcome"), "q-credit-2",
      creditEdges = Some(edges)).fold(e => fail(e), identity)
    assert(neg.credit.get.posteriorDeltas("web:C") == (0.0, 1.0))
    // no credit requested → none computed
    val plain = graft.query.Service.feedback(factors, outcomes, "q-credit-3")
      .fold(e => fail(e), identity)
    assert(plain.credit.isEmpty)
  }

  test("causal rules feed the projection pipeline with derivation gating") {
    val dag = chainForkCollider()
    val causalRules = CausalRules.derive(dag, "web")
    assert(causalRules.count() == 6) // worked by hand, pinned by q45 golden
    // projection integration: causal included for derivation ∈ {causal, all}
    val ex = Seq.empty[(String, String, String, String, Seq[String], String, Double)]
      .toDF("id", "text", "domain", "source_id", "concept_ids", "category", "confidence")
    val dv = Seq.empty[(String, String, String, Seq[String], String, Double, String, String)]
      .toDF("id", "text", "domain", "concept_ids", "category", "confidence",
        "template_id", "severity")
    import graft.projectors.Projectors
    val all = Projectors.ruleSource(ex, dv, causalRules = Some(causalRules))
    assert(all.filter(col("derivation") === "causal").count() == 6)
    val onlyCausal = Projectors.ruleSource(ex, dv,
      Projectors.ProjectionFilter(derivation = "causal"), Some(causalRules))
    assert(onlyCausal.count() == 6)
    val noCausal = Projectors.ruleSource(ex, dv,
      Projectors.ProjectionFilter(derivation = "explicit"), Some(causalRules))
    assert(noCausal.count() == 0)
    // causal rules flow through seed entries with null template provenance
    val entries = Projectors.seedEntries(Projectors.enrichTemplate(all))
    assert(entries.filter(col("prov_derivation") === "causal").count() == 6)
  }
}
