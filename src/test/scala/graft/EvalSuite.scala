package graft

import graft.query.Eval

/** A9 — metric definitions pinned against hand-worked values, and the
  * hybrid ≥ vec-only quality claim on the graph-hop-rewarding corpus
  * (the reference's +22 % precision / +25 % recall direction,
  * BASELINE.md).
  */
class EvalSuite extends SparkFunSuite {

  test("metric definitions match run.py:113-134") {
    val retrieved = Seq("A", "B", "C", "D", "E", "F")
    assert(Eval.recallAtK(retrieved, Set("A", "C", "X"), 5) == 2.0 / 3.0)
    assert(Eval.recallAtK(retrieved, Set.empty, 5) == 1.0) // vacuous
    assert(Eval.precisionAtK(retrieved, Set("A", "C", "X"), 5) == 2.0 / 5.0)
    assert(Eval.precisionAtK(Seq.empty, Set("A"), 5) == 0.0)
    assert(Eval.mrr(retrieved, Set("C")) == 1.0 / 3.0)
    assert(Eval.mrr(retrieved, Set("Z")) == 0.0)
  }

  test("evaluate aggregates per-query metrics and distractor hits") {
    val specs = Seq(
      Eval.QuerySpec("q1", Set("A", "B"), Set("D")),
      Eval.QuerySpec("q2", Set("Z"), Set("A")))
    val fixed = (_: String) => Seq("A", "B", "C", "D")
    val r = Eval.evaluate("fixed", fixed, specs, k = 4)
    assert(r.avgRecall == (1.0 + 0.0) / 2)
    assert(r.avgPrecision == (0.5 + 0.0) / 2)
    assert(r.avgMrr == (1.0 + 0.0) / 2)
    assert(r.totalDistractors == 2) // D for q1, A for q2
  }

  test("hybrid retrieval beats or matches vec-only on the auth corpus") {
    val results = Eval.compare(k = 5)(spark)
    val hybrid = results("hybrid")
    val vec = results("vec_only")
    info(s"hybrid:   ${hybrid.toJson}")
    info(s"vec_only: ${vec.toJson}")
    // the graph edges connect textually-distant expected items (PKCE,
    // Refresh Token, ...) to the vector seeds — PPR must lift recall
    assert(hybrid.avgRecall >= vec.avgRecall,
      s"hybrid recall ${hybrid.avgRecall} < vec-only ${vec.avgRecall}")
    assert(hybrid.avgMrr > 0.0 && hybrid.avgRecall > 0.0)
  }
}
