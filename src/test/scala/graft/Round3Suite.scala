package graft

import graft.canon.Canon
import graft.extract.DetExtractor
import graft.graph.Ppr

/** Round-3 regression tests: repo hygiene (no control bytes in source),
  * dedupMentions role tie-break, PPR isolated-seed mass, and the q28 CC
  * oracle round budget measured against the actual verify corpus.
  */
class Round3Suite extends SparkFunSuite {
  import spark.implicits._

  test("repo hygiene: no source file contains control bytes other than \\n and \\t") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val bad = Files.walk(Paths.get("src")).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        val bytes = Files.readAllBytes(p)
        val idx = bytes.indexWhere(b => b >= 0 && b < 0x20 && b != '\n' && b != '\t')
        if (idx >= 0) Some(s"$p byte offset $idx value 0x${bytes(idx).toHexString}") else None
      }
      .toList
    assert(bad.isEmpty, s"control bytes found (git treats these files as binary): $bad")
  }

  test("dedupMentions: generalizable beats illustrative on a confidence tie") {
    def m(name: String, conf: Double, role: String, pos: Int) =
      DetExtractor.Mention(name, name, pos, pos + name.length, pos, pos + 1, conf,
        s"at $pos", role = role, illustrates = if (role == "illustrative") "Parent" else null)
    // illustrative occurrence precedes an equal-confidence generalizable one
    val kept = DetExtractor.dedupMentions(Vector(
      m("Redis", 0.7, "illustrative", 0), m("Redis", 0.7, "generalizable", 10)))
    assert(kept.size == 1 && kept.head.role == "generalizable")
    // reverse arrival order: generalizable still wins (first kept)
    val kept2 = DetExtractor.dedupMentions(Vector(
      m("Redis", 0.7, "generalizable", 0), m("Redis", 0.7, "illustrative", 10)))
    assert(kept2.head.role == "generalizable")
    // higher confidence still dominates role
    val kept3 = DetExtractor.dedupMentions(Vector(
      m("Redis", 0.7, "generalizable", 0), m("Redis", 0.9, "illustrative", 10)))
    assert(kept3.head.role == "illustrative" && kept3.head.confidence == 0.9)
    // equal confidence, both generalizable: earlier position wins (unchanged)
    val kept4 = DetExtractor.dedupMentions(Vector(
      m("Redis", 0.7, "generalizable", 0), m("Redis", 0.7, "generalizable", 10)))
    assert(kept4.head.begin == 0)
  }

  test("PPR: an isolated seed keeps (1−d)·pers mass (memory.py:304-315 parity)") {
    val edges = Seq(("a", "b", 1.0)).toDF("source_id", "target_id", "confidence")
    val seeds = Seq(("a", 1.0), ("z", 1.0)).toDF("id", "weight") // z has no edges
    val got = Ppr.run(edges, seeds, damping = 0.85, tol = 1e-10)
      .as[(String, Double)].collect().toMap

    // dense reference over ALL nodes {a, b, z}, pers = (0.5, 0, 0.5)
    val nodes = Seq("a", "b", "z")
    val idx = nodes.zipWithIndex.toMap
    val und = Seq(("a", "b", 1.0), ("b", "a", 1.0))
    val outW = und.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val pers = Array(0.5, 0.0, 0.5)
    var rank = pers.clone()
    for (_ <- 0 until 2000) {
      val next = Array.fill(3)(0.0)
      for ((u, v, w) <- und) next(idx(v)) += rank(idx(u)) * w / outW(u)
      for (i <- 0 until 3) next(i) = 0.85 * next(i) + 0.15 * pers(i)
      rank = next
    }
    for ((n, i) <- idx)
      assert(math.abs(got.getOrElse(n, 0.0) - rank(i)) < 1e-6,
        s"node $n: ${got.get(n)} vs ${rank(i)}")
    // the isolated seed specifically: (1−d) · 0.5 = 0.075, not dropped
    assert(math.abs(got("z") - 0.075) < 1e-9)
  }

  test("q28 CC oracle round budget is sufficient for the verify corpus (measured)") {
    val shared = SparkEntry.kg(spark)
    val pairs = Canon.synonymEdges(shared.concepts,
      graft.pipeline.Ingest.aliasesOf(shared.ex), 0.75)
    val (_, iters) = Canon.connectedComponentsWithStats(pairs)
    // the oracle chain runs exactly OracleRoundBudget propagation rounds;
    // the operator must converge within it (last round observes 0 changes)
    assert(iters <= Canon.OracleRoundBudget,
      s"CC needed $iters rounds > oracle budget ${Canon.OracleRoundBudget} — " +
        "q28 would diverge from its oracle; raise Canon.OracleRoundBudget")
  }
}
