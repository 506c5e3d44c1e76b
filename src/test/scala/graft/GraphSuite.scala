package graft

import graft.graph.Ppr
import graft.streaming.EdgePromotion
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class GraphSuite extends SparkFunSuite {
  import spark.implicits._

  test("PPR matches a dense single-threaded power iteration on a small graph") {
    // triangle a-b-c plus pendant d off c, varying confidences
    val edgeList = Seq(
      ("a", "b", 1.0), ("b", "c", 0.5), ("a", "c", 0.8), ("c", "d", 0.6))
    val edges = edgeList.toDF("source_id", "target_id", "confidence")
    val seeds = Seq(("a", 1.0)).toDF("id", "weight")
    val got = Ppr.run(edges, seeds, damping = 0.85, tol = 1e-9)
      .as[(String, Double)].collect().toMap

    // dense reference implementation (same spec, sequential)
    val nodes = Seq("a", "b", "c", "d")
    val idx = nodes.zipWithIndex.toMap
    val und = edgeList.flatMap { case (u, v, w) => Seq((u, v, w), (v, u, w)) }
    val outW = und.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val pers = Array(1.0, 0.0, 0.0, 0.0)
    var rank = pers.clone()
    for (_ <- 0 until 2000) {
      val next = Array.fill(4)(0.0)
      for ((u, v, w) <- und) next(idx(v)) += rank(idx(u)) * w / outW(u)
      for (i <- 0 until 4) next(i) = 0.85 * next(i) + 0.15 * pers(i)
      rank = next
    }
    for ((n, i) <- idx)
      assert(math.abs(got.getOrElse(n, 0.0) - rank(i)) < 1e-6, s"node $n: ${got.get(n)} vs ${rank(i)}")
  }

  test("PPR: uniform personalization fallback when seeds are empty (memory.py:304-315)") {
    val edges = Seq(("a", "b", 1.0), ("b", "c", 1.0)).toDF("source_id", "target_id", "confidence")
    val seeds = Seq.empty[(String, Double)].toDF("id", "weight")
    val got = Ppr.run(edges, seeds).as[(String, Double)].collect().toMap
    assert(got.size == 3)
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("edge promotion batch: hits ≥ 3 AND avg ≥ 0.75 (buffer.py:110-112)") {
    val obs = Seq(
      ("a", "b", 0.9), ("b", "a", 0.8), ("a", "b", 0.85), // 3 hits avg .85 → promote
      ("c", "d", 0.9), ("c", "d", 0.9), // only 2 hits → no
      ("e", "f", 0.5), ("e", "f", 0.6), ("e", "f", 0.7) // avg < .75 → no
    ).toDF("node_a", "node_b", "score")
    val out = EdgePromotion.promoteBatch(obs)
      .select("source_id", "target_id", "relation_type")
      .as[(String, String, String)].collect().toSet
    assert(out == Set(("a", "b", "SIMILAR_TO")))
  }

  test("edge promotion streaming: stateful promotion across micro-batches") {
    implicit val sq = spark.sqlContext
    import graft.streaming.EdgePromotion.Observation
    val input = MemoryStream[Observation]
    val promoted = EdgePromotion.promoteStream(input.toDS())(spark)
    val query = promoted.writeStream
      .format("memory").queryName("promoted").outputMode(OutputMode.Append()).start()
    try {
      input.addData(Observation("a", "b", 0.9, 1L), Observation("b", "a", 0.8, 2L))
      query.processAllAvailable()
      assert(spark.sql("SELECT * FROM promoted").count() == 0) // 2 hits: not yet
      input.addData(Observation("a", "b", 0.85, 3L))
      query.processAllAvailable()
      val rows = spark.sql("SELECT source_id, target_id, hits FROM promoted")
        .as[(String, String, Long)].collect()
      assert(rows.toSeq == Seq(("a", "b", 3L)))
    } finally query.stop()
  }

  test("teleportation factor update clamps to [0.1, 5.0] (factors.py:36-45)") {
    val factors = Seq(("n1", 4.95), ("n2", 0.12), ("n3", 1.0)).toDF("node_id", "factor")
    val outcomes = Seq(
      ("n1", "accepted"), ("n1", "accepted"), // 4.95 + 0.2 → clamp 5.0
      ("n2", "rejected"), // 0.12 - 0.05 → clamp .1? 0.07 → 0.1
      ("n3", "partial"), // 1.03
      ("n4", "accepted") // new node: 1.0 + 0.1
    ).toDF("node_id", "outcome")
    val out = EdgePromotion.updateFactors(factors, outcomes)
      .as[(String, Double)].collect().toMap
    assert(out("n1") == 5.0)
    assert(out("n2") == 0.1)
    assert(math.abs(out("n3") - 1.03) < 1e-9)
    assert(math.abs(out("n4") - 1.1) < 1e-9)
  }
}
