package graft

import graft.ops.{Ivf, Similarity}
import org.apache.spark.sql.functions._

/** IVF coarse-quantizer ANN: deterministic training, partitioning
  * invariance, recall on a corpus with genuine cluster structure, and
  * the small-corpus (fewer rows than k) degenerate case.
  */
class IvfSuite extends SparkFunSuite {
  import spark.implicits._

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def noise(i: Long, d: Int): Float =
    (((mix(i * 131 + d) >>> 11).toDouble / (1L << 53).toDouble) * 0.05).toFloat

  /** 8 well-separated centers in 16 dims, 30 points each with small
    * deterministic perturbation — real cluster structure, no RNG.
    */
  private lazy val clustered = {
    val rows = for {
      j <- 0 until 8
      i <- 0 until 30
    } yield {
      val id = (j * 30 + i).toLong
      val v = Array.tabulate(16) { d =>
        val base = if (d == 2 * j || d == 2 * j + 1) 1.0f else 0.0f
        base + noise(id, d)
      }
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "embedding").localCheckpoint()
  }

  test("training is deterministic and partitioning-invariant") {
    val a = Ivf.train(clustered, k = 8, iters = 4)
    val b = Ivf.train(clustered.repartition(7), k = 8, iters = 4)
    val c = Ivf.train(clustered.coalesce(1), k = 8, iters = 4)
    assert(a.length == 8)
    assert(a.map(_.toSeq) sameElements b.map(_.toSeq))
    assert(a.map(_.toSeq) sameElements c.map(_.toSeq))
  }

  test("recall vs brute force on a clustered corpus") {
    val queries = clustered.filter($"vec_id" % 30 === 0) // one per true cluster
    val exact = Similarity.bruteForceTopK(clustered, queries, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ivf.ivfTopK(clustered, queries, k = 5, nClusters = 8,
      iters = 4, nprobe = 2)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall below 0.9 on clustered corpus")
  }

  test("search scans only the probed fraction of the corpus") {
    val cents = Ivf.train(clustered, k = 8, iters = 4)
    val indexed = Ivf.index(clustered, cents).localCheckpoint()
    val probed = indexed.filter($"cluster".isin(
      Ivf.nearestClusters(cents, clustered.filter($"vec_id" === 0)
        .select("embedding").as[Seq[Float]].head(), 2): _*)).count()
    // 2 of 8 probes on a balanced corpus ≈ a quarter of the rows
    assert(probed < clustered.count() / 2,
      s"nprobe=2 of 8 clusters probed $probed of ${clustered.count()} rows")
  }

  test("corpus smaller than k trains one centroid per row") {
    val tiny = clustered.filter($"vec_id" < 5)
    val cents = Ivf.train(tiny, k = 16, iters = 2)
    assert(cents.length == 5)
    val res = Ivf.search(Ivf.index(tiny, cents), cents, tiny, k = 2, nprobe = 3)
    assert(res.count() > 0)
    assert(res.groupBy("query_id").count().select(max("count")).head().getLong(0) <= 2)
  }

  test("ties and empty clusters keep prior centroids") {
    // all rows identical: every row assigns to cluster 0 (tie-break by
    // lower id), clusters 1+ stay at their init vectors
    val same = (0L until 6L).map(i => (i, Seq.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val cents = Ivf.train(same, k = 3, iters = 3)
    assert(cents.length == 3)
    assert(cents(0).toSeq == Seq.fill(8)(1.0f))
  }
}
