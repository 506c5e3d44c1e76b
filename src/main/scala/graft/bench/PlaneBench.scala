/** A/B microbench for the Similarity plane-matrix memo: self-contained
  * copies of the OLD (per-row SplitMix64) and NEW (cached matrix) banded
  * signature kernels, compared for speed and bit-equality. Cited in
  * OPTIMIZATION_r06.md (q21 adjudication).
  */
package graft.bench
object PlaneBench {
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def planeComponent(p: Int, d: Int): Double =
    (mix(p.toLong * 0x9e37L ^ d.toLong) >>> 11).toDouble / (1L << 52).toDouble - 1.0
  val cache: Array[Array[Double]] = Array.tabulate(64, 1024)(planeComponent)

  def oldBanded(v: Seq[Float]): Seq[Int] =
    (0 until 4).map { b =>
      var sig = 0; var k = 0
      while (k < 16) {
        var dot = 0.0; var d = 0; val n = v.length
        while (d < n) { dot += v(d) * planeComponent(b * 16 + k, d); d += 1 }
        if (dot >= 0) sig |= (1 << k); k += 1
      }
      sig
    }
  def planeDot(p: Int, v: Seq[Float]): Double = {
    val n = v.length; var dot = 0.0; var d = 0
    if (p < 64) { val row = cache(p); val m = math.min(n, 1024)
      while (d < m) { dot += v(d) * row(d); d += 1 } }
    while (d < n) { dot += v(d) * planeComponent(p, d); d += 1 }
    dot
  }
  def newBanded(v: Seq[Float]): Seq[Int] =
    (0 until 4).map { b =>
      var sig = 0; var k = 0
      while (k < 16) { if (planeDot(b * 16 + k, v) >= 0) sig |= (1 << k); k += 1 }
      sig
    }
  def main(args: Array[String]): Unit = {
    val vecs: Array[Seq[Float]] = Array.tabulate(5000)(i =>
      scala.collection.immutable.ArraySeq.unsafeWrapArray(Array.tabulate(384)(d => ((i*31+d) % 17 - 8).toFloat)))
    var sink = 0
    for (round <- 1 to 3) {
      var t0 = System.nanoTime()
      var i = 0; while (i < vecs.length) { sink ^= oldBanded(vecs(i)).sum; i += 1 }
      val told = (System.nanoTime()-t0)/1e9
      t0 = System.nanoTime()
      i = 0; while (i < vecs.length) { sink ^= newBanded(vecs(i)).sum; i += 1 }
      val tnew = (System.nanoTime()-t0)/1e9
      println(f"round $round old=$told%.3f s new=$tnew%.3f s (sink=$sink)")
    }
    // equality check
    val ok = vecs.take(200).forall(v => oldBanded(v) == newBanded(v))
    println(s"equal=$ok")
  }
}
