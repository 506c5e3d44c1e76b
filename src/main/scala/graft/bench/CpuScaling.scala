package graft.bench

import java.util.concurrent.atomic.AtomicLong

/** Machine-ceiling probe: pure extraction compute (no Spark, no I/O) on
  * plain JVM thread pools. Separates "our pipeline doesn't scale" from
  * "this VM's memory bandwidth saturates below 32 threads" (SURVEY.md §7.7).
  */
object CpuScaling {

  /** One probe measurement: docs/s at `threads` threads. */
  def measure(threads: Int, nPages: Int, quiet: Boolean = false): Double = {
    val cfg = graft.pipeline.Ingest.Config()
    val counter = new AtomicLong(0)
    val sink = new AtomicLong(0)
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      new Thread(() => {
        var i = counter.getAndIncrement()
        while (i < nPages) {
          val text = graft.fixtures.PagesGen.pageText(42L, i)
          val html = graft.fixtures.PagesGen.wrapHtml(s"Page $i", text)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val ex = graft.pipeline.Ingest.extractPage(s"u$i", "d", html, cfg)
          sink.addAndGet(ex.triples.size.toLong)
          i = counter.getAndIncrement()
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9
    if (!quiet)
      println(f"[cpu] threads=$threads%2d  ${nPages / wall}%8.1f docs/s  (sink=${sink.get()})")
    nPages / wall
  }

  /** Compact JSON fragment for embedding in bench outputs: the host's
    * 1/8/32-thread capacity AT MEASUREMENT TIME, so every recorded bench
    * carries its own variance context (BENCH/BASELINE.md protocol:
    * healthy ≈ 6.3–7.2× at 8/1; a degraded window reads ~2×, making
    * wall-clock numbers non-representative).
    */
  def probeJson(nPages: Int = 8000): String = {
    measure(4, nPages, quiet = true) // warmup
    val r1 = measure(1, nPages, quiet = true)
    val r8 = measure(8, nPages, quiet = true)
    val r32 = measure(32, nPages, quiet = true)
    f"""{"docs_per_sec_1t":$r1%.1f,"docs_per_sec_8t":$r8%.1f,""" +
      f""""docs_per_sec_32t":$r32%.1f,"speedup_8_1":${r8 / r1}%.2f,""" +
      f""""speedup_32_1":${r32 / r1}%.2f}"""
  }

  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toInt else 40000

    def run(threads: Int): Double = measure(threads, nPages)

    run(4) // warmup
    val r1 = run(1)
    val r8 = run(8)
    val r32 = run(32)
    println(f"[cpu] speedup 8/1=${r8 / r1}%.2f  32/8=${r32 / r8}%.2f  32/1=${r32 / r1}%.2f")
  }
}
